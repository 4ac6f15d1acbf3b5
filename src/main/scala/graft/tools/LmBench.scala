package graft.tools
import org.apache.spark.sql.SparkSession
object LmBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit }
    (1 to 3).foreach { i =>
      rm(new java.io.File(graft.operators.TextAnalysis.lmRoot(spark, dir)))
      val t0 = System.nanoTime()
      graft.operators.TextAnalysis.lmScore(spark, dir).collect()
      println(f"LM_BUILD_$i=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
