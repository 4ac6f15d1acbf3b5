package graft.tools
import org.apache.spark.sql.SparkSession
// dev-only profiling main: time each scoreboard gate digest serially
object GateProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    graft.operators.Scorecard.streamScorecard(spark, dir).collect()
    val t0 = System.nanoTime()
    val fs = graft.operators.Scorecard.profileFrames(spark, dir)
    println(f"FRAMES_BUILD ${(System.nanoTime() - t0) / 1e9}%.2f")
    val specs = graft.operators.Scorecard.gateCols.toMap
    fs.foreach { case (g, df) =>
      val t = System.nanoTime()
      graft.operators.Scorecard.digestOf(g, df, specs(g)).collect()
      println(f"GATE $g ${(System.nanoTime() - t) / 1e9}%.2f")
    }
    spark.stop()
  }
}
