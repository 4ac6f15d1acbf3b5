package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Graph, TextAnalysis}
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF_$label=${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    // warm the JIT first
    t("warmup")(Graph.pagerank(spark, dir).count())
    val docs = graft.Tables(spark, dir).documents
    t("grams_distinct") {
      docs.select(col("doc_id"),
        explode(TextAnalysis.wordGrams(TextAnalysis.tokens(col("text")), 8)).as("gram"))
        .select(col("doc_id"), xxhash64(col("gram")).as("gh"))
        .distinct().count()
    }
    t("full_pagerank")(Graph.pagerank(spark, dir).count())
    spark.stop()
  }
}
