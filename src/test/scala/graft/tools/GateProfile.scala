package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only profiling main: time each scoreboard gate digest serially.
  * Lives in the TEST sourceset (r16) so it never ships in the published
  * jar, and reads master/partitions from the same env vars Bench uses
  * instead of hardcoding local[32] — run with
  * `sbt -batch "Test/runMain graft.tools.GateProfile"`. */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
