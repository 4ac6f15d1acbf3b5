package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev CLI: run the flagship entry or any registered query against an sf
  * dir and print rows + the formatted physical plan.
  *
  * Usage: runMain graft.tools.RunQuery [entry|<query-name>] [sfDir] [--plan]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("entry")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = if (name == "entry") graft.SparkEntry.entry(spark)
      else graft.SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("--plan")) println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println(s"ROWS=${df.count()}")
    df.show(10, truncate = false)
    spark.stop()
  }
}
