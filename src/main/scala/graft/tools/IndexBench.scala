package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev CLI: time the once-per-corpus-version index builds (IVF+PQ layout,
  * F20 LM scores) forced-fresh N times in ONE session, separating the
  * cold-JVM/JIT component (rep 1) from the steady-state build cost
  * (reps 2+). The bench suite times each build exactly once, cold — this
  * tool exists to interpret that single-shot number.
  *
  * Usage: runMain graft.tools.IndexBench [sfDir] [reps]
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    (1 to reps).foreach { i =>
      rm(new java.io.File(graft.operators.Similarity.ivfRoot(spark, sfDir)))
      val t0 = System.nanoTime()
      graft.operators.Similarity.ivfIndex(spark, sfDir)
      val ivf = (System.nanoTime() - t0) / 1e9
      rm(new java.io.File(graft.operators.TextAnalysis.lmRoot(spark, sfDir)))
      val t1 = System.nanoTime()
      graft.operators.TextAnalysis.lmScore(spark, sfDir).count(): Unit
      val lm = (System.nanoTime() - t1) / 1e9
      println(f"rep=$i ivf_index=$ivf%.2f lm_index=$lm%.2f")
    }
    spark.stop()
  }
}
