package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark. Prints ONE JSON line to stdout (driver contract)
  * and writes the SAME json to BENCH_LOCAL.json, because the driver's
  * stdout capture truncates long tails and the per-query map is the part
  * worth keeping. Each query is timed as the MIN of `SPARK_GRAFT_BENCH_REPS`
  * (default 3) in-process repetitions: observed run-to-run noise on warm
  * sub-second queries is +/-80%, far above any real regression signal, and
  * min-of-n is the standard way to strip scheduler/GC jitter from a
  * single-JVM bench.
  *
  * Write-path isolation: every rep of every query runs with the engine's
  * conf-keyed scratch roots pointed at a FRESH per-rep directory (removed
  * after the rep, outside the timer), so a write-path query can never get
  * a flattering rep by overwriting its own previous output's directory
  * structure, and two bench runs see identical filesystem state. Queries
  * that actually wrote into their rep dir are classified write-path
  * automatically; the JSON reports `read_total` / `write_total`
  * subtotals separately because write timings carry FS jitter that would
  * otherwise drown the read-path signal. The persisted-index roots
  * (`graft.ivf.root`, `graft.card.root`) are deliberately NOT isolated:
  * those layouts are one-time indexing state, and serving benches must
  * measure the steady-state cached path.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen and the file-system cache so the first timed
    // query isn't charged for session startup
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    } catch { case _: Throwable => () }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    // the IVF inverted-list layout is a one-time INDEXING job (rebuilt
    // only when the corpus changes), not per-query serving cost — build
    // it BEFORE the query loop so ann_ivf / neardup_ivf_gated measure
    // serving against the persisted index, but time the build as its own
    // visible "ann_ivf_index" entry (forced fresh, so the number is the
    // real indexing job, not a stamp check). The index build is NOT
    // repeated: it is a cold-layout job by definition and re-timing it
    // against a warm FS cache would understate it.
    val indexSec = try {
      rm(new java.io.File(graft.operators.Similarity.ivfRoot(spark, sfDir)))
      val t0 = System.nanoTime()
      graft.operators.Similarity.ivfIndex(spark, sfDir)
      (System.nanoTime() - t0) / 1e9
    } catch { case _: Throwable => -1.0 }
    // per-rep scratch isolation (see scaladoc): all write-path conf roots
    // point into a fresh dir for every rep; rep dirs are torn down
    // OUTSIDE the timed region
    val benchScratch = new java.io.File(sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_SCRATCH", "/root/repo/target/bench_scratch")).getAbsolutePath
    rm(new java.io.File(benchScratch))
    // ONE key moves every write-path root: the per-op override keys
    // (graft.snapshot/compact/evolve.root) all DEFAULT through
    // Tables.scratch, so a future write-path op is isolated (and
    // write-classified) automatically just by using the shared helper
    val scratchKeys = Seq("graft.scratch.root")
    // a rep that THROWS contributes no time: min-of-n over successful reps
    // only (a fast failure would otherwise report as the query's best
    // time); a query with zero successes lands as null in the JSON and in
    // the `failed` list instead of a bogus number
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var wrote = false
      val times = (1 to reps).flatMap { i =>
        val rep = new java.io.File(s"$benchScratch/${name}_$i")
        scratchKeys.foreach(k => spark.conf.set(k, rep.getAbsolutePath))
        val t0 = System.nanoTime()
        val timed = try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
        }
        wrote = wrote || rep.exists()
        rm(rep)
        timed
      }
      (name, if (times.isEmpty) None else Some(times.min), wrote)
    }
    scratchKeys.foreach(spark.conf.unset)
    rm(new java.io.File(benchScratch))
    // load_bucketed_join writes through the metastore warehouse (a fixed
    // session path, not a scratch conf) — classified write-path by hand
    val writeNames = results.collect {
      case (n, _, true) => n
      case (n, _, _) if n == "load_bucketed_join" => n
    }.toSet
    val withIndex = results.map(r => (r._1, r._2)) :+ ("ann_ivf_index" ->
      (if (indexSec < 0) None else Some(indexSec)))
    val qs = withIndex
      .map { case (k, v) => s"\"" + k + "\":" + v.map(_.toString).getOrElse("null") }
      .mkString("{", ",", "}")
    val failed = withIndex.collect { case (k, None) => s"\"$k\"" }.mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    val writeTotal = results.collect { case (n, Some(t), _) if writeNames(n) => t }.sum
    val readTotal = total - writeTotal
    val writeQs = writeNames.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","read_total":$readTotal,"write_total":$writeTotal,"write_queries":$writeQs,"queries":$qs,"failed":$failed,"sf":"$sfDir","reps":$reps}"""
    // file copy first: if stdout is truncated downstream the full map survives
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try {
      val w = new java.io.PrintWriter(new java.io.File(out), "UTF-8")
      try w.println(line) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
