package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors for the testdata layout (one parquet file per table).
  *
  * Models the reference's staged tables (op-etl stages every source into a
  * FileGDB before processing; see /root/reference/etl/stage_files.py). Here
  * the staging store is columnar parquet, so every downstream operator gets
  * predicate pushdown and column pruning for free.
  */
object Tables {
  /** Scratch root for write-path operators (staging snapshots, resume
    * ledgers, compaction batches, demo pipeline targets): one conf key,
    * `graft.scratch.root`, with the build's target dir as the default —
    * the `graft.ivf.root` portability pattern applied engine-wide, so no
    * operator bakes in an absolute path and concurrent runs can isolate
    * by pointing the key at distinct roots. */
  def scratch(spark: SparkSession, name: String): String =
    spark.conf.get("graft.scratch.root", "/root/repo/target") + "/" + name
}

final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** The testdata files are single parquet row groups → one input
    * partition. For tables whose operators do heavy per-row work BEFORE
    * any shuffle (text analysis, vector math, fingerprinting), spread the
    * rows across the cluster first; the shuffle is tiny next to the
    * compute it parallelizes. (On a real multi-file/multi-row-group
    * layout the scan itself provides the splits and this is a no-op
    * cost-wise.) */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = spread(t("documents"))

  /** No spread: since the dot product went native (r2), all heavy vector
    * math happens AFTER a shuffle (pair joins, centroid aggs) — the only
    * pre-shuffle per-row work is a 64-float dot or a cast, so an extra
    * up-front exchange just adds a stage to every similarity job. */
  def embeddings: DataFrame = t("embeddings")
}
