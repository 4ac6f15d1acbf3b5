package graft.operators

import graft.Tables
import graft.functions.Vec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2 F6–F8) over the
  * `embeddings(vec_id, embedding array<float>, label)` table.
  *
  * Scale design: the exact near-dup pass is blocked on the cluster label
  * (at 100 TB any exact pass must be blocked or pre-bucketed); the ANN
  * scale path is LSH sign-buckets — candidates only ever meet inside a
  * bucket, so the shuffle is a groupBy on the bucket id.
  */
object Similarity {

  /** F6: exact cosine near-dup pairs within label blocks. */
  def neardupCosine(spark: SparkSession, dir: String, threshold: Double = 0.35): DataFrame = {
    val t = Tables(spark, dir)
    // norms once per vector, not once per pair (same arithmetic as
    // Vec.cosine: dot / (sqrt(dot aa) * sqrt(dot bb)))
    val e = t.embeddings.select(col("vec_id"), col("label"),
        Vec.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vec.norm(col("v")))
    val a = e.select(col("vec_id").as("id1"), col("label"), col("v").as("v1"), col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("id2"), col("label"), col("v").as("v2"), col("nrm").as("n2"))
    a.join(b, Seq("label"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos", round(Vec.dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 4))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("label").cast("int").as("label"), col("cos"))
      .orderBy(col("id1"), col("id2"))
  }

  /** F7: brute-force cosine top-k against a query vector (the baseline ANN
    * path: one scan + TakeOrderedAndProject, no full sort). */
  def annTopK(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 20): DataFrame = {
    val t = Tables(spark, dir)
    val q = t.embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0)
    val qv = array(q.map(x => lit(x.toDouble)): _*)
    t.embeddings
      .filter(col("vec_id") =!= queryId)
      .withColumn("score", round(Vec.cosine(Vec.toDouble(col("embedding")), qv), 4))
      .select(col("vec_id"), col("label").cast("int").as("label"), col("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  val NPlanes = 8

  /** F8: LSH sign-bucketing — the ANN scale path. Bucket occupancy per
    * hyperplane-sign code; per-bucket recall is spec-verified against F7. */
  def annLshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val planes = Vec.planeWeights(NPlanes, 64)
    t.embeddings
      .withColumn("bucket", Vec.lshBucket(Vec.toDouble(col("embedding")), planes))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("min_vec_id"))
      .orderBy(col("bucket"))
  }

  /** Per-vector bucket assignment (used by the recall spec). */
  def lshAssign(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val planes = Vec.planeWeights(NPlanes, 64)
    t.embeddings.withColumn("bucket", Vec.lshBucket(Vec.toDouble(col("embedding")), planes))
      .select(col("vec_id"), col("label"), col("bucket"))
  }
}
