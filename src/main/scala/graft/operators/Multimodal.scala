package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted per-payload metadata + (stubbed) decoded features. */
final case class MMFeature(
    doc_id: Long, n_bytes: Long, checksum: String, first_cp: Long,
    fake_width: Long, fake_height: Long, fake_channels: Long)

/** Multimodal column handling (SURVEY §2 F12): opaque binary payloads +
  * typed metadata, with decode/feature-extraction as batched partition
  * functions.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub; everything around it — binary
  * column, schema, Encoder, `mapPartitions` batch shape, partition-local
  * iteration — is the real plumbing a codec would plug into. At scale each
  * partition decodes its batch locally: no shuffle, no driver involvement.
  */
object Multimodal {

  /** STUB: stands in for an image decoder (e.g. JPEG → (w, h, c)). Derives
    * deterministic fake dimensions from the payload bytes so the oracle
    * can verify the plumbing end-to-end. */
  private def decodeStub(id: Long, text: String): MMFeature = {
    val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val n = payload.length.toLong
    MMFeature(
      doc_id = id,
      n_bytes = n,
      checksum = hex,
      first_cp = if (text.isEmpty) 0L else text.codePointAt(0).toLong,
      fake_width = 64L + n % 1024L,
      fake_height = 64L + (n * 7L) % 1024L,
      fake_channels = 3L)
  }

  /** F12: binary payload metadata + stub-decoded features via typed
    * `mapPartitions` (the Scala analogue of `mapInPandas` batch UDFs). */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { iter => iter.map { case (id, text) => decodeStub(id, text) } }
      .toDF()
      .orderBy(col("doc_id"))
  }
}
