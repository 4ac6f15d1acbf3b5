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

  /** F14: frame sampling — one payload → N decoded frames (the video
    * analogue of F12's image decode; a real decoder would emit frame
    * tensors). The fan-out happens inside the partition (flatMap shape),
    * so a 100 TB video corpus decodes without any shuffle; frame count and
    * per-frame features are deterministic functions of the payload so the
    * oracle can check the full fan-out. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.flatMap { case (id, text) =>
          val n = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
          val frames = (n % 3L) + 1L // STUB: a decoder would read the container
          (0L until frames).map { f =>
            (id, f, 64L + (n * 31L + f * 7L) % 997L) // STUB frame feature
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_feature")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** F52: scene-cut detection — the video curation step AFTER F14's frame
    * sampling: segment each video into SCENES at abrupt inter-frame
    * feature jumps (threshold on |Δfeature|, the classic content-based
    * shot-boundary rule), emitting per-scene extents a clip sampler or
    * captioner consumes. Frame count and per-frame features derive
    * deterministically from the payload (STUB — a real pipeline plugs a
    * decoder + embedding into the same shape), so the full segmentation
    * is oracle-checkable. Scale shape: fan-out is partition-local
    * flatMap (zero shuffle, like F14); the lag/cumulative-break window
    * partitions per VIDEO over a BOUNDED frame count (8-31 here; real
    * videos are minutes × fps, still bounded per key) — no corpus-wide
    * window, one shuffle on the video id. */
  def sceneCut(spark: SparkSession, dir: String, threshold: Long = 400L): DataFrame =
    sceneFrames(spark, dir, threshold)
      .groupBy(col("doc_id"), col("scene_idx"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"))
      .orderBy(col("doc_id"), col("scene_idx"))

  /** The shared F52/F66 scene-labeled frame table: (doc_id, frame_idx,
    * feat, scene_idx) — the F14 deterministic frame model + the shot-
    * boundary rule, one per-video bounded window. */
  def sceneFrames(spark: SparkSession, dir: String, threshold: Long): DataFrame =
    sceneFramesOf(Tables(spark, dir).documents.select(col("doc_id"), col("text")), threshold)

  /** The F52/F66/H6 core over an explicit (doc_id, text) frame. */
  def sceneFramesOf(docs: DataFrame, threshold: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val frames = docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.flatMap { case (id, text) =>
          val n = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
          val nFrames = n % 24L + 8L // STUB: a decoder would read the container
          (0L until nFrames).map { f =>
            (id, f, (n * 31L + f * f * 13L) % 997L) // STUB frame feature
          }
        }
      }
      .toDF("doc_id", "frame_idx", "feat")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val brk = when(lag(col("feat"), 1).over(w).isNull, 1)
      .when(abs(col("feat") - lag(col("feat"), 1).over(w)) > threshold, 1)
      .otherwise(0)
    frames
      .withColumn("brk", brk)
      .withColumn("scene_idx",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("brk")
  }

  /** F66: per-scene KEYFRAME selection — the representative-frame pick
    * every video curation pipeline makes after shot segmentation (the
    * thumbnail / the frame a captioner or CLIP encoder actually sees):
    * within each F52 scene, the frame with the maximal feature
    * response, ties to the LOWEST frame index (deterministic on both
    * engines via a lexicographic max_by struct). Completes the video
    * path frames → scenes → clips → keyframes.
    *
    * Scale shape: the shared [[sceneFrames]] per-video window + ONE
    * max_by hash agg per (video, scene) — map-side combined, no second
    * window, no join. */
  def videoKeyframe(spark: SparkSession, dir: String, threshold: Long = 400L): DataFrame =
    sceneFrames(spark, dir, threshold)
      .groupBy(col("doc_id"), col("scene_idx"))
      .agg(
        max_by(col("frame_idx"), struct(col("feat"), -col("frame_idx"))).as("keyframe_idx"),
        max(col("feat")).as("keyframe_feat"),
        count(lit(1)).as("n_frames"))
      .orderBy(col("doc_id"), col("scene_idx"))

  /** F39: audio chunking — the third modality's staging step (image =
    * F12/F22, video = F14): a decoded waveform splits into OVERLAPPING
    * fixed-duration windows (the standard ASR/embedding front-end shape:
    * window + hop, plus a final short window [full·hop, dur) kept when its
    * own length is ≥ half a window — so trailing audio past the last full
    * window is never silently dropped). Duration and
    * sample rate derive deterministically from the payload (STUB — a real
    * decoder reads the container header), so chunk boundaries are pure
    * integer arithmetic and the full fan-out is oracle-checkable. The
    * fan-out is partition-local flatMap like F14: a 100 TB audio corpus
    * chunks with zero shuffle, and each chunk row carries exactly what a
    * downstream batch featurizer (mapInPandas in PySpark, typed
    * mapPartitions here) consumes: (doc, chunk idx, start/end ms, a stub
    * energy feature). */
  def audioChunks(spark: SparkSession, dir: String, winMs: Long = 1000L,
      hopMs: Long = 500L): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.flatMap { case (id, text) =>
          val n = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
          // STUB header read: 8/16 kHz by payload parity, ~bytes→duration
          val rate = if (n % 2L == 0L) 8000L else 16000L
          val durMs = 500L + (n * 13L) % 9501L
          // full windows + a tail window whose OWN length [full·hop, dur)
          // is ≥ win/2 — comparing against the previous window's end made
          // the branch dead (dur − lastEnd < hop = win/2 always)
          val full = if (durMs < winMs) 0L else (durMs - winMs) / hopMs + 1L
          val tail = if (full >= 1L && durMs - full * hopMs >= winMs / 2L) 1L else 0L
          val chunks = math.max(1L, full + tail)
          (0L until chunks).map { c =>
            val start = c * hopMs
            val end = math.min(start + winMs, durMs)
            // STUB energy: a featurizer would integrate samples
            val energy = 100L + (n * 31L + c * 17L + rate / 1000L) % 9973L
            (id, c, rate, durMs, start, end, energy)
          }
        }
      }
      .toDF("doc_id", "chunk_idx", "sample_rate", "duration_ms",
        "start_ms", "end_ms", "energy_stub")
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** F42: patch-grid extraction — the ViT front-end staging step
    * (Dosovitskiy et al. 2021: an image becomes a sequence of fixed-size
    * patches), completing the per-modality fan-out matrix (image patches
    * here, video frames F14, audio chunks F39). The (stub-)decoded pixel
    * grid splits into non-overlapping `patch`×`patch` tiles — FULL tiles
    * only, the ViT convention (a real pipeline resizes to a multiple
    * first; F22 is that step) — emitted row-major with the (px, py)
    * coordinate and a deterministic stand-in for the flattened-patch
    * embedding. Partition-local flatMap like every decode step: a 100 TB
    * image corpus patches with zero shuffle, and each row is exactly the
    * unit a batch patch-embedder consumes. Integer arithmetic end-to-end
    * ⇒ the full fan-out (grid dims, coordinates, features) is
    * oracle-checked. */
  def imagePatches(spark: SparkSession, dir: String, patch: Long = 64L): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.flatMap { case (id, text) =>
          val f = decodeStub(id, text)
          val nx = f.fake_width / patch  // full patches only
          val ny = f.fake_height / patch
          for (py <- 0L until ny; px <- 0L until nx) yield {
            // STUB: a patch embedder would flatten+project the tile
            val feat = 23L + (f.n_bytes * 31L + px * 7L + py * 13L) % 99991L
            (id, py * nx + px, px, py, nx, ny, feat)
          }
        }
      }
      .toDF("doc_id", "patch_idx", "px", "py", "grid_w", "grid_h", "patch_feature")
      .orderBy(col("doc_id"), col("patch_idx"))
  }

  /** F22: resize — strided downsampling of the (stub-)decoded pixel grid
    * to a target edge (a real kernel: area/bilinear over the decoded
    * buffer; the stride/edge/sample-count plumbing here is exactly what
    * it plugs into). Partition-local like the other decode steps: a
    * 100 TB image corpus resizes with zero shuffle. All-integer
    * arithmetic keeps the oracle exact. */
  def resize(spark: SparkSession, dir: String, targetEdge: Long = 32L): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.map { case (id, text) =>
          val f = decodeStub(id, text)
          val sx = math.max(1L, f.fake_width / targetEdge)   // sampling strides
          val sy = math.max(1L, f.fake_height / targetEdge)
          val ow = (f.fake_width + sx - 1L) / sx             // ceil-div sampled grid
          val oh = (f.fake_height + sy - 1L) / sy
          // STUB: a decoder would average/sample pixels; deterministic stand-in
          val feat = 17L + (f.n_bytes * 31L + sx * 7L + sy * 13L) % 100003L
          (id, f.fake_width, f.fake_height, ow, oh, sx, sy, ow * oh, feat)
        }
      }
      .toDF("doc_id", "src_w", "src_h", "out_w", "out_h",
        "stride_x", "stride_y", "n_sampled", "sample_feature")
      .orderBy(col("doc_id"))
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

  /** F58: per-scene training-clip selection — the step AFTER scene-cut
    * (F52) in the video curation path: a contrastive/captioning trainer
    * consumes one bounded clip per scene, not whole scenes, so each
    * scene yields its CENTERED `clipLen`-frame window (short scenes pass
    * through whole) — center-of-shot sampling is the standard heuristic
    * because shot boundaries carry transition artifacts. Completes the
    * modality's pipeline: frames (F14) → scenes (F52) → clips (F58).
    *
    * Pure integer arithmetic on the F52 scene extents (one shared
    * compute, zero additional shuffle); oracle = the scene CTEs + the
    * same centering math. */
  /** F61: voice-activity segmentation — the audio path's scene-cut: a
    * chunk is ACTIVE when its energy clears a fraction of the payload's
    * mean (the classic energy-gate VAD; a real featurizer plugs frame
    * energies into the same shape), and consecutive active chunks merge
    * into SPEECH SEGMENTS — the unit an ASR/captioning trainer consumes.
    * Completes the audio pipeline: chunks (F39) → VAD segments (F61),
    * mirroring video's frames (F14) → scenes (F52) → clips (F58).
    *
    * The activity test is EXACT integer arithmetic — cross-multiplied
    * `energy·n·den ≥ sum·num` instead of a float mean — so both engines
    * agree bit-for-bit. Segment assembly is the gaps-and-islands window
    * per payload (state bounded by chunks-per-payload); the per-doc mean
    * is one hash agg joined back. One shuffle on doc_id total. */
  def audioVad(spark: SparkSession, dir: String,
      num: Long = 9L, den: Long = 10L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = audioChunks(spark, dir)
    val stats = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nch"), sum(col("energy_stub")).as("esum"))
    val active = chunks.join(stats, Seq("doc_id"))
      .filter(col("energy_stub") * col("nch") * den >= col("esum") * num)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_idx"))
    active
      .withColumn("brk",
        when(lag(col("chunk_idx"), 1).over(w).isNull, 1)
          .when(col("chunk_idx") > lag(col("chunk_idx"), 1).over(w) + 1, 1)
          .otherwise(0))
      .withColumn("seg_idx",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("seg_idx"))
      .agg(min(col("start_ms")).as("seg_start_ms"),
        max(col("end_ms")).as("seg_end_ms"),
        count(lit(1)).as("n_chunks"),
        sum(col("energy_stub")).as("energy_sum"))
      .orderBy(col("doc_id"), col("seg_idx"))
  }

  def clipSample(spark: SparkSession, dir: String, clipLen: Long = 4L): DataFrame =
    sceneCut(spark, dir)
      .withColumn("clip_frames", least(col("n_frames"), lit(clipLen)))
      .withColumn("clip_start",
        col("start_frame") + expr("(n_frames - clip_frames) div 2"))
      .select(col("doc_id"), col("scene_idx"),
        col("clip_start"), (col("clip_start") + col("clip_frames") - 1).as("clip_end"),
        col("clip_frames"))
      .orderBy(col("doc_id"), col("scene_idx"))

  /** F65: perceptual IMAGE near-dup via average-hash (aHash) — the image
    * modality's entry in the dedup family (F1..F5 cover text; web-scraped
    * image corpora dedup on a perceptual hash precisely because re-encoded
    * /resized copies differ byte-wise but hash alike). The decode stub
    * yields a deterministic 8×8 grayscale per payload (capture-burst
    * model: 4 consecutive ids share a base image, the 4th carries a
    * one-pixel perturbation — the near-copy class the hash must still
    * catch); bit k of the hash = pixel k above the image mean, compared
    * CROSS-MULTIPLIED (`64·p > Σp`) so the whole hash is exact integer
    * arithmetic. The banded-hamming candidate/verify machinery is F5's
    * [[Dedup.simhashSummary]] REUSED verbatim — one near-dup engine, two
    * modalities.
    *
    * Scale shape: hash = per-row codegen'd array fold (no shuffle);
    * then exactly F5's contract — banded groupBy on 4×2^16 keys, verify
    * on xor+bit_count. A real JPEG decoder swaps into the pixel lambda;
    * nothing downstream changes. */
  /** The F65/H6 shared average-hash frame: (doc_id, simhash) over an
    * explicit (doc_id, …) frame via the deterministic stub pixel model
    * (capture-burst: 4 consecutive ids share a base image, the 4th gets
    * a one-pixel perturbation). */
  def ahashOf(docs: DataFrame): DataFrame = {
    val px = docs.select(col("doc_id"),
      // STUB pixel model (deterministic stand-in for decode + 8x8 resize)
      expr("""transform(sequence(0, 63), k ->
        CASE WHEN doc_id % 4 = 3 AND k = 0
          THEN ((((doc_id div 4) ^ (k * 104729)) * 2654435761) % 256 + 128) % 256
          ELSE (((doc_id div 4) ^ (k * 104729)) * 2654435761) % 256 END)""").as("p"))
      .withColumn("sm", expr("aggregate(p, 0L, (a, x) -> a + x)"))
    px.select(col("doc_id"),
      expr("""aggregate(zip_with(p, sequence(0, 63), (v, k) ->
        IF(v * 64 > sm, shiftleft(1L, k), 0L)), 0L, (a, b) -> a | b)""").as("simhash"))
  }

  def ahashDedup(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    graft.operators.Dedup
      .simhashSummary(ahashOf(Tables(spark, dir).documents.select(col("doc_id"))), maxHamming)
      .withColumnRenamed("simhash", "ahash")

  /** H6: composed MEDIA curation pipeline — the multimodal twin of H5's
    * text pipeline: ingest payloads → perceptual image near-dup gate
    * (keep-first over the F65 aHash pairs — a doc with a lower-id
    * near-duplicate drops) → shot segmentation (F52) over the survivors
    * → per-scene keyframe selection (F66) → centered training-clip
    * selection (F58), with per-stage survivor lineage and integer
    * checksums pinning every stage's exact output set. Every stage
    * reuses the standalone op's shared builder (`ahashOf` +
    * `Dedup.simhashPairs`, `sceneFramesOf`, the F58 clip arithmetic),
    * so pipeline verdicts cannot drift from the per-op queries; the
    * ENTIRE composition replays in the oracle (aHash HUGEINT bits →
    * banded pairs → drop set → scene/keyframe/clip CTEs).
    *
    * Scale shape: the gate is F5's banded-hamming contract; the video
    * stages are one per-survivor-video bounded window + hash aggs —
    * nothing in the chain shuffles more than the standalone ops do. */
  def mediaCuration(spark: SparkSession, dir: String, maxHamming: Int = 3,
      clipLen: Long = 4L): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val docs = t.documents.select(col("doc_id"), col("text")).localCheckpoint(true)
    // stage 2: keep-first image dedup — any doc with a lower-id near-dup drops
    val drops = graft.operators.Dedup.simhashPairs(ahashOf(docs), maxHamming)
      .select(col("d2").as("doc_id")).distinct()
    val s2 = docs.join(drops, Seq("doc_id"), "left_anti").localCheckpoint(true)
    // stages 3-5: scenes → keyframes → clips over the survivors
    val scenes = sceneFramesOf(s2, 400L)
      .groupBy(col("doc_id"), col("scene_idx"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        max_by(col("frame_idx"), struct(col("feat"), -col("frame_idx"))).as("keyframe_idx"))
      .withColumn("clip_frames", least(col("n_frames"), lit(clipLen)))
      .withColumn("clip_start",
        col("start_frame") + expr("(n_frames - clip_frames) div 2"))
      .localCheckpoint(true)
    val nDocs = docs.agg(count(lit(1)).cast("long"), sum(col("doc_id")).cast("long")).head()
    val nS2 = s2.agg(count(lit(1)).cast("long"), sum(col("doc_id")).cast("long")).head()
    val sc = scenes.agg(count(lit(1)).cast("long"),
      sum(col("doc_id") * 100L + col("scene_idx")).cast("long"),
      sum(col("doc_id") * 1000L + col("keyframe_idx")).cast("long"),
      sum(col("doc_id") * 10000L + col("clip_start")).cast("long")).head()
    Seq(
      (1L, "ingest", nDocs.getLong(0), nDocs.getLong(0), nDocs.getLong(1)),
      (2L, "image_dedup", nDocs.getLong(0), nS2.getLong(0), nS2.getLong(1)),
      (3L, "scene_cut", nS2.getLong(0), sc.getLong(0), sc.getLong(1)),
      (4L, "keyframe", sc.getLong(0), sc.getLong(0), sc.getLong(2)),
      (5L, "clip", sc.getLong(0), sc.getLong(0), sc.getLong(3)))
      .toDF("stage_ord", "stage", "units_in", "units_out", "checksum")
      .orderBy(col("stage_ord"))
  }

  /** F74: audio FINGERPRINT matching — the landmark-hash retrieval idea
    * (Wang's Shazam construction) over the deterministic stub
    * spectrogram: per frame, the peak band's energy; landmarks pair
    * each anchor frame's peak with the peaks 1-3 frames ahead,
    * hashed (anchor energy, target energy, Δt). Two payloads match when
    * MANY landmark hashes agree under ONE consistent time offset — the
    * offset-histogram vote that makes the scheme robust to where the
    * snippet starts. The stub models recordings and time-shifted
    * excerpts: payloads with the same `octet_length div 7` are the same
    * "recording", their `mod 7` the excerpt phase — so the op provably
    * matches shifted pairs at the phase delta, which a whole-payload
    * hash (F2) and the image hash (F65) both miss.
    *
    * Scale shape: the spectrogram model is map-side (one bounded
    * explode per payload — no shuffle); matching is a hash-join on the
    * landmark hash with the winnow-style df screen (hashes seen in more
    * than `dfCap` payloads are corpus boilerplate and vote for no one),
    * so per-key fan-out is bounded and there is no all-pairs stage —
    * the F4/F18 banding argument, transposed to audio. */
  def audioFingerprint(spark: SparkSession, dir: String,
      dfCap: Long = 64L, minScore: Long = 20L): DataFrame =
    audioFingerprintOf(
      Tables(spark, dir).documents.select(col("doc_id"), col("text")),
      dfCap, minScore)

  /** The F74 core over an explicit (doc_id, text) payload frame — the
    * spec plants same-recording / shifted / unrelated payload families
    * through the SAME path as the registered query. */
  def audioFingerprintOf(docs: DataFrame, dfCap: Long, minScore: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // STUB decode: recording id r + excerpt phase p from the payload
    // length; a real pipeline plugs an FFT into the same (doc, t, peak)
    // shape
    val d = docs
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("n"))
      .withColumn("r", expr("n div 7"))
      .withColumn("p", expr("n % 7"))
      .withColumn("nf", expr("(n div 7) % 24 + 12"))
    val pk = d
      .select(col("doc_id"), col("r"), col("p"),
        explode(sequence(lit(0L), col("nf") - 1L)).as("t"))
      .withColumn("e", transform(sequence(lit(0L), lit(7L)),
        bb => (col("r") * 31L + (col("t") + col("p")) * 17L + bb * bb * 29L) % 1009L))
      .withColumn("peak", array_max(col("e")))
      .select(col("doc_id"), col("t"), col("peak"))
    // landmarks: anchor paired with the 1..3 frames ahead — a per-doc
    // bounded self-join (≤ 35 frames per payload)
    val lm = pk.as("a").join(pk.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          (col("b.t") - col("a.t")).between(1L, 3L))
      .select(col("a.doc_id").as("doc_id"), col("a.t").as("t"),
        (col("a.peak") * 4036L + col("b.peak") * 4L +
          (col("b.t") - col("a.t"))).as("h"))
    // winnow-style df screen: a hash shared by more than dfCap payloads
    // is boilerplate and votes for no one
    val good = lm.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("c"))
      .filter(col("c") <= dfCap).select(col("h"))
    val lmk = lm.join(good, Seq("h"), "left_semi").localCheckpoint(true)
    // offset-histogram vote: count agreeing hashes per (pair, Δt), keep
    // each pair's best offset
    val m = lmk.as("x").join(lmk.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (col("x.t") - col("y.t")).as("t_offset"))
      .agg(count(lit(1)).as("score"))
    m.withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_a"), col("doc_b"))
          .orderBy(col("score").desc, col("t_offset"))))
      .filter(col("rn") === 1 && col("score") >= minScore)
      .select(col("doc_a"), col("doc_b"), col("t_offset"), col("score"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
