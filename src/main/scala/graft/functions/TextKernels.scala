package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernels for the whitespace-token / word-n-gram family
  * (SURVEY §2 F-section hot path).
  *
  * The original formulations chain higher-order functions —
  * `filter(split(lower(text), "\\s+"), …)` for tokens and
  * `transform(sequence(…), i -> array_join(slice(toks, i, n), " "))` for
  * grams. `split`/`lower` are codegen'd, but every lambda-bearing HOF
  * (`filter`, `transform`, plus the per-element `slice`+`array_join`)
  * evaluates INTERPRETED, allocating a fresh string per element — the
  * same per-row tax [[ShingleHashes]] already removed for character
  * shingles. These kernels do one staying-in-codegen eval per row over
  * the UTF-8 bytes (the generated code calls the static helpers below,
  * exactly the Fnv64/ShingleHashes pattern).
  *
  * Byte-exactness contract (spec-pinned in TextKernelsSpec against the
  * original Column formulations, corpus + adversarial cases):
  *   - lowercasing calls the SAME `UTF8String.toLowerCase` the `lower()`
  *     expression calls — no divergence is possible by construction;
  *   - the token scanner splits on Java-regex `\s` = the six ASCII bytes
  *     [ \t\n\f\r] (regex `\s` is ASCII-only without
  *     UNICODE_CHARACTER_CLASS, and in UTF-8 those bytes never occur
  *     inside a multi-byte sequence), dropping empty tokens exactly as
  *     the `filter(length > 0)` did;
  *   - gram strings are the byte concatenation of the window's non-null
  *     tokens joined by 0x20 — `array_join(slice(…), " ")` semantics,
  *     including its skip-null rule;
  *   - gram hashes replay `xxhash64(gram)` (seed 42 over the gram's
  *     bytes) and the watermark pair hash replays `fnv64(gram)`
  *     bit-for-bit, so every downstream oracle-checked value is
  *     unchanged.
  *
  * NULL contract (r17 ADVICE): these are standard null-propagating
  * UnaryExpressions — a NULL text yields a NULL array/long, where the
  * replaced `when(...).otherwise(array())` Column forms yielded an
  * EMPTY array. The engine's text operators guarantee non-null text at
  * their boundaries (the corpus tables declare text NOT NULL and every
  * wire builder concat-constructs it), so no declared query observes
  * the difference; a future caller feeding nullable text must coalesce
  * first (`coalesce(text, lit(""))`) or wrap in the old when-form.
  */
object TextKernels {

  private final val WsMax = 32 // ASCII space; all Java-regex \s bytes are <= 32

  private def isWs(b: Byte): Boolean =
    b == 32 || (b >= 9 && b <= 13)

  /** Token spans (start, end byte offsets) of the ALREADY-lowercased
    * bytes; empties dropped. Shared scanner for every kernel below. */
  private def tokenSpans(b: Array[Byte]): (Array[Int], Int) = {
    // worst case ceil((len+1)/2) tokens; store (start, end) pairs flat
    val spans = new Array[Int](b.length + 2)
    var n = 0
    var i = 0
    while (i < b.length) {
      while (i < b.length && isWs(b(i))) i += 1
      if (i < b.length) {
        val s = i
        while (i < b.length && !isWs(b(i))) i += 1
        spans(2 * n) = s
        spans(2 * n + 1) = i
        n += 1
      }
    }
    (spans, n)
  }

  /** Lowercased whitespace tokens — `filter(split(lower(c), "\\s+"),
    * t -> length(t) > 0)` in one codegen-friendly eval. */
  def tokens(input: UTF8String): GenericArrayData = {
    val b = input.toLowerCase.getBytes
    val (spans, n) = tokenSpans(b)
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromBytes(b, spans(2 * i), spans(2 * i + 1) - spans(2 * i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Space-joined word n-grams over ANY array<string> —
    * `when(size(toks) >= n, transform(sequence(1, size - n + 1),
    * i -> array_join(slice(toks, i, n), " "))).otherwise(array())`
    * in one eval, including array_join's skip-null rule. */
  def wordGrams(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): GenericArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[AnyRef])
    val els = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      els(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[AnyRef](sz - n + 1)
    var g = 0
    while (g <= sz - n) {
      var bytes = 0
      var nonNull = 0
      var j = g
      while (j < g + n) {
        if (els(j) != null) { bytes += els(j).numBytes(); nonNull += 1 }
        j += 1
      }
      val buf = new Array[Byte](bytes + math.max(0, nonNull - 1))
      var off = 0
      var written = 0
      j = g
      while (j < g + n) {
        if (els(j) != null) {
          if (written > 0) { buf(off) = WsMax.toByte; off += 1 }
          els(j).writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
          off += els(j).numBytes()
          written += 1
        }
        j += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** SORTED DISTINCT xxhash64 values of the word k-grams of the text —
    * fuses tokens → wordGrams → explode → xxhash64 → per-doc distinct
    * into one eval with zero gram-string materialization. Downstream
    * consumers (novelty first-owner agg, the shared-gram graph builder)
    * aggregate immediately, so per-doc order is irrelevant; sorted
    * output keeps the kernel deterministic. Hash = the engine's
    * `xxhash64` (seed 42) over the gram's UTF-8 bytes (token bytes
    * joined by 0x20), so any value that crosses into a plan is the one
    * the old explode path produced. */
  def gramHashes(input: UTF8String, k: Int): GenericArrayData = {
    val b = input.toLowerCase.getBytes
    val (spans, n) = tokenSpans(b)
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    var maxLen = 0
    var g = 0
    while (g <= n - k) {
      var len = k - 1
      var j = g
      while (j < g + k) { len += spans(2 * j + 1) - spans(2 * j); j += 1 }
      if (len > maxLen) maxLen = len
      g += 1
    }
    val buf = new Array[Byte](maxLen)
    val hs = new Array[Long](n - k + 1)
    g = 0
    while (g <= n - k) {
      var off = 0
      var j = g
      while (j < g + k) {
        if (j > g) { buf(off) = WsMax.toByte; off += 1 }
        val s = spans(2 * j)
        val l = spans(2 * j + 1) - s
        System.arraycopy(b, s, buf, off, l)
        off += l
        j += 1
      }
      hs(g) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, off, 42L)
      g += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    var i = 0
    while (i < hs.length) {
      if (m == 0 || hs(i) != hs(m - 1)) { hs(m) = hs(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, m))
  }

  /** The F92 watermark pair counts in one pass: packed
    * `(n_pairs << 32) | n_green` over the text's consecutive token
    * pairs, green ⇔ bit 40 of fnv1a(tok1 ∥ 0x20 ∥ tok2) is 0 — the
    * exact `size(grams)` / `size(filter(grams, g -> ((fnv64(g) >> 40)
    * & 1) = 0))` values without materializing a single gram string.
    * n_pairs < 2^31 for any 2 GiB document, so the packing is lossless. */
  def greenPairs(input: UTF8String): Long = {
    val b = input.toLowerCase.getBytes
    val (spans, n) = tokenSpans(b)
    if (n < 2) return 0L
    var green = 0L
    var g = 0
    while (g < n - 1) {
      var h = 0xcbf29ce484222325L
      var j = spans(2 * g)
      val e1 = spans(2 * g + 1)
      while (j < e1) { h ^= (b(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      h ^= 0x20L; h *= 0x100000001b3L
      j = spans(2 * (g + 1))
      val e2 = spans(2 * (g + 1) + 1)
      while (j < e2) { h ^= (b(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      if (((h >> 40) & 1L) == 0L) green += 1L
      g += 1
    }
    ((n - 1).toLong << 32) | green
  }

  /** Character bigrams of the lowercased text —
    * `when(length(lowered) >= 2, transform(sequence(1, length - 1),
    * i -> lowered.substr(i, 2)))` with substr's code-point semantics,
    * duplicates kept (the F20 model counts occurrences). */
  def charBigrams(input: UTF8String): GenericArrayData = {
    val b = input.toLowerCase.getBytes
    var nChars = 0
    var off = 0
    val starts = new Array[Int](b.length + 1)
    while (off < b.length) {
      starts(nChars) = off
      off += UTF8String.numBytesForFirstByte(b(off))
      nChars += 1
    }
    starts(nChars) = b.length
    if (nChars < 2) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](nChars - 1)
    var i = 0
    while (i < nChars - 1) {
      out(i) = UTF8String.fromBytes(b, starts(i), starts(i + 2) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** PER-DOC character-bigram COUNTS — fuses charBigrams → explode →
    * groupBy(doc, bg) → count into one eval: sorted (binary UTF8 order)
    * distinct bigrams with their occurrence counts, so the consumer's
    * explode emits exact (doc, bg, cnt) rows directly and the first
    * corpus-sized hash aggregation (and its Exchange) disappears from
    * the F20 LM build (guide §2.3: aggregate before you shuffle — here
    * the "aggregate" runs inside the scan task at zero protocol cost).
    * Counts are per-occurrence charBigrams counts by construction;
    * equivalence is spec-pinned against the retained charBigrams form. */
  def charBigramCounts(input: UTF8String): GenericArrayData = {
    val b = input.toLowerCase.getBytes
    var nChars = 0
    var off = 0
    val starts = new Array[Int](b.length + 1)
    while (off < b.length) {
      starts(nChars) = off
      off += UTF8String.numBytesForFirstByte(b(off))
      nChars += 1
    }
    starts(nChars) = b.length
    if (nChars < 2) return new GenericArrayData(Array.empty[AnyRef])
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < nChars - 1) {
      val bg = UTF8String.fromBytes(b, starts(i), starts(i + 2) - starts(i))
      val c = counts.get(bg)
      if (c == null) counts.put(bg, Array(1L)) else c(0) += 1L
      i += 1
    }
    val keys = counts.keySet().toArray(new Array[UTF8String](counts.size()))
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    val out = new Array[AnyRef](keys.length)
    var j = 0
    while (j < keys.length) {
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](keys(j), counts.get(keys(j))(0)))
      j += 1
    }
    new GenericArrayData(out)
  }

  def tokensCol(c: Column): Column = GraftShims.exprColumn(
    TokensExpr(GraftShims.colExpr(c)))
  def wordGramsCol(toks: Column, n: Int): Column = GraftShims.exprColumn(
    WordGramsExpr(GraftShims.colExpr(toks), n))
  def gramHashesCol(text: Column, k: Int): Column = GraftShims.exprColumn(
    GramHashesExpr(GraftShims.colExpr(text), k))
  def greenPairsCol(text: Column): Column = GraftShims.exprColumn(
    GreenPairsExpr(GraftShims.colExpr(text)))
  def charBigramsCol(text: Column): Column = GraftShims.exprColumn(
    CharBigramsExpr(GraftShims.colExpr(text)))
  def charBigramCountsCol(text: Column): Column = GraftShims.exprColumn(
    CharBigramCountsExpr(GraftShims.colExpr(text)))
}

case class TokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokens($c)")
  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)
}

case class WordGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"
  override def nullSafeEval(input: Any): Any =
    TextKernels.wordGrams(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordGrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

case class GramHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"
  override def nullSafeEval(input: Any): Any =
    TextKernels.gramHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.gramHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

case class GreenPairsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_green_pairs"
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TextKernels.greenPairs(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.greenPairs($c)")
  override protected def withNewChildInternal(newChild: Expression): GreenPairsExpr =
    copy(child = newChild)
}

case class CharBigramCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bg", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_char_bigram_counts"
  override def nullSafeEval(input: Any): Any =
    TextKernels.charBigramCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charBigramCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): CharBigramCountsExpr =
    copy(child = newChild)
}

case class CharBigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_bigrams"
  override def nullSafeEval(input: Any): Any =
    TextKernels.charBigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charBigrams($c)")
  override protected def withNewChildInternal(newChild: Expression): CharBigramsExpr =
    copy(child = newChild)
}
