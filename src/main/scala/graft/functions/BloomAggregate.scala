package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom filter as a Catalyst [[TypedImperativeAggregate]] — the third
  * merge-able sketch next to [[CmsAggregate]]/[[HllAggregate]], and the
  * one that powers RUNTIME JOIN PRUNING at 100 TB: build the filter over
  * the (small) dim-side join keys, broadcast the m-bit set, and drop
  * fact rows that cannot join BEFORE the shuffle. No false negatives, so
  * the pruned plan's result is provably identical to the plain join —
  * which is exactly what the oracle checks.
  *
  * The filter is SIZED FROM THE EXPECTED KEY COUNT ([[BloomAggregate.sizeFor]]):
  * ~13 bits/key (≈0.6% FPR at 4 hashes), floor [[BloomAggregate.Bits]],
  * cap [[BloomAggregate.MaxBits]] so the broadcast row stays bounded. A
  * fixed 8192-bit filter saturates at a few thousand keys (≈69% FPR at
  * 5k) and the screen degrades to a no-op exactly when pruning matters
  * most — callers pass their measured cardinality instead.
  *
  * Merge is bitwise OR (associative, commutative, idempotent); hashing
  * is the same Carter–Wegman family as CMS, so membership tests are
  * plain integer Column arithmetic ([[mightContain]] — no UDF, stays in
  * codegen; the test reads the filter's width from the word-array length
  * at runtime, so it can never disagree with how the bloom was sized).
  */
case class BloomAggregate(
    child: Expression,
    numBits: Int = BloomAggregate.Bits,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import BloomAggregate._

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64: $numBits")

  private val words: Int = numBits / 64

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Number].longValue()
      var i = 0
      while (i < Hashes) {
        val pos = bitPos(i, k, numBits)
        buf(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): BloomAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BloomAggregate =
    copy(child = newChild)
}

object BloomAggregate {
  /** Default (and floor) width: 8192 bits = 128 longs = 1 KiB. */
  val Bits = 8192
  val Words: Int = Bits / 64
  /** Cap: 2^28 bits = 32 MiB of longs — still one cheaply-broadcast row. */
  val MaxBits: Int = 1 << 28
  val Hashes = 4
  val Prime = 2147483647L
  def coeffA(i: Int): Long = 999983L * (2 * i + 1)
  def coeffB(i: Int): Long = 104729L * i + 7919L

  /** Width for an expected key count: ~13 bits/key (FPR ≈ 0.6% with 4
    * hashes), rounded up to whole words, clamped to [Bits, MaxBits].
    * `expectedKeys ≤ 0` (unknown) falls back to the floor. Past the cap
    * (~20M keys) the FPR degrades gracefully — never any false negatives,
    * the screen just prunes less. */
  def sizeFor(expectedKeys: Long): Int = {
    if (expectedKeys <= 0L) Bits
    // guard the multiply: past ~Long.MaxValue/13 keys `expectedKeys * 13`
    // wraps negative and a silent fall-through would hand an astronomically
    // large corpus the 8 KiB FLOOR — clamp to the cap instead
    else if (expectedKeys > MaxBits.toLong / 13L) MaxBits
    else {
      val raw = expectedKeys * 13L
      val rounded = ((raw + 63L) / 64L) * 64L
      math.min(MaxBits.toLong, math.max(Bits.toLong, rounded)).toInt
    }
  }

  /** Bit position of hash i for key k in an m-bit filter (nonnegative
    * keys; shared by the aggregate and the Column-side membership test). */
  def bitPos(i: Int, k: Long, numBits: Int): Int =
    (Math.floorMod(coeffA(i) * Math.floorMod(k, Prime) + coeffB(i), Prime) % numBits).toInt

  def bitPos(i: Int, k: Long): Int = bitPos(i, k, Bits)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      {
        case Seq(e)       => BloomAggregate(e)
        case Seq(e, bits) =>
          // a non-foldable width would hit eval() with unbound references
          // (an opaque analyzer error) — fail with the actual contract;
          // reject (not clamp) a NULL or over-cap width so a caller bug
          // stays visible instead of silently becoming a MaxBits filter
          require(bits.foldable,
            s"bloom_agg numBits must be a foldable integer literal, got: ${bits.sql}")
          val v = bits.eval()
          require(v != null, "bloom_agg numBits must not be NULL")
          val w = v.asInstanceOf[Number].intValue()
          require(w <= MaxBits,
            s"bloom_agg numBits $w exceeds the $MaxBits-bit broadcast cap")
          BloomAggregate(e, w)
        case other => throw new IllegalArgumentException(
          s"bloom_agg takes (key[, numBits]), got ${other.size} args")
      },
      "built-in")

  def bloomAgg(spark: org.apache.spark.sql.SparkSession, key: Column): Column = {
    register(spark)
    call_function("bloom_agg", key)
  }

  /** Sized variant: width from [[sizeFor]] of the caller's measured or
    * estimated key cardinality. */
  def bloomAgg(spark: org.apache.spark.sql.SparkSession, key: Column, expectedKeys: Long): Column = {
    register(spark)
    call_function("bloom_agg", key, lit(sizeFor(expectedKeys)))
  }

  /** Membership test as pure integer Column arithmetic (codegen'd): every
    * hash's bit must be set. Identical position math to [[bitPos]]; the
    * filter width is read from the word-array length at runtime
    * (`size(bits)*64`), so one test expression works for any sizing. */
  def mightContain(bits: Column, key: Column): Column = {
    val m = (size(bits) * 64).cast("long")
    (0 until Hashes).map { i =>
      val pos = pmod(lit(coeffA(i)) * pmod(key, lit(Prime)) + lit(coeffB(i)), lit(Prime)) % m
      val word = element_at(bits, (pos / 64 + 1).cast("int"))
      call_function("shiftrightunsigned", word, pmod(pos, lit(64)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
