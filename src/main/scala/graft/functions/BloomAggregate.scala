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
  * Merge is bitwise OR (associative, commutative, idempotent); hashing
  * is the same Carter–Wegman family as CMS, so membership tests are
  * plain integer Column arithmetic ([[mightContain]] — no UDF, stays in
  * codegen).
  */
case class BloomAggregate(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import BloomAggregate._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Number].longValue()
      var i = 0
      while (i < Hashes) {
        val pos = bitPos(i, k)
        buf(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Words)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): BloomAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BloomAggregate =
    copy(child = newChild)
}

object BloomAggregate {
  val Bits = 8192
  val Words: Int = Bits / 64
  val Hashes = 4
  val Prime = 2147483647L
  def coeffA(i: Int): Long = 999983L * (2 * i + 1)
  def coeffB(i: Int): Long = 104729L * i + 7919L

  /** Bit position of hash i for key k (nonnegative keys; shared by the
    * aggregate and the Column-side membership test). */
  def bitPos(i: Int, k: Long): Int =
    (Math.floorMod(coeffA(i) * Math.floorMod(k, Prime) + coeffB(i), Prime) % Bits).toInt

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", exprs => BloomAggregate(exprs.head), "built-in")

  def bloomAgg(spark: org.apache.spark.sql.SparkSession, key: Column): Column = {
    register(spark)
    call_function("bloom_agg", key)
  }

  /** Membership test as pure integer Column arithmetic (codegen'd): every
    * hash's bit must be set. Identical position math to [[bitPos]]. */
  def mightContain(bits: Column, key: Column): Column =
    (0 until Hashes).map { i =>
      val pos = pmod(lit(coeffA(i)) * pmod(key, lit(Prime)) + lit(coeffB(i)), lit(Prime)) % Bits
      val word = element_at(bits, (pos / 64 + 1).cast("int"))
      call_function("shiftrightunsigned", word, pmod(pos, lit(64)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
