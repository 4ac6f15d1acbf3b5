package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch as a Catalyst
  * [[TypedImperativeAggregate]] — the merge-semantics twin of
  * [[CmsAggregate]]: per-task partial registers, element-wise MAX merge
  * (associative, commutative, idempotent — the key property: re-merging a
  * partial NEVER inflates the estimate, unlike naive counters), m bytes of
  * state per group regardless of cardinality.
  *
  * The hash is a splitmix64-style finalizer (wrapping 64-bit arithmetic —
  * deterministic and engine-reproducible in the JVM, but NOT expressible
  * in DuckDB's non-wrapping BIGINT SQL, so this query is rows-only gated
  * with property specs, like the minhash/simhash family; Spark's own
  * `approx_count_distinct` covers the oracle-comparable HLL surface in
  * E17). Estimator: standard bias-corrected αₘ·m²/Σ2^(−Mⱼ) with the
  * linear-counting small-range correction.
  */
case class HllAggregate(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllAggregate._

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = mix(v.asInstanceOf[Number].longValue())
      val idx = (h >>> (64 - B)).toInt
      val w = h << B
      val rho = (if (w == 0L) 64 - B else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = java.lang.Long.valueOf(estimate(buf))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(n: Int): HllAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllAggregate =
    copy(child = newChild)
}

object HllAggregate {
  val B = 8          // register-index bits
  val M: Int = 1 << B // 256 registers → ~6.5% standard error
  private val AlphaM = 0.7213 / (1.0 + 1.079 / M)

  /** splitmix64 finalizer: deterministic, well-mixed, wrapping i64 ops. */
  def mix(k0: Long): Long = {
    var k = k0 + 0x9E3779B97F4A7C15L
    k = (k ^ (k >>> 30)) * 0xBF58476D1CE4E5B9L
    k = (k ^ (k >>> 27)) * 0x94D049BB133111EBL
    k ^ (k >>> 31)
  }

  def estimate(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = AlphaM * M.toDouble * M.toDouble / sum
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) // linear counting
      else e
    math.rint(corrected).toLong
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_sketch", exprs => HllAggregate(exprs.head), "built-in")

  def hllSketch(spark: org.apache.spark.sql.SparkSession, key: Column): Column = {
    register(spark)
    call_function("hll_sketch", key)
  }
}
