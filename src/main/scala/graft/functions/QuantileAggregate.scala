package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable quantile sketch as a real Catalyst [[TypedImperativeAggregate]]
  * — the third member of the sketch family (CMS = frequency, HLL =
  * cardinality, this = rank/quantile). E15's exact `percentile()` buffers
  * EVERY value per group; at 100 TB that is O(rows) executor state. This
  * sketch keeps a fixed histogram of [[QuantileAggregate.NBins]] counters
  * over a known [lo, hi): each task sketches its partition (PARTIAL
  * aggregation), partials serialize to one flat buffer, and `merge` is
  * element-wise addition — associative and commutative (spec-proven), so
  * the shuffle moves NBins longs per group regardless of cardinality, and
  * the quantile error is bounded by one bin width.
  *
  * Deterministic by construction (fixed bins, no compaction randomness —
  * unlike KLL), so the DuckDB oracle replays the identical arithmetic:
  * bin = clamp(floor((v − lo) / w)), w = (hi − lo) / NBins, and the
  * q-quantile is the lower edge of the first bin whose cumulative count
  * reaches ceil(q·N). Reference anchor: op-etl summarizes run-duration
  * distributions driver-side (monitoring.py get_summary); this is the
  * distributed, mergeable form of that statistic.
  */
case class QuantileAggregate(
    child: Expression,
    lo: Double,
    hi: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import QuantileAggregate._

  // a degenerate domain would silently clamp every value into bin 0
  // (NaN bin math) — fail loudly at construction instead
  require(lo < hi, s"quantile_sketch needs lo < hi, got [$lo, $hi)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](NBins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) buf(bin(v.asInstanceOf[Number].doubleValue(), lo, hi)) += 1L
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(NBins)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): QuantileAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QuantileAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): QuantileAggregate =
    copy(child = newChild)
}

object QuantileAggregate {
  val NBins = 256

  /** Shared by the aggregate, the Spark estimate path, and the oracle SQL:
    * clamped fixed-width binning. Kept as (v − lo) / ((hi − lo) / NBins)
    * with the SAME operation order on both engines so the doubles match
    * bitwise. */
  def bin(v: Double, lo: Double, hi: Double): Int = {
    val b = math.floor((v - lo) / ((hi - lo) / NBins))
    if (b < 0) 0 else if (b >= NBins) NBins - 1 else b.toInt
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_sketch",
      // cast the child to double up front: update() then sees a plain
      // java.lang.Double for EVERY numeric input type, including decimals
      // (whose Spark runtime value is not a java.lang.Number)
      exprs => QuantileAggregate(
        org.apache.spark.sql.catalyst.expressions.Cast(
          exprs.head, org.apache.spark.sql.types.DoubleType),
        evalDouble(exprs(1)), evalDouble(exprs(2))),
      "built-in")

  private def evalDouble(e: Expression): Double =
    e.eval(InternalRow.empty).asInstanceOf[Number].doubleValue()

  /** Aggregate Column: sketch a numeric column over the fixed [lo, hi). */
  def quantileSketch(spark: org.apache.spark.sql.SparkSession, v: Column,
      lo: Double, hi: Double): Column = {
    register(spark)
    call_function("quantile_sketch", v, org.apache.spark.sql.functions.lit(lo),
      org.apache.spark.sql.functions.lit(hi))
  }

  /** DuckDB SQL rebuilding the same estimates from raw rows. `src` must
    * expose (grp, v); emits CTEs ending in `est(grp, q, est)` for the
    * probe quantiles — identical binning, identical rank rule. */
  def estimateSql(src: String, lo: String, hi: String, qs: Seq[Double]): String = {
    // CAST: a bare 0.25 literal is DECIMAL in DuckDB; the Spark side is
    // DOUBLE throughout
    val qRows = qs.map(q => s"(CAST($q AS DOUBLE))").mkString(", ")
    s"""b AS (SELECT grp,
       |  CAST(least(greatest(floor((v - $lo) / (($hi - $lo) / $NBins)), 0), ${NBins - 1}) AS INT) AS bin
       | FROM $src),
       |cnt AS (SELECT grp, bin, count(*) AS c FROM b GROUP BY 1, 2),
       |tot AS (SELECT grp, sum(c) AS n FROM cnt GROUP BY 1),
       |cum AS (SELECT grp, bin, sum(c) OVER (PARTITION BY grp ORDER BY bin) AS cum FROM cnt),
       |qs(q) AS (VALUES $qRows),
       |est AS (SELECT cum.grp AS grp, q, min(bin) AS qbin
       |  FROM cum JOIN tot ON cum.grp = tot.grp CROSS JOIN qs
       |  WHERE cum >= ceil(q * n) GROUP BY 1, 2)""".stripMargin
  }
}
