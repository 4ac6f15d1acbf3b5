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

/** Count–min sketch as a real Catalyst [[TypedImperativeAggregate]]:
  * a d×w counter matrix with proper PARTIAL aggregation — each task
  * sketches its partition, partials are `serialize`d (one flat byte
  * buffer), and `merge` is element-wise addition, which is associative
  * and commutative (spec-proven), so the shuffle moves d·w longs per
  * group instead of the raw keys. That is the whole point of sketches at
  * 100 TB: the per-group state is O(d·w), independent of cardinality.
  *
  * Hashing is the deterministic (aᵢ·k + bᵢ) mod p family (p = 2³¹−1,
  * Carter–Wegman), so estimates are engine-reproducible and the DuckDB
  * oracle replays the identical integer arithmetic.
  */
case class CmsAggregate(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import CmsAggregate._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Number].longValue()
      var d = 0
      while (d < Depth) {
        buf(d * Width + bucket(d, k)) += 1L
        d += 1
      }
    }
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
    Array.fill(Depth * Width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): CmsAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CmsAggregate =
    copy(child = newChild)
}

object CmsAggregate {
  val Depth = 4
  val Width = 256
  val Prime = 2147483647L
  /** Row-i pairwise-independent hash coefficients (odd a, spread b). */
  def coeffA(d: Int): Long = 1000003L * (2 * d + 1)
  def coeffB(d: Int): Long = 7919L * d + 12345L

  /** Shared by the aggregate, the estimate helper, and the oracle SQL. */
  def bucket(d: Int, k: Long): Int =
    (Math.floorMod(coeffA(d) * k + coeffB(d), Prime) % Width).toInt

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_sketch", exprs => CmsAggregate(exprs.head), "built-in")

  /** Aggregate Column: build the sketch over a long key column. */
  def cmsSketch(spark: org.apache.spark.sql.SparkSession, key: Column): Column = {
    register(spark)
    call_function("cms_sketch", key)
  }

  /** Point-estimate Column for a literal key over a sketch column:
    * min over depth rows of the key's counter (1-indexed element_at). */
  def estimate(sketch: Column, key: Long): Column = {
    import org.apache.spark.sql.functions._
    (0 until Depth).map { d =>
      element_at(sketch, d * Width + CmsAggregate.bucket(d, key) + 1)
    }.reduce(least(_, _))
  }

  /** DuckDB SQL for the same estimate from raw rows: counters rebuilt per
    * (depth, bucket) with identical integer arithmetic. `src` must expose
    * (grp, k); emits (grp, key, est) for the probe keys. */
  def estimateSql(src: String, probeKeys: Seq[Long]): String = {
    val depthRows = (0 until Depth)
      .map(d => s"($d, ${coeffA(d)}, ${coeffB(d)})").mkString(", ")
    val probeRows = probeKeys.mkString(", ")
    s"""h(d, ca, cb) AS (VALUES $depthRows),
       |cnt AS (SELECT grp, d, ((ca * k + cb) % $Prime) % $Width AS bucket, count(*) AS c
       |  FROM $src CROSS JOIN h GROUP BY 1, 2, 3),
       |probes(key) AS (SELECT unnest([$probeRows])),
       |est AS (SELECT g.grp AS grp, key, min(coalesce(c, 0)) AS est
       |  FROM probes CROSS JOIN (SELECT DISTINCT grp FROM $src) g
       |  CROSS JOIN h
       |  LEFT JOIN cnt ON cnt.grp = g.grp AND cnt.d = h.d
       |    AND cnt.bucket = ((h.ca * key + h.cb) % $Prime) % $Width
       |  GROUP BY 1, 2)""".stripMargin
  }
}
