package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the frequency
  * sketch completing the approx family next to HLL++ (cardinality),
  * approx_percentile (quantiles), and the bloom pair (membership).
  *
  * A d×w counter grid; each value increments one counter per row (row i
  * uses xxhash64 with seed i, mod w). An estimate reads the MIN of its d
  * counters: never an underestimate, and over by more than εN (ε = e/w)
  * with probability only δ = e^-d. At 100 TB this is THE shape for "how
  * often does each of these 10^9 tokens appear": the grid is a few
  * hundred KB of mergeable state — partial-combined like any aggregate —
  * where an exact count would shuffle every token.
  *
  * Build/probe split mirrors Spark's bloom pair (bloom_agg /
  * bloom_might_contain): `cms_agg(expr, d, w)` aggregates the grid as
  * BINARY; `cms_estimate(sketch, expr, w)` probes it — the sketch side
  * arrives as a scalar subquery (foldable per-batch), so the probe is a
  * per-row codegen lookup against a driver-resident grid.
  *
  * Hash family note: row seeds are just 0..d-1 over xxhash64 — pairwise
  * independence is all CMS needs, and seeded xxhash64 rows are
  * independent enough in practice (same family Spark's bloom uses). */
object CountMin {

  /** Little-endian pack of the counter grid (d·w longs) → bytes. */
  def pack(grid: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(grid.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(grid)
    bb.array()
  }

  def unpack(bytes: Array[Byte]): Array[Long] = {
    val lb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    val out = new Array[Long](lb.remaining())
    lb.get(out)
    out
  }

  /** Row-i counter index of a UTF8String value: xxhash64(bytes, seed=i)
    * floor-mod w. */
  def slot(v: UTF8String, seed: Int, w: Int): Int = {
    val h = XXH64.hashUnsafeBytes(v.getBaseObject, v.getBaseOffset, v.numBytes(), seed.toLong)
    val m = (h % w).toInt
    if (m < 0) m + w else m
  }

  /** Probe: min over the d row counters for `v`. */
  def estimate(sketch: Array[Byte], v: UTF8String, w: Int): Long = {
    val grid = unpack(sketch)
    val d = grid.length / w
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = grid(i * w + slot(v, i, w))
      if (c < best) best = c
      i += 1
    }
    if (best == Long.MaxValue) 0L else best
  }
}

/** cms_agg(expr, depth, width): count-min sketch of a group's string
  * values, as a BINARY grid of depth·width little-endian longs. */
case class CountMinAgg(
    child: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Int]
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
    else if (!depthExpr.foldable || depthExpr.dataType != IntegerType ||
        !widthExpr.foldable || widthExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires int literal depth/width")
    else (depthExpr.eval(), widthExpr.eval()) match {
      case (d: Integer, w: Integer) if d > 0 && d <= 16 && w > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 0 < depth <= 16 and width > 0, got $other")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_agg"
  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(grid: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < depth) {
        grid(i * width + CountMin.slot(s, i, width)) += 1
        i += 1
      }
    }
    grid
  }

  override def merge(grid: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < grid.length) { grid(i) += other(i); i += 1 }
    grid
  }

  override def eval(grid: Array[Long]): Any = CountMin.pack(grid)
  override def serialize(grid: Array[Long]): Array[Byte] = CountMin.pack(grid)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CountMin.unpack(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0), depthExpr = newChildren(1), widthExpr = newChildren(2))
}

/** cms_estimate(sketch, expr, width): probe a cms_agg sketch for the
  * estimated count of a string value. The sketch argument is expected
  * foldable (scalar subquery / literal), same contract as
  * bloom_might_contain — the probe side is a per-row codegen lookup. */
case class CountMinEstimate(left: Expression, right: Expression, width: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, string value)")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketch: Any, v: Any): Any =
    CountMin.estimate(sketch.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, v) =>
      s"graft.functions.CountMin.estimate($s, $v, $width)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}
