package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** top_k(struct, k): the k largest struct values per group, by the
  * struct's lexicographic ordering, returned as a descending array.
  *
  * This is the aggregation-shaped top-k-per-group: each task keeps a
  * BOUNDED k-element min-heap (partial aggregation), shuffles only the
  * k·groups partial heaps, and merges them — versus the window formulation
  * (`row_number() OVER (PARTITION BY … ORDER BY …) <= k`), which shuffles
  * and SORTS every row of every group. At 100 TB with small k the heap
  * aggregate moves orders of magnitude less data. Descending-first sort
  * keys: negate a component to flip its direction (lexicographic struct
  * comparison is ascending).
  */
case class TopK(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[InternalRow]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  private lazy val structType: StructType = child.dataType.asInstanceOf[StructType]
  private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[Any]]
  // min-heap: head is the SMALLEST retained value, evicted first
  private lazy val heapOrdering: Ordering[InternalRow] =
    ordering.asInstanceOf[Ordering[InternalRow]].reverse
  private lazy val proj = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if RowOrdering.isOrderable(s) && kExpr.foldable &&
        kExpr.dataType == IntegerType =>
      kExpr.eval() match {
        case i: Integer if i > 0 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires k > 0, got $other")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (orderable struct, int literal k)")
  }
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[InternalRow] =
    scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrdering)

  override def update(
      heap: scala.collection.mutable.PriorityQueue[InternalRow],
      input: InternalRow): scala.collection.mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) add(heap, v.asInstanceOf[InternalRow])
    heap
  }

  override def merge(
      heap: scala.collection.mutable.PriorityQueue[InternalRow],
      other: scala.collection.mutable.PriorityQueue[InternalRow]):
      scala.collection.mutable.PriorityQueue[InternalRow] = {
    other.foreach(add(heap, _))
    heap
  }

  private def add(heap: scala.collection.mutable.PriorityQueue[InternalRow],
      row: InternalRow): Unit = {
    if (heap.size < k) {
      heap.enqueue(proj(row).copy())
    } else if (ordering.compare(row, heap.head) > 0) {
      heap.dequeue()
      heap.enqueue(proj(row).copy())
    }
  }

  override def eval(heap: scala.collection.mutable.PriorityQueue[InternalRow]): Any = {
    val arr = heap.toArray
      .sorted(ordering.asInstanceOf[Ordering[InternalRow]])
      .reverse // descending: largest first
    new GenericArrayData(arr.map(_.asInstanceOf[Any]))
  }

  override def serialize(heap: scala.collection.mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { row =>
      val u = row.asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(structType.length)
      row.pointTo(buf, len)
      heap.enqueue(row)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
