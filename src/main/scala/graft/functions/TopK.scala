package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._
import scala.collection.mutable

/** `top_k_by_score(score, id, k)` -> array<struct<score double, id long>>,
  * ordered by (score desc, id asc).
  *
  * The scale story: a window `row_number` top-k shuffles EVERY scored row
  * to sort it; this aggregate keeps a k-bounded heap per partition and
  * merges heaps, so only numPartitions x k candidates ever cross the
  * wire — the treeAggregate pattern, expressed as a Catalyst aggregate
  * that composes with groupBy/AQE like any built-in. Results are exact
  * and deterministic (ties broken by id asc).
  */
case class TopKByScore(scoreExpr: Expression, idExpr: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {
  require(k > 0)

  // max of this ordering = the WORST kept element (lowest score; on ties,
  // highest id) so dequeue() evicts correctly when the heap exceeds k
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e => buf.enqueue(e); if (buf.size > k) buf.dequeue() }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy(e => (-e._1, e._2))
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def prettyName: String = "top_k_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopK {
  /** Aggregate Column: top-k (score, id) pairs per group. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    SparkBridge.column(TopKByScore(
      SparkBridge.expression(score.cast("double")),
      SparkBridge.expression(id.cast("long")), k).toAggregateExpression())
}
