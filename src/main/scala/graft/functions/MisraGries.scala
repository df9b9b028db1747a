package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** `mg_sketch(item, k)` -> array<struct<item string, est long>>: the
  * Misra–Gries frequent-items summary with k counters.
  *
  * The scale story: exact token frequencies over a 100 TB corpus
  * shuffle a vocabulary-sized key space; this aggregate keeps at most k
  * counters per partition and merges summaries pairwise (Agarwal et
  * al.'s mergeable-summaries bound: total undercount <= n/k after any
  * merge tree), so only numPartitions x k counters ever cross the wire.
  * DETERMINISTIC GUARANTEE, not probabilistic: every item with true
  * frequency > n/k survives in the final summary — which is what makes
  * the downstream heavy-hitters pipeline oracle-checkable even though
  * the summary itself is approximate. Estimates are lower bounds
  * (true - n/k <= est <= true); consumers re-verify candidates exactly.
  */
case class MisraGriesSketch(child: Expression, k: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(k > 1)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def shrink(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything and drop
      // non-positives — the merge-time generalization of MG's
      // decrement-all step (equal to it when the surplus is 1)
      val m = buf.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      buf.filterInPlace((_, c) => c > m)
      if (m > 0) buf.mapValuesInPlace((_, c) => c - m)
    }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.updateWith(s) {
        case Some(c) => Some(c + 1)
        case None => Some(1L)
      }
      shrink(buf)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) =>
      buf.updateWith(s) {
        case Some(c0) => Some(c0 + c)
        case None => Some(c)
      }
    }
    shrink(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "mg_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MisraGries {
  /** Aggregate Column: the k-counter Misra–Gries summary of `item`. */
  def mg_sketch(item: Column, k: Int): Column =
    SparkBridge.column(MisraGriesSketch(
      SparkBridge.expression(item.cast("string")), k).toAggregateExpression())
}
