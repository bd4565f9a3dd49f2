package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Bounded-heap per-group top-k as a `TypedImperativeAggregate` — the
  * scale-safe replacement for `row_number().over(partitionBy(group))`
  * when the ranked table is data-sized: the window shape repartitions
  * the ENTIRE input onto |groups| partitions (with a handful of probe
  * queries that is a handful of tasks each sorting the whole corpus),
  * while this aggregate keeps k candidates per group PER MAP TASK and
  * shuffles only |partitions|·|groups| bounded buffers (standard
  * partial+final topology, the HeavyHittersAgg pattern).
  *
  * Semantics: the k (score, id) pairs that are FIRST under the total
  * order (score asc|desc, id asc) — the exact order the window it
  * replaces used, so results are deterministic and engine-portable.
  * Doubles are normalized (-0.0 → 0.0 on ingest) and compared with
  * `java.lang.Double.compare` (NaN greatest), matching Spark SQL's
  * double ordering.
  *
  * Output: `array<struct<score:double, id:long>>` in rank order —
  * `posexplode` turns position+1 into the dense rank.
  */
case class BoundedTopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  require(k >= 1, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty[(Double, Long)]

  /** (score asc|desc, id asc) — NaN greatest, −0.0 pre-normalized. */
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    val cs = if (asc) c else -c
    if (cs != 0) cs < 0 else a._2 < b._2
  }

  /** Amortized bound: let the buffer grow to 4k, then sort+truncate to
    * k — O(n log k)-ish total without a heap allocation per row.
    */
  private def compact(buf: mutable.ArrayBuffer[(Double, Long)]): Unit =
    if (buf.size > math.max(4 * k, 64)) {
      val kept = buf.sortWith(lt).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(
      buf: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // −0.0 + 0.0 = +0.0 (IEEE): normalize so the sign of zero can
      // never order two candidates differently from SQL engines.
      buf += ((s.asInstanceOf[Double] + 0.0, i.asInstanceOf[Long]))
      compact(buf)
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[(Double, Long)],
      other: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sortWith(lt).take(k)
      .map { case (s, i) => InternalRow(s, i) }.toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    // Pre-truncate: the shuffle only ever needs the k survivors.
    val kept = buf.sortWith(lt).take(k)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(kept.size)
    kept.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) {
      buf += ((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

object BoundedTopKAgg {
  /** Column API: top-k (score, id) pairs per group under
    * (score asc|desc, id asc). Inputs are cast to (double, long);
    * callers cast ids back to their original type on the way out.
    */
  def bounded_top_k(score: Column, id: Column, k: Int, asc: Boolean): Column =
    ExprHelpers.col(BoundedTopKAgg(
      ExprHelpers.expr(score.cast("double")),
      ExprHelpers.expr(id.cast("long")), k, asc).toAggregateExpression())
}
