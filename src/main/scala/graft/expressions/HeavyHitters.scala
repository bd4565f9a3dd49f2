package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate` —
  * the custom-UDAF capability class: a mutable, serializable buffer
  * aggregated partially on every partition and merged exactly once per
  * group (standard partial+final topology, so the shuffle carries one
  * bounded sketch per partition, never the token stream).
  *
  * Semantics: top-`k` most frequent elements of an `array<string>` column
  * (e.g. document tokens), with counts. With `capacity >= |distinct|` the
  * counts are EXACT (the sketch never evicts), which is what makes the
  * operator oracle-verifiable on bounded vocabularies; at web scale the
  * same operator degrades gracefully to approximate heavy hitters with
  * `capacity ~ k/ε` — the classic answer to "what are the top tokens in
  * 100 TB of text" without a full-vocabulary shuffle.
  *
  * Output: `array<struct<token:string, cnt:long>>` sorted by (cnt desc,
  * token asc) — deterministic for golden tests.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Unit-weight Misra-Gries offer (the update() path; merge() compacts
    * whole sketches separately). When full, every counter drops by 1 —
    * live counters are always >= 1, so this is the weighted rule's
    * min-capped decrement for weight 1 — and zeroed entries evict.
    */
  private def offer(buf: mutable.HashMap[String, Long], token: String): Unit = {
    buf.get(token) match {
      case Some(c) => buf.update(token, c + 1L); ()
      case None =>
        if (buf.size < capacity) { buf.update(token, 1L); () }
        else {
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { t =>
            val nv = buf(t) - 1L
            if (nv <= 0) dead += t else buf.update(t, nv)
          }
          dead.foreach(buf.remove)
        }
    }
  }

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i)) offer(buf, a.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  /** Sketch merge (Agarwal et al., "Mergeable Summaries"): add counters
    * pointwise, then if over capacity subtract the (capacity+1)-th largest
    * count from everything and drop the non-positive tail — ONE O(n log n)
    * compaction per merge instead of an O(capacity) decrement scan per
    * merged token, with the same (additive) MG error guarantee.
    */
  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - capacity - 1) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { t =>
        val nv = buf(t) - cut
        if (nv <= 0) dead += t else buf.update(t, nv)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object HeavyHittersAgg {
  /** Column API: heavy_hitters(tokensCol, k) — exact while the group's
    * distinct count stays under `capacity`.
    */
  def heavy_hitters(tokens: Column, k: Int, capacity: Int = 4096): Column =
    ExprHelpers.col(
      HeavyHittersAgg(ExprHelpers.expr(tokens), k, capacity).toAggregateExpression())
}
