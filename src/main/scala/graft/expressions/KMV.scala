package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002)
  * as a `TypedImperativeAggregate` — the [[HeavyHittersAgg]] capability
  * pattern for cardinality: each partition keeps only the k SMALLEST
  * distinct hash values, partials merge by set-union-then-trim, and the
  * shuffle carries one k-long sketch per partition, never the key stream.
  *
  * Unlike HLL (whose register layout is engine-private, forcing the
  * q_approx_distinct within-bounds certificate), the KMV state is just
  * "the k smallest distinct values of a hash function" — a set property
  * independent of input order and partitioning. Fed a PORTABLE hash
  * (Sampling.portableUniform's md5 prefix), the whole sketch — and the
  * estimate (k-1)·2^32 div h_k derived from it — is bit-replayable in
  * any engine: the approximate VALUES are oracle-checkable, the
  * q_cm_sketch discipline applied to cardinality.
  *
  * Output: the sketch as a sorted `array<long>` (ascending, at most k
  * elements). `size < k` means the group's full distinct-hash set is in
  * hand (exact mode); otherwise element k is h_k.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def offer(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last && !buf.contains(h)) {
      buf.remove(buf.last)
      buf.add(h)
      ()
    }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Long].map(Long.box))

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KmvSketchAgg {
  /** Column API: kmv_sketch(hashCol, k) → ascending array of the k
    * smallest distinct hash values. Pair with a portable hash for
    * cross-engine-replayable estimates.
    */
  def kmv_sketch(hash: Column, k: Int): Column =
    ExprHelpers.col(KmvSketchAgg(ExprHelpers.expr(hash), k).toAggregateExpression())
}
