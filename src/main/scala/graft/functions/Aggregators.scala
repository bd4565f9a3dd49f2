package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed [[Aggregator]]s — the TypedColumn capability class of the build
  * brief, beside the codegen scalar kernels ([[graft.expressions]]) and
  * the custom physical operator ([[graft.plans.AsOfJoin]]).
  *
  * [[TopKLong.topk]] is grouped EXACT top-k as an aggregate instead of a
  * window rank: the per-group state is a bounded k-array, so Spark's
  * partial aggregation (ObjectHashAggregate map-side combine) reduces
  * every partition to ≤ k values per group BEFORE the shuffle — the
  * window-rank formulation shuffles every row of every group and sorts
  * them, which at 100 TB is the difference between exchanging k·groups
  * values and exchanging the corpus. Merging two k-buffers is union +
  * re-trim, associative and order-insensitive, so any partitioning
  * yields the identical (sorted-descending) result — value-set
  * semantics make the output deterministic with no tiebreak needed.
  */
object Aggregators {

  /** Exact top-k largest Long values per group, emitted sorted
    * descending. Buffer is a plain unordered Array[Long] of ≤ k
    * elements: insert replaces the minimum only when the candidate
    * beats it (O(k) per row — k is a constant like 5, not a data size).
    */
  final class TopKLong(k: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    require(k >= 1 && k <= 1000000, s"k out of range: $k")

    override def zero: Array[Long] = Array.empty[Long]

    private def insert(buf: Array[Long], v: Long): Array[Long] =
      if (buf.length < k) buf :+ v
      else {
        var mi = 0
        var i = 1
        while (i < buf.length) { if (buf(i) < buf(mi)) mi = i; i += 1 }
        if (v > buf(mi)) { buf(mi) = v; buf } else buf
      }

    override def reduce(buf: Array[Long], v: java.lang.Long): Array[Long] =
      if (v == null) buf else insert(buf, v.longValue())

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var out = a
      var i = 0
      while (i < b.length) { out = insert(out, b(i)); i += 1 }
      out
    }

    override def finish(buf: Array[Long]): Array[Long] =
      buf.sorted(Ordering.Long.reverse)

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  object TopKLong {
    /** Column form for untyped `groupBy(...).agg(...)`. */
    def topk(col: Column, k: Int): Column =
      udaf(new TopKLong(k), Encoders.LONG).apply(col)
  }
}
