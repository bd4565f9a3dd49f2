package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Per-group greedy Maximal Marginal Relevance selection as a
  * `TypedImperativeAggregate` — the scale shape for
  * [[graft.operators.Retrieval.mmrRerank]]: one hash aggregate keyed by
  * `query_id` replaces k driver-paced join rounds over a `coalesce(1)`
  * snapshot (the r15 verdict's one scale-killer), so MMR parallelizes
  * across queries and the job count is CONSTANT in k. State per group is
  * bounded by construction: ≤ `maxCandidates` (id, rel) entries plus the
  * ≤ C² candidate-pair sims — both capped LOUDLY, never data-sized.
  *
  * The aggregate consumes a tagged union (one input per row):
  * `kind` 0 = candidate (`a` = id, `v` = rel×10⁶), `kind` 1 = directed
  * sim pair (`a`, `b`, `v` = sim×10⁶). Greedy chain identical to the
  * join-loop rendering (RetrievalSpec pins checksum equality): round 1
  * argmax rel; round r argmax λ·rel − (1000−λ)·max_{s∈sel} sim(id, s);
  * ties break by id ascending. All arithmetic is exact Long via
  * `multiplyExact`/`subtractExact` (loud on overflow, never wraps), and
  * a candidate MISSING a sim pair to a selected id is a CONTRACT
  * violation that throws — not a silently shorter result (r15 advice on
  * the loop's inner join).
  *
  * Output: `array<struct<sel_rank:long, id:long, rel:long>>` in
  * selection order, length min(k, |candidates|).
  */
case class MmrSelectAgg(
    kind: Expression,
    a: Expression,
    b: Expression,
    v: Expression,
    k: Int,
    lambdaPm: Long,
    maxCandidates: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MmrSelectAgg.State] {

  require(k >= 1, s"k must be >= 1: $k")
  require(lambdaPm >= 0 && lambdaPm <= 1000, s"lambda out of per-mille range: $lambdaPm")
  require(maxCandidates >= 1, s"maxCandidates must be >= 1: $maxCandidates")

  override def children: Seq[Expression] = Seq(kind, a, b, v)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sel_rank", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("rel", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MmrSelectAgg.State = new MmrSelectAgg.State()

  private def putCand(st: MmrSelectAgg.State, id: Long, rel: Long): Unit = {
    st.cands.get(id) match {
      case Some(prev) if prev != rel =>
        throw new IllegalStateException(
          s"mmr_select: candidate $id arrived with conflicting rel values ($prev vs $rel)")
      case None =>
        if (st.cands.size >= maxCandidates)
          throw new IllegalStateException(
            s"mmr_select: candidate set exceeds maxCandidates=$maxCandidates — bound the upstream top-C")
        st.cands.put(id, rel)
        ()
      case _ => ()
    }
  }

  private def putSim(st: MmrSelectAgg.State, ida: Long, idb: Long, sim: Long): Unit = {
    val key = (ida, idb)
    st.sims.get(key) match {
      case Some(prev) if prev != sim =>
        throw new IllegalStateException(
          s"mmr_select: sim pair ($ida, $idb) arrived with conflicting values ($prev vs $sim)")
      case None =>
        if (st.sims.size >= maxCandidates.toLong * maxCandidates)
          throw new IllegalStateException(
            s"mmr_select: sim-pair set exceeds maxCandidates^2 — pairs must cover candidates only")
        st.sims.put(key, sim)
        ()
      case _ => ()
    }
  }

  override def update(st: MmrSelectAgg.State, input: InternalRow): MmrSelectAgg.State = {
    val kd = kind.eval(input)
    val av = a.eval(input)
    val vv = v.eval(input)
    if (kd != null && av != null && vv != null) {
      kd.asInstanceOf[Long] match {
        case 0L => putCand(st, av.asInstanceOf[Long], vv.asInstanceOf[Long])
        case 1L =>
          val bv = b.eval(input)
          if (bv != null) putSim(st, av.asInstanceOf[Long], bv.asInstanceOf[Long],
            vv.asInstanceOf[Long])
        case other =>
          throw new IllegalStateException(s"mmr_select: kind must be 0 or 1, got $other")
      }
    }
    st
  }

  override def merge(st: MmrSelectAgg.State, other: MmrSelectAgg.State): MmrSelectAgg.State = {
    other.cands.foreach { case (id, rel) => putCand(st, id, rel) }
    other.sims.foreach { case ((ida, idb), sim) => putSim(st, ida, idb, sim) }
    st
  }

  override def eval(st: MmrSelectAgg.State): Any = {
    // ids ascending once: every argmax scans in id order, so "ties break
    // by id ascending" is the first-wins rule with a strict > compare
    val ids = st.cands.keysIterator.toArray.sorted
    val selected = mutable.ArrayBuffer.empty[(Long, Long)] // (id, rel)
    val remaining = mutable.LinkedHashSet.empty[Long]
    ids.foreach(remaining += _)
    val maxSim = mutable.HashMap.empty[Long, Long]

    def simTo(id: Long, sel: Long): Long =
      st.sims.getOrElse((id, sel),
        throw new IllegalStateException(
          s"mmr_select: no sim pair for candidate $id to selected $sel — " +
            "simPairs must cover both orientations of every candidate pair"))

    var round = 0
    while (round < k && remaining.nonEmpty) {
      var bestId = Long.MinValue
      var bestScore = Long.MinValue
      var found = false
      remaining.foreach { id =>
        val rel = st.cands(id)
        val score =
          if (round == 0) rel
          else Math.subtractExact(
            Math.multiplyExact(lambdaPm, rel),
            Math.multiplyExact(1000L - lambdaPm, maxSim(id)))
        if (!found || score > bestScore) {
          found = true
          bestScore = score
          bestId = id
        }
      }
      selected += ((bestId, st.cands(bestId)))
      remaining -= bestId
      remaining.foreach { id =>
        val s = simTo(id, bestId)
        maxSim.get(id) match {
          case Some(prev) => if (s > prev) maxSim.put(id, s)
          case None       => maxSim.put(id, s)
        }
        ()
      }
      round += 1
    }
    new GenericArrayData(selected.zipWithIndex.map { case ((id, rel), i) =>
      InternalRow((i + 1).toLong, id, rel)
    }.toArray[Any])
  }

  override def serialize(st: MmrSelectAgg.State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(st.cands.size)
    st.cands.foreach { case (id, rel) => out.writeLong(id); out.writeLong(rel) }
    out.writeInt(st.sims.size)
    st.sims.foreach { case ((ida, idb), s) =>
      out.writeLong(ida); out.writeLong(idb); out.writeLong(s)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MmrSelectAgg.State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new MmrSelectAgg.State()
    var n = in.readInt()
    while (n > 0) { st.cands.put(in.readLong(), in.readLong()); n -= 1 }
    n = in.readInt()
    while (n > 0) { st.sims.put((in.readLong(), in.readLong()), in.readLong()); n -= 1 }
    st
  }

  override def withNewMutableAggBufferOffset(offset: Int): MmrSelectAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MmrSelectAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(kind = c(0), a = c(1), b = c(2), v = c(3))
}

object MmrSelectAgg {
  /** Bounded per-group MMR state: the candidate map and the candidate-pair
    * sim map — ≤ maxCandidates and ≤ maxCandidates² entries respectively,
    * enforced loudly at insert.
    */
  final class State {
    val cands: mutable.HashMap[Long, Long] = mutable.HashMap.empty
    val sims: mutable.HashMap[(Long, Long), Long] = mutable.HashMap.empty
  }

  /** Column API over the tagged-union encoding: `kind` 0 rows carry a
    * candidate (`a` = id, `v` = rel), `kind` 1 rows a directed sim pair.
    */
  def mmr_select(
      kind: Column, a: Column, b: Column, v: Column,
      k: Int, lambdaPm: Long, maxCandidates: Int = 1024): Column =
    ExprHelpers.col(MmrSelectAgg(
      ExprHelpers.expr(kind.cast("long")),
      ExprHelpers.expr(a.cast("long")),
      ExprHelpers.expr(b.cast("long")),
      ExprHelpers.expr(v.cast("long")),
      k, lambdaPm, maxCandidates).toAggregateExpression())
}
