package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Deterministic mergeable rank/quantile sketch (the MRL/KLL compactor
  * hierarchy — Manku-Rajagopalan-Lindsay 1998, Karnin-Lang-Liberty 2016
  * — with DETERMINISTIC compaction: sort the full level-`k` buffer, keep
  * the odd-index survivors at doubled weight). Randomized compaction
  * gives tighter expected error but breaks bit-replayability; here every
  * (data, partitioning)-identical run yields the identical sketch, and
  * the certificate below never relies on the randomized analysis — the
  * sketch TRACKS its own worst-case rank-error bound exactly:
  *
  *   - each compaction of a level with item weight w perturbs the
  *     estimated rank of ANY query point by at most w (the classic MRL
  *     argument — half the items move by one w step), so `err` sums w
  *     over all compactions performed anywhere in the tree;
  *   - merges concatenate levels and add `err`s (then re-compact,
  *     growing `err` by exactly the compactions performed), so the bound
  *     survives arbitrary partitioning/merge orders;
  *   - answering a quantile adds at most one max-weight granularity
  *     step: the chosen stored value's estimated rank is within
  *     2^maxLevel of the target.
  *
  * So for every target rank t, the certificate (INTERVAL form — exact
  * even on duplicate-heavy data, where a value's true rank is itself
  * the interval [count(< v), count(≤ v)]):
  * t ∈ [count(< est) − bound, count(≤ est) + bound] with
  * bound = 2·err + 2^maxLevel — an engine-verifiable claim checked by
  * joining the estimates back against the EXACT data
  * (q_quantile_sketch), and a falsifiable one (QuantileSketchSpec
  * shrinks k until the bound is the only thing between the estimate
  * and garbage, and pins the all-duplicates case a point-rank
  * formulation cannot satisfy). Space: O(k · log(N/k)) per group;
  * the shuffle carries one sketch per partition, never the values.
  *
  * `eval` output: struct(n, bound, targets, ests) where `targets(i)` =
  * max(1, ceil(ps(i)·n/100)) in EXACT integer arithmetic ((p·n + 99)
  * div 100 — reproducible in any SQL engine) and `ests(i)` is the
  * stored value whose estimated rank is nearest the target.
  */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    percents: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch] {

  require(k >= 8, s"k must be >= 8, got $k")
  require(percents.nonEmpty && percents.forall(p => p >= 0 && p <= 100),
    s"percents must be in [0,100], got $percents")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("bound", LongType, nullable = false),
    StructField("targets", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("ests", ArrayType(LongType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): QSketch = new QSketch(k)

  override def update(buf: QSketch, input: InternalRow): QSketch = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: QSketch, other: QSketch): QSketch = { buf.mergeIn(other); buf }

  override def eval(buf: QSketch): Any = {
    val (values, weights) = buf.sortedItems()
    val targets = percents.map { p =>
      math.max(1L, (p.toLong * buf.n + 99L) / 100L)
    }.toArray
    // Collapse duplicate stored VALUES into runs: a run's estimated rank
    // is an INTERVAL [cum before the run, cum through the run], exactly
    // like the true rank of a duplicated value is the interval
    // [count(< v), count(≤ v)]. Estimates and the certificate both work
    // on intervals — a point-rank formulation is simply unsatisfiable on
    // duplicate-heavy data (all-equal input: any answer has
    // count(≤ est) = n while the median target is n/2).
    val runs = {
      val vs = ArrayBuffer.empty[Long]; val lo = ArrayBuffer.empty[Long]
      val hi = ArrayBuffer.empty[Long]
      var cum = 0L; var i = 0
      while (i < values.length) {
        val v = values(i); var w = 0L
        while (i < values.length && values(i) == v) { w += weights(i); i += 1 }
        vs += v; lo += cum; hi += cum + w; cum += w
      }
      (vs.toArray, lo.toArray, hi.toArray)
    }
    val ests = targets.map { t =>
      // pick the run whose estimated-rank interval is nearest the target
      // (distance 0 when t falls inside it; first wins ties)
      val (vs, lo, hi) = runs
      var best = if (vs.isEmpty) 0L else vs(0)
      var bestDist = Long.MaxValue
      var i = 0
      while (i < vs.length) {
        val dist =
          if (t >= lo(i) && t <= hi(i)) 0L
          else math.min(math.abs(t - lo(i)), math.abs(t - hi(i)))
        if (dist < bestDist) { bestDist = dist; best = vs(i) }
        i += 1
      }
      best
    }
    // Certificate (interval form): the chosen run's estimated interval
    // is within err+maxWeight of t (successive run endpoints step by
    // ≤ maxWeight inside the sketch's total weight W ≥ n − err), and
    // each true endpoint is within err of its estimated endpoint — so
    // [count(< est) − bound, count(≤ est) + bound] must contain t with
    // bound = 2·err + maxWeight.
    InternalRow(buf.n, 2L * buf.err + buf.maxWeight,
      new GenericArrayData(targets), new GenericArrayData(ests))
  }

  override def serialize(buf: QSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): QSketch = QSketch.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Mutable compactor-hierarchy state. Level l holds items of weight 2^l;
  * level 0 is the raw ingest buffer. Compaction: sort, keep odd indices
  * (1, 3, 5, …) at doubled weight — deterministic, order-independent
  * AFTER the sort, and err grows by the level's item weight.
  */
final class QSketch(k: Int) {
  private[expressions] var levels: ArrayBuffer[ArrayBuffer[Long]] =
    ArrayBuffer(ArrayBuffer.empty[Long])
  var n: Long = 0L
  var err: Long = 0L

  def maxWeight: Long = 1L << (levels.length - 1)

  def offer(v: Long): Unit = {
    levels(0) += v
    n += 1
    if (levels(0).length >= k) compact(0)
  }

  private def compact(l: Int): Unit = {
    val buf = levels(l)
    if (buf.length < 2) return
    val sorted = buf.sorted
    if (l + 1 >= levels.length) levels += ArrayBuffer.empty[Long]
    val up = levels(l + 1)
    var i = 1
    while (i < sorted.length) { up += sorted(i); i += 2 }
    // an odd count drops the unpaired smallest item entirely: still at
    // most one w-step of rank error for any query point
    buf.clear()
    err += (1L << l)
    if (up.length >= k) compact(l + 1)
  }

  def mergeIn(other: QSketch): Unit = {
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Long]
    var l = 0
    while (l < other.levels.length) {
      levels(l) ++= other.levels(l)
      l += 1
    }
    n += other.n
    err += other.err
    l = 0
    while (l < levels.length) {
      if (levels(l).length >= k) compact(l)
      l += 1
    }
  }

  /** All stored items merged into one (value-ascending) sequence with
    * their weights.
    */
  def sortedItems(): (Array[Long], Array[Long]) = {
    val pairs = ArrayBuffer.empty[(Long, Long)]
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(v => pairs += ((v, w)))
      l += 1
    }
    val sorted = pairs.sortBy(_._1).toArray
    (sorted.map(_._1), sorted.map(_._2))
  }

  /** Estimated rank of v: Σ weight over stored items ≤ v. */
  def estRank(v: Long): Long = {
    var r = 0L
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(x => if (x <= v) r += w)
      l += 1
    }
    r
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(n)
    out.writeLong(err)
    out.writeInt(levels.length)
    levels.foreach { buf =>
      out.writeInt(buf.length)
      buf.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }
}

object QSketch {
  def deserialize(bytes: Array[Byte], k: Int): QSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new QSketch(k)
    s.n = in.readLong()
    s.err = in.readLong()
    val nl = in.readInt()
    s.levels = ArrayBuffer.fill(nl)(ArrayBuffer.empty[Long])
    var l = 0
    while (l < nl) {
      val m = in.readInt()
      var i = 0
      while (i < m) { s.levels(l) += in.readLong(); i += 1 }
      l += 1
    }
    s
  }
}

object QuantileSketchAgg {
  /** Column API: quantile_sketch(valueCol, k, percents) →
    * struct(n, bound, targets, ests). The certificate contract:
    * targets(i) ∈ [count(v < ests(i)) − bound, count(v ≤ ests(i)) + bound].
    */
  def quantile_sketch(value: Column, k: Int, percents: Seq[Int]): Column =
    ExprHelpers.col(
      QuantileSketchAgg(ExprHelpers.expr(value), k, percents).toAggregateExpression())
}
