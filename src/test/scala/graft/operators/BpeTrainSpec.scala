package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves [[Bpe.train]] (the distributed double-space-replace trainer
  * loop) against a sequential in-memory reference implementing the
  * canonical BPE semantics directly: weighted adjacent-pair counts
  * (overlapping adjacencies counted, as Sennrich's get_stats does),
  * argmax by (count desc, pair lexicographic), greedy LEFT-TO-RIGHT
  * NON-OVERLAPPING application. The whole merge SEQUENCE and the final
  * symbolizations must agree — one drifted round breaks every later
  * comparison.
  */
class BpeTrainSpec extends SparkSpec {

  private def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val buf = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        buf += (a + b); i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.result()
  }

  private def refTrain(vocab: Seq[(String, Long)], n: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    var state = vocab.map { case (w, wt) => (w, w.map(_.toString).toVector, wt) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (_, syms, wt) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + wt
          case _ => ()
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((step, a, b, cnt))
        state = state.map { case (w, syms, wt) => (w, applyMerge(syms, a, b), wt) }
        step += 1
      }
    }
    (out.result(), state.map(t => t._1 -> t._2).toMap)
  }

  private def runTrain(vocab: Seq[(String, Long)], n: Int) = {
    import spark.implicits._
    val df = vocab.toDF("w", "wt")
    val (merges, finalState) = Bpe.train(df, "w", "wt", n)
    val reprs = finalState.collect()
      .map(r => r.getString(0) ->
        r.getString(2).trim.split("  ").toVector.filter(_.nonEmpty)).toMap
    (merges, reprs)
  }

  test("full merge sequence and final symbolizations match the reference") {
    val rnd = new scala.util.Random(53)
    // small alphabet → heavy pair collisions → the tie-break carries
    val vocab = (0 until 120).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }.groupBy(identity).map { case (w, ws) => (w, ws.size.toLong * 3) }.toSeq
    val (refM, refS) = refTrain(vocab, 15)
    val (gotM, gotS) = runTrain(vocab, 15)
    assert(gotM == refM, "merge sequence diverges from reference")
    assert(gotS == refS, "final symbolizations diverge from reference")
  }

  test("overlapping runs merge greedily left-to-right, then cascade") {
    // aaaa: step 1 merges (a,a) with count 3 (overlapping adjacencies),
    // yielding [aa, aa]; step 2 merges (aa,aa); then exhausted — early
    // stop returns 2 rows even though 5 were requested
    val (merges, reprs) = runTrain(Seq(("aaaa", 1L)), 5)
    assert(merges == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
    assert(reprs("aaaa") == Vector("aaaa"))
  }

  test("step 1 agrees with mergeStep's chosen pair and merge count") {
    import spark.implicits._
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val df = vocab.toDF("w", "wt")
    val (merges, _) = Bpe.train(df, "w", "wt", 1)
    val stepOne = Bpe.mergeStep(df, "w", "wt")
      .select(col("b1"), col("b2")).distinct().collect()
    assert(stepOne.length == 1)
    assert((merges.head._2, merges.head._3) ==
      (stepOne(0).getString(0), stepOne(0).getString(1)))
    // (e,s) at weighted count 9 (newest 6 + widest 3) is the classic
    // Sennrich first merge for this vocabulary
    assert(merges.head == (1, "e", "s", 9L))
  }
}
