package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import graft.streaming.{StreamingSync => SS}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** simhashMatchStream invariants: the distinct emitted pair set equals
  * the batch simhashNearDupPairs result for EVERY batch split of the
  * same documents (batch-boundary independence — the property that
  * makes the streaming matcher trustworthy at ingest), including docs
  * arriving in adversarial id order.
  */
class SimhashStreamSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def docs(n: Int): Seq[(Long, String)] = {
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table", "value",
      "part", "hash", "merge", "batch")
    val rnd = new scala.util.Random(5)
    val base = (0L until n.toLong).map { i =>
      (i, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // plant near-dups: copies with one token changed
    base ++ base.take(4).map { case (i, t) =>
      (n + i, t.replaceFirst("\\w+", "merge"))
    }
  }

  private def batchPairs(d: Seq[(Long, String)]): Set[(Long, Long, Int)] =
    Dedup.simhashNearDupPairs(d.toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def streamPairs(
      splits: Seq[Seq[(Long, String)]],
      maxBucket: Int = 512): Set[(Long, Long, Int)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val banded = Dedup.simhashBanded(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", 3)
      .select(col("band"), col("bh"), col("id"), col("fp"))
      .as[SS.BandedDoc]
    val out = SS.simhashMatchStream(banded, maxHamming = 3, maxBucket = maxBucket)
    val sinkName = s"simhash_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sinkName).start()
    // one addData + drain per split = one micro-batch per split
    try splits.foreach { s => ms.addData(s); q.processAllAvailable() }
    finally q.stop()
    spark.table(sinkName).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("stream pair set equals batch for one-batch and many-batch splits") {
    val d = docs(20)
    val want = batchPairs(d)
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
    assert(streamPairs(Seq(d)) == want)
    assert(streamPairs(d.grouped(5).toSeq) == want)
    // adversarial order: descending ids, planted dups first
    assert(streamPairs(d.reverse.grouped(7).toSeq) == want)
  }

  test("bucket overflow is observable: cap-armed marker rows, never silence") {
    val d = docs(20)
    // maxBucket=1 forces overflow in every multi-doc bucket
    val out = streamPairs(d.grouped(5).toSeq, maxBucket = 1)
    val markers = out.filter(_._3 < 0)
    assert(markers.nonEmpty, "overflowing a 1-slot bucket must emit markers")
    assert(markers.forall { case (a, _, h) => a == -1L && h == -1 },
      "markers carry the (-1, dropped_id, -1) shape")
    // real pairs (if any survive the cap) are a subset of the batch set
    val real = out.filter(_._3 >= 0)
    assert(real.subsetOf(batchPairs(d)), "capped stream must not invent pairs")
    // uncapped control: same split, no markers
    assert(streamPairs(d.grouped(5).toSeq).forall(_._3 >= 0))
  }
}
