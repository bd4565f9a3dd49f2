package graft.streaming

import graft.SparkSpec
import graft.streaming.{StreamingSync => SS}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** topKStream invariants: exact mode (capacity ≥ distinct) equals the
  * batch counts for every batch split; saturated mode keeps the
  * Misra–Gries guarantee (any token with count > n/capacity survives)
  * and never over-counts.
  */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private def toks(n: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(23)
    val vocab = Seq("hot", "hot", "hot", "warm", "warm", "cool", "cold", "ice")
    (0 until n).map(_ => ("en", vocab(rnd.nextInt(vocab.size))))
  }

  private def finalSnapshot(
      splits: Seq[Seq[(String, String)]],
      capacity: Int): Map[String, Long] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val out = SS.topKStream(
      ms.toDF().toDF("lang", "tok").as[SS.LangToken], capacity)
    val sinkName = s"topk_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sinkName).start()
    try splits.foreach { s => ms.addData(s); q.processAllAvailable() }
    finally q.stop()
    val rows = spark.table(sinkName).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val maxSeq = rows.map(_._2).max
    rows.filter(_._2 == maxSeq).map(r => r._3 -> r._4).toMap
  }

  test("exact mode equals batch counts under any batch split") {
    val d = toks(300)
    val want = d.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(finalSnapshot(Seq(d), 1024) == want)
    assert(finalSnapshot(d.grouped(70).toSeq, 1024) == want)
    assert(finalSnapshot(d.reverse.grouped(41).toSeq, 1024) == want)
  }

  test("saturated mode: MG guarantee holds, counts never exceed truth") {
    val d = toks(300)
    val truth = d.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = finalSnapshot(d.grouped(70).toSeq, capacity = 2)
    assert(got.size <= 2)
    // no over-counting: MG counts are lower bounds
    got.foreach { case (t, c) => assert(c <= truth(t), s"$t: $c > ${truth(t)}") }
    // the dominant token (count > n/capacity = 150) must be present
    val dominant = truth.filter(_._2 > d.size / 2)
    dominant.keys.foreach(t => assert(got.contains(t), s"dominant $t evicted"))
  }
}
