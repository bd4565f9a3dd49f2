package graft.streaming

import graft.SparkSpec
import graft.streaming.{StreamingSync => SS}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** quantileStream invariants: additive histogram state makes the final
  * snapshot batch-split independent; quantiles are the declared-grid
  * bucket floors at rank ⌈p·n⌉; out-of-grid values clamp into edge
  * buckets and are counted, never dropped.
  */
class QuantileStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(splits: Seq[Seq[SS.TypeValue]]): Seq[SS.QuantRow] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.TypeValue]
    val out = SS.quantileStream(ms.toDS(), lo = 0L, width = 10L, nBuckets = 8)
    val sink = s"qq_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink).start()
    try splits.foreach { s => ms.addData(s); q.processAllAvailable() }
    finally q.stop()
    val all = spark.table(sink).as[SS.QuantRow].collect().toSeq
    val maxSeq = all.groupBy(_.typ).view.mapValues(_.map(_.seq).max).toMap
    all.filter(r => r.seq == maxSeq(r.typ)).sortBy(_.typ)
  }

  test("snapshot is batch-split independent and matches the rank rule") {
    // 100 values 0..99 → buckets 0..7 (10 each in 0..70, 30 clamped
    // into bucket 7 along with 70..79); p50 rank 50 → bucket 4 floor 40
    val ev = (0L until 100L).map(v => SS.TypeValue("t", v))
    val whole = run(Seq(ev))
    val split = run(ev.grouped(7).toSeq)
    // seq counts batches (1 vs 15 here) — the SNAPSHOT is what must agree
    def snap(rs: Seq[SS.QuantRow]) =
      rs.map(r => (r.typ, r.n_obs, r.n_clamped, r.p50_lo, r.p90_lo, r.p99_lo))
    assert(snap(whole) === snap(split))
    val r = whole.head
    assert(r.n_obs === 100L)
    assert(r.n_clamped === 20L) // 80..99 beyond the 8x10 grid
    assert(r.p50_lo === 40L)
    assert(r.p90_lo === 70L)    // rank 90 lands in the clamped edge bucket
    assert(r.p99_lo === 70L)
  }

  test("negative values clamp low and count as clamped") {
    val ev = Seq(-5L, -1L, 3L, 25L).map(v => SS.TypeValue("n", v))
    val r = run(Seq(ev)).head
    assert(r.n_obs === 4L)
    assert(r.n_clamped === 2L)
    assert(r.p50_lo === 0L) // rank 2 of {-5,-1 → b0, 3 → b0, 25 → b2}
  }
}
