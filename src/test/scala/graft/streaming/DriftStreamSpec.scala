package graft.streaming

import graft.SparkSpec
import graft.streaming.{StreamingSync => SS}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** driftStream invariants: the first micro-batch freezes as the
  * reference and never moves; live counts are additive so the final
  * snapshot is independent of how the POST-reference stream is split;
  * the emitted TV is the exact cross-multiplied per-mille; clamps are
  * counted, never silent.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(splits: Seq[Seq[SS.TypeValue]]): Seq[SS.DriftRow] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.TypeValue]
    val out = SS.driftStream(ms.toDS(), lo = 0L, width = 10L, nBuckets = 8)
    val sink = s"drift_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink).start()
    try splits.foreach { s => ms.addData(s); q.processAllAvailable() }
    finally q.stop()
    val all = spark.table(sink).as[SS.DriftRow].collect().toSeq
    val maxSeq = all.groupBy(_.typ).view.mapValues(_.map(_.seq).max).toMap
    all.filter(r => r.seq == maxSeq(r.typ)).sortBy(_.typ)
  }

  test("reference freezes at batch 1; TV is the exact per-mille") {
    // ref: 4 values in bucket 0; live: 2 in bucket 0 + 2 in bucket 3
    // normalized diff per bucket: |2*4-4*4|=8 at b0, |2*4-0|=8 at b3
    // tv_pm = 1000*16 / (2*4*4) = 500
    val ref = Seq(1L, 2L, 3L, 4L).map(v => SS.TypeValue("t", v))
    val live = Seq(5L, 6L, 35L, 36L).map(v => SS.TypeValue("t", v))
    val r = run(Seq(ref, live)).head
    assert(r.n_ref === 4L)
    assert(r.n_live === 4L)
    assert(r.tv_pm === 500L)
  }

  test("snapshot is independent of the post-reference batch split") {
    val ref = (0L until 20L).map(v => SS.TypeValue("t", v))
    val live = (40L until 100L).map(v => SS.TypeValue("t", v))
    val whole = run(Seq(ref, live))
    val split = run(Seq(ref) ++ live.grouped(7).toSeq)
    def snap(rs: Seq[SS.DriftRow]) =
      rs.map(r => (r.typ, r.n_ref, r.n_live, r.n_clamped, r.tv_pm))
    assert(snap(whole) === snap(split))
    // identical distributions drift to zero
    val same = run(Seq(ref, ref)).head
    assert(same.tv_pm === 0L)
  }

  test("clamps count cumulatively across reference and live") {
    val ref = Seq(-5L, 3L).map(v => SS.TypeValue("c", v))     // 1 clamp low
    val live = Seq(95L, 12L).map(v => SS.TypeValue("c", v))   // 1 clamp high
    val r = run(Seq(ref, live)).head
    assert(r.n_clamped === 2L)
  }
}
