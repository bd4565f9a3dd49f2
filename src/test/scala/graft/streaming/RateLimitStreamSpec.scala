package graft.streaming

import graft.SparkSpec
import graft.streaming.{StreamingSync => SS}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** rateLimitStream invariants: the admit/deny walk is batch-split
  * independent (state carries the bucket across batches), the cold start
  * is a full bucket, bursts drain exactly `cap` tokens, and refill is
  * the stated Δus div refillDivUs micro-token formula with the capacity
  * clamp.
  */
class RateLimitStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 3000000L // 3 tokens
  private val Div = 10000L   // 1 micro-token per 10^4 us -> 1 token / 10^10 us

  private def run(splits: Seq[Seq[SS.ValueEvent]]): Seq[SS.RateRow] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.ValueEvent]
    val out = SS.rateLimitStream(ms.toDS(), capMicro = Cap, refillDivUs = Div)
    val sinkName = s"rl_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sinkName).start()
    try splits.foreach { s => ms.addData(s); q.processAllAvailable() }
    finally q.stop()
    spark.table(sinkName).as[SS.RateRow].collect().toSeq.sortBy(_.event_id)
  }

  private def ev(id: Long, ts: Long): SS.ValueEvent =
    SS.ValueEvent(id, user_id = 7L, ts_us = ts, v = 0L)

  test("burst drains the full bucket, then denies until refill") {
    // 5 events 1us apart: 3 allowed (cold start = full bucket), 2 denied;
    // then one event 9*10^10 us later: refill (9e6 micro) clamps at cap
    val burst = (1L to 5L).map(i => ev(i, 1000L + i))
    val late = ev(6L, 1000L + 5L + 90000000000L)
    val rows = run(Seq(burst :+ late))
    assert(rows.map(_.allowed) === Seq(true, true, true, false, false, true))
    // post-decision balances: 2e6, 1e6, ~0, ~0, ~0, cap-1e6
    assert(rows.head.tok_after === 2000000L)
    assert(rows(2).tok_after < 1000000L)
    assert(rows(5).tok_after === Cap - 1000000L)
  }

  test("decisions are batch-split independent") {
    val events = (1L to 8L).map(i => ev(i, i * 5000000000L)) // 5000s apart
    val whole = run(Seq(events))
    val split = run(events.grouped(3).toSeq)
    assert(split.map(r => (r.event_id, r.allowed, r.tok_after)) ===
      whole.map(r => (r.event_id, r.allowed, r.tok_after)))
  }

  test("refill is exactly delta-us div refillDivUs, clamped at cap") {
    // event 2 arrives 25*10^6 us after event 1: refill = 2500 micro
    val rows = run(Seq(Seq(ev(1L, 0L), ev(2L, 25000000L))))
    // after e1: 2e6; pre e2 = 2e6 + 2500; allowed -> after = 1002500
    assert(rows(1).allowed)
    assert(rows(1).tok_after === 1002500L)
  }
}
