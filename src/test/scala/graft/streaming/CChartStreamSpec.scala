package graft.streaming

import graft.SparkSpec
import graft.streaming.{StreamingSync => SS}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** cChartStream invariants: day-count additivity makes the final
  * snapshot batch-split independent; the causal verdict judges each day
  * against strictly prior days with the 7-day warmup; and seq counts
  * the batches a key saw.
  */
class CChartStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(splits: Seq[Seq[SS.TypeDayEvent]]): Seq[SS.CChartRow] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.TypeDayEvent]
    val out = SS.cChartStream(ms.toDS())
    val sinkName = s"cc_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sinkName).start()
    try splits.foreach { s => ms.addData(s); q.processAllAvailable() }
    finally q.stop()
    val all = spark.table(sinkName).as[SS.CChartRow].collect().toSeq
    val maxSeq = all.groupBy(_.typ).view.mapValues(_.map(_.seq).max).toMap
    all.filter(r => r.seq == maxSeq(r.typ)).sortBy(r => (r.typ, r.day_idx))
  }

  private def events(counts: Seq[(Long, Int)]): Seq[SS.TypeDayEvent] =
    counts.flatMap { case (day, n) => Seq.fill(n)(SS.TypeDayEvent("t", day)) }

  test("final snapshot is batch-split independent") {
    // 10 steady days at 100 then a spike day
    val ev = events((1L to 10L).map(_ -> 100) :+ (11L -> 140))
    val whole = run(Seq(ev))
    val split = run(ev.grouped(137).toSeq)
    val interleaved = run(Seq(ev.zipWithIndex.filter(_._2 % 2 == 0).map(_._1),
      ev.zipWithIndex.filter(_._2 % 2 == 1).map(_._1)))
    assert(split.map(r => (r.typ, r.day_idx, r.n, r.tot_prior, r.nd_prior, r.alarm)) ===
      whole.map(r => (r.typ, r.day_idx, r.n, r.tot_prior, r.nd_prior, r.alarm)))
    assert(interleaved.map(r => (r.day_idx, r.n, r.alarm)) ===
      whole.map(r => (r.day_idx, r.n, r.alarm)))
  }

  test("causal verdict: spike alarms, warmup days never do") {
    val ev = events((1L to 10L).map(_ -> 100) :+ (11L -> 140))
    val rows = run(Seq(ev))
    val byDay = rows.map(r => r.day_idx -> r).toMap
    // day 11 vs prior mean 100: (140−100)² = 1600 > 4·100 → alarm
    assert(byDay(11L).alarm, s"spike day should alarm: ${byDay(11L)}")
    assert(byDay(11L).tot_prior === 1000L)
    assert(byDay(11L).nd_prior === 10L)
    // days 1..7 are inside the nd_prior < 7 warmup → never alarm
    (1L to 7L).foreach(d => assert(!byDay(d).alarm, s"warmup day $d"))
    // steady days after warmup sit on the mean → no alarm
    (8L to 10L).foreach(d => assert(!byDay(d).alarm, s"steady day $d"))
  }

  // NOTE on waiting: a query with ProcessingTimeTimeout armed ALWAYS
  // reports "another batch may be needed" (a lapsed timeout can fire
  // at any wall-clock instant), so `processAllAvailable` NEVER returns
  // for it — Spark's own FMGWS timeout suites drive a manual clock
  // instead. These tests pace the trigger (also the production
  // configuration — the 0 ms default busy-loops empty batches) and
  // POLL the memory sink for the expected rows.
  private val paced = org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L)

  private def pollUntil(what: String, timeoutMs: Long = 60000L)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond) {
      if (System.nanoTime() > deadline) fail(s"timed out waiting for: $what")
      Thread.sleep(100L)
    }
  }

  test("arming TTL does not change live-key causal verdicts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // TTL far above the test's wall-clock: nothing evicts; the emitted
    // chart must be bit-identical to the NoTimeout run. (Keys WITH data
    // in a batch are always served the data path — hasTimedOut only
    // fires for silent keys — so live keys are structurally unaffected;
    // this pins it.)
    val ev = events((1L to 10L).map(_ -> 100) :+ (11L -> 140))
    def snapshot(sinkName: String): Seq[(Long, Long, Long, Long, Boolean)] = {
      val all = spark.table(sinkName).as[SS.CChartRow].collect().toSeq
      if (all.isEmpty) Seq.empty
      else {
        val maxSeq = all.map(_.seq).max
        all.filter(_.seq == maxSeq).sortBy(_.day_idx)
          .map(r => (r.day_idx, r.n, r.tot_prior, r.nd_prior, r.alarm))
      }
    }
    // NoTimeout reference (processAllAvailable is safe here)
    val msRef = MemoryStream[SS.TypeDayEvent]
    val refSink = s"cc_ref_${System.nanoTime()}"
    val qRef = SS.cChartStream(msRef.toDS()).writeStream
      .format("memory").queryName(refSink).start()
    try { msRef.addData(ev); qRef.processAllAvailable() } finally qRef.stop()
    val noTtl = snapshot(refSink)

    val ms = MemoryStream[SS.TypeDayEvent]
    val ttlSink = s"cc_ttl_${System.nanoTime()}"
    val q = SS.cChartStream(ms.toDS(), ttlMs = 600000L).writeStream
      .format("memory").queryName(ttlSink).trigger(paced).start()
    try {
      ms.addData(ev)
      pollUntil("full 11-day snapshot under TTL") {
        snapshot(ttlSink).size == 11
      }
    } finally q.stop()
    val ttl = snapshot(ttlSink)
    assert(ttl === noTtl)
    assert(ttl.exists(r => r._1 == 11L && r._5), "spike day must still alarm")
  }

  test("TTL evicts a silent key; on return it self-starts afresh") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.TypeDayEvent]
    val sinkName = s"cc_ttl_return_${System.nanoTime()}"
    val q = SS.cChartStream(ms.toDS(), ttlMs = 1000L).writeStream
      .format("memory").queryName(sinkName).trigger(paced).start()
    def deadRows = spark.table(sinkName).as[SS.CChartRow].collect()
      .filter(_.typ == "dead")
    try {
      ms.addData((1L to 3L).map(d => SS.TypeDayEvent("dead", d)))
      pollUntil("first-life snapshot")(deadRows.length == 3)
      // wait for OBSERVED eviction, not a fixed sleep (which raced the
      // timeout batch on loaded machines): the paced empty batches keep
      // publishing state-operator metrics, and the timeout batch that
      // drops the key's calendar reports numRowsTotal == 0 — only then
      // does the returning event go in, so seq MUST restart at 1.
      pollUntil("state-store eviction of the silent key") {
        val p = q.lastProgress
        p != null && p.stateOperators.nonEmpty &&
          p.stateOperators(0).numRowsTotal == 0L
      }
      ms.addData(Seq(SS.TypeDayEvent("dead", 9L)))
      pollUntil("returning-key snapshot")(deadRows.exists(_.day_idx == 9L))
    } finally q.stop()
    val fresh = deadRows.filter(_.day_idx == 9L)
    // after eviction the key restarts: first-life days (1..3) are gone
    // from the new snapshot, seq restarts at 1, priors are empty
    assert(fresh.forall(r => r.seq == 1L && r.tot_prior == 0L && r.nd_prior == 0L),
      s"returning key must self-start: ${fresh.toSeq}")
    assert(!deadRows.exists(r => r.seq == 2L),
      s"evicted state must not resurrect: ${deadRows.toSeq}")
  }

  test("seq counts batches per key") {
    val a = SS.TypeDayEvent("a", 1L)
    val b = SS.TypeDayEvent("b", 1L)
    val rows = run(Seq(Seq(a), Seq(a), Seq(b)))
    // run() already filters to max-seq snapshots
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.TypeDayEvent]
    val out = SS.cChartStream(ms.toDS())
    val sinkName = s"cc_seq_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sinkName).start()
    try Seq(Seq(a), Seq(a), Seq(b)).foreach { s => ms.addData(s); q.processAllAvailable() }
    finally q.stop()
    val all = spark.table(sinkName).as[SS.CChartRow].collect()
    assert(all.filter(_.typ == "a").map(_.seq).max === 2L)
    assert(all.filter(_.typ == "b").map(_.seq).max === 1L)
    assert(rows.nonEmpty)
  }
}
