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
