package graft.streaming

import graft.SparkSpec
import graft.streaming.{StreamingSync => SS}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** TTL-eviction invariants for the remaining unbounded-key FMGWS
  * streams (intervalMergeStream, recordStream, attributeStream — where
  * the TTL doubles as the attribution window), the cChartStream
  * pattern: (1) arming a TTL far above the test's wall-clock leaves
  * live-key output bit-identical to the NoTimeout run; (2) a key
  * silent past the TTL is evicted — observed via the state-store
  * numRowsTotal metric, never a fixed sleep — and self-starts afresh
  * on return.
  */
class StreamTtlSpec extends SparkSpec {
  import spark.implicits._

  // A query with ProcessingTimeTimeout armed never quiesces for
  // processAllAvailable (a lapsed timeout can fire at any instant), so
  // TTL runs pace the trigger and POLL the sink / state metrics — the
  // CChartStreamSpec discipline.
  private val paced = Trigger.ProcessingTime(200L)

  private def pollUntil(what: String, timeoutMs: Long = 60000L)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond) {
      if (System.nanoTime() > deadline) fail(s"timed out waiting for: $what")
      Thread.sleep(100L)
    }
  }

  private def awaitEviction(q: StreamingQuery): Unit =
    pollUntil("state-store eviction of the silent key") {
      val p = q.lastProgress
      p != null && p.stateOperators.nonEmpty &&
        p.stateOperators(0).numRowsTotal == 0L
    }

  // ---- intervalMergeStream ----

  private def islandEvents(user: Long, base: Long): Seq[SS.IntervalEvent] = Seq(
    SS.IntervalEvent(user, base, base * 1000, base * 1000 + 50),      // island 1
    SS.IntervalEvent(user, base + 1, base * 1000 + 200, base * 1000 + 260), // closes 1, opens 2
    SS.IntervalEvent(user, base + 2, base * 1000 + 500, base * 1000 + 560)) // closes 2, opens 3

  test("islands: huge TTL leaves live-key closed set identical to NoTimeout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = islandEvents(1L, 10L) ++ islandEvents(2L, 40L)
    val msRef = MemoryStream[SS.IntervalEvent]
    val refSink = s"isl_ref_${System.nanoTime()}"
    val qRef = SS.intervalMergeStream(msRef.toDS()).writeStream
      .format("memory").queryName(refSink).start()
    try { msRef.addData(evs); qRef.processAllAvailable() } finally qRef.stop()
    val want = spark.table(refSink).as[SS.IslandRow].collect().toSet
    assert(want.size == 4, s"two closed islands per user expected: $want")

    val ms = MemoryStream[SS.IntervalEvent]
    val sink = s"isl_ttl_${System.nanoTime()}"
    val q = SS.intervalMergeStream(ms.toDS(), ttlMs = 600000L).writeStream
      .format("memory").queryName(sink).trigger(paced).start()
    try {
      ms.addData(evs)
      pollUntil("closed islands under TTL") {
        spark.table(sink).count() == want.size
      }
    } finally q.stop()
    assert(spark.table(sink).as[SS.IslandRow].collect().toSet == want)
  }

  test("islands: TTL evicts a silent user; on return numbering self-starts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.IntervalEvent]
    val sink = s"isl_ret_${System.nanoTime()}"
    val q = SS.intervalMergeStream(ms.toDS(), ttlMs = 1000L).writeStream
      .format("memory").queryName(sink).trigger(paced).start()
    def rows = spark.table(sink).as[SS.IslandRow].collect().toSeq
    try {
      ms.addData(islandEvents(7L, 10L)) // closes islands 1 and 2; 3 stays open
      pollUntil("first-life closed islands")(rows.count(_.user_id == 7L) == 2)
      awaitEviction(q)
      // the open island 3 was DROPPED, not emitted (the batch oracle's
      // "last island never emitted" contract applied at eviction time);
      // the returning pair must close a fresh island numbered 1 again.
      ms.addData(Seq(
        SS.IntervalEvent(7L, 100L, 900000L, 900050L),
        SS.IntervalEvent(7L, 101L, 901000L, 901050L))) // closes the fresh island
      pollUntil("returning-user closed island")(rows.exists(_.island_start_us == 900000L))
    } finally q.stop()
    val fresh = rows.filter(_.island_start_us == 900000L)
    assert(fresh.forall(_.island == 1L), s"returning user must renumber from 1: $fresh")
    assert(!rows.exists(_.island == 3L), s"evicted open island must not surface: $rows")
  }

  // ---- recordStream ----

  test("records: huge TTL leaves live-key flags identical to NoTimeout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val days = Seq(SS.TypeDayCount("t", 1L, 5L), SS.TypeDayCount("t", 2L, 3L),
      SS.TypeDayCount("t", 3L, 4L), SS.TypeDayCount("t", 4L, 9L))
    val msRef = MemoryStream[SS.TypeDayCount]
    val refSink = s"rec_ref_${System.nanoTime()}"
    val qRef = SS.recordStream(msRef.toDS()).writeStream
      .format("memory").queryName(refSink).start()
    try { msRef.addData(days); qRef.processAllAvailable() } finally qRef.stop()
    val want = spark.table(refSink).as[SS.RecordRow].collect().toSet

    val ms = MemoryStream[SS.TypeDayCount]
    val sink = s"rec_ttl_${System.nanoTime()}"
    val q = SS.recordStream(ms.toDS(), ttlMs = 600000L).writeStream
      .format("memory").queryName(sink).trigger(paced).start()
    try {
      ms.addData(days)
      pollUntil("record rows under TTL")(spark.table(sink).count() == want.size)
    } finally q.stop()
    assert(spark.table(sink).as[SS.RecordRow].collect().toSet == want)
  }

  test("records: TTL evicts a silent key; first day back is a double record") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.TypeDayCount]
    val sink = s"rec_ret_${System.nanoTime()}"
    val q = SS.recordStream(ms.toDS(), ttlMs = 1000L).writeStream
      .format("memory").queryName(sink).trigger(paced).start()
    def rows = spark.table(sink).as[SS.RecordRow].collect().toSeq
    try {
      // first life: max 9, min 3 — a later n=4 would be NO record if
      // state survived
      ms.addData(Seq(SS.TypeDayCount("k", 1L, 9L), SS.TypeDayCount("k", 2L, 3L)))
      pollUntil("first-life record rows")(rows.count(_.typ == "k") == 2)
      awaitEviction(q)
      ms.addData(Seq(SS.TypeDayCount("k", 9L, 4L)))
      pollUntil("returning-key row")(rows.exists(_.day_idx == 9L))
    } finally q.stop()
    val back = rows.filter(_.day_idx == 9L)
    assert(back.forall(r => r.rec_high && r.rec_low),
      s"returning key must self-start (double record): $back")
  }

  // ---- attributeStream (TTL = the attribution window) ----

  test("attribution: huge TTL leaves credited purchases identical to NoTimeout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Seq(
      SS.TouchEvent(1L, 7L, 1000L, "click"),
      SS.TouchEvent(2L, 7L, 2000L, "purchase"),
      SS.TouchEvent(3L, 8L, 1500L, "view"),
      SS.TouchEvent(4L, 8L, 2500L, "purchase"),
      SS.TouchEvent(5L, 9L, 3000L, "purchase")) // touchless
    val msRef = MemoryStream[SS.TouchEvent]
    val refSink = s"att_ref_${System.nanoTime()}"
    val qRef = SS.attributeStream(msRef.toDS()).writeStream
      .format("memory").queryName(refSink).start()
    try { msRef.addData(evs); qRef.processAllAvailable() } finally qRef.stop()
    val want = spark.table(refSink).as[SS.AttributedPurchase].collect().toSet
    assert(want.size == 3)

    val ms = MemoryStream[SS.TouchEvent]
    val sink = s"att_ttl_${System.nanoTime()}"
    val q = SS.attributeStream(ms.toDS(), ttlMs = 600000L).writeStream
      .format("memory").queryName(sink).trigger(paced).start()
    try {
      ms.addData(evs)
      pollUntil("attributed purchases under TTL") {
        spark.table(sink).count() == want.size
      }
    } finally q.stop()
    assert(spark.table(sink).as[SS.AttributedPurchase].collect().toSet == want)
  }

  test("attribution: an expired touch no longer credits a late purchase") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.TouchEvent]
    val sink = s"att_win_${System.nanoTime()}"
    val q = SS.attributeStream(ms.toDS(), ttlMs = 1000L).writeStream
      .format("memory").queryName(sink).trigger(paced).start()
    def rows = spark.table(sink).as[SS.AttributedPurchase].collect().toSeq
    try {
      // first life: the touch credits an in-window purchase
      ms.addData(Seq(SS.TouchEvent(1L, 5L, 1000L, "click"),
        SS.TouchEvent(2L, 5L, 2000L, "purchase")))
      pollUntil("in-window attribution")(rows.exists(_.purchase_id == 2L))
      assert(rows.find(_.purchase_id == 2L).get.touch_id === Some(1L))
      awaitEviction(q)
      // past the window: the purchase arrives after touch expiry
      ms.addData(Seq(SS.TouchEvent(3L, 5L, 9000L, "purchase")))
      pollUntil("post-window purchase")(rows.exists(_.purchase_id == 3L))
    } finally q.stop()
    val late = rows.find(_.purchase_id == 3L).get
    assert(late.touch_id.isEmpty,
      s"expired touch must not credit the late purchase: $late")
  }

  // ---- quantileStream ----

  test("quantiles: huge TTL leaves live-key snapshots identical to NoTimeout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = (0L until 50L).map(v => SS.TypeValue("t", v))
    val msRef = MemoryStream[SS.TypeValue]
    val refSink = s"qt_ref_${System.nanoTime()}"
    val qRef = SS.quantileStream(msRef.toDS(), lo = 0L, width = 10L, nBuckets = 8)
      .writeStream.format("memory").queryName(refSink).start()
    try { msRef.addData(evs); qRef.processAllAvailable() } finally qRef.stop()
    val want = spark.table(refSink).as[SS.QuantRow].collect().toSet
    assert(want.nonEmpty)

    val ms = MemoryStream[SS.TypeValue]
    val sink = s"qt_ttl_${System.nanoTime()}"
    val q = SS.quantileStream(ms.toDS(), lo = 0L, width = 10L, nBuckets = 8,
      ttlMs = 600000L)
      .writeStream.format("memory").queryName(sink).trigger(paced).start()
    try {
      ms.addData(evs)
      pollUntil("quantile snapshot under TTL")(spark.table(sink).count() == want.size)
    } finally q.stop()
    assert(spark.table(sink).as[SS.QuantRow].collect().toSet == want)
  }

  test("quantiles: TTL evicts a silent key; returning key restarts counts and seq") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.TypeValue]
    val sink = s"qt_ret_${System.nanoTime()}"
    val q = SS.quantileStream(ms.toDS(), lo = 0L, width = 10L, nBuckets = 8,
      ttlMs = 1000L)
      .writeStream.format("memory").queryName(sink).trigger(paced).start()
    def rows = spark.table(sink).as[SS.QuantRow].collect().toSeq
    try {
      ms.addData((0L until 40L).map(v => SS.TypeValue("k", v)))
      pollUntil("first-life snapshot")(rows.exists(r => r.typ == "k" && r.n_obs == 40L))
      awaitEviction(q)
      // returning key: a fresh 10-row life — surviving state would show
      // n_obs = 50 and a seq past the first life's
      ms.addData((0L until 10L).map(v => SS.TypeValue("k", v)))
      pollUntil("returning-key snapshot")(rows.exists(_.n_obs == 10L))
    } finally q.stop()
    val back = rows.filter(_.n_obs == 10L)
    assert(back.forall(_.seq == 1L), s"returning key must restart seq at 1: $back")
    assert(!rows.exists(_.n_obs > 40L), s"evicted histogram must not accumulate: $rows")
  }

  // ---- simhashMatchStream ----

  private def bandedDoc(id: Long, fp: Long): Seq[SS.BandedDoc] =
    (0 until 4).map(b => SS.BandedDoc(b, (fp >>> (b * 8)) & 0xFFL, id, fp))

  test("simhash: huge TTL leaves emitted pair set identical to NoTimeout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = bandedDoc(1L, 0x1234567812345678L) ++
      bandedDoc(2L, 0x1234567812345679L) ++ // 1-bit off doc 1
      bandedDoc(3L, -1L)
    val msRef = MemoryStream[SS.BandedDoc]
    val refSink = s"sh_ref_${System.nanoTime()}"
    val qRef = SS.simhashMatchStream(msRef.toDS(), maxHamming = 3)
      .writeStream.format("memory").queryName(refSink).start()
    try { msRef.addData(docs); qRef.processAllAvailable() } finally qRef.stop()
    val want = spark.table(refSink).as[SS.SimhashMatch].collect().toSet
    // one logical pair emitted once per colliding band (3 of 4 here) —
    // the downstream distinct's job; poll on the RAW row count
    val wantRows = spark.table(refSink).count()
    assert(want.exists(m => m.id_a == 1L && m.id_b == 2L))

    val ms = MemoryStream[SS.BandedDoc]
    val sink = s"sh_ttl_${System.nanoTime()}"
    val q = SS.simhashMatchStream(ms.toDS(), maxHamming = 3, ttlMs = 600000L)
      .writeStream.format("memory").queryName(sink).trigger(paced).start()
    try {
      ms.addData(docs)
      pollUntil("simhash pairs under TTL")(spark.table(sink).count() == wantRows)
    } finally q.stop()
    assert(spark.table(sink).as[SS.SimhashMatch].collect().toSet == want)
  }

  test("simhash: TTL eviction forgets old rosters — recency-window dedup semantics") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.BandedDoc]
    val sink = s"sh_ret_${System.nanoTime()}"
    val q = SS.simhashMatchStream(ms.toDS(), maxHamming = 3, ttlMs = 1000L)
      .writeStream.format("memory").queryName(sink).trigger(paced).start()
    def rows = spark.table(sink).as[SS.SimhashMatch].collect().toSeq
    try {
      ms.addData(bandedDoc(1L, 0x42L))
      pollUntil("roster seeded") {
        val p = q.lastProgress
        p != null && p.stateOperators.nonEmpty && p.stateOperators(0).numRowsTotal > 0L
      }
      awaitEviction(q)
      // the near-dup arrives AFTER eviction: with history forgotten it
      // pairs with nothing (the documented sliding-window tradeoff) —
      // but two post-eviction near-dups still pair with each other
      ms.addData(bandedDoc(2L, 0x43L) ++ bandedDoc(4L, 0x46L))
      pollUntil("fresh-generation pair")(rows.exists(m => m.id_a == 2L && m.id_b == 4L))
    } finally q.stop()
    assert(!rows.exists(m => m.id_a == 1L),
      s"evicted roster must not pair with the old generation: $rows")
  }
}
