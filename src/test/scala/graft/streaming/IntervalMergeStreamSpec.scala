package graft.streaming

import graft.SparkSpec
import graft.streaming.{StreamingSync => SS}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** intervalMergeStream invariants: the emitted (closed) island set
  * equals the batch recurrence minus each key's final island, for
  * every TIME-ORDERED batch split of the same events — the emit-on-
  * close contract that makes the live merger equal its batch oracle.
  */
class IntervalMergeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def events(n: Int): Seq[SS.IntervalEvent] = {
    val rnd = new scala.util.Random(21)
    (0 until n).flatMap { i =>
      val user = i % 3
      val start = i.toLong * 100
      // durations mix: some spill past the next event (merge), some not
      SS.IntervalEvent(user, i.toLong, start, start + (if (rnd.nextBoolean()) 350 else 40)) :: Nil
    }
  }

  private def batchClosed(evs: Seq[SS.IntervalEvent]): Set[SS.IslandRow] = {
    evs.groupBy(_.user_id).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.start_us, e.event_id))
      val islands = scala.collection.mutable.Buffer.empty[SS.IslandRow]
      var st: Option[SS.IslandState] = None
      sorted.foreach { e =>
        st = st match {
          case None => Some(SS.IslandState(e.start_us, e.end_us, 1L, 1L))
          case Some(s) if e.start_us > s.maxEnd =>
            islands += SS.IslandRow(u, s.island, s.start, s.maxEnd, s.n)
            Some(SS.IslandState(e.start_us, e.end_us, 1L, s.island + 1L))
          case Some(s) =>
            Some(s.copy(maxEnd = math.max(s.maxEnd, e.end_us), n = s.n + 1L))
        }
      }
      islands // the open island is intentionally NOT emitted
    }.toSet
  }

  private def streamClosed(splits: Seq[Seq[SS.IntervalEvent]]): Set[SS.IslandRow] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SS.IntervalEvent]
    val out = SS.intervalMergeStream(ms.toDS())
    val sink = s"islands_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink).start()
    try splits.foreach { s => ms.addData(s); q.processAllAvailable() }
    finally q.stop()
    spark.table(sink).as[SS.IslandRow].collect().toSet
  }

  test("closed-island set is batch-split independent and equals the fold") {
    val evs = events(60)
    val want = batchClosed(evs)
    assert(want.nonEmpty)
    assert(streamClosed(Seq(evs)) == want)
    assert(streamClosed(evs.grouped(13).toSeq) == want)
    assert(streamClosed(evs.grouped(1).toSeq) == want) // one event per batch
  }
}
