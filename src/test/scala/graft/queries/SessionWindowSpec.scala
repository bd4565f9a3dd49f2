package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Boundary-semantics pin for q_session_window: the synthetic corpus has
  * ZERO gaps landing exactly on the 30-minute boundary (checked — micros
  * timestamps never hit 1800000000 exactly), so the driver gate alone
  * cannot distinguish a strict-> from a >= new-session flag in the
  * oracle. This spec feeds session_window an exact-boundary event and
  * pins Spark's INCLUSIVE session merge: an event at last+gap JOINS the
  * session (this test originally encoded the opposite, exclusive-end
  * guess — and failed, which is exactly the drift it exists to catch).
  * The oracle's strict > mirrors the pinned behavior.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  test("an event exactly at session end (last + gap) merges into the session") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(offsetS: Long) = new java.sql.Timestamp(base.getTime + offsetS * 1000)
    // gap 1800 s; event 3 lands exactly at event 2's window end
    val df = Seq((1L, at(0)), (1L, at(60)), (1L, at(60 + 1800)))
      .toDF("user_id", "ts")
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("start_s"), col("n"))
      .orderBy("start_s")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sessions.length == 1,
      s"exact-boundary event must MERGE into the session, got ${sessions.toSeq}")
    assert(sessions.head._2 == 3L)
    // one microsecond past the boundary DOES split
    val past = new java.sql.Timestamp(base.getTime + (60 + 1800) * 1000 + 1)
    val split = Seq((1L, at(0)), (1L, at(60)), (1L, past)).toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count().collect().length
    assert(split == 2, "a past-boundary event must open a new session")
  }

  test("an event one microsecond inside the window extends the session") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t0 = new java.sql.Timestamp(base.getTime)
    val inside = new java.sql.Timestamp(base.getTime + 1800 * 1000 - 1)
    val df = Seq((1L, t0), (1L, inside)).toDF("user_id", "ts")
    val n = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count().collect().length
    assert(n == 1, "an in-window event must merge into the open session")
  }
}
