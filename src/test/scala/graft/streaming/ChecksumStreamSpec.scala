package graft.streaming

import graft.SparkSpec
import graft.streaming.{StreamingSync => SS}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** checksumStream invariants: the final snapshot equals the batch XOR
  * fold for EVERY batch split and arrival order (XOR commutativity is
  * the algebraic guarantee — this spec pins that the implementation
  * actually inherits it), and seq counts the batches a key saw.
  */
class ChecksumStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int): Seq[(String, Long)] = {
    val rnd = new scala.util.Random(31)
    (0 until n).map(i => (s"s${i % 3}", rnd.nextLong() & 0x0FFFFFFFFFFFFFFFL))
  }

  private def snapshots(
      splits: Seq[Seq[(String, Long)]]): Map[String, (Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val out = SS.checksumStream(ms.toDF().toDF("source", "h").as[SS.SrcHash])
    val sinkName = s"ck_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sinkName).start()
    try splits.foreach { s => ms.addData(s); q.processAllAvailable() }
    finally q.stop()
    spark.table(sinkName).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues { rs =>
        val last = rs.maxBy(_._2)
        (last._2, last._3, last._4) // (seq, n, xor)
      }.toMap
  }

  test("final snapshot equals batch XOR for any split and order") {
    val d = rows(90)
    val want = d.groupBy(_._1).view.mapValues { rs =>
      (rs.size.toLong, rs.map(_._2).foldLeft(0L)(_ ^ _))
    }.toMap
    def check(splits: Seq[Seq[(String, Long)]]): Unit = {
      val got = snapshots(splits)
      want.foreach { case (k, (n, x)) =>
        val (_, gn, gx) = got(k)
        assert((gn, gx) == ((n, x)), s"$k: got ($gn, $gx) want ($n, $x)")
      }
    }
    check(Seq(d))
    check(d.grouped(17).toSeq)
    check(d.reverse.grouped(29).toSeq)
  }

  test("seq counts the batches each key participated in") {
    val d = Seq(("a", 1L), ("a", 2L), ("b", 3L))
    val got = snapshots(Seq(Seq(d(0)), Seq(d(1)), Seq(d(2))))
    assert(got("a")._1 == 2L, s"a saw 2 batches: ${got("a")}")
    assert(got("b")._1 == 1L)
  }
}
