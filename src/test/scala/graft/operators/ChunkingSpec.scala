package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val size = 10
  private val overlap = 3
  private val stride = size - overlap // 7

  private def chunksOf(texts: (Long, String)*): Map[Long, Seq[(Int, Int, String)]] =
    Chunking.chunkByChars(texts.toSeq.toDF("id", "text"), "text", size, overlap)
      .select(col("id"), col("chunk_no"), col("chunk_start"), col("chunk"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
        .sortBy(_._1).toSeq).toMap

  test("chunks cover the text: stride prefixes concatenate back to the original") {
    val text = "abcdefghijklmnopqrstuvwxyz0123456789"
    val ch = chunksOf(1L -> text)(1L)
    // every chunk starts where chunk_no * stride says, and the stride-sized
    // prefixes (full last chunk) reassemble the document exactly
    ch.foreach { case (no, start, _) => assert(start == no * stride) }
    val rebuilt = ch.map { case (_, _, c) =>
      if (c.length > stride) c.take(stride) else c
    }.mkString
    assert(rebuilt == text)
  }

  test("consecutive chunks overlap by exactly `overlap` characters") {
    val text = "abcdefghijklmnopqrstuvwxyz"
    val ch = chunksOf(1L -> text)(1L).map(_._3)
    ch.sliding(2).foreach {
      case Seq(a, b) if a.length == size =>
        assert(a.takeRight(overlap) == b.take(overlap.min(b.length)))
      case _ => // short last chunk has no successor
    }
  }

  test("empty and null text produce no chunks; short text produces one") {
    val out = chunksOf(1L -> "", 2L -> null, 3L -> "abc")
    assert(!out.contains(1L) && !out.contains(2L))
    assert(out(3L) == Seq((0, 0, "abc")))
  }

  test("chunk count matches the stride arithmetic") {
    for (len <- Seq(1, stride, stride + 1, size, size + 1, 50)) {
      val text = "x" * len
      val n = chunksOf(1L -> text)(1L).size
      assert(n == (len - 1) / stride + 1, s"len=$len")
    }
  }

  test("the plan is a narrow projection — no exchange") {
    val df = Chunking.chunkByChars(
      graft.Tables.documents(spark, sf), "text", 64, 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
