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
    // prefixes plus the whole last chunk reassemble the document exactly
    ch.foreach { case (no, start, _) => assert(start == no * stride) }
    val rebuilt = ch.init.map(_._3.take(stride)).mkString + ch.last._3
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

  test("chunk count matches the stride arithmetic — no redundant suffix chunk") {
    for (len <- Seq(1, overlap, overlap + 1, stride, stride + 1, size, size + 1, 50)) {
      val text = "x" * len
      val n = chunksOf(1L -> text)(1L).size
      // chunks are emitted while start + overlap < len (plus chunk 0)
      val want = if (len <= overlap) 1 else (len - overlap - 1) / stride + 1
      assert(n == want, s"len=$len")
    }
  }

  test("no chunk is a pure suffix of its predecessor; the last chunk reaches the end") {
    for (len <- Seq(size, size + 1, 2 * stride + overlap, 36)) {
      val text = "abcdefghijklmnopqrstuvwxyz0123456789".take(len)
      val ch = chunksOf(1L -> text)(1L)
      ch.sliding(2).foreach {
        case Seq((_, sa, a), (_, sb, b)) =>
          assert(sb + b.length > sa + a.length,
            s"len=$len: chunk at $sb adds nothing beyond chunk at $sa")
        case _ =>
      }
      val (_, lastStart, lastChunk) = ch.last
      assert(lastStart + lastChunk.length == text.length,
        s"len=$len: last chunk must reach end-of-text")
    }
  }

  test("the plan is a narrow projection — no exchange") {
    val df = Chunking.chunkByChars(
      graft.Tables.documents(spark, sf), "text", 64, 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
