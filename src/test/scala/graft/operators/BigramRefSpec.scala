package graft.operators

import graft.SparkSpec

import scala.util.Random

/** Cross-checks [[TextAnalysis.bigramRepetition]] against an independent
  * pure-Scala reference over seeded random documents plus hand-picked
  * edge cases (empty text, lone/double/trailing spaces — Spark's
  * `split(text, " ")` keeps trailing empty tokens like `String.split(_,
  * -1)`, and the reference must agree or the DuckDB oracle would not).
  */
class BigramRefSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def reference(text: String): (Int, Int, Boolean) = {
    val tk = text.split(" ", -1).toSeq
    val bg = if (tk.size >= 2) tk.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
    val (n, d) = (bg.size, bg.distinct.size)
    (n, d, n > 0 && d * 10 <= n * 8)
  }

  test("bigramRepetition matches the pure-Scala reference on random + edge docs") {
    val rnd = new Random(42)
    val vocab = Seq("alpha", "beta", "gamma", "x", "", "δ")
    val randomDocs = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val edges = Seq(
      (1000L, ""), (1001L, " "), (1002L, "  "), (1003L, "a  b"),
      (1004L, "a b "), (1005L, " a b"), (1006L, "a a a a a"))
    val docs = randomDocs ++ edges

    import spark.implicits._
    val got = TextAnalysis.bigramRepetition(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap

    docs.foreach { case (id, text) =>
      assert(got(id) == reference(text),
        s"doc $id '${text.take(40)}': got ${got(id)}, reference ${reference(text)}")
    }
  }

  test("the one-pass kernel verdict agrees with the Column-DSL form and the reference") {
    val rnd = new Random(7)
    val vocab = Seq("alpha", "beta", "x", "", "y z")
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq((900L, ""), (901L, " "), (902L, "a a a a a"), (903L, "a b"))

    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val kernel = TextAnalysis.dropRepetitive(df, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dsl = TextAnalysis.bigramRepetition(df, "doc_id", "text")
      .filter(!col("is_repetitive")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kernel == dsl)
    docs.foreach { case (id, text) =>
      assert(kernel.contains(id) == !reference(text)._3, s"doc $id '${text.take(40)}'")
    }
  }
}
