package graft.operators

import graft.SparkSpec

/** EvalOps invariants: pass@k against the combinatorial definition, and
  * conversation assembly's order/truncation contract.
  */
class EvalOpsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def choose(n: Long, k: Long): Long =
    if (k < 0 || k > n) 0L
    else (0L until k).foldLeft(1L)((acc, j) => acc * (n - j) / (j + 1))

  test("passAtK equals 1000·(1 − C(n−c,k)/C(n,k)) floored, for all (n, c)") {
    val rows = for (n <- 3L to 12L; c <- 0L to n) yield (s"p${n}_$c", n, c)
    val samples = rows.flatMap { case (p, n, c) =>
      (0L until n).map(i => (p, i < c))
    }.toDF("problem", "pass")
    val got = EvalOps.passAtK(samples, "problem", "pass", k = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.foreach { case (p, n, c) =>
      val (gn, gc, p3, p1) = got(p)
      assert((gn, gc) == ((n, c)))
      // reference: exact rational floored to per-mille
      val fail = choose(n - c, 3)
      val tot = choose(n, 3)
      val want = 1000L - fail * 1000L / tot
      assert(p3 == want, s"$p: got $p3 want $want")
      assert(p1 == c * 1000L / n)
      assert(p3 >= p1, s"$p: pass@3 must dominate pass@1")
    }
  }

  test("assembleConversations keeps the LAST maxTurns in (ts, id) order") {
    val ev = Seq(
      (1L, 10L, 100L, "u", "first"),
      (1L, 20L, 101L, "a", "second"),
      (1L, 20L, 102L, "u", "third"), // ts tie broken by id
      (1L, 30L, 103L, "a", "fourth"),
      (2L, 5L, 200L, "u", "only")
    ).toDF("k", "ts", "id", "role", "content")
    val got = EvalOps.assembleConversations(ev, "k", "ts", "id", "role", "content", maxTurns = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((4L, 3L, "a=second | u=third | a=fourth")))
    assert(got(2L) == ((1L, 1L, "u=only")))
  }
}
