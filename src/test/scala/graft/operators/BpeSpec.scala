package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def run(words: Seq[(String, Long)]): Map[String, (String, String, Long, String)] =
    Bpe.mergeStep(words.toDF("w", "wt"), "w", "wt")
      .collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getString(3), r.getLong(4), r.getString(5)))
      .toMap

  test("picks the weighted argmax pair and merges it everywhere") {
    // (a,b) count = 2*2 + 1 = 5; (b,a) = 2; best = (a,b)
    val out = run(Seq(("abab", 2L), ("ab", 1L), ("ba", 1L)))
    assert(out("abab") == (("a", "b", 2L, "ab ab")))
    assert(out("ab") == (("a", "b", 1L, "ab")))
    assert(out("ba") == (("a", "b", 0L, "b a")))
  }

  test("greedy non-overlap: runs of the same pair merge left-to-right") {
    // best pair (a,a): 'aaaa' -> [aa, aa], 'aaa' -> [aa, a], 'aaaaa' -> [aa, aa, a]
    val out = run(Seq(("aaaa", 3L), ("aaa", 1L), ("aaaaa", 1L)))
    assert(out("aaaa") == (("a", "a", 2L, "aa aa")))
    assert(out("aaa") == (("a", "a", 1L, "aa a")))
    assert(out("aaaaa") == (("a", "a", 2L, "aa aa a")))
  }

  test("count ties break lexicographically on the pair") {
    val out = run(Seq(("cd", 1L), ("ab", 1L)))
    assert(out("ab")._1 == "a" && out("ab")._2 == "b")
    assert(out("ab")._4 == "ab")
    assert(out("cd")._4 == "c d") // not the chosen pair — untouched
  }

  test("single-character words pass through with zero merges") {
    val out = run(Seq(("x", 5L), ("yy", 1L)))
    assert(out("x") == (("y", "y", 0L, "x")))
    assert(out("yy")._4 == "yy")
  }
}
