package graft.operators

import graft.SparkSpec

import scala.util.Random

/** Winnowing (Schleimer et al. 2003) structural properties: the density
  * guarantee (consecutive selections ≤ w apart), agreement with an
  * independent pure-Scala reference selection over seeded random docs,
  * and the LOCALITY theorem that makes fingerprints usable for matching
  * — any shared run of ≥ w+k-1 tokens forces a shared fingerprint.
  */
class WinnowSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val k = 4
  private val w = 4

  /** Pure-Scala rightmost-minimum winnowing over md5 hex hashes. */
  private def reference(text: String): Set[(Long, String)] = {
    val tk = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
    if (tk.size < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = tk.sliding(k).map { g =>
      md.digest(g.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.toVector
    val starts = 0 to math.max(hashes.size - w, 0)
    starts.map { i =>
      val win = hashes.slice(i, math.min(i + w, hashes.size)).zipWithIndex
      val (h, j) = win.minBy { case (hh, jj) => (hh, -jj) }
      (i + j.toLong, h)
    }.toSet
  }

  private def randomDoc(rnd: Random, n: Int): String = {
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table", "value")
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  test("fingerprints match the pure-Scala reference on random docs") {
    val rnd = new Random(7)
    val docs = (0L until 30L).map(i => (i, randomDoc(rnd, 3 + rnd.nextInt(40)))).toDF("id", "text")
    val got = Winnow.fingerprints(docs, "id", "text", k, w)
      .select("id", "sel_pos", "fp").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = (0L until 30L).map { i =>
      i -> reference(docs.filter(col("id") === i).select("text").collect()(0).getString(0))
    }.filter(_._2.nonEmpty).toMap
    assert(got == want)
  }

  test("density guarantee: every doc's selection gaps are at most w") {
    val rnd = new Random(11)
    val docs = (0L until 50L).map(i => (i, randomDoc(rnd, 4 + rnd.nextInt(60)))).toDF("id", "text")
    val bad = Winnow.profile(docs, "id", "text", k, w)
      .filter(!col("gap_ok") || col("max_gap") > w).count()
    assert(bad == 0L)
  }

  test("locality: docs sharing a run of w+k-1 tokens share a fingerprint") {
    val rnd = new Random(13)
    val shared = randomDoc(rnd, w + k - 1) // 7 tokens: one full window of grams
    val docs = Seq(
      (1L, s"${randomDoc(rnd, 15)} $shared ${randomDoc(rnd, 9)}"),
      (2L, s"${randomDoc(rnd, 4)} $shared ${randomDoc(rnd, 21)}")).toDF("id", "text")
    val m = Winnow.matches(docs, "id", "text", k, w, minShared = 1L).collect()
    assert(m.length == 1 && m(0).getLong(0) == 1L && m(0).getLong(1) == 2L, m.toSeq)
  }

  test("armed df cap drops only hot-fingerprint evidence, never invents pairs") {
    val rnd = new Random(17)
    val boiler = randomDoc(rnd, w + k - 1) // shared by ALL docs → hot fps
    val docs = (0L until 6L).map { i =>
      (i, s"$boiler ${randomDoc(rnd, 20)}")
    }.toDF("id", "text")
    def pairs(cap: Int) =
      Winnow.matches(docs, "id", "text", k, w, minShared = 1L, maxDocFreq = cap)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(0)
    // boilerplate fps have df=6 > 2: every pair whose only evidence is
    // the boilerplate run disappears under the cap
    val capped = pairs(2)
    assert(uncapped.size == 15, s"all 15 pairs share the boilerplate run: $uncapped")
    assert(capped.subsetOf(uncapped))
    assert(capped.size < uncapped.size, "cap must genuinely drop hot evidence")
    // cap above the max df is a no-op
    assert(pairs(6) == uncapped)
    // matchScores under the same cap: containment consistent with the
    // capped index (n_shared <= both count legs)
    val sc = Winnow.matchScores(docs, "id", "text", k, w, minShared = 1L, maxDocFreq = 2)
      .collect()
    sc.foreach { r =>
      val (shared, na, nb, pct) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(shared <= math.min(na, nb) && pct == shared * 100 / math.min(na, nb))
    }
  }
}
