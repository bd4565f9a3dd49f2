package graft.queries

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}
import graft.operators.Dedup

/** The near-dup certificates (q_dedup_minhash / q_dedup_embedding) must be
  * FALSIFIABLE: a certificate that cannot go red is padding. Each test
  * (a) recomputes the exact truth by an independent code path (collect +
  * Scala set arithmetic, not the certificate's joins) and checks the
  * certificate row agrees, and (b) shows the floor BINDS — the truth set is
  * non-empty, so a broken LSH leg (zero hits) flips recall_ok to false.
  * The driver-gate counterpart of (b) was proven by flipping the dumped
  * recall_ok and watching tools/oracle_check.py report the row red.
  */
class CertificateSpec extends SparkSpec {

  // the certificates are graded at sf0.01 (verify) and sf0.1 (bench); their
  // data-dependent recall floors are pinned to those corpora, so the spec
  // exercises the same sf0.01 sample (sf0.001 is a different draw on which
  // the embedding LSH happens to land under the 60% floor — documented
  // data-dependence, not an engine bug)
  override def sf: String = "/root/testdata/sf0.01"

  private def certRow(name: String): (Long, Long, Boolean) = {
    val r = graft.SparkEntry.queries(name)(spark, sf).head()
    (r.getLong(0), r.getLong(1), r.getBoolean(2))
  }

  test("minhash certificate: independent truth, zero FPs, binding floor") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 1000)
    val sh = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 2, ascii = true).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val ids = sh.keys.toSeq.sorted
    val truth = (for {
      i <- ids; j <- ids if i < j
      inter = (sh(i) intersect sh(j)).size
      union = sh(i).size + sh(j).size - inter
      if union > 0 && inter * 5 >= union
    } yield (i, j)).toSet

    val (nTrue, nFp, recallOk) = certRow("q_dedup_minhash")
    assert(nTrue == truth.size.toLong,
      s"certificate n_true_pairs=$nTrue, independent recount=${truth.size}")
    assert(nFp == 0L)
    assert(recallOk)
    // the floor binds: with a non-empty truth set, zero LSH hits fails it
    assert(truth.nonEmpty && !(0L * 5 >= truth.size.toLong * 4))
  }

  test("embedding certificate: independent truth, zero FPs, binding floor") {
    val emb = Tables.embeddings(spark, sf)
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // same accumulation order and denominator form as VectorKernels.cosine,
    // so a borderline pair can't flip on an ulp of numeric drift
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else d / denom
    }
    val ids = vecs.keys.toSeq.sorted
    val truth = (for {
      i <- ids; j <- ids if i < j
      if BigDecimal(cos(vecs(i), vecs(j)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.4
    } yield (i, j)).toSet

    val (nTrue, nFp, recallOk) = certRow("q_dedup_embedding")
    assert(nTrue == truth.size.toLong,
      s"certificate n_true_pairs=$nTrue, independent recount=${truth.size}")
    assert(nFp == 0L)
    assert(recallOk)
    assert(truth.nonEmpty && !(0L * 5 >= truth.size.toLong * 3))
  }

  // -------------------------------------------------------------------
  // The rows-only queries (engine-hash surfaces with no DuckDB analog)
  // carry the same proven-red discipline as the oracled certificates:
  // an independent driver-side recount of the exact truth, plus a flip
  // that shows the equality would actually go red on a broken engine leg.
  // -------------------------------------------------------------------

  test("q_dedup_simhash: independent exact-Hamming truth; threshold flip goes red") {
    val fps = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = fps.keys.toSeq.sorted
    // exact all-pairs truth by driver-side bit count — no banding, no join
    val truth = (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= 3
    } yield (i, j)).toSet
    val got = graft.SparkEntry.queries("q_dedup_simhash")(spark, sf)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth,
      s"banded pairs diverge: missed=${(truth -- got).size} extra=${(got -- truth).size}")
    // FLIP: a banding/verify that loses threshold-distance pairs (simulated
    // by the tighter maxHamming = 2) must go RED against the same truth —
    // the sf0.01 corpus has hamming == 3 pairs (4 of them; data-dependent
    // constant, re-pin if the generator changes), so the equality binds.
    val flipped = Dedup.simhashNearDupPairs(
      Tables.documents(spark, sf), "doc_id", "text", maxHamming = 2)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flipped != truth && (truth -- flipped).nonEmpty,
      "threshold flip failed to go red — the recall equality is not binding")
  }

  test("q_simhash_fingerprints: driver-side kernel recount over the codegen path") {
    val out = graft.SparkEntry.queries("q_simhash_fingerprints")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == texts.keySet)
    texts.foreach { case (id, t) =>
      val expect = graft.expressions.TextKernels.simhash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(out(id) == expect, s"doc $id: codegen fp ${out(id)} != kernel $expect")
    }
    // the surface is non-degenerate: real variety, not a constant column
    assert(out.values.toSet.size > 100)
  }

  test("portableSplit: independent md5 recount; perturbed cuts go red") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = graft.operators.Sampling
      .portableSplit(Tables.documents(spark, sf).select("doc_id"), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def uniform(k: Long): Long = java.lang.Long.parseLong(
      md.digest(k.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(8), 16)
    def assign(cut1: Long, cut2: Long): Map[Long, String] =
      got.keys.map { k =>
        val u = uniform(k)
        k -> (if (u < cut1) "train" else if (u < cut2) "val" else "test")
      }.toMap
    // the exact cut constants portableSplit derives ((w/total·2^32).toLong)
    val truth = assign(3435973836L, 3865470566L)
    assert(got == truth, "portableSplit diverges from the independent md5 replay")
    // FLIP: wrong cut constants (a 0.7/0.2 boundary) must go red — ~10% of
    // the uniform range moves between splits, so some doc lands in it
    val wrong = assign(3006477107L, 3865470566L)
    assert(wrong != truth,
      "cut perturbation failed to go red — the recount does not bind the constants")
  }

  test("q_shapley_coverage: efficiency axiom and independent subset recount") {
    val rows = graft.SparkEntry.queries("q_shapley_coverage")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val vAll = rows.values.head._3
    // efficiency: the Shapley values partition v(N) exactly
    assert(rows.values.map(_._2).sum === 6L * vAll,
      "sum of shap_x6 must equal 6*v(N)")
    // monotone coverage game -> non-negative values
    assert(rows.values.forall(_._2 >= 0L))
    assert(rows.values.forall(v => v._1 <= vAll))
    // independent recount of v({src0}) and v(N) by Scala set arithmetic
    import graft.Tables
    def shingleSet(src: String): Set[String] =
      Tables.documents(spark, sf).filter(col("source") === src)
        .select(col("text")).collect().iterator.flatMap { r =>
          val t = r.getString(0).split(" ").filter(_.nonEmpty)
          t.sliding(3).filter(_.length == 3).map(_.mkString(" "))
        }.toSet
    val s0 = shingleSet("src0")
    val all = s0 ++ shingleSet("src1") ++ shingleSet("src2")
    assert(rows("src0")._1 === s0.size.toLong)
    assert(vAll === all.size.toLong)
  }
}
