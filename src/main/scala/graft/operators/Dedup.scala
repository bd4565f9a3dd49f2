package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Deduplication operators for 100 TB-scale corpus cleaning.
  *
  * Strategy per variant:
  *   - exact: hash-groupBy on content — one shuffle on a 64-bit hash (not
  *     the full text), AQE-skew-safe, min-id winner is deterministic.
  *   - MinHash+LSH: shingle → K minhashes → B bands → self-join on
  *     (band, band-hash). The join key space is huge (band hash), so the
  *     shuffle distributes well; candidate pairs are verified with exact
  *     shingle-Jaccard before any row is dropped.
  *   - SimHash: 64-bit sign-aggregated fingerprint; near-dups = bucket
  *     collisions on rotated fingerprint bands (Hamming-adjacent docs land
  *     together with high probability).
  *   - n-gram Jaccard: exact verification primitive, also usable alone at
  *     small scale (it's quadratic per bucket — always bucket first).
  *   - embedding cosine: random-hyperplane LSH buckets then exact cosine.
  *
  * Everything is built from codegen'd higher-order functions; the only
  * shuffles are the groupBys/joins that are semantically required.
  */
object Dedup {

  // ------------------------------------------------------------------
  // Exact
  // ------------------------------------------------------------------

  /** Keep exactly one row (min `idCol`) per distinct value of `keyCols`.
    * Equivalent to dropDuplicates but with a DETERMINISTIC winner —
    * dropDuplicates keeps an arbitrary row, which breaks golden tests and
    * makes re-runs non-reproducible at scale.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val keeps = df.groupBy(keyCols.map(col): _*).agg(min(col(idCol)).as(idCol))
    df.join(keeps, keyCols :+ idCol, "left_semi")
      .select(df.columns.map(col).toSeq: _*) // using-join reorders; restore caller's order
  }

  /** Exact-dup groups: one row per duplicated key with its cardinality and
    * surviving id. (Reporting flavor of [[exact]].)
    */
  def exactGroups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)

  // ------------------------------------------------------------------
  // Shingles + MinHash + LSH
  // ------------------------------------------------------------------

  /** Word n-gram shingles of the lowercased text, as a distinct array. */
  def shingles(text: Column, n: Int = 3): Column = {
    val tokens = filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    val k = size(tokens) - (n - 1)
    when(k <= 0, array_distinct(array(concat_ws(" ", tokens))))
      .otherwise(array_distinct(
        transform(sequence(lit(1), k), i => concat_ws(" ", slice(tokens, i, lit(n))))))
  }

  /** K minhash values: min over shingles of a seeded 64-bit hash. Seeding
    * via a distinct prefix per hash function keeps the K functions
    * independent while using the codegen'd `xxhash64`.
    */
  def minhashes(sh: Column, numHashes: Int = 64): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i.toString + ":"), s)))
    }: _*)

  /** Exact Jaccard similarity of two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0d)).otherwise(inter / uni)
  }

  /** MinHash-LSH near-duplicate PAIRS with exact-Jaccard verification.
    *
    * Plan shape: one narrow pass computes shingles + K minhashes; explode B
    * band hashes (each `xxhash64` over its band slice); self-join on
    * (band, hash) — a shuffle whose key space is 2^64·B so it spreads
    * evenly; dedupe candidate pairs; verify with exact Jaccard computed from
    * re-joined shingle arrays. Output: (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard >= threshold.
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val withSig = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("mh", minhashes(col("sh"), numHashes))
    // band hash = one xxhash64 over the band's slice of the signature
    val banded = withSig.select(
      col("id"), col("sh"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",", slice(col("mh"), b * rows + 1, rows))).as("bh"))
      }: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bh"))

    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b") // same pair may collide in many bands

    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Dedup flavor: drop every near-dup except the min-id representative of
    * its connected component's pairs (greedy: any doc that appears as the
    * larger id in a qualifying pair is dropped).
    */
  def minhashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7): DataFrame = {
    val drops = minhashNearDupPairs(df, idCol, textCol, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over word tokens: per-token xxhash64, each bit votes
    * ±1, fingerprint bit = sign of the vote sum. One `aggregate` over the
    * token-hash array with a 64-long accumulator — single narrow pass.
    */
  def simhash(text: Column): Column = {
    val tokens = filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    val hashes = transform(tokens, t => xxhash64(t))
    // `shiftright`/`shiftleft` with a COLUMN shift amount exist only at the
    // SQL layer — reach them via call_function (still codegen'd).
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) =>
        zip_with(acc, transform(sequence(lit(0), lit(63)), i =>
          when(call_function("shiftright", h, i).bitwiseAND(1L) === 1L, 1).otherwise(-1)),
          (a, v) => a + v))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket on 4 × 16-bit bands of the fingerprint
    * (any pair within Hamming distance 3 shares at least one band), then
    * verify the Hamming threshold exactly.
    */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withFp = df.select(col(idCol).as("id"), simhash(col(textCol)).as("fp"))
    val banded = withFp.select(
      col("id"), col("fp"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), b * 16).bitwiseAND(0xFFFFL).as("bh"))
      }: _*)).as("bb"))
      .select(col("id"), col("fp"), col("bb.band"), col("bb.bh"))
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ------------------------------------------------------------------
  // Embedding cosine near-dup
  // ------------------------------------------------------------------

  /** Near-dup pairs by embedding cosine ≥ threshold. Vectors are bucketed by
    * `nPlanes` random-hyperplane signs first (deterministic seed), so the
    * self-join shuffles on bucket id instead of exploding quadratically;
    * exact cosine verifies inside each bucket. Recall can be raised by
    * lowering `nPlanes` (bigger buckets) — at 100 TB run multiple rotated
    * plane sets and union, like MinHash bands.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nPlanes: Int = 8,
      dim: Int = 0,
      seed: Long = 42L): DataFrame = {
    val d = if (dim > 0) dim else firstVectorDim(df, vecCol)
    val planes = randomPlanes(nPlanes, d, seed)
    val v = df.select(col(idCol).as("id"),
      VectorFunctions.l2Normalize(col(vecCol)).as("v"))
      .withColumn("bucket", VectorFunctions.hyperplaneBucket(col("v"), planes))
    val a = v.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = v.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.dot(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64-style LCG on the
    * seed — no `Math.random`, reproducible across runs and partitions).
    */
  private[operators] def randomPlanes(n: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    var s = seed
    def next(): Double = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble)
    }
    Seq.fill(n)(Seq.fill(dim)(next()))
  }

  private def firstVectorDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)
}
