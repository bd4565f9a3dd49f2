package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}

/** Deduplication operators for 100 TB-scale corpus cleaning.
  *
  * Strategy per variant:
  *   - exact: hash-groupBy on content — one shuffle on the key columns,
  *     AQE-skew-safe, min-id winner is deterministic.
  *   - MinHash+LSH: one codegen'd pass computes the K-minhash signature
  *     (graft.expressions.MinHashSignature — Kirsch-Mitzenmacher double
  *     hashing, so K functions cost ONE shingle scan); B band hashes
  *     explode; the self-join shuffles only (band, hash, id) — never the
  *     shingle arrays; candidate pairs re-join the (id → shingles) table and
  *     verify with exact sorted-merge Jaccard before any row is dropped.
  *   - SimHash: 64-bit sign-aggregated fingerprint (native expression, one
  *     tokenize pass/row); near-dups = collisions on 16-bit fingerprint
  *     bands, verified by exact Hamming distance (`bit_count`).
  *   - n-gram Jaccard: exact verification primitive over sorted shingle-hash
  *     arrays (linear merge) — quadratic per bucket, so always bucket first.
  *   - embedding cosine: random-hyperplane LSH buckets then exact cosine
  *     (fused single-pass kernel, no normalization materialized).
  *
  * All inner loops are custom Catalyst expressions with codegen
  * (graft.expressions) — interpreted higher-order functions were 5-20×
  * slower on the same plans. The only shuffles are the semantically
  * required groupBys/joins.
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
    // row_number over the key, not groupBy+semi-join: null-valued keys
    // group fine here, where join equality would silently drop them; and
    // the rn=1 filter plans as WindowGroupLimit — per-partition top-1
    // pruning before the single hash shuffle on keyCols.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
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

  /** Word n-gram shingles of the lowercased text as distinct sorted 64-bit
    * hashes (native expression — one tokenize pass).
    */
  def shingles(text: Column, n: Int = 3, ascii: Boolean = false): Column =
    gfn.shingle_hashes(text, n, ascii)

  /** Exact Jaccard similarity of two sorted shingle-hash arrays. */
  def jaccard(a: Column, b: Column): Column = gfn.jaccard_sorted(a, b)

  /** MinHash-LSH near-duplicate PAIRS with exact-Jaccard verification.
    *
    * Plan shape: narrow pass → K-minhash signature; explode B band hashes
    * (`xxhash64` over the band's signature slice — codegen'd, long inputs);
    * self-join on (band, hash) carrying ONLY ids, so the shuffle payload is
    * 24 bytes/row regardless of document size; distinct candidate pairs;
    * re-join the shingle table twice (shuffles bounded by candidate count,
    * not corpus size); verify with exact sorted-merge Jaccard. Output:
    * (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    *
    * `maxBucketSize > 0` caps hot buckets: a (band, hash) bucket holding n
    * rows yields n·(n-1)/2 candidate pairs, so one degenerate bucket (empty
    * strings, boilerplate) can dominate the whole job at corpus scale.
    * Over-cap buckets are DROPPED — a bounded, observable recall trade
    * (each surviving pair still verifies exactly; a true near-dup pair
    * loses only the bands where it collided with >cap others).
    *
    * `ascii = true` pins BOTH the signature and the verify shingles to the
    * oracle-regex tokenizer (see shingleHashes) — required when the output
    * is graded against a DuckDB string-set mirror.
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      maxBucketSize: Int = 0,
      ascii: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sig = df.select(col(idCol).as("id"),
      gfn.minhash_signature(col(textCol), shingleSize, numHashes, ascii).as("mh"))
    val banded0 = sig.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((b * rows until (b + 1) * rows).map(i => element_at(col("mh"), i + 1)): _*)
            .as("bh"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))
    val banded = capBuckets(banded0, maxBucketSize)

    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // same pair may collide in many bands

    val sh = df.select(col(idCol).as("id"),
      gfn.shingle_hashes(col(textCol), shingleSize, ascii).as("sh"))
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", gfn.jaccard_sorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Drop bucket groups larger than `cap` (0 = off). Implemented as a
    * COUNT window over the bucket key: the window's hash shuffle is the
    * same partitioning the self-join needs next, so the cap costs one
    * in-partition sort instead of the r3 shape's separate aggregate +
    * semi-join (a second traversal of the banded rows; measured 1.25×
    * on q_dedup_minhash). Rows in over-cap buckets are filtered before
    * any pair is formed.
    */
  private def capBuckets(
      banded: DataFrame, cap: Int, keys: Seq[String] = Seq("band", "bh")): DataFrame =
    if (cap <= 0) banded
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
      banded.withColumn("__n", count(lit(1)).over(w))
        .filter(col("__n") <= cap)
        .drop("__n")
    }

  /** Dedup flavor: keep exactly the min-id representative of every
    * connected COMPONENT of near-dup pairs (true transitive clustering
    * via [[Components.minLabel]] — the greedy "drop every id_b" rule
    * over-keeps whenever two pairs share their larger member, e.g.
    * pairs (1,9),(5,9) would keep both 1 and 5).
    */
  def minhashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7): DataFrame =
    Components.dedupByComponent(df, idCol,
      minhashNearDupPairs(df, idCol, textCol, threshold))

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over word tokens (native expression: tokenize + vote +
    * pack in one pass per row, inside whole-stage codegen).
    */
  def simhash(text: Column): Column = gfn.simhash64(text)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket on `maxHamming + 1` bands of the
    * fingerprint — by pigeonhole, any pair within the Hamming threshold
    * leaves at least one band untouched, so candidate recall is EXACT at
    * every threshold (a fixed 4-band scheme only guarantees distance ≤ 3
    * and silently misses farther pairs). Exact `bit_count` verification
    * follows. Self-join payload is (band, bucket, id, fp) = 28 bytes/row.
    *
    * Cost note: bands narrow as the threshold rises (13 bands ≈ 5 bits at
    * maxHamming = 12), so buckets coarsen and candidate volume grows —
    * the honest price of a recall guarantee; at corpus scale keep the
    * threshold tight.
    */
  /** (id, fp, band, bh) banding of the 64-bit simhash into
    * `maxHamming + 1` pigeonhole bands — shared by the batch pair join
    * and the STREAMING matcher ([[graft.streaming.StreamingSync
    * .simhashMatchStream]]), so the two paths cannot disagree on the
    * band scheme (widths, offsets, or masks).
    */
  def simhashBanded(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming must be in [0, 32), got $maxHamming")
    val nBands = maxHamming + 1
    val base = 64 / nBands
    val rem = 64 % nBands
    val widths = (0 until nBands).map(i => if (i < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    def mask(w: Int): Long = if (w >= 64) -1L else (1L << w) - 1L
    df.select(col(idCol).as("id"), simhash(col(textCol)).as("fp"))
      .select(
        col("id"), col("fp"),
        explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("fp"), offsets(b))
              .bitwiseAND(lit(mask(widths(b)))).as("bh"))
        }: _*)).as("bb"))
      .select(col("id"), col("fp"), col("bb.band"), col("bb.bh"))
  }

  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val banded = simhashBanded(df, idCol, textCol, maxHamming)
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
    * exact cosine (fused kernel) verifies inside each bucket. Recall can be
    * raised by lowering `nPlanes` (bigger buckets) — at 100 TB run multiple
    * rotated plane sets and union, like MinHash bands.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nPlanes: Int = 8,
      dim: Int = 0,
      seed: Long = 42L,
      nTables: Int = 1,
      maxBucketSize: Int = 0): DataFrame = {
    val d = if (dim > 0) dim else firstVectorDim(df, vecCol)
    // L independent hash tables (rotated plane sets): recall compounds as
    // 1-(1-p)^L while cost grows with candidate overlap — the MinHash-bands
    // trade for vectors. Precision is unaffected (exact verify below).
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val banded = capBuckets(v
      .withColumn("tb", explode(array((0 until nTables).map { t =>
        struct(lit(t).as("table"),
          gfn.hyperplane_bucket(col("v"), randomPlanes(nPlanes, d, seed + t * 7919L))
            .as("bucket"))
      }: _*)))
      .select(col("id"), col("tb.table"), col("tb.bucket")),
      maxBucketSize, keys = Seq("table", "bucket"))
    // candidate pairs carry ONLY ids through the self-join and the distinct
    // (a pair colliding in several tables must verify once, and shuffling
    // vectors through the distinct would dominate at scale)
    val a = banded.select(col("table"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("table"), col("bucket"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    candidates
      .join(v.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(v.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cosine", gfn.cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** SemDeDup-style cluster-scoped near-dup pairs (Abbas et al. 2023,
    * arXiv:2303.09540 — public literature): k-means the embedding space,
    * then compare pairs ONLY within a cluster, with exact cosine as the
    * verdict. Complementary to [[embeddingNearDupPairs]]: hyperplane LSH
    * buckets by random geometry, SemDeDup buckets by LEARNED geometry —
    * at web scale the cluster count grows with the corpus (the paper runs
    * ~50k clusters on 100M+ docs) so per-cluster work stays bounded while
    * the clusters track real semantic density instead of random cuts.
    *
    * Reuses the IVF trainer (Similarity.trainCentroids — bounded
    * hash-stratified sample, driver-side KB model) and the zero-shuffle
    * nearest-centroid codegen assignment; the within-cluster self-join
    * shuffles (cid, id, v) once on cid. Precision is exact by
    * construction (cosine filter); recall misses only cross-cluster pairs
    * — the certificate a driven query should grade.
    */
  def semanticNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nClusters: Int = 16,
      refineIters: Int = 1,
      maxTrainRows: Long = 100000L): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val centroids = Similarity.trainCentroids(v, nClusters, refineIters, maxTrainRows)
    val assigned = v.withColumn("cid", gfn.nearest_centroid(col("v"), centroids))
    assigned.select(col("cid"), col("id").as("id_a"), col("v").as("v_a"))
      .join(assigned.select(col("cid"), col("id").as("id_b"), col("v").as("v_b")),
        Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", gfn.cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"),
        col("cid"))
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64 stream on the
    * seed — no `Math.random`, reproducible across runs and partitions).
    */
  private[graft] def randomPlanes(n: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
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

  // ------------------------------------------------------------------
  // Incremental (delta-vs-corpus) dedup
  // ------------------------------------------------------------------

  /** Dedupe a delta batch (today's crawl) without touching the corpus's
    * payloads: the delta is first deduped within itself ([[exact]] —
    * deterministic min-id winner), then anti-joined against the corpus's
    * DISTINCT content keys. Only `keyCols` are ever read from the corpus
    * (column pruning keeps its payload bytes out of the scan), so at
    * 100 TB the corpus side is a key/hash index — precompute it once and
    * reuse it every increment rather than re-deriving it from raw text.
    * Delta-sized work dominates: the anti-join shuffles the (small)
    * delta against the corpus key set.
    */
  def incremental(
      corpus: DataFrame,
      delta: DataFrame,
      idCol: String,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one content key column")
    exact(delta, idCol, keyCols)
      .join(corpus.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
  }

  // ------------------------------------------------------------------
  // Exact duplicated substrings (span-level dedup)
  // ------------------------------------------------------------------

  /** Per-document duplicated-substring report: which character spans of
    * each document also occur elsewhere in the corpus (or again in the
    * same document). This is the span-level exact dedup real pretraining
    * pipelines run after document-level passes — repeated boilerplate
    * inside otherwise-unique pages is what document-hash dedup can't see
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"; the reference pipeline's analog is a suffix-array
    * pass).
    *
    * Distributed shape (the practical cluster analog of the suffix
    * array): every k-char shingle position explodes to a row —
    * O(total corpus chars), the honest cost of this operator, paid
    * ONCE — a shingle is "duplicated" iff it occurs ≥ 2 times
    * corpus-wide (within-document repeats count), decided by a count
    * window over the shingle key (one shuffle; a groupBy + self-join
    * would re-run the explode scan as the probe side), then
    * overlapping-or-adjacent spans merge per document with a
    * gaps-and-islands window (cumulative max over span ends — the
    * q_sessionize discipline). Two shuffles over char-count-sized data:
    * shingle window, per-doc window.
    *
    * `hashShingles = true` (production default) shuffles 8-byte xxhash64
    * keys instead of k-char strings — identical semantics modulo 2^-64
    * collisions, k× fewer shuffle/sort bytes. The oracle query passes
    * `false` so every byte of the decision is replayed in another
    * engine.
    *
    * Output: (`idCol`, n_chars, n_dup_spans, dup_chars) — one row per
    * non-null-text input document (0/0 where nothing repeats; documents
    * with NULL `textCol` are dropped, not reported), integer-only.
    *
    * Per-row hazard: the position generator materializes an
    * O(doc length) array per document before exploding, so a single
    * pathological document (a 50 MB page) allocates proportionally
    * inside one task. Pre-split such documents (e.g.
    * [[Chunking.chunkByChars]] with overlap k-1) before this pass.
    */
  def duplicateSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      hashShingles: Boolean = true): DataFrame = {
    require(k > 0, s"shingle width must be positive, got $k")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        col(textCol).as("text"), length(col(textCol)).cast("long").as("n_chars"))
    val shingleStr = expr(s"substring(text, pos + 1, $k)")
    val occ = base
      .filter(col("n_chars") >= k)
      .select(col("id"),
        explode(sequence(lit(0L), col("n_chars") - k)).as("pos"), col("text"))
      .select(col("id"), col("pos"),
        (if (hashShingles) xxhash64(shingleStr) else shingleStr).as("sh"))
    val w = Window.partitionBy("id").orderBy("pos")
    val spans = occ
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("sh")))
      .filter(col("__n") >= 2)
      .select(col("id"), col("pos"), (col("pos") + k).as("end"))
      .withColumn("prev_max_end",
        max(col("end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      // new island iff this span starts past everything seen so far
      // (adjacent spans merge: a dup region is contiguous text)
      .withColumn("new_isl",
        (col("prev_max_end").isNull || col("pos") > col("prev_max_end")).cast("long"))
      .withColumn("isl", sum(col("new_isl")).over(w))
      .groupBy(col("id"), col("isl"))
      .agg(min(col("pos")).as("s0"), max(col("end")).as("e0"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("e0") - col("s0")).as("dup_chars"))
    base.select(col("id"), col("n_chars"))
      .join(spans, Seq("id"), "left_outer")
      .select(col("id").as(idCol), col("n_chars"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
  }

  // ------------------------------------------------------------------
  // Sorted-neighborhood blocking (Hernández & Stolfo 1995)
  // ------------------------------------------------------------------

  /** Sorted-neighborhood candidate pairs at distributed scale: rank rows
    * by `keyCol` (ties broken by `idCol`), emit every pair within
    * `window` rank positions, keep those with edit distance ≤ `maxDist`.
    *
    * This is the 100 TB variant the single-window formulation only
    * promised in a comment: instead of ONE global row_number (a
    * single-partition sort of the whole corpus), the key space is split
    * into `numRanges` order-preserving buckets (deterministic sampled
    * boundaries, below), each bucket ranks LOCALLY in parallel, and the
    * global rank is recovered as `bucket offset + local rank` from a
    * `numRanges`-row cumulative-size table (broadcast — the classic
    * two-pass distributed rank). The only sequential structure left is
    * that O(numRanges) offset fold — bounded by the bucket count, not
    * the data. The result is EXACTLY the global-window pair set for ANY
    * bucket boundaries (including empty buckets — offsets, not
    * adjacency, carry cross-boundary pairs), which
    * SortedNeighborhoodSpec proves by set equality against the
    * one-window reference.
    *
    * `idCol` must be long-castable (it is the deterministic tiebreak and
    * part of the boundary literals). Output: (id_a, id_b, dist) with
    * id_a's key sorting before id_b's.
    */
  def sortedNeighborhood(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      window: Int = 3,
      maxDist: Int = 2,
      numRanges: Int = 8): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(numRanges > 0, s"numRanges must be positive, got $numRanges")
    // Preconditions enforced loudly, not assumed: the sample collect
    // below reads (String key, long id) rows, so a non-string key or an
    // id that nulls under cast('long') would otherwise surface as an
    // opaque driver-side ClassCastException/NPE far from the misuse.
    require(df.schema(keyCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"sortedNeighborhood key column '$keyCol' must be StringType " +
        s"(lexicographic blocking key), got ${df.schema(keyCol).dataType}")
    val base = df.select(col(idCol).cast("long").as("id"), col(keyCol).as("key"))
    // Range boundaries from a DETERMINISTIC bounded sample (xxhash64
    // order + top-k, the repo's bounded-driver-model convention — the
    // collect is O(numRanges·20), never the data). Spark's own
    // RangePartitioner would do the same sampling, but its seed varies
    // per exchange instantiation, and the bucket label must agree
    // between the two consumers below (local ranks + offsets); a pure
    // column expression over literal boundaries cannot disagree with
    // itself.
    val sampled = base
      .withColumn("r", xxhash64(col("key"), col("id")))
      .orderBy(col("r")).limit(math.max(numRanges * 20, 100))
      .select(col("key"), col("id")).collect()
      .map { r =>
        require(!r.isNullAt(1),
          s"sortedNeighborhood id column '$idCol' must be non-null and " +
            "long-castable (it is the deterministic tiebreak); found a " +
            "row whose id is null after cast('long')")
        (Option(r.getString(0)).getOrElse(""), r.getLong(1))
      }
      .sorted
    val boundaries =
      if (sampled.isEmpty) Array.empty[(String, Long)]
      else (1 until numRanges).map { i =>
        sampled(math.min(sampled.length - 1, i * sampled.length / numRanges))
      }.distinct.toArray
    // bucket = #boundaries strictly below this row in (key, id) order —
    // order-preserving by construction: b(x) ≤ b(y) whenever x ≤ y. A
    // FLAT boundary array + filter + size, not a folded when-chain: a
    // fold nests one expression level per boundary and overflows the
    // analyzer stack past a few hundred buckets. A null key fails every
    // boundary comparison → bucket 0, exactly where nulls-first ordering
    // puts it.
    val bucketExpr =
      if (boundaries.isEmpty) lit(0L)
      else size(filter(
        array(boundaries.map { case (bk, bid) =>
          struct(lit(bk).as("k"), lit(bid).as("i"))
        }: _*),
        bd => col("key") > bd("k") ||
          (col("key") === bd("k") && col("id") > bd("i")))).cast("long")
    val bucketed = base.withColumn("b", bucketExpr)
    // Local ranks run in parallel, one window per bucket.
    val local = bucketed.withColumn("lrnk",
      row_number().over(
        Window.partitionBy(col("b")).orderBy(col("key"), col("id"))).cast("long"))
    // Global offsets: numRanges rows — the lone single-partition window,
    // bounded by the partition count (never the data).
    val offsets = bucketed.groupBy(col("b")).agg(count(lit(1)).as("sz"))
      .withColumn("off",
        coalesce(sum(col("sz")).over(
          Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("b"), col("off"))
    val ranked = local.join(broadcast(offsets), Seq("b"))
      .select(col("id"), col("key"), (col("off") + col("lrnk")).as("rnk"))
    val a = ranked.select(col("rnk").as("rnk_a"), col("id").as("id_a"),
        col("key").as("ka"))
      .withColumn("k", explode(expr(s"sequence(1L, ${window}L)")))
      .withColumn("rnk_b", col("rnk_a") + col("k"))
    val b = ranked.select(col("rnk").as("rnk_b"), col("id").as("id_b"),
      col("key").as("kb"))
    a.join(b, Seq("rnk_b"))
      .filter(levenshtein(col("ka"), col("kb")) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ka"), col("kb")).cast("int").as("dist"))
  }

  /** Marginal n-gram novelty per document: the fraction of a doc's
    * DISTINCT token k-grams whose FIRST occurrence (min doc id) is this
    * doc — "how much does each document add that the corpus before it
    * didn't have", the data-valuation metric behind dedup-aware
    * ingestion ordering (a doc that is 95% old k-grams is a near-dup or
    * boilerplate even if no single pair-join flags it). Rates are exact
    * integer per-mille (`n_novel·1000 div n_grams`).
    *
    * Scale shape: the ids-only dedup discipline — one (gram-hash, id)
    * distinct, one min-id aggregate per gram, one join back riding the
    * SAME fp-hash partitioning, one per-doc aggregate. The first-
    * occurrence attribution is a min, so it is order- and partitioning-
    * independent by construction.
    */
  def noveltyProfile(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val gramExpr = (0 until k).map(j => s"__tk[i+$j]")
      .mkString("concat_ws(' ', ", ", ", ")")
    val fp = df
      .select(col(idCol), gfn.ascii_tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= k)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(__tk)-$k), i -> md5($gramExpr))")).as("fp"))
      .distinct()
    val first = fp.groupBy(col("fp")).agg(min(col(idCol)).as("__first"))
    fp.join(first, Seq("fp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_pm", expr("(n_novel * 1000) div n_grams"))
  }

  /** Head-prefix duplicate groups: documents sharing the md5 of their
    * first `nTokens` tokens — the truncation-duplicate catcher (the same
    * page scraped to different depths, or a doc and its teaser/summary
    * cut at the same head) that full-text exact dedup misses and
    * MinHash only catches when the shared head dominates the shingle
    * set. C4's three-sentence-span dedup is the published instance of
    * the idea; the fixed-token head is its portable, tokenizer-stable
    * form.
    *
    * Pure hash-groupBy on a 32-char key — the exact-dedup scale shape:
    * one narrow projection (head slice + md5 fuse into the scan), one
    * shuffle of (fp, id) pairs, groups with one doc drop in the partial
    * aggregate. Emits one row per multi-doc group: `(head_fp, n_docs,
    * canonical_id, max_id)` with min-id canonical, ordered output is
    * the caller's job. Docs shorter than `nTokens` are excluded — a
    * 5-token doc's "head" is its whole text, which exact dedup owns.
    */
  def headDupGroups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nTokens: Int = 8): DataFrame = {
    require(nTokens >= 1, s"nTokens must be positive, got $nTokens")
    val tk = gfn.ascii_tokens(col(textCol))
    df.select(col(idCol), tk.as("__tk"))
      .filter(size(col("__tk")) >= nTokens)
      .select(col(idCol),
        md5(concat_ws(" ", slice(col("__tk"), 1, nTokens))).as("head_fp"))
      .groupBy(col("head_fp"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as("canonical_id"),
        max(col(idCol)).as("max_id"))
      .filter(col("n_docs") > 1)
  }
}
