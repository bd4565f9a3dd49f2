package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- Dedup ----------------

  test("duplicateSpans finds and merges repeated substrings, hand-checked") {
    // k=4: "ABCDEFGH" vs "XXABCDEFYY": shared run "ABCDEF" gives shingle
    // positions {0,1,2} in doc 1 and {2,3,4} in doc 2 -> one merged span
    // of 6 chars in each. Doc 3 shares nothing.
    val df = Seq(
      (1L, "ABCDEFGH"), (2L, "XXABCDEFYY"), (3L, "qrstuvwxyz")).toDF("id", "text")
    val out = Dedup.duplicateSpans(df, "id", "text", k = 4, hashShingles = false)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 8L, 1L, 6L),   // span [0,6)
      (2L, 10L, 1L, 6L),  // span [2,8)
      (3L, 10L, 0L, 0L)))
  }

  test("duplicateSpans counts within-document repetition too") {
    // "abcd...abcd": the repeated 4-gram marks both occurrences
    val df = Seq((1L, "abcdZZZZabcd")).toDF("id", "text")
    val out = Dedup.duplicateSpans(df, "id", "text", k = 4, hashShingles = false)
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(out == ((2L, 8L)), s"expected two 4-char spans, got $out")
  }

  test("duplicateSpans: hashed and string shingle paths agree on the corpus") {
    val docs = graft.Tables.documents(spark, sf)
    val a = Dedup.duplicateSpans(docs, "doc_id", "text", k = 32, hashShingles = true)
      .collect().map(_.toSeq).toSet
    val b = Dedup.duplicateSpans(docs, "doc_id", "text", k = 32, hashShingles = false)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // non-vacuity: the corpus must actually contain duplicated spans, or
    // this proves nothing about the hashed path (47 of 500 docs at sf0.01)
    assert(a.exists(r => r(2).asInstanceOf[Long] > 0),
      "corpus has no duplicated 32-char shingles — agreement test is vacuous")
  }

  test("incremental dedup drops corpus replays AND same-batch doubles") {
    val corpus = Seq((1L, "old page"), (2L, "boilerplate")).toDF("id", "text")
    val delta = Seq(
      (10L, "fresh content"),  // genuinely new -> kept
      (11L, "boilerplate"),    // recrawl of corpus content -> dropped
      (12L, "double fetch"),   // same-batch dup, min id -> kept
      (13L, "double fetch")    // same-batch dup, loses to 12 -> dropped
    ).toDF("id", "text")
    val out = Dedup.incremental(corpus, delta, "id", Seq("text"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(10L, 12L))
  }

  test("incremental dedup reads only the key columns from the corpus") {
    val docs = graft.Tables.documents(spark, sf)
    val df = Dedup.incremental(
      docs.filter(col("doc_id") < 400),
      docs.filter(col("doc_id") >= 400), "doc_id", Seq("text"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the corpus-side scan must be pruned to the key column plus the
    // pushed id filter — its payload/meta columns (lang, source,
    // n_chars) stay out of the anti-join entirely
    assert("ReadSchema: struct<doc_id:bigint,text:string>".r.findFirstIn(plan).isDefined,
      s"expected a corpus scan pruned to filter + key columns:\n$plan")
  }

  test("exact dedup keeps deterministic min-id winner per key") {
    val df = Seq((3L, "dup"), (1L, "dup"), (2L, "uniq")).toDF("id", "text")
    val out = Dedup.exact(df, "id", Seq("text")).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val groups = Dedup.exactGroups(df, "id", Seq("text")).collect()
    assert(groups.length == 1 && groups.head.getAs[Long]("keep_id") == 1L
      && groups.head.getAs[Long]("n_dups") == 2L)
  }

  test("exact dedup keeps null-keyed rows (one winner per null group)") {
    val df = Seq((3L, Option("dup")), (1L, Option("dup")),
      (5L, Option.empty[String]), (4L, Option.empty[String])).toDF("id", "text")
    val out = Dedup.exact(df, "id", Seq("text")).orderBy("id").collect()
    // null keys dedup like any other group (winner id=4), never vanish
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 4L))
  }

  test("jaccard on known shingle sets") {
    val df = Seq(("a b c d", "a b c e")).toDF("t1", "t2")
    val j = df.select(Dedup.jaccard(
      Dedup.shingles(col("t1"), 1), Dedup.shingles(col("t2"), 1))).head().getDouble(0)
    assert(math.abs(j - 3.0 / 5.0) < 1e-9) // {a,b,c} / {a,b,c,d,e}
  }

  test("minhash LSH finds a planted near-duplicate and skips unrelated text") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val near = base + " extra"
    val other = "completely different words describing an unrelated subject matter entirely here"
    val df = Seq((1L, base), (2L, near), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(df, "doc_id", "text", threshold = 0.5, shingleSize = 2)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("minhash hot-bucket cap bounds a degenerate bucket's pair explosion") {
    // 20 identical boilerplate docs (one hot bucket, 190 pairs) + a planted
    // near-dup pair of distinct text
    val boiler = (0L until 20L).map(i => (i, "lorem ipsum dolor sit amet " * 3))
    val planted = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "the quick brown fox jumps over the lazy dog again and again today"))
    val df = (boiler ++ planted).toDF("id", "text")
    val uncapped = Dedup.minhashNearDupPairs(df, "id", "text",
      threshold = 0.3, numHashes = 64, bands = 32, shingleSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)) && uncapped.size > 100)
    val capped = Dedup.minhashNearDupPairs(df, "id", "text",
      threshold = 0.3, numHashes = 64, bands = 32, shingleSize = 2, maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hot boilerplate bucket dropped; small buckets (the planted pair) kept
    assert(capped.contains((100L, 101L)))
    assert(!capped.exists { case (a, b) => a < 20L && b < 20L })
  }

  test("simhash: identical text -> distance 0; near text close; different text far") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy dog"),
      ("c", "entirely unrelated content about databases and executors")).toDF("id", "text")
    val fp = df.select(col("id"), Dedup.simhash(col("text")).as("fp")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp("a") == fp("b"))
    assert(java.lang.Long.bitCount(fp("a") ^ fp("c")) > 10)
  }

  test("embedding hot-bucket cap drops the degenerate bucket, keeps small ones") {
    // 20 identical vectors = one hot bucket per table (190 pairs); a planted
    // pair pointing the opposite way lands in the mirrored (small) bucket.
    val hot = Array(1.0f, 0.2f, 0.5f, 0.1f)
    val opp = Array(-1.0f, -0.2f, -0.5f, -0.1f)
    val df = ((0L until 20L).map(i => (i, hot)) ++ Seq((100L, opp), (101L, opp)))
      .toDF("vec_id", "embedding")
    val uncapped = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.99, nPlanes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)) && uncapped.size > 100)
    val capped = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.99, nPlanes = 2, maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((100L, 101L)))
    assert(!capped.exists { case (a, b) => a < 20L && b < 20L })
  }

  test("embedding near-dup: identical vectors pair up across buckets") {
    val v = Array(1.0f, 0.0f, 0.5f, 0.2f)
    val w = Array(-1.0f, 0.3f, 0.0f, 0.9f)
    val df = Seq((1L, v), (2L, v), (3L, w)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", threshold = 0.99, nPlanes = 2)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  // ---------------- Similarity ----------------

  test("brute-force top-k returns nearest by cosine with deterministic ranks") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.9f, 0.1f)), (12L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", "vec_id", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(10L, 11L))
    assert(out.head.getAs[Double]("cosine") == 1.0)
  }

  test("IVF top-k finds the same nearest neighbor when probing enough cells") {
    val corpus = (0 until 50).map(i => (i.toLong, Array(i.toFloat, (50 - i).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(49.0f, 1.0f))).toDF("vec_id", "embedding")
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", "vec_id", k = 3)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    val ivf = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", "vec_id",
      k = 3, nCentroids = 5, nProbe = 5) // probe all cells -> exact
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(ivf == bf)
  }

  test("vector functions: dot, norm, cosine, normalize") {
    val df = Seq((Array(3.0, 4.0), Array(4.0, 3.0))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")),
      VectorFunctions.norm(col("a")),
      VectorFunctions.cosine(col("a"), col("a")),
      VectorFunctions.norm(VectorFunctions.l2Normalize(col("a")))).head()
    assert(r.getDouble(0) == 24.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
  }

  // ---------------- TextAnalysis ----------------

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(("hello world, 42 times!", ""), ("  spaced   out  ", "x")).toDF("t", "u")
    val r = df.select(
      TextAnalysis.tokenCountWs(col("t")),
      TextAnalysis.tokenCountBpe(col("t"))).collect()
    assert(r(0).getLong(0) == 4) // hello | world, | 42 | times!
    assert(r(0).getLong(1) == 6) // hello, world, ",", 42, times, "!"
    assert(r(1).getLong(0) == 2)
    // empty text
    val e = Seq("").toDF("t").select(TextAnalysis.tokenCountWs(col("t"))).head()
    assert(e.getLong(0) == 0)
  }

  test("approx_count_distinct stays within its declared relative error vs exact") {
    val li = graft.Tables.lineitem(spark, sf)
    val rows = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact"),
        approx_count_distinct($"l_partkey", 0.02).as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("dfCut removes corpus-frequent tokens, preserves order, drops empty docs") {
    val df = Seq(
      (1L, "the alpha the beta"),
      (2L, "the gamma delta the"),
      (3L, "the epsilon"),
      (4L, "the the the")).toDF("doc_id", "text")
    // 'the' appears in 4/4 docs -> cut at 0.8; everything else is rare
    val out = TextAnalysis.dfCut(df, "doc_id", "text", maxDocFrac = 0.8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 4 was pure boilerplate and drops out entirely
    assert(out == Map(1L -> "alpha beta", 2L -> "gamma delta", 3L -> "epsilon"))
  }

  test("bigramRepetition flags looping text, passes varied text, handles short docs") {
    val df = Seq(
      (1L, "spam ham spam ham spam ham spam ham spam ham"), // 9 bigrams, 2 distinct
      (2L, "the quick brown fox jumps over a lazy sleeping dog"), // all distinct
      (3L, "word"), // no bigrams
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramRepetition(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((9, 2, true)))   // 2/9 <= 0.8 → repetitive
    assert(out(2L) == ((9, 9, false)))  // fully distinct
    assert(out(3L) == ((0, 0, false)))  // too short: never flagged
    assert(out(4L) == ((0, 0, false)))
  }

  test("redactPii masks emails, IPs, and phone runs; clean text unchanged") {
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "server at 192.168.0.17 responded",
      "call +1 (555) 010-7788 today",
      "nothing sensitive here").toDF("t")
    val out = df.select(TextAnalysis.redactPii($"t")).as[String].collect()
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "server at <IP> responded")
    assert(out(2) == "call <PHONE> today")
    assert(out(3) == "nothing sensitive here")
  }

  test("langId picks the language with most stopword hits") {
    val en = "the cat and the dog sat on the mat with a hat"
    val fr = "le chat et la table sont dans le jardin avec les fleurs"
    val df = Seq(en, fr).toDF("t").select(TextAnalysis.langId(col("t")))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "fr"))
  }

  test("fingerprint is deterministic, whitespace-normalized, non-negative") {
    val df = Seq("hello  world", "hello world", "different").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1)) // collapsed whitespace
    assert(fps(0) != fps(2))
    assert(fps.forall(f => f >= 0 && f < 1000000007L))
  }

  test("quality score: prose scores higher than punctuation soup") {
    val df = Seq(
      "This is a reasonably long sentence with normal words and structure.",
      "!!! ### $$$ %%% ^^^ &&&").toDF("t")
      .select(TextAnalysis.qualityScore(col("t")).as("q"))
    val q = df.collect().map(_.getDouble(0))
    assert(q(0) > q(1))
  }

  // ---------------- Multimodal ----------------

  test("multimodal: real PNG decode returns the generation dims; corrupt bytes yield nulls") {
    val media = Multimodal.syntheticMedia(spark, 5)
    val dec = Multimodal.decodeImages(media)
      .select("media_id", "dec_width", "dec_height", "dec_channels")
      .orderBy("media_id").collect()
    assert(dec.length == 5)
    dec.foreach { r =>
      val i = r.getLong(0)
      assert(r.getInt(1) == Multimodal.imgWidth(i))
      assert(r.getInt(2) == Multimodal.imgHeight(i))
      assert(r.getInt(3) == 3)
    }

    // corrupt payload → null dims, no exception
    import spark.implicits._
    val junk = Seq((99L, "image", Array[Byte](1, 2, 3))).toDF("media_id", "kind", "payload")
    val j = Multimodal.decodeImages(junk).select("dec_width").head()
    assert(j.isNullAt(0))
  }

  test("multimodal: features are the solid fill color; resize preserves it at the target dims") {
    val media = Multimodal.syntheticMedia(spark, 5)
    val feats = Multimodal.extractFeatures(media)
      .select("media_id", "features").orderBy("media_id").collect()
    feats.foreach { r =>
      val i = r.getLong(0)
      val f = r.getAs[scala.collection.Seq[Float]](1)
      val c = Multimodal.imgColor(i)
      assert(f == Seq(((c >> 16) & 0xFF).toFloat, ((c >> 8) & 0xFF).toFloat, (c & 0xFF).toFloat))
    }

    val resized = Multimodal.resizeImages(media, maxDim = 12)
    val redec = Multimodal.decodeImages(Multimodal.extractFeatures(
      resized.drop("features")).withColumnRenamed("features", "f2"))
      .select("media_id", "dec_width", "dec_height", "f2")
      .orderBy("media_id").collect()
    redec.foreach { r =>
      val i = r.getLong(0)
      val (w, h) = (Multimodal.imgWidth(i), Multimodal.imgHeight(i))
      val (tw, th) =
        if (w >= h) (12, math.max(1, h * 12 / w)) else (math.max(1, w * 12 / h), 12)
      assert(r.getInt(1) == tw && r.getInt(2) == th)
      // bilinear resample of a constant image is the same constant
      val c = Multimodal.imgColor(i)
      val f = r.getAs[scala.collection.Seq[Float]](3)
      assert(f == Seq(((c >> 16) & 0xFF).toFloat, ((c >> 8) & 0xFF).toFloat, (c & 0xFF).toFloat))
    }
  }

  test("multimodal: dHash is seed-distinct on the row-gradient fixture and survives corruption") {
    val media = Multimodal.syntheticRowGradientMedia(spark, 20)
    val orig = Multimodal.imageDHash(media)
      .select("media_id", "dhash64").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(orig.values.toSet.size == orig.size, s"dHash collision: $orig")
    // each row band's 8 gradient bits equal the seed's bit r — the
    // fixture's construction makes the hash predictable: row r bits are
    // all-ones iff bit r of the seed is set
    for ((id, hv) <- orig; r <- 0 until 8) {
      val rowBits = (hv >>> (r * 8)) & 0xFFL
      val expect = if (((id >> r) & 1L) == 1L) 0xFFL else 0x00L
      assert(rowBits == expect, s"id=$id row=$r bits=$rowBits")
    }
    val corr = Multimodal.imageDHash(Multimodal.corruptImages(media))
      .select("media_id", "dhash64").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(corr === orig)
  }

  test("multimodal: pcmZcr counts sign-class changes exactly (hand-computed)") {
    import Multimodal.MediaCodec
    // samples: +1, -1, 0, -2, 3 -> sign classes +,-,+,-,+ = 4 crossings
    val wav = MediaCodec.encodeWavPcm16(8000, Array[Short](1, -1, 0, -2, 3))
    assert(MediaCodec.pcmZcr(wav) === Some((5L, 4L)))
    // constant positive: zero crossings
    val flat = MediaCodec.encodeWavPcm16(8000, Array[Short](5, 5, 5))
    assert(MediaCodec.pcmZcr(flat) === Some((3L, 0L)))
    // junk payload
    assert(MediaCodec.pcmZcr("not a wav".getBytes) === None)
  }

  test("multimodal: aHash bit compare is exact past the Long envelope (BigInt branch)") {
    import Multimodal.MediaCodec.blockAboveMean
    // gigapixel regime where n·sum_b wraps Long: 2e9 px, one block holding
    // half of them at max luminance — 765·(1e9)² ≈ 7.7e20 >> 2⁶³
    val n = 2000000000L
    val (countB, sumB) = (1000000000L, 765L * 1000000000L)
    val total = sumB // all luminance in this block → clearly above mean
    assert(blockAboveMean(n, sumB, countB, total))
    // and the dark complement block stays below the mean
    assert(!blockAboveMean(n, 0L, n - countB, total))
    // the wrapped-Long compare would get at least one of these wrong:
    // n * sumB overflows to a negative Long here
    assert(n * sumB < 0)
    // inside the envelope the Long and BigInt paths agree bit for bit
    for (s <- Seq(0L, 1L, 764L, 765L); c <- Seq(1L, 63L, 64L); t <- Seq(0L, 765L, 48960L))
      assert(blockAboveMean(100L, s, c, t) ==
        (BigInt(100L) * BigInt(s) > BigInt(c) * BigInt(t)))
  }

  test("multimodal: aHash survives one-pixel corruption, separates seeds, nulls on junk") {
    val media = Multimodal.syntheticGradientMedia(spark, 10)
    val orig = Multimodal.imageAHash(media)
      .select("media_id", "ahash64").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // distinct seeds -> distinct hashes
    assert(orig.values.toSet.size == orig.size, s"hash collision: $orig")
    // one-pixel corruption leaves every hash fixed (md5 would differ)
    val corr = Multimodal.imageAHash(Multimodal.corruptImages(media))
      .select("media_id", "ahash64").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(corr == orig)
    import org.apache.spark.sql.Row
    val junk = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(99L, "image",
        Array[Byte](1, 2, 3), null))), Multimodal.mediaSchema)
    assert(Multimodal.imageAHash(junk).select("ahash64").head().isNullAt(0))
  }

  test("multimodal: frame container round-trips and sampling decodes per-frame dims") {
    val media = Multimodal.syntheticMedia(spark, 5, kind = "video")
    val frames = Multimodal.sampleFrames(media, framesPerVideo = 3)
    assert(frames.count() == 15) // 5 videos x 3 samples from 8 frames
    val dec = Multimodal.decodeImages(frames.withColumnRenamed("frame", "payload"))
      .select("media_id", "frame_no", "src_frame", "dec_width", "dec_height")
      .orderBy("media_id", "frame_no").collect()
    dec.foreach { r =>
      val (i, j, k) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(k == j * Multimodal.videoFrames / 3)
      assert(r.getInt(3) == Multimodal.frameWidth(i, k))
      assert(r.getInt(4) == Multimodal.frameHeight(i, k))
    }
  }

  test("multimodal: corrupt containers and degenerate WAV headers yield empty/null, never a crash") {
    import Multimodal.MediaCodec
    // valid magic + absurd frame length: must NOT allocate 2 GB (the
    // Error would escape an Exception handler and kill the task)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(0x47524654); out.writeInt(1); out.writeInt(Int.MaxValue - 1)
    assert(MediaCodec.unpackFrames(bos.toByteArray).isEmpty)
    // negative frame count, wrong magic, truncated header
    val bos2 = new java.io.ByteArrayOutputStream()
    val out2 = new java.io.DataOutputStream(bos2)
    out2.writeInt(0x47524654); out2.writeInt(-5)
    assert(MediaCodec.unpackFrames(bos2.toByteArray).isEmpty)
    assert(MediaCodec.unpackFrames(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)).isEmpty)
    assert(MediaCodec.unpackFrames(Array[Byte](1, 2)).isEmpty)
    // round trip still works
    val f = MediaCodec.encodePng(4, 3, 0x112233)
    val packed = MediaCodec.packFrames(Seq(f, f))
    assert(MediaCodec.unpackFrames(packed).map(_.toSeq) == Vector(f.toSeq, f.toSeq))

    // a WAV header hand-edited to declare sample rate 0 parses but must
    // come back as None, not divide by zero downstream
    val wav = MediaCodec.encodeWavPcm16(8000, Array.fill(16)(0.toShort))
    assert(MediaCodec.wavMeta(wav).contains((8000, 16L)))
    val broken = wav.clone()
    // RIFF fmt chunk: sample rate lives at bytes 24-27 (little-endian)
    broken(24) = 0; broken(25) = 0; broken(26) = 0; broken(27) = 0
    assert(MediaCodec.wavMeta(broken).isEmpty)
    assert(MediaCodec.wavMeta(Array.emptyByteArray).isEmpty)
  }

  test("multimodal: WAV probe returns the generation rate and floor-division duration") {
    val media = Multimodal.syntheticMedia(spark, 8, kind = "audio")
    val dec = Multimodal.decodeAudio(media)
      .select("media_id", "sample_rate_dec", "n_frames", "duration_ms")
      .orderBy("media_id").collect()
    assert(dec.length == 8)
    dec.foreach { r =>
      val i = r.getLong(0)
      assert(r.getInt(1) == Multimodal.audioRate(i))
      assert(r.getLong(2) == Multimodal.audioSamples(i).toLong)
      assert(r.getLong(3) == Multimodal.audioSamples(i).toLong * 1000 / Multimodal.audioRate(i))
    }
  }

  test("multimodal: content-hash dedup is falsifiable — one flipped byte breaks the group") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, md5, min, udf}
    val media = Multimodal.syntheticMedia(spark, 5)
    def dupGroups(all: org.apache.spark.sql.DataFrame): Set[Long] =
      all.groupBy(md5(col("payload")).as("h"))
        .agg(count(lit(1)).as("n"), min(col("media_id")).as("keep"))
        .filter(col("n") > 1).collect().map(_.getLong(2)).toSet
    // exact re-keyed copies all pair up...
    val copies = media.withColumn("media_id", col("media_id") + 100)
    assert(dupGroups(media.unionByName(copies)) == Set(1L, 2L, 3L, 4L, 5L))
    // ...but flipping ONE payload byte in one copy must break that pair
    val flip = udf { (b: Array[Byte]) =>
      val c = b.clone(); c(c.length / 2) = (c(c.length / 2) ^ 1).toByte; c
    }
    val tampered = copies.withColumn("payload",
      org.apache.spark.sql.functions
        .when(col("media_id") === 103L, flip(col("payload")))
        .otherwise(col("payload")))
    assert(dupGroups(media.unionByName(tampered)) == Set(1L, 2L, 4L, 5L))
  }
}
