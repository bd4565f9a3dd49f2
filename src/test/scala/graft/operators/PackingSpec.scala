package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences computes spans on a hand-checked shard") {
    // one shard (nShards = 1), ctx = 10: docs of 4, 8, 10, 3 tokens
    // concatenate to offsets [0,4) [4,12) [12,22) [22,25)
    val df = Seq((0L, 4L), (1L, 8L), (2L, 10L), (3L, 3L)).toDF("id", "tok")
    val out = Packing.packSequences(df, "id", "tok", ctxSize = 10, nShards = 1)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, 0L, 1L),   // [0,4)   -> window 0 only
      (1L, 4L, 0L, 1L, 2L),   // [4,12)  -> windows 0..1 (crosses boundary)
      (2L, 12L, 1L, 2L, 2L),  // [12,22) -> windows 1..2
      (3L, 22L, 2L, 2L, 1L))) // [22,25) -> window 2 only
  }

  test("negative ids shard non-negatively (pmod, not %)") {
    val df = Seq((-3L, 5L), (5L, 5L)).toDF("id", "tok")
    val out = Packing.packSequences(df, "id", "tok", ctxSize = 10, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(-3L) == 5L && out(5L) == 5L) // pmod(-3, 8) = 5: same shard
  }

  test("spans tile each shard exactly: contiguous from zero, no gaps or overlap") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokenCountWs(col("text")).as("tok"))
    val out = Packing.packSequences(docs, "doc_id", "tok", ctxSize = 512, nShards = 8)
      .select("doc_id", "shard", "tok", "start_off")
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_._2) // ascending doc_id = packing order
      var expect = 0L
      ordered.foreach { case (_, id, tok, start) =>
        assert(start == expect, s"shard $shard doc $id starts at $start, expected $expect")
        assert(tok > 0, s"zero-token doc $id survived the drop")
        expect += tok
      }
    }
  }

  test("packing is deterministic across repartitionings") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokenCountWs(col("text")).as("tok"))
    val a = Packing.packSequences(docs, "doc_id", "tok", 512, 8)
      .collect().map(_.toSeq).toSet
    val b = Packing.packSequences(docs.repartition(13), "doc_id", "tok", 512, 8)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("packGreedy next-fit on a hand-checked shard, including an oversized doc") {
    // bin 10: docs 4, 5 fill bin 0 (9); 3 overflows -> bin 1 (3); 12 is
    // oversized -> bin 2 alone; 2 can't join it (14 > 10) -> bin 3
    val df = Seq((0L, 4L), (1L, 5L), (2L, 3L), (3L, 12L), (4L, 2L)).toDF("id", "tok")
    val out = Packing.packGreedy(df, "id", "tok", binSize = 10, nShards = 1)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 0L, 4L), (1L, 0L, 9L), (2L, 1L, 3L), (3L, 2L, 12L), (4L, 3L, 2L)))
  }

  test("packGreedy bins never exceed binSize except a lone oversized doc") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokenCountWs(col("text")).as("tok"))
    val rows = Packing.packGreedy(docs, "doc_id", "tok", binSize = 256, nShards = 8)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2)).foreach { case ((shard, bin), docs) =>
      val total = docs.map(_._3).sum
      assert(total <= 256 || docs.length == 1,
        s"shard $shard bin $bin holds $total tokens across ${docs.length} docs")
    }
    // bins are consecutive from 0 in every shard
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      val bins = docs.map(_._2).distinct.sorted.toSeq
      assert(bins == (0L until bins.length.toLong), s"shard $shard bins: $bins")
    }
  }

  test("packGreedy is deterministic across repartitionings") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokenCountWs(col("text")).as("tok"))
    val a = Packing.packGreedy(docs, "doc_id", "tok", 256, 8)
      .collect().map(_.toSeq).toSet
    val b = Packing.packGreedy(docs.repartition(17), "doc_id", "tok", 256, 8)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("lengthBatch on a hand-checked shard: longest-first cuts, padded/waste arithmetic") {
    // one shard (nShards=1), batchSize=2: lengths sorted desc = 9,7,5,3,1
    // batches: [9,7] [5,3] [1] → padded 18,10,1 waste 2,2,0
    val df = Seq((0L, 5L), (1L, 9L), (2L, 1L), (3L, 7L), (4L, 3L))
      .toDF("id", "tok")
    val out = Packing.lengthBatch(df, "id", "tok", batchSize = 2, nShards = 1)
      .orderBy("batch")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (0L, 2L, 9L, 16L, 18L, 2L),
      (1L, 2L, 5L, 8L, 10L, 2L),
      (2L, 1L, 1L, 1L, 1L, 0L)))
  }

  test("lengthBatch: every batch holds at most batchSize docs and is deterministic") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokenCountWs(col("text")).as("tok"))
    val a = Packing.lengthBatch(docs, "doc_id", "tok", 16, 4)
    val rows = a.collect()
    assert(rows.forall(_.getLong(2) <= 16L), "n_docs must be <= batchSize")
    assert(rows.forall(r => r.getLong(6) == r.getLong(5) - r.getLong(4)),
      "waste = padded - sum_tok")
    val b = Packing.lengthBatch(docs.repartition(13), "doc_id", "tok", 16, 4)
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet == b)
  }

  test("attentionSpans tiles every window exactly and conserves doc tokens") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokenCountWs(col("text")).as("tok"))
    val spans = Packing.attentionSpans(docs, "doc_id", "tok", 64, 4).collect()
    assert(spans.nonEmpty)
    // every span is inside [0, ctx), non-empty, and flagged contiguous
    assert(spans.forall(r => r.getLong(3) >= 0 && r.getLong(4) <= 64 &&
      r.getLong(5) > 0 && r.getBoolean(6)))
    // token conservation: per doc, the spans sum to its token count
    val perDoc = spans.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(5)).sum)
    val want = docs.filter(col("tok") > 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.toMap == want)
    // tiling: within each (shard, win), spans cover [0, fill) gap-free
    spans.groupBy(r => (r.getLong(1), r.getLong(2))).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getLong(3)).toSeq
      assert(sorted.head.getLong(3) == 0L)
      sorted.sliding(2).foreach { w =>
        if (w.size == 2) assert(w(0).getLong(4) == w(1).getLong(3))
      }
    }
  }

  test("one shuffle: the plan has a single hash exchange, on the shard key") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokenCountWs(col("text")).as("tok"))
    val df = Packing.packSequences(docs, "doc_id", "tok", 512, 8)
    df.collect()
    // the AdaptiveSparkPlan string repeats the exchange (final + initial
    // plan sections), so count shapes, not occurrences: every hash
    // exchange must be the one on the shard key
    val plan = df.queryExecution.executedPlan.toString
    val all = "Exchange hashpartitioning\\(\\w+".r.findAllIn(plan).toSeq
    assert(all.nonEmpty && all.forall(_.matches("Exchange hashpartitioning\\(shard\\w*")),
      s"expected only shard-keyed hash exchanges, got $all:\n$plan")
  }
}
