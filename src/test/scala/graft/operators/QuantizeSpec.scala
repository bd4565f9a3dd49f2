package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.expressions.{functions => gfn}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 codes: scale = max|x|/127, codes within [-127, 127], exact round") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)), // all-zero: scale 1, codes stay 0
      (3L, Seq(-12.7f, 6.35f, 0.1f)))
      .toDF("id", "v")
    val out: Map[Long, (Double, Seq[Int])] = Quantize.int8(df, "v")
      .select(col("id"), col("scale"), col("qvec"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2)))).toMap

    val (s1, q1) = (out(1L)._1, out(1L)._2)
    assert(math.abs(s1 - 2.0 / 127) < 1e-12)
    assert(q1 == Seq(math.round(1.0 / s1).toInt, math.round(-2.0 / s1).toInt,
      math.round(0.5 / s1).toInt))
    assert(q1.forall(c => c >= -127 && c <= 127))
    assert(out(2L)._1 == 1.0 && out(2L)._2 == Seq(0, 0, 0))
    assert(out(3L)._2.head == -127) // the max-magnitude coordinate pins to ±127
  }

  test("quantized cosine tracks float cosine within 1% on real embeddings") {
    val emb = Quantize.int8(
      graft.Tables.embeddings(spark, sf).limit(100), "embedding")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"), col("qvec").as("qa"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"), col("qvec").as("qb"))
    val maxErr = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(max(abs(gfn.cosine_sim(col("va"), col("vb"))
        - Quantize.intCosine(col("qa"), col("qb")))).as("m"))
      .head().getDouble(0)
    assert(maxErr < 0.01, s"int8 cosine error $maxErr exceeds 1%")
  }

  test("intCosine handles zero vectors and is exact on known codes") {
    val df = Seq(
      (Seq(1, 0), Seq(1, 0), 1.0),
      (Seq(1, 0), Seq(0, 1), 0.0),
      (Seq(3, 4), Seq(3, 4), 1.0),
      (Seq(0, 0), Seq(1, 1), 0.0)) // zero-norm guard
      .toDF("a", "b", "want")
    val got = df.select(Quantize.intCosine(col("a"), col("b")).as("c"), col("want"))
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("quantization is a narrow projection — no exchange") {
    val plan = Quantize.int8(graft.Tables.embeddings(spark, sf), "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization must not shuffle:\n$plan")
  }
}
