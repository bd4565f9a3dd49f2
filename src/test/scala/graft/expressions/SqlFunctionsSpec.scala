package graft.expressions

import graft.SparkSpec

class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("kernel expressions are callable from SQL text") {
    SqlFunctions.registerAll(spark)
    Seq((Array(1.0, 0.0), Array(1.0, 0.0), "the quick fox"))
      .toDF("a", "b", "t").createOrReplaceTempView("sqlfn_t")
    val r = spark.sql("""
      SELECT cosine_sim(a, b) AS cos, dot_product(a, b) AS dot,
             simhash64(t) AS sh,
             jaccard_sorted(shingle_hashes(t, 1), shingle_hashes(t, 1)) AS j,
             size(minhash_signature(t, 2, 16)) AS k
      FROM sqlfn_t""").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getLong(2) != 0L)
    assert(r.getDouble(3) == 1.0)
    assert(r.getInt(4) == 16)
  }
}
