package graft.operators

import graft.SparkSpec

class AllocSpec extends SparkSpec {

  test("hamilton: hand-computed largest-remainder apportionment with a tie") {
    // weights (a, b, c) = (2, 3, 5), budget 7, W = 10:
    // floors = (1, 2, 3) sum 6; remainders = (4, 1, 5) -> one leftover
    // unit goes to c (largest remainder). alloc = (1, 2, 4), sum 7.
    val cells = spark.createDataFrame(Seq(("a", 2L), ("b", 3L), ("c", 5L)))
      .toDF("k", "w")
    val out = Alloc.hamilton(cells, Seq("k"), "w", budget = 7L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("base_alloc"), r.getAs[Long]("alloc"),
          r.getAs[Long]("alloc_total"))).toMap
    assert(out("a") === ((1L, 1L, 7L)))
    assert(out("b") === ((2L, 2L, 7L)))
    assert(out("c") === ((3L, 4L, 7L)))
    // remainder TIE broken by key ascending: (x, y) = (1, 1), budget 1,
    // W = 2: remainders equal (1, 1) -> x (smaller key) takes the unit
    val tie = spark.createDataFrame(Seq(("x", 1L), ("y", 1L))).toDF("k", "w")
    val t = Alloc.hamilton(tie, Seq("k"), "w", budget = 1L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(t === Map("x" -> 1L, "y" -> 0L))
  }

  test("hamilton: all-zero weights allocate 0; sum-to-budget law holds at scale-ish") {
    val zero = spark.createDataFrame(Seq(("a", 0L), ("b", 0L))).toDF("k", "w")
    val z = Alloc.hamilton(zero, Seq("k"), "w", budget = 9L).collect()
    assert(z.forall(_.getAs[Long]("alloc") === 0L))
    // 100 cells with pseudo-random weights: Σalloc must equal budget
    val cells = spark.createDataFrame(
      (1 to 100).map(i => (i.toString, (i * 37 % 91 + 1).toLong))).toDF("k", "w")
    val out = Alloc.hamilton(cells, Seq("k"), "w", budget = 123457L).collect()
    assert(out.map(_.getAs[Long]("alloc")).sum === 123457L)
    assert(out.forall(_.getAs[Long]("alloc_total") === 123457L))
  }

  test("hamilton: weight past Long.Max/budget raises loudly") {
    val cells = spark.createDataFrame(Seq(("a", Long.MaxValue / 2), ("b", 1L)))
      .toDF("k", "w")
    val e = intercept[Exception] {
      Alloc.hamilton(cells, Seq("k"), "w", budget = 1000L).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("hamilton"))))
  }
}
