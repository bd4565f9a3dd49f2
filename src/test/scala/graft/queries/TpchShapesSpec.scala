package graft.queries

import graft.SparkSpec

/** Plan-shape assertions for the round-7 TPC-H additions (Q7, Q11, Q13,
  * Q16, Q22, Q2 shapes): each one's scale-relevant property — broadcast
  * dims, pushed filters, anti-join decorrelation, window-min instead of a
  * join-back — must hold in the executed plan, not just produce rows.
  */
class TpchShapesSpec extends SparkSpec {

  /** Q7's two-nation slice is empty at sf0.001; its equivalence test
    * runs at the oracle's scale instead.
    */
  private val sf0_01 = "/root/testdata/sf0.01"

  test("q_volume_shipping: nation pair pre-filtered, all dims broadcast, no cartesian") {
    val df = Relational.queries("q_volume_shipping")(spark, sf)
    // The two-nation slice can legitimately be empty at sf0.001 (the
    // sf0.01 oracle run is non-empty); the SHAPE must hold regardless.
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dims must broadcast, got:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in Q7 shape:\n$plan")
    // The pair restriction reaches both nation scans — ~92% of the fact
    // drops at the first broadcast probe, not at a post-join filter.
    assert(plan.contains("In(n_name, [NATION_1,NATION_2])"),
      s"nation-pair filter not pushed to the nation scans:\n$plan")
    // No same-nation pairs survive.
    rows.foreach { r =>
      assert(r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation"))
    }
  }

  test("q_volume_shipping matches the equivalent single-SQL result") {
    val df = Relational.queries("q_volume_shipping")(spark, sf0_01)
    Seq("supplier", "nation", "customer", "orders", "lineitem").foreach { t =>
      graft.Tables(spark, sf0_01, t).createOrReplaceTempView(t)
    }
    val sql = spark.sql(
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DECIMAL(38,4)) AS revenue
        |FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
    val rows = df.collect().toSeq
    assert(rows.nonEmpty, "no volume-shipping rows at sf0.01")
    assert(rows == sql.collect().toSeq)
  }

  test("q_important_parts: every survivor clears the cross-multiplied threshold") {
    val df = Relational.queries("q_important_parts")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "no important parts at sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // The threshold is a SINGLE broadcast row (the Q15/q_bm25 pattern);
    // the nation semi join runs inside the localCheckpoint build and is
    // asserted through the result below, not through this plan.
    assert(!plan.contains("CartesianProduct"), s"cartesian in Q11 shape:\n$plan")
    // Re-derive the cut: survivors' values all clear total/700 and the
    // survivor set is exactly the over-threshold slice of the rebuilt
    // per-part aggregate.
    import org.apache.spark.sql.functions._
    val natSup = graft.Tables.supplier(spark, sf)
      .join(graft.Tables.nation(spark, sf).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = graft.Tables.lineitem(spark, sf)
      .join(natSup, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("value"))
    val total = perPart.agg(sum(col("value"))).collect()(0).getDecimal(0)
    val expect = perPart.collect()
      .filter(r => r.getDecimal(1).multiply(new java.math.BigDecimal(700))
        .compareTo(total) > 0)
      .map(_.getLong(0)).sorted
    assert(rows.map(_.getAs[Long]("p_partkey")).sorted.sameElements(expect))
  }

  test("q_order_count_dist: zero-order customers appear (the ON-clause exclusion)") {
    val df = Relational.queries("q_order_count_dist")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // custdist sums back to |customer| — LEFT OUTER kept every customer.
    val total = rows.map(_.getAs[Long]("custdist")).sum
    val nCust = graft.Tables.customer(spark, sf).count()
    assert(total == nCust, s"distribution covers $total of $nCust customers")
  }

  test("q_supplier_variety: NOT IN plans as a broadcast anti join") {
    val df = Relational.queries("q_supplier_variety")(spark, sf)
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"supplier exclusion should plan as an anti join:\n$plan")
    assert(plan.contains("Expand") || plan.contains("distinct"),
      s"count(DISTINCT) should run two-phase:\n$plan")
  }

  test("q_lost_customers: non-empty, dated anti join, exact-decimal threshold") {
    val df = Relational.queries("q_lost_customers")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "lost-customer cut is empty — weak oracle")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT EXISTS leg is not an anti join:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate,"),
      s"recent-order date filter not pushed to the orders scan:\n$plan")
  }

  test("q_min_cost_supplier: window min, no join-back, winners hit the per-part min") {
    val df = Relational.queries("q_min_cost_supplier")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "no min-cost suppliers at sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a window min:\n$plan")
    // Exactly ONE sort-merge-free shuffle family feeds the window — the
    // correlated min never re-scans lineitem per part.
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"correlation survived decorrelation:\n$plan")
    // Every emitted row's price IS its part's min across the result set.
    val byPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    byPart.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Double]("min_price")).distinct.size == 1)
    }
  }
}
