package graft.queries

import graft.SparkSpec

/** Plan-shape assertions for q_star_join: the selective dim filters must
  * reach the parquet scans as PushedFilters, and the KB-sized dims
  * (nation, region) must broadcast — the declared 100 TB plan, not an
  * accident of bench scale.
  */
class StarJoinSpec extends SparkSpec {

  test("q_star_join pushes dim filters into the scans and broadcasts small dims") {
    val df = Relational.queries("q_star_join")(spark, sf)
    val rows = df.collect() // finalize AQE before reading the executed plan
    assert(rows.nonEmpty, "star join returned no rows on sf0.001")
    val plan = df.queryExecution.executedPlan.toString

    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins for nation/region, got:\n$plan")
    // Selective predicates must reach the parquet sources, not run as
    // post-scan filters: each appears in a scan's PushedFilters list.
    Seq("EqualTo(r_name,ASIA)", "EqualTo(c_mktsegment,BUILDING)",
      "GreaterThanOrEqual(o_orderdate,").foreach { p =>
      assert(plan.contains(p), s"filter $p not pushed to its scan:\n$plan")
    }
    // The fact side stays sane: no cartesian anywhere in the star.
    assert(!plan.contains("CartesianProduct"),
      s"unexpected cartesian in star join:\n$plan")
  }

  test("q_star_join matches the equivalent single-SQL result") {
    val df = Relational.queries("q_star_join")(spark, sf)
    Seq("region", "nation", "customer", "orders", "lineitem").foreach { t =>
      graft.Tables(spark, sf, t).createOrReplaceTempView(t)
    }
    val sql = spark.sql(
      """SELECT n_name,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DECIMAL(38,4)) AS revenue
        |FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE r_name = 'ASIA'
        |  AND c_mktsegment = 'BUILDING'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
    assert(df.collect().toSeq == sql.collect().toSeq)
  }
}
