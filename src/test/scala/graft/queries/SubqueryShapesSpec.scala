package graft.queries

import graft.SparkSpec

/** Plan-shape assertions for the decorrelated TPC-H subquery queries:
  * q_small_qty's correlated avg must run as ONE per-part aggregate (not
  * a re-scan per row), and q_waiting_suppliers' EXISTS / NOT EXISTS pair
  * must plan as semi/anti hash joins — never a nested-loop correlation.
  */
class SubqueryShapesSpec extends SparkSpec {

  test("q_small_qty: one per-part aggregate, pushed part filter, no cartesian") {
    val df = Relational.queries("q_small_qty")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(p_size,10)"),
      s"part filter not pushed to the scan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"correlation survived decorrelation:\n$plan")
  }

  test("q_waiting_suppliers: semi + anti joins, no nested-loop correlation") {
    val df = Relational.queries("q_waiting_suppliers")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "no waiting suppliers at sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS leg is not a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS leg is not an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in Q21 shape:\n$plan")
    // numwait descends, ties broken by the unique s_name — the LIMIT cut
    // is total, so any engine (and any partitioning) returns this list
    val nw = rows.map(_.getAs[Long]("numwait"))
    assert(nw.sameElements(nw.sortBy(-_)), "numwait not descending")
  }

  test("q_top_supplier: DECIMAL max-equality selects at least one winner") {
    val df = Relational.queries("q_top_supplier")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "no max-revenue supplier found")
    val revs = rows.map(_.getAs[java.math.BigDecimal]("total_rev")).distinct
    assert(revs.length == 1, s"winners disagree on revenue: ${revs.toSeq}")
  }
}
