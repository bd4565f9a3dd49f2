package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Queries exercised through the SQL interface (`spark.sql` over temp
  * views) — the "streams as temp views" surface of SURVEY §7 step 6:
  * correlated subqueries, GROUPING SETS, exact percentiles, ordered string
  * aggregation. Semantics identical to the DuckDB oracles by construction.
  */
object SqlSurface {

  private def view(s: SparkSession, d: String, name: String): Unit =
    Tables(s, d, name).createOrReplaceTempView(name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_correlated_subquery" -> ((s, d) => {
      Seq("customer", "orders").foreach(view(s, d, _))
      s.sql("""
        SELECT c_custkey,
               (SELECT count(*) FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 100000.0) AS n_big_orders
        FROM customer ORDER BY c_custkey""")
    }),

    "q_grouping_sets" -> ((s, d) => {
      Seq("customer", "nation", "region").foreach(view(s, d, _))
      s.sql("""
        SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
               count(*) AS n
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        ORDER BY region, nation""")
    }),

    "q_percentile" -> ((s, d) => {
      view(s, d, "lineitem")
      s.sql("""
        SELECT l_returnflag,
               percentile(l_quantity, 0.5) AS med_qty,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    "q_string_agg" -> ((s, d) => {
      view(s, d, "lineitem")
      s.sql("""
        SELECT l_returnflag,
               concat_ws(',', sort_array(collect_set(l_linestatus))) AS statuses
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    }))

  def oracleSql: Map[String, String] = Map(
    "q_correlated_subquery" ->
      """SELECT c_custkey,
           (SELECT count(*) FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 100000.0) AS n_big_orders
         FROM customer ORDER BY c_custkey""",

    "q_grouping_sets" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
           count(*) AS n
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
         ORDER BY region, nation""",

    "q_percentile" ->
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS med_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_string_agg" ->
      """SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
