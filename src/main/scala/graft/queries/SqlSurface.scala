package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, session_window, sum, unix_micros, window}
import org.apache.spark.sql.types.DecimalType
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
    }),

    // Pivot: order counts per (year, priority) rotated into one column per
    // priority — Spark's relational pivot; the oracle is the equivalent
    // conditional aggregation.
    "q_pivot" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Tables.orders(s, d)
        .select(year(col("o_orderdate")).cast("int").as("o_year"), col("o_orderpriority"))
        .groupBy(col("o_year"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_year")
    }),

    // Lateral view / generator: explode each part's type into its word
    // tokens (SQL LATERAL VIEW explode — the table-generating-function
    // surface), counted per token.
    "q_explode" -> ((s, d) => {
      view(s, d, "part")
      s.sql("""
        SELECT token, count(*) AS n
        FROM part LATERAL VIEW explode(split(p_type, ' ')) t AS token
        GROUP BY token ORDER BY token""")
    }),

    // Unpivot / melt: wide → long relational rotation (Dataset.unpivot).
    "q_unpivot" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_retailprice").cast("double").as("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "metric", "value")
        .orderBy("p_partkey", "metric")
    }),

    // Correlated LATERAL subquery: per-nation aggregate computed in a
    // lateral derived table (decorrelated by Catalyst into a join).
    "q_lateral" -> ((s, d) => {
      Seq("nation", "customer").foreach(view(s, d, _))
      s.sql("""
        SELECT n_name, t.n_cust, t.max_bal
        FROM nation,
        LATERAL (SELECT count(*) AS n_cust,
                        round(max(c_acctbal), 2) AS max_bal
                 FROM customer WHERE c_nationkey = n_nationkey) t
        ORDER BY n_name""")
    }),

    // Window frame variants: dense_rank, ntile, first_value, and a moving
    // sum over a bounded ROWS frame (exact decimal accumulation rendered
    // as DOUBLE — see Relational's oracle-compat rules).
    "q_window_frames" -> ((s, d) => {
      view(s, d, "orders")
      s.sql("""
        SELECT o_custkey, o_orderkey,
               dense_rank()  OVER w AS drank,
               ntile(4)      OVER w AS quartile,
               first_value(o_orderkey) OVER w AS first_order,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS moving_sum
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey""")
    }),

    // Recursive CTE (Spark 4 WITH RECURSIVE → UnionLoop): a literal-anchored
    // month spine left-joined to orders — the calendar-densification shape
    // (months with zero orders appear with n_orders = 0). 80 iterations,
    // well under spark.sql.cteRecursionLevelLimit's default 100. The spine
    // bounds are literals in BOTH engines, so parity holds by construction.
    "q_recursive_cte" -> ((s, d) => {
      view(s, d, "orders")
      s.sql("""
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01 00:00:00')
        SELECT date_format(m, 'yyyy-MM') AS month, count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
        GROUP BY m ORDER BY month""")
    }),

    // Correlated EXISTS with an extra predicate — the SQL-surface
    // decorrelation path (Catalyst rewrites to a left-semi join; contrast
    // q_semi_join, which builds the semi join via the DataFrame API).
    "q_exists_subquery" -> ((s, d) => {
      Seq("customer", "orders").foreach(view(s, d, _))
      s.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")
    }),

    // IN (uncorrelated subquery) over a filtered set.
    "q_in_subquery" -> ((s, d) => {
      Seq("part", "lineitem").foreach(view(s, d, _))
      s.sql("""
        SELECT p_partkey, p_brand
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49.0)
        ORDER BY p_partkey""")
    }),

    // NOT IN three-valued-logic pin: a NULL in the subquery set makes
    // `x NOT IN (...)` never TRUE (NULL-tainted), so the with_null variant
    // must count 0 while the null-free variant counts normally — the
    // classic correctness trap where engines silently disagree, asserted
    // against DuckDB on both branches.
    "q_not_in_nulls" -> ((s, d) => {
      Seq("customer", "orders").foreach(view(s, d, _))
      s.sql("""
        SELECT 'with_null' AS variant, count(*) AS n FROM customer
        WHERE c_custkey NOT IN
          (SELECT nullif(o_custkey, 7) FROM orders WHERE o_custkey < 100)
        UNION ALL
        SELECT 'no_null' AS variant, count(*) AS n FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_custkey < 100 AND o_custkey <> 7)
        ORDER BY variant""")
    }),

    // Time-based RANGE window frame: per-user trailing-hour counts and
    // sums over event time — the sliding-window analytic that ROWS frames
    // (q_window_frames) can't express when rows are unevenly spaced. Peer
    // rows (equal ts) enter the frame together in both engines per the
    // SQL standard; the decimal sum renders as DOUBLE per the proven law.
    "q_window_range" -> ((s, d) => {
      view(s, d, "events")
      s.sql("""
        SELECT event_id, user_id,
          count(*) OVER w AS n_last_hour,
          CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")
    }),

    // Regex scalar surface over patterns valid and IDENTICAL in Java
    // (Spark) and RE2 (DuckDB) — literal classes and groups only, no
    // backrefs/lookahead (the redactPii discipline). Spark's
    // regexp_replace is always global; DuckDB needs the 'g' flag.
    "q_regexp_funcs" -> ((s, d) => {
      view(s, d, "documents")
      s.sql("""
        SELECT doc_id,
          regexp_extract(text, '([a-z]+)', 1) AS first_word,
          regexp_replace(substring(text, 1, 40), '[aeiou]', '_') AS devoweled_head,
          CAST(regexp_count(text, 'the') AS BIGINT) AS n_the,
          regexp_like(text, '[0-9]') AS has_digit
        FROM documents ORDER BY doc_id""")
    }),

    // Spark 4 VARIANT: semi-structured records queryable without
    // schema-on-write — the natural storage type for a Singer/Airbyte-style
    // record stream (the demux path keeps raw JSON; VARIANT makes it
    // typed-queryable lazily). Round trip: typed row → JSON text →
    // parse_json → typed variant_get extraction; the oracle states the
    // identity, so the hash certifies the whole round trip, including
    // try_variant_get's null-not-error contract on a missing path.
    "q_variant_json" -> ((s, d) => {
      view(s, d, "documents")
      s.sql("""
        SELECT doc_id,
          variant_get(v, '$.lang', 'string') AS lang_v,
          variant_get(v, '$.stats.n_chars', 'bigint') AS n_chars_v,
          try_variant_get(v, '$.stats.missing', 'bigint') AS missing_v
        FROM (
          SELECT doc_id,
            parse_json(to_json(named_struct(
              'lang', lang,
              'stats', named_struct('n_chars', n_chars, 'src', source)))) AS v
          FROM documents)
        ORDER BY doc_id""")
    }),

    // Higher-order array functions (lambda surface): transform / filter /
    // aggregate / array_distinct / array_sort / slice, mirrored by DuckDB's
    // list lambdas over the same tokenization.
    "q_higher_order" -> ((s, d) => {
      view(s, d, "documents")
      s.sql("""
        SELECT doc_id,
          size(filter(toks, t -> length(t) > 3)) AS n_long,
          aggregate(toks, 0L, (a, t) -> a + length(t)) AS total_len,
          array_max(transform(toks, t -> length(t))) AS max_len,
          size(array_distinct(toks)) AS n_distinct,
          concat_ws(',', slice(array_sort(array_distinct(toks)), 1, 3)) AS first3
        FROM (SELECT doc_id, filter(split(text, ' '), x -> x != '') AS toks
              FROM documents)
        ORDER BY doc_id""")
    }),

    // IGNORE NULLS navigation: lag and running last_value skipping the
    // planted nulls (every third key). The carried payload is integer
    // cents (round(price*100) as BIGINT) — casting a parquet DOUBLE to
    // DECIMAL rounds HALF_UP in Spark but HALF_EVEN in DuckDB, while
    // integers hash identically; the navigation semantics under test
    // don't care about the payload type. Partitioned window: no global
    // sort.
    "q_window_ignore_nulls" -> ((s, d) => {
      view(s, d, "orders")
      s.sql("""
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 3 = 0 THEN NULL
               ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS v,
          lag(CASE WHEN o_orderkey % 3 = 0 THEN NULL
                   ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) IGNORE NULLS
            OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS prev_v,
          last_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL
                          ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) IGNORE NULLS
            OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen
        FROM orders ORDER BY o_orderkey""")
    }),

    // Spark's native session_window aggregation — the THIRD sessionizer
    // beside the gap-island SQL (q_sessionize) and the stateful stream
    // (q_stream_sessionize), here as the built-in grouping Catalyst
    // plans directly (UpdatingSessionsExec + merge). Boundaries on exact
    // integer microseconds; a session's end is last event + gap, and an
    // event landing EXACTLY on a session end MERGES into it (session
    // merge is inclusive — pinned by SessionWindowSpec against synthetic
    // boundary data, since the corpus's micros gaps never hit the
    // boundary) — the oracle's island flag uses strict > to match.
    "q_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"),
          col("n_events"))
        .orderBy("user_id", "start_us")
    }),

    // Batch SLIDING window aggregation via the native window() grouping
    // (1-day windows every 12 h — each event lands in exactly two):
    // the overlapping-bucket replication Spark plans as a generator +
    // aggregate, distinct from the streaming tumbling use
    // (q_stream_window) and from OVER-clause frames. Boundaries in
    // exact integer microseconds; the per-window value sum finishes as
    // the proven CAST(... AS DOUBLE).
    "q_sliding_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 day", "12 hours").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .select(unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("start_us", "event_type")
    }),

    // Array-function surface: distinct/intersect/except/position over
    // the token arrays. Set-valued results are sorted-then-joined before
    // comparison (Spark's set ops keep first-list order, DuckDB's keep
    // theirs — only the SET is the contract); the not-found position is
    // pinned to 0 on both sides (Spark's convention; DuckDB returns
    // NULL, coalesced), and DuckDB's array_to_string of an EMPTY list is
    // NULL where Spark's array_join is '' — coalesced in the oracle.
    "q_array_funcs" -> ((s, d) => {
      view(s, d, "documents")
      s.sql("""
        SELECT doc_id,
          size(array_distinct(toks)) AS n_distinct,
          array_join(array_sort(array_intersect(toks, array('table','row','key'))), ',') AS common,
          size(array_except(toks, array('table','row','key'))) AS n_rest,
          CAST(array_position(toks, 'table') AS BIGINT) AS table_pos
        FROM (SELECT doc_id, filter(split(text, ' '), x -> x != '') AS toks
              FROM documents)
        ORDER BY doc_id""")
    }),

    // Bitwise aggregate + scalar surface: BIT_AND/BIT_OR/BIT_XOR folds
    // and per-row popcount — pure integer lattice operations, exact in
    // any engine and order-independent by algebra (the rare aggregate
    // family where no rendering discipline is even needed).
    "q_bitwise" -> ((s, d) => {
      view(s, d, "orders")
      s.sql("""
        SELECT o_orderpriority,
          bit_and(o_orderkey) AS and_keys,
          bit_or(o_orderkey) AS or_keys,
          bit_xor(o_orderkey) AS xor_keys,
          sum(CAST(bit_count(o_orderkey) AS BIGINT)) AS total_bits,
          count(*) AS n
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }),

    // Rank-family functions: ntile buckets plus percent_rank/cume_dist.
    // The ratios are IEEE divisions of small exact integers — correctly
    // rounded, hence bit-identical in any engine. Partitioned by
    // priority, ordered by the unique key: the cut is total.
    "q_ntile" -> ((s, d) => {
      view(s, d, "orders")
      s.sql("""
        SELECT o_orderkey, o_orderpriority,
          ntile(8) OVER w AS bucket,
          percent_rank() OVER w AS pr,
          cume_dist() OVER w AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
        ORDER BY o_orderkey""")
    }),

    // ANSI-safe arithmetic: Spark 4 runs ANSI mode ON, so the try_* family
    // (null-on-error instead of job-killing exceptions) is the production
    // path for dirty data — division by a zero derived from data, casts of
    // non-numeric strings, bigint overflow, out-of-bounds array access, and
    // the null-safe equality operator.
    "q_try_arith" -> ((s, d) => {
      view(s, d, "orders")
      s.sql("""
        SELECT o_orderkey,
          try_divide(o_totalprice, CAST(o_orderkey % 3 AS DOUBLE)) AS div_maybe,
          try_cast(o_orderstatus AS INT) AS status_num,
          try_add(9223372036854775807L, o_orderkey) AS add_overflow,
          try_element_at(array('a', 'b'), CAST(o_orderkey % 4 AS INT) + 1) AS elem,
          (o_orderstatus <=> 'O') AS is_open
        FROM orders ORDER BY o_orderkey""")
    }))

  def oracleSql: Map[String, String] = Map(
    // every event replicated into its two candidate 12h-aligned window
    // starts, then filtered to containment — the unnest mirror of
    // Spark's window() generator.
    "q_sliding_window" ->
      """WITH e AS (
           SELECT epoch_us(ts) AS tu, event_type,
             CAST(value AS DECIMAL(18,2)) AS v
           FROM events),
         c AS (
           SELECT event_type, tu, v,
             unnest([(tu // 43200000000) * 43200000000,
                     (tu // 43200000000) * 43200000000 - 43200000000]) AS ws
           FROM e)
         SELECT ws AS start_us, ws + 86400000000 AS end_us, event_type,
           count(*) AS n_events,
           CAST(sum(v) AS DOUBLE) AS sum_value
         FROM c
         WHERE tu >= ws AND tu < ws + 86400000000
         GROUP BY 1, 2, 3
         ORDER BY start_us, event_type""",

    "q_array_funcs" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents)
         SELECT doc_id,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           coalesce(array_to_string(list_sort(list_distinct(
             list_intersect(toks, ['table','row','key']))), ','), '') AS common,
           CAST(len(list_filter(list_distinct(toks),
             x -> NOT list_contains(['table','row','key'], x))) AS INTEGER) AS n_rest,
           CAST(coalesce(list_position(toks, 'table'), 0) AS BIGINT) AS table_pos
         FROM t ORDER BY doc_id""",

    "q_bitwise" ->
      """SELECT o_orderpriority,
           bit_and(o_orderkey) AS and_keys,
           bit_or(o_orderkey) AS or_keys,
           bit_xor(o_orderkey) AS xor_keys,
           CAST(sum(bit_count(o_orderkey)) AS BIGINT) AS total_bits,
           count(*) AS n
         FROM orders
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // gap-island on exact epoch micros; the STRICT > flag mirrors
    // session_window's inclusive merge (an exact-boundary event joins
    // the session — SessionWindowSpec pins this).
    "q_session_window" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
         g AS (
           SELECT user_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 OR
                       lag(ts_us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (
           SELECT user_id, ts_us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM g)
         SELECT user_id, min(ts_us) AS start_us,
           max(ts_us) + 1800000000 AS end_us,
           count(*) AS n_events
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, start_us""",
    // DuckDB spells IGNORE NULLS inside the call parens; Spark after
    // them — same semantics, dialect-local placement.
    "q_window_ignore_nulls" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS v,
           lag(CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE CAST(round(o_totalprice * 100) AS BIGINT) END IGNORE NULLS)
             OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS prev_v,
           last_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL
                           ELSE CAST(round(o_totalprice * 100) AS BIGINT) END IGNORE NULLS)
             OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen
         FROM orders ORDER BY o_orderkey""",

    "q_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
           CAST(ntile(8) OVER w AS INTEGER) AS bucket,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
         ORDER BY o_orderkey""",

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
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           count(*) FILTER (o_orderpriority = '1-URGENT')        AS "1-URGENT",
           count(*) FILTER (o_orderpriority = '2-HIGH')          AS "2-HIGH",
           count(*) FILTER (o_orderpriority = '3-MEDIUM')        AS "3-MEDIUM",
           count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
           count(*) FILTER (o_orderpriority = '5-LOW')           AS "5-LOW"
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q_explode" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split(p_type, ' ')) AS token FROM part)
         GROUP BY token ORDER BY token""",

    "q_unpivot" ->
      """SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
         UNION ALL
         SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
         ORDER BY p_partkey, metric""",

    "q_lateral" ->
      """SELECT n_name, t.n_cust, t.max_bal
         FROM nation,
         LATERAL (SELECT count(*) AS n_cust,
                         round(max(c_acctbal), 2) AS max_bal
                  FROM customer WHERE c_nationkey = n_nationkey) t
         ORDER BY n_name""",

    "q_window_frames" ->
      """SELECT o_custkey, o_orderkey,
           CAST(dense_rank() OVER w AS INTEGER) AS drank,
           CAST(ntile(4)     OVER w AS INTEGER) AS quartile,
           first_value(o_orderkey) OVER w AS first_order,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS moving_sum
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "q_recursive_cte" ->
      """WITH RECURSIVE months(m) AS (
           SELECT TIMESTAMP '1995-01-01 00:00:00'
           UNION ALL
           SELECT m + INTERVAL 1 MONTH FROM months
           WHERE m < TIMESTAMP '2001-08-01 00:00:00')
         SELECT strftime(m, '%Y-%m') AS month, count(o_orderkey) AS n_orders
         FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
         GROUP BY m ORDER BY month""",

    "q_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    "q_in_subquery" ->
      """SELECT p_partkey, p_brand
         FROM part
         WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49.0)
         ORDER BY p_partkey""",

    "q_not_in_nulls" ->
      """SELECT 'with_null' AS variant, count(*) AS n FROM customer
         WHERE c_custkey NOT IN
           (SELECT nullif(o_custkey, 7) FROM orders WHERE o_custkey < 100)
         UNION ALL
         SELECT 'no_null' AS variant, count(*) AS n FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_custkey < 100 AND o_custkey <> 7)
         ORDER BY variant""",

    "q_regexp_funcs" ->
      """SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(text[1:40], '[aeiou]', '_', 'g') AS devoweled_head,
           CAST(len(regexp_extract_all(text, 'the')) AS BIGINT) AS n_the,
           regexp_matches(text, '[0-9]') AS has_digit
         FROM documents ORDER BY doc_id""",

    "q_window_range" ->
      """SELECT event_id, user_id,
           count(*) OVER w AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    // The VARIANT round trip is an identity on the source columns; a
    // missing path under try_variant_get is a typed NULL, not an error.
    "q_variant_json" ->
      """SELECT doc_id, lang AS lang_v, n_chars AS n_chars_v,
           CAST(NULL AS BIGINT) AS missing_v
         FROM documents ORDER BY doc_id""",

    "q_higher_order" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents)
         SELECT doc_id,
           CAST(len(list_filter(toks, t -> length(t) > 3)) AS INTEGER) AS n_long,
           CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
                AS BIGINT) AS total_len,
           CAST(list_max(list_transform(toks, t -> length(t))) AS INTEGER) AS max_len,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3
         FROM t ORDER BY doc_id""",

    // Spark's try_* null-on-error contract stated with DuckDB's natural
    // null semantics (x/0.0 is NULL in DuckDB; overflow stated literally).
    "q_try_arith" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 3) END AS div_maybe,
           TRY_CAST(o_orderstatus AS INTEGER) AS status_num,
           CAST(CASE WHEN o_orderkey = 0 THEN 9223372036854775807 END
                AS BIGINT) AS add_overflow,
           (['a', 'b'])[CAST(o_orderkey % 4 AS INTEGER) + 1] AS elem,
           (o_orderstatus IS NOT DISTINCT FROM 'O') AS is_open
         FROM orders ORDER BY o_orderkey""")
}
