package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.{AirbyteCatalog, ConfiguredCatalog}

/** The source abstraction — the four connector entry points the reference
  * exposes (reference `tap_airbyte/tap.py`): `spec` (config self-description,
  * tap.py:471-497), `check` (connection test, tap.py:524-578), `discover`
  * (catalog scan, tap.py:705-746), `read` (data extraction, tap.py:584-642).
  *
  * Two families of implementations:
  *   - [[FileNativeSource]]: formats Spark reads natively (parquet/csv/json/
  *     jdbc). Discovery = schema inference; read = `spark.read` — scans are
  *     distributed, columnar, and pushdown-capable from the start.
  *   - [[SubprocessSource]]: an external connector process speaking Airbyte
  *     JSONL on stdout, demultiplexed into per-stream DataFrames.
  */
trait AirbyteSource {

  /** Connector spec: a JSON Schema describing the source's own config. */
  def spec: JsonNode

  /** Connection test — true iff the source is reachable/readable. */
  def check(spark: SparkSession): Boolean

  /** Catalog scan: discover streams + schemas + replication metadata. */
  def discover(spark: SparkSession): AirbyteCatalog

  /** Read the selected streams as DataFrames, one per configured entry.
    * `state` carries per-stream bookmarks; implementations apply
    * `cursor > bookmark` so Catalyst pushes the predicate into the scan.
    */
  def read(
      spark: SparkSession,
      configured: Seq[ConfiguredCatalog.Entry],
      state: graft.state.StateStore): Map[String, DataFrame]
}
