package graft.sync

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr, to_json}
import org.apache.spark.sql.types.{ArrayType, MapType, StructField, StructType}

/** Stream maps + flattening — the singer-sdk-inherited transform surface
  * (SURVEY §2.1 #16-17; declared in reference `meltano.yml:16-17`,
  * `README.md:20-23`): per-stream row filter, column add/remove/rename,
  * computed columns from expressions, and nested-schema flattening to a
  * bounded depth with `__`-joined names.
  *
  * Everything here is a declarative Column transform, so Catalyst folds the
  * whole map into the scan stage — filters push down to parquet, computed
  * columns stay inside whole-stage codegen, and no shuffle is introduced.
  */
object StreamMaps {

  /** One stream's map config. `filter` is a SQL boolean expression (the
    * `__filter__` analog), `computed` are name → SQL expression, applied in
    * order; `renames` old → new; `drops` removes columns; `keepOnly`
    * (when non-empty) projects to exactly those columns last.
    *
    * Stream aliasing/duplication (the `__alias__` / `__source__` analogs of
    * singer-sdk stream maps): `alias` renames the OUTPUT stream; `source`
    * marks this map as a DUPLICATE of another stream — the map's config key
    * names the new output stream and `source` names the stream it reads.
    */
  final case class StreamMap(
      filter: Option[String] = None,
      computed: Seq[(String, String)] = Seq.empty,
      renames: Map[String, String] = Map.empty,
      drops: Seq[String] = Seq.empty,
      keepOnly: Seq[String] = Seq.empty,
      alias: Option[String] = None,
      source: Option[String] = None)

  def apply(df: DataFrame, m: StreamMap): DataFrame = {
    var out = df
    m.filter.foreach(f => out = out.filter(expr(f)))
    m.computed.foreach { case (name, e) => out = out.withColumn(name, expr(e)) }
    m.renames.foreach { case (from, to) => out = out.withColumnRenamed(from, to) }
    if (m.drops.nonEmpty) out = out.drop(m.drops: _*)
    if (m.keepOnly.nonEmpty) out = out.select(m.keepOnly.map(col): _*)
    out
  }

  /** Flatten nested structs to `maxDepth` with `__`-joined names. Arrays and
    * maps are JSON-serialized to strings rather than exploded (the
    * singer-sdk flattening behavior — flattening changes shape, never
    * cardinality). Structs still nested at the depth limit are also
    * JSON-serialized. A single `select` of generated Columns: no UDF, no
    * shuffle, stays in codegen.
    */
  def flatten(df: DataFrame, maxDepth: Int = Int.MaxValue, sep: String = "__"): DataFrame = {
    def cols(schema: StructType, prefix: Seq[String], depth: Int): Seq[Column] =
      schema.fields.toSeq.flatMap { case StructField(name, dt, _, _) =>
        val path = prefix :+ name
        val c = col(path.map(p => s"`$p`").mkString("."))
        val flatName = path.mkString(sep)
        dt match {
          // maxDepth counts EXPANDED levels (singer-sdk flattening_max_depth):
          // maxDepth=1 expands top-level structs one level, deeper structs
          // JSON-serialize.
          case st: StructType if depth <= maxDepth => cols(st, path, depth + 1)
          case _: StructType                      => Seq(to_json(c).as(flatName))
          case _: ArrayType                       => Seq(to_json(c).as(flatName))
          case _: MapType                         => Seq(to_json(c).as(flatName))
          case _                                  => Seq(c.as(flatName))
        }
      }
    val flat = cols(df.schema, Seq.empty, 1)
    if (flat.isEmpty) df else df.select(flat: _*)
  }
}
