package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the pre-ingest data-quality census (null fractions,
  * cardinalities, ranges) a pipeline runs before trusting a new drop of
  * data. Long-format output, one row per profiled column:
  *
  *   (col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str)
  *
  * Numeric and timestamp columns report min/max through `min_num/max_num`
  * (timestamps as exact epoch-microsecond doubles — |µs| < 2^53, so the
  * cast is lossless; DATE columns as days-since-epoch, the unit DuckDB's
  * `date - DATE '1970-01-01'` reproduces — note the two temporal units
  * differ and an oracle must pick per column type); string columns report
  * `min_str/max_str` under binary collation. Nothing is ever rendered double→string, so an oracle can
  * reproduce the values exactly instead of fighting repr conventions.
  *
  * Scale shape: ONE aggregate job over one scan. The multiple exact
  * `count(DISTINCT col)`s plan through Spark's Expand (rows × n_profiled
  * columns before partial aggregation) — the deliberate price of exact
  * cardinalities in a single pass; swap `countDistinct` for
  * `approx_count_distinct` when profiling very wide tables at full scale
  * and exactness isn't contractual. No collect; the output is one row per
  * column from a final-stage explode of the single aggregate row.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val fields = cols.map(c => df.schema(c))
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = f.name
      val (minNum, maxNum, minStr, maxStr) = f.dataType match {
        case _: NumericType =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case _: TimestampType | _: TimestampNTZType =>
          // NTZ casts through TimestampType; the session runs UTC, so the
          // epoch-micros reading matches DuckDB's epoch_us on the same file
          (min(unix_micros(col(c).cast(TimestampType))).cast("double"),
            max(unix_micros(col(c).cast(TimestampType))).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case _: DateType =>
          (min(datediff(col(c), lit("1970-01-01").cast("date"))).cast("double"),
            max(datediff(col(c), lit("1970-01-01").cast("date"))).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case _: StringType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(col(c)), max(col(c)))
        case other =>
          throw new IllegalArgumentException(
            s"profile: unsupported type $other for column $c")
      }
      Seq(
        count(col(c)).as(s"__${c}_nn"),
        countDistinct(col(c)).as(s"__${c}_nd"),
        minNum.as(s"__${c}_minn"), maxNum.as(s"__${c}_maxn"),
        minStr.as(s"__${c}_mins"), maxStr.as(s"__${c}_maxs"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__${c}_nn")).as("n_nulls"),
        col(s"__${c}_nd").as("n_distinct"),
        col(s"__${c}_minn").as("min_num"), col(s"__${c}_maxn").as("max_num"),
        col(s"__${c}_mins").as("min_str"), col(s"__${c}_maxs").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
