package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB datasets: bucketing (co-located,
  * shuffle-free joins on hot keys) and skew mitigation (salting).
  *
  * At cluster scale the dominant cost of repeated joins/aggregations on the
  * same key is the exchange. Writing fact tables bucketed by that key turns
  * every subsequent equi-join between co-bucketed tables into a zero-shuffle
  * sort-merge (verified by `LayoutSpec`: no Exchange below the join). For
  * key-skewed data, [[saltedJoin]]/[[saltedAggregate]] spread a hot key over
  * `salts` sub-keys — the classic fallback when AQE's skew-join splitting
  * isn't available (e.g. bucketed inputs bypass AQE's shuffle stats).
  */
object Layout {

  /** Write `df` bucketed by `keys` into the session warehouse as `table`.
    * Buckets persist through the metastore; subsequent reads via
    * `spark.table(table)` carry the bucket spec so joins/aggs on `keys`
    * skip the exchange.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty,
      path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.drop(1): _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.drop(1): _*) else w
    // an explicit path makes the table EXTERNAL: metadata lives in the
    // session catalog, files wherever the caller puts them (fixtures go
    // under /tmp, not the session warehouse)
    path.foreach(p => sorted.option("path", p))
    sorted.format("parquet").saveAsTable(table)
  }

  /** Salted inner join for a skewed left key: the left side gets a
    * DETERMINISTIC salt in [0, salts) derived from non-key columns (so
    * replicas of one hot key spread), the right side is replicated `salts`
    * times. One extra narrow explode on the (small) right side buys an even
    * shuffle for the big side.
    */
  def saltedJoin(
      bigSkewed: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val saltCols = bigSkewed.columns.filterNot(_ == key).map(col)
    val l = bigSkewed.withColumn("__salt",
      pmod(hash(saltCols.toSeq: _*), lit(salts)))
    val r = small.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. `partial` and `fin` express
    * the decomposition (e.g. count → sum of counts). Spark's hash aggregate
    * already does map-side partials; explicit salting additionally splits a
    * hot REDUCE key across `salts` reducers.
    */
  def saltedAggregate(
      df: DataFrame,
      key: String,
      salts: Int,
      partial: Seq[(String, org.apache.spark.sql.Column)],
      fin: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    // the salt must vary WITHIN a key to split it across reducers; a hash of
    // the row's partition-local id is stable for a given input layout
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(partial.head._2.as(partial.head._1),
        partial.drop(1).map { case (n, c) => c.as(n) }: _*)
      .groupBy(col(key))
      .agg(fin.head._2.as(fin.head._1),
        fin.drop(1).map { case (n, c) => c.as(n) }: _*)
  }

  /** Repartition-and-sort-within-partitions by key: the write-side layout
    * for downstream merge reads (range-partitioned files, clustered rows).
    */
  def clusteredWrite(
      df: DataFrame,
      path: String,
      partitionCol: String,
      sortCols: Seq[String]): Unit =
    df.repartition(col(partitionCol))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)
}
