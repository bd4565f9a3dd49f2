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
    // persist the bucket spec beside external data so a later
    // registerBucketed can VALIDATE instead of trusting the caller
    // (r15 advice: spec drift silently mis-buckets downstream joins)
    path.foreach(p =>
      writeSpecSidecar(df.sparkSession, p, keys, numBuckets, sortCols))
  }

  private val SpecFile = "_graft_bucket_spec.json"

  private def writeSpecSidecar(
      spark: SparkSession,
      path: String,
      keys: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String]): Unit = {
    def arr(xs: Seq[String]) = xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    val json = s"""{"keys":${arr(keys)},"numBuckets":$numBuckets,"sortCols":${arr(sortCols)}}"""
    val p = new org.apache.hadoop.fs.Path(s"$path/$SpecFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Register ALREADY-WRITTEN bucket files as an external bucketed
    * table in the current (possibly fresh) session catalog — the cheap
    * sibling of [[writeBucketed]] for when the files survive but the
    * in-memory catalog didn't (a restarted SparkSession): plain DDL,
    * zero data movement. The bucket spec must match what the files
    * were written with or reads are silently mis-bucketed — so the
    * caller-supplied spec is VALIDATED, not trusted (r15 advice):
    * against the `_graft_bucket_spec.json` sidecar [[writeBucketed]]
    * persists beside external data when present, and always against
    * the bucket ids encoded in the file names (`…_00003.c000…` must
    * all sit below `numBuckets`; catches re-registration with fewer
    * buckets than written — the sidecar catches every drift, including
    * MORE buckets than written, which the id range alone cannot).
    */
  def registerBucketed(
      spark: SparkSession,
      table: String,
      schema: org.apache.spark.sql.types.StructType,
      keys: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String],
      path: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val spec = new org.apache.hadoop.fs.Path(s"$path/$SpecFile")
    if (fs.exists(spec)) {
      val in = fs.open(spec)
      val json =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      def arr(field: String): Seq[String] = {
        val a = node.get(field)
        (0 until a.size).map(a.get(_).asText)
      }
      val (wKeys, wN, wSort) = (arr("keys"), node.get("numBuckets").asInt, arr("sortCols"))
      require(wKeys == keys && wN == numBuckets && wSort == sortCols,
        s"registerBucketed($table): spec drift — files at $path were written with " +
          s"(keys=$wKeys, numBuckets=$wN, sortCols=$wSort) but registration asked for " +
          s"(keys=$keys, numBuckets=$numBuckets, sortCols=$sortCols); " +
          "a mismatched spec silently mis-buckets every downstream join")
    }
    // fallback/defense: every bucket id encoded in a data file name must
    // sit below numBuckets
    val BucketId = ".*_(\\d{5})(?:\\.c\\d+)?\\..*".r
    val badIds = fs.listStatus(dir).map(_.getPath.getName).collect {
      case BucketId(id) if id.toInt >= numBuckets => id.toInt
    }
    require(badIds.isEmpty,
      s"registerBucketed($table): files at $path carry bucket ids ${badIds.toSeq.sorted} " +
        s">= numBuckets=$numBuckets — the data was written with a different bucket count")
    val sortClause =
      if (sortCols.nonEmpty) s"SORTED BY (${sortCols.mkString(", ")})" else ""
    spark.sql(
      s"""CREATE TABLE $table (${schema.toDDL})
         USING parquet
         CLUSTERED BY (${keys.mkString(", ")}) $sortClause
         INTO $numBuckets BUCKETS
         LOCATION '$path'""")
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
  import org.apache.spark.sql.Column

  /** Morton bit-spread: 16-bit value → its bits at even positions of a
    * 32-bit lane (the classic mask-shift cascade; long arithmetic so bit
    * 31 never touches a sign bit). All built-in bitwise ops — codegen'd.
    */
  private def spread16(x: Column): Column = {
    val x0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton (z-order) value of two 16-bit-scaled columns: a's bits at
    * even positions, b's at odd. Callers pre-scale both dims into
    * [0, 65535] with a DATA-INDEPENDENT mapping (determinism).
    */
  def zvalue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Z-order clustered write: rows land in `2^bucketBits` directories by
    * the top z-value bits, z-sorted within each. A bucket is an aligned
    * z-curve segment, i.e. an axis-aligned RECTANGLE in (a, b) space — so
    * a 2-D range query touches only the directories whose rectangle
    * intersects its box ([[zorderBuckets]]), and parquet min/max row-group
    * stats on the ORIGINAL columns skip within each directory thanks to
    * the z-sort's locality. This is the multi-dimensional complement of
    * [[clusteredWrite]]: one sort key can serve range predicates on TWO
    * columns at once — the Databricks/Iceberg Z-ORDER layout, rebuilt on
    * open Spark primitives.
    */
  def zorderWrite(
      df: DataFrame,
      path: String,
      aCol: String,
      bCol: String,
      bucketBits: Int = 6): Unit = {
    require(bucketBits > 0 && bucketBits % 2 == 0 && bucketBits <= 16,
      s"bucketBits must be even in [2,16], got $bucketBits")
    df.withColumn("__z", zvalue2(col(aCol), col(bCol)))
      .withColumn("zbucket", shiftright(col("__z"), 32 - bucketBits))
      .repartition(col("zbucket"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("zbucket")
      .parquet(path)
  }

  /** The z-buckets whose (a, b) rectangle intersects the query box — the
    * driver-side index lookup for a [[zorderWrite]] layout. Bounded work:
    * 2^bucketBits iterations over KB of arithmetic, never data.
    */
  def zorderBuckets(
      bucketBits: Int,
      aMin: Long, aMax: Long,
      bMin: Long, bMax: Long): Seq[Long] = {
    val p = bucketBits / 2
    val cell = 1L << (16 - p)
    (0L until (1L << bucketBits)).filter { bucket =>
      // bucket bit 2i is bit (13+i… generally (16-p)+i) of a, 2i+1 of b
      var aP = 0L; var bP = 0L
      var i = 0
      while (i < p) {
        aP |= ((bucket >> (2 * i)) & 1L) << i
        bP |= ((bucket >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      val aLo = aP * cell; val bLo = bP * cell
      aLo + cell - 1 >= aMin && aLo <= aMax && bLo + cell - 1 >= bMin && bLo <= bMax
    }
  }

  /** Read a [[zorderWrite]] layout pruned to the buckets intersecting the
    * scaled query box. Callers still apply their exact predicates — the
    * bucket filter is a superset by construction, so pruning is invisible
    * in the result (the property a driven query's oracle certifies).
    */
  def zorderScan(
      spark: SparkSession,
      path: String,
      bucketBits: Int,
      aMin: Long, aMax: Long,
      bMin: Long, bMax: Long): DataFrame = {
    val keep = zorderBuckets(bucketBits, aMin, aMax, bMin, bMax)
    spark.read.parquet(path).filter(col("zbucket").isin(keep: _*))
  }

  /** Hilbert-clustered write — same directory/bucket contract as
    * [[zorderWrite]] but along the Hilbert curve
    * ([[graft.expressions.functions.hilbert_index]]): consecutive
    * indices are unit Manhattan steps, so a bucket's curve segment stays
    * more compact than the Morton equivalent (fewer touched buckets per
    * 2-D box, the classic Hilbert-vs-Z locality result). A bucket (top
    * 2p index bits) is an aligned square of the quadtree — the prefix
    * property [[hilbertBuckets]] relies on.
    */
  def hilbertWrite(
      df: DataFrame,
      path: String,
      aCol: String,
      bCol: String,
      bucketBits: Int = 6): Unit = {
    require(bucketBits > 0 && bucketBits % 2 == 0 && bucketBits <= 16,
      s"bucketBits must be even in [2,16], got $bucketBits")
    df.withColumn("__h",
        graft.expressions.functions.hilbert_index(col(aCol), col(bCol)))
      .withColumn("hbucket", shiftright(col("__h"), 32 - bucketBits))
      .repartition(col("hbucket"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("hbucket")
      .parquet(path)
  }

  /** The Hilbert buckets whose square intersects the query box: bucket k
    * at order p = 2^(bucketBits/2) is the k-th cell ALONG the order-p
    * Hilbert curve, located by the inverse mapping — bounded driver-side
    * arithmetic, never data.
    */
  def hilbertBuckets(
      bucketBits: Int,
      aMin: Long, aMax: Long,
      bMin: Long, bMax: Long): Seq[Long] = {
    val p = bucketBits / 2
    val cell = 1L << (16 - p)
    (0L until (1L << bucketBits)).filter { bucket =>
      val (aP, bP) = graft.expressions.CurveKernels.hilbertD2XY(p, bucket)
      val aLo = aP * cell; val bLo = bP * cell
      aLo + cell - 1 >= aMin && aLo <= aMax && bLo + cell - 1 >= bMin && bLo <= bMax
    }
  }

  /** Read a [[hilbertWrite]] layout pruned to the intersecting buckets;
    * callers apply their exact predicates residually (superset pruning,
    * invisible in results — the zorderScan contract).
    */
  def hilbertScan(
      spark: SparkSession,
      path: String,
      bucketBits: Int,
      aMin: Long, aMax: Long,
      bMin: Long, bMax: Long): DataFrame = {
    val keep = hilbertBuckets(bucketBits, aMin, aMax, bMin, bMax)
    spark.read.parquet(path).filter(col("hbucket").isin(keep: _*))
  }

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

  /** Small-file compaction planner — the table-maintenance pass every
    * lakehouse at 100 TB runs nightly (streaming ingest and per-executor
    * writes leave thousands of sub-target files per partition; reading
    * them costs a task each). Greedy size-ordered grouping rendered as
    * ONE cumulative sum: within a partition, walk files in `fileCol`
    * order and assign each to bin `floor(cum_before / target)` — the
    * run-length grouping a sequential packer produces, as a pure window
    * expression (no iterative loop, no driver-side walk).
    *
    * The structural bound is emitted per bin as the certificate
    * `total_size < target + max_file_size`: a bin spans less than one
    * target of cum-space plus its last straddling file, so only a file
    * LARGER than target can overshoot by more than itself — exactly
    * greedy first-fit-in-order's guarantee. Bins are contiguous in file
    * order (compaction rewrites preserve any sort/cluster order the
    * partition already had).
    *
    * Scale shape: one per-partition window (keyed parallelism) + one
    * (partition, bin) aggregate riding the same hash — no global
    * anything; output is |bins| rows, not |files|.
    */
  def compactionPlan(
      files: DataFrame,
      partCol: String,
      fileCol: String,
      sizeCol: String,
      targetSize: Long): DataFrame = {
    require(targetSize >= 1, s"targetSize must be positive, got $targetSize")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
    files
      .withColumn("__cum_before",
        coalesce(sum(col(sizeCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("bin", expr(s"__cum_before div ${targetSize}L"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).as("total_size"),
        max(col(sizeCol)).as("max_file_size"),
        min(col(fileCol)).as("first_file"),
        max(col(fileCol)).as("last_file"))
      .withColumn("ok", col("total_size") < col("max_file_size") + targetSize)
  }
}
