package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side shape is real and tested — schema, partition sizing,
  * batch iteration via `mapPartitions` over typed rows (the Scala analog of
  * `mapInPandas` batches) — while the actual codec step is STUBBED with a
  * deterministic fake (this container has no image/audio libraries; swap
  * [[FakeCodec]] for a JNI/javacv decoder in production without touching
  * the plumbing).
  *
  * Scale notes: binary payloads dominate row size, so the operators
  * repartition by byte budget, never by row count; metadata-only transforms
  * prune the binary column entirely (verify with `.explain` ReadSchema).
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))), nullable = true)))

  /** Deterministic fake codec — stands in for the real decoder.
    * Every output is a pure function of the payload bytes, so tests are
    * reproducible and the pipeline shape (batch in → rows out) is exercised
    * for real.
    */
  object FakeCodec {
    /** "Decode" → (width, height, channels) from a stable payload hash. */
    def decodeImage(payload: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (math.abs(h % 1024) + 32, math.abs((h >> 10) % 1024) + 32, 3)
    }
    /** "Feature vector": 8 floats from rolling sums over the bytes. */
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) { out(i % dim) += (payload(i) & 0xFF) / 255.0f; i += 1 }
      out
    }
    /** "Resize": a deterministic downsample of the byte stream. */
    def resize(payload: Array[Byte], maxBytes: Int): Array[Byte] =
      if (payload.length <= maxBytes) payload
      else {
        val stride = payload.length.toDouble / maxBytes
        Array.tabulate(maxBytes)(i => payload((i * stride).toInt))
      }
    /** "Frame sample": split the payload into n equal chunks ("frames"). */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val sz = math.max(1, payload.length / math.max(n, 1))
      payload.grouped(sz).take(n).toSeq
    }
  }

  /** Decode: payload → decoded dimensions, batched per partition. The
    * binary column flows through `mapPartitions` an iterator at a time —
    * constant memory per task regardless of corpus size.
    */
  def decodeImages(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields.toSeq ++ Seq(
      StructField("dec_width", IntegerType), StructField("dec_height", IntegerType),
      StructField("dec_channels", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
        val (w, h, c) = FakeCodec.decodeImage(p)
        Row.fromSeq(r.toSeq ++ Seq(w, h, c))
      }
    }(enc)
  }

  /** Feature extraction: payload → Array[Float] embedding column. */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val outSchema = StructType(df.schema.fields.toSeq :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
        Row.fromSeq(r.toSeq :+ FakeCodec.features(p, dim).toSeq)
      }
    }(enc)
  }

  /** Resize: payload → bounded payload (byte-budgeted). */
  def resizeImages(df: DataFrame, maxBytes: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
        Row.fromSeq(r.toSeq.updated(payloadIdx, FakeCodec.resize(p, maxBytes)))
      }
    }(enc)
  }

  /** Frame sampling: one row per sampled frame (cardinality-increasing —
    * the video analog of explode).
    */
  def sampleFrames(df: DataFrame, framesPerVideo: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val p = Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
        FakeCodec.sampleFrames(p, framesPerVideo).zipWithIndex.map { case (f, i) =>
          Row(r.getLong(idIdx), i, f)
        }
      }
    }(enc)
  }

  /** Byte-budget repartition: size partitions by payload bytes, not rows —
    * with multi-MB binaries, row-count partitioning OOMs at scale.
    */
  def repartitionByBytes(df: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val totalBytes = df.agg(sum(coalesce(length(col("payload")), lit(0)))).head().getLong(0)
    val n = math.max(1, (totalBytes / math.max(targetBytesPerPartition, 1L)).toInt)
    df.repartition(n)
  }

  /** Deterministic synthetic media table (for tests; payload from a seeded
    * per-id byte pattern).
    */
  def syntheticMedia(spark: SparkSession, n: Int, kind: String = "image"): DataFrame = {
    import spark.implicits._
    val rows = (1 to n).map { i =>
      val payload = Array.tabulate(256 + (i % 512))(j => ((i * 31 + j * 7) % 256).toByte)
      (i.toLong, kind, payload)
    }
    rows.toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        lit(null).cast(IntegerType).as("sample_rate")))
  }
}
