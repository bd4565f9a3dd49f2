package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video as `binary` columns with
  * typed metadata, plus batch decode / feature-extract / resize /
  * frame-sample / audio-probe stages.
  *
  * The codec is REAL (JDK-native, available in this container): PNG
  * decode/encode/resize through `javax.imageio.ImageIO`, WAV metadata
  * through `javax.sound.sampled.AudioSystem`, and a length-prefixed frame
  * container standing in for a video demuxer (the one genuinely absent
  * codec class here — swap [[MediaCodec.unpackFrames]] for an ffmpeg/javacv
  * demuxer in production without touching the operator plumbing).
  *
  * Scale notes: binary payloads dominate row size, so the operators
  * repartition by byte budget, never by row count; payloads stream through
  * `mapPartitions` an iterator at a time (constant memory per task);
  * metadata-only transforms prune the binary column entirely (verify with
  * `.explain` ReadSchema). Undecodable payloads yield null outputs instead
  * of failing the job — at 100 TB some fraction of media is always corrupt.
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

  /** JDK-native codec. Every method is a pure function of the payload
    * bytes; failures surface as None, never exceptions.
    */
  object MediaCodec {
    ImageIO.setUseCache(false) // keep decode in-memory; no temp-file churn per task

    private def readImage(payload: Array[Byte]): Option[BufferedImage] =
      if (payload == null || payload.isEmpty) None
      else
        try Option(ImageIO.read(new ByteArrayInputStream(payload)))
        catch { case _: Exception => None }

    def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      encodeImage(img)
    }

    private def encodeImage(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode → (width, height, bands). Bands from the decoded raster, so a
      * grayscale PNG reports 1 and truecolor reports 3.
      */
    def decode(payload: Array[Byte]): Option[(Int, Int, Int)] =
      readImage(payload).map(img =>
        (img.getWidth, img.getHeight, img.getRaster.getNumBands))

    /** Per-channel pixel means in 0..255 (RGB order, colormodel-independent
      * via getRGB). Exact integers for solid fills — PNG is lossless.
      */
    def meanRgb(payload: Array[Byte]): Option[Array[Double]] =
      readImage(payload).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        var (r, g, b) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val px = img.getRGB(x, y)
            r += (px >> 16) & 0xFF; g += (px >> 8) & 0xFF; b += px & 0xFF
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Array(r.toDouble / n, g.toDouble / n, b.toDouble / n)
      }

    /** Aspect-preserving resize so max(w, h) == maxDim (no-op when already
      * within budget). Target dims use integer floor division — the exact
      * arithmetic the DuckDB oracle replicates.
      */
    def resizeToMaxDim(payload: Array[Byte], maxDim: Int): Option[Array[Byte]] =
      readImage(payload).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        if (math.max(w, h) <= maxDim) payload
        else {
          val (tw, th) =
            if (w >= h) (maxDim, math.max(1, h * maxDim / w))
            else (math.max(1, w * maxDim / h), maxDim)
          val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          try {
            g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
              RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g2.drawImage(img, 0, 0, tw, th, null)
          } finally g2.dispose()
          encodeImage(out)
        }
      }

    // -------- frame container ("video" = length-prefixed encoded frames) --
    private val FrameMagic = 0x47524654 // "GRFT"

    /** Block-gradient test image: 8×8 grid of 4×4-pixel constant-gray
      * blocks, block b's level = ((b + seed) mod 64)·4 — per-seed
      * DISTINCT above-mean block sets (cyclic shifts), with every
      * block's sum far from the aHash threshold, so a ±1 single-pixel
      * corruption can never flip a hash bit (margin 32768 vs
      * perturbation ~1040 in the cross-multiplied compare). The
      * deterministic fixture for perceptual-hash invariance.
      */
    def encodeGradientPng(seed: Int): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) {
          val b = (x / 4) + 8 * (y / 4)
          val g = ((b + seed) % 64) * 4
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      encodeImage(img)
    }

    /** Row-direction gradient fixture for the dHash family: each of the
      * 8 four-pixel row bands runs left→right INCREASING when bit r of
      * `seed` is set, decreasing otherwise — so the dHash's per-row
      * gradient signs ARE the seed's 8 bits and distinct seeds < 256
      * give distinct hashes BY CONSTRUCTION (the block-gradient fixture
      * collides under dHash: its hash only sees the wrap position).
      * Luminance steps of 8/pixel dwarf the one-pixel +1 corruption.
      */
    def encodeRowGradientPng(seed: Int): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        val r = y / 4
        val up = ((seed >> r) & 1) == 1
        var x = 0
        while (x < 32) {
          val g = if (up) x * 8 else 248 - x * 8
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      encodeImage(img)
    }

    /** Bump pixel (0,0)'s gray by +1 (clamped) and re-encode — the
      * smallest content change that defeats byte-level (md5) dedup
      * while leaving any sane perceptual hash fixed.
      */
    def corruptOnePixel(payload: Array[Byte]): Option[Array[Byte]] =
      readImage(payload).map { img =>
        val px = img.getRGB(0, 0)
        val r = math.min(255, ((px >> 16) & 0xFF) + 1)
        val g = math.min(255, ((px >> 8) & 0xFF) + 1)
        val b = math.min(255, (px & 0xFF) + 1)
        img.setRGB(0, 0, (r << 16) | (g << 8) | b)
        encodeImage(img)
      }

    /** 64-bit average hash (aHash): the image folds into an 8×8 grid of
      * EXACT integer block luminance sums (block p covers pixel rows
      * [p·h/8, (p+1)·h/8) by floor division — any dimensions), and bit
      * b is set when block b's mean luminance exceeds the global mean,
      * decided by the cross-multiplied integer compare
      * N_total·sum_b > n_b·sum_total — no division, no floats, so the
      * hash is bit-deterministic for identical pixels and robust to
      * sub-threshold pixel noise. Luminance = r+g+b (the /3 cancels in
      * the compare).
      */
    def aHash64(payload: Array[Byte]): Option[Long] =
      readImage(payload).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val sums = new Array[Long](64)
        val counts = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          val by = (y.toLong * 8 / h).toInt
          var x = 0
          while (x < w) {
            val bx = (x.toLong * 8 / w).toInt
            val px = img.getRGB(x, y)
            val lum = (((px >> 16) & 0xFF) + ((px >> 8) & 0xFF) + (px & 0xFF)).toLong
            val b = by * 8 + bx
            sums(b) += lum
            counts(b) += 1
            total += lum
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        // n·sums(b) ≤ 765·n² exceeds Long past n ≈ 1.1·10⁸ pixels (worst
        // case: one block holds nearly all luminance); above the exact
        // envelope the compare runs in BigInt so the hash stays
        // bit-deterministic instead of silently wrapping (r15 advice)
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (blockAboveMean(n, sums(b), counts(b), total)) hash |= (1L << b)
          b += 1
        }
        hash
      }

    /** The aHash bit decision n·sum_b > count_b·total, exact at every
      * image size: in Long inside the proven envelope (n ≤ 10⁸ pixels
      * keeps n·sum_b ≤ 765·n² < 2⁶³), in BigInt past it.
      */
    private[operators] def blockAboveMean(
        n: Long, sumB: Long, countB: Long, total: Long): Boolean =
      if (countB <= 0) false
      else if (n <= 100000000L) n * sumB > countB * total
      else BigInt(n) * BigInt(sumB) > BigInt(countB) * BigInt(total)

    /** 64-bit difference hash (dHash): the image folds into a 9×8 grid
      * of exact integer block luminance sums (cols by ⌊x·9/w⌋, rows by
      * ⌊y·8/h⌋ — any dimensions), and bit r·8+c is set when column c's
      * mean luminance is strictly BELOW column c+1's in row r — the
      * horizontal GRADIENT sign, which survives global brightness and
      * contrast shifts that move [[aHash64]]'s global mean. Compare is
      * the cross-multiplied integer sum_l·cnt_r < sum_r·cnt_l — no
      * division, no floats; empty cells (w < 9) yield 0 bits.
      */
    def dHash64(payload: Array[Byte]): Option[Long] =
      readImage(payload).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val sums = Array.ofDim[Long](8, 9)
        val counts = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val ry = (y.toLong * 8 / h).toInt
          var x = 0
          while (x < w) {
            val cx = (x.toLong * 9 / w).toInt
            val px = img.getRGB(x, y)
            val lum = (((px >> 16) & 0xFF) + ((px >> 8) & 0xFF) + (px & 0xFF)).toLong
            sums(ry)(cx) += lum
            counts(ry)(cx) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var hash = 0L
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            if (meanStrictlyLess(n, sums(r)(c), counts(r)(c),
                sums(r)(c + 1), counts(r)(c + 1)))
              hash |= (1L << (r * 8 + c))
            c += 1
          }
          r += 1
        }
        hash
      }

    /** mean_l < mean_r as the cross product sum_l·cnt_r < sum_r·cnt_l —
      * Long inside the [[blockAboveMean]] envelope (765·n² < 2⁶³ at
      * n ≤ 10⁸ px), BigInt past it; false when either cell is empty.
      */
    private[operators] def meanStrictlyLess(
        n: Long, sumL: Long, cntL: Long, sumR: Long, cntR: Long): Boolean =
      if (cntL <= 0 || cntR <= 0) false
      else if (n <= 100000000L) sumL * cntR < sumR * cntL
      else BigInt(sumL) * BigInt(cntR) < BigInt(sumR) * BigInt(cntL)

    /** Zero-crossing census over 16-bit PCM: (n_samples, n_crossings)
      * where a crossing is a SIGN-CLASS change between consecutive
      * samples (negative vs non-negative — zero counts as positive, so
      * the rule is total and tie-free). The classic O(1)-state
      * voiced/unvoiced + noisiness feature next to [[pcmStats]]'s
      * energy; same decode path, None on non-16-bit payloads.
      */
    def pcmZcr(payload: Array[Byte]): Option[(Long, Long)] =
      if (payload == null || payload.isEmpty) None
      else
        try {
          val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16) None
          else {
            val bytes = ais.readAllBytes()
            val bigEndian = fmt.isBigEndian
            var idx = 0
            var n = 0L
            var cross = 0L
            var prevNeg = false
            while (idx + 1 < bytes.length) {
              val b0 = bytes(idx) & 0xFF
              val b1 = bytes(idx + 1) & 0xFF
              val v = (if (bigEndian) (b0 << 8) | b1 else (b1 << 8) | b0)
                .toShort.toLong
              val neg = v < 0
              if (n > 0 && neg != prevNeg) cross += 1
              prevNeg = neg
              n += 1
              idx += 2
            }
            Some((n, cross))
          }
        } catch { case _: Exception => None }

    def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(FrameMagic)
      out.writeInt(frames.length)
      frames.foreach { f => out.writeInt(f.length); out.write(f) }
      out.flush()
      bos.toByteArray
    }

    def unpackFrames(payload: Array[Byte]): IndexedSeq[Array[Byte]] =
      try {
        val in = new DataInputStream(new ByteArrayInputStream(payload))
        if (in.readInt() != FrameMagic) Vector.empty
        else {
          val n = in.readInt()
          var remaining = payload.length - 8
          if (n < 0 || n > remaining / 4) Vector.empty
          else (0 until n).map { _ =>
            val len = in.readInt()
            remaining -= 4
            // bound by the bytes actually present BEFORE allocating: a
            // corrupt length field must not OOM the task (OutOfMemoryError
            // is an Error — the Exception handler below never sees it)
            if (len < 0 || len > remaining) throw new java.io.EOFException()
            val buf = new Array[Byte](len)
            in.readFully(buf)
            remaining -= len
            buf
          }
        }
      } catch { case _: Exception => Vector.empty }

    // -------- audio (16-bit mono PCM WAV via javax.sound.sampled) ---------
    def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) { // little-endian per the format above
        bytes(2 * i) = (samples(i) & 0xFF).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** WAV header probe → (sample rate, frame count); no PCM decode. */
    def wavMeta(payload: Array[Byte]): Option[(Int, Long)] =
      if (payload == null || payload.isEmpty) None
      else
        try {
          val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payload))
          val (rate, nf) = (aff.getFormat.getSampleRate.toInt, aff.getFrameLength.toLong)
          // a parseable header can still declare rate 0 / NOT_SPECIFIED (-1):
          // treat it as undecodable, not as a divide-by-zero downstream
          if (rate <= 0 || nf < 0) None else Some((rate, nf))
        } catch { case _: Exception => None }

    /** Exact integer PCM16 feature pass: (n_samples, Σ|s|, max|s|,
      * silent count at |s| ≤ 327 ≈ 1% full scale, Σs² energy) from the
      * decoded little/big-endian frames — all integers (energy tops out
      * at 2³⁰ per sample — BIGINT to ~8·10⁹ samples), so the stats are
      * bit-deterministic and replayable. None on undecodable or
      * non-16-bit payloads.
      */
    def pcmStats(payload: Array[Byte]): Option[(Long, Long, Long, Long, Long)] =
      if (payload == null || payload.isEmpty) None
      else
        try {
          val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16) None
          else {
            val bytes = ais.readAllBytes()
            val bigEndian = fmt.isBigEndian
            var idx = 0
            var n = 0L; var sumAbs = 0L; var maxAbs = 0L
            var nSil = 0L; var energy = 0L
            while (idx + 1 < bytes.length) {
              val b0 = bytes(idx) & 0xFF
              val b1 = bytes(idx + 1) & 0xFF
              val v = (if (bigEndian) (b0 << 8) | b1 else (b1 << 8) | b0)
                .toShort.toLong
              val a = math.abs(v)
              n += 1; sumAbs += a
              if (a > maxAbs) maxAbs = a
              if (a <= 327L) nSil += 1
              energy += v * v
              idx += 2
            }
            Some((n, sumAbs, maxAbs, nSil, energy))
          }
        } catch { case _: Exception => None }
  }

  /** Decode: payload → decoded dimensions + band count, batched per
    * partition. Undecodable payloads yield null dims.
    */
  def decodeImages(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.toSeq ++ Seq(
      StructField("dec_width", IntegerType), StructField("dec_height", IntegerType),
      StructField("dec_channels", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        MediaCodec.decode(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some((w, h, c)) => Row.fromSeq(r.toSeq ++ Seq(w, h, c))
          case None            => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }(enc)
  }

  /** Feature extraction: payload → per-channel mean pixel values in 0..255
    * (RGB order) as an Array[Float] embedding column; null when the payload
    * doesn't decode.
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.toSeq :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val feats = MediaCodec.meanRgb(r.getAs[Array[Byte]](payloadIdx))
          .map(_.map(_.toFloat).toSeq).orNull
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Resize: payload → aspect-preserving thumbnail with max(w, h) bounded
    * by `maxDim` (re-encoded PNG). Undecodable payloads pass through
    * unchanged — corrupt media is filtered downstream, not crashed on.
    */
  def resizeImages(df: DataFrame, maxDim: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        MediaCodec.resizeToMaxDim(p, maxDim) match {
          case Some(resized) => Row.fromSeq(r.toSeq.updated(payloadIdx, resized))
          case None          => r
        }
      }
    }(enc)
  }

  /** Frame sampling: `n` evenly spaced frames per video (the j-th sample is
    * source frame `j * total / n`, integer floor — oracle-replicable). A
    * video with `total <= n` frames emits each frame exactly once (the
    * stride formula would repeat index 0 and never reach the tail: 2 frames
    * at n=4 gives k = 0,0). Cardinality-increasing: one row per sampled
    * frame, the video analog of explode.
    */
  def sampleFrames(df: DataFrame, framesPerVideo: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("frame_no", IntegerType),
      StructField("src_frame", IntegerType), StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val n = math.max(1, framesPerVideo)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = MediaCodec.unpackFrames(
          Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray))
        if (frames.isEmpty) Iterator.empty
        else (0 until math.min(n, frames.length)).iterator.map { j =>
          val k = if (frames.length <= n) j else j * frames.length / n
          Row(r.getLong(idIdx), j, k, frames(k))
        }
      }
    }(enc)
  }

  /** Audio probe: payload → (decoded sample rate, frame count, duration in
    * ms by integer floor division). Header-only — no PCM ever leaves the
    * codec, so the operator is I/O-bound, not CPU-bound.
    */
  def decodeAudio(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.toSeq ++ Seq(
      StructField("sample_rate_dec", IntegerType), StructField("n_frames", LongType),
      StructField("duration_ms", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        MediaCodec.wavMeta(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some((rate, nf)) =>
            // Seq[Any] keeps rate an Int — a bare Seq(Int, Long, ...) would
            // numerically widen to Seq[Long] and break the row encoder
            Row.fromSeq(r.toSeq ++ Seq[Any](rate, nf, nf * 1000L / rate))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
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

  // ---- synthetic media generation parameters --------------------------
  // Every decoded property below is a closed-form function of media_id,
  // mirrored literally in the DuckDB oracle SQL — so the driver's hash
  // check certifies the REAL encode→decode round trip, not a stub.
  def imgWidth(i: Long): Int = (16 + i % 17).toInt
  def imgHeight(i: Long): Int = (16 + (i * 7) % 13).toInt
  def imgColor(i: Long): Int =
    (((i % 256) << 16) | (((i * 3) % 256) << 8) | ((i * 5) % 256)).toInt
  val videoFrames: Int = 8
  def frameWidth(i: Long, f: Int): Int = (8 + (i + f) % 9).toInt
  def frameHeight(i: Long, f: Int): Int = (8 + (i * 3 + f) % 7).toInt
  def frameColor(i: Long, f: Int): Int =
    ((((i * 11 + f * 17) % 256) << 16) | (((i * 13 + f * 19) % 256) << 8) |
      ((i * 7 + f * 23) % 256)).toInt
  def audioRate(i: Long): Int = (8000 + (i % 8) * 1000).toInt
  def audioSamples(i: Long): Int = (4000 + (i % 5) * 800).toInt

  /** Deterministic synthetic media table: REAL PNG / WAV / frame-container
    * payloads generated executor-side from `spark.range` (the driver never
    * holds the corpus — the shape that scales).
    */
  /** Audio feature extraction: payload → exact integer PCM stats
    * (n_samples, sum_abs, max_abs, n_silent, energy) + the derived
    * `silence_pm` — the ingest-time audio quality screen (dead air,
    * clipping, loudness) next to the image family's decode/feature
    * passes. Null columns when the payload doesn't decode as 16-bit
    * PCM.
    */
  def audioStats(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.toSeq ++ Seq(
      StructField("n_samples", LongType), StructField("sum_abs", LongType),
      StructField("max_abs", LongType), StructField("n_silent", LongType),
      StructField("energy", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        MediaCodec.pcmStats(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some((n, sa, ma, ns, e)) => Row.fromSeq(r.toSeq ++ Seq(n, sa, ma, ns, e))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }(enc)
  }

  /** Difference-hash sibling of [[imageAHash]]: payload → 64-bit dHash
    * column (null on undecodable payloads). The gradient-sign hash is
    * the robust member of the perceptual pair — a global brightness /
    * contrast shift moves every aHash block against the global mean
    * but leaves horizontal gradient SIGNS fixed. Same groupBy /
    * banding consumers downstream.
    */
  def imageDHash(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.toSeq :+
      StructField("dhash64", LongType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val hv = MediaCodec.dHash64(r.getAs[Array[Byte]](payloadIdx))
          .map(java.lang.Long.valueOf).orNull
        Row.fromSeq(r.toSeq :+ hv)
      }
    }(enc)
  }

  /** Zero-crossing-rate pass: payload → (n_samples, n_crossings,
    * zcr_pm) — the O(1)-state noisiness / voicedness screen next to
    * [[audioStats]]'s energy columns; `zcr_pm` = crossings per
    * thousand sample TRANSITIONS (denominator n−1). Nulls when the
    * payload doesn't decode as 16-bit PCM.
    */
  def audioZcr(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.toSeq ++ Seq(
      StructField("n_samples", LongType), StructField("n_cross", LongType),
      StructField("zcr_pm", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        MediaCodec.pcmZcr(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some((n, c)) =>
            val pm: java.lang.Long = if (n > 1) 1000L * c / (n - 1) else 0L
            Row.fromSeq(r.toSeq ++ Seq(n, c, pm))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }(enc)
  }

  /** Perceptual hashing: payload → 64-bit aHash column (null when the
    * payload doesn't decode). The near-dup key for image dedup — byte
    * dedup (q_media_dedup's md5) misses re-encoded or lightly-edited
    * copies; the aHash groups them. Downstream, exact-match groupBy or
    * the simhash banding machinery over the hash both apply.
    */
  def imageAHash(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.toSeq :+
      StructField("ahash64", LongType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val hv = MediaCodec.aHash64(r.getAs[Array[Byte]](payloadIdx))
          .map(java.lang.Long.valueOf).orNull
        Row.fromSeq(r.toSeq :+ hv)
      }
    }(enc)
  }

  /** One-pixel corruption transform — the adversarial fixture for
    * perceptual dedup: output bytes differ (md5 dedup misses them),
    * pixels differ sub-threshold (aHash must not). Undecodable
    * payloads pass through unchanged, the resizeImages convention.
    */
  def corruptImages(df: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        val out = MediaCodec.corruptOnePixel(p).getOrElse(p)
        Row.fromSeq(r.toSeq.updated(payloadIdx, out))
      }
    }(enc)
  }

  /** Deterministic block-gradient image fixture (media_id 1..n, seed =
    * id mod 64) — distinct aHashes per seed by construction; see
    * [[MediaCodec.encodeGradientPng]].
    */
  def syntheticGradientMedia(spark: SparkSession, n: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    spark.range(1, n + 1L).toDF("media_id").mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        Row(i, "image", MediaCodec.encodeGradientPng((i % 64).toInt),
          Row("image/png", 32, 32, null, null))
      }
    }(enc)
  }

  /** Row-direction gradient fixture (media_id 1..n ≤ 255, seed = id) —
    * dHash-distinct per seed by construction; see
    * [[MediaCodec.encodeRowGradientPng]].
    */
  def syntheticRowGradientMedia(spark: SparkSession, n: Int): DataFrame = {
    require(n >= 1 && n <= 255, s"row-gradient seeds live in [1, 255]: $n")
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    spark.range(1, n + 1L).toDF("media_id").mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        Row(i, "image", MediaCodec.encodeRowGradientPng(i.toInt),
          Row("image/png", 32, 32, null, null))
      }
    }(enc)
  }

  def syntheticMedia(spark: SparkSession, n: Int, kind: String = "image"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    spark.range(1, n + 1L).toDF("media_id").mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        kind match {
          case "video" =>
            val frames = (0 until videoFrames).map(f =>
              MediaCodec.encodePng(frameWidth(i, f), frameHeight(i, f), frameColor(i, f)))
            Row(i, kind, MediaCodec.packFrames(frames),
              Row("application/x-graft-frames", null, null, videoFrames * 40L, null))
          case "audio" =>
            val (rate, ns) = (audioRate(i), audioSamples(i))
            val samples = Array.tabulate(ns)(j => ((i * 131 + j * 7) % 65536 - 32768).toShort)
            Row(i, kind, MediaCodec.encodeWavPcm16(rate, samples),
              Row("audio/wav", null, null, ns.toLong * 1000 / rate, rate))
          case _ =>
            val (w, h) = (imgWidth(i), imgHeight(i))
            Row(i, "image", MediaCodec.encodePng(w, h, imgColor(i)),
              Row("image/png", w, h, null, null))
        }
      }
    }(enc)
  }
}
