package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns plus typed metadata structs (north-star extension,
  * BASELINE.json). PNG and JPEG are decoded for real — `javax.imageio` is
  * pure JVM — through cross-checking paths: a codegen-friendly IHDR header
  * parse in column expressions ([[pngHeaderMeta]]) and a full magic-sniffed
  * `ImageIO` decode in the per-partition codec shape
  * ([[decodeImagePartitioned]]). WAV audio is decoded for real too —
  * `javax.sound` is pure JVM ([[decodeAudioPartitioned]], with the codegen
  * RIFF-header parse [[wavHeaderMeta]] as the metadata-at-scale path).
  * Formats with no JVM codec in this container (video, compressed audio)
  * keep the clearly marked deterministic STUB so text-payload pipelines
  * stay reproducible.
  */
object Multimodal {

  /** Attach an opaque binary payload column (here: the UTF-8 bytes of the
    * text column stand in for an image blob) plus byte length.
    */
  def attachBlob(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("blob", col(textCol).cast("binary"))
      .withColumn("n_bytes", octet_length(col(textCol)).cast("long"))

  /** STUB image decode, column-expression form: deterministic fake
    * dimensions derived from the payload length. A real deployment
    * replaces the width/height/channels expressions with a codec call;
    * everything around them (binary input, struct output, codegen
    * pipeline) is unchanged.
    */
  def decodeImageMeta(withBlob: DataFrame): DataFrame =
    withBlob
      .withColumn("width", (lit(64) + col("n_bytes") % 64).cast("long"))
      .withColumn("height", (lit(64) + (col("n_bytes") * 7) % 64).cast("long"))
      .withColumn("channels", lit(3L))
      .withColumn("image_meta",
        struct(col("width"), col("height"), col("channels"), col("n_bytes")))

  /** STUB frame sampling: emit (frame_idx, byte_offset) rows per document —
    * the explode shape of video frame extraction. Frame count is a
    * deterministic function of payload size.
    */
  def sampleFrames(withBlob: DataFrame, frameBytes: Int = 256): DataFrame =
    withBlob
      .withColumn("n_frames", lit(1) + (col("n_bytes") % 7))
      .select(col("doc_id"), col("n_bytes"),
        posexplode(expr("sequence(0, n_frames - 1)")).as(Seq("frame_idx", "f")))
      .select(col("doc_id"), col("n_bytes"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("f") * frameBytes).cast("long").as("byte_offset"))

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private[llm] def isPng(blob: Array[Byte]): Boolean =
    blob.length >= 24 && PngMagic.indices.forall(i => blob(i) == PngMagic(i))

  /** JFIF/EXIF JPEG: SOI marker FF D8 followed by a marker byte FF. */
  private[llm] def isJpeg(blob: Array[Byte]): Boolean =
    blob.length >= 4 && (blob(0) & 0xff) == 0xff &&
      (blob(1) & 0xff) == 0xd8 && (blob(2) & 0xff) == 0xff

  // r19 (guide §4.5-adjacent): ImageIO.read(InputStream) wraps its input
  // in a FileCacheImageInputStream when the ImageIO disk cache is on (the
  // JDK default) — every in-memory blob was being spooled to a temp FILE
  // and deleted again just to be decoded. The payloads here are byte
  // arrays already in memory; the memory-cached stream decodes the same
  // bytes with the same readers, minus one disk round-trip per blob.
  // JVM-global, set once (ImageIO.setUseCache is a static toggle), so any
  // other in-process ImageIO consumer sees the memory-cached mode too.
  javax.imageio.ImageIO.setUseCache(false)

  /** Shared magic-sniff + decode-or-stand-in for every pixel operator —
    * ONE definition of the degradation contract (image-magic payloads
    * that fail to decode raise naming the doc_id; non-image payloads get
    * the deterministic stand-in dims and fake-pixel sampler), so the
    * decode/resize/dhash trio cannot silently diverge. Returns
    * (width, height, numComponents, pixel accessor).
    */
  private def decodePixels(id: Long, blob: Array[Byte]): (Int, Int, Int, (Int, Int) => Int) = {
    val n = blob.length.toLong
    if (isPng(blob) || isJpeg(blob)) {
      // ImageIO.read returns null OR throws on truncated/corrupt bytes;
      // both must surface as a descriptive error naming the doc, not an
      // opaque executor NPE/IIOException.
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
        catch { case e: Exception =>
          throw new IllegalArgumentException(
            s"doc_id=$id: $n-byte payload has an image magic but failed to decode (${e.getMessage})", e)
        }
      if (img == null)
        throw new IllegalArgumentException(
          s"doc_id=$id: $n-byte payload has an image magic but failed to decode (truncated or corrupt)")
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents,
        (sx: Int, sy: Int) => img.getRGB(sx, sy) & 0xFFFFFF)
    } else {
      // non-image payload: deterministic stand-in (see decodeImageMeta)
      ((64 + n % 64).toInt, (64 + (n * 7) % 64).toInt, 3,
        (sx: Int, sy: Int) => ((n + sx * 31L + sy * 17L) % 0x1000000L).toInt)
    }
  }

  /** Image decode, `mapPartitions` form — the shape a native codec
    * (JNI/JavaCPP) integration takes: per-partition batched iteration over
    * binary payloads, one decoded-metadata row out per blob, with
    * [[decodePixels]]'s degradation contract (real ImageIO decode for
    * magic-sniffed PNG/JPEG, descriptive doc_id-naming error on corrupt
    * bytes, deterministic stand-in otherwise).
    */
  def decodeImagePartitioned(spark: SparkSession, withBlob: DataFrame): DataFrame = {
    val rdd = withBlob.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val blob = row.getAs[Array[Byte]](1)
        val n = blob.length.toLong
        val (w, h, comps, _) = decodePixels(id, blob)
        Row(id, w, h, comps, n)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("src_width", IntegerType),
    StructField("src_height", IntegerType),
    StructField("out_width", IntegerType),
    StructField("out_height", IntegerType),
    StructField("pixel_checksum", LongType)))

  /** Image RESIZE — the feature-extraction transform after decode:
    * nearest-neighbor downsample to a fixed (targetW × targetH) thumbnail,
    * reported as a position-weighted pixel checksum (the deterministic
    * stand-in for an embedding/feature payload; integer arithmetic, so the
    * result is identical on any partitioning or engine). Same
    * `mapPartitions` batch shape as [[decodeImagePartitioned]]: blobs
    * never leave the executor, one decoded image in memory at a time, and
    * the output is a fixed few dozen bytes per row regardless of source
    * resolution — the 100 TB contract for pixel pipelines. Nearest
    * neighbor (src = (dst · srcDim) / dstDim, integer division) rather
    * than an interpolating kernel so the math is exactly reproducible;
    * swap the sampler, not the plumbing, for production quality.
    *
    * Degradation mirrors [[decodeImagePartitioned]]: a payload WITHOUT an
    * image magic gets the same deterministic stand-in dimensions and a
    * fake-pixel checksum sampled through the identical nearest-neighbor
    * loop (so mixed text/image corpora flow through without aborting the
    * job), while a payload that claims to be an image but fails to decode
    * raises a descriptive error naming the doc_id — at corpus scale one
    * corrupt blob must degrade or name itself, never kill 10⁶ tasks with
    * an opaque executor NPE.
    */
  def resizeImagesPartitioned(spark: SparkSession, withBlob: DataFrame,
      targetW: Int = 16, targetH: Int = 16): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val rdd = withBlob.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val blob = row.getAs[Array[Byte]](1)
        val (w, h, _, pixel) = decodePixels(id, blob)
        var sum = 0L
        var y = 0
        while (y < targetH) {
          val sy = y * h / targetH
          var x = 0
          while (x < targetW) {
            val sx = x * w / targetW
            sum += pixel(sx, sy).toLong * (y * targetW + x + 1)
            x += 1
          }
          y += 1
        }
        Row(id, w, h, targetW, targetH, sum)
      }
    }
    spark.createDataFrame(rdd, resizedSchema)
  }

  private val phashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("phash", LongType)))

  /** Perceptual difference-hash (dHash) — the image-dedup signature:
    * nearest-neighbor sample each image onto a 9×8 luminance grid and
    * emit one bit per adjacent-pixel comparison (left < right), packing
    * 64 bits into a long. Identical pixels hash identically regardless
    * of container bytes (PNG vs JPEG encode of the same image agree),
    * and small visual edits flip few bits, so exact-hash grouping
    * catches re-encodes while Hamming-banded blocking (the [[Dedup]]
    * SimHash machinery operates on any 64-bit signature) catches
    * near-dups. Same `mapPartitions` batch shape and degradation
    * contract as [[resizeImagesPartitioned]]: one decoded image in
    * memory at a time, non-image payloads flow through a deterministic
    * stand-in sampler, corrupt image-magic payloads raise naming the
    * doc. The output is 8 bytes of signature per blob — at 100 TB the
    * downstream dedup joins move hashes, never pixels.
    */
  def dhashPartitioned(spark: SparkSession, withBlob: DataFrame): DataFrame = {
    val rdd = withBlob.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val blob = row.getAs[Array[Byte]](1)
        val (w, h, _, pixel) = decodePixels(id, blob)
        def lum(sx: Int, sy: Int): Int = {
          val p = pixel(sx, sy)
          (((p >> 16) & 0xFF) * 299 + ((p >> 8) & 0xFF) * 587 + (p & 0xFF) * 114) / 1000
        }
        var hash = 0L
        var bit = 0
        var y = 0
        while (y < 8) {
          val sy = y * h / 8
          var x = 0
          while (x < 8) {
            if (lum(x * w / 9, sy) < lum((x + 1) * w / 9, sy)) hash |= (1L << bit)
            bit += 1
            x += 1
          }
          y += 1
        }
        Row(id, w, h, hash)
      }
    }
    spark.createDataFrame(rdd, phashSchema)
  }

  /** PNG metadata WITHOUT a row-at-a-time decode: width/height live in the
    * IHDR chunk at fixed offsets (bytes 17–20 and 21–24, big-endian), so
    * the parse is pure column expressions — whole-stage-codegen'd, no UDF,
    * no buffered-image allocation. This is the 100 TB path for metadata
    * extraction: a scan that touches 24 bytes per blob instead of decoding
    * pixels. (substr is 1-based; conv() does hex → decimal.)
    */
  def pngHeaderMeta(withBlob: DataFrame): DataFrame = {
    def be32(offset1Based: Int): org.apache.spark.sql.Column =
      conv(hex(substring(col("blob"), offset1Based, 4)), 16, 10).cast("long")
    withBlob
      .withColumn("width", be32(17))
      .withColumn("height", be32(21))
      .withColumn("bit_depth", conv(hex(substring(col("blob"), 25, 1)), 16, 10).cast("long"))
  }

  /** RIFF/WAVE sniff: "RIFF" at 0, "WAVE" at 8. */
  private[llm] def isWav(blob: Array[Byte]): Boolean =
    blob.length >= 44 &&
      blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' && blob(3) == 'F' &&
      blob(8) == 'W' && blob(9) == 'A' && blob(10) == 'V' && blob(11) == 'E'

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("n_bytes", LongType)))

  /** REAL audio decode, `mapPartitions` codec shape — `javax.sound` is
    * pure JVM, so WAV gets an actual `AudioSystem` decode (format + frame
    * count); like the image path, corrupt bytes behind the RIFF magic
    * raise naming the doc_id, and non-audio payloads get a deterministic
    * stand-in so text-blob pipelines stay reproducible.
    */
  def decodeAudioPartitioned(spark: SparkSession, withBlob: DataFrame): DataFrame = {
    val rdd = withBlob.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val blob = row.getAs[Array[Byte]](1)
        val n = blob.length.toLong
        if (isWav(blob)) {
          val in =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(blob))
            catch { case e: Exception =>
              throw new IllegalArgumentException(
                s"doc_id=$id: $n-byte payload has a RIFF/WAVE magic but failed to decode (${e.getMessage})", e)
            }
          val fmt = in.getFormat
          Row(id, fmt.getSampleRate.toInt, fmt.getChannels, in.getFrameLength, n)
        } else {
          Row(id, 8000, 1, n / 2, n)
        }
      }
    }
    spark.createDataFrame(rdd, audioSchema)
  }

  private val resampleSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate_out", LongType),
    StructField("n_frames_out", LongType),
    StructField("checksum0", LongType)))

  /** REAL audio resample (decimation): decode 16-bit PCM WAV with
    * `javax.sound`, keep every `factor`-th frame, report the decimated
    * rate/frame count plus a channel-0 signed-sample checksum of the
    * KEPT frames — the integer witness that the right samples survived
    * (the driver oracle replays the synthetic fixture's PCM arithmetic
    * per `llm_multimodal_audio_resample`). Decimation without a low-pass
    * is the nearest-neighbor tier, matching [[resizeImagesPartitioned]];
    * non-WAV payloads degrade to a deterministic stand-in (lenient, like
    * the decode operators — one bad blob must not abort a corpus job),
    * corrupt bytes behind a RIFF magic raise naming the doc_id.
    */
  def resampleAudioPartitioned(spark: SparkSession, withBlob: DataFrame,
      factor: Int = 2): DataFrame = {
    require(factor >= 1, "decimation factor must be >= 1")
    val rdd = withBlob.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val blob = row.getAs[Array[Byte]](1)
        if (isWav(blob)) {
          val in =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(blob))
            catch { case e: Exception =>
              throw new IllegalArgumentException(
                s"doc_id=$id: RIFF/WAVE payload failed to decode (${e.getMessage})", e)
            }
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16,
            s"doc_id=$id: only 16-bit PCM supported, got ${fmt.getSampleSizeInBits}")
          val ch = fmt.getChannels
          val frames = in.getFrameLength.toInt
          val pcm = in.readAllBytes()
          // a truncated data chunk (header claims more frames than the
          // bytes deliver) must raise naming the doc_id, not fall through
          // to an opaque executor ArrayIndexOutOfBoundsException below
          if (pcm.length < frames.toLong * ch * 2)
            throw new IllegalArgumentException(
              s"doc_id=$id: WAV header declares $frames frames x $ch ch " +
                s"(${frames.toLong * ch * 2} bytes) but data chunk has only " +
                s"${pcm.length} bytes — truncated payload")
          var f = 0
          var kept = 0L
          var sum = 0L
          while (f < frames) {
            val i0 = 2 * (f * ch) // channel-0 sample, little-endian
            val s = ((pcm(i0) & 0xff) | (pcm(i0 + 1) << 8)).toShort.toLong
            sum += s
            kept += 1
            f += factor
          }
          Row(id, fmt.getSampleRate.toLong / factor, kept, sum)
        } else {
          Row(id, 8000L / factor, (blob.length.toLong / 2 + factor - 1) / factor, 0L)
        }
      }
    }
    spark.createDataFrame(rdd, resampleSchema)
  }

  /** WAV metadata WITHOUT decoding: the canonical 44-byte RIFF header has
    * channels/rate/bits/data-size at fixed little-endian offsets, so the
    * parse is pure column expressions — whole-stage-codegen'd, 44 bytes
    * touched per blob. The 100 TB metadata path, mirroring
    * [[pngHeaderMeta]]. (substr is 1-based.)
    */
  def wavHeaderMeta(withBlob: DataFrame): DataFrame = {
    def byteAt(off1: Int): org.apache.spark.sql.Column =
      conv(hex(substring(col("blob"), off1, 1)), 16, 10).cast("long")
    def le(off1: Int, n: Int): org.apache.spark.sql.Column =
      (0 until n).map(k => byteAt(off1 + k) * (1L << (8 * k))).reduce(_ + _)
    withBlob
      .withColumn("channels", le(23, 2))
      .withColumn("sample_rate", le(25, 4))
      .withColumn("bits_per_sample", le(35, 2))
      .withColumn("n_frames", // longs divide to double in Spark; exact at header magnitudes
        (le(41, 4) / (col("channels") * col("bits_per_sample") / lit(8))).cast("long"))
  }

  /** Distributed synthetic-WAV fixture: real PCM WAV bytes written per-row
    * on executors via `AudioSystem.write` (rate/channels/frame-count are
    * known functions of doc_id, so decode oracles are arithmetic).
    */
  def syntheticWavBlobs(docs: DataFrame): DataFrame = {
    val enc = udf { (id: Long) =>
      val rate = 8000 + (id % 4).toInt * 4000
      val channels = 1 + (id % 2).toInt
      val frames = 100 + (id % 50).toInt
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
      val pcm = new Array[Byte](frames * channels * 2)
      var i = 0
      while (i < pcm.length) { pcm(i) = ((id * 31 + i * 7) & 0xff).toByte; i += 1 }
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    docs.select(col("doc_id")).withColumn("blob", enc(col("doc_id")))
  }

  /** Distributed synthetic-image fixture: real encoded bytes generated
    * per-row on executors (deterministic size/pixels from `doc_id`). Used
    * by specs and the driver queries to exercise the real codec. `format`
    * is an ImageIO writer name ("png", "jpg") — dimensions and channel
    * count survive JPEG's lossy pixels, so the decode oracle stays exact.
    */
  private def syntheticImageBlobs(docs: DataFrame, format: String): DataFrame = {
    val enc = udf { (id: Long) =>
      val w = 8 + (id % 16).toInt
      val h = 8 + (id % 11).toInt
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var x = 0
      while (x < w) {
        var y = 0
        while (y < h) { img.setRGB(x, y, (id * 2654435761L + x * 31 + y).toInt); y += 1 }
        x += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }
    docs.select(col("doc_id")).withColumn("blob", enc(col("doc_id")))
  }

  def syntheticPngBlobs(docs: DataFrame): DataFrame = syntheticImageBlobs(docs, "png")

  def syntheticJpegBlobs(docs: DataFrame): DataFrame = syntheticImageBlobs(docs, "jpg")
}
