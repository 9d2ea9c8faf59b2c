package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-codec multimodal path: PNG bytes encoded and decoded for real
  * (javax.imageio), plus the codegen IHDR header parse cross-checked
  * against the full decode, plus the non-image fallback.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    initLog()
    (0L until 40L).map(i => (i, s"document number $i")).toDF("doc_id", "text")
  }

  test("syntheticPngBlobs emits real PNG bytes (magic + ImageIO round-trip)") {
    val blobs = Multimodal.syntheticPngBlobs(docs).collect()
    assert(blobs.length === 40)
    blobs.foreach { r =>
      val blob = r.getAs[Array[Byte]]("blob")
      assert(Multimodal.isPng(blob), s"doc ${r.getLong(0)}: not a PNG")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      assert(img.getWidth === 8 + (r.getLong(0) % 16).toInt)
      assert(img.getHeight === 8 + (r.getLong(0) % 11).toInt)
    }
  }

  test("decodeImagePartitioned really decodes PNG dims/channels (distributed)") {
    val out = Multimodal.decodeImagePartitioned(spark,
        Multimodal.syntheticPngBlobs(docs))
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8 + (id % 16).toInt) // width
      assert(r.getInt(2) === 8 + (id % 11).toInt) // height
      assert(r.getInt(3) === 3) // RGB components
    }
  }

  test("pngHeaderMeta (pure column expressions) agrees with the ImageIO decode") {
    val blobs = Multimodal.syntheticPngBlobs(docs)
    val header = Multimodal.pngHeaderMeta(blobs)
      .select(col("doc_id"), col("width"), col("height"), col("bit_depth"))
    val full = Multimodal.decodeImagePartitioned(spark, blobs)
      .select(col("doc_id").as("f_id"), col("width").cast("long").as("f_w"),
        col("height").cast("long").as("f_h"))
    val joined = header.join(full, col("doc_id") === col("f_id")).collect()
    assert(joined.length === 40)
    joined.foreach { r =>
      assert(r.getAs[Long]("width") === r.getAs[Long]("f_w"))
      assert(r.getAs[Long]("height") === r.getAs[Long]("f_h"))
      assert(r.getAs[Long]("bit_depth") === 8L)
    }
    // the header parse must stay UDF-free / codegen-friendly
    val plan = header.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("decodeImagePartitioned decodes JPEG via the same magic-sniffed path") {
    val blobs = Multimodal.syntheticJpegBlobs(docs)
    blobs.collect().foreach { r =>
      assert(Multimodal.isJpeg(r.getAs[Array[Byte]]("blob")),
        s"doc ${r.getLong(0)}: not a JPEG")
    }
    val out = Multimodal.decodeImagePartitioned(spark, blobs).orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8 + (id % 16).toInt) // width survives lossy encode
      assert(r.getInt(2) === 8 + (id % 11).toInt)
      assert(r.getInt(3) === 3)
    }
  }

  test("corrupt bytes behind an image magic raise a descriptive error, not an NPE") {
    val corrupt = Seq((7L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      Array.fill[Byte](40)(0x42))).toDF("doc_id", "blob")
    val e = intercept[Exception] {
      Multimodal.decodeImagePartitioned(spark, corrupt).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("doc_id=7") && msgs.contains("failed to decode"))
  }

  test("WAV: AudioSystem decode and codegen header parse agree with the fixture math") {
    val blobs = Multimodal.syntheticWavBlobs(docs)
    val full = Multimodal.decodeAudioPartitioned(spark, blobs).orderBy("doc_id").collect()
    full.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8000 + (id % 4).toInt * 4000) // sample_rate
      assert(r.getInt(2) === 1 + (id % 2).toInt) // channels
      assert(r.getLong(3) === 100 + id % 50) // n_frames
    }
    val header = Multimodal.wavHeaderMeta(blobs)
      .select(col("doc_id"), col("channels"), col("sample_rate"), col("bits_per_sample"),
        col("n_frames"))
      .orderBy("doc_id").collect()
    header.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 1 + id % 2)
      assert(r.getLong(2) === 8000 + (id % 4) * 4000)
      assert(r.getLong(3) === 16L)
      assert(r.getLong(4) === 100 + id % 50)
    }
    // the header parse must stay UDF-free / codegen-friendly: plan it over a
    // materialized blob frame (no fixture-encoder UDF in the tree)
    val materialized = spark.createDataFrame(
      spark.sparkContext.parallelize(blobs.collect().toList), blobs.schema)
    val plan = Multimodal.wavHeaderMeta(materialized)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("truncated WAV (header claims more frames than the data has) raises naming the doc_id") {
    import spark.implicits._
    val whole = Multimodal.syntheticWavBlobs(docs.limit(1)).collect().head
    val blob = whole.getAs[Array[Byte]]("blob")
    // cut the data chunk in half but keep the 44-byte header intact: the
    // declared frame count now exceeds the delivered bytes
    val truncated = java.util.Arrays.copyOf(blob, 44 + (blob.length - 44) / 2)
    val frame = Seq((whole.getLong(0), truncated)).toDF("doc_id", "blob")
    val err = intercept[Exception] {
      Multimodal.resampleAudioPartitioned(spark, frame).collect()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("truncated payload") && msgs.contains("doc_id="))
  }

  test("resampleAudioPartitioned: factor 1 is identity, factor 2 halves, checksum matches scalar reference") {
    val blobs = Multimodal.syntheticWavBlobs(docs)
    val id1 = Multimodal.resampleAudioPartitioned(spark, blobs, factor = 1)
      .orderBy("doc_id").collect()
    id1.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 8000 + (id % 4) * 4000) // rate unchanged
      assert(r.getLong(2) === 100 + id % 50) // every frame kept
    }
    val half = Multimodal.resampleAudioPartitioned(spark, blobs, factor = 2)
      .orderBy("doc_id").collect()
    half.foreach { r =>
      val id = r.getLong(0)
      val frames = (100 + id % 50).toInt
      val ch = (1 + id % 2).toInt
      assert(r.getLong(1) === (8000 + (id % 4) * 4000) / 2)
      assert(r.getLong(2) === (frames + 1) / 2)
      // scalar replay of the fixture PCM: signed LE16 channel-0 samples
      val expect = (0 until frames by 2).map { f =>
        val i0 = 2 * (f * ch)
        val lo = (id * 31 + i0 * 7) & 0xff
        val hi = (id * 31 + (i0 + 1) * 7) & 0xff
        val u = lo + 256 * hi
        if (u >= 32768) u - 65536 else u
      }.sum
      assert(r.getLong(3) === expect, s"doc_id=$id checksum")
    }
  }

  test("resizeImagesPartitioned: dims fixed, checksum matches a single-machine reference") {
    val blobs = Multimodal.syntheticPngBlobs(docs)
    val out = Multimodal.resizeImagesPartitioned(spark, blobs, 16, 16)
      .orderBy("doc_id").collect()
    assert(out.length === 40)
    assert(out.forall(r => r.getInt(3) == 16 && r.getInt(4) == 16))
    // independent single-machine reference for a few ids: decode the same
    // blob directly and run the same integer nearest-neighbor walk
    val sample = blobs.filter(col("doc_id") < 5).orderBy("doc_id").collect()
    sample.foreach { r =>
      val id = r.getLong(0)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      var expected = 0L
      for (y <- 0 until 16; x <- 0 until 16) {
        val rgb = img.getRGB(x * img.getWidth / 16, y * img.getHeight / 16) & 0xFFFFFF
        expected += rgb.toLong * (y * 16 + x + 1)
      }
      val got = out.find(_.getLong(0) == id).get
      assert(got.getLong(5) === expected, s"doc $id")
      assert(got.getInt(1) === img.getWidth && got.getInt(2) === img.getHeight)
    }
    // determinism across runs/partitionings
    val again = Multimodal.resizeImagesPartitioned(spark, blobs.repartition(7), 16, 16)
      .orderBy("doc_id").collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("non-PNG payloads fall back to the deterministic stand-in") {
    val out = Multimodal.decodeImagePartitioned(spark, Multimodal.attachBlob(docs))
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val n = r.getLong(4)
      assert(r.getInt(1) === (64 + n % 64).toInt)
      assert(r.getInt(2) === (64 + (n * 7) % 64).toInt)
    }
  }

  test("resizeImagesPartitioned degrades on non-image payloads like decode does") {
    // text blobs (no image magic): stand-in dims + deterministic checksum,
    // never an abort — mirrors decodeImagePartitioned's contract
    val textBlobs = Multimodal.attachBlob(docs)
    val out = Multimodal.resizeImagesPartitioned(spark, textBlobs, 8, 8)
      .orderBy("doc_id").collect()
    assert(out.length === docs.count())
    out.foreach { r =>
      assert(r.getInt(3) === 8 && r.getInt(4) === 8)
      assert(r.getInt(1) >= 64 && r.getInt(1) < 128) // stand-in dims
    }
    // deterministic across partitionings
    val again = Multimodal.resizeImagesPartitioned(spark, textBlobs.repartition(5), 8, 8)
      .orderBy("doc_id").collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
    // a payload CLAIMING to be an image but corrupt names its doc, not an NPE
    import spark.implicits._
    val corrupt = Seq((7L, Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a) ++ Array.fill[Byte](64)(0)))
      .toDF("doc_id", "blob")
    val e = intercept[Exception] {
      Multimodal.resizeImagesPartitioned(spark, corrupt, 8, 8).collect()
    }
    assert(e.getMessage.contains("doc_id=7") || e.getCause != null &&
      e.getCause.getMessage.contains("doc_id=7"))
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dhashPartitioned: identical pixels hash identically, edits flip few bits") {
    import spark.implicits._
    val base = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 32; y <- 0 until 32)
      base.setRGB(x, y, ((x * 8) << 16) | ((y * 8) << 8) | ((x + y) * 4))
    // copy with one corner pixel blown out — a small visual edit
    val edited = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 32; y <- 0 until 32) edited.setRGB(x, y, base.getRGB(x, y))
    edited.setRGB(31, 31, 0xFFFFFF)
    val frames = Seq((1L, pngBytes(base)), (2L, pngBytes(base)), (3L, pngBytes(edited)))
      .toDF("doc_id", "blob")
    val got = Multimodal.dhashPartitioned(spark, frames)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) === got(2L), "same pixels must give the same dHash")
    val hamming = java.lang.Long.bitCount(got(1L) ^ got(3L))
    assert(hamming <= 4, s"one-pixel edit flipped $hamming bits")
  }

  test("dhashPartitioned: a horizontal gradient sets every comparison bit") {
    import spark.implicits._
    val grad = new java.awt.image.BufferedImage(64, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 64; y <- 0 until 8) grad.setRGB(x, y, (x * 4) * 0x010101)
    val got = Multimodal.dhashPartitioned(spark, Seq((1L, pngBytes(grad))).toDF("doc_id", "blob"))
      .head().getLong(3)
    assert(got === -1L, f"expected all 64 bits set, got $got%016x")
  }
}
