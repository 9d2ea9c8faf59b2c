package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns plus typed metadata structs (north-star extension,
  * BASELINE.json). The container has no image/audio codecs, so the decode
  * step is a clearly marked deterministic STUB — the Spark-side plumbing
  * (schema, binary columns, per-partition batched iteration, explode of
  * frame samples) is real and is what carries over to a production codec.
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

  /** STUB image decode, `mapPartitions` form — the shape a native codec
    * (JNI/JavaCPP) integration takes: per-partition batched iteration over
    * binary payloads, one decoded-metadata row out per blob. The `???`
    * codec is faked with the same deterministic function as
    * [[decodeImageMeta]] so the two paths cross-check each other in tests.
    */
  def decodeImagePartitioned(spark: SparkSession, withBlob: DataFrame): DataFrame = {
    val rdd = withBlob.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val blob = row.getAs[Array[Byte]](1)
        // real codec goes here: ImageIO/ffmpeg bindings over `blob`
        val n = blob.length.toLong
        Row(id, (64 + n % 64).toInt, (64 + (n * 7) % 64).toInt, 3, n)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }
}
