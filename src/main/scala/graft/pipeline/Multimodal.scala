package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads modeled as opaque
  * `binary` columns with a typed metadata struct, per the north-star spec.
  *
  * The decode kernels are STUBBED with deterministic fakes (this container
  * has no image/audio codecs) — what is real, tested, and scale-designed is
  * the Spark-side plumbing: the (payload: binary, meta: struct) schema, the
  * narrow partition-parallel transforms, binary slicing for frame sampling,
  * and fixed-dimension feature extraction feeding the ANN operators.
  * Swapping a stub for a real codec is a one-expression change (or a
  * `mapInPandas`/`mapPartitions` stage) with the same schema contract.
  *
  * Payloads are synthesized from the documents table (text bytes stand in
  * for media bytes) so the operators run on the driver-provided data.
  */
object Multimodal {

  private val MimeByMod = Seq("image/png", "audio/wav", "video/mp4")

  /** The multimodal table: doc payload bytes + typed metadata. */
  private[graft] def assets(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        col("text").cast("binary").as("payload"),
        struct(
          element_at(
            array(MimeByMod.map(lit): _*), (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
            .as("mime"),
          length(col("text")).cast("long").as("n_bytes"),
          col("source").as("origin")).as("meta"))

  /** STUB decode: deterministic pseudo-dimensions from the payload hash
    * (a real build plugs an image codec here; schema contract unchanged). */
  private def decode(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      .withColumn("width", (pmod(xxhash64(col("payload")), lit(1920)) + 1).cast("int"))
      .withColumn("height", (pmod(xxhash64(col("payload"), lit(1)), lit(1080)) + 1).cast("int"))
      .withColumn("channels", lit(3))
      .select(col("asset_id"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"), col("width"), col("height"), col("channels"))
      .orderBy(col("asset_id"))

  /** Resize planning: exact integer target dims preserving aspect ratio —
    * pure column arithmetic, no decode needed. */
  private def resizePlan(s: SparkSession, dir: String): DataFrame = {
    val maxDim = 256
    decode(s, dir)
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
      .select(col("asset_id"), col("width"), col("height"),
        col("out_w"), col("out_h"))
      .orderBy(col("asset_id"))
  }

  /** Frame sampling for video payloads: every k-th fixed-size block of the
    * binary, hashed — real binary slicing (`substr` on binary), stub frame
    * decode. */
  private def frameSample(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      .filter(col("meta.mime") === "video/mp4")
      .withColumn("n_frames",
        greatest(lit(1), (col("meta.n_bytes") / 64).cast("int")))
      .withColumn("frame_hashes",
        expr("transform(sequence(0, least(n_frames - 1, 9)), " +
          "i -> xxhash64(substr(payload, i * 64 + 1, 64)))"))
      .select(col("asset_id"), col("n_frames"),
        size(col("frame_hashes")).as("n_sampled"), col("frame_hashes"))
      .orderBy(col("asset_id"))

  /** STUB feature extraction: fixed-dim pseudo-embedding from payload hashes
    * — the shape every downstream ANN operator consumes. */
  private def features(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      .withColumn("features",
        expr("transform(sequence(0, 15), " +
          "i -> cast(hash(payload, i) as double) / 2147483647.0)"))
      .select(col("asset_id"), col("meta.mime").as("mime"), col("features"))
      .orderBy(col("asset_id"))

  val all: Seq[Q] = Seq(
    Q("p14_multimodal_decode", decode, None),
    Q("p15_multimodal_resize", resizePlan, None),
    Q("p16_multimodal_frames", frameSample, None),
    Q("p17_multimodal_features", features, None))
}
