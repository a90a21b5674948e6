package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed by batch-shaped partition functions.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub (`fakeDecode`); everything around it —
  * the schema (payload + metadata struct), the partition-wise batch
  * processing shape (`mapPartitions` over a typed Dataset, the Scala
  * analogue of `mapInPandas` batches), and the column pruning — is real and
  * tested. Swapping `fakeDecode` for a JNI/FFmpeg call changes no plumbing.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata. */
  final case class Asset(
      doc_id: Long,
      payload: Array[Byte],
      mime: String,
      n_bytes: Long)

  /** Extracted features per asset (what a decoder/featurizer would emit). */
  final case class AssetFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      channel_means: Array[Double])

  /** Build a binary-payload asset table from the documents corpus (UTF-8
    * bytes stand in for encoded media; schema and partitioning are the
    * point).
    */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** STUB decoder: a real pipeline would decode image/audio bytes here.
    * Deterministic fake: "dimensions" derived from the byte length, channel
    * means from a rolling byte hash — stable across runs and partitionings.
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    val n = payload.length
    val width = math.max(1, n % 640)
    val height = math.max(1, (n / 7) % 480)
    val means = new Array[Double](3)
    var i = 0
    var acc = 0L
    while (i < n) {
      acc = (acc * 31 + (payload(i) & 0xff)) % 1000003L
      means(i % 3) += (payload(i) & 0xff).toDouble
      i += 1
    }
    val per = math.max(1.0, n / 3.0)
    (width, height, means.map(m => m / per / 255.0))
  }

  /** Frame sampling: slice every `stride`-th fixed-size window out of the
    * payload — the byte-level plumbing of video frame-sampling (a real
    * decoder would seek keyframes; the slicing, explode shape, and
    * per-frame metadata are the part that transfers). Pure Catalyst
    * expressions, no UDF.
    */
  def sampleFrames(assetsDf: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    assetsDf
      .withColumn("n_frames",
        greatest(floor((col("n_bytes") / lit(frameBytes.toLong * stride))).cast("int"), lit(0)))
      .withColumn("frame_idx", explode(
        when(col("n_frames") > 0, sequence(lit(0), col("n_frames") - 1))
          .otherwise(array())))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, CAST(frame_idx * ${frameBytes.toLong * stride} + 1 AS INT), $frameBytes)")
          .as("frame_bytes"))
  }

  /** Partition-wise feature extraction: batch iteration per partition (one
    * decoder init per partition, like a Pandas-UDF batch), typed output.
    */
  def extractFeatures(spark: SparkSession, assetsDf: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assetsDf.select("doc_id", "payload", "n_bytes")
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        // per-partition init of the (stub) decoder happens here
        it.map { case (id, payload, nBytes) =>
          val (w, h, means) = fakeDecode(payload)
          AssetFeatures(id, nBytes, w, h, means)
        }
      }
  }
}
