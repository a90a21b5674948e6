package graft.operators

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed by batch-shaped partition functions.
  *
  * Round 3 made the decode step REAL: assets are genuine 24-bit BMP images
  * (encoded by [[encodeBmp]] — the corpus ships no media, so image payloads
  * are synthesized from the document bytes, one byte per channel sample)
  * and [[extractFeatures]] decodes them with the JDK's `javax.imageio`
  * BMP reader — an actual header parse + pixel decode, not a stub. Because
  * the BMP pixel layout is transparent (payload byte 3k→Blue, 3k+1→Green,
  * 3k+2→Red; zero padding), the decoded dimensions and per-channel sums
  * are independently computable by the DuckDB oracle from the source text,
  * which makes the decoder's output hash-checkable (xq16).
  *
  * Swapping the BMP codec for a JNI/FFmpeg call changes no plumbing: the
  * schema (payload + typed metadata), the partition-wise batch shape
  * (`mapPartitions` over a typed Dataset — the Scala analogue of
  * `mapInPandas` batches, one decoder init per partition), and the column
  * pruning carry over unchanged.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata. */
  final case class Asset(
      doc_id: Long,
      payload: Array[Byte],
      mime: String,
      n_bytes: Long)

  /** Decoded features per asset: real image dimensions and exact integer
    * per-channel sample sums (n_pixels = width·height; means derive as
    * sum / n_pixels / 255 and stay FP-free until the caller divides).
    */
  final case class AssetFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      sum_b: Long,
      sum_g: Long,
      sum_r: Long,
      n_pixels: Long)

  /** Build a binary-payload asset table from the documents corpus (UTF-8
    * bytes stand in for encoded media; schema and partitioning are the
    * point — xq15/xq22 exercise metadata and frame slicing on it).
    */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** Fixed image width: 32 px → 96-byte rows, already 4-byte aligned, so
    * rows carry no BMP padding and byte k of the source maps to pixel
    * sample k exactly.
    */
  val BmpWidth = 32
  private val RowBytes = BmpWidth * 3

  /** Encode raw bytes as a real 24-bit uncompressed BMP (BITMAPINFOHEADER):
    * bytes become consecutive B,G,R samples across `BmpWidth`-pixel rows,
    * zero-padded to fill the last row. Any BMP reader decodes it; the JDK
    * one does in [[extractFeatures]].
    */
  def encodeBmp(raw: Array[Byte]): Array[Byte] = {
    val height = math.max(1, (raw.length + RowBytes - 1) / RowBytes)
    val pixelBytes = height * RowBytes
    val fileSize = 54 + pixelBytes
    val out = new Array[Byte](fileSize)
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte
      out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    // BITMAPFILEHEADER (14 bytes)
    out(0) = 'B'; out(1) = 'M'
    put32(2, fileSize)
    put32(10, 54) // pixel data offset
    // BITMAPINFOHEADER (40 bytes)
    put32(14, 40)
    put32(18, BmpWidth)
    put32(22, height) // positive: bottom-up rows (flips rows, not channels)
    out(26) = 1 // planes
    out(28) = 24 // bpp
    put32(34, pixelBytes)
    put32(38, 2835); put32(42, 2835) // 72 dpi
    System.arraycopy(raw, 0, out, 54, raw.length)
    out
  }

  /** The corpus as REAL image assets: text bytes → BMP payloads. The
    * encode is a per-partition batch map (same shape as the decode side).
    */
  def imageAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        val bmp = encodeBmp(raw)
        (id, bmp, "image/bmp", bmp.length.toLong)
      })
      .toDF("doc_id", "payload", "mime", "n_bytes")
  }

  /** Encode raw bytes as a PNG (same sample mapping as [[encodeBmp]]:
    * byte 3k→B, 3k+1→G, 3k+2→R over `BmpWidth`-pixel rows, zero-filled
    * tail) through the JDK encoder. PNG is COMPRESSED — payload bytes ≠
    * pixel bytes — so decoding it exercises the codec seam the BMP path
    * cannot: [[decodeImage]] must run a real inflate + defilter to
    * recover sums the oracle recomputes from the source text (xq87).
    */
  def encodePng(raw: Array[Byte]): Array[Byte] = {
    val height = math.max(1, (raw.length + RowBytes - 1) / RowBytes)
    val img = new java.awt.image.BufferedImage(
      BmpWidth, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    val nPix = BmpWidth * height
    while (p < nPix) {
      def at(i: Int): Int = if (i < raw.length) raw(i) & 0xFF else 0
      val (b, g, r) = (at(3 * p), at(3 * p + 1), at(3 * p + 2))
      img.setRGB(p % BmpWidth, p / BmpWidth, (r << 16) | (g << 8) | b)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The corpus as PNG assets — the compressed-format twin of
    * [[imageAssets]]; nothing downstream changes but the codec.
    */
  def pngAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, raw) =>
          val png = encodePng(raw)
          (id, png, "image/png", png.length.toLong)
        }
      }
      .toDF("doc_id", "payload", "mime", "n_bytes")
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

  /** REAL decode of one image payload via the JDK ImageIO BMP reader:
    * header parse, pixel decode, per-channel integer sums.
    */
  def decodeImage(payload: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sb, sg, sr) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF
        sg += (rgb >> 8) & 0xFF
        sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    (w, h, sb, sg, sr)
  }

  /** Partition-wise feature extraction: batch iteration per partition (one
    * decoder init per partition, like a Pandas-UDF batch), typed output.
    * Input must be image assets (e.g. [[imageAssets]]).
    */
  def extractFeatures(spark: SparkSession, assetsDf: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assetsDf.select("doc_id", "payload", "n_bytes")
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        // per-partition decoder setup: ImageIO plugin scan happens once
        ImageIO.setUseCache(false)
        it.map { case (id, payload, nBytes) =>
          val (w, h, sb, sg, sr) = decodeImage(payload)
          AssetFeatures(id, nBytes, w, h, sb, sg, sr, w.toLong * h)
        }
      }
  }
}
