package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingestion sources beyond parquet — the formats a web-scale text
  * pipeline actually receives: JSONL dumps and WARC crawl archives.
  *
  * Both readers are DataFrame-native (Spark's json/text sources), so they
  * inherit splittability on uncompressed/bgzip inputs, predicate/column
  * pruning, and schema enforcement. At 100 TB the operative guidance is in
  * the scaladocs: shard counts and codecs decide scan parallelism, not the
  * parser.
  */
object TextCorpus {

  /** The corpus document schema JSONL rows are projected onto. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("url", StringType),
    StructField("text", StringType),
    StructField("source", StringType)))

  /** Permissive JSONL reader: well-formed rows project onto
    * [[documentSchema]]; malformed lines survive whole in `_corrupt_record`
    * (the same contract as the streaming Recentchange parser — corrupt
    * input is data, not an exception). A gzip'd shard is one task — ship
    * many shards or use a splittable codec; the reader itself doesn't care.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentSchema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** JSONL writer (one object per line) — the interchange twin of
    * [[readJsonl]].
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-evolution read over parquet snapshot generations — a corpus
    * re-crawled for months gains columns (quality scores, license tags);
    * `mergeSchema` unions the footer schemas across all files so old files
    * surface the new columns as nulls. One flag, not a migration job; the
    * cost (footer-schema union at planning) is per-FILE metadata, safe at
    * 100 TB if file counts follow the compaction targets.
    */
  def readParquetEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** ORC round trip — the columnar interchange format beside parquet
    * (native Spark source: predicate pushdown, column pruning, splittable
    * stripes; schema travels with the file, so arrays/binary/nested columns
    * survive unlike CSV/JSONL).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** CSV reader with the same corrupt-row contract as [[readJsonl]]:
    * header-driven column binding onto [[documentSchema]], malformed rows
    * preserved in `_corrupt_record`, multiline quoted fields supported
    * (multiline + uncompressed costs splittability within a file — shard
    * counts drive parallelism, same note as gzip JSONL).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentSchema.add("_corrupt_record", StringType))
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  private val RecordDelim = "\r\n\r\nWARC/1.0\r\n"

  /** WARC-lite reader: splits a crawl archive at record boundaries with the
    * text source's multi-char `lineSep` (no RDD, no UDF — record framing is
    * Hadoop's splittable LineRecordReader, parsing is columnar regexp).
    * Returns (warc_type, target_uri, content_length, body).
    *
    * "Lite": boundaries are the `\r\n\r\nWARC/1.0\r\n` sentinel rather than
    * Content-Length byte accounting, so a body containing the literal
    * sentinel would split early — acceptable for crawl-text pipelines
    * (bodies are HTML/text), stated here because a byte-exact reader needs
    * a record reader the sandbox's formats already provide via
    * FileFormat APIs if it ever matters.
    */
  def readWarcLite(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", RecordDelim).text(path)
    // first record keeps its leading version line; later ones lost it to the
    // delimiter — normalize by stripping when present
    val rec = raw.select(
      regexp_replace(col("value"), "^WARC/1\\.0\r\n", "").as("rec"))
      .where(length(trim(col("rec"))) > 0)
    val headers = substring_index(col("rec"), "\r\n\r\n", 1)
    rec.select(
        regexp_extract(headers, "(?m)^WARC-Type: *([^\r\n]+)", 1).as("warc_type"),
        regexp_extract(headers, "(?m)^WARC-Target-URI: *([^\r\n]+)", 1).as("target_uri"),
        regexp_extract(headers, "(?m)^Content-Length: *([0-9]+)", 1).cast("long")
          .as("content_length"),
        expr("substring(rec, length(substring_index(rec, '\r\n\r\n', 1)) + 5)")
          .as("body"))
  }

  /** Project a WARC-lite frame onto the corpus document shape: response
    * records only, deterministic doc ids from the URI hash (the repo's
    * portable 60-bit md5 idiom).
    */
  def warcToDocuments(warc: DataFrame, source: String): DataFrame =
    warc.where(col("warc_type") === "response" && length(col("target_uri")) > 0)
      .select(
        expr("graft_md5p60(target_uri)").as("doc_id"),
        col("target_uri").as("url"),
        col("body").as("text"),
        lit(source).as("source"))
}
