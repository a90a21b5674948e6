package graft

import graft.sources.TextCorpus
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

class TextCorpusSpec extends SparkSpec {

  private def tempDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  test("jsonl reader projects good rows and preserves corrupt lines whole") {
    val dir = tempDir("jsonl")
    val lines = Seq(
      """{"doc_id": 1, "url": "http://a", "text": "hello world", "source": "src0"}""",
      """{"doc_id": 2, "url": "http://b", "text": "unicode é中", "source": "src1"}""",
      """this is not json at all {""",
      """{"doc_id": 3, "text": "missing fields are null"}""")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

    // cache: Spark refuses scans whose referenced columns are ONLY the
    // corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val df = TextCorpus.readJsonl(spark, dir.toString).cache()
    assert(df.count() == 4)
    val corrupt = df.where(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0))
    assert(corrupt.toSeq == Seq("this is not json at all {"),
      "the malformed line must survive verbatim")
    val good = df.where(col("_corrupt_record").isNull)
    assert(good.count() == 3)
    val r2 = good.where(col("doc_id") === 2).select("text").collect()(0).getString(0)
    assert(r2 == "unicode é中")
    val r3 = good.where(col("doc_id") === 3)
      .select("url", "source").collect()(0)
    assert(r3.isNullAt(0) && r3.isNullAt(1))
  }

  test("jsonl round trip preserves rows") {
    val dir = tempDir("jsonlrt")
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "source")
    TextCorpus.writeJsonl(docs, dir.resolve("out").toString)
    val back = spark.read.json(dir.resolve("out").toString)
    assert(back.count() == docs.count())
    val a = back.select("doc_id", "text").orderBy("doc_id").collect().toSeq
    val b = docs.select("doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("schema evolution: merged read surfaces new columns, old rows null") {
    val dir = tempDir("evolve")
    val v1 = dir.resolve("v1").toString
    val v2 = dir.resolve("v2").toString
    import spark.implicits._
    Seq((1L, "old doc")).toDF("doc_id", "text")
      .write.parquet(v1)
    Seq((2L, "new doc", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(v2)
    val merged = TextCorpus.readParquetEvolved(spark, v1, v2)
    assert(merged.columns.toSet == Set("doc_id", "text", "quality"))
    val rows = merged.orderBy("doc_id")
      .select("doc_id", "quality").collect()
    assert(rows(0).isNullAt(1), "pre-evolution rows carry null for new cols")
    assert(rows(1).getDouble(1) == 0.9)
    // A plain read without the flag binds one file's schema — the trap the
    // helper exists to close.
    val plain = spark.read.parquet(v1, v2)
    assert(plain.columns.toSet.subsetOf(Set("doc_id", "text", "quality")))
  }

  test("orc round trip preserves schema incl. array and binary columns") {
    val dir = tempDir("orcrt")
    // Embeddings exercise what text formats cannot carry: a float array —
    // plus a derived binary column.
    val emb = Tables.embeddings(spark, sf)
      .withColumn("payload",
        org.apache.spark.sql.functions.to_binary(
          org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("vec_id").cast("string")),
          org.apache.spark.sql.functions.lit("hex")))
    TextCorpus.writeOrc(emb, dir.resolve("out").toString)
    val back = TextCorpus.readOrc(spark, dir.resolve("out").toString)
    assert(back.schema == emb.schema, "ORC must round-trip the exact schema")
    val a = back.orderBy("vec_id").collect().toSeq
    val b = emb.orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("csv reader binds headers, handles quoted multiline text, keeps corrupt rows") {
    val dir = tempDir("csv")
    val csv = Seq(
      "doc_id,url,text,source",
      "1,http://a,\"first line\nsecond line\",src0",
      "2,http://b,\"comma, inside\",src1",
      "not-a-number,http://c,broken,src2"
    ).mkString("\n")
    Files.write(dir.resolve("docs.csv"), csv.getBytes(StandardCharsets.UTF_8))
    val df = TextCorpus.readCsv(spark, dir.toString).cache()
    assert(df.count() == 3)
    assert(df.where(col("_corrupt_record").isNotNull).count() == 1,
      "the non-numeric doc_id row must be quarantined, not dropped")
    val t1 = df.where(col("doc_id") === 1).select("text").collect()(0).getString(0)
    assert(t1 == "first line\nsecond line", s"multiline quoted field broke: $t1")
    val t2 = df.where(col("doc_id") === 2).select("text").collect()(0).getString(0)
    assert(t2 == "comma, inside")
  }

  private val warcFixture: String = {
    def record(tpe: String, uri: String, body: String): String = {
      val header = s"WARC/1.0\r\n" +
        s"WARC-Type: $tpe\r\n" +
        (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
        s"Content-Length: ${body.getBytes(StandardCharsets.UTF_8).length}\r\n"
      header + "\r\n" + body
    }
    Seq(
      record("warcinfo", "", "software: graft-test"),
      record("request", "http://example.com/a", "GET /a HTTP/1.1"),
      record("response", "http://example.com/a",
        "a page body\n\nwith a blank line and html <p>inside</p>"),
      record("response", "http://example.com/b", "second page")
    ).mkString("\r\n\r\n") + "\r\n\r\n"
  }

  test("warc-lite reader frames records and parses headers") {
    val dir = tempDir("warc")
    Files.write(dir.resolve("crawl.warc"),
      warcFixture.getBytes(StandardCharsets.UTF_8))
    val df = TextCorpus.readWarcLite(spark, dir.toString)
    assert(df.count() == 4)
    val types = df.groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("warcinfo" -> 1L, "request" -> 1L, "response" -> 2L))
    val bodyA = df.where(col("target_uri") === "http://example.com/a" &&
        col("warc_type") === "response")
      .select("body").collect()(0).getString(0)
    assert(bodyA.startsWith("a page body\n\nwith a blank line"),
      s"body with internal blank lines must stay intact, got: $bodyA")
  }

  test("warc responses project onto the corpus document shape") {
    val dir = tempDir("warcdoc")
    Files.write(dir.resolve("crawl.warc"),
      warcFixture.getBytes(StandardCharsets.UTF_8))
    val docs = TextCorpus.warcToDocuments(
      TextCorpus.readWarcLite(spark, dir.toString), source = "crawl0")
    assert(docs.count() == 2, "responses only")
    assert(docs.schema.fieldNames.toSeq == Seq("doc_id", "url", "text", "source"))
    // doc ids deterministic and distinct
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == 2 && ids.forall(_ > 0))
    val again = TextCorpus.warcToDocuments(
      TextCorpus.readWarcLite(spark, dir.toString), source = "crawl0")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == again.sorted, "ids must be reproducible")
  }
}
