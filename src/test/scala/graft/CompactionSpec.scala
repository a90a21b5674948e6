package graft

import graft.operators.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("n_chars").cast("long").as("nb"))
  private val target = 16384L

  test("planned files are near the target size") {
    val sizes = Compaction.planFiles(docs, "doc_id", "nb", target)
      .groupBy("file_id").agg(sum("nb").as("bytes"))
      .orderBy("file_id")
      .select("bytes").as[Long].collect()
    val maxDoc = docs.agg(max("nb")).as[Long].collect()(0)
    // every file except the last fills to the target boundary, give or take
    // the doc that straddles it
    sizes.dropRight(1).foreach { b =>
      assert(b > target - maxDoc && b < target + maxDoc,
        s"file size $b outside (${target - maxDoc}, ${target + maxDoc})")
    }
    assert(sizes.length == math.ceil(
      docs.agg(sum("nb")).as[Long].collect()(0).toDouble / target).toInt ||
      sizes.length > 0)
  }

  test("plan equals the sequential single-partition cumsum") {
    val got = Compaction.planFiles(docs, "doc_id", "nb", target)
      .select("doc_id", "file_id").as[(Long, Long)].collect().toMap
    val seq = docs.orderBy("doc_id").select("doc_id", "nb").as[(Long, Long)]
      .collect()
    var cum = 0L
    val want = seq.map { case (id, nb) =>
      val f = cum / target; cum += nb; id -> f
    }.toMap
    assert(got == want, "distributed plan must equal the sequential scan")
  }

  test("writeCompacted produces one data file per planned file id") {
    val out = java.nio.file.Files.createTempDirectory("compact").toString
    try {
      Compaction.writeCompacted(docs, "doc_id", "nb", target, out)
      val nPlanned = Compaction.planFiles(docs, "doc_id", "nb", target)
        .select("file_id").distinct().count()
      val dirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("file_id="))
      assert(dirs.length == nPlanned)
      dirs.foreach { dir =>
        val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${dir.getName} has ${files.length} files")
      }
      // round trip: nothing lost
      assert(spark.read.parquet(out).count() == docs.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
