package graft

import java.io.File
import java.nio.file.Files

import graft.operators.IndexStore
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-index management contract (round 9, promoted from the
  * bench-private `indexScratch`): input-identity keying, crashed-half-build
  * detection, build-once reuse, stale-input invalidation. Pure JVM — the
  * contract is filesystem-level, deliberately independent of Spark.
  */
class IndexStoreSpec extends AnyFunSuite {

  private def tmp(): File =
    Files.createTempDirectory("indexstore-spec").toFile

  private def writeInput(dir: File, name: String, content: String): File = {
    val f = new File(dir, name)
    Files.write(f.toPath, content.getBytes("UTF-8"))
    f
  }

  test("ensure builds once, then reuses without rebuilding") {
    val base = tmp()
    val in = writeInput(tmp(), "table.parquet", "rows-v1")
    var builds = 0
    def run(): String =
      IndexStore.ensure("spec-idx", Seq(in.toString), baseDir = base.toString) {
        dir =>
          builds += 1
          new File(dir).mkdirs()
          Files.write(new File(dir, "_SUCCESS").toPath, Array.empty[Byte])
      }
    val d1 = run()
    val d2 = run()
    assert(builds == 1, "second ensure over unchanged input must not rebuild")
    assert(d1 == d2)
  }

  test("a half-build without the marker is not ready and rebuilds") {
    val base = tmp()
    val in = writeInput(tmp(), "table.parquet", "rows-v1")
    val h = IndexStore.resolve("spec-idx", Seq(in.toString),
      baseDir = base.toString)
    // simulate a crash: data present, no _SUCCESS commit marker
    new File(h.dir).mkdirs()
    Files.write(new File(h.dir, "part-00000").toPath, "partial".getBytes)
    assert(!IndexStore.resolve("spec-idx", Seq(in.toString),
      baseDir = base.toString).ready,
      "partial data without the marker must read not-ready")
    var builds = 0
    IndexStore.ensure("spec-idx", Seq(in.toString), baseDir = base.toString) {
      dir =>
        builds += 1
        Files.write(new File(dir, "_SUCCESS").toPath, Array.empty[Byte])
    }
    assert(builds == 1, "ensure must rebuild over a crashed half-build")
  }

  test("changed input invalidates: new identity, fresh not-ready dir") {
    val base = tmp()
    val inDir = tmp()
    val in = writeInput(inDir, "table.parquet", "rows-v1")
    val h1 = IndexStore.resolve("spec-idx", Seq(in.toString),
      baseDir = base.toString)
    new File(h1.dir).mkdirs()
    Files.write(new File(h1.dir, "_SUCCESS").toPath, Array.empty[Byte])
    assert(IndexStore.resolve("spec-idx", Seq(in.toString),
      baseDir = base.toString).ready)
    // rewrite the input with different length -> different fingerprint
    writeInput(inDir, "table.parquet", "rows-v2-now-longer")
    val h2 = IndexStore.resolve("spec-idx", Seq(in.toString),
      baseDir = base.toString)
    assert(h2.dir != h1.dir, "changed input must map to a different index dir")
    assert(!h2.ready, "the stale index must not serve the new input")
  }

  test("directory inputs fingerprint recursively (a new part file counts)") {
    val base = tmp()
    val inDir = tmp()
    writeInput(inDir, "part-0", "a")
    val k1 = IndexStore.identityKey(Seq(inDir.toString))
    writeInput(inDir, "part-1", "b")
    val k2 = IndexStore.identityKey(Seq(inDir.toString))
    assert(k1 != k2, "adding a file under a directory input must change identity")
  }

  test("nested successRel guards multi-dataset indexes") {
    val base = tmp()
    val in = writeInput(tmp(), "table.parquet", "rows-v1")
    def resolve() = IndexStore.resolve("spec-idx", Seq(in.toString),
      successRel = "stats/_SUCCESS", baseDir = base.toString)
    new File(resolve().dir, "postings").mkdirs()
    Files.write(new File(resolve().dir, "postings/_SUCCESS").toPath,
      Array.empty[Byte])
    assert(!resolve().ready,
      "an earlier dataset's marker must not mark the whole index ready")
    new File(resolve().dir, "stats").mkdirs()
    Files.write(new File(resolve().dir, "stats/_SUCCESS").toPath,
      Array.empty[Byte])
    assert(resolve().ready)
  }

  test("a build that forgets the commit marker fails loudly") {
    val base = tmp()
    val in = writeInput(tmp(), "table.parquet", "rows-v1")
    val e = intercept[IllegalArgumentException] {
      IndexStore.ensure("spec-idx", Seq(in.toString),
        baseDir = base.toString) { dir =>
        new File(dir).mkdirs()
        Files.write(new File(dir, "data").toPath, "x".getBytes)
      }
    }
    assert(e.getMessage.contains("_SUCCESS"))
  }

  test("missing input and malformed tag are rejected") {
    val base = tmp()
    intercept[IllegalArgumentException] {
      IndexStore.resolve("spec-idx", Seq("/nonexistent/nope.parquet"),
        baseDir = base.toString)
    }
    val in = writeInput(tmp(), "t.parquet", "x")
    intercept[IllegalArgumentException] {
      IndexStore.resolve("bad/tag", Seq(in.toString), baseDir = base.toString)
    }
  }
}
