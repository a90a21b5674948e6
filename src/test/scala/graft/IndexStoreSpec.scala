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

  test("builds stage privately; losing the publish race adopts the winner") {
    val base = tmp()
    val in = writeInput(tmp(), "table.parquet", "rows-v1")
    val h = IndexStore.resolve("spec-idx", Seq(in.toString),
      baseDir = base.toString)
    var stageDir: String = null
    val out = IndexStore.ensure("spec-idx", Seq(in.toString),
        baseDir = base.toString) { dir =>
      stageDir = dir
      // a concurrent session publishes the same (tag, identity) generation
      // while this build is still running
      new File(h.dir).mkdirs()
      Files.write(new File(h.dir, "_SUCCESS").toPath, "winner".getBytes)
      Files.write(new File(dir, "_SUCCESS").toPath, "loser".getBytes)
    }
    assert(out == h.dir)
    assert(stageDir != h.dir, "build must run in a private staging dir")
    assert(new String(Files.readAllBytes(
      new File(h.dir, "_SUCCESS").toPath)) == "winner",
      "the first published generation must win; the stage must not replace it")
    assert(!new File(stageDir).exists(),
      "the losing stage must be discarded, not left in the store")
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

  // ---- append-delta refresh (round 11) ----

  /** ensureIncremental wired to counters; full/delta builds both commit. */
  private class IncHarness(val base: File, val inDir: File) {
    var fulls = 0
    var deltas = Seq.empty[IndexStore.AppendDelta]
    def run(tag: String = "inc-idx"): String =
      IndexStore.ensureIncremental(tag, Seq(inDir.toString),
        baseDir = base.toString) { dir =>
        fulls += 1
        new File(dir).mkdirs()
        Files.write(new File(dir, "_SUCCESS").toPath, Array.empty[Byte])
      } { (d, dir) =>
        deltas :+= d
        new File(dir).mkdirs()
        Files.write(new File(dir, "_SUCCESS").toPath, Array.empty[Byte])
      }
  }

  test("appended file takes the delta path with exactly the new files") {
    val h = new IncHarness(tmp(), tmp())
    writeInput(h.inDir, "part-0", "aaa")
    val g1 = h.run()
    assert(h.fulls == 1 && h.deltas.isEmpty, "first build is full")
    val f1 = writeInput(h.inDir, "part-1", "bbbb")
    val g2 = h.run()
    assert(g2 != g1, "grown input must be a new generation")
    assert(h.fulls == 1, "append must NOT trigger a full rebuild")
    assert(h.deltas.map(d => (d.priorDir, d.newFiles)) ==
      Seq((g1, Seq(f1.getAbsolutePath))),
      s"delta must carry the prior generation + only the new file: ${h.deltas}")
    // a second append deltas off generation 2 (largest covered subset)
    val f2 = writeInput(h.inDir, "part-2", "ccccc")
    val g3 = h.run()
    assert(h.fulls == 1 && h.deltas.size == 2)
    assert(h.deltas(1).priorDir == g2 && h.deltas(1).newFiles ==
      Seq(f2.getAbsolutePath))
    assert(h.run() == g3 && h.fulls == 1 && h.deltas.size == 2,
      "unchanged rerun is a pure cache hit")
  }

  test("renamed, removed, or rewritten files force a full rebuild") {
    // renamed
    val h1 = new IncHarness(tmp(), tmp())
    val p0 = writeInput(h1.inDir, "part-0", "aaa")
    h1.run()
    assert(p0.renameTo(new File(h1.inDir, "part-0-renamed")))
    writeInput(h1.inDir, "part-1", "bbb")
    h1.run()
    assert(h1.fulls == 2 && h1.deltas.isEmpty,
      "a renamed file is not an append — must full-rebuild")
    // removed
    val h2 = new IncHarness(tmp(), tmp())
    writeInput(h2.inDir, "part-0", "aaa")
    val q1 = writeInput(h2.inDir, "part-1", "bbb")
    h2.run()
    assert(q1.delete())
    h2.run()
    assert(h2.fulls == 2 && h2.deltas.isEmpty,
      "a removed file is not an append — must full-rebuild")
    // rewritten in place (different length -> different fingerprint)
    val h3 = new IncHarness(tmp(), tmp())
    writeInput(h3.inDir, "part-0", "aaa")
    h3.run()
    writeInput(h3.inDir, "part-0", "aaaa-longer")
    writeInput(h3.inDir, "part-1", "bbb")
    h3.run()
    assert(h3.fulls == 2 && h3.deltas.isEmpty,
      "a rewritten file is not an append — must full-rebuild")
  }

  test("hidden files (_SUCCESS, .crc) never veto or ride the delta") {
    val h = new IncHarness(tmp(), tmp())
    writeInput(h.inDir, "part-0", "aaa")
    writeInput(h.inDir, "_SUCCESS", "")
    h.run()
    // an append rewrites the input's own _SUCCESS — still a delta
    writeInput(h.inDir, "_SUCCESS", "rewritten-and-longer")
    writeInput(h.inDir, ".part-1.crc", "junk")
    val f1 = writeInput(h.inDir, "part-1", "bbb")
    h.run()
    assert(h.fulls == 1 && h.deltas.size == 1)
    assert(h.deltas.head.newFiles == Seq(f1.getAbsolutePath),
      "hidden files must appear in neither side of the delta")
  }

  test("a delta off another tag's generation is never taken") {
    val base = tmp()
    val inDir = tmp()
    writeInput(inDir, "part-0", "aaa")
    val other = new IncHarness(base, inDir)
    other.run(tag = "inc-idx-v2")
    writeInput(inDir, "part-1", "bbb")
    val mine = new IncHarness(base, inDir)
    mine.run(tag = "inc-idx")
    assert(mine.fulls == 1 && mine.deltas.isEmpty,
      "tag 'inc-idx' must not adopt a 'inc-idx-v2' generation")
  }

  test("linkData carries data files only, and the linked bytes match") {
    val from = tmp()
    writeInput(from, "part-0", "payload")
    writeInput(from, "_SUCCESS", "")
    writeInput(from, "_graft_inputs.txt", "manifest")
    val to = new File(tmp(), "gen2")
    IndexStore.linkData(from.toString, to.toString)
    assert(new File(to, "part-0").exists())
    assert(new String(Files.readAllBytes(new File(to, "part-0").toPath),
      "UTF-8") == "payload")
    assert(!new File(to, "_SUCCESS").exists(),
      "the new generation must earn its own commit marker")
    assert(!new File(to, "_graft_inputs.txt").exists(),
      "the prior manifest must not masquerade as the new generation's")
  }

  test("a corrupt prior manifest degrades to a full rebuild, never a crash") {
    val h = new IncHarness(tmp(), tmp())
    writeInput(h.inDir, "part-0", "aaa")
    val g1 = h.run()
    assert(h.fulls == 1)
    // corrupt the ready generation's manifest in place: lines with zero
    // and one '|' separators (the shapes a truncated or hand-edited file
    // produces) — the generation must become INELIGIBLE for the delta
    // path, and the grown input must take the full-rebuild path
    Files.write(new File(g1, "_graft_inputs.txt").toPath,
      "garbage-no-separators\n/some/path|onlyone\n".getBytes("UTF-8"))
    writeInput(h.inDir, "part-1", "bbb")
    // findAppendDelta itself returns None rather than throwing
    assert(IndexStore.findAppendDelta("inc-idx",
      Seq(h.inDir.toString), baseDir = h.base.toString).isEmpty,
      "the corrupt generation must be ineligible, silently")
    val g2 = h.run()
    assert(g2 != g1)
    assert(h.fulls == 2 && h.deltas.isEmpty,
      "a corrupt manifest must force the full-rebuild path, not a delta")
  }

  test("linkData on an empty prior generation still creates the target dir") {
    val from = tmp() // ready generation with ZERO data files (empty corpus)
    writeInput(from, "_SUCCESS", "")
    writeInput(from, "_graft_inputs.txt", "manifest")
    val to = new File(tmp(), "gen2")
    IndexStore.linkData(from.toString, to.toString)
    assert(to.isDirectory,
      "an empty prior generation must still produce the target dir")
    // the delta build's commit marker has somewhere to land
    Files.write(new File(to, "_SUCCESS").toPath, Array.empty[Byte])
    assert(new File(to, "_SUCCESS").exists())
  }

  test("freshAppend rebuilds the delta EVERY call and retires the previous generation") {
    val base = tmp()
    // a ready prior generation with one data file
    val prior = new File(base, "prior-gen"); prior.mkdirs()
    Files.write(new File(prior, "part-00000").toPath, "prior".getBytes)
    val newF = writeInput(tmp(), "part-00001", "appended")
    var builds = 0
    def run(): String = IndexStore.freshAppend("spec-fresh", prior.toString,
      Seq(newF.toString), baseDir = base.toString) { (delta, dir) =>
        builds += 1
        assert(delta.priorDir == prior.toString)
        assert(delta.newFiles == Seq(newF.toString))
        new File(dir).mkdirs()
        Files.write(new File(dir, "_SUCCESS").toPath, Array.empty[Byte])
    }
    val d1 = run()
    val d2 = run()
    assert(builds == 2, "freshAppend must execute the delta build per call")
    assert(d1 != d2, "each call publishes its own generation")
    assert(!new File(d1).exists(),
      "the previous fresh generation is deleted on the next call")
    assert(new File(d2, "_SUCCESS").exists())
    // fresh generations are invisible to the amortized store
    assert(IndexStore.findAppendDelta("spec-fresh", Seq(newF.toString),
      baseDir = base.toString).isEmpty)
    // a markerless delta build fails loudly and cleans its dir
    val err = intercept[IllegalArgumentException] {
      IndexStore.freshAppend("spec-fresh2", prior.toString,
        Seq(newF.toString), baseDir = base.toString) { (_, dir) =>
          new File(dir).mkdirs() }
    }
    assert(err.getMessage.contains("_SUCCESS"))
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
