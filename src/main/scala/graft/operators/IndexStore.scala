package graft.operators

import java.io.File

/** Build/validate/reuse contract for PERSISTED indexes — the management
  * layer under every amortized build-once/probe-N family (MinHash band
  * index [[Dedup.writeBandIndex]], BM25 postings [[Ranking.writeBm25Index]],
  * bigram-LM counts [[graft.operators.NgramLm.writeLmIndex]], PQ codebooks
  * [[Similarity.writePqIndex]]).
  *
  * A production pipeline cannot treat "is the index current?" as a bench
  * detail: it needs (a) an index keyed by the IDENTITY of the input it was
  * built from, so a changed input invalidates the index instead of serving
  * stale matches; (b) a completeness guard, so a build that crashed halfway
  * rebuilds instead of serving partial data; (c) build-once semantics, so
  * repeated probes over unchanged input never pay the build again.
  *
  * - Identity: [[resolve]] keys the index directory by an MD5 over the
  *   input paths plus each input's recursive (name, length, mtime) file
  *   fingerprint. Any rewrite of the input parquet — new files, appended
  *   rows, regenerated SF dir — changes the key, which lands probes on a
  *   fresh (empty, not-ready) directory; the stale directory is simply
  *   abandoned.
  * - Completeness: an index is `ready` only when the build's final
  *   `successRel` marker exists (parquet's `_SUCCESS` of the LAST dataset
  *   the build writes — e.g. `stats/_SUCCESS` for multi-dataset indexes,
  *   so a crash between datasets is still detected).
  * - Build-once: [[ensure]] runs the supplied build only when not ready
  *   and then re-checks the marker, failing loudly if the build did not
  *   produce it (a silent no-marker build would otherwise rebuild forever).
  *
  * Concurrent builders of the SAME index are safe (r17): each build runs in
  * a session-private staging directory and publishes with one atomic rename;
  * a builder that loses the publish race discards its stage and adopts the
  * winner (identical by identity-key construction). The previous
  * build-in-place scheme really did corrupt under a race — two Spark
  * sessions' interleaved partitioned-overwrite writes left a union of both
  * builds' part files (measured: a 500-vector LSH store serving 934 rows
  * after a verify run and a plan audit overlapped), and the success marker
  * could not tell, because both builds "completed".
  */
object IndexStore {

  /** A resolved index location: `dir` is where this (tag, input-identity)
    * index lives; `ready` says whether a complete build is present.
    */
  final case class Handle(dir: String, ready: Boolean)

  /** Recursive (name, length, mtime) fingerprint — cheap (pure metadata,
    * no content read) and sufficient for parquet inputs: writers create
    * new files rather than rewriting in place. Known limit: a same-length
    * in-place rewrite inside the filesystem's mtime granularity (1 s on
    * some filesystems; `lastModified` reports ms where available) is
    * invisible to metadata — callers needing content-level identity must
    * hash the data themselves.
    */
  private def fingerprint(f: File): String =
    if (f.isDirectory) {
      val kids = f.listFiles()
      require(kids != null,
        s"cannot list index input directory ${f.getPath} (IO or permission error)")
      kids.sortBy(_.getName).map(fingerprint).mkString(s"[n=${kids.length};", ",", "]")
    } else s"${f.getName}:${f.length}:${f.lastModified}"

  /** The identity key for `inputs` under `tag`: 16 hex chars of MD5 over
    * path + fingerprint per input. Exposed so callers can log/inspect which
    * index generation a probe used.
    */
  def identityKey(inputs: Seq[String]): String = {
    val id = inputs.map { p =>
      val f = new File(p)
      f.getPath + "|" + fingerprint(f)
    }.mkString("||")
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
  }

  /** Locate the index for `tag` built from `inputs` (files or directories
    * that must exist). Does not build anything.
    */
  def resolve(tag: String, inputs: Seq[String],
      successRel: String = "_SUCCESS",
      baseDir: String = sys.props("java.io.tmpdir")): Handle = {
    require(tag.nonEmpty && tag.matches("[A-Za-z0-9._-]+"),
      s"index tag must be a plain file-name token, got '$tag'")
    require(inputs.nonEmpty, "index identity needs at least one input path")
    inputs.foreach(p => require(new File(p).exists(),
      s"index input does not exist: $p"))
    val dir = new File(baseDir, s"graft-$tag-${identityKey(inputs)}")
    Handle(dir.toString, new File(dir, successRel).exists())
  }

  /** Resolve and, if not ready, run `build(dir)`; returns the ready index
    * directory. The build must finish by writing `successRel` under `dir`
    * (write that dataset LAST — it is the commit point).
    */
  def ensure(tag: String, inputs: Seq[String],
      successRel: String = "_SUCCESS",
      baseDir: String = sys.props("java.io.tmpdir"))
      (build: String => Unit): String = {
    val h = resolve(tag, inputs, successRel, baseDir)
    if (!h.ready) stagedPublish(new File(h.dir), successRel, tag)(build)
    h.dir
  }

  /** Run `build` into a fresh session-private staging dir next to `target`
    * and publish with an atomic rename. Losing the rename race (another
    * session published the same (tag, identity) generation first) discards
    * the stage and adopts the winner; a build that throws cleans its stage
    * up. The staging suffix can never be adopted by [[resolve]] or
    * [[findAppendDelta]] (their name patterns end at the 16-hex key).
    */
  private def stagedPublish(target: File, successRel: String, tag: String)
      (build: String => Unit): Unit = {
    val stage = new File(target.getPath + ".stage-" +
      java.util.UUID.randomUUID().toString)
    stage.mkdirs()
    try build(stage.getPath)
    catch { case e: Throwable => deleteRecursively(stage); throw e }
    require(new File(stage, successRel).exists(),
      s"index build '$tag' completed without writing $successRel under " +
        s"${stage.getPath} — refusing to publish a markerless build")
    // A crashed PRE-STAGING half-build may occupy the target without its
    // success marker; rename cannot replace a non-empty dir, so clear it.
    // (A READY target is never deleted — losing the publish race below
    // adopts it instead.)
    if (target.exists() && !new File(target, successRel).exists())
      deleteRecursively(target)
    if (!stage.renameTo(target)) {
      deleteRecursively(stage)
      require(new File(target, successRel).exists(),
        s"index build '$tag' could not publish ${stage.getPath} -> " +
          s"${target.getPath} and no ready generation exists there")
    }
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File])
        .foreach(deleteRecursively)
    f.delete(): Unit
  }

  // ------------------------------------------------------------------
  // Append-delta refresh: when the input GREW (files appended, nothing
  // renamed/removed/rewritten), a new generation can reuse the prior
  // generation's data verbatim and index only the new files — the
  // ingest-append posture a production corpus actually runs in, where a
  // nightly crawl batch must not trigger a full corpus re-signature.
  // ------------------------------------------------------------------

  /** Input manifest a ready generation records ([[ensureIncremental]]):
    * one line per DATA file, `path|length|mtime`. Hidden files (`_*`/`.*`
    * — `_SUCCESS`, checksums) are excluded on BOTH sides of the subset
    * check because Spark readers ignore them and an append rewrites the
    * input's own `_SUCCESS`, which must not veto the delta path.
    */
  private val ManifestRel = "_graft_inputs.txt"

  private def isHidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  private def dataFiles(f: File): Seq[File] =
    if (f.isDirectory) {
      val kids = f.listFiles()
      require(kids != null,
        s"cannot list index input directory ${f.getPath} (IO or permission error)")
      kids.sortBy(_.getName).toSeq.filterNot(k => isHidden(k.getName))
        .flatMap(dataFiles)
    } else Seq(f)

  private def manifestLines(inputs: Seq[String]): Seq[String] =
    inputs.flatMap(p => dataFiles(new File(p)))
      .map(f => s"${f.getAbsolutePath}|${f.length}|${f.lastModified}")

  /** A detected append-only delta: `priorDir` is the ready prior
    * generation to reuse; `newFiles` the input data files it has not seen
    * (absolute paths — feed them straight to `spark.read`).
    */
  final case class AppendDelta(priorDir: String, newFiles: Seq[String])

  /** Find a ready prior generation of `tag` whose recorded input files are
    * a SUBSET of the current input's data files — same path, length, and
    * mtime for every recorded file, i.e. the input only grew. A renamed,
    * removed, or in-place-rewritten file breaks the subset and returns
    * None (full rebuild). Of several qualifying generations the one
    * covering the most files wins (smallest delta).
    */
  def findAppendDelta(tag: String, inputs: Seq[String],
      successRel: String = "_SUCCESS",
      baseDir: String = sys.props("java.io.tmpdir")): Option[AppendDelta] = {
    val current = manifestLines(inputs)
    val currentSet = current.toSet
    val base = new File(baseDir)
    // exact-name match, not prefix: tag "band" must not adopt a
    // generation of tag "band-v2" that happens to share inputs.
    val genName = s"graft-$tag-[0-9a-f]{16}"
    val gens = Option(base.listFiles()).getOrElse(Array.empty[File])
      .filter(d => d.isDirectory && d.getName.matches(genName) &&
        new File(d, successRel).exists() && new File(d, ManifestRel).exists())
    val candidates = gens.flatMap { d =>
      // A generation whose manifest cannot be read or parsed is
      // INELIGIBLE, never fatal: index-store corruption must degrade to
      // a full rebuild (the build path that assumes nothing), not kill
      // the refresh that would repair it.
      try {
        val src = scala.io.Source.fromFile(new File(d, ManifestRel), "UTF-8")
        val prior = try src.getLines().toList finally src.close()
        val priorPathOpts = prior.map(manifestPath)
        if (prior.nonEmpty && prior.forall(currentSet.contains) &&
            priorPathOpts.forall(_.isDefined)) {
          val priorPaths = priorPathOpts.flatten.toSet
          val fresh = current
            .filterNot(l => manifestPath(l).exists(priorPaths.contains))
          Some((prior.size, AppendDelta(d.getPath, fresh.flatMap(manifestPath))))
        } else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    candidates.sortBy(-_._1).headOption.map(_._2)
  }

  /** Path field of a `path|length|mtime` manifest line, parsed from the
    * END (length and mtime are the LAST two '|' fields and never contain
    * '|'), so an input path that itself contains '|' round-trips instead
    * of corrupting the subset/delta computation. Total: a malformed line
    * (fewer than two separators, or an empty path) is None — the caller
    * treats the generation holding it as corrupt and rebuilds fully.
    */
  private def manifestPath(line: String): Option[String] = {
    val last = line.lastIndexOf('|')
    val cut = if (last <= 0) -1 else line.lastIndexOf('|', last - 1)
    if (cut <= 0) None else Some(line.substring(0, cut))
  }

  /** Hard-link (copy if the filesystem refuses links) every data file of a
    * prior generation into `toDir` — the O(new files) reuse step of an
    * append-delta build on a local filesystem; a cluster pipeline would
    * use the storage layer's cheap server-side copy. Markers and manifests
    * are NOT carried over: the new generation must earn its own success
    * marker (a crash mid-refresh leaves a not-ready dir).
    */
  def linkData(fromDir: String, toDir: String): Unit = {
    val from = new File(fromDir)
    val fromPath = from.toPath
    // The target generation dir must exist even when the prior generation
    // holds ZERO data files (an empty-but-ready index is a valid state —
    // e.g. a band index over an empty corpus): the delta build writes its
    // success marker and manifest into toDir unconditionally, and a
    // per-linked-file mkdir would leave it missing.
    java.nio.file.Files.createDirectories(new File(toDir).toPath)
    dataFiles(from).foreach { f =>
      // Relative layout preserved: two same-named files in different
      // subdirectories land in distinct targets instead of colliding
      // (a flat target would throw on the link and then silently
      // overwrite through the copy fallback's REPLACE_EXISTING).
      val dst = new File(toDir, fromPath.relativize(f.toPath).toString).toPath
      java.nio.file.Files.createDirectories(dst.getParent)
      try java.nio.file.Files.createLink(dst, f.toPath)
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        java.nio.file.Files.copy(f.toPath, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING) }
    }
  }

  /** [[ensure]] with the append-delta fast path: if not ready and a prior
    * generation covers a subset of the input's files, `buildDelta` runs
    * with that generation and the new files only; otherwise `buildFull`
    * runs. Either way the build must commit `successRel`, and the ready
    * generation records its input manifest so the NEXT append can delta
    * off it. Identity/completeness semantics are unchanged from [[ensure]]
    * — the delta path only changes who computes the bytes.
    */
  /** Run `buildDelta` against a READY prior generation and `newFiles` into
    * a FRESH session-private generation — every call; returns its dir.
    *
    * This is the measurable form of an append refresh (r17 verdict item 3):
    * [[ensureIncremental]] amortizes the refresh across runs (build-once
    * semantics — right for serving), which made a timed append row measure
    * store TEMPERATURE instead of append work — cold /tmp paid the full
    * base build inside the row, warm /tmp reduced it to a probe, a 7x
    * swing on identical code. Here the base generation stays amortized
    * (the caller ensures it separately) while the delta build executes on
    * every invocation, so the row times exactly: link prior data + index
    * the appended files + commit marker.
    *
    * The fresh dir name (`graft-<tag>-fresh-<uuid>`) can never be adopted
    * by [[resolve]] (its names end at the 16-hex identity key) or
    * [[findAppendDelta]] (no input manifest is written), and the PREVIOUS
    * fresh generation of the same tag from this session is deleted first
    * — callers materialize each result before the next call (bench rounds
    * are sequential), so a session holds at most one live fresh generation
    * per tag; concurrent sessions are isolated by the UUID.
    */
  def freshAppend(tag: String, priorDir: String, newFiles: Seq[String],
      successRel: String = "_SUCCESS",
      baseDir: String = sys.props("java.io.tmpdir"))
      (buildDelta: (AppendDelta, String) => Unit): String = {
    require(new File(priorDir).exists(), s"prior generation missing: $priorDir")
    // Cross-session housekeeping: a JVM leaves its LAST fresh generation
    // behind (nothing outlives it to delete it), so long-lived /tmp would
    // accrue one dir per tag per run. Stale fresh dirs of this tag from
    // clearly-dead sessions (>2 h old) are swept here; a live session's
    // dir is never that old because callers materialize each result
    // before the next append call.
    val staleBefore = System.currentTimeMillis() - 2L * 3600 * 1000
    Option(new File(baseDir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && f.getName.startsWith(s"graft-$tag-fresh-") &&
        f.lastModified < staleBefore)
      .foreach(deleteRecursively)
    val dir = new File(baseDir,
      s"graft-$tag-fresh-${java.util.UUID.randomUUID().toString}")
    try {
      buildDelta(AppendDelta(priorDir, newFiles), dir.getPath)
      require(new File(dir, successRel).exists(),
        s"append build '$tag' completed without writing $successRel under " +
          s"${dir.getPath}")
    } catch { case e: Throwable => deleteRecursively(dir); throw e }
    val prev = freshGens.put(tag, dir)
    if (prev != null) deleteRecursively(prev)
    dir.getPath
  }

  private val freshGens =
    new java.util.concurrent.ConcurrentHashMap[String, File]()

  def ensureIncremental(tag: String, inputs: Seq[String],
      successRel: String = "_SUCCESS",
      baseDir: String = sys.props("java.io.tmpdir"))
      (buildFull: String => Unit)
      (buildDelta: (AppendDelta, String) => Unit): String = {
    val h = resolve(tag, inputs, successRel, baseDir)
    if (!h.ready) {
      // The input manifest is written INTO the stage (before publish) so a
      // published generation is always manifest-complete — no post-publish
      // window where two sessions could interleave writes to one manifest.
      stagedPublish(new File(h.dir), successRel, tag) { stageDir =>
        findAppendDelta(tag, inputs, successRel, baseDir) match {
          case Some(d) => buildDelta(d, stageDir)
          case None => buildFull(stageDir)
        }
        val w = new java.io.PrintWriter(new File(stageDir, ManifestRel), "UTF-8")
        try manifestLines(inputs).foreach(w.println) finally w.close()
      }
    } else {
      val mf = new File(h.dir, ManifestRel)
      if (!mf.exists()) {
        val w = new java.io.PrintWriter(mf, "UTF-8")
        try manifestLines(inputs).foreach(w.println) finally w.close()
      }
    }
    h.dir
  }
}
