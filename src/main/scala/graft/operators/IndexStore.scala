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
  * Single-writer per (tag, input) is assumed, as everywhere in this
  * engine's batch surface: concurrent builders of the SAME index would race
  * benignly (both write identical data) but waste work.
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
    if (!h.ready) {
      build(h.dir)
      require(new File(h.dir, successRel).exists(),
        s"index build '$tag' completed without writing $successRel under " +
          s"${h.dir} — refusing to treat a markerless build as ready")
    }
    h.dir
  }
}
