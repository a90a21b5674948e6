package graft.streaming

import java.io.File
import java.nio.file.{Files, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-directory layout for the counter aggregate store — the swap
  * visibility fix (r16 VERDICT #3). `mergeBatch`'s previous dynamic
  * partition overwrite was a delete+swap INSIDE the directory readers
  * scan: a concurrent `QueryApi` request that listed files pre-swap threw
  * FAILED_READ_FILE and surfaced a 500 (observed in the r16 SoakSpec log
  * — at production merge cadence, every hot-day merge would 500 the API).
  *
  * The cure is the `IndexStore` manifest pattern: writers never mutate a
  * directory a reader can hold. Layout under `tableDir`:
  *   - `gen-<n>/day=<d>/part-*.parquet` — immutable generations;
  *   - `_current` — one line naming the live generation, replaced by an
  *     ATOMIC rename so a reader resolves either the old or the new
  *     generation, never a torn directory.
  * A merge writes only its CHANGED day partitions into `gen-<n+1>` and
  * hard-links every unchanged day's files from `gen-<n>` (an O(changed
  * days) metadata operation — at 100 TB the storage layer's server-side
  * copy/manifest plays this role, exactly like `IndexStore.linkData`).
  * The previous generation is kept as a grace window for in-flight
  * readers (requests are ms-scale, merges are per-micro-batch seconds);
  * older generations are pruned — cheap, since unchanged files are links.
  *
  * Readers of a store that predates this layout (or of any plain
  * day-partitioned parquet directory, e.g. spec fixtures) fall back to
  * scanning `tableDir` itself when no `_current` pointer exists.
  */
object CounterTable {

  private val Pointer = "_current"

  /** The live generation's directory name, if the store uses generations. */
  def currentGen(tableDir: String): Option[String] = {
    val p = new File(tableDir, Pointer)
    if (!p.isFile) None
    else {
      val s = new String(Files.readAllBytes(p.toPath), "UTF-8").trim
      if (s.isEmpty) None else Some(s)
    }
  }

  /** The frame every consumer reads: the live generation, or the plain
    * directory for legacy/fixture stores (missing store still throws the
    * reader's AnalysisException, as before).
    */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    currentGen(tableDir) match {
      case Some(g) => spark.read.parquet(new File(tableDir, g).toString)
      case None => spark.read.parquet(tableDir)
    }

  private[streaming] def genIndex(name: String): Long =
    name.stripPrefix("gen-").toLong

  private[streaming] def genName(idx: Long): String = s"gen-$idx"

  /** Atomically point `_current` at `gen` (write-temp + rename — the
    * commit point; a crash before this leaves the old generation live and
    * the half-built directory unreferenced, rebuilt by the next merge).
    */
  private[streaming] def commit(tableDir: String, gen: String): Unit = {
    val dir = new File(tableDir)
    Files.createDirectories(dir.toPath)
    val tmp = new File(dir, s".$Pointer.tmp").toPath
    Files.write(tmp, gen.getBytes("UTF-8"))
    Files.move(tmp, new File(dir, Pointer).toPath,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Delete generations older than `keepFrom` (the grace window: the
    * committed generation and its predecessor stay). Best-effort — a
    * prune that loses a race with nothing (single writer) only leaves
    * garbage for the next merge's prune.
    */
  private[streaming] def prune(tableDir: String, keepFrom: Long): Unit =
    Option(new File(tableDir).listFiles()).getOrElse(Array.empty[File])
      .filter(d => d.isDirectory && d.getName.matches("gen-[0-9]+") &&
        genIndex(d.getName) < keepFrom)
      .foreach(deleteRecursively)

  private[streaming] def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(deleteRecursively)
    f.delete()
  }
}
