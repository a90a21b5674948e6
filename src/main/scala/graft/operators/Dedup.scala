package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.Cacheable

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash group-by), MinHash+LSH (shingle → minhash → band →
  * bucket join), SimHash (bit-majority signatures), n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale design: every variant is a pure shuffle-on-key plan — no driver
  * collects, no cross joins except the final candidate verification, which
  * LSH banding restricts to same-bucket pairs. At 100 TB the band-bucket
  * shuffle is the only wide exchange and its key space (band_id, band_key)
  * is uniformly spread by construction (hashes).
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct key column.
    * Equivalent to `dropDuplicates` but with a deterministic survivor, which
    * makes it oracle-checkable and idempotent under re-runs.
    */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Number of hash functions in the MinHash signature (4 bands of 2). */
  val MinhashK = 8
  val BandSize = 2

  /** MinHash signatures: one row per doc with `mh1..mhK` LONG columns.
    * The permutation family is two 60-bit windows per md5 digest —
    * mh_{2j-1}/mh_{2j} are hex chars 1-15 and 17-31 of md5(j || shingle) —
    * so the K slots cost K/2 digests (round 11: the digests were the
    * measured floor of the whole shingle family; halving them took xq05
    * from 11.27 to 6.59 s at sf5, xq06 12.41 -> 7.76 s = 0.68x DuckDB —
    * with the DuckDB twin applying the identical windows, so signatures
    * stay oracle-exact). Min over the unsigned long is engine-portable.
    *
    * Plan shape (round 4): the whole signature is ONE narrow projection —
    * the fused [[graft.expressions.ShingleMinHash]] expression tokenizes
    * the doc once and folds the per-n-gram digests into running mins, so
    * the former shingle Generate (a k·30-byte-string row blow-up) and the
    * per-doc groupBy exchange are both gone. At 100 TB this is
    * embarrassingly parallel map work with no shuffle. (Round 3 had
    * already moved hex-string mins to long mins; the explode + exchange
    * was the remaining cost.)
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val sig = graft.expressions.ShingleMinHash(col(textCol), n, MinhashK)
    Parallelize.ensure(docs, col(idCol))
      .select(col(idCol), sig.as("_sig"))
      .where(col("_sig").isNotNull) // < n tokens: no shingles, no row
      .select(col(idCol) +:
        (1 to MinhashK).map(k => element_at(col("_sig"), k).as(s"mh$k")): _*)
  }

  /** LSH banding: same band of the signature agreeing on all its hashes →
    * candidate pair. Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    */
  /** The LSH band-bucket table (id, band_id, band_key) of a corpus — the
    * structure a production pipeline PERSISTS as its dedup index: band_key
    * concatenates the band's minhashes, so near-dup docs collide on at
    * least one (band_id, band_key) bucket with LSH probability.
    */
  def bandTable(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val sig = minhashSignatures(docs, textCol, idCol, n)
    val nBands = MinhashK / BandSize
    sig.select(col(idCol), explode(array(
      (0 until nBands).map { b =>
        struct(lit(b).as("band_id"),
          concat_ws("|", (1 to BandSize).map(j => col(s"mh${b * BandSize + j}")): _*)
            .as("band_key"))
      }: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_key"))
  }

  def minhashCandidatePairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    // Persisted: both sides of the self-join share this lineage, and the
    // signature computation (md5 over every shingle) is the expensive part.
    val bands = bandTable(docs, textCol, idCol, n)
      .trackedCache
    val a = bands.toDF("doc_a", "band_id", "band_key")
    val b = bands.toDF("doc_b", "band_id", "band_key")
    a.join(b, Seq("band_id", "band_key"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Incremental near-dedup — the daily-crawl shape: flag each NEW-batch
    * document that LSH-collides with the EXISTING corpus, without comparing
    * the corpus against itself. Returns one row per flagged batch doc:
    * (id, corpus_match = smallest colliding corpus id, n_matches).
    *
    * At scale the corpus side of the join is the persisted [[bandTable]]
    * index (append-only across runs) — each run computes signatures only
    * for the batch and joins on (band_id, band_key); cost is O(batch), not
    * O(corpus), and the corpus text is never rescanned.
    */
  def incrementalNearDups(corpus: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val corpusBands = bandTable(corpus, textCol, idCol, n)
      .toDF("corpus_id", "band_id", "band_key")
    bandTable(batch, textCol, idCol, n)
      .join(corpusBands, Seq("band_id", "band_key"))
      .groupBy(col(idCol))
      .agg(min(col("corpus_id")).as("corpus_match"),
        countDistinct(col("corpus_id")).as("n_matches"))
  }

  /** The batch with corpus near-duplicates removed (anti-join over
    * [[incrementalNearDups]]).
    */
  def dropIncrementalNearDups(corpus: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, n: Int = 3): DataFrame =
    batch.join(incrementalNearDups(corpus, batch, textCol, idCol, n)
      .select(col(idCol)), Seq(idCol), "left_anti")

  /** Persist the LSH band index of a corpus as a parquet table at `dir` —
    * the BUILD-ONCE half of the amortized dedup regime. [[incrementalNearDups]]
    * recomputes the corpus bands on every call (the strict-measurement
    * shape); a production pipeline builds this index once, appends each
    * admitted batch's bands (see [[graft.streaming.CorpusIngest]]), and pays
    * only O(batch) per probe from then on.
    *
    * Layout: rows clustered by `band_key` with (band_id, band_key)-sorted
    * row groups, so a probe's equi-join scan gets parquet min/max pruning on
    * the key it filters by. The id column is stored as `corpus_id`.
    */
  def writeBandIndex(docs: DataFrame, textCol: String, idCol: String,
      dir: String, n: Int = 3): Unit =
    bandTable(docs, textCol, idCol, n)
      .withColumnRenamed(idCol, "corpus_id")
      .repartition(col("band_key"))
      .sortWithinPartitions("band_id", "band_key")
      .write.mode("overwrite").parquet(dir)

  /** Append-delta refresh of a [[writeBandIndex]] index — the
    * [[IndexStore.ensureIncremental]] `buildDelta` half. The prior
    * generation's parquet is reused VERBATIM (hard links, O(1) per file);
    * shingling + MinHash run ONLY over `delta.newFiles`, so an appended
    * crawl batch costs O(batch) signatures while already-indexed corpus
    * files are never re-read. The appended rows land in their own
    * band_key-clustered, (band_id, band_key)-sorted files, so probes keep
    * the per-file min/max pruning [[writeBandIndex]] establishes; the
    * append's job commit writes `_SUCCESS` LAST, so a crash mid-refresh
    * leaves a not-ready generation (IndexStore's completeness guard).
    */
  def appendBandIndex(spark: SparkSession, delta: IndexStore.AppendDelta,
      newDir: String, textCol: String, idCol: String, n: Int = 3): Unit = {
    IndexStore.linkData(delta.priorDir, newDir)
    if (delta.newFiles.isEmpty) {
      // input grew only by non-data files: the linked generation is
      // already complete — commit it explicitly.
      new java.io.File(newDir, "_SUCCESS").createNewFile()
    } else {
      bandTable(spark.read.parquet(delta.newFiles: _*), textCol, idCol, n)
        .withColumnRenamed(idCol, "corpus_id")
        .repartition(col("band_key"))
        .sortWithinPartitions("band_id", "band_key")
        .write.mode("append").parquet(newDir)
    }
  }

  /** Probe a persisted [[writeBandIndex]] index with a new batch: same
    * output contract as [[incrementalNearDups]] — one row per batch doc that
    * LSH-collides with the corpus, (id, corpus_match = smallest colliding
    * corpus id, n_matches) — but the corpus side is the INDEX SCAN, not a
    * recomputation. Signature work is O(batch); the batch's band table is
    * broadcast (bounded by batch size × nBands), so the index scan streams
    * map-side with no shuffle of the big side.
    */
  def probeBandIndex(spark: SparkSession, indexDir: String, batch: DataFrame,
      textCol: String, idCol: String, n: Int = 3): DataFrame =
    spark.read.parquet(indexDir)
      .join(broadcast(bandTable(batch, textCol, idCol, n)),
        Seq("band_id", "band_key"))
      .groupBy(col(idCol))
      .agg(min(col("corpus_id")).as("corpus_match"),
        countDistinct(col("corpus_id")).as("n_matches"))

  /** Greedy near-dup removal: drop every doc that is the HIGHER id of an
    * LSH candidate pair (the min-id member of each near-dup group's pair
    * graph survives). One anti-join over the candidate pairs — the standard
    * cheap variant (full transitive-closure dedup needs iterative connected
    * components; at candidate-graph sparsity the greedy form removes the
    * same mass).
    */
  def dropNearDuplicates(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val dupIds = minhashCandidatePairs(docs, textCol, idCol, n)
      .select(col("doc_b").as(idCol)).distinct()
    docs.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Transitive-closure dedup groups: connected components over the LSH
    * candidate-pair graph, labels = min doc id per component (so the label
    * doubles as the canonical survivor). Returns (id, label) for every doc;
    * singletons label themselves.
    *
    * Components are computed by [[connectedComponents]] (alternating
    * large-star/small-star, round 14); the loop runs over the PAIR GRAPH
    * only — at corpus scale near-dup components cover a small fraction of
    * documents, so the (unchanged) singleton majority is attached by one
    * final join, labeling itself.
    */
  def dedupGroups(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, maxIter: Int = 64,
      reliableCheckpoints: Option[Boolean] = None): DataFrame = {
    val pairs = minhashCandidatePairs(docs, textCol, idCol, n)
    val labels = connectedComponents(pairs, maxIter, reliableCheckpoints,
      canonicalInput = true)
    docs.select(col(idCol).as("id"))
      .join(labels.withColumnRenamed("label", "_glabel"), Seq("id"), "left")
      .select(col("id"), coalesce(col("_glabel"), col("id")).as("label"))
  }

  /** Connected components over an undirected pair list (columns = two
    * vertex ids), returning (id, label) for every vertex OF THE PAIR
    * GRAPH with label = min id of its component.
    *
    * Alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
    * Rastogi, Vassilvitskii, "Connected Components in MapReduce and
    * Beyond", SoCC 2014 — round 14). The edge list is kept CANONICAL
    * (lo < hi, deduped); per round:
    *
    *   - large-star: every edge (lo, hi) rewires its larger endpoint to
    *     m(lo) = min(lo, neighbors of lo) — one keyed min over the
    *     symmetric view + one join. m(lo) <= lo < hi, so the output is
    *     canonical by construction and self-loop-free.
    *   - small-star: every vertex hi with smaller neighbors connects
    *     them AND itself to m(hi) = min of those neighbors — one keyed
    *     min over the canonical list + one join.
    *
    * Both operations preserve connectivity and only ever move ids
    * DOWNWARD, and the paper proves the alternation converges to
    * min-rooted stars in O(log^2 |V|) rounds worst-case (in practice a
    * handful; a monotone-id path of n vertices — the shape that made the
    * round-12 neighbor-min contraction crawl one vertex per round — takes
    * exactly ceil(log2 n) rounds, each round doubling the star radius;
    * see the chain spec in DedupSpec). Convergence is DETECTED, not
    * assumed: the graph is a union of min-rooted stars iff every vertex
    * with a smaller neighbor has exactly one distinct neighbor, checked
    * with one aggregate per round. `maxIter` (parameterized) is a loud
    * guard — it throws rather than return a wrong answer, and the message
    * says what to raise. Once converged, the star edges ARE the label
    * table: leaves map hi -> lo, roots (vertices appearing only as lo)
    * map to themselves — no separate representative table to compose.
    *
    * `onRound` is a test/observability hook invoked with each round's
    * checkpointed edge frame (used by the stats-canary spec to assert the
    * per-round leaf statistics stay at the measured bound instead of
    * compounding — see [[org.apache.spark.sql.graftbridge.CheckpointBridge.withStats]]).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 64,
      reliableCheckpoints: Option[Boolean] = None,
      onRound: (Int, DataFrame) => Unit = (_, _) => (),
      canonicalInput: Boolean = false): DataFrame = {
    val spark = pairs.sparkSession
    val Seq(aCol, bCol) = pairs.columns.toSeq.take(2).map(col)
    // Checkpointing (eager) CUTS LINEAGE, not just caches: an iterative
    // loop over persisted-only frames keeps the full logical plan and adds
    // subtree references per round, so Catalyst re-optimizes an
    // exponentially-growing plan each iteration — measured 1.7 s -> 6.2 s
    // PER ROUND by iteration 4 on an 829-edge graph. With the plan cut at
    // the loop boundary, every round plans O(1) work.
    //
    // localCheckpoint stores rounds in EXECUTOR blocks — non-reliable: on
    // a real cluster one lost executor aborts the whole loop and the job
    // restarts from scratch. So the default is AUTO: when the session has
    // a configured checkpoint dir (spark.sparkContext.setCheckpointDir —
    // on a cluster that is HDFS/object storage), rounds go through
    // reliable df.checkpoint() and survive executor loss; without one,
    // the single-JVM localCheckpoint fast path. Pass Some(...) to force
    // either. Superseded per-round checkpoints (blocks AND files) are
    // released as soon as the next round materializes
    // (CheckpointBridge.release) — a long-lived session accumulates
    // exactly one live edge frame.
    val reliable = reliableCheckpoints.getOrElse(
      spark.sparkContext.getCheckpointDir.isDefined)
    // Lineage cut + row count in ONE pass (r18, guide §2.4 — fewer full
    // passes): the local path marks the checkpoint LAZY and lets count()
    // materialize it, so each round runs one job over the edge list where
    // eager-checkpoint-then-count ran two (at corpus scale the count was a
    // second full scan; at bench scale it was a whole extra job+stage per
    // round of a loop that is job-floor bound). The reliable path stays
    // eager: a non-eager reliable checkpoint recomputes its lineage when
    // the files are written (Spark caveat), which would double, not halve,
    // the work.
    // The cut frame also gets SCALE-ADAPTIVE partitioning: a checkpoint
    // inherits its parent's partition count, which for these tiny-round
    // frames is the pinned shuffle width — every consumer stage of a round
    // then runs that many near-empty tasks (measured: the un-coalesced
    // canonical path added ~150 tasks / +12 s executorRunTime to xq32 at
    // sf0.1 for identical data). Sizing from the measured row count (~AQE's
    // advisory: ~1.3 M 48-byte rows per partition) folds small rounds into
    // few tasks while leaving at-scale rounds untouched (coalesce never
    // raises the partition count). Applied AFTER withStats so the honest
    // leaf statistics sit under the narrow wrapper.
    def cutCounted(df: DataFrame): (DataFrame, Long) = {
      val c = if (reliable) df.checkpoint() else df.localCheckpoint(eager = false)
      val n = c.count()
      val sized = org.apache.spark.sql.graftbridge.CheckpointBridge
        .withStats(c, BigInt(n.max(1L)) * 48L)
      (sized.coalesce((n / 1300000L + 1L).toInt), n)
    }
    // Checkpoints additionally get EXPLICIT bounded statistics
    // (CheckpointBridge.withStats): the default stats rewrite carries the
    // original plan's join-PRODUCT size estimate onto the leaf, so a loop
    // of checkpointed rounds compounds sizeInBytes multiplicatively —
    // at >15 rounds the BigInt reaches millions of digits and the driver
    // spins in the stats visitor (the sf10 probe found it; see the
    // bridge's scaladoc). Sizes are honest measured row counts, so
    // broadcast decisions stay truthful on a cluster.
    // `canonicalInput = true` is a caller ASSERTION that `pairs` is already
    // (lo < hi, distinct) — e.g. minhashCandidatePairs' output, which ends
    // in exactly that where+distinct. The general canonicalization below
    // costs a full extra exchange (least/greatest defeats alias analysis,
    // so the input's own distinct partitioning is never reused) for a
    // provable no-op on such inputs (r18).
    var (edges, nEdges) = cutCounted(
      if (canonicalInput)
        pairs.select(aCol.as("lo"), bCol.as("hi"))
      else pairs
        .select(least(aCol, bCol).as("lo"), greatest(aCol, bCol).as("hi"))
        .where(col("lo") =!= col("hi"))
        .distinct())
    var iter = 0
    var nonStar = -1L
    var looping = true
    while (looping) {
      // ONE symmetric (min, degree) aggregate per round serves BOTH the
      // convergence predicate and the large-star min table (r14 perf pass:
      // the separate nonStarVertices aggregate was a second full pass over
      // 2|E| every round — fusing it cut the sf5 group family ~25%).
      // Union of min-rooted stars iff every vertex with a smaller neighbor
      // has exactly one distinct neighbor (leaves have degree 1; roots
      // have only larger neighbors) — the exact fixpoint of the
      // alternation. Degree = symmetric-view row count because the
      // canonical edge list is deduped.
      //
      // The probe runs UNCONDITIONALLY each loop entry; only the rewiring
      // round is gated on iter < maxIter. A graph converging in exactly
      // maxIter rounds therefore still gets its final (passing) probe
      // instead of tripping the guard on a stale pre-round count, and the
      // guard message always reports a fresh count (r15 fix, ADVICE).
      val stats = edges
        .select(col("lo").as("v"), col("hi").as("w"))
        .unionByName(edges.select(col("hi").as("v"), col("lo").as("w")))
        .groupBy(col("v"))
        .agg(min(col("w")).as("minw"), count(lit(1)).as("deg"))
        .persist()
      // try/finally: a failure mid-round must not leak the persisted
      // aggregate's cached blocks in a long-lived session (r15 fix).
      try {
        nonStar =
          stats.where(col("minw") < col("v") && col("deg") > lit(1)).count()
        if (nonStar == 0 || iter >= maxIter) {
          looping = false
        } else {
          // large-star: (lo, hi) -> (m(lo), hi). NOT distinct'd and NOT
          // checkpointed (r14 perf pass): duplicates are harmless to the
          // hi-keyed min and are absorbed by the round-end distinct, so the
          // intermediate canonicalization was a pure extra full-width
          // exchange; and its two consumers below are both keyed on `hi`,
          // so exchange reuse (AQE stage reuse) materializes the join once —
          // the round-end checkpoint of `small` still cuts lineage.
          val mins = stats
            .select(col("v").as("lo"), least(col("v"), col("minw")).as("m"))
          val large = edges.join(mins, Seq("lo"))
            .select(col("m").as("lo"), col("hi"))
          // small-star: every smaller neighbor of hi, and hi itself, rewires
          // to min(smaller neighbors of hi)
          val minsS = large.groupBy(col("hi")).agg(min(col("lo")).as("m"))
          val rewired = large.join(minsS, Seq("hi"))
            .where(col("m") =!= col("lo"))
            .select(col("m").as("lo"), col("lo").as("hi"))
          val centers = minsS.select(col("m").as("lo"), col("hi"))
          val (small, n) = cutCounted(rewired.unionByName(centers).distinct())
          nEdges = n
          org.apache.spark.sql.graftbridge.CheckpointBridge.release(edges)
          edges = small
          iter += 1
          onRound(iter, edges)
        }
      } finally {
        stats.unpersist()
      }
    }
    require(nonStar == 0,
      s"connectedComponents did not converge within $maxIter alternation " +
        s"rounds ($nonStar non-star vertices remain) — pass a larger " +
        "maxIter; the alternation is guaranteed to converge " +
        "(Kiveris et al. 2014, O(log^2 V) rounds worst-case)")
    // Converged: every edge is (root=component min, leaf); the lo-set and
    // hi-set are disjoint, so the edge list IS the label table.
    edges.select(col("hi").as("id"), col("lo").as("label"))
      .unionByName(
        edges.select(col("lo").as("id"), col("lo").as("label")).distinct())
  }

  /** Soft dedup: instead of DROPPING near-duplicates, down-weight them —
    * every doc gets training weight 1/|its transitive near-dup group|, so
    * each group contributes exactly unit mass to the training mix (the
    * "duplication count as sampling weight" alternative to hard removal;
    * keeps rare-but-duplicated content represented without over-counting).
    *
    * Output: (idCol, group_id, group_size, weight) with
    * Σ weight = #groups by construction. weight = 1/long is a single IEEE
    * divide of exact integers — bit-identical cross-engine. Cost on top of
    * [[dedupGroups]]: one group-keyed count + one key-only join.
    */
  def softDedupWeights(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val g = dedupGroups(docs, textCol, idCol, n)
    val sizes = g.groupBy(col("label")).agg(count(lit(1)).as("group_size"))
    g.join(sizes, "label")
      .select(col("id").as(idCol), col("label").as("group_id"),
        col("group_size"),
        (lit(1.0d) / col("group_size").cast("double")).as("weight"))
  }

  /** 60-bit SimHash over whitespace tokens. Token hash = first 15 hex chars
    * of md5 as an unsigned 60-bit integer (portable: DuckDB casts
    * '0x'||hex). Signature bit b is set iff the majority of token hashes
    * have bit b set.
    */
  val SimhashBits = 60

  /** One narrow projection since round 4: the fused
    * [[graft.expressions.SimhashSig]] expression tokenizes, hashes and
    * bit-votes per doc in a single pass — the former token explode, 60×
    * bit explode and two doc-keyed exchanges are gone (they were xq07's
    * whole 14 s at sf1). Bit-identical: the vote is an order-free integer
    * sum per bit.
    */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    Parallelize.ensure(docs, col(idCol)).select(col(idCol),
      graft.expressions.SimhashSig(col(textCol)).as("simhash"))

  /** 120-bit SimHash as TWO 60-bit words (sg0, sg1) from independent
    * seeded token hashes — the signature width the banded pair search
    * needs at corpus scale (see [[simhashNearDupPairsWide]]). Two fused
    * [[graft.expressions.SimhashSig]] projections, no shuffle (round 4).
    */
  def simhashWide(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    Parallelize.ensure(docs, col(idCol)).select(col(idCol),
      graft.expressions.SimhashSig(col(textCol), "w0:").as("sg0"),
      graft.expressions.SimhashSig(col(textCol), "w1:").as("sg1"))

  /** Production-scale simhash pair search: 120-bit signatures, maxHamming
    * <= 3, FOUR 30-bit pigeonhole bands (the Manku/Google near-dup
    * configuration: few, WIDE bands).
    *
    * Why [[simhashNearDupPairs]] cannot scale past ~10^4 docs: pigeonhole
    * exactness forces maxHamming+1 bands, so 60-bit signatures at
    * maxHamming=12 leave 4-5-bit band keys — only 16-32 distinct bucket
    * values, and every bucket holds N/16 of the corpus, so in-bucket
    * verification is Θ(N²) with a small constant. Measured at the sf1
    * trendline: 241 s Spark / 44 s DuckDB at 50 k docs and growing
    * quadratically. Here each band key has 2^30 values: two docs share a
    * band only when 30 signature bits agree exactly, which for hash-
    * uniform signatures makes expected bucket size ~N/2^30 + true-dup
    * cluster size — candidate generation is linear until N ~ 10^9 (and at
    * that scale the same rule says: widen the signature again, never
    * narrow the bands). Hamming <= 3 on 120 bits is the standard near-dup
    * operating point (tighter than xq26's generous 12-of-60, which is
    * kept for small-corpus recall studies).
    */
  def simhashNearDupPairsWide(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming + 1 <= 4,
      s"wide variant fixes 4 bands of 30 bits; need maxHamming <= 3, got $maxHamming")
    val sig = simhashWide(docs, textCol, idCol)
      .trackedCache
    val bands = sig.select(col(idCol), col("sg0"), col("sg1"), explode(array(
        (0 until 4).map { b =>
          val word = if (b < 2) "sg0" else "sg1"
          val shift = (b % 2) * 30
          struct(lit(b).as("band_id"),
            expr(s"($word >> $shift) & ${(1L << 30) - 1}").as("band_key"))
        }: _*)).as("band"))
      .select(col(idCol), col("sg0"), col("sg1"),
        col("band.band_id"), col("band.band_key"))
    val a = bands.toDF("doc_a", "a_sg0", "a_sg1", "band_id", "band_key")
    val b = bands.toDF("doc_b", "b_sg0", "b_sg1", "band_id", "band_key")
    a.join(b, Seq("band_id", "band_key"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(a_sg0 ^ b_sg0) + bit_count(a_sg1 ^ b_sg1) AS BIGINT)")
          .as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash near-dup pair search: every (doc_a, doc_b) with
    * hamming(sig_a, sig_b) <= maxHamming — WITHOUT the all-pairs product.
    *
    * Pigeonhole banding: the 60-bit signature splits into maxHamming+1
    * disjoint bands. Two signatures within the distance bound differ in at
    * most maxHamming bit positions, which can "dirty" at most maxHamming
    * bands — so they agree EXACTLY on at least one band. An equi-join on
    * (band_id, band_bits) therefore finds every qualifying pair;
    * bit_count(xor) <= maxHamming verifies inside the buckets. Identical
    * output to the cartesian form; the band join is the only wide exchange
    * and its key space (band_id × band value) is hash-uniform by
    * construction (md5-derived bits).
    */
  def simhashNearDupPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 12): DataFrame = {
    require(maxHamming + 1 <= SimhashBits, "need at least one bit per band")
    val sig = simhash(docs, textCol, idCol)
    val nBands = maxHamming + 1
    val base = SimhashBits / nBands
    val rem = SimhashBits % nBands
    val widths = Seq.tabulate(nBands)(b => if (b < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    // Persisted: the signature computation (md5 over every token) feeds both
    // join sides.
    val bands = sig.select(col(idCol), col("simhash"), explode(array(
        (0 until nBands).map { b =>
          struct(lit(b).as("band_id"),
            expr(s"(simhash >> ${offsets(b)}) & ${(1L << widths(b)) - 1}")
              .as("band_key"))
        }: _*)).as("band"))
      .select(col(idCol), col("simhash"), col("band.band_id"), col("band.band_key"))
      .trackedCache
    val a = bands.toDF("doc_a", "sig_a", "band_id", "band_key")
    val b = bands.toDF("doc_b", "sig_b", "band_id", "band_key")
    a.join(b, Seq("band_id", "band_key"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(sig_a ^ sig_b) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** n-gram Jaccard similarity for candidate pairs: distinct shingle sets,
    * co-shingle join, |A∩B| / (|A|+|B|-|A∩B|). `minJaccard` prunes output.
    *
    * `maxDf` bounds the join against shingle-frequency skew: a shingle
    * appearing in more than maxDf documents (boilerplate at corpus scale)
    * contributes O(df²) join rows for near-zero Jaccard signal, so such
    * shingles are dropped from CANDIDATE GENERATION only — the per-doc set
    * sizes and the intersection counts still use the full shingle sets, so
    * every reported Jaccard value is exact. Pairs whose entire overlap is
    * boilerplate shingles may be missed (the standard df-cap trade-off);
    * maxDf <= 0 disables the cap. The capped path bound-prunes candidates
    * before the hot add-back (round 9, mirroring containmentPairs' xq100
    * fix): a candidate whose upper-bound Jaccard
    * (c_cold + min(ha,hb)) / (na + nb - c_cold - min(ha,hb)) misses
    * `minJaccard` can never qualify — lossless, see the inline proof.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, minJaccard: Double = 0.0, maxDf: Long = 0L): DataFrame = {
    // Persisted: reused by both join sides and the per-doc counts.
    val sh = distinctShingles(docs, textCol, idCol, n)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    def jacOut(pairs: DataFrame, c: Column): DataFrame = pairs
      .select(col("doc_a"), col("doc_b"),
        (c.cast("double") / (col("na") + col("nb") - c).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= minJaccard)
    if (maxDf <= 0L)
      jacOut(
        intersectionCounts(sh, 0L)
          .join(counts.toDF("doc_a", "na"), "doc_a")
          .join(counts.toDF("doc_b", "nb"), "doc_b"),
        col("c"))
    else
      // Same bound prune as containmentPairs (round 9): c <= c_ub =
      // c_cold + min(ha,hb), and j(c) = c/(na+nb-c) is monotone in c with
      // c_ub <= min(na,nb) (c_cold <= min(na-ha, nb-hb)), so
      // fl(c_ub/(na+nb-c_ub)) >= fl(c/(na+nb-c)) — numerator grows,
      // integer denominator shrinks, correctly-rounded division is
      // monotone in both. Pruning on the SAME division the final filter
      // uses keeps every boundary pair; minJaccard = 0 keeps everything.
      jacOut(hotColdCounts(sh, maxDf) { (coldCounts, hotPerDoc) =>
        val perDoc = perDocHotMeta(counts, hotPerDoc)
        val cUb = col("c_cold") + least(col("ha"), col("hb"))
        val withMeta = coldCounts
          .join(perDoc.toDF("doc_a", "na", "ha"), "doc_a")
          .join(perDoc.toDF("doc_b", "nb", "hb"), "doc_b")
        // threshold 0 keeps everything by construction — skip the per-row
        // predicate rather than evaluate a tautology on every candidate
        if (minJaccard > 0)
          withMeta.where(cUb.cast("double") /
            (col("na") + col("nb") - cUb).cast("double") >= lit(minJaccard))
        else withMeta
      }, col("c"))
  }

  /** Shingle-containment pairs — the ASYMMETRIC near-dup relation Jaccard
    * misses: containment(A in B) = |A∩B| / |A| is ~1 when a short document
    * (a quote, an excerpt, a syndicated fragment) sits inside a longer one,
    * while their Jaccard stays near |A|/|B|. The standard quote/excerpt
    * detection pass of corpus curation. Same candidate machinery as
    * [[ngramJaccardPairs]] (co-shingle equi-join, optional df cap); output
    * keeps both directions so the caller sees which side is the fragment.
    *
    * The capped path adds a BOUND PRUNE between candidate generation and
    * the hot-contribution add (round 8; the un-pruned form was 3.6x its
    * oracle at sf5): c = c_cold + c_hot with c_hot <= min(|hot A|,|hot B|),
    * and max(cont) = c / min(|A|,|B|), so a candidate whose upper bound
    * (c_cold + min(ha,hb)) / min(na,nb) misses `minContainment` can never
    * qualify and is dropped EXACTLY — at sf5 that is 18.9M candidates down
    * to the thousands that matter, turning the 579M-row hot fan-out into a
    * broadcast join. Results are bit-identical for every threshold; at
    * minContainment = 0 the prune keeps everything by construction.
    */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, minContainment: Double = 0.0, maxDf: Long = 0L): DataFrame = {
    val sh = distinctShingles(docs, textCol, idCol, n)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    def contOut(pairs: DataFrame, c: Column): DataFrame = pairs
      .select(col("doc_a"), col("doc_b"),
        (c.cast("double") / col("na").cast("double")).as("cont_a_in_b"),
        (c.cast("double") / col("nb").cast("double")).as("cont_b_in_a"))
      .where(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= minContainment)
    if (maxDf <= 0L) {
      contOut(
        intersectionCounts(sh, 0L)
          .join(counts.toDF("doc_a", "na"), "doc_a")
          .join(counts.toDF("doc_b", "nb"), "doc_b"),
        col("c"))
    } else {
      // Bound prune in DIVISION form — the same correctly-rounded division
      // the final filter evaluates, so c_ub >= c gives
      // fl(c_ub/minN) >= fl(c/minN) by monotonicity and the prune is
      // lossless for EVERY representable threshold (the earlier
      // multiplication form fl(t*minN) could exceed c on exact-boundary
      // thresholds like 5.0/7.0 while fl(c/minN) >= t still held,
      // wrongly pruning a boundary pair).
      contOut(hotColdCounts(sh, maxDf) { (coldCounts, hotPerDoc) =>
        val perDoc = perDocHotMeta(counts, hotPerDoc)
        val withMeta = coldCounts
          .join(perDoc.toDF("doc_a", "na", "ha"), "doc_a")
          .join(perDoc.toDF("doc_b", "nb", "hb"), "doc_b")
        if (minContainment > 0)
          withMeta.where(
            (col("c_cold") + least(col("ha"), col("hb"))).cast("double") /
              least(col("na"), col("nb")).cast("double") >= lit(minContainment))
        else withMeta
      }, col("c"))
    }
  }

  /** The persisted DISTINCT (doc_id, shingle) set all shingle-pair
    * operators start from, built as ONE shingle-keyed exchange (round 12):
    * the raw exploded shingles are REPARTITION_BY_NUM'd on `shingle`, and
    * because HashPartitioning(shingle) satisfies the clustered distribution
    * of every downstream key set containing `shingle`, the distinct
    * aggregate, the df-count (`groupBy(shingle)`), AND the co-shingle pair
    * self-join all reuse this single partitioning — the previous form
    * (distinct on (doc_id, shingle), then a second shingle exchange for
    * df-count and a third for the pair join) paid this box's ~0.3-0.5 s
    * per-stage floor twice more for byte-identical results (the xq100
    * adjudication: stage COUNT, not data, dominates at small SF).
    *
    * Skew-safe by construction: REPARTITION_BY_NUM pins the partition
    * count against AQE's byte-based coalescing (the fuzzyDedupPairs trap),
    * and per-shingle df is bounded in the capped regime the scale path
    * uses, so no reducer inherits a data-scale key group.
    */
  private def distinctShingles(docs: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame =
    Shingles.hashed(docs, textCol, idCol, n)
      .withColumnRenamed(idCol, "doc_id")
      .repartition(numShufflePartitions(docs), col("shingle"))
      .dropDuplicates("doc_id", "shingle")
      .trackedCache

  /** Distinct-shingle intersection counts per candidate pair
    * (doc_a < doc_b, c = |A∩B|) — the shared engine of
    * [[ngramJaccardPairs]] and [[containmentPairs]]. `sh` must be the
    * [[distinctShingles]] output: persisted (it feeds both join sides) and
    * partitioned by `shingle`, so the self-join needs no exchange of its
    * own. See ngramJaccardPairs for the maxDf skew-cap contract.
    */
  private def intersectionCounts(sh: DataFrame, maxDf: Long): DataFrame =
    if (maxDf > 0L)
      hotColdCounts(sh, maxDf)((coldCounts, _) => coldCounts)
        .select("doc_a", "doc_b", "c")
    else
      sh.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(sh.toDF("doc_b", "shingle"), "shingle")
        .where(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))

  /** The single copy of the df-capped hot/cold candidate machinery (round
    * 9 — previously duplicated between [[intersectionCounts]] and
    * [[containmentPairs]], where an AQE-pin fix applied to one copy could
    * silently miss the other). Shingle sets partition into cold
    * (df <= maxDf) and hot. The cold self-join generates candidates AND
    * their cold-intersection counts in one grouped pass; the hot
    * contribution is then added per SURVIVING candidate by joining each
    * pair against its (few) hot shingles — never the O(df²) hot-shingle
    * self-join. Exact totals: |A∩B| = |A∩B ∩ cold| + |A∩B ∩ hot|.
    *
    * `refine(coldCounts, hotPerDoc)` lets the caller enrich and BOUND-PRUNE
    * the (doc_a, doc_b, c_cold) candidate frame before the hot add-back
    * (hotPerDoc = per-doc hot-shingle counts, the prune metadata); it must
    * keep doc_a/doc_b/c_cold and may add columns. The refined set is
    * cached once — it feeds both the hot-contribution join and the final
    * assembly, and uncached the cold pair self-join (the dominant stage at
    * sf5) would execute twice. Returns the refined columns plus exact
    * `c` = c_cold + c_hot.
    */
  private def hotColdCounts(sh: DataFrame, maxDf: Long)(
      refine: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    // df-count and the cold pair self-join both reuse the shingle
    // partitioning [[distinctShingles]] pinned (REPARTITION_BY_NUM, so
    // AQE cannot coalesce the quadratic pair fan-out — the fuzzyDedupPairs
    // trap, measured 2x on xq76 at sf1): zero exchanges from the cached
    // distinct set to the pair join's aggregate.
    // Cached (r18): the hot-key set feeds BOTH the anti (cold) and semi
    // (hot) splits below — uncached, each split re-ran the full df
    // aggregate over the shingle set. It is tiny by construction (only
    // shingles with df > maxDf).
    val hotKeys = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("shingle")
      .trackedCache
    val cold = sh.join(hotKeys, Seq("shingle"), "left_anti")
      .select(col("doc_id"), col("shingle"))
    val hot = sh.join(hotKeys, Seq("shingle"), "left_semi")
      .select(col("doc_id"), col("shingle"))
    val coldCounts = cold.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(cold.select(col("doc_id").as("doc_b"), col("shingle")), "shingle")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c_cold"))
    val hotPerDoc = hot.groupBy("doc_id").agg(count(lit(1)).as("n_hot"))
    val refined = refine(coldCounts, hotPerDoc).trackedCache
    val hotCounts = refined.select("doc_a", "doc_b")
      .join(hot.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(hot.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c_hot"))
    refined.join(hotCounts, Seq("doc_a", "doc_b"), "left")
      .withColumn("c", col("c_cold") + coalesce(col("c_hot"), lit(0L)))
  }

  /** (doc_id, n_sh, n_hot) per document — the metadata the bound prunes
    * join onto each candidate side (n_hot coalesced to 0 for all-cold
    * docs).
    */
  private def perDocHotMeta(counts: DataFrame, hotPerDoc: DataFrame): DataFrame =
    counts.join(hotPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_hot"), lit(0L)).as("n_hot"))

  /** The session's configured shuffle parallelism — used with
    * REPARTITION_BY_NUM to pin compute-dense exchanges that AQE's
    * byte-based coalescing must not fold (see fuzzyDedupPairs).
    */
  private def numShufflePartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Embedding-cosine near-dup pairs above a threshold — the scale path:
    * candidate generation through sign-LSH bucket co-membership
    * (Similarity.lshAssign) with hamming-1 multiprobe, cosine verified
    * inside the buckets. A pair qualifies iff its bucket signatures differ
    * in at most one plane bit — each vector explodes into nPlanes+1 probe
    * buckets and the probe⋈bucket equi-join replaces the all-pairs product.
    * Approximate by design (recall = P[hamming(sig_a,sig_b) <= 1], which
    * rises steeply with cosine); deterministic, so still oracle-checkable
    * against the same candidate rule in SQL.
    */
  def embeddingNearDups(emb: DataFrame, vecCol: String, idCol: String,
      minCosine: Double, nPlanes: Int = 4): DataFrame = {
    // Persisted: the signature pass (nPlanes dots per vector) feeds both
    // join sides. Exactly one probe matches per qualifying pair (the
    // identity probe at hamming 0, the single flipped probe at hamming 1),
    // so no distinct is needed.
    val assigned = Similarity.lshAssign(emb, vecCol, idCol, nPlanes)
      .trackedCache
    val probes = assigned.select(col(idCol).as("vec_a"), col(vecCol).as("va"),
      col("norm").as("norm_a"),
      explode(array(col("bucket") +:
        (0 until nPlanes).map(p => expr(s"bucket ^ ${1L << p}")): _*)).as("bucket"))
    val b = assigned.select(col(idCol).as("vec_b"), col(vecCol).as("vb"),
      col("norm").as("norm_b"), col("bucket"))
    probes.join(b, "bucket")
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (VectorFunctions.dot(col("va"), col("vb")) / (col("norm_a") * col("norm_b")))
          .as("cosine"))
      .where(col("cosine") >= minCosine)
  }

  /** Exact all-pairs variant — the verification/oracle tool for small data
    * (O(N²); do NOT run at corpus scale — `embeddingNearDups` is the
    * production path). Norms precomputed per vector so each pair does ONE
    * dot product; dot/(norm_a*norm_b) is the same IEEE sequence as the
    * bucketed path, so outputs are directly comparable.
    */
  def embeddingNearDupsExact(emb: DataFrame, vecCol: String, idCol: String,
      minCosine: Double): DataFrame = {
    val a = emb.select(col(idCol).as("vec_a"), col(vecCol).as("va"),
      sqrt(VectorFunctions.dot(col(vecCol), col(vecCol))).as("norm_a"))
    val b = emb.select(col(idCol).as("vec_b"), col(vecCol).as("vb"),
      sqrt(VectorFunctions.dot(col(vecCol), col(vecCol))).as("norm_b"))
    a.crossJoin(b).where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (VectorFunctions.dot(col("va"), col("vb")) / (col("norm_a") * col("norm_b")))
          .as("cosine"))
      .where(col("cosine") >= minCosine)
  }

  /** Blocked fuzzy-match pairs — the entity-resolution shape (titles, names,
    * product descriptions): every (doc_a, doc_b) whose match keys are within
    * `maxDist` Levenshtein edits, found WITHOUT the all-pairs product.
    *
    * The match key is the lowercased first `keyLen` chars (edit distance on
    * full documents is O(len²) per pair and meaningless for long text; short
    * normalized keys are the standard ER practice). Candidate generation is
    * standard BLOCKING: only pairs sharing the first `blockLen` chars are
    * compared — a deterministic equi-join on the block key, so the only wide
    * exchange is shuffle-on-block and hot blocks are ordinary join skew
    * (AQE's skew split applies). Pairs whose edits fall inside the block
    * prefix are missed by construction — the documented recall trade-off of
    * blocking; choose `blockLen` per key distribution.
    *
    * Levenshtein (unit-cost insert/delete/substitute) is identical in Spark
    * and DuckDB, so results are oracle-exact.
    */
  def fuzzyDedupPairs(docs: DataFrame, textCol: String, idCol: String,
      keyLen: Int = 40, blockLen: Int = 8, maxDist: Int = 8,
      fanout: Int = 16): DataFrame = {
    require(blockLen <= keyLen, s"blockLen $blockLen must be <= keyLen $keyLen")
    require(fanout >= 1, s"fanout must be >= 1, got $fanout")
    // Three cost levers over the naive in-block doc×doc compare, all exact:
    //  1. DISTINCT-KEY compare: duplicated prefixes (boilerplate headers,
    //     syndicated openings) are the norm in web corpora, so levenshtein
    //     runs once per distinct key PAIR; doc pairs are recovered by two
    //     cheap equi-joins on the matched keys afterwards — the quadratic
    //     join never carries doc ids, only the short keys.
    //  2. CELL DECOMPOSITION of the in-block self-join: each key gets a
    //     deterministic sub-bucket g in [0, fanout); the a-side joins into
    //     cells (g, x >= g), the b-side into (x <= g, g), so a hot block of
    //     m keys becomes fanout·(fanout+1)/2 independently-scheduled join
    //     cells of (m/fanout)² work instead of ONE task doing m²/2 — the
    //     skew profile a prefix block distribution always has (the sf1 run
    //     measured one block holding 39% of all pair work).
    //  3. BANDED levenshtein: the threshold form computes only the ±maxDist
    //     diagonal band (O(len·d), not O(len²)) and returns -1 past the
    //     threshold — same verdict as computing the full distance and
    //     filtering, which is what the oracle does.
    val keyed = docs.select(col(idCol),
      lower(substring(col(textCol), 1, keyLen)).as("key"))
    val keys = keyed.select("key").distinct()
      .withColumn("block", substring(col("key"), 1, blockLen))
      .withColumn("g", pmod(xxhash64(col("key")), lit(fanout.toLong)).cast("int"))
    // REPARTITION_BY_NUM (not coalescible by AQE) on the cell key: the
    // shuffled bytes here are tiny (short keys) while per-row compute is
    // huge (a levenshtein per joined row), so AQE's byte-based partition
    // coalescing would otherwise fold the whole compare onto a handful of
    // cores — measured 36 s -> 3 s at sf1 from this one property.
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    val a = keys.select(col("key").as("key_a"), col("block"), col("g").as("c1"))
      .withColumn("c2", explode(sequence(col("c1"), lit(fanout - 1))))
      .repartition(p, col("block"), col("c1"), col("c2"))
    val b = keys.select(col("key").as("key_b"), col("block"), col("g").as("c2"))
      .withColumn("c1", explode(sequence(lit(0), col("c2"))))
      .repartition(p, col("block"), col("c1"), col("c2"))
    val matched = a.join(b, Seq("block", "c1", "c2"))
      // diagonal cells see both orders + self-pairs; off-diagonal cells see
      // each unordered key pair exactly once (by cell construction)
      .where(col("c1") =!= col("c2") || col("key_a") <= col("key_b"))
      .withColumn("edit_dist",
        when(col("key_a") === col("key_b"), lit(0))
          .otherwise(levenshtein(col("key_a"), col("key_b"), maxDist)))
      .where(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select(col("key_a"), col("key_b"), col("edit_dist"))
    matched
      .join(keyed.select(col(idCol).as("_ia"), col("key").as("key_a")), "key_a")
      .join(keyed.select(col(idCol).as("_ib"), col("key").as("key_b")), "key_b")
      .where(col("key_a") =!= col("key_b") || col("_ia") < col("_ib"))
      .select(least(col("_ia"), col("_ib")).as("doc_a"),
        greatest(col("_ia"), col("_ib")).as("doc_b"),
        col("edit_dist").cast("long").as("edit_dist"))
  }

  /** Paragraph-level dedup (CCNet/RefinedWeb-style boilerplate removal):
    * split each document into non-overlapping `paraWords`-token paragraphs,
    * drop every paragraph that occurs in >= `minDocs` DISTINCT documents
    * (cross-document repetition = boilerplate), and reassemble the
    * survivors in order. Documents that were pure boilerplate survive with
    * empty `clean_text` (the caller decides whether to drop them).
    *
    * Scale shape (r18 re-plan, guide §2.4): chunking is narrow; the
    * boilerplate test runs IN PLACE as aggregate windows over one
    * paragraph-keyed exchange (for the standard minDocs = 2,
    * "one distinct doc" is exactly min(doc) = max(doc), two aggregates
    * sharing a single Window operator; general minDocs stacks a
    * dense_rank + max pair on the same exchange) — the previous
    * groupBy(para) + join-back shape shuffled every paragraph string
    * TWICE more (once into the df aggregate, once as the join's probe
    * side). Per-doc totals are a closed form of the token count
    * ([[Chunking.chunkCount]] — chunk() emits exactly that many rows), so
    * the totals exchange is gone outright; reassembly shuffles the KEPT
    * text once on the doc id. No stage is all-pairs and no window is
    * global.
    */
  def dropDuplicateParagraphs(docs: DataFrame, textCol: String, idCol: String,
      paraWords: Int = 8, minDocs: Int = 2): DataFrame = {
    val paras = Chunking.chunk(docs, textCol, idCol, size = paraWords, overlap = 0)
      .select(col(idCol), col("chunk_idx"), col("chunk_text"))
    val byPara = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk_text"))
    val kept =
      if (minDocs == 2)
        paras
          .withColumn("_mn", min(col(idCol)).over(byPara))
          .withColumn("_mx", max(col(idCol)).over(byPara))
          .where(col("_mn") === col("_mx"))
      else
        paras
          .withColumn("_dr", dense_rank().over(byPara.orderBy(col(idCol))))
          .withColumn("_nd", max(col("_dr")).over(byPara))
          .where(col("_nd") < minDocs)
    val totals = docs
      .select(col(idCol),
        Chunking.chunkCount(split(col(textCol), " "), paraWords, 0)
          .as("n_paras"))
      .where(col("n_paras").isNotNull)
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          x => x.getField("chunk_text")),
        " ").as("clean_text"))
    totals.join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** LSH band-plan table — the analytical sizing report behind every
    * banding choice in this file (xq83 is its MEASURED companion): for
    * each (bands b, rows-per-band r) factorization of `nPerm` minhashes,
    * the candidate probability 1 − (1 − j^r)^b across a Jaccard grid plus
    * the S-curve threshold estimate (1/b)^(1/r). Metadata-scale local
    * computation (|divisor pairs| × 19 rows); probabilities are
    * 1e-9-quantized so the IEEE pow trees compare exactly cross-engine.
    */
  def lshBandPlan(spark: SparkSession, nPerm: Int = 24): DataFrame = {
    import spark.implicits._
    val configs = (1 to nPerm).filter(nPerm % _ == 0).map(b => (b, nPerm / b))
    val rows = for ((b, r) <- configs; i <- 1 to 19) yield (b, r, i / 20.0)
    def q(c: Column): Column = floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    rows.toDF("n_bands", "rows_per_band", "jaccard")
      .select(col("n_bands"), col("rows_per_band"), col("jaccard"),
        q(lit(1.0) - pow(lit(1.0) - pow(col("jaccard"), col("rows_per_band")),
          col("n_bands"))).as("p_candidate"),
        q(pow(lit(1.0) / col("n_bands"), lit(1.0) / col("rows_per_band")))
          .as("t_star"))
  }
}
