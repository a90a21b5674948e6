package graft.operators

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** MinHash signatures: one row per doc with `mh1..mhK` columns.
    * md5(seed || shingle) acts as the random permutation; lexicographic
    * order on the hex digest is engine-portable (plain ASCII compare).
    *
    * Plan shape: explode shingles once, then K codegen'd md5s per shingle
    * and a single grouped min — keeps the md5 hot loop out of interpreted
    * higher-order lambdas (was ~50x slower as `array_min(transform(...))`).
    * Docs with fewer than n tokens produce no row.
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val exploded = Shingles.exploded(docs, textCol, idCol, n)
    val aggs = (1 to MinhashK).map(k =>
      min(md5(concat(lit(k.toString), col("shingle")))).as(s"mh$k"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: same band of the signature agreeing on all its hashes →
    * candidate pair. Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    */
  def minhashCandidatePairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val sig = minhashSignatures(docs, textCol, idCol, n)
    val nBands = MinhashK / BandSize
    // (id, band_id, band_key) — band_key concatenates the band's hashes.
    // Persisted: both sides of the self-join share this lineage, and the
    // signature computation (md5 over every shingle) is the expensive part.
    val bands = sig.select(col(idCol), explode(array(
      (0 until nBands).map { b =>
        struct(lit(b).as("band_id"),
          concat_ws("|", (1 to BandSize).map(j => col(s"mh${b * BandSize + j}")): _*)
            .as("band_key"))
      }: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bands.toDF("doc_a", "band_id", "band_key")
    val b = bands.toDF("doc_b", "band_id", "band_key")
    a.join(b, Seq("band_id", "band_key"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

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

  /** 60-bit SimHash over whitespace tokens. Token hash = first 15 hex chars
    * of md5 as an unsigned 60-bit integer (portable: DuckDB casts
    * '0x'||hex). Signature bit b is set iff the majority of token hashes
    * have bit b set. Implementation explodes (token, bit) and re-groups —
    * two narrow shuffles keyed by doc id, no driver work.
    */
  val SimhashBits = 60

  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tokHash = expr(s"CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)")
    docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col(idCol), tokHash.as("h"))
      .select(col(idCol), explode(sequence(lit(0), lit(SimhashBits - 1))).as("bit"), col("h"))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(when(expr("(h >> bit) & 1") === 1, 1L).otherwise(-1L)).as("s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .otherwise(0L)).as("simhash"))
  }

  /** n-gram Jaccard similarity for candidate pairs: distinct shingle sets,
    * co-shingle join, |A∩B| / (|A|+|B|-|A∩B|). `minJaccard` prunes output;
    * at scale the co-shingle join is the LSH-free (exact) fallback and is
    * bounded by shingle-frequency skew — pair it with a stopword-shingle
    * cap upstream when corpora are huge.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    // Persisted: reused by both join sides and the per-doc counts.
    val sh = Shingles.exploded(docs, textCol, idCol, n)
      .withColumnRenamed(idCol, "doc_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.toDF("doc_a", "shingle")
    val b = sh.toDF("doc_b", "shingle")
    val inter = a.join(b, "shingle").where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    inter
      .join(counts.toDF("doc_a", "na"), "doc_a")
      .join(counts.toDF("doc_b", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Embedding-cosine near-dup pairs above a threshold. Brute force at test
    * scale; the LSH-bucketed scale path is Similarity.lshAssign (bucket
    * co-membership replaces the cross join at corpus scale).
    */
  def embeddingNearDups(emb: DataFrame, vecCol: String, idCol: String,
      minCosine: Double): DataFrame = {
    // Norms precomputed per vector (O(N·d)) so each of the O(N²) pairs does
    // ONE dot product; dot/(norm_a*norm_b) is the same IEEE sequence as the
    // per-pair sqrt form, so oracle hashes still match.
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
}
