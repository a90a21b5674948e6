package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for 100 TB-scale skew and co-location — the knobs the
  * prompt-level plans (broadcast, AQE) don't cover.
  */
object ScaleJoins {

  /** Salted equi-join for skewed keys: the big side gets a deterministic
    * salt derived from a high-cardinality column; the small side is
    * replicated saltFactor times. Breaks one hot key's single reducer into
    * saltFactor reducers. Result rows identical to a plain inner join.
    *
    * (AQE's skew-join split handles sort-merge skew automatically; salting
    * is the explicit form for aggregations-after-join and for engines/modes
    * where AQE can't kick in.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltCol: String, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(col(saltCol)), lit(saltFactor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * exchange-free (co-located). Bucketed tables go through the session
    * catalog (saveAsTable) — the parquet files carry bucket spec metadata.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two bucketed tables on their bucket key — with matching bucket
    * specs Catalyst plans a SortMergeJoin with NO Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  // ---- Bloom-filter semi-join reduction -----------------------------------
  //
  // The 100 TB shape this serves: a big fact table joins a small-but-not-
  // broadcastable dimension subset. A plain shuffle join moves EVERY fact row
  // through the exchange; a Bloom prefilter drops the non-matching majority
  // map-side first, so only candidate rows pay the shuffle. (Spark's own
  // runtime row-level filtering does this opportunistically; the explicit
  // operator works in every mode, is deterministic, and its bitmap is
  // portable enough to oracle-check.) No false negatives by construction —
  // the post-filter join result is identical to the unfiltered one
  // (ScaleJoinsSpec asserts equality).
  //
  // Portability: probes use the md5-hex → 60-bit integer hash (the repo's
  // cross-engine hash idiom), and the bitmap packs 60 bits per word so shift
  // amounts stay in [0,59] and words stay positive — no sign-bit edge to
  // disagree on. bit_or aggregation is order-free.
  //
  // The two probe positions are the two non-overlapping 60-bit windows of
  // ONE md5 digest (`graft_md5w60`, hex 1-15 / 17-31) — the round-11
  // one-hash-two-windows construction that halved the MinHash family's
  // digest count; the per-row md5 over the big side was this filter's
  // measured floor (xq55). The DuckDB twin materializes the same digest
  // once and applies the identical substr windows.

  private val BitsPerWord = 60L

  /** The bitmap: one row per 60-bit word, `word -> bits`. Size nBits/60 rows
    * regardless of data scale; built with one shuffle over the DISTINCT
    * small-side keys.
    */
  def bloomBitmap(small: DataFrame, key: String, nBits: Long): DataFrame = {
    require(nBits >= BitsPerWord, s"nBits must be >= $BitsPerWord")
    small.select(col(key).cast("string").as("_k")).distinct()
      .select(explode(expr(s"graft_md5w60(concat('b', _k))")).as("_w"))
      .select((col("_w") % nBits).as("_p"))
      .select(floor(col("_p") / BitsPerWord).cast("long").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(_p % $BitsPerWord AS INT))").as("_m"))
      .groupBy("word")
      .agg(expr("bit_or(_m)").as("bits"))
  }

  /** Map-side prefilter of `big` against the small side's Bloom bitmap: a
    * row survives iff both probe bits are set. The bitmap joins broadcast
    * (≤ nBits/60 rows), so the filter adds no shuffle — candidate rows only
    * then enter the real join.
    */
  def bloomFiltered(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, nBits: Long): DataFrame = {
    val bm = broadcast(bloomBitmap(small, smallKey, nBits))
    // _d inlines into both _p columns under project collapse — codegen
    // subexpression elimination evaluates the digest once per row.
    val probed = big
      .withColumn("_d", expr(s"graft_md5w60(concat('b', CAST($bigKey AS STRING)))"))
      .withColumn("_p1", col("_d").getItem(0) % nBits)
      .withColumn("_p2", col("_d").getItem(1) % nBits)
      .withColumn("_w1", floor(col("_p1") / BitsPerWord).cast("long"))
      .withColumn("_w2", floor(col("_p2") / BitsPerWord).cast("long"))
    probed
      .join(bm.select(col("word").as("_w1"), col("bits").as("_b1")), Seq("_w1"), "left")
      .join(bm.select(col("word").as("_w2"), col("bits").as("_b2")), Seq("_w2"), "left")
      .where(
        expr(s"(coalesce(_b1, CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), CAST(_p1 % $BitsPerWord AS INT))) <> 0") &&
        expr(s"(coalesce(_b2, CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), CAST(_p2 % $BitsPerWord AS INT))) <> 0"))
      .drop("_d", "_p1", "_p2", "_w1", "_w2", "_b1", "_b2")
  }

  /** Production variant of [[bloomFiltered]] — same no-false-negative
    * contract (ScaleJoinsSpec asserts filtered-join == plain-join row for
    * row), hash and bitmap transport chosen for per-row speed instead of
    * the audit row's cross-engine md5 portability:
    *
    *   - probes are TWO seeded xxhash64 values (codegen'd, no digest
    *     string, no hex parsing). When both key columns already share a
    *     type the raw value is hashed; otherwise both sides cast to
    *     string so build and probe agree bit-for-bit.
    *   - the bitmap rides as ONE literal Array[Long] (nBits/64 words,
    *     collected once from the small side's word aggregate — the same
    *     bounded metadata-scale collect as the kmeans/PQ codebooks), so
    *     the probe is pure expression work: element_at + mask test per
    *     row, no joins in the filter at all (the md5 variant pays two
    *     broadcast hash joins against the word table).
    *
    * Measured at sf5 (30 M-row probe side, StageProbe xq109): scan+probe
    * 3.21 s (md5) → 1.10 s (this) against a 0.70 s bare 3-column scan
    * floor — 6x less probe work over the scan; full xq109 3.08 → 2.01 s.
    */
  def bloomFilteredFast(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, nBits: Long): DataFrame = {
    require(nBits >= 64, s"nBits must be >= 64, got $nBits")
    val nWords = ((nBits + 63) / 64).toInt
    val n = nWords * 64L // whole words: every position indexes a real word
    val sameType = big.schema(bigKey).dataType == small.schema(smallKey).dataType
    def keyed(df: DataFrame, key: String) =
      if (sameType) col(key) else col(key).cast("string")
    def positions(k: org.apache.spark.sql.Column) =
      (pmod(xxhash64(k), lit(n)), pmod(xxhash64(k, lit(1L)), lit(n)))
    val (bp1, bp2) = positions(keyed(small, smallKey))
    val wordRows = small.select(explode(array(bp1, bp2)).as("_p"))
      .select((col("_p") / 64L).cast("int").as("_w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").as("_m"))
      .groupBy("_w").agg(expr("bit_or(_m)").as("_bits"))
      .collect()
    val words = new Array[Long](nWords)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    val arr = lit(words)
    val (p1, p2) = positions(keyed(big, bigKey))
    def hit(pName: String) =
      (element_at(arr, (col(pName) / 64L).cast("int") + 1)
        .bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($pName % 64 AS INT))")) =!= 0L)
    big.withColumn("_p1", p1).withColumn("_p2", p2)
      .where(hit("_p1") && hit("_p2"))
      .drop("_p1", "_p2")
  }
}
