package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.Cacheable

/** Deterministic sampling for training pipelines — no RNG state, stable
  * under repartition and re-runs, portable across engines (md5 ordering).
  * The md5-bucket fraction-sampling / split predicates live in the query
  * layer (xq18/xq19); this adds per-stratum fixed-size samples.
  */
object Sampling {

  /** k rows per stratum, chosen by md5 order of the id (a deterministic
    * "random" permutation), tie-broken by id. One shuffle on the stratum
    * key; at 100 TB, strata are the natural partition column.
    */
  def stratifiedDeterministic(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Deterministic weighted corpus mix — the source-ratio stage of training
    * data assembly ("keep 50% of src0, 25% of src1, ..."): each doc's keep
    * decision is a pure function of its id (md5 bucket in [0,1) vs the
    * source's fraction), so the mix is RNG-free, repartition-stable and
    * reproducible across engines and re-runs. A narrow filter — no shuffle.
    */
  def weightedMix(df: DataFrame, sourceCol: String, idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val bucket = expr(
      s"CAST(shiftright(graft_md5p60(CAST($idCol AS STRING)), 44) AS DOUBLE) / 65536.0")
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(lit(defaultFraction)) {
      case (acc, (s, f)) => when(col(sourceCol) === s, lit(f)).otherwise(acc)
    }
    df.where(bucket < threshold)
  }

  /** Leakage-free train/test split: random splits leak near-duplicates
    * across the boundary (a test doc's near-twin in train inflates eval —
    * the measured failure behind benchmark contamination findings). The fix:
    * split by NEAR-DUP GROUP, not by document — connected components from
    * [[Dedup.dedupGroups]] give each doc its transitive group, and the
    * md5-bucket split decision is a pure function of the GROUP id, so every
    * member lands on the same side. RNG-free, repartition-stable, and the
    * whole assignment is oracle-checkable (xq63).
    *
    * `trainFraction` is the literal compared against (not derived as
    * 1 − testFraction — the float-literal trap [[graft.operators.Graphs]]
    * documents).
    */
  def leakageFreeSplit(docs: DataFrame, textCol: String, idCol: String,
      trainFraction: Double = 0.9, n: Int = 3): DataFrame = {
    val groups = Dedup.dedupGroups(docs, textCol, idCol, n)
    val bucket = expr(
      "CAST(shiftright(graft_md5p60(CAST(label AS STRING)), 44) AS DOUBLE) / 65536.0")
    groups.select(col("id").as(idCol), col("label").as("group_id"),
      when(bucket < lit(trainFraction), lit("train")).otherwise(lit("test"))
        .as("split"))
  }

  /** Sequence packing: assign docs to fixed-capacity training bins by
    * prefix-sum of their token counts in id order —
    * bin = floor(cumulative_start / capacity).
    *
    * A global `Window.orderBy` would funnel the whole corpus through ONE
    * task (Spark does NOT range-parallelize partition-less windows), so the
    * prefix sum runs as the classic two-pass parallel scan instead:
    *  1. range-partition by id (ids stay globally ordered across partitions),
    *  2. aggregate one total per partition (tiny: #partitions rows) and
    *     prefix-sum those totals into per-partition offsets,
    *  3. cumsum WITHIN each partition in parallel + broadcast-join the
    *     offset.
    * Same output as the sequential scan, every stage distributed; the only
    * single-partition step is the window over the #partitions-row offsets
    * table (metadata scale).
    */
  /** Deterministic global shuffle with explicit positions — the
    * "shuffle the corpus before training" stage: every row gets its rank in
    * (md5(id), id) order as `shuffle_pos` (0-based). The hash order is a
    * fixed pseudorandom permutation, so the shuffle is reproducible across
    * re-runs, engines, and partitionings.
    *
    * A global `row_number()` window would be a single-task funnel; instead
    * the rank is computed with the same two-pass scheme as [[packSequences]]:
    * range-partition by the hash key, count per partition (metadata scale),
    * prefix-sum those counts into offsets, then per-partition row_number +
    * offset — identical output, every stage distributed.
    */
  def shuffleIndex(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val parts = df
      .withColumn("_k", md5(col(idCol).cast("string")))
      .repartitionByRange(nPart, col("_k"), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .trackedCache
    val offsetWin = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_pn"))
      .select(col("_pid"),
        coalesce(sum(col("_pn")).over(offsetWin), lit(0L)).as("_offset"))
    val localWin = Window.partitionBy(col("_pid")).orderBy(col("_k"), col(idCol))
    parts.join(broadcast(offsets), "_pid")
      .withColumn("shuffle_pos",
        col("_offset") + row_number().over(localWin).cast("long") - 1L)
      .drop("_pid", "_offset", "_k")
  }

  /** Exact distributed dense 0-based rank in `order` — the generic form of
    * [[shuffleIndex]]'s two-pass scheme for ARBITRARY sort expressions
    * (including descending): range-partition on the order, count per
    * partition (metadata scale), prefix-sum the counts into offsets,
    * per-partition row_number + offset. No single-partition stage touches
    * row-scale data; `order` must be a total order (add a tie-break column)
    * or ranks within ties are partition-dependent.
    */
  def globalRank(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
      rankCol: String = "rank0"): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val parts = df.repartitionByRange(nPart, order: _*)
      .withColumn("_pid", spark_partition_id())
      .trackedCache
    val offsetWin = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_pn"))
      .select(col("_pid"),
        coalesce(sum(col("_pn")).over(offsetWin), lit(0L)).as("_offset"))
    val localWin = Window.partitionBy(col("_pid")).orderBy(order: _*)
    parts.join(broadcast(offsets), "_pid")
      .withColumn(rankCol,
        col("_offset") + row_number().over(localWin).cast("long") - 1L)
      .drop("_pid", "_offset")
  }

  /** Exact distributed NTILE — curriculum/quantile bucketing (order the
    * corpus by a difficulty signal, cut it into k equal tiles) without the
    * single-task global window `ntile(k) OVER (ORDER BY ...)` compiles to.
    *
    * Global rank comes from the same two-pass range-partitioned prefix sum
    * as [[packSequences]]; the bucket is then the SQL-standard NTILE
    * assignment: with q = N div k and r = N mod k, the first r buckets take
    * q+1 rows and the rest q. (The tempting closed form floor(rank·k/N)
    * is NOT ntile — at N=8, k=5 it deals sizes 2,2,1,2,1 against ntile's
    * 2,2,2,1,1 — so the piecewise definition is spelled out.)
    *
    * Ties are broken by idCol, making the assignment total, deterministic,
    * and repartition-stable. Output: input columns + `bucket` (1-based).
    */
  def ntileExact(df: DataFrame, orderCols: Seq[String], idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val ord = (orderCols :+ idCol).map(col)
    val parts = df.repartitionByRange(nPart, ord: _*)
      .withColumn("_pid", spark_partition_id())
      .trackedCache
    val offsetWin = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val counts = parts.groupBy(col("_pid")).agg(count(lit(1)).as("_pn"))
    val offsets = counts
      .select(col("_pid"),
        coalesce(sum(col("_pn")).over(offsetWin), lit(0L)).as("_offset"))
      .crossJoin(broadcast(counts.agg(sum(col("_pn")).as("_n"))))
    val localWin = Window.partitionBy(col("_pid")).orderBy(ord: _*)
    parts.join(broadcast(offsets), "_pid")
      .withColumn("_rank0",
        col("_offset") + row_number().over(localWin).cast("long") - 1L)
      .withColumn("_q", expr(s"_n div $k"))
      .withColumn("_r", col("_n") % k)
      .withColumn("_cut", (col("_q") + 1L) * col("_r"))
      .withColumn("bucket",
        when(col("_rank0") < col("_cut"), expr("_rank0 div (_q + 1)"))
          .otherwise(col("_r") + expr("(_rank0 - _cut) div _q")) + lit(1L))
      .drop("_pid", "_offset", "_n", "_rank0", "_q", "_r", "_cut")
  }

  def packSequences(df: DataFrame, idCol: String, sizeCol: String,
      capacity: Long): DataFrame =
    prefixSum(df, idCol, sizeCol)
      .select(col(idCol), col(sizeCol),
        floor(col("cum_start").cast("double") / capacity)
          .cast("long").as("bin"))

  /** Global running total of `sizeCol` in `idCol` order — every row gets its
    * exclusive start (`cum_start`) and inclusive end (`cum_end`) position in
    * the concatenated stream. The primitive under [[packSequences]] and
    * [[contextWindows]], computed as the two-pass range-partitioned prefix
    * sum (see the class note above packSequences): range-partition by id,
    * prefix-sum the per-partition totals (metadata scale), per-partition
    * cumsum + broadcast offset. No single-partition stage touches row-scale
    * data.
    */
  def prefixSum(df: DataFrame, idCol: String, sizeCol: String): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    // Persisted so the partition ids seen by the totals pass and the cumsum
    // pass are the same physical assignment (range boundaries come from
    // sampling and are otherwise not guaranteed stable across jobs).
    val parts = df.repartitionByRange(nPart, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .trackedCache
    val offsetWin = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("_pid"))
      .agg(sum(col(sizeCol)).as("_psum"))
      .select(col("_pid"),
        coalesce(sum(col("_psum")).over(offsetWin), lit(0L)).as("_offset"))
    val localWin = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.join(broadcast(offsets), "_pid")
      .withColumn("cum_end", col("_offset") + sum(col(sizeCol)).over(localWin))
      .withColumn("cum_start", col("cum_end") - col(sizeCol))
      .drop("_pid", "_offset")
  }

  /** Fixed-size context windows over the GLOBAL concatenated token stream —
    * the GPT-style pretraining prep where documents are concatenated in id
    * order and the stream is cut every `windowSize` tokens, windows crossing
    * document boundaries (contrast [[packSequences]], which never splits a
    * document). Output: one row per (doc, window) overlap with the token
    * count the doc contributes to that window; Σ n_tokens per doc = the
    * doc's size, Σ n_tokens per window = windowSize (except the last).
    *
    * Built on [[prefixSum]]: a doc spanning [cum_start, cum_end) explodes
    * into its ceil(span/windowSize) <= 2 + size/windowSize windows — a
    * narrow generate, no further shuffle. Zero-size docs contribute no row.
    */
  def contextWindows(df: DataFrame, idCol: String, sizeCol: String,
      windowSize: Long): DataFrame = {
    require(windowSize >= 1, s"need windowSize >= 1, got $windowSize")
    prefixSum(df, idCol, sizeCol)
      .where(col(sizeCol) > 0L)
      .select(col(idCol), col("cum_start"), col("cum_end"),
        explode(sequence(
          expr(s"cum_start div $windowSize"),
          expr(s"(cum_end - 1) div $windowSize"))).as("window_id"))
      .select(col(idCol), col("window_id"),
        (least(col("cum_end"), (col("window_id") + 1L) * windowSize) -
          greatest(col("cum_start"), col("window_id") * windowSize))
          .as("n_tokens"))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES): row i
    * gets key = -ln(u_i)/w_i with u_i uniform in (0,1); the m SMALLEST keys
    * are a weighted sample without replacement — one scan + a top-m, no
    * sequential reservoir. Here u_i derives from md5(id) (deterministic,
    * repartition-stable, engine-portable) and the key is quantized to 1e-9
    * with an id tie-break so selection is total-ordered and identical
    * cross-engine despite ln()'s engine ULP. Weights must be > 0.
    *
    * The quality-weighted subsample stage of corpus curation ("sample 10%
    * favoring high-quality docs") — weights compose with the quality
    * scores (xq11/xq48/xq49) or soft-dedup weights (xq67).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      m: Int): DataFrame = {
    // u in (0,1): 12 hex chars of md5 -> [0, 2^48) scaled, +1 ulp-ish
    // offset so u > 0 and ln is finite.
    val u = (expr(s"CAST(shiftright(graft_md5p60(CAST($idCol AS STRING)), 12) AS DOUBLE)") +
      lit(0.5d)) / lit(281474976710656.0d) // 2^48
    val key = floor((-log(u) / col(weightCol).cast("double")) * lit(1e9d) + lit(0.5d))
      .cast("long")
    // Enforce the weight contract instead of silently skewing the sample:
    // a negative weight would yield a negative key that always wins, a zero
    // weight a saturated key that never does. raise_error makes a contract
    // violation loud at the first offending row.
    df.withColumn("es_key",
        when(col(weightCol).cast("double") > 0d, key)
          .otherwise(expr(
            s"raise_error(concat('weightedSample: non-positive weight in $weightCol: ', " +
              s"CAST($weightCol AS STRING)))").cast("long")))
      .orderBy(col("es_key"), col(idCol))
      .limit(m)
  }

  /** Temperature-based stratum resampling — the multilingual/source-mix
    * upsampling rule (mBERT/XLM-R style): stratum i with n_i docs gets a
    * share proportional to n_i^alpha, so alpha < 1 flattens the distribution
    * toward low-resource strata (alpha = 1 is proportional, alpha = 0
    * uniform). Each stratum then contributes its `target` docs chosen in
    * (md5(id), id) order — deterministic, RNG-free, repartition-stable.
    *
    * Targets are computed in EXACT integer arithmetic so the assignment is
    * reproducible cross-engine: s_i = floor(n_i^alpha · 10^6) (for
    * alpha = 0.5 that is IEEE sqrt — correctly rounded in every engine),
    * target_i = (total · s_i) div (Σ s_j). Σ target_i <= total (floor); the
    * remainder is deliberately NOT redistributed — determinism over hitting
    * the total exactly. One count shuffle + a broadcast of #strata rows +
    * one stratum-keyed window pass.
    */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
      total: Long, alpha: Double = 0.5): DataFrame = {
    require(total >= 0, s"need total >= 0, got $total")
    val nPow =
      if (alpha == 0.5) sqrt(col("_n").cast("double"))
      else pow(col("_n").cast("double"), lit(alpha))
    val scaled = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_s", floor(nPow * lit(1e6d)).cast("long"))
    // The product runs in DECIMAL(38,0): with large strata (n_i ~ 1e8 →
    // _s ~ 1e10) and a large total, `total * _s` silently wraps in Long
    // (non-ANSI) while DuckDB promotes to HUGEINT — a scale-dependent
    // cross-engine divergence. DECIMAL(38,0) holds any realistic
    // total·_s (< 1e38) exactly; the quotient is cast back to long.
    val targets = scaled
      .crossJoin(broadcast(scaled.agg(sum(col("_s")).as("_stot"))))
      .select(col(strataCol),
        expr(s"CAST((CAST($total AS DECIMAL(38,0)) * _s) div _stot AS BIGINT)")
          .as("target"))
    val rk = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(targets), strataCol)
      .withColumn("_rk", row_number().over(rk).cast("long"))
      .where(col("_rk") <= col("target"))
      .drop("_rk")
  }

  /** Token-budget mix planning — the allocation step BEFORE any mixing
    * operator runs: given a total training-token budget, per-source target
    * weights, and a repeat cap (max epochs per source), decide how many
    * tokens each source contributes. Epoch-capped WATERFILL: each round
    * splits the unspent budget over the still-uncapped sources by weight
    * and clamps at capacity = available × maxEpochs; surplus from clamped
    * sources re-flows next round (the standard data-mixing posture: a
    * small high-weight source caps out at its repeat limit and the spare
    * budget waterfalls to the rest).
    *
    * EVERYTHING is integer arithmetic (token counts, integer weights,
    * floor division), so the plan is order-free and engine-exact; the only
    * IEEE op is the reported epochs ratio (one divide on two exact longs).
    * Up to `rounds` redistribution rounds run unconditionally (a stable
    * round is a no-op: zero surplus ⇒ zero shares), which keeps the DuckDB
    * oracle an unrolled-CTE mirror with no convergence test. Per-round
    * floor-division remainders (< Σweights tokens) stay unspent —
    * real pipelines don't chase sub-mille token dust.
    *
    * Scale shape: ONE corpus aggregate keyed by source; the waterfill runs
    * on the driver over the per-source table (bounded by source count —
    * metadata, same posture as k-means centroids). Output one row per
    * source: (source, available_tokens, weight, cap_tokens,
    * allocated_tokens, epochs, capped).
    */
  def tokenBudgetMix(docs: DataFrame, textCol: String, srcCol: String,
      budget: Long, maxEpochs: Long, weights: Map[String, Long],
      defaultWeight: Long = 1L, rounds: Int = 20): DataFrame = {
    require(budget >= 0 && maxEpochs > 0 && rounds > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    // coalesce twice: size(split(null)) is null per row, and sum over an
    // all-null source is null — both must read as "zero tokens available"
    // (cap 0, capped, 0.0 epochs), not NaN/NPE downstream.
    val avail = docs
      .groupBy(col(srcCol).as("source"))
      .agg(coalesce(sum(coalesce(
        size(split(col(textCol), " ")).cast("long"), lit(0L))), lit(0L))
        .as("available_tokens"))
      .as[(String, Long)].collect().sortBy(_._1)
    val w = avail.map { case (s, _) => weights.getOrElse(s, defaultWeight) }
    // Saturating cap: a * maxEpochs overflowing Long only happens past
    // 9.2e18 tokens, where "capped at Long.MaxValue" and "uncapped" are
    // indistinguishable (the budget, a Long, can never reach the cap).
    val cap = avail.map { case (_, a) =>
      val c = BigInt(a) * maxEpochs
      if (c > Long.MaxValue) Long.MaxValue else c.toLong
    }
    val alloc = Array.fill(avail.length)(0L)
    for (_ <- 0 until rounds) {
      val spent = alloc.sum
      val sumWUnc = alloc.indices
        .collect { case i if alloc(i) < cap(i) => w(i) }.sum
      if (sumWUnc > 0) {
        val surplus = budget - spent
        // surplus * w(i) can overflow Long for large budgets × weights;
        // the DuckDB oracle promotes to HUGEINT here, so mirror it with
        // BigInt (the quotient is <= surplus, so the result fits a Long).
        for (i <- alloc.indices if alloc(i) < cap(i))
          alloc(i) = math.min(
            alloc(i) + (BigInt(surplus) * w(i) / sumWUnc).toLong, cap(i))
      }
    }
    avail.indices.map { i =>
      val (s, a) = avail(i)
      // Zero-token source (empty texts): cap = 0 so it allocates nothing
      // and reads as capped; report 0.0 epochs instead of 0/0 = NaN.
      val epochs = if (a == 0L) 0.0 else alloc(i).toDouble / a.toDouble
      (s, a, w(i), cap(i), alloc(i), epochs, alloc(i) >= cap(i))
    }.toDF("source", "available_tokens", "weight", "cap_tokens",
      "allocated_tokens", "epochs", "capped")
  }
}
