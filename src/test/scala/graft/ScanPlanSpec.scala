package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Plan-level evidence for the scan/shuffle claims SCALING.md makes:
  * predicate pushdown and column pruning reach the parquet scan, partition
  * filters prune a day-partitioned store, and AQE's skew-join split
  * actually fires on a planted hot key (not merely "AQE would handle it").
  */
class ScanPlanSpec extends SparkSpec {
  import spark.implicits._

  test("rq01: filter is pushed to the parquet scan and columns are pruned") {
    val plan = SparkEntry.queries("rq01_filter_project")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("l_shipdate"),
      s"shipdate predicate must reach the scan:\n$plan")
    // ReadSchema carries only the referenced columns, not all 11.
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
      .forall(readSchema.contains), readSchema)
    assert(!readSchema.contains("l_extendedprice") &&
      !readSchema.contains("l_comment"), s"unpruned scan: $readSchema")
  }

  test("multimodal codec paths prune the documents scan to id + text") {
    // the codec pipelines must not drag lang/source/n_chars through the
    // encode/decode mapPartitions boundary — pruning is what keeps the
    // 100 TB scan reading only the referenced bytes
    Seq(
      graft.operators.Multimodal.imageAssets(Tables.documents(spark, sf)),
      graft.operators.Multimodal.audioAssets(Tables.documents(spark, sf)),
      graft.operators.Multimodal.videoAssets(Tables.documents(spark, sf))
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
      assert(readSchema.contains("doc_id") && readSchema.contains("text"),
        readSchema)
      assert(!readSchema.contains("lang") && !readSchema.contains("source") &&
        !readSchema.contains("n_chars"), s"unpruned codec scan: $readSchema")
    }
  }

  test("day point query prunes partitions of the day-partitioned store") {
    val dir = Files.createTempDirectory("graft-prune").resolve("store").toString
    (0L to 4L).flatMap(day => Seq((day, "total", 10L, 0L)))
      .toDF("day", "counter", "n", "growth")
      .write.partitionBy("day").parquet(dir)
    val q = spark.read.parquet(dir).where(col("day") === 2L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"day filter must prune partitions:\n$plan")
    // Physically reads one of the five day partitions.
    assert(q.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .exists(_.contains("day")), plan)
    assert(q.count() == 1)
  }

  test("IVF serve path: cluster id as partition column prunes the vector scan") {
    // SCALING.md's claim for ANN at 100 TB: the trained cluster assignment
    // becomes a partition column at ingest, and a query probes ONLY its own
    // cluster's files. Fit -> assign -> partitioned write -> pruned read.
    val emb = Tables.embeddings(spark, sf)
    val cents = graft.operators.Similarity.kmeansFit(
        emb, "embedding", "vec_id", k = 4, iters = 1)
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid_val")))),
        x => x.getField("centroid_val")).as("cvec"))
    val assigned = graft.operators.Similarity.assignToCentroids(
      emb, "embedding", "vec_id", cents)
    val dir = Files.createTempDirectory("graft-ivf").resolve("vectors").toString
    emb.join(assigned.select("vec_id", "cluster"), "vec_id")
      .write.partitionBy("cluster").parquet(dir)
    val store = spark.read.parquet(dir)
    val qCluster = assigned.where(col("vec_id") === 0L)
      .select("cluster").head().getLong(0)
    val probe = store.where(col("cluster") === qCluster)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"cluster filter must prune partitions:\n$plan")
    // the probe touches only its own cluster's rows, never the full corpus
    val probed = probe.count()
    assert(probed > 0 && probed < emb.count(), s"probed $probed")
  }

  test("AQE splits a planted skewed join partition") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // Thresholds low enough that the hot key's partition counts as skewed
      // at spec scale; broadcast off so the join must shuffle. 80% of the
      // fact rows share one key, and the payloads survive the join (an
      // aggregate over them) so partition bytes reflect the skew.
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val hot = spark.range(200000)
        .select(when(col("id") % 5 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
          md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(300000).select(col("id").as("k"),
        md5(concat(lit("d"), col("id").cast("string"))).as("attr"))
      val joined = hot.join(dim, "k")
        .agg(count(lit(1)), max(col("payload")), max(col("attr")))
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
        s"expected AQE skew-split markers in the final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
