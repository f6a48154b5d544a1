package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** Runtime features a 100-TB deployment leans on, demonstrated end-to-end
  * on the fixture:
  *
  *  - RocksDB state store: streaming state off-heap on executor disk;
  *    results must equal the default (HDFS-backed in-memory) backend's.
  *  - Runtime Bloom-filter join pruning: a selective dim-side filter
  *    becomes a `might_contain` row filter on the fact scan, pruning
  *    shuffle input before the join.
  *  - Dynamic partition pruning: a dim-side filter prunes fact PARTITIONS
  *    at runtime through the join key.
  *
  * Each test asserts both the plan artifact (the feature actually engaged)
  * and result equality with the feature off — tuning must never change
  * answers. */
class ScaleFeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def withConfs[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("windowed streaming agg on RocksDB state store matches the default backend") {
    val expected = spark.table {
      val q = StreamingOps.windowedCounts(StreamingOps.readEventsStream(spark, dir))
        .writeStream.outputMode("append").format("memory").queryName("win_default").start()
      try q.processAllAvailable() finally q.stop()
      "win_default"
    }.collect().map(_.toString).sorted

    val got = withConfs("spark.sql.streaming.stateStore.providerClass" ->
        StreamingOps.RocksDBProviderClass) {
      val q = StreamingOps.windowedCounts(StreamingOps.readEventsStream(spark, dir))
        .writeStream.outputMode("append").format("memory").queryName("win_rocks").start()
      try {
        q.processAllAvailable()
        // the provider actually engaged: RocksDB custom metrics are present
        val metrics = q.lastProgress.stateOperators
        assert(metrics.nonEmpty)
        assert(metrics(0).customMetrics.keySet.toString.contains("rocksdb"),
          s"no rocksdb metrics in ${metrics(0).customMetrics}")
      } finally q.stop()
      spark.table("win_rocks").collect().map(_.toString).sorted
    }
    assert(got.sameElements(expected))
  }

  test("runtime Bloom-filter pruning engages on a selective dim filter and preserves results") {
    val li = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part")
    def q = li.join(part.filter(col("p_brand") === "Brand#13"),
        li("l_partkey") === part("p_partkey"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
    val plain = q.collect().toSeq
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val pruned = q
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), s"bloom filter not injected:\n$plan")
      assert(pruned.collect().toSeq == plain)
    }
  }

  test("AQE skew join splits the hot key's partition and preserves results") {
    import spark.implicits._
    // 90% of rows share key 0 — one shuffle partition dwarfs the rest
    val skewed = (1 to 200000)
      .map(i => (if (i % 10 == 0) (i % 50).toLong else 0L, i.toLong))
      .toDF("k", "v")
    val dim = (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "label")
    // sum(v) keeps the distinct-valued v column in the shuffle, so the hot
    // partition stays large after compression (an all-constant column
    // would compress below any skew threshold)
    val expected = skewed.groupBy("k").agg(sum("v").as("s"))
      .as[(Long, Long)].collect().toMap
      .map { case (k, s) => s"dim_$k" -> s }
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // grouping by label (not the join key) forces an exchange after the
      // join, so AQE is free to split the skewed partition — grouping by
      // the join key would pin the join's output partitioning and
      // (correctly) suppress the optimization
      val joined = skewed.join(dim, Seq("k"))
        .groupBy("label").agg(sum("v").as("n"))
      val rows = joined.collect()
      // AQE final plan must carry the skew-split marker
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"skew join not engaged:\n$plan")
      assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == expected)
    }
  }

  test("clustered file layout prunes row groups a scattered layout reads in full") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val li = Tables.load(spark, dir, "lineitem")
    val key = li.select("l_partkey").head().getLong(0)
    val clustered = "target/scale-features/li_clustered"
    val scattered = "target/scale-features/li_scattered"
    // same data, tiny row groups; one layout range-clusters the filter key
    // (sorted min/max stats -> parquet skips non-matching row groups), the
    // other scatters it so every row group's [min,max] spans the key
    li.repartitionByRange(8, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.mode("overwrite").option("parquet.block.size", 16 * 1024).parquet(clustered)
    li.repartition(8)
      .write.mode("overwrite").option("parquet.block.size", 16 * 1024).parquet(scattered)
    def scanRows(path: String): (Long, Long) = {
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val q = spark.read.parquet(path).filter(col("l_partkey") === key)
      val n = q.collect().length.toLong // executes THIS QueryExecution
      val plan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scanned = plan.collectLeaves().collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
      (n, scanned)
    }
    val (nClustered, scannedClustered) = scanRows(clustered)
    val (nScattered, scannedScattered) = scanRows(scattered)
    assert(nClustered == nScattered && nClustered > 0)
    assert(scannedClustered * 2 < scannedScattered,
      s"clustered layout scanned $scannedClustered rows vs scattered $scannedScattered — no pruning")
  }

  test("dynamic partition pruning engages through the join against a partitioned fact") {
    val base = "target/scale-features/orders_by_status"
    Tables.load(spark, dir, "orders").write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(base)
    val fact = spark.read.parquet(base)
    // DPP requires a SELECTIVE predicate on the dim side (IsNotNull alone
    // doesn't count), and the filter must survive optimization — a
    // LocalRelation would constant-fold it away, so the dim is file-backed
    val dimPath = "target/scale-features/status_dim"
    spark.createDataFrame(Seq(("F", "finished"), ("O", "open"), ("P", "pending")))
      .toDF("status", "label").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("label") === "finished")
    def q = fact.join(dim, fact("o_orderstatus") === dim("status"))
      .agg(count(lit(1)).as("n"))
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10") {
      val pruned = q
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"dynamic partition pruning not injected:\n$plan")
      val expected = fact.filter(col("o_orderstatus") === "F").count()
      assert(pruned.collect()(0).getLong(0) == expected)
    }
  }
}
