package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.DataSources

/** Round-trips through the lake formats + partitioned-write pruning. */
class DataSourcesSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey").collect().toSeq

  test("csv, json and orc round-trip the orders table") {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val expected = canon(orders)
    for (fmt <- Seq("csv", "json", "orc")) {
      val path = s"target/ds-roundtrip-$fmt"
      DataSources.write(orders, fmt, path)
      val back = DataSources.read(spark, fmt, path,
        schema = Some(orders.schema))
      assert(canon(back) == expected, s"round-trip mismatch for $fmt")
    }
  }

  test("partitioned write prunes directories on read") {
    val orders = Tables.load(spark, dir, "orders")
    val path = "target/ds-partitioned"
    DataSources.write(orders, "parquet", path, partitionBy = Seq("o_orderstatus"))
    val pruned = DataSources.read(spark, "parquet", path)
      .filter(col("o_orderstatus") === "O")
    // partition filter must reach the file index, not a post-scan filter
    val explain = pruned.queryExecution.executedPlan.toString
    assert(explain.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"partition pruning missing:\n$explain")
    val direct = orders.filter(col("o_orderstatus") === "O").count()
    assert(pruned.count() == direct)
  }
}
