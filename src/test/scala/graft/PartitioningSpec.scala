package graft

import org.apache.spark.sql.functions._

/** Partition-layout behaviors that matter at cluster scale: partitioned
  * writes and partition pruning at the scan. */
class PartitioningSpec extends SparkSpec {

  test("partitionBy write + partition pruning: the filter becomes a " +
    "PartitionFilter, non-matching partitions are never read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    sources.Tables.load(spark, sf, "lineitem")
      .write.partitionBy("l_returnflag").parquet(s"$tmp/li")

    val pruned = spark.read.parquet(s"$tmp/li")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    plan should include("PartitionFilters")
    plan should include("l_returnflag")

    // pruning preserves semantics
    val expected = sources.Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "R").count()
    pruned.count() shouldBe expected
  }

  test("repartition by key co-locates rows (one partition per key value)") {
    val df = sources.Tables.load(spark, sf, "lineitem")
      .repartition(4, col("l_returnflag"))
    val perPartition = df
      .groupBy(spark_partition_id().as("pid"))
      .agg(countDistinct(col("l_returnflag")).as("nkeys"),
        count(lit(1)).as("n"))
      .collect()
    // every key's rows land wholly in one partition (keys may share one)
    perPartition.map(_.getLong(2)).sum shouldBe df.count()
    val totalKeys = sources.Tables.load(spark, sf, "lineitem")
      .select("l_returnflag").distinct().count()
    perPartition.map(_.getLong(1)).sum should be >= totalKeys
  }
}
