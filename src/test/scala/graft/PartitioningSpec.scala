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

  test("bucketed tables join without any shuffle exchange (co-located SMJ)") {
    val li = sources.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = sources.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange" // bucket layout satisfies both sides
      joined.count() shouldBe li.count()
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
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
