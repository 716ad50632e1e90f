package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump one query's formatted plan (PlanDump for a subset). */
object PlanDumpOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_PLAN_COUNT=1 dumps the plan the bench's default count()
    // action actually executes — the honesty-audit view: Catalyst prunes
    // computed columns a count never reads, so an operator can vanish
    // from this plan while being the whole point of the query.
    val asCount = sys.env.get("SPARK_GRAFT_PLAN_COUNT").contains("1")
    args.foreach { name =>
      println(s"##PLAN $name")
      val df = Queries.queries(name)(spark, "/root/testdata/sf0.01")
      val shown = if (asCount) df.groupBy().count() else df
      println(shown.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
