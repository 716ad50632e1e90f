package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions => H, TextFunctions => T}
/** Temporary exploration main — removed before round end. */
object Scratch {
  def mat(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
  def time(name: String)(df: => DataFrame): Unit = {
    mat(df)
    val t0 = System.nanoTime(); mat(df)
    println(f"TIME $name ${(System.nanoTime()-t0)/1e9}%.2f s")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("native expr")(docs.select(col("doc_id"), H.wordShingles(T.tokens(lower(col("text"))), 3).as("s")))
    time("HOF")(docs.select(col("doc_id"), H.wordShinglesHof(T.tokens(lower(col("text"))), 3).as("s")))
    val v1 = docs.select(col("doc_id"), H.wordShingles(T.tokens(lower(col("text"))), 3).as("s"))
    val v2 = docs.select(col("doc_id"), H.wordShinglesHof(T.tokens(lower(col("text"))), 3).as("s"))
    println("DIFF=" + (v1.exceptAll(v2).count() + v2.exceptAll(v1).count()))
    for (q <- Seq("ngram_pairs", "minhash_pairs"))
      time(q)(Queries.queries(q)(spark, dir))
    spark.stop()
  }
}
