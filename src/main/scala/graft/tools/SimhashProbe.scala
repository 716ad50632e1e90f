package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.{HashFunctions => H, TextFunctions => T}

/** Dev probe: unigram-jaccard distribution of the pairs simHash emits at a
  * given SF — calibrates the precision floor `simhash_pairs` asserts.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sim = Dedup.simHash(docs, "text", "doc_id", chunks = 4, maxHamming = 3)
    val toksets = docs.select(col("doc_id"),
      H.wordShingles(T.tokens(lower(col("text"))), 1).as("__ts"))
    val simJ = sim
      .join(toksets.select(col("doc_id").as("id_a"), col("__ts").as("__ta")), Seq("id_a"))
      .join(toksets.select(col("doc_id").as("id_b"), col("__ts").as("__tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("hamming"),
        H.jaccard(col("__ta"), col("__tb")).as("j"))
    simJ.orderBy("j").show(30, truncate = false)
    simJ.agg(count(lit(1)), min(col("j")), expr("percentile(j, 0.1)"),
      expr("percentile(j, 0.5)")).show(truncate = false)
    spark.stop()
  }
}
