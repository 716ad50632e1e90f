package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (11L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (12L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (13L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  private val queries = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("query_id", "embedding")

  test("k < 1 and corpus column collisions fail fast with clear messages") {
    intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(corpus, queries,
        "embedding", "vec_id", "query_id", k = 0).collect()
    }
    val clashing = corpus.withColumnRenamed("vec_id", "query_id")
    val ex = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(clashing, queries,
        "embedding", "query_id", "query_id", k = 1)
    }
    ex.getMessage should include("collide")
  }

  test("brute-force top-k ranks by cosine with deterministic tie-break") {
    val out = Similarity.bruteForceTopK(corpus, queries,
      "embedding", "vec_id", "query_id", k = 3).orderBy("rank").collect()
    out.map(_.getLong(1)) shouldBe Array(10L, 11L, 12L)
    out.map(_.getInt(3)) shouldBe Array(1, 2, 3)
    out.head.getDouble(2) shouldBe 1.0 +- 1e-9
  }

  test("ivf top-k: exact scores on probed cells; full recall when probing " +
    "all cells") {
    val brute = Similarity.bruteForceTopK(corpus, queries,
      "embedding", "vec_id", "query_id", k = 4)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    // probing every cell must reproduce the exact brute-force answer
    val full = Similarity.ivfTopK(corpus, queries,
      "embedding", "vec_id", "query_id", k = 4, nCells = 2, nProbe = 2)
      .select("vec_id", "cosine").as[(Long, Double)].collect()
    full.toMap shouldBe brute
    // probing 1 of 2 cells: subset of the corpus, still exactly scored
    val partial = Similarity.ivfTopK(corpus, queries,
      "embedding", "vec_id", "query_id", k = 4, nCells = 2, nProbe = 1)
      .select("vec_id", "cosine").as[(Long, Double)].collect()
    partial should not be empty
    partial.foreach { case (id, cos) => cos shouldBe brute(id) +- 1e-9 }
  }

  test("ivf recall on the embeddings fixture (16 cells, 4 probes)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val corpus = emb.filter($"vec_id" >= 5)
    val brute = Similarity.bruteForceTopK(corpus, qs,
      "embedding", "vec_id", "query_id", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(corpus, qs,
      "embedding", "vec_id", "query_id", 10, nCells = 16, nProbe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    recall should be >= 0.3 // probing 1/4 of cells; deterministic for seed 42
  }

  test("lsh top-k returns exactly-scored cosines for whatever it retrieves " +
    "(approximation loses candidates, never mis-scores them)") {
    val brute = Similarity.bruteForceTopK(corpus, queries,
      "embedding", "vec_id", "query_id", k = 4)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(corpus, queries,
      "embedding", "vec_id", "query_id", k = 4, nPlanes = 4, dim = 4)
      .select("vec_id", "cosine").as[(Long, Double)].collect()
    lsh should not be empty
    lsh.foreach { case (id, cos) => cos shouldBe brute(id) +- 1e-9 }
    // the query's own-direction nearest neighbor shares all sign buckets
    lsh.map(_._1) should contain(10L)
  }
}
