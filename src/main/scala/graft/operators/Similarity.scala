package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths (north-star extension, SURVEY.md §7.2 step 6):
  *  - [[bruteForceTopK]]: exact baseline — a single scan scoring every
  *    vector against the (broadcast) query batch; correct at any scale but
  *    O(N·Q). Use when Q is small or as the verification oracle.
  *  - [[lshTopK]]: sign-random-projection buckets (an IVF-style coarse
  *    quantizer with 2^planes cells); each query probes only its own cell
  *    plus the `probes` nearest cells (Hamming-adjacent), so the scored
  *    fraction is ~ (1+probes)/2^planes of the corpus. The corpus can be
  *    pre-partitioned (bucketed) by cell id so a probe is a partition-local
  *    lookup — no full scan, no full shuffle at 100 TB.
  */
object Similarity {

  /** Shared rank tail: bounded per-query top-k via [[TopKAggregator]]
    * (map-side partial aggregation — the exchange carries at most
    * k·partitions candidates per query), then posexplode to ranks.
    * Expects a `cosine` column; requires integral id columns (cast to
    * long); null cosines (zero vectors) are excluded — they have no
    * defined similarity. Ties break by id ascending, identically to a
    * window orderBy (cosine desc, id asc). */
  private def rankTopK(scored: DataFrame, queryIdCol: String, idCol: String,
                       k: Int): DataFrame = {
    import scored.sparkSession.implicits._
    scored
      // null = zero vector, NaN = NaN components: neither has a defined
      // similarity, and NaN would break the aggregator's total order
      .filter(col("cosine").isNotNull && !isnan(col("cosine")))
      .select(col(queryIdCol).cast("long"), col("cosine"), col(idCol).cast("long"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .toDF(queryIdCol, "topk")
      .select(col(queryIdCol), posexplode(col("topk")).as(Seq("__pos", "__item")))
      .select(col(queryIdCol), col("__item._2").as(idCol),
        round(col("__item._1"), 6).as("cosine"),
        (col("__pos") + 1).cast("int").as("rank"))
  }

  /** Query batch with its norm precomputed, vector aliased for the join.
    * Fails fast on column collisions that would otherwise surface as an
    * ambiguous-reference error deep inside the plan. */
  private def withQueryNorm(queries: DataFrame, corpus: DataFrame,
                            queryIdCol: String, vecCol: String): DataFrame = {
    val internal = Set(queryIdCol, "__qvec", "__qn", "__cn", "__cell", "cosine")
    val clashes = corpus.columns.filter(internal.contains)
    require(clashes.isEmpty,
      s"corpus columns ${clashes.mkString(", ")} collide with the query-side " +
        s"projection; rename them (queryIdCol must not appear in the corpus)")
    queries.select(col(queryIdCol), col(vecCol).as("__qvec"),
      V.norm(col(vecCol)).as("__qn"))
  }

  /** Exact top-k neighbors for each query vector. `queries` is expected to
    * be small (it is broadcast); the corpus is never shuffled for scoring —
    * and the rank step is a [[TopKAggregator]] with map-side partial
    * aggregation, so the exchange carries at most k·partitions candidates
    * per query instead of every scored row (a window-rank would sort the
    * full scored relation). Requires integral id columns (cast to long).
    * Zero-vector corpus rows (null cosine) are excluded — they have no
    * defined similarity. Returns (queryIdCol, idCol, cosine, rank); ties
    * break by id ascending, identically to a window orderBy. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, queryIdCol: String,
                     k: Int): DataFrame = {
    val q = withQueryNorm(queries, corpus, queryIdCol, vecCol)
    val scored = corpus
      .withColumn("__cn", V.norm(col(vecCol)))
      .join(broadcast(q))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    rankTopK(scored, queryIdCol, idCol, k)
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nCells` cells; each query probes only the
    * `nProbe` nearest cells, so the scored fraction is ~nProbe/nCells of
    * the corpus. The scale path for 100 TB: cells are computed once
    * scan-side (and the corpus can be physically partitioned/bucketed by
    * cell id, making a probe a partition-local read); centroids are tiny
    * and broadcast. Exact cosine scoring within probed cells + the bounded
    * [[TopKAggregator]] — recall < 1 by construction, scores never
    * approximate. Deterministic for a fixed seed. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, queryIdCol: String,
              k: Int, nCells: Int = 16, nProbe: Int = 4,
              seed: Long = 42L, fitSampleFraction: Double = 1.0): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val corpusV = corpus.withColumn("__fv", array_to_vector(col(vecCol)))
    // A coarse quantizer needs rough cells, not convergence: few iterations,
    // and at real scale fit on a sample via `fitSampleFraction` (cell
    // assignment below always covers the full corpus).
    val fitOn =
      if (fitSampleFraction >= 1.0) corpusV
      else corpusV.sample(withReplacement = false, fitSampleFraction, seed)
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("__fv").setPredictionCol("__cell")
      .fit(fitOn)
    val assigned = model.transform(corpusV)
      .select(col(idCol), col(vecCol), col("__cell"),
        V.norm(col(vecCol)).as("__cn"))

    // nProbe nearest centroids per query: rank by ||c||² − 2·q·c (the
    // query-independent ||q||² term cannot change the order)
    val centroids = model.clusterCenters.map(_.toArray)
    val probeStructs = centroids.zipWithIndex.map { case (c, i) =>
      val cNorm2 = c.map(x => x * x).sum
      struct((lit(cNorm2) - lit(2.0) * V.dot(col("__qvec"), lit(c))).as("d"),
        lit(i).as("cell"))
    }
    val q = withQueryNorm(queries, corpus, queryIdCol, vecCol)
      .withColumn("__probe",
        slice(array_sort(array(probeStructs.toIndexedSeq: _*)), 1, nProbe))
      .withColumn("__cell", explode(col("__probe.cell")))
      .drop("__probe")

    val scored = assigned
      .join(broadcast(q), Seq("__cell"))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    rankTopK(scored, queryIdCol, idCol, k)
  }

  /** LSH-bucketed approximate top-k: corpus and queries are assigned
    * sign-projection cells; queries probe their own cell and every cell at
    * Hamming distance 1 (`probes` ≤ nPlanes extra cells). Same output shape
    * as [[bruteForceTopK]]; recall < 1 by construction. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, queryIdCol: String,
              k: Int, nPlanes: Int = 8, dim: Int = 64,
              probes: Int = 8): DataFrame = {
    val planes = V.hyperplanes(nPlanes, dim)
    val c = corpus
      .withColumn("__cell", V.signBucket(col(vecCol), planes))
      .withColumn("__cn", V.norm(col(vecCol)))
    // query probes: own cell + cells with one flipped bit
    val probeCells = array(
      (lit(0L) +: (0 until math.min(probes, nPlanes)).map(i => lit(1L << i))): _*)
    val q = withQueryNorm(queries, corpus, queryIdCol, vecCol)
      .withColumn("__qcell", V.signBucket(col("__qvec"), planes))
      .withColumn("__cell", explode(transform(probeCells,
        flip => col("__qcell").bitwiseXOR(flip))))
      .drop("__qcell")
    val scored = c
      .join(broadcast(q), Seq("__cell"))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    rankTopK(scored, queryIdCol, idCol, k)
  }
}
