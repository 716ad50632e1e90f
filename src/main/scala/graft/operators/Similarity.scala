package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * ambiguous-reference error deep inside the plan. `allowed` names are
    * corpus columns this code path intends to carry (e.g. a bucketed
    * corpus's precomputed `__cell`/`__cn`). */
  private def withQueryNorm(queries: DataFrame, corpusCols: Seq[String],
                            queryIdCol: String, vecCol: String,
                            allowed: Set[String] = Set.empty): DataFrame = {
    val internal = Set(queryIdCol, "__qvec", "__qn", "__cn", "__cell", "cosine") -- allowed
    val clashes = corpusCols.filter(internal.contains)
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
    val q = withQueryNorm(queries, corpus.columns, queryIdCol, vecCol)
    val scored = corpus
      .withColumn("__cn", V.norm(col(vecCol)))
      .join(broadcast(q))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    rankTopK(scored, queryIdCol, idCol, k)
  }

  // ------------------------------------------------------------------- IVF

  /** Per-row array of (distance-rank key, cell) structs against fixed
    * centroids: rank by ||c||² − 2·v·c (the row-independent ||v||² term
    * cannot change the order); ties break on the cell id (second struct
    * field). One compiled pass of `nCells` native dot products per row. */
  private def cellDistStructs(vec: org.apache.spark.sql.Column,
                              centroids: Array[Array[Double]]) =
    array(centroids.zipWithIndex.map { case (c, i) =>
      val cNorm2 = c.map(x => x * x).sum
      struct((lit(cNorm2) - lit(2.0) * V.dot(vec, lit(c))).as("d"),
        lit(i).as("cell"))
    }.toIndexedSeq: _*)

  /** Nearest-centroid cell id for a corpus row (the quantizer assignment):
    * the native fused argmin ([[graft.functions.NearestCellExpr]] — zero
    * per-row allocation, bit-identical distances and tie rule to the
    * [[cellDistStructs]] ranking the query side still uses, so corpus
    * assignment and probe ranking stay mutually consistent). */
  private[graft] def nearestCell(vec: org.apache.spark.sql.Column,
                                 centroids: Array[Array[Double]]) =
    graft.functions.VectorExpressions.nearestCell(vec, centroids)

  /** (idCol, vecCol, __nrm, __unit) with zero vectors EXCLUDED (they have
    * no direction, hence no defined cosine). `__unit` is the L2-normalized
    * DIRECTION — the cosine-compatible quantizer geometry: cosine is
    * magnitude-blind, so clustering directions instead of raw vectors
    * keeps the cell metric aligned with the similarity being searched.
    * Same-direction vectors whose lengths differ by a power of two
    * normalize to the IDENTICAL double array (2ᵏ-scaling commutes with
    * every FP rounding step: products, sums, sqrt, and the final division
    * all scale exactly), which is what makes planted ×2-copy recall a
    * theorem in the `semdedup*`/`knn_join` contract queries. */
  private[graft] def unitized(df: DataFrame, vecCol: String,
                              idCol: String): DataFrame = {
    val nrm = V.norm(V.toDouble(col(vecCol)))
    df.select(col(idCol), col(vecCol), nrm.as("__nrm"))
      .filter(col("__nrm") > 0.0)
      .withColumn("__unit",
        transform(V.toDouble(col(vecCol)), x => x / col("__nrm")))
  }

  /** Attach one row per (query, probed cell): the `nProbe` nearest cells. */
  private def withProbeCells(q: DataFrame, centroids: Array[Array[Double]],
                             nProbe: Int): DataFrame =
    q.withColumn("__probe",
        slice(array_sort(cellDistStructs(col("__qvec"), centroids)), 1, nProbe))
      .withColumn("__cell", explode(col("__probe.cell")))
      .drop("__probe")

  /** Cell-count heuristic for a corpus of `n` vectors: ~√n, floored at 16
    * and capped at 256. FAISS guidance for IVF list counts is the same √n
    * order; the cap is specific to this engine — cell ASSIGNMENT is one
    * generated dot-product expression per cell per row, so unbounded cell
    * counts inflate the assignment projection past what codegen/JIT
    * handles well, while the probed fraction (~nProbe/nCells) keeps
    * shrinking as 1/√n up to the cap. Measured in SCALEPROBE.json
    * `ann_scale` (probe cost stays flat in corpus size under this
    * default). */
  private[graft] def autoCells(n: Long): Int =
    math.max(16, math.min(256, math.sqrt(n.toDouble).toInt))

  /** Coarse-quantizer fit: k-means over a BOUNDED sample collected to the
    * driver (the FAISS recipe). The sample is capped at `fitSampleRows`
    * vectors, so the fit costs one counted+sampled scan plus an in-memory
    * Lloyd's run — constant work regardless of corpus size — instead of
    * per-iteration distributed jobs over the full corpus (which at 100 TB
    * would be several full passes just to place 16 centroids). Cell
    * ASSIGNMENT always covers the full corpus scan-side. Deterministic for
    * a fixed seed. `fitSampleFraction` ∈ (0, 1) forces a specific sampling
    * rate; the default (≤ 0 = auto) sizes the rate so ~`fitSampleRows`
    * rows survive. */
  private[graft] def fitCentroids(corpus: DataFrame, vecCol: String,
                                  nCells: Int, seed: Long,
                                  fitSampleFraction: Double = 0.0,
                                  fitSampleRows: Int = 4096,
                                  knownRows: Long = -1L): Array[Array[Double]] = {
    val targetRows = math.max(fitSampleRows, 32 * nCells)
    val vecs = corpus.select(V.toDouble(col(vecCol)).as("__v"))
    // Only the AUTO path caps with limit(): its sample() was already sized
    // to ~targetRows, so the cap is a safety bound on an unbiased sample.
    // An explicit fraction (or full fit) is honored verbatim — a blanket
    // limit() would silently replace it with a leading-rows prefix, which
    // on source-ordered corpora concentrates every centroid in the first
    // region. Callers choosing fractions own the driver-memory cost.
    val sampled =
      if (fitSampleFraction > 0 && fitSampleFraction < 1.0)
        vecs.sample(withReplacement = false, fitSampleFraction, seed)
      else if (fitSampleFraction >= 1.0) vecs
      else {
        // auto: parquet count is row-group-metadata cheap; oversample 10%
        // then cap, so the collect stays bounded. Callers that already
        // counted for autoCells pass knownRows — one scan, not two (a
        // union-with-transforms corpus makes the count a real pass).
        val n = if (knownRows >= 0) knownRows else vecs.count()
        if (n <= targetRows) vecs
        else vecs.sample(withReplacement = false,
          math.min(1.0, targetRows.toDouble * 1.1 / n), seed)
          .limit(targetRows)
      }
    val points = sampled.collect().map(_.getSeq[Double](0).toArray)
    require(points.nonEmpty, "cannot fit a quantizer on an empty corpus")
    kmeansLocal(points, nCells, seed)
  }

  /** Deterministic in-memory k-means++ + Lloyd over the (bounded) fit
    * sample. `points` is at most `fitSampleRows` vectors, so this is
    * microseconds-to-milliseconds of driver CPU. */
  private def kmeansLocal(points: Array[Array[Double]], k: Int, seed: Long,
                          iters: Int = 10): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, points.length)
    val dim = points(0).length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ seeding: next center drawn ∝ distance² to nearest center.
    // The nearest-center distance array is maintained INCREMENTALLY (only
    // the newest center can lower it), so seeding is O(k·n·d) instead of
    // the O(k²·n·d) of recomputing the min over all centers per step —
    // the difference between milliseconds and tens of seconds once the
    // √n heuristic pushes k to 256.
    val centers = scala.collection.mutable.ArrayBuffer(points(rnd.nextInt(points.length)))
    val minD = points.map(p => d2(p, centers(0)))
    while (centers.length < kk) {
      val total = minD.sum
      if (total <= 0) centers += points(rnd.nextInt(points.length))
      else {
        var r = rnd.nextDouble() * total; var i = 0
        while (i < points.length - 1 && r > minD(i)) { r -= minD(i); i += 1 }
        centers += points(i)
      }
      val c = centers.last
      var j = 0
      while (j < points.length) {
        val d = d2(points(j), c)
        if (d < minD(j)) minD(j) = d
        j += 1
      }
    }
    var cents = centers.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      points.foreach { p =>
        var best = 0; var bestD = d2(p, cents(0)); var c = 1
        while (c < kk) { val d = d2(p, cents(c)); if (d < bestD) { bestD = d; best = c }; c += 1 }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      cents = Array.tabulate(kk) { c =>
        if (counts(c) == 0) cents(c)
        else { val a = sums(c); var i = 0; while (i < dim) { a(i) /= counts(c); i += 1 }; a }
      }
    }
    cents
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nCells` cells; each query probes only the
    * `nProbe` nearest cells, so the scored fraction is ~nProbe/nCells of
    * the corpus. The quantizer is fit on a bounded driver-side sample by
    * default ([[fitCentroids]]); cells are assigned once scan-side;
    * centroids are tiny and broadcast. Exact cosine scoring within probed
    * cells + the bounded [[TopKAggregator]] — recall < 1 by construction,
    * scores never approximate. Deterministic for a fixed seed. For a
    * persisted, physically cell-partitioned corpus (probes become
    * partition-pruned reads) see [[ivfBuild]]/[[ivfProbeTopK]].
    * `nCells ≤ 0` (the default) sizes the quantizer as ~√n via
    * [[autoCells]] — one extra metadata-cheap count of the corpus.
    * `nProbe ≤ 0` (the default) probes cells/8: with auto-sized cells a
    * FIXED probe count would silently collapse the scored fraction (and
    * recall) as the corpus grows — tying the default to the cell count
    * keeps the scored fraction at ~1/8 regardless of what autoCells
    * picked. Pass an explicit nProbe to trade recall for probe cost. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, queryIdCol: String,
              k: Int, nCells: Int = 0, nProbe: Int = 0,
              seed: Long = 42L, fitSampleFraction: Double = 0.0,
              fitSampleRows: Int = 4096): DataFrame = {
    val known = if (nCells > 0) -1L else corpus.count()
    val cells = if (nCells > 0) nCells else autoCells(known)
    val probes = if (nProbe > 0) nProbe else math.max(1, cells / 8)
    val centroids = fitCentroids(corpus, vecCol, cells, seed,
      fitSampleFraction, fitSampleRows, knownRows = known)
    val assigned = corpus
      .select(col(idCol), col(vecCol),
        nearestCell(col(vecCol), centroids).as("__cell"),
        V.norm(col(vecCol)).as("__cn"))
    val q = withProbeCells(
      withQueryNorm(queries, corpus.columns, queryIdCol, vecCol),
      centroids, probes)
    val scored = assigned
      .join(broadcast(q), Seq("__cell"))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    rankTopK(scored, queryIdCol, idCol, k)
  }

  /** One-time physical clustering of a corpus for IVF probing: fit the
    * quantizer (bounded sample), assign every row its cell, and write the
    * corpus `partitionBy(__cell)` with per-row norms precomputed, plus the
    * centroids, under `path`. After this, [[ivfProbeTopK]] reads ONLY the
    * probed cells' directories — at 100 TB a probe is a partition-pruned
    * read of ~nProbe/nCells of the data, with no quantizer refit, no
    * assignment pass, and no norm recomputation per query batch.
    * `nCells ≤ 0` (the default) sizes the quantizer as ~√n via
    * [[autoCells]].
    *
    * A build overwrites BOTH halves (data, then centroids), so over an
    * EXISTING index it is itself a torn-window writer: it holds the same
    * `.rebuilding` fence [[ivfMaintain]] uses for the whole write and
    * lifts it on completion. That also makes a completed
    * rebuild-from-source the self-healing recovery for a fenced index —
    * both halves are rewritten from one generation, so the marker (from
    * this build, a crashed maintain, or a crashed earlier build) is
    * deleted instead of demanding manual restoration. The build also
    * HOLDS the `.mutating` writer lease (acquire-or-create — a fresh
    * root works): a build racing a live append refuses at acquisition
    * instead of replacing `data/` under the append's in-flight write.
    * Consequently a crashed WRITER'S leftover lease blocks the rebuild
    * too — the refusal quotes the stamped holder (op/time/host/pid);
    * after confirming that writer is dead, delete `.mutating` and rerun,
    * and the completed build self-heals the `.rebuilding` fence as
    * before. */
  def ivfBuild(corpus: DataFrame, vecCol: String, path: String,
               nCells: Int = 0, seed: Long = 42L,
               fitSampleFraction: Double = 0.0,
               fitSampleRows: Int = 4096): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // fail fast (advisory; acquisition below still decides atomically):
    // the auto-sizing count next is a FULL corpus scan at scale — it must
    // not be paid ahead of a certain scheme refusal or a held lease
    buildPrecheck(spark, fs, root, "ivfBuild")
    val known = if (nCells > 0) -1L else corpus.count()
    val cells = if (nCells > 0) nCells else autoCells(known)
    val centroids = fitCentroids(corpus, vecCol, cells, seed,
      fitSampleFraction, fitSampleRows, knownRows = known)
    // the build HOLDS the writer lease (acquire-or-create: a fresh root
    // is created, an existing one leased like any mutation) across every
    // write below — a build racing a live append would otherwise replace
    // data/ while the append's write is in flight, silently dropping the
    // appended rows after their fence advanced
    withMutationLease(spark, fs, root, "ivfBuild", createRoot = true) {
      val marker = new org.apache.hadoop.fs.Path(root, RebuildMarker)
      fs.create(marker, true).close()
      // a probe-width calibration tuned against the centroids this build
      // replaces would be silently wrong-generation metadata
      fs.delete(new org.apache.hadoop.fs.Path(root, NProbeFile), false)
      corpus
        .withColumn("__cn", V.norm(col(vecCol)))
        .withColumn("__cell", nearestCell(col(vecCol), centroids))
        .write.mode("overwrite").partitionBy("__cell").parquet(s"$path/data")
      centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
      writeGeneration(spark, path)
      fs.delete(marker, false)
    }
    // a rebuild over an existing index replaces both halves' part files;
    // same-session plans may hold cached file listings naming the deleted
    // ones (the hazard ivfAppend/ivfMaintain already refresh against)
    spark.catalog.refreshByPath(s"$path/data")
    spark.catalog.refreshByPath(s"$path/centroids")
  }

  /** Incrementally extend an index persisted by [[ivfBuild]]: assign the
    * new rows with the EXISTING quantizer (read from `path/centroids`) and
    * append them into their cells' directories — no refit, no rewrite of
    * the standing data; the daily-increment path for an index whose full
    * rebuild is a 100 TB job. Because probes rank the SAME centroids the
    * assignment used, [[ivfProbeTopK]] stays exact under full probe and
    * its partial-probe recall contract is unchanged; what drifts under a
    * shifting distribution is cell BALANCE (new mass concentrates in few
    * cells, making their probes more expensive) — watch [[ivfCellStats]]
    * and rebuild when the skew crosses the caller's bound. `newRows` must
    * carry the schema the index was built from.
    *
    * Concurrency discipline (the same single-writer assumption
    * [[ivfMaintain]] documents), now mechanically backstopped: the fence
    * check refuses a `.rebuilding` index (a crashed maintain can no
    * longer be silently extended with whichever centroids file survived
    * the torn swap), and the append HOLDS the `.mutating` writer lease
    * across its centroid read + data write — a maintain/delete whose
    * staging would silently swap away in-flight appended rows (the one
    * interleaving the narrow fence alone could not make loud) now
    * refuses at acquisition, in whichever order the two writers arrive.
    * Visibility to
    * CONCURRENT readers: an append writes part files into live `__cell=`
    * directories non-atomically — each part file appears whole, the
    * batch does not — so a probe racing an append may score a PREFIX of
    * the batch (some new rows visible, others not yet). It never sees a
    * torn row or mixed centroids (append does not touch `centroids`),
    * and any prefix it does see was assigned with the same quantizer the
    * probe ranks, so retrieved neighbors are still exactly scored; if
    * batch atomicity matters, schedule probes around appends
    * (SimilaritySpec pins the prefix-visibility contract). */
  /** Standing coarse quantizer of a persisted index (tiny: nCells rows). */
  private def loadCentroids(spark: SparkSession,
                            path: String): Array[Array[Double]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)

  /** Standing PQ codebooks of a persisted IVF-PQ index (m·ksub rows). */
  private def loadPqModel(spark: SparkSession, path: String): PqModel = {
    val books = spark.read.parquet(s"$path/codebooks")
      .orderBy("subspace", "code").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
    val codebooks = books.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2)).toArray
    PqModel(codebooks.length, codebooks(0)(0).length, codebooks)
  }

  def ivfAppend(newRows: DataFrame, vecCol: String, path: String): Unit = {
    val spark = newRows.sparkSession
    requireNotRebuilding(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // the lease is HELD across centroid read + data write, not merely
    // checked at entry: a maintain/delete acquiring it mid-append would
    // stage from a listing missing the in-flight rows and swap them away
    // silently — and a swapped quantizer between the read and the write
    // would file rows under stale cells. Held, both races refuse loudly.
    withMutationLease(spark, fs, root, "ivfAppend", AppendLeaseHint) {
      val centroids = loadCentroids(spark, path)
      newRows
        .withColumn("__cn", V.norm(col(vecCol)))
        .withColumn("__cell", nearestCell(col(vecCol), centroids))
        .write.mode("append").partitionBy("__cell").parquet(s"$path/data")
    }
    // same-session probes may hold a cached file listing for the cell
    // directories; drop it so they see the appended part files
    spark.catalog.refreshByPath(s"$path/data")
  }

  /** Per-cell row counts of a persisted index — the [[ivfAppend]] rebuild
    * trigger (skewed counts = expensive probes on the hot cells). Scans
    * only the partition column (directory-derived), not the vectors. */
  def ivfCellStats(spark: SparkSession, path: String): DataFrame = {
    requireNotRebuilding(spark, path)
    spark.read.parquet(s"$path/data")
      .groupBy("__cell")
      .agg(count(lit(1)).as("n"))
      .select(col("__cell").as("cell"), col("n"))
  }

  /** Append-vs-rebuild automation for an index persisted by [[ivfBuild]]
    * and grown by [[ivfAppend]]: reads the per-cell counts (bounded by the
    * cell count — directory metadata, not data) and rebuilds the index
    * in place when either health bound is crossed, returning `"ok"` or
    * `"rebuilt"` so callers can log/alert on the decision.
    *
    *  - **Skew**: max cell population / mean > `maxSkew` — appended mass
    *    concentrated in few cells, making their probes expensive and
    *    recall lopsided (a probe budget spent on one bloated cell).
    *  - **Growth**: the √n heuristic's cell count for the CURRENT corpus
    *    exceeds `maxGrowth` × the stored cell count — the quantizer was
    *    fit for a corpus this one has outgrown, so per-cell scan cost has
    *    drifted up by the same factor.
    *
    * The rebuild refits the quantizer on the current distribution
    * ([[fitCentroids]] — bounded driver sample) and rewrites the data
    * partition-by-cell into a staging directory, then swaps directories.
    * The swap is rename-based and brief but NOT atomic: run maintenance
    * from the single writer that owns the index (the same assumption
    * [[ivfAppend]] already makes — concurrent appends during a rebuild
    * would be lost), while readers hold the previous listing. The torn
    * window (new data, old centroids — which would silently collapse
    * recall) is fenced by a `.rebuilding` marker written before the first
    * rename and removed after the last: [[ivfProbeTopK]] and
    * [[ivfCellStats]] refuse to open a marked index, every rename result
    * is checked, and a crashed swap is recovered by restoring the
    * `.old`/`.staging` halves (both live next to the marker) rather than
    * by trusting whatever mix the crash left. A crash BEFORE the first
    * rename leaves only `.staging` to delete; the live index is touched
    * only after the staging write completed. */
  def ivfMaintain(spark: SparkSession, path: String, vecCol: String,
                  maxSkew: Double = 4.0, maxGrowth: Double = 4.0,
                  seed: Long = 42L, fitSampleRows: Int = 4096,
                  recallTarget: Option[Double] = None,
                  recallK: Int = 10): String = {
    require(maxSkew > 1.0, "maxSkew must exceed 1 (1 = perfectly uniform)")
    require(maxGrowth >= 1.0, "maxGrowth must be >= 1")
    // layout guard: an IVF-PQ index ALSO has data/ + centroids/, so this
    // call would "work" — and its rebuild (via ivfBuild) would silently
    // DROP the codes/codebooks relations. indexMaintain routes correctly;
    // the direct call must refuse just as loudly.
    requireNotIvfPq(spark, path, "ivfMaintain's rebuild would drop them " +
      "— run ivfPqMaintain or indexMaintain instead")
    val (total, skew, wantCells, nCellsStored) = cellHealth(spark, path)
    if (total == 0) return "ok"
    if (skew <= maxSkew && wantCells <= nCellsStored * maxGrowth) "ok"
    else {
      // a calibration tuned against the REPLACED quantizer is stale —
      // dropped BEFORE the rebuild, because a crash between the fence
      // lift and a post-swap delete would leave it silently in force on
      // the refitted index (losing it on an unchanged index only
      // degrades to the uncalibrated default). When the caller states a
      // recall target, the width is re-checked against the rebuilt index
      // immediately (the post-rebuild re-check nProbeForRecall's
      // contract promises).
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      // writer lease held from BEFORE the staging read to after the
      // swap: an append interleaving with that window would be silently
      // replaced by the swap (its rows are not in the staged files) —
      // appends HOLD the same lease, so the interleaving is
      // structurally impossible (see withMutationLease)
      withMutationLease(spark, fs, root, "ivfMaintain") {
        fs.delete(new org.apache.hadoop.fs.Path(path, NProbeFile), false)
        // original columns only: assignment/norm recomputed by the build
        val data = spark.read.parquet(s"$path/data").drop("__cell", "__cn")
        stagedRebuild(spark, path, Seq("data", "centroids")) { staging =>
          ivfBuild(data, vecCol, staging, nCells = wantCells,
            seed = seed, fitSampleRows = fitSampleRows)
        }
      }
      recallTarget.foreach(t =>
        nProbeForRecall(spark, path, vecCol, t, k = recallK, seed = seed))
      "rebuilt"
    }
  }

  /** Staged in-place rebuild shared by every index-maintenance path
    * ([[ivfMaintain]], [[pqMaintain]], [[ivfPqMaintain]]): run `build`
    * against `<path>/.staging`, then swap the named halves into place.
    * The swap is rename-based and brief but NOT atomic: the torn window
    * (some halves new, some old — which would silently corrupt results,
    * e.g. probing new cells with old centroids) is fenced by the
    * `.rebuilding` marker written before the first rename and removed
    * after the last — readers and appenders refuse a marked index, every
    * rename result is checked, and a crashed swap is recovered by
    * restoring the halves from `.old`/`.staging` (both live next to the
    * marker) rather than by trusting whatever mix the crash left. A crash
    * BEFORE the first rename leaves only `.staging` to delete; the live
    * index is touched only after the staging build completed.
    * Single-writer, like every maintenance path. */
  /** Checked rename shared by every fenced mutation ([[stagedRebuild]],
    * [[indexDelete]]): a failed rename mid-swap must stop the swap WITH
    * the recovery story, never continue past a half-moved piece. One
    * wording, one discipline — the two fenced paths cannot drift. */
  private def renameOrDie(fs: org.apache.hadoop.fs.FileSystem,
                          path: String, op: String)(
      from: org.apache.hadoop.fs.Path,
      to: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(from, to)) throw new IllegalStateException(
      s"$op: rename $from -> $to failed mid-swap; the index at $path is " +
        s"fenced by its $RebuildMarker marker — restore the pieces from " +
        ".old/.staging (or rebuild from source) before removing the marker")

  /** Run `body` (the swap section of a fenced mutation) under the
    * `.rebuilding` marker: readers/appenders refuse the index while it
    * holds, and a crash inside leaves the marker for recovery. */
  private def withRebuildFence(fs: org.apache.hadoop.fs.FileSystem,
                               root: org.apache.hadoop.fs.Path)(
      body: => Unit): Unit = {
    val marker = new org.apache.hadoop.fs.Path(root, RebuildMarker)
    fs.create(marker, true).close()
    body
    fs.delete(marker, false)
  }

  /** Writer lease EVERY index writer holds for the span in which its
    * reads and writes must be mutually consistent: whole-mutation paths
    * ([[stagedRebuild]], [[indexDelete]]) from their FIRST read of the
    * relations to their last swap, and APPENDS ([[ivfAppend]],
    * [[pqAppend]], [[ivfPqAppend]]) from their quantizer/codebook read to
    * their last data write — the mechanical backstop behind the
    * documented single-writer contract. The `.rebuilding` fence only
    * covers the brief swap, which keeps PROBES live through the long
    * staging build but would leave a silent-loss window for appends that
    * merely CHECKED the lease: an append whose write was in flight when a
    * mutation's staging read listed the relation writes rows the swap
    * then replaces — gone without an error (the r18 check-then-write
    * hole). HELD for the whole append, the interleaving is structurally
    * impossible: whichever writer acquires second refuses loudly. Probes
    * do NOT touch the lease — their availability is the reason the fence
    * is narrow. OVERWRITE builds ([[ivfBuild]], [[pqBuild]],
    * [[ivfPqBuild]]) hold it too, acquire-or-create (a build is the one
    * writer legitimately pointed at an absent root, so it creates the
    * root and then takes the lease like everyone else): although a build
    * stages nothing from the index's own rows, it REPLACES `data/` — a
    * nightly rebuild-from-source racing a live append's in-flight write
    * would otherwise overwrite the appended rows after their fence
    * advanced, the exact silent-loss mode the lease exists to prevent
    * (closed r20; r19 left builds outside by design and the race silent).
    * Hidden (dot-prefixed): never enters a relation read or a gauge
    * sample.
    *
    * The marker is not empty: acquisition stamps a diagnostic payload
    * (`op=`/`acquired=`/`host=`/`pid=` lines) and the refusal message
    * quotes it — a crashed mutation's leftover lease blocks every
    * subsequent writer (including each streaming `annAppendSink` epoch)
    * until an operator intervenes, and "confirm no writer is running"
    * is only actionable when the refusal names WHICH writer, since WHEN,
    * and WHERE to look for it. */
  private val MutatingMarker = ".mutating"

  /** Diagnostic payload stamped into a freshly-acquired lease marker:
    * who holds it, since when, from which JVM. Line-based `k=v` so the
    * recovery runbook (and [[describeHolder]]) can read it with nothing
    * but `cat`. */
  private def leasePayload(op: String): String = {
    val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "unknown-host" }
    s"op=$op\nacquired=${java.time.Instant.now()}\n" +
      s"host=$host\npid=${ProcessHandle.current().pid()}\n"
  }

  /** Best-effort description of the current lease holder, read from the
    * marker's payload for the refusal message: "held by ivfMaintain
    * since 2026-08-16T12:00:00Z (age 42s) on host-7 pid 123". Degrades
    * to naming WHY the holder is unknown (pre-payload marker, read
    * mid-stamp, unreadable) — a diagnostic read must never replace the
    * refusal with its own failure. */
  private def describeHolder(fs: org.apache.hadoop.fs.FileSystem,
                             marker: org.apache.hadoop.fs.Path): String =
    try {
      val in = fs.open(marker)
      // readAllBytes, not a single read(buf): a first read may legally
      // return a prefix, which would misreport a fully-stamped lease as
      // payload-less (the fence reader uses the same discipline)
      val content = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val kv = content.linesIterator.flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }).toMap
      (kv.get("op"), kv.get("acquired")) match {
        case (Some(op), Some(at)) =>
          val age =
            try {
              val secs = java.time.Duration.between(
                java.time.Instant.parse(at), java.time.Instant.now())
                .getSeconds
              if (secs < 0) " (age: negative — clock skew)"
              else if (secs < 120) s" (age ${secs}s)"
              else if (secs < 7200) s" (age ${secs / 60}m)"
              else s" (age ${secs / 3600}h)"
            } catch { case _: Exception => "" }
          val where = (kv.get("host"), kv.get("pid")) match {
            case (Some(h), Some(p)) => s" on $h pid $p"
            case _                  => ""
          }
          s"held by $op since $at$age$where"
        case _ =>
          "holder unknown: the marker carries no payload (a pre-payload " +
            "writer created it, or it was read mid-stamp)"
      }
    } catch {
      case _: Exception =>
        "holder unknown: the marker payload could not be read"
    }

  /** Appended to the lease-refusal message on the append paths: the
    * retry story differs from a mutation's (streaming ingest redelivers
    * the refused epoch; a maintain/delete just reruns). */
  private val AppendLeaseHint =
    " A refused append is safe to retry after the holder completes" +
      " (streaming ingest redelivers the epoch)."

  /** The ONE acceptance rule for holding the writer lease on `fs`:
    * create-exclusive is atomic there, or the deployment explicitly
    * opted into the advisory downgrade. Shared by [[withMutationLease]]
    * and `StreamOps.annAppendSink`'s start-time gate so the sink's
    * fail-fast can never drift from what the appends actually enforce.
    * `conf` must be a FRESH session conf, not `fs.getConf`: FileSystem
    * instances are cached with the conf they were first created under,
    * so an operator who hits the refusal and sets the flag as
    * instructed would otherwise keep being refused by the stale cached
    * copy. */
  private[graft] def leaseExclusiveOrOptedIn(
      fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration): Boolean =
    graft.sinks.SnapshotStore.atomicRenameCapable(fs) ||
      conf.getBoolean("graft.index.allowNonExclusiveLease", false)

  /** The lease's scheme gate as a loud require, shared by
    * [[withMutationLease]] and the builds' [[buildPrecheck]] fail-fast
    * so the wording (and the opt-in it names) cannot drift. */
  private def requireLeasableScheme(spark: SparkSession,
                                    fs: org.apache.hadoop.fs.FileSystem,
                                    op: String): Unit =
    require(leaseExclusiveOrOptedIn(fs,
        spark.sessionState.newHadoopConf()),
      s"$op: the $MutatingMarker writer lease requires an atomic " +
        s"create-exclusive, which '${fs.getScheme}' does not provide " +
        "(object-store create is HEAD-then-PUT; two racing writers could " +
        "both acquire the lease and silently lose data). Host the index " +
        "on an HDFS-compatible filesystem, or — acknowledging that the " +
        "lease degrades to advisory and the single-writer contract must " +
        "be enforced externally — set " +
        "graft.index.allowNonExclusiveLease=true in the Hadoop conf.")

  /** The one already-leased refusal, shared by [[withMutationLease]]'s
    * atomic acquisition and the builds' advisory precheck — one wording,
    * one holder-quoting discipline. */
  private def leaseRefusal(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path,
                           marker: org.apache.hadoop.fs.Path,
                           op: String, hint: String): IllegalStateException =
    new IllegalStateException(
      s"$op: the index at $root is already leased by another writer " +
        s"($MutatingMarker exists; ${describeHolder(fs, marker)}) — " +
        "appends/maintenance/deletes/builds are " +
        "single-writer, and interleaving them loses data silently." +
        hint +
        " If no other writer is running (a crashed mutation left the " +
        "lease — check the quoted holder/host/age), verify the index " +
        "and delete the marker to release it")

  /** Fail-fast for the overwrite builds, run BEFORE the corpus count and
    * quantizer/codebook fit: at scale the auto-sizing count is a full
    * corpus scan, and paying it ahead of a CERTAIN refusal (non-leasable
    * scheme) or a near-certain one (root already leased) wastes the most
    * expensive part of the build. The marker check here is ADVISORY —
    * acquisition inside [[withMutationLease]] still decides atomically;
    * this only surfaces the refusal before the spend, quoting the same
    * holder payload. */
  private def buildPrecheck(spark: SparkSession,
                            fs: org.apache.hadoop.fs.FileSystem,
                            root: org.apache.hadoop.fs.Path,
                            op: String): Unit = {
    requireLeasableScheme(spark, fs, op)
    val marker = new org.apache.hadoop.fs.Path(root, MutatingMarker)
    if (fs.exists(marker)) throw leaseRefusal(fs, root, marker, op, "")
  }

  /** Acquire the writer lease create-exclusively (two racing writers
    * cannot both win), run `body`, release. A body that THROWS releases
    * the lease — the live index was not touched before the fenced swap,
    * and the swap's own crash story is the `.rebuilding` marker. A
    * process CRASH leaves the lease; the loud message carries the
    * recovery step (confirm no writer is running, delete the marker)
    * and QUOTES the crashed holder's stamped payload — op, acquisition
    * time, host, pid — so "confirm" has something to confirm with.
    *
    * The mutual exclusion rests on `create(marker, overwrite=false)`
    * being ATOMIC, which holds on HDFS-compatible filesystems but not on
    * object stores (s3a-like create is HEAD-then-PUT — two racing
    * writers can both "win" and interleave, exactly the silent loss the
    * lease exists to prevent). Those schemes are refused loudly per
    * [[leaseExclusiveOrOptedIn]], with the same explicit opt-in
    * discipline as the SnapshotStore control files: a deployment that
    * guarantees a single writer externally can acknowledge the
    * downgrade-to-advisory with
    * `graft.index.allowNonExclusiveLease=true` in the Hadoop conf. */
  private def withMutationLease[T](spark: SparkSession,
                                   fs: org.apache.hadoop.fs.FileSystem,
                                   root: org.apache.hadoop.fs.Path,
                                   op: String, hint: String = "",
                                   createRoot: Boolean = false)(
      body: => T): T = {
    requireLeasableScheme(spark, fs, op)
    // nothing to lease where no index exists: creating the marker would
    // mkdirs the root as a side effect, littering a typo'd path with an
    // empty directory the eventual read error never explains. Overwrite
    // BUILDS are the exception (createRoot): a build is the one writer
    // legitimately pointed at an absent root — it creates the root and
    // then holds the lease like every other writer, so a build racing a
    // live append refuses at acquisition instead of replacing data/ under
    // the append's feet.
    if (!fs.exists(root)) {
      if (createRoot) fs.mkdirs(root)
      else throw new IllegalArgumentException(
        s"$op: no index at $root — nothing to mutate; build it first")
    }
    val marker = new org.apache.hadoop.fs.Path(root, MutatingMarker)
    val acquired =
      try { fs.create(marker, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          // a permission or transient-FS failure is NOT "already
          // leased" — directing the operator to delete a marker that
          // does not exist buries the real error. Only an existing
          // marker reads as a lease conflict. (On a filesystem that
          // reports existing-file conflicts as plain IOExceptions, a
          // conflicting writer releasing between the create and this
          // check can still land here — hence the retry hedge below.)
          if (fs.exists(marker)) false
          else throw new java.io.IOException(
            s"$op: creating the $MutatingMarker lease at $root failed " +
              "and no lease exists — likely a filesystem error, not a " +
              "writer conflict (see cause); if the cause reads like " +
              "'file exists', a racing writer completed meanwhile and " +
              "a retry will acquire cleanly", e)
      }
    if (!acquired) throw leaseRefusal(fs, root, marker, op, hint)
    // the marker is OURS now: stamp the diagnostic payload (who/since
    // when/where) so a crashed mutation's refusal can name the holder.
    // The atomic create-exclusive above stays the mutual-exclusion
    // primitive; this overwrite-create rewrites a file we hold. A failed
    // stamp RELEASES the lease rather than leaking an anonymous one.
    try {
      val out = fs.create(marker, true)
      try out.write(leasePayload(op).getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch {
      case e: Throwable =>
        // the release itself can fail on the same flaky filesystem — it
        // must never REPLACE the stamp failure as the surfaced error
        try fs.delete(marker, false)
        catch { case d: Throwable => e.addSuppressed(d) }
        throw e
    }
    try body finally { fs.delete(marker, false); () }
  }

  private def stagedRebuild(spark: SparkSession, path: String,
                            halves: Seq[String])(
      build: String => Unit): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(root, ".staging")
    fs.delete(staging, true) // a crashed previous rebuild's write half
    build(staging.toString)
    val old = new org.apache.hadoop.fs.Path(root, ".old")
    fs.delete(old, true)
    fs.mkdirs(old)
    val rod = renameOrDie(fs, path, "index rebuild") _
    def swap(name: String): Unit = {
      rod(new org.apache.hadoop.fs.Path(root, name),
        new org.apache.hadoop.fs.Path(old, name))
      rod(new org.apache.hadoop.fs.Path(staging, name),
        new org.apache.hadoop.fs.Path(root, name))
    }
    withRebuildFence(fs, root) {
      halves.foreach(swap)
      // new generation: in-flight probes that loaded the replaced
      // quantizer re-check this after planning and fail loudly instead
      // of pruning the rebuilt files with stale centroids
      writeGeneration(spark, path)
    }
    fs.delete(old, true)
    fs.delete(staging, true)
    // the session may hold cached file listings for the replaced
    // directories (FileStatusCache); drop them so same-session reads see
    // the rebuilt files instead of failing on vanished part files
    halves.foreach(d => spark.catalog.refreshByPath(s"$path/$d"))
  }

  /** Cell-health kernel shared by [[ivfMaintain]] and [[ivfPqMaintain]]:
    * (total rows, max/mean skew over STORED cells, `autoCells(total)`,
    * stored cell count). The mean is over ALL stored cells — empty cells
    * have no directory but do dilute it: an index where half the cells
    * emptied out is skewed. A bounded read: per-cell counts are directory
    * metadata, centroids are nCells rows. */
  private def cellHealth(spark: SparkSession,
                         path: String): (Long, Double, Int, Int) = {
    val counts = ivfCellStats(spark, path).collect().map(_.getLong(1))
    val nCellsStored = spark.read.parquet(s"$path/centroids").count().toInt
    val total = counts.sum
    val skew =
      if (counts.isEmpty || total == 0) 0.0
      else counts.max / (total.toDouble / math.max(1, nCellsStored))
    (total, skew, autoCells(total), nCellsStored)
  }

  /** Fence file a mid-swap [[ivfMaintain]] (or mid-overwrite [[ivfBuild]])
    * leaves behind; see [[requireNotRebuilding]]. */
  private val RebuildMarker = ".rebuilding"

  /** Persisted probe-width calibration (see [[nProbeForRecall]]):
    * generation-bound metadata — any quantizer refit ([[ivfBuild]]
    * overwrite, [[ivfMaintain]] rebuild) deletes it, because a probe
    * width tuned against replaced centroids is silently miscalibrated.
    * The delete alone cannot close the race where a calibration RUNNING
    * during the refit lands its file after the delete (the calibrators
    * are readers and deliberately do not take the writer lease), so the
    * artifact is also generation-STAMPED and readers ignore a stamp
    * that does not match the current [[GenerationFile]]. */
  private val NProbeFile = "nprobe.json"

  /** The stamped generation agrees with `gen` — including the
    * "none"=="none" case of an index predating the generation marker.
    * A cal file with NO stamp (pre-stamp vintage) never validates:
    * recalibrating is cheap, a width of unknown provenance is not. */
  private def calStampMatches(calText: String,
                              gen: Option[String]): Boolean =
    """"gen"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(calText)
      .map(_.group(1))
      .contains(gen.getOrElse("none"))

  /** The persisted [[nProbeForRecall]] recommendation, if the index has
    * been calibrated since its last quantizer refit. Requires the
    * file's trailing completeness sentinel (see [[writeCalFile]]) AND a
    * generation stamp matching the index's current one: a torn
    * calibration, a pre-stamp file, or a stale calibration that landed
    * after a concurrent rebuild's invalidating delete all parse to None
    * — the conservative uncalibrated default — never to a width
    * silently installed against the wrong model. */
  def calibratedNProbe(spark: SparkSession, path: String): Option[Int] =
    calibratedNProbeAt(spark, path, readGeneration(spark, path))

  /** [[calibratedNProbe]] against an ALREADY-READ generation — the probe
    * path's form: probes snapshot the generation once at entry and
    * re-check it post-plan, so the calibration read must not add a
    * third read of the same small file per query batch. */
  private[graft] def calibratedNProbeAt(spark: SparkSession, path: String,
                                        gen: Option[String]): Option[Int] =
    readCompleteCalFile(spark, path, NProbeFile)
      .filter(calStampMatches(_, gen))
      .flatMap(text =>
        """"nprobe"\s*:\s*(\d+)""".r.findFirstMatchIn(text)
          .map(_.group(1).toInt))

  /** Write a calibration artifact so a crash can never install a torn
    * width: tmp + atomic rename where the filesystem swaps atomically
    * (the SnapshotStore control-file discipline), and — because these
    * files are ADVISORY, so object stores keep the plain-overwrite
    * fallback — the JSON closes with an `"eof":true` sentinel that any
    * truncation drops. `fields` must NOT include the sentinel. */
  private def writeCalFile(spark: SparkSession, path: String, name: String,
                           fields: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val body = s"""{$fields,"eof":true}"""
    graft.sinks.SnapshotStore.replaceSmallFilePreferAtomic(fs, path, name,
      body)
  }

  /** Read a [[writeCalFile]] artifact, returning None unless the
    * completeness sentinel survived — a torn write (truncated digits
    * included, e.g. factor 64 torn to a parseable 6) is treated as
    * uncalibrated, not silently installed. Pre-sentinel legacy files
    * also read as None: recalibrating is cheap, a wrong width is not. */
  private def readCompleteCalFile(spark: SparkSession, path: String,
                                  name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      if (""""eof"\s*:\s*true\s*\}\s*$""".r.findFirstIn(text).isDefined)
        Some(text)
      else None
    }
  }

  /** Generation marker: a fresh uuid written by every mutation that
    * REPLACES the quantizer/codebooks or re-encodes the relations
    * (overwrite builds, the maintain family's staged rebuilds) — NOT by
    * appends or [[indexDelete]], which keep the standing model valid.
    * Probes snapshot it at entry and re-check after their plan-time
    * reads ([[requireGenerationUnchanged]]): without it, a rebuild that
    * completes ENTIRELY inside the gap between a probe's quantizer load
    * and its data-file listing (fence up and down again, nothing left to
    * observe) would let the probe prune the NEW files with the OLD
    * centroids — silently wrong neighbors. Hidden (dot-prefixed), so it
    * never enters a relation read or the drift gauges' file samples. */
  private val GenerationFile = ".generation"

  private[graft] def readGeneration(spark: SparkSession,
                                    path: String): Option[String] =
    readCompleteCalFile(spark, path, GenerationFile).flatMap(t =>
      """"gen"\s*:\s*"([0-9a-fA-F-]+)"""".r.findFirstMatchIn(t)
        .map(_.group(1)))

  private def writeGeneration(spark: SparkSession, path: String): Unit =
    writeCalFile(spark, path, GenerationFile,
      s""""gen":"${java.util.UUID.randomUUID()}"""")

  /** The post-plan half of the probes' race contract: after a probe has
    * loaded the quantizer/codebooks AND built its data reads (file
    * listings resolved), the index must still be the same GENERATION and
    * unfenced — otherwise the loaded model no longer matches the listed
    * files and pruning would be silently wrong. Loud and retryable, the
    * reader half of [[indexDelete]]'s in-flight-readers contract. A
    * legacy index that predates the marker compares None == None until
    * its first rebuild writes one. */
  private[graft] def requireGenerationUnchanged(spark: SparkSession,
                                                path: String,
                                                gen0: Option[String]): Unit = {
    requireNotRebuilding(spark, path)
    val gen1 = readGeneration(spark, path)
    if (gen0 != gen1) throw new IllegalStateException(
      s"index at $path was rebuilt while this probe was being planned " +
        s"(generation ${gen0.getOrElse("<none>")} -> " +
        s"${gen1.getOrElse("<none>")}): the already-loaded quantizer no " +
        "longer matches the data files — retry the probe")
  }

  /** Calibrate the probe width of a persisted index to a RECALL TARGET,
    * replacing the scaladoc-table-and-judgment step with a measurement:
    * picks the smallest `nProbe` whose measured recall@k meets `target`
    * on the index's own data, persists it to `<path>/nprobe.json`, and
    * returns it — after which [[ivfProbeTopK]]'s DEFAULT probe width is
    * the calibrated one, so callers get the target recall without
    * reading any table. Recalibrate after drift (appended mass moves
    * recall down at a fixed width) or rely on [[ivfMaintain]]'s
    * `recallTarget` to re-check post-rebuild.
    *
    * COST — one bounded measurement, not a sweep: `sampleQueries` rows
    * sampled from the index itself are brute-force scored in ONE pass
    * over the index (the same cost class as a single full-probe query
    * batch). The whole recall-vs-width CURVE then falls out without
    * re-probing: a true neighbor is retrieved at width `p` iff its
    * cell ranks ≤ p among the query's centroid distances — exact-scored
    * probes mean a true top-k member in the probed set always survives
    * ranking — and that cell rank is computable driver-side from the
    * (tiny) centroids and collected sample. Driver memory is bounded by
    * `sampleQueries · k` truth pairs + `sampleQueries` vectors.
    *
    * Truth pairs EXCLUDE the query's own row (ranked top-(k+1), best
    * dropped): self-sampled queries otherwise carry one guaranteed hit
    * per query — up to 1/k of measured recall — that held-out queries
    * never get.
    *
    * The MEASURED curve is the sample's: recall on future query batches
    * matches it insofar as they resemble the corpus distribution (the
    * standard self-calibration assumption; out-of-distribution query
    * streams should calibrate with their own `sampleQueries`-sized batch
    * via the same machinery). Returns the cells/8 floor (uncalibrated
    * default, nothing persisted) on an empty or all-zero-vector index. */
  def nProbeForRecall(spark: SparkSession, path: String, vecCol: String,
                      target: Double, k: Int = 10,
                      sampleQueries: Int = 64, seed: Long = 42L,
                      confidenceZ: Double = 1.0): Int = {
    require(target > 0.0 && target <= 1.0,
      s"recall target must be in (0, 1], got $target")
    require(confidenceZ >= 0.0, "confidenceZ must be >= 0")
    requireNotRebuilding(spark, path)
    // an IVF-PQ index also has data/ + centroids/, so this call would
    // "work" — but its probes read pqcal.json, never nprobe.json, so the
    // calibration would be dead metadata the caller believes is in force
    requireNotIvfPq(spark, path, "its probes read pqcal.json, not " +
      "nprobe.json — calibrate with ivfPqCalibrate instead")
    // generation snapshot BEFORE any model/data read: the persisted
    // artifact carries it, and readers ignore a stamp that no longer
    // matches — so a rebuild completing anywhere during this
    // measurement can never leave a stale width silently in force
    val gen0 = readGeneration(spark, path)
    val centroids = loadCentroids(spark, path)
    val nCells = centroids.length
    val data = spark.read.parquet(s"$path/data")
    val sampled = selfQuerySample(data, vecCol, sampleQueries, seed)
    if (sampled.isEmpty) return math.max(1, nCells / 8)
    val queries = queriesFromSample(spark, sampled, data.schema(vecCol),
      vecCol)
    // exact ground truth in ONE scored pass, reusing the persisted norms;
    // ranking (cosine, cell) directly means no row id is needed — only
    // each true neighbor's CELL matters for the curve
    val q = queries.select(col("__sqid"), col(vecCol).as("__qvec"),
      V.norm(col(vecCol)).as("__qn"))
    val scored = data
      .join(broadcast(q))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    // queries are sampled FROM the index, so each query's raw top-k
    // contains the query row itself (cosine 1, cell rank 1) — a
    // guaranteed hit that would inflate measured recall by up to 1/k
    // (10% at k=10) relative to held-out queries. Rank k+1 candidates
    // and drop the single best-ranked row per query: the self row always
    // ranks first (cosine 1 is maximal; among exact duplicates all
    // copies share the query's vector and hence its cell, so dropping
    // any one copy removes the same cell), leaving k held-out-style
    // truth pairs per query.
    val pairs = rankTopK(scored, "__sqid", "__cell", k + 1)
      .filter(col("rank") > 1)
      .select(col("__sqid"), col("__cell").cast("int"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    if (pairs.isEmpty) return math.max(1, nCells / 8)
    val cellRank: Map[Long, Array[Int]] = cellRanks(sampled, centroids)
    val ranks = pairs.map { case (qid, cell) => cellRank(qid)(cell) }.sorted
    // recall(p) = |ranks <= p| / |pairs|; smallest p meeting the target —
    // PLUS a one-sided finite-sample margin: the bare empirical quantile
    // undershoots on independent queries about half the time (measured
    // 0.87-0.885 at a 0.9 target with 64 queries before the margin), and
    // a query's k truth pairs are correlated, so the binomial unit is the
    // QUERY count, not the pair count. confidenceZ = 1 ≈ 84% one-sided
    // confidence; 0 restores the raw quantile.
    val nQueries = math.max(1, pairs.map(_._1).distinct.length)
    val effTarget = math.min(1.0, target +
      confidenceZ * math.sqrt(target * (1.0 - target) / nQueries))
    val need = math.ceil(effTarget * ranks.length).toInt
    val chosen = if (need <= 0) 1 else ranks(need - 1)
    val measured = ranks.count(_ <= chosen).toDouble / ranks.length
    writeCalFile(spark, path, NProbeFile,
      s""""nprobe":$chosen,"target":$target,"measured_recall":$measured,""" +
        s""""k":$k,"sample_queries":${sampled.length},"cells":$nCells,""" +
        s""""gen":"${gen0.getOrElse("none")}"""")
    chosen
  }

  /** Hash-ordered bounded self-sample of a relation's vector rows — the
    * recall-calibration query batch ([[nProbeForRecall]],
    * [[pqShortlistForRecall]], [[ivfPqCalibrate]]). Samples ~4× the
    * needed rows, then cuts to `sampleQueries` under a HASH order: a
    * bare limit() takes the scan's first partitions — the lowest
    * `__cell=` directories of a cell-partitioned index — and a sample
    * concentrated in one corner of the space calibrates a width that is
    * silently too narrow for everyone else (measured: chosen 3 of 44
    * cells, actual recall 0.4 at a 0.9 target, before this order was
    * added). The sort is over the ~4·sampleQueries sampled rows, not
    * the corpus. */
  private def selfQuerySample(rel: DataFrame, vecCol: String,
                              sampleQueries: Int, seed: Long)
      : Array[(Long, org.apache.spark.sql.Row)] = {
    val total = rel.count()
    val fraction = math.min(1.0, sampleQueries * 4.0 / math.max(1L, total))
    rel.select(col(vecCol))
      .sample(withReplacement = false, fraction, seed)
      .sort(xxhash64(col(vecCol)))
      .limit(sampleQueries)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r) }
  }

  /** The [[selfQuerySample]] rows as a (`__sqid`, vector) query batch. */
  private def queriesFromSample(spark: SparkSession,
                                sampled: Array[(Long, org.apache.spark.sql.Row)],
                                vecField: org.apache.spark.sql.types.StructField,
                                vecCol: String): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(sampled.map { case (i, r) =>
        org.apache.spark.sql.Row(i, r.get(0)) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__sqid",
          org.apache.spark.sql.types.LongType),
        vecField.copy(name = vecCol))))

  /** Per-query cell ranking by quantizer distance — driver-side over the
    * in-hand sample and the (nCells-bounded) centroids, identical order
    * to [[cellDistStructs]]: (‖c‖² − 2 q·c, cellId) ascending. */
  private def cellRanks(sampled: Array[(Long, org.apache.spark.sql.Row)],
                        centroids: Array[Array[Double]])
      : Map[Long, Array[Int]] =
    sampled.map { case (qid, r) =>
      val q = r.getSeq[Number](0).map(_.doubleValue).toArray
      val order = centroids.zipWithIndex.map { case (c, i) =>
        var dot = 0.0; var n2 = 0.0; var j = 0
        while (j < c.length) { dot += q(j) * c(j); n2 += c(j) * c(j); j += 1 }
        (n2 - 2.0 * dot, i)
      }.sortBy(identity).map(_._2)
      val rank = new Array[Int](centroids.length)
      order.zipWithIndex.foreach { case (cell, idx) => rank(cell) = idx + 1 }
      qid -> rank
    }.toMap

  /** Exact ground truth for self-sampled calibration queries with the
    * self row DROPPED (rank-(k+1), best removed — the [[nProbeForRecall]]
    * discipline: self-sampled queries otherwise carry one guaranteed hit
    * per query, inflating measured recall by up to 1/k relative to
    * held-out queries). Returns (`__sqid`, idCol-as-long) pairs. */
  private def selfTruthPairs(corpus: DataFrame, queries: DataFrame,
                             vecCol: String, idCol: String,
                             k: Int): DataFrame =
    bruteForceTopK(corpus, queries, vecCol, idCol, "__sqid", k + 1)
      .filter(col("rank") > 1)
      .select(col("__sqid"), col(idCol))

  /** Smallest count of truth pairs that must be retrieved to meet
    * `target` plus the one-sided finite-sample margin — the bare
    * empirical quantile undershoots on independent queries about half
    * the time, and a query's k truth pairs are correlated, so the
    * binomial unit is the QUERY count, not the pair count
    * (see [[nProbeForRecall]]'s margin note). */
  private def neededCount(target: Double, confidenceZ: Double,
                          nQueries: Int, nPairs: Int): Int =
    math.max(1, math.ceil(math.min(1.0, target +
      confidenceZ * math.sqrt(target * (1.0 - target) /
        math.max(1, nQueries))) * nPairs).toInt)

  // --------------------------------------- PQ-family recall calibration

  /** Persisted recall calibration for the PQ layouts (see
    * [[pqShortlistForRecall]] / [[ivfPqCalibrate]]): generation-bound
    * metadata, deleted by every codebook refit ([[pqBuild]]/
    * [[ivfPqBuild]] overwrite, the maintain rebuilds) — widths tuned
    * against replaced codebooks are silently miscalibrated, exactly the
    * [[NProbeFile]] rationale. */
  private val PqCalFile = "pqcal.json"

  /** Uncalibrated shortlist width: re-rank `4·k` ADC candidates. */
  private val DefaultShortlistFactor = 4

  /** The persisted PQ-family calibration, if the index has been
    * calibrated since its last codebook refit: (nProbe — 0 on flat-PQ,
    * which probes no cells — and the ADC shortlist factor). Torn or
    * pre-sentinel files read as None (see [[readCompleteCalFile]]), and
    * so does a generation stamp that no longer matches the index — the
    * stale-calibration-landed-after-a-rebuild race [[NProbeFile]]
    * documents. */
  def calibratedPqWidths(spark: SparkSession,
                         path: String): Option[(Int, Int)] =
    calibratedPqWidthsAt(spark, path, readGeneration(spark, path))

  /** [[calibratedPqWidths]] against an ALREADY-READ generation — see
    * [[calibratedNProbeAt]]. */
  private[graft] def calibratedPqWidthsAt(spark: SparkSession, path: String,
                                          gen: Option[String])
      : Option[(Int, Int)] =
    readCompleteCalFile(spark, path, PqCalFile)
      .filter(calStampMatches(_, gen))
      .flatMap { text =>
        for {
          np <- """"nprobe"\s*:\s*(\d+)""".r.findFirstMatchIn(text)
            .map(_.group(1).toInt)
          f <- """"shortlist_factor"\s*:\s*(\d+)""".r.findFirstMatchIn(text)
            .map(_.group(1).toInt)
        } yield (np, f)
      }

  private def writePqCal(spark: SparkSession, path: String, nProbe: Int,
                         factor: Int, target: Double, measured: Double,
                         k: Int, nQueries: Int, cells: Int,
                         gen: Option[String]): Unit =
    writeCalFile(spark, path, PqCalFile,
      s""""nprobe":$nProbe,"shortlist_factor":$factor,""" +
        s""""target":$target,"measured_recall":$measured,"k":$k,""" +
        s""""sample_queries":$nQueries,"cells":$cells,""" +
        s""""gen":"${gen.getOrElse("none")}"""")

  /** Calibrate a [[pqBuild]] flat-PQ index's SHORTLIST width to a recall
    * target — the PQ analogue of [[nProbeForRecall]], closing the gap
    * where a [[pqMaintain]] rebuild restores quantization quality (the
    * MQE gauge reads ≈ 1 again) but recall stays depressed: the refitted
    * codebooks spread their capacity over the GROWN corpus, so the
    * shortlist width that met a recall target before the drift ranks too
    * few candidates after it. Picks the smallest `shortlistFactor` whose
    * measured recall@k meets `target` on the index's own data, persists
    * it to `<path>/pqcal.json`, and returns it — after which
    * [[pqProbeTopK]]'s DEFAULT shortlist width is the calibrated one.
    *
    * COST — one bounded measurement, not a sweep: `sampleQueries`
    * self-sampled queries are (a) brute-force scored for exact ground
    * truth (one vectors scan — [[nProbeForRecall]]'s cost class), and
    * (b) ADC-scored against the NARROW codes relation to locate each
    * true neighbor's exact shortlist RANK (1 + rows scoring ahead of it
    * under the shortlist's (cosine desc, id asc) order — one codes scan
    * with broadcast thresholds). The recall-vs-width CURVE then falls
    * out driver-side without re-probing: a true neighbor is retrieved at
    * width S iff its ADC rank ≤ S — exact-scored re-ranking means a true
    * top-k member in the shortlist always survives. Driver memory:
    * `sampleQueries`·k truth pairs + `sampleQueries` vectors. Same
    * self-calibration assumption and one-sided `confidenceZ` margin as
    * [[nProbeForRecall]], but the PQ-family DEFAULT is z = 2 (vs IVF's
    * 1): ADC rank quality varies with the codebook DRAW and splits by
    * query REGIME on mixed corpora — measured per-regime external recall
    * spread ±0.05 around the on-sample number across k-means draws
    * (SCALEPROBE `pq_drift`), beyond what the per-query binomial term
    * covers — so external batches land AT or above the stated target
    * instead of distributed around it. The stronger margin costs
    * shortlist width, never scan width.
    *
    * The persisted factor is capped at `maxShortlistFactor` — the
    * re-rank join's fan-in is Q·factor·k, and an unreachable target must
    * not silently turn every probe into a near-full re-rank; the
    * artifact's `measured_recall` records what the cap actually achieves.
    * Returns the uncalibrated default (4), persisting nothing, on an
    * empty or all-zero-vector index. */
  def pqShortlistForRecall(spark: SparkSession, path: String,
                           vecCol: String, idCol: String, target: Double,
                           k: Int = 10, sampleQueries: Int = 64,
                           seed: Long = 42L, confidenceZ: Double = 2.0,
                           maxShortlistFactor: Int = 64): Int = {
    require(target > 0.0 && target <= 1.0,
      s"recall target must be in (0, 1], got $target")
    require(confidenceZ >= 0.0, "confidenceZ must be >= 0")
    require(maxShortlistFactor >= 1, "maxShortlistFactor must be >= 1")
    requireNotRebuilding(spark, path)
    val gen0 = readGeneration(spark, path) // see nProbeForRecall's note
    val model = loadPqModel(spark, path)
    val vectors = spark.read.parquet(s"$path/vectors")
    val sampled = selfQuerySample(vectors, vecCol, sampleQueries, seed)
    if (sampled.isEmpty) return DefaultShortlistFactor
    val queries = queriesFromSample(spark, sampled,
      vectors.schema(vecCol), vecCol)
    val truth = selfTruthPairs(vectors.select(col(idCol), col(vecCol)),
      queries, vecCol, idCol, k).localCheckpoint(true)
    val codes = spark.read.parquet(s"$path/codes")
    val q = withQueryNorm(queries, Seq(idCol), "__sqid", vecCol)
    val pairRanks = adcTruthRanks(codes.select(col(idCol), col("__codes"),
      col("__cn")), q, model, truth, idCol)
    if (pairRanks.isEmpty) return DefaultShortlistFactor
    val nQ = pairRanks.map(_._1).distinct.length
    val need = neededCount(target, confidenceZ, nQ, pairRanks.length)
    val sorted = pairRanks.map(_._2).sorted
    val wantK = if (need > sorted.length) sorted.last else sorted(need - 1)
    val factor = math.min(maxShortlistFactor.toLong,
      math.max(1L, (wantK + k - 1) / k)).toInt
    val measured =
      sorted.count(_ <= factor.toLong * k).toDouble / sorted.length
    writePqCal(spark, path, 0, factor, target, measured, k,
      sampled.length, 0, gen0)
    factor
  }

  /** Each truth pair's exact ADC shortlist rank: 1 + the number of
    * corpus rows scoring AHEAD of the true neighbor under the
    * shortlist's (cosine desc, id asc) order. Two bounded scans of the
    * narrow encoded relation: thresholds (corpus restricted to the ≤ Q·k
    * truth ids via a broadcast join), then competitor counts (full ADC
    * scan against broadcast thresholds, grouped to ≤ Q·k rows). Returns
    * (`__sqid`, rank) per truth pair. */
  private def adcTruthRanks(encoded: DataFrame, q: DataFrame,
                            model: PqModel, truth: DataFrame,
                            idCol: String): Array[(Long, Long)] = {
    val truthIds = truth.select(col(idCol)).distinct()
    val thresholds = adcScored(encoded.join(broadcast(truthIds),
        Seq(idCol)), q, model, Seq.empty)
      .join(broadcast(truth), Seq("__sqid", idCol))
      .filter(col("cosine").isNotNull)
      .select(col("__sqid"), col(idCol).cast("long").as("__tid"),
        col("cosine").as("__tcos"))
      .localCheckpoint(true)
    val ahead = adcScored(encoded, q, model, Seq.empty)
      .join(broadcast(thresholds), Seq("__sqid"))
      .filter(col("cosine").isNotNull &&
        (col("cosine") > col("__tcos") ||
          (col("cosine") === col("__tcos") &&
            col(idCol).cast("long") < col("__tid"))))
      .groupBy(col("__sqid"), col("__tid"))
      .agg(count(lit(1)).as("__ahead"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    thresholds.select("__sqid", "__tid").collect()
      .map(r => (r.getLong(0),
        ahead.getOrElse((r.getLong(0), r.getLong(1)), 0L) + 1L))
  }

  /** Calibrate BOTH probe widths of an [[ivfPqBuild]] index — `nProbe`
    * (cells scanned) and the ADC `shortlistFactor` (candidates re-ranked)
    * — to a recall target, and persist them as [[ivfPqProbeTopK]]'s
    * defaults: [[nProbeForRecall]]'s contract for the composed index,
    * where recall is lost at two stages (the true neighbor's cell not
    * probed; its ADC rank beyond the shortlist).
    *
    * ONE bounded measurement covers the whole 2-D width plane: exact
    * ground truth (one scan), each truth pair's cell rank (driver-side
    * vs the tiny centroids), and its ADC competitor counts grouped BY
    * CORPUS CELL (one narrow codes-column scan, ≤ Q·k·nCells grouped
    * rows) — a pair is retrieved at (P, S) iff its cell ranks ≤ P among
    * the query's centroid distances AND 1 + its competitors in cells
    * ranked ≤ P is ≤ S, so every (P, S) evaluates driver-side without
    * re-scanning. Chooses the smallest `nProbe` admitting a within-cap
    * shortlist at the target (probe width dominates cost: the scanned
    * fraction is ≈ nProbe/nCells; the shortlist only sizes the re-rank
    * join's fan-in), then the smallest such shortlist. Falls back to
    * (nCells, `maxShortlistFactor`) when even full probing cannot meet
    * the target under the cap, with the shortfall recorded in the
    * artifact's `measured_recall`. Returns the chosen (nProbe,
    * shortlistFactor); uncalibrated defaults, persisting nothing, on an
    * empty or all-zero-vector index. */
  def ivfPqCalibrate(spark: SparkSession, path: String, vecCol: String,
                     idCol: String, target: Double, k: Int = 10,
                     sampleQueries: Int = 64, seed: Long = 42L,
                     confidenceZ: Double = 2.0,
                     maxShortlistFactor: Int = 64): (Int, Int) = {
    require(target > 0.0 && target <= 1.0,
      s"recall target must be in (0, 1], got $target")
    require(confidenceZ >= 0.0, "confidenceZ must be >= 0")
    require(maxShortlistFactor >= 1, "maxShortlistFactor must be >= 1")
    requireNotRebuilding(spark, path)
    val gen0 = readGeneration(spark, path) // see nProbeForRecall's note
    val centroids = loadCentroids(spark, path)
    val nCells = centroids.length
    val model = loadPqModel(spark, path)
    val data = spark.read.parquet(s"$path/data")
    val uncalibrated = (math.max(1, nCells / 8), DefaultShortlistFactor)
    val sampled = selfQuerySample(data, vecCol, sampleQueries, seed)
    if (sampled.isEmpty) return uncalibrated
    val queries = queriesFromSample(spark, sampled, data.schema(vecCol),
      vecCol)
    val truth = selfTruthPairs(data.select(col(idCol), col(vecCol)),
      queries, vecCol, idCol, k).localCheckpoint(true)
    val q = withQueryNorm(queries, Seq(idCol), "__sqid", vecCol)
    val narrow = data.select(col(idCol), col("__cell"), col("__codes"),
      col("__cn"))
    val truthIds = truth.select(col(idCol)).distinct()
    // thresholds carry the truth row's own ADC score AND its cell
    val thresholds = adcScored(narrow.join(broadcast(truthIds),
        Seq(idCol)), q, model, Seq.empty)
      .join(broadcast(truth), Seq("__sqid", idCol))
      .filter(col("cosine").isNotNull)
      .select(col("__sqid"), col(idCol).cast("long").as("__tid"),
        col("cosine").as("__tcos"), col("__cell").cast("int").as("__tcell"))
      .localCheckpoint(true)
    val pairsArr = thresholds.select("__sqid", "__tid", "__tcell")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    if (pairsArr.isEmpty) return uncalibrated
    // competitor counts PER CORPUS CELL — the cell→probe-rank translation
    // happens driver-side, so any (nProbe, shortlist) pair is evaluable
    // without re-scanning
    val perCell = adcScored(narrow, q, model, Seq.empty)
      .join(broadcast(thresholds.drop("__tcell")), Seq("__sqid"))
      .filter(col("cosine").isNotNull &&
        (col("cosine") > col("__tcos") ||
          (col("cosine") === col("__tcos") &&
            col(idCol).cast("long") < col("__tid"))))
      .groupBy(col("__sqid"), col("__tid"),
        col("__cell").cast("int").as("__ccell"))
      .agg(count(lit(1)).as("__ahead"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getLong(3))))
      .groupBy(_._1)
    val cellRank = cellRanks(sampled, centroids)
    // per-pair: the truth cell's rank, and cumulative competitors over
    // cells ranked ≤ p (so cum(p)+1 is the truth's shortlist rank at
    // probe width p)
    val curves = pairsArr.map { case (sq, tid, tcell) =>
      val rankArr = cellRank(sq)
      val cum = new Array[Long](nCells + 1)
      perCell.getOrElse((sq, tid), Array.empty)
        .foreach { case (_, (ccell, n)) => cum(rankArr(ccell)) += n }
      var p = 1
      while (p <= nCells) { cum(p) += cum(p - 1); p += 1 }
      (rankArr(tcell), cum)
    }
    val nQ = pairsArr.map(_._1).distinct.length
    val need = neededCount(target, confidenceZ, nQ, curves.length)
    var chosen: Option[(Int, Long)] = None
    var p = 1
    while (p <= nCells && chosen.isEmpty) {
      val feas = curves.collect {
        case (tcr, cum) if tcr <= p => cum(p) + 1
      }.sorted
      if (feas.length >= need &&
          feas(need - 1) <= maxShortlistFactor.toLong * k)
        chosen = Some((p, feas(need - 1)))
      p += 1
    }
    val (nProbe, wantK) =
      chosen.getOrElse((nCells, maxShortlistFactor.toLong * k))
    val factor = math.min(maxShortlistFactor.toLong,
      math.max(1L, (wantK + k - 1) / k)).toInt
    val measured = curves.count { case (tcr, cum) =>
      tcr <= nProbe && cum(nProbe) + 1 <= factor.toLong * k
    }.toDouble / curves.length
    writePqCal(spark, path, nProbe, factor, target, measured, k,
      sampled.length, nCells, gen0)
    (nProbe, factor)
  }

  /** Plain-IVF entry points whose semantics would silently corrupt an
    * IVF-PQ index (which ALSO carries `data/` + `centroids/`) call this
    * to refuse it loudly; `hazard` completes the error's "because". */
  private def requireNotIvfPq(spark: SparkSession, path: String,
                              hazard: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "codebooks")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(p),
      s"the index at $path has a codebooks/ relation (a PQ-family " +
        s"layout, not plain IVF); " + hazard)
  }

  /** Readers AND routine writers call this before opening a persisted
    * index: a present marker means a rebuild crashed between its
    * directory swaps (or an overwrite build died half-written) and data/
    * centroids may be MIXED generations — probing would return silently
    * wrong neighbors, and appending would extend the wrong generation, so
    * fail loudly instead. */
  private def requireNotRebuilding(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, RebuildMarker)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) throw new IllegalStateException(
      s"index at $path is marked $RebuildMarker: a rebuild (ivfMaintain " +
        "swap or ivfBuild overwrite) did not complete; restore " +
        "data/centroids from the .old/.staging halves, or rebuild from " +
        "source — a completed ivfBuild rewrites both halves and lifts " +
        "the fence itself")
  }

  /** Probe a corpus persisted by [[ivfBuild]]: the probed cell set (at most
    * queries × nProbe distinct cells, collected driver-side — bounded by
    * nCells) becomes a LITERAL partition filter, so the scan reads only the
    * probed `__cell=` directories (static partition pruning — verified by
    * plan inspection in SimilaritySpec). Scoring reuses the persisted
    * per-row norms. Same output shape and semantics as [[ivfTopK]].
    *
    * What `nProbe` buys (measured: SCALEPROBE.json `ivf_recall_curve`,
    * 20k rotated-replica vectors, 141 √n cells, recall@10 vs brute
    * force):
    *
    *  | nProbe    | scanned | recall@10 |
    *  |-----------|---------|-----------|
    *  | cells/16  | ~6%     | 0.32      |
    *  | cells/8   | ~12%    | 0.47      |
    *  | cells/4   | ~25%    | 0.72      |
    *  | all cells | 100%    | 1.00 (exact) |
    *
    * Recall grows roughly linearly in the scanned fraction on this
    * uniform synthetic corpus — there is no free knee; real embedding
    * corpora cluster, which is what makes small probe budgets pay.
    * Guidance: don't read this table — CALIBRATE. [[nProbeForRecall]]
    * measures the index's own recall curve and persists the width that
    * meets a stated target, which then becomes this method's default
    * (SCALEPROBE `ivf_autotune`: 0.36–0.48 at the uncalibrated cells/8
    * floor → 0.92 calibrated at target 0.9 on drifted data). The
    * `cells/8` fallback only applies to an uncalibrated index; full
    * probe remains the exactness baseline (equivalent to brute force
    * over a pruned-nothing scan).
    *
    * Racing a concurrent [[indexDelete]]/[[ivfMaintain]] swap: either a
    * consistent pre-/post-swap answer or a LOUD retryable failure
    * (fence refusal at plan time, missing-input mid-scan) — never
    * silent partial results; see [[indexDelete]]'s in-flight-readers
    * contract. */
  def ivfProbeTopK(spark: SparkSession, path: String, queries: DataFrame,
                   vecCol: String, idCol: String, queryIdCol: String,
                   k: Int, nProbe: Int = 0): DataFrame = {
    requireNotRebuilding(spark, path)
    val gen0 = readGeneration(spark, path)
    val centroids = loadCentroids(spark, path)
    // nProbe <= 0: a [[nProbeForRecall]]-calibrated index probes its
    // persisted recommendation (recall-targeted, clamped to the cell
    // count); otherwise probe 1/8 of the index's cells — tied to the
    // stored cell count the same way ivfTopK's default is, so a √n-sized
    // index keeps its scored fraction instead of collapsing recall
    val probes =
      if (nProbe > 0) nProbe
      else calibratedNProbeAt(spark, path, gen0)
        .map(c => math.min(math.max(1, c), centroids.length))
        .getOrElse(math.max(1, centroids.length / 8))
    // The probed cells are known BEFORE `data/` needs to open (they come
    // from the centroids and the query batch), so the scan opens ONLY the
    // probed `__cell=` directories instead of discovering the whole tree
    // (guide §6 — a full open lists every cell dir per probe; at
    // object-store scale that is cell-count LIST calls for a probe that
    // touches nProbe of them). One driver-side listStatus of `data/`
    // answers existence; the query batch's schema needs come from a
    // single cell directory (basePath keeps `__cell` a partition column,
    // so the isin filter below stays the PartitionFilters entry the plan
    // contract asserts). See [[readPartitionDirs]] for the driver-side
    // listing above 32 dirs and the drained-subset fallback.
    val existing = partitionDirs(spark, s"$path/data", "__cell")
    val schemaProbe = readPartitionDirs(spark, s"$path/data",
      existing.values.take(1).toSeq)
    // materialize the (small, broadcast-bound) probe-expanded query batch
    // once: both the collected IN-list below and the join read it, and
    // without this the nCells dot-product ranking would run twice
    val q = withProbeCells(
      withQueryNorm(queries, schemaProbe.columns, queryIdCol, vecCol,
        allowed = Set("__cell", "__cn")),
      centroids, probes)
      .localCheckpoint(true)
    val probedCells = q.select("__cell").distinct().collect().map(_.getInt(0))
    val corpus = readPartitionDirs(spark, s"$path/data",
      probedCells.toIndexedSeq.flatMap(existing.get))
    // post-plan race check: centroids were loaded and data listed above —
    // a rebuild completing in between would otherwise prune the NEW
    // files with the OLD centroids (see requireGenerationUnchanged)
    requireGenerationUnchanged(spark, path, gen0)
    val scored = corpus
      .filter(col("__cell").isin(probedCells.toIndexedSeq: _*))
      .join(broadcast(q), Seq("__cell"))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    rankTopK(scored, queryIdCol, idCol, k)
  }

  /** LSH-bucketed approximate top-k: corpus and queries are assigned
    * sign-projection cells; queries probe their own cell and every cell
    * within Hamming distance `probeHamming` of it (multi-probe LSH — the
    * standard recall lever that reuses one table instead of building
    * more). `probes` caps how many of the 1-bit flips participate (legacy
    * knob); the probed-cell count is 1 + C(planes,1) + … up to the
    * hamming radius, so the scored fraction grows combinatorially —
    * radius 2 on 8 planes probes 37/256 ≈ 14% of the corpus. Same output
    * shape as [[bruteForceTopK]]; recall < 1 by construction. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, queryIdCol: String,
              k: Int, nPlanes: Int = 8, dim: Int = 64,
              probes: Int = 8, probeHamming: Int = 1): DataFrame = {
    require(probeHamming >= 1 && probeHamming <= 3,
      "probeHamming must be in [1, 3] — beyond 3 the probe set approaches " +
        "the full cell space; use bruteForceTopK instead")
    val planes = V.hyperplanes(nPlanes, dim)
    val c = corpus
      .withColumn("__cell", V.signBucket(col(vecCol), planes))
      .withColumn("__cn", V.norm(col(vecCol)))
    // query probes: own cell + every XOR mask of weight <= probeHamming
    // over the first `probes` planes (masks are a tiny driver-side list —
    // at most C(planes, <=3) literals — broadcast with the query batch)
    val bits = 0 until math.min(probes, nPlanes)
    val masks = Seq(0L) ++
      bits.map(i => 1L << i) ++
      (if (probeHamming >= 2)
        for (i <- bits; j <- bits if i < j) yield (1L << i) | (1L << j)
      else Seq.empty) ++
      (if (probeHamming >= 3)
        for (i <- bits; j <- bits; l <- bits if i < j && j < l)
          yield (1L << i) | (1L << j) | (1L << l)
      else Seq.empty)
    val probeCells = array(masks.map(lit): _*)
    val q = withQueryNorm(queries, corpus.columns, queryIdCol, vecCol)
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

  // ------------------------------------------------------------ kNN graph

  /** Approximate k-nearest-neighbor SELF-join: every corpus row gets its
    * top-k most-cosine-similar OTHER rows — the kNN graph that
    * cluster-prune dedup ([[graft.operators.Dedup.semanticDedup]]),
    * diversity selection, and graph-based propagation consume.
    *
    * The shape is deliberately NOT `ivfTopK(corpus, queries = corpus)`:
    * that broadcasts the query batch, which for a self-join means
    * broadcasting the whole corpus. Here BOTH sides shuffle on a k-means
    * cell key — the same bounded-sample quantizer as IVF
    * ([[fitCentroids]]), fit over DIRECTIONS ([[unitized]], the
    * cosine-compatible geometry) — and edges form within a cell only: the
    * exchange carries (cell, id, vector) once per candidate row and
    * `nProbe` times per query row, never a pairwise relation, and the
    * per-query top-k is the bounded map-side [[TopKAggregator]]. Expected
    * scored volume is ~nProbe · n²/nCells ≈ n·√n·nProbe at the ~√n
    * [[autoCells]] default — the published cluster-prune cost model
    * (SemDeDup, arXiv:2303.09540 §3), not the n² of a brute-force graph.
    *
    * Approximation: a true neighbor outside every probed cell of its
    * query is missed — recall < 1 by construction; returned cosines are
    * EXACT (same verify arithmetic as [[bruteForceTopK]]). `nProbe`
    * (default 1, the cluster-prune regime) trades recall for scored
    * volume. Cells larger than `maxCell` are dropped from the CANDIDATE
    * side (the fan-out guard every bucketed pair operator here carries;
    * their members still act as queries against other probed cells).
    * Zero vectors have no direction and are excluded from both sides.
    * Requires integral ids; returns (query_id, idCol, cosine, rank),
    * ties by id ascending. */
  def knnJoin(corpus: DataFrame, vecCol: String, idCol: String, k: Int,
              nCells: Int = 0, nProbe: Int = 1, seed: Long = 42L,
              maxCell: Int = 100000, fitSampleFraction: Double = 0.0,
              fitSampleRows: Int = 4096): DataFrame = {
    require(idCol != "query_id",
      "idCol must not be named query_id — the self-join needs both roles")
    // NOT persisted, although three consumers read it (sizing count, fit
    // sample, cell assignment): r22 A/B'd the semanticDedupPairs persist
    // pattern here and it measured ~2× SLOWER steady-state (QueryProfile
    // knn_join 5-pass action 0.9–1.5 s → 2.5–3.3 s) — columnar-caching
    // the float vector + double __unit array columns costs more to write
    // and re-read than recomputing the codegen'd norm/normalize from the
    // scan. The trade flips only when the UPSTREAM pipeline is expensive
    // (semanticDedup's quality-filtered joins), which is exactly where
    // the pattern stays.
    val unit = unitized(corpus, vecCol, idCol)
    val known = unit.count()
    val cells = if (nCells > 0) nCells else autoCells(known)
    val centroids = fitCentroids(unit.select(col("__unit")), "__unit", cells,
      seed, fitSampleFraction, fitSampleRows, knownRows = known)
    // assignment is nCells generated dot products per row and feeds three
    // consumers (size guard, candidate side, query side) — compute it once
    val assigned = unit.withColumn("__cell",
        nearestCell(col("__unit"), centroids))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheAutoRelease.afterFirstUse(assigned)
    // candidate side: home cell only, oversized cells dropped (the cell
    // ids are at most nCells rows — broadcast is trivially safe)
    val bigCells = assigned.groupBy("__cell")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxCell)
      .select("__cell")
    val cand = assigned
      .join(broadcast(bigCells), Seq("__cell"), "left_anti")
      .select(col("__cell"), col(idCol).as("__nid"),
        col(vecCol).as("__nvec"), col("__nrm").as("__nn"))
    // query side: the nProbe nearest cells, exploded to one row per probe
    // (nProbe = 1 probes exactly the home cell — reuse the assignment
    // instead of re-ranking all nCells distances per row)
    val q =
      if (nProbe <= 1)
        assigned.select(col("__cell"), col(idCol).as("query_id"),
          col(vecCol).as("__qvec"), col("__nrm").as("__qn"))
      else assigned
        .withColumn("__probe", slice(
          array_sort(cellDistStructs(col("__unit"), centroids)), 1, nProbe))
        .select(explode(col("__probe.cell")).as("__cell"),
          col(idCol).as("query_id"), col(vecCol).as("__qvec"),
          col("__nrm").as("__qn"))
    val scored = q.join(cand, Seq("__cell"))
      .filter(col("query_id") =!= col("__nid"))
      .withColumn("cosine", V.cosineGivenNorms(
        col("__qvec"), col("__nvec"), col("__qn"), col("__nn")))
      .withColumnRenamed("__nid", idCol)
    rankTopK(scored, "query_id", idCol, k)
  }

  // ------------------------------------------------------------------- PQ

  /** Product-quantization model: `m` subspaces of `dsub` dims each, one
    * `ksub`-entry codebook per subspace (`codebooks(j)(c)` is sub-centroid
    * `c` of subspace `j`). Fit on a bounded driver-side sample like the
    * IVF coarse quantizer; tiny (m·ksub·dsub doubles) and broadcast as
    * literals into the encode/score expressions. */
  final case class PqModel(m: Int, dsub: Int,
                           codebooks: Array[Array[Array[Double]]]) {
    def ksub: Int = codebooks(0).length
    def dim: Int = m * dsub
  }

  /** Fit a PQ codebook set: one bounded sample collect (shared across all
    * subspaces — constant driver work regardless of corpus size), then an
    * independent in-memory k-means per subspace over the sample's
    * subvectors. Deterministic for a fixed seed. `ksub` is capped by the
    * sample size per the usual k-means constraint; 16 (4-bit codes) or
    * 256 (8-bit codes) are the standard choices — at 100 TB the encoded
    * corpus is m bytes + a norm per vector instead of dim floats, the
    * compression that makes exhaustive ADC scans affordable. */
  def fitPq(corpus: DataFrame, vecCol: String, m: Int = 8, ksub: Int = 16,
            seed: Long = 42L, fitSampleRows: Int = 4096): PqModel =
    fitPqWithSample(corpus, vecCol, m, ksub, seed, fitSampleRows)._1

  /** [[fitPq]] plus the fit sample it trained on — the builds use the
    * sample once more to record the BUILD-TIME mean quantization error
    * (the codebook-drift gauge's baseline) without a second collect. */
  private def fitPqWithSample(corpus: DataFrame, vecCol: String, m: Int,
                              ksub: Int, seed: Long, fitSampleRows: Int)
      : (PqModel, Array[Array[Double]]) = {
    val sample = fitSample(corpus, vecCol, targetRows =
      math.max(fitSampleRows, 32 * ksub), seed)
    val dim = sample(0).length
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      // subspace-distinct seed: identical per-subspace data (e.g. tiled
      // vectors) must not yield identical codebooks by seeding accident
      kmeansLocal(sub, ksub, seed + j)
    }
    (PqModel(m, dsub, codebooks), sample)
  }

  /** Mean PQ quantization error of `points` under `model`: the mean over
    * rows of Σ_j min_c ‖sub_j − codebook_j(c)‖² — exactly the quantity
    * [[pqEncode]] minimizes per subspace, so it measures how well the
    * FROZEN codebooks still fit a distribution. Driver-side over a
    * bounded sample (|points|·m·ksub·dsub flops — trivial at the 4096-row
    * gauge sizes). */
  private[graft] def meanQuantizationError(points: Array[Array[Double]],
                                           model: PqModel): Double = {
    require(points.nonEmpty, "cannot gauge an empty sample")
    var total = 0.0
    points.foreach { v =>
      require(v.length == model.dim,
        s"vector dim ${v.length} != model dim ${model.dim}")
      var j = 0
      while (j < model.m) {
        val off = j * model.dsub
        var best = Double.MaxValue
        val book = model.codebooks(j)
        var c = 0
        while (c < book.length) {
          val cb = book(c)
          var d = 0.0
          var i = 0
          while (i < model.dsub) {
            val t = v(off + i) - cb(i); d += t * t; i += 1
          }
          if (d < best) best = d
          c += 1
        }
        total += best
        j += 1
      }
    }
    total / points.length
  }

  /** Bounded fit sample shared by [[fitPq]] (and shaped like
    * [[fitCentroids]]'s auto path): ~`targetRows` vectors collected once. */
  private def fitSample(corpus: DataFrame, vecCol: String,
                        targetRows: Int, seed: Long): Array[Array[Double]] = {
    val points = fitSampleRaw(corpus, vecCol, targetRows, seed)
    require(points.nonEmpty, "cannot fit a quantizer on an empty corpus")
    points
  }

  /** [[fitSample]] without the non-empty requirement — the drift GAUGES
    * use this so an emptied-out relation (e.g. a corpus fully drained by
    * opt-out deletes) reads as "nothing to gauge" instead of crashing the
    * nightly maintenance. */
  private def fitSampleRaw(corpus: DataFrame, vecCol: String,
                           targetRows: Int, seed: Long): Array[Array[Double]] = {
    val vecs = corpus.select(V.toDouble(col(vecCol)).as("__v"))
    val n = vecs.count()
    val sampled =
      if (n <= targetRows) vecs
      else vecs.sample(withReplacement = false,
        math.min(1.0, targetRows.toDouble * 1.1 / n), seed).limit(targetRows)
    sampled.collect().map(_.getSeq[Double](0).toArray)
  }

  /** Scan-side PQ encode: appends `codesCol` (array<int>, one nearest
    * sub-centroid id per subspace) and `normCol` (exact vector norm, kept
    * full-precision so re-ranked cosines stay exact). One generated
    * projection of m·ksub dsub-dim distance computations per row — the
    * same codegen shape as IVF cell assignment. The output minus the raw
    * vector column IS the compressed corpus: persist it once and ADC
    * scans never touch the original floats. */
  def pqEncode(df: DataFrame, vecCol: String, model: PqModel,
               codesCol: String = "__codes",
               normCol: String = "__cn"): DataFrame = {
    // per-subspace NATIVE fused argmin (the same NearestCellExpr kernel
    // cell assignment uses): identical distances (cNorm² − 2·dot, same
    // left-to-right f64 accumulation) and identical lowest-code tie rule
    // as the previous sorted-struct-array form, with zero per-candidate
    // struct/array allocation and the loop compiled into the enclosing
    // whole-stage method — the encode projection was the dominant cost of
    // the inline PQ paths (guide §1.2 step 2: per-task work)
    val codes = array((0 until model.m).map { j =>
      val sub = slice(col(vecCol), j * model.dsub + 1, model.dsub)
      graft.functions.VectorExpressions.nearestCell(sub, model.codebooks(j))
    }: _*)
    df.withColumn(codesCol, codes)
      .withColumn(normCol, V.norm(col(vecCol)))
  }

  /** PQ-ADC approximate top-k with exact re-ranking — the third ANN path
    * (FAISS's `IndexPQ` regime re-expressed as two Spark scans):
    *
    *  1. ADC scan: queries (tiny, broadcast) carry one lookup table per
    *     subspace — LUT(j)(c) = q_j · codebook(j)(c), built as literal-
    *     array expressions. Each corpus row is scored as
    *     Σ_j LUT(j)(code_j): m array lookups instead of a dim-wide dot
    *     product, over codes that at scale live in a persisted encoded
    *     corpus ([[pqEncode]]) m·log2(ksub) bits wide instead of dim
    *     floats — the reason exhaustive scans stay affordable at 100 TB.
    *     The bounded [[TopKAggregator]] keeps a `shortlistFactor`·k
    *     shortlist per query (map-side partials; the exchange carries at
    *     most shortlist·partitions candidates per query).
    *  2. Exact re-rank: the shortlist (Q·shortlist ids, tiny) broadcast-
    *     joins back into the corpus, exact cosine is computed for matched
    *     rows only, and the final k are ranked on EXACT scores — returned
    *     cosines are never approximate (the engine-wide contract); only
    *     recall is, bounded by what the shortlist caught.
    *
    * Same output shape as [[bruteForceTopK]]; deterministic for a fixed
    * seed. Recall rises with `shortlistFactor` (re-rank cost: the second
    * scan's join fan-in) and with `ksub` (encode cost).
    *
    * MEASURED (SCALEPROBE.json `pq_crossover`, 64-dim vectors, 20-query
    * batches, amortized encode, local[32] page-cached, at 20k / 100k /
    * 1M / 4.1M vectors): brute force with the codegen'd dot wins every
    * compute-bound size up to ~1M (0.4–1.2s); at 4.1M it and ADC sit
    * within run-to-run noise of each other (4.6–6.0s across runs) while
    * amortized partition-pruned IVF overtakes both outright (4.2s).
    * Local page-cached numbers show only COMPUTE, where an m-add table
    * loop and a 64-mult compiled dot are close; the ADC path's real
    * advantage is bytes scanned, now MEASURED (SCALEPROBE.json
    * `pq_bytes`, same 1M-vector corpus): the persisted codes relation
    * is 15.6 bytes/row on disk vs the vector relation's 158.3 — a
    * 10.2× narrower exhaustive scan (plan-verified to touch no vector
    * column), which pays exactly at the storage-bandwidth-bound 100 TB
    * scales a local page-cached probe cannot reproduce. The probe also
    * records the caveat: the exact re-rank leg re-reads the vector
    * relation locally, so THIS inline form's full path only wins where
    * the re-rank is a point-lookup rather than a second scan — which is
    * exactly what the persisted index provides: [[pqBuild]] stores the
    * vectors id-bucketed and [[pqProbeTopK]]'s re-rank statically prunes
    * to the shortlist's buckets, landing end-to-end bytes well under the
    * brute leg (SCALEPROBE `pq_bytes_end_to_end`). Prefer the persisted
    * index for repeated query batches at scale; this inline form is the
    * zero-setup path. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             vecCol: String, idCol: String, queryIdCol: String,
             k: Int, m: Int = 8, ksub: Int = 16, shortlistFactor: Int = 4,
             seed: Long = 42L, fitSampleRows: Int = 4096): DataFrame = {
    val model = fitPq(corpus, vecCol, m, ksub, seed, fitSampleRows)
    // the ADC scan reads ONLY (id, codes, norm) — never the raw floats;
    // with a persisted encoded corpus this is the m-bytes-per-vector scan
    val encoded = pqEncode(corpus.select(col(idCol), col(vecCol)),
      vecCol, model).drop(vecCol)
    pqTopKEncoded(encoded, corpus, model, queries, vecCol, idCol,
      queryIdCol, k, shortlistFactor)
  }

  /** [[pqTopK]]'s amortized form: score a PRE-ENCODED corpus (the
    * [[pqEncode]] output minus the raw vector column, typically persisted
    * once and scanned per query batch — fit + encode are paid once, like
    * [[ivfBuild]]). `corpus` supplies the raw vectors for the exact
    * re-rank scan only. */
  def pqTopKEncoded(encoded: DataFrame, corpus: DataFrame, model: PqModel,
                    queries: DataFrame, vecCol: String, idCol: String,
                    queryIdCol: String, k: Int,
                    shortlistFactor: Int = 4): DataFrame = {
    require(shortlistFactor >= 1, "shortlistFactor must be >= 1")
    val shortlist = pqAdcShortlist(encoded, corpus.columns, model, queries,
      vecCol, idCol, queryIdCol, k * shortlistFactor)
    // exact re-rank: shortlist ids broadcast back into the corpus — one
    // more corpus scan, fan-in bounded by Q·shortlist rows
    val qExact = withQueryNorm(queries, corpus.columns, queryIdCol, vecCol)
    val rescored = corpus
      .select(col(idCol).cast("long").as(idCol), col(vecCol),
        V.norm(col(vecCol)).as("__cn"))
      .join(broadcast(shortlist), Seq(idCol))
      .join(broadcast(qExact), Seq(queryIdCol))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    rankTopK(rescored, queryIdCol, idCol, k)
  }

  // ------------------------------------------- persisted flat-PQ index

  /** Id-bucket count for [[pqBuild]]'s vectors relation. What matters is
    * buckets ≫ per-batch shortlist size: the re-rank touches at most one
    * bucket per distinct shortlist id (expected touched fraction ≈
    * shortlist/buckets), so the bytes it reads shrink with the bucket
    * count, not the corpus. ~128 rows/bucket at probe scales, capped at
    * 16384 (local file-count sanity; at real scale bucket count grows
    * with the corpus and the touched fraction only improves). */
  private[graft] def autoIdBuckets(n: Long): Int =
    math.max(64L, math.min(16384L, n / 128L)).toInt

  /** Persist a FLAT PQ index under `path` — the layout that closes PQ's
    * bytes-scanned loop end-to-end (the inline [[pqTopK]] re-rank's full
    * rescan is exactly what this removes):
    *
    *  - `codes/`: (id, __codes, __cn) — the narrow relation the
    *    exhaustive ADC scan reads (measured 15.6 bytes/row vs the
    *    vector relation's 158.3 at 1M×64-dim, SCALEPROBE `pq_bytes`).
    *  - `vectors/`: (id, vector) directory-partitioned by
    *    `__vb = pmod(xxhash64(id), idBuckets)` and sorted by id within
    *    each bucket file — the exact re-rank becomes a statically
    *    partition-pruned POINT LOOKUP of the shortlist's buckets
    *    (≤ one bucket per shortlist id) instead of a second full scan,
    *    so the full path's bytes are codes + touched buckets
    *    (SCALEPROBE `pq_bytes_end_to_end`).
    *  - `codebooks/` + `meta/`: the frozen model and bucket count —
    *    probe-time bucket derivation must hash exactly as the build did.
    *
    * Ids must be integral (hashed as LONG on both sides — an int-typed
    * id column is canonicalized before hashing). Shares the IVF family's
    * `.rebuilding` fence discipline. */
  def pqBuild(corpus: DataFrame, vecCol: String, idCol: String,
              path: String, m: Int = 8, ksub: Int = 16, seed: Long = 42L,
              fitSampleRows: Int = 4096, idBuckets: Int = 0): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(idBuckets >= 0, "idBuckets must be non-negative (0 = auto)")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // fail fast before the auto-bucket count and the codebook fit — see
    // ivfBuild's precheck rationale
    buildPrecheck(spark, fs, root, "pqBuild")
    // the corpus count exists only to size auto-buckets — an explicit
    // idBuckets must not pay a full corpus scan for it
    val buckets =
      if (idBuckets > 0) idBuckets else autoIdBuckets(corpus.count())
    val (model, fitPoints) =
      fitPqWithSample(corpus, vecCol, m, ksub, seed, fitSampleRows)
    // build-time baseline for the codebook-drift gauge (pqDriftStats):
    // the mean quantization error of the fit sample under the codebooks
    // just fitted to it. Measured on the TRAINING sample, so it carries
    // k-means' small in-sample optimism — an undrifted gauge reads
    // slightly above 1.0, which maxDrift thresholds >= 1.5 clear safely.
    val fitMqe = meanQuantizationError(fitPoints, model)
    // writer lease held across all four relation writes (acquire-or-
    // create) — see ivfBuild: a build racing a live pqAppend must refuse,
    // not replace codes/vectors mid-append
    withMutationLease(spark, fs, root, "pqBuild", createRoot = true) {
      val marker = new org.apache.hadoop.fs.Path(root, RebuildMarker)
      fs.create(marker, true).close()
      // a shortlist calibration tuned against the codebooks this build
      // replaces would be silently wrong-generation metadata (the
      // NProbeFile rationale)
      fs.delete(new org.apache.hadoop.fs.Path(root, PqCalFile), false)
      pqEncode(corpus.select(col(idCol), col(vecCol)), vecCol, model)
        .drop(vecCol)
        .write.mode("overwrite").parquet(s"$path/codes")
      corpus.select(col(idCol), col(vecCol))
        .withColumn("__vb", pmod(xxhash64(col(idCol).cast("long")),
          lit(buckets.toLong)).cast("int"))
        // one exchange on the bucket id, then a task-local sort: each
        // bucket lands in ONE file, sorted by id (tight row-group min/max
        // stats for within-bucket pruning at real row-group counts)
        .repartition(col("__vb"))
        .sortWithinPartitions(col("__vb"), col(idCol))
        .write.mode("overwrite").partitionBy("__vb").parquet(s"$path/vectors")
      model.codebooks.zipWithIndex
        .flatMap { case (book, j) =>
          book.zipWithIndex.map { case (c, code) => (j, code, c.toSeq) }
        }.toSeq
        .toDF("subspace", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
      Seq((buckets, fitMqe)).toDF("id_buckets", "fit_mqe")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
      writeGeneration(spark, path)
      fs.delete(marker, false)
    }
    Seq("codes", "vectors", "codebooks", "meta").foreach(d =>
      spark.catalog.refreshByPath(s"$path/$d"))
  }

  /** Extend a persisted flat-PQ index in place: new rows are encoded
    * with the STANDING codebooks and their vectors land in their
    * id-buckets under the PERSISTED bucket count — append-only part
    * files into both relations, with [[ivfPqAppend]]'s
    * prefix-visibility contract (a concurrent probe sees a consistent
    * smaller index, never torn metadata). Refuses a fenced index. What
    * drifts under a shifted distribution is codebook FIT quality (ADC
    * shortlist error, hence recall), never the exact re-rank's scores —
    * [[pqDriftStats]] gauges it against the build-time baseline and
    * [[pqMaintain]] rebuilds automatically past a threshold, the IVF
    * family's maintenance rationale. */
  def pqAppend(newRows: DataFrame, vecCol: String, idCol: String,
               path: String): Unit = {
    val spark = newRows.sparkSession
    requireNotRebuilding(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // lease HELD across codebook read + both writes (see ivfAppend): a
    // mutation acquiring it mid-append can no longer swap away the
    // in-flight rows, and the codes can never be encoded against
    // codebooks a concurrent rebuild replaced between read and write
    withMutationLease(spark, fs, root, "pqAppend", AppendLeaseHint) {
      val model = loadPqModel(spark, path)
      val buckets = spark.read.parquet(s"$path/meta")
        .select("id_buckets").collect()(0).getInt(0)
      // vectors FIRST, codes second: the ADC shortlist scans codes/, the
      // re-rank joins vectors/ — a probe racing this append must never
      // shortlist an id whose vector is not yet readable (the inner re-rank
      // join would silently drop it, displacing true top-k candidates).
      // Vectors without codes are invisible to the ADC scan, so this order
      // gives the true consistent-prefix the contract promises.
      newRows.select(col(idCol), col(vecCol))
        .withColumn("__vb", pmod(xxhash64(col(idCol).cast("long")),
          lit(buckets.toLong)).cast("int"))
        .repartition(col("__vb"))
        .sortWithinPartitions(col("__vb"), col(idCol))
        .write.mode("append").partitionBy("__vb").parquet(s"$path/vectors")
      pqEncode(newRows.select(col(idCol), col(vecCol)), vecCol, model)
        .drop(vecCol)
        .write.mode("append").parquet(s"$path/codes")
    }
    Seq("codes", "vectors").foreach(d =>
      spark.catalog.refreshByPath(s"$path/$d"))
  }

  /** Codebook-drift report for a persisted PQ-coded index: `fitMqe` is
    * the build-time mean quantization error (recorded by the build from
    * its own fit sample), `currentMqe` the same statistic over a fresh
    * bounded sample of the corpus AS STORED TODAY under the FROZEN
    * codebooks. `ratio` ≈ 1 right after a build; appended mass from a
    * shifted distribution quantizes worse, the ratio grows, and with it
    * the ADC shortlist's score error — hence recall — degrades, SILENTLY
    * (the exact re-rank keeps returned scores exact, so nothing else
    * fails loudly). The maintain paths rebuild past a ratio threshold. */
  final case class PqDriftStats(fitMqe: Double, currentMqe: Double) {
    def ratio: Double =
      if (fitMqe > 0) currentMqe / fitMqe
      else if (currentMqe == 0) 1.0
      else Double.PositiveInfinity
  }

  /** Build-time MQE baseline from an index's `meta/` relation; loud on
    * indexes built before the gauge existed. */
  private def readFitMqe(spark: SparkSession, path: String,
                         rebuildHint: String): Double = {
    val p = new org.apache.hadoop.fs.Path(path, "meta")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"index at $path predates the codebook-drift gauge (no meta/ " +
        s"relation); rebuild with $rebuildHint to record the baseline")
    val meta = spark.read.parquet(s"$path/meta")
    require(meta.columns.contains("fit_mqe"),
      s"index at $path predates the codebook-drift gauge (no fit_mqe " +
        s"baseline in meta/); rebuild with $rebuildHint to record one")
    meta.select(col("fit_mqe")).collect()(0).getDouble(0)
  }

  /** None = nothing to gauge (the relation is empty — e.g. fully drained
    * by opt-out deletes); maintain paths treat that as "ok". */
  private def pqDriftFrom(spark: SparkSession, path: String,
                          vectorsRel: String, vecCol: String,
                          rebuildHint: String, seed: Long,
                          sampleRows: Int,
                          sampleFiles: Int): Option[PqDriftStats] = {
    requireNotRebuilding(spark, path)
    val model = loadPqModel(spark, path)
    val fit = readFitMqe(spark, path, rebuildHint)
    val sample = gaugeSample(spark, s"$path/$vectorsRel", vecCol,
      sampleRows, seed, sampleFiles)
    if (sample.isEmpty) None
    else Some(PqDriftStats(fit, meanQuantizationError(sample, model)))
  }

  /** Bounded gauge sample: fit-sample within a deterministic SUBSET of
    * the relation's part files instead of over the whole relation — a
    * full-relation uniform row sample must scan essentially every row
    * group of the (dominant-bytes) vector column just to materialize a
    * few thousand rows, making the nightly "ok" answer cost O(corpus),
    * the exact full-scan-on-the-common-night economy the z-order gauge's
    * bucket sampling exists to avoid. File selection is SIZE-WEIGHTED
    * (Efraimidis–Spirakis order sampling with a hashed-path uniform, so
    * it is deterministic for an index state and re-draws as the file set
    * changes): a file's inclusion probability is proportional to its
    * BYTES ≈ its row share, so a drifted append concentrated in a few
    * LARGE files is near-certainly sampled — uniform per-file selection
    * could permanently exclude it — while a batch whose byte share is
    * negligible is exactly the batch that cannot move the corpus-level
    * MQE ratio this gauge measures. Whole-file (clustered) sampling adds
    * variance a drift-vs-2× threshold easily tolerates. Uncommitted
    * write debris is excluded the way Spark's own directory reads do it:
    * any path COMPONENT starting with `_`/`.` (e.g. a crashed append's
    * `_temporary` tree) disqualifies the file. Cost: one driver file
    * listing (O(files) metadata) plus a ≤ `maxFiles`-file read; a
    * relation with ≤ `maxFiles` files reads in full, exactly as before. */
  private def gaugeSample(spark: SparkSession, relDir: String,
                          vecCol: String, sampleRows: Int, seed: Long,
                          maxFiles: Int): Array[Array[Double]] = {
    require(maxFiles >= 1, "sampleFiles must be >= 1")
    val p = new org.apache.hadoop.fs.Path(relDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val baseDepth = fs.makeQualified(p).depth()
    // visible = no hidden/temporary component anywhere below the relation
    // root (the leaf name is checked by the same climb)
    def visible(fp: org.apache.hadoop.fs.Path): Boolean = {
      var q = fp
      while (q != null && q.depth() > baseDepth) {
        val n = q.getName
        // Spark's own hidden-path rule: `_`-prefixed components are
        // metadata/temporary (e.g. _temporary, _SUCCESS) UNLESS they are
        // partition directories (they contain '='— __cell=3, __vb=7)
        if (n.startsWith(".") || (n.startsWith("_") && !n.contains("=")))
          return false
        q = q.getParent
      }
      true
    }
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          visible(st.getPath))
        files += ((st.getPath.toString, st.getLen))
    }
    // an emptied-out relation (e.g. fully drained by opt-out deletes) has
    // nothing to gauge: empty sample, maintain paths degrade to "ok" the
    // way zOrderMaintain does, instead of crashing the nightly run
    if (files.isEmpty) return Array.empty
    val picked =
      if (files.size <= maxFiles) files.toSeq.map(_._1)
      else files.toSeq.sortBy { case (f, len) =>
        // Efraimidis–Spirakis key: -ln(u)/w with u from the path hash —
        // smallest keys form a size-weighted sample without replacement
        val h = scala.util.hashing.MurmurHash3.stringHash(f, seed.toInt)
        val u = ((h & 0x7fffffff).toDouble + 1.0) / (Int.MaxValue.toDouble + 2.0)
        (-math.log(u) / math.max(1L, len).toDouble, f)
      }.take(maxFiles).map(_._1)
    fitSampleRaw(spark.read.parquet(picked: _*).select(col(vecCol)),
      vecCol, sampleRows, seed)
  }

  /** Codebook-drift gauge for a [[pqBuild]] flat-PQ index — one bounded
    * file-sampled read of the vectors relation (never a full scan; see
    * [[gaugeSample]]) plus driver-side arithmetic; see [[PqDriftStats]].
    * Loud on an EMPTY vectors relation (a direct gauge of nothing is a
    * caller error); [[pqMaintain]] degrades the same case to "ok". */
  def pqDriftStats(spark: SparkSession, path: String, vecCol: String,
                   seed: Long = 42L, sampleRows: Int = 4096,
                   sampleFiles: Int = 16): PqDriftStats =
    pqDriftFrom(spark, path, "vectors", vecCol, "pqBuild", seed,
      sampleRows, sampleFiles).getOrElse(throw new IllegalStateException(
      s"nothing to gauge at $path: the vectors relation is empty " +
        "(fully drained corpus) — pqMaintain reports this case as \"ok\""))

  /** Codebook-drift automation for a [[pqBuild]] flat-PQ index — the
    * missing leg of the maintenance doctrine ([[ivfMaintain]] watches
    * cell skew/growth, `Layout.zOrderMaintain` watches rank balance;
    * until this, [[pqAppend]] could encode a drifting distribution
    * against frozen codebooks forever with no gauge or trigger). Reads
    * [[pqDriftStats]] (bounded sample, no full scan) and, when
    * `currentMqe` exceeds `maxDrift` × the build-time baseline, rebuilds
    * the whole index from its own stored vectors under the
    * [[ivfMaintain]]-style staged swap + `.rebuilding` fence: fresh
    * codebooks fitted on the CURRENT distribution, every row re-encoded,
    * id-bucket count re-derived for the grown corpus, and a fresh
    * baseline recorded — so the next gauge reads ≈ 1 again. Returns
    * `"ok"` or `"rebuilt"` for schedulers to log/alert on.
    *
    * `maxDrift` is in baseline units: 2.0 means "typical row quantizes
    * 2× worse than at build time". The baseline carries k-means'
    * in-sample optimism (see [[pqBuild]]), so thresholds below ~1.5
    * would fire on healthy indexes.
    *
    * `fitSampleRows` budgets the REBUILD's k-means fit;
    * `gaugeSampleRows`/`gaugeSampleFiles` budget the nightly drift GAUGE
    * — two independent knobs (a bigger codebook fit should not silently
    * make every "ok" night read more of the store, and vice versa). An
    * EMPTY vectors relation (corpus fully drained by opt-out deletes)
    * reports "ok" and skips, like `Layout.zOrderMaintain`.
    *
    * `recallTarget`: a rebuild restores quantization quality (MQE ≈ 1)
    * but NOT necessarily recall at the standing shortlist width — the
    * refitted codebooks now cover the grown corpus, so the width that
    * met a recall target before the drift may be too narrow after it.
    * When set, a rebuild is followed by [[pqShortlistForRecall]] at this
    * target (recall@`recallK`), so [[pqProbeTopK]]'s default width keeps
    * the recall contract across rebuilds — [[ivfMaintain]]'s
    * `recallTarget` semantics for the flat-PQ layout. */
  def pqMaintain(spark: SparkSession, path: String, vecCol: String,
                 idCol: String, maxDrift: Double = 2.0, seed: Long = 42L,
                 fitSampleRows: Int = 4096, gaugeSampleRows: Int = 4096,
                 gaugeSampleFiles: Int = 16,
                 recallTarget: Option[Double] = None,
                 recallK: Int = 10,
                 maxShortlistFactor: Int = 64): String = {
    require(maxDrift > 1.0, "maxDrift must exceed 1 (1 = freshly fit)")
    val drift = pqDriftFrom(spark, path, "vectors", vecCol, "pqBuild",
      seed, gaugeSampleRows, gaugeSampleFiles)
    if (drift.forall(_.ratio <= maxDrift)) "ok"
    else {
      val model = loadPqModel(spark, path)
      // drop the calibration BEFORE the rebuild: widths tuned against the
      // codebooks about to be replaced are wrong-generation metadata, and
      // deleting after the swap would leave them silently in force if a
      // crash lands between the fence lift and the delete — losing the
      // calibration on an UNCHANGED index (build crashed pre-swap) only
      // degrades probes to the conservative defaults
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      // writer lease across staging-read + swap (see withMutationLease):
      // an append inside the window would be silently dropped by the
      // swap — appends hold the same lease, so it cannot start here
      withMutationLease(spark, fs, root, "pqMaintain") {
        fs.delete(new org.apache.hadoop.fs.Path(path, PqCalFile), false)
        // original columns only; bucket count re-derived (idBuckets = 0)
        // because the corpus has grown since the recorded one was sized
        val data = spark.read.parquet(s"$path/vectors").drop("__vb")
        stagedRebuild(spark, path,
          Seq("codes", "vectors", "codebooks", "meta")) { staging =>
          pqBuild(data, vecCol, idCol, staging, m = model.m,
            ksub = model.ksub, seed = seed, fitSampleRows = fitSampleRows)
        }
      }
      recallTarget.foreach(t => pqShortlistForRecall(spark, path, vecCol,
        idCol, t, k = recallK, seed = seed,
        maxShortlistFactor = maxShortlistFactor))
      "rebuilt"
    }
  }

  /** ONE driver-side listing of a directory-partitioned relation's root:
    * the `partCol=value` child directories as value → absolute path. The
    * probes previously checked candidate dirs with one `fs.exists` RPC
    * EACH — |touched| serial round trips at object-store latency — where
    * a single `listStatus` of the parent answers every membership
    * question in one call (guide §6: listing is the hidden cost of
    * partitioned reads). Missing root = no dirs, same as all-exists-false. */
  private def partitionDirs(spark: SparkSession, root: String,
                            partCol: String): Map[Int, String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) Map.empty
    else fs.listStatus(rootPath).iterator
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(s"$partCol="))
          n.stripPrefix(s"$partCol=").toIntOption
            .map(_ -> st.getPath.toString)
        else None
      }.toMap
  }

  /** Read ONLY the named partition directories of the tree at `root`
    * (guide §6): `basePath` keeps the partition column in the schema so
    * the caller's `isin` filter stays a PartitionFilters entry — the plan
    * contract the specs assert. Above the default 32-path
    * parallel-discovery threshold the listing runs DRIVER-SIDE via a
    * private cloned session with a raised threshold (a |dirs|-task
    * listing job per probe is pure scheduling overhead for a bounded,
    * shortlist-sized path set). Falls back to the full tree when the
    * subset holds no data files (schema inference fails — a drain that
    * deleted every file but left the directories); with `dirs` empty the
    * full tree is read directly, preserving the callers' empty-input
    * semantics. */
  private def readPartitionDirs(spark: SparkSession, root: String,
                                dirs: Seq[String]): DataFrame =
    if (dirs.isEmpty) spark.read.parquet(root)
    else {
      val reader =
        if (dirs.size <= 32) spark
        else {
          val cloned = org.apache.spark.sql.graftbridge.Bridge
            .cloneSession(spark)
          cloned.conf.set(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            math.max(32, dirs.size).toString)
          cloned
        }
      try reader.read.option("basePath", root).parquet(dirs: _*)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          spark.read.parquet(root)
      }
    }

  /** The driver-side loads a flat-PQ probe needs, factored so a caller
    * issuing SEVERAL probes against the SAME index inside one query
    * construction (`pq_calibrated_topk` compares the sentinel-default
    * probe against the explicit calibrated width) pays ONE set of
    * model/meta/cal/generation reads instead of one per probe. NOT a
    * cross-run or cross-query cache: a state value lives only as a local
    * inside one construction, and the race contract is unchanged — every
    * probe built from it re-checks the generation post-plan against the
    * snapshot taken here. */
  private[graft] final case class PqProbeState(
      gen0: Option[String], model: PqModel, buckets: Int, codes: DataFrame,
      cal: Option[(Int, Int)])

  private[graft] def pqProbeState(spark: SparkSession,
                                  path: String): PqProbeState = {
    requireNotRebuilding(spark, path)
    val gen0 = readGeneration(spark, path)
    PqProbeState(gen0, loadPqModel(spark, path),
      spark.read.parquet(s"$path/meta")
        .select("id_buckets").collect()(0).getInt(0),
      spark.read.parquet(s"$path/codes"),
      calibratedPqWidthsAt(spark, path, gen0))
  }

  /** Shortlist + touched-bucket set for a [[pqBuild]] index: the ADC
    * codes-only scan ranks a `shortlistK` shortlist per query, and the
    * shortlist ids hash (with the PERSISTED bucket count) to the vector
    * buckets the re-rank must read. The shortlist is eagerly
    * materialized — it feeds both the bucket-set collect and the re-rank
    * join, and an unmaterialized plan would run the ADC scan twice.
    * Driver state: Q·shortlistK (id, bucket) rows. Factored out so the
    * `pq_bytes_end_to_end` probe can meter the pruned leg's bytes from
    * the same bucket set the query uses. */
  private[graft] def pqShortlistAndBuckets(
      spark: SparkSession, path: String, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      shortlistK: Int): (DataFrame, Array[Int]) =
    pqShortlistAndBucketsFrom(pqProbeState(spark, path), queries,
      vecCol, idCol, queryIdCol, shortlistK)

  private def pqShortlistAndBucketsFrom(
      st: PqProbeState, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      shortlistK: Int): (DataFrame, Array[Int]) = {
    val shortlist = rankTopK(
      adcScored(st.codes, withQueryNorm(queries, Seq(idCol), queryIdCol,
        vecCol), st.model, Seq.empty),
      queryIdCol, idCol, shortlistK)
      .select(col(queryIdCol), col(idCol))
      .localCheckpoint(true)
    val touched = shortlist
      .select(pmod(xxhash64(col(idCol).cast("long")), lit(st.buckets.toLong))
        .cast("int").as("__vb"))
      .distinct().collect().map(_.getInt(0))
    (shortlist, touched)
  }

  /** Probe a [[pqBuild]] index: exhaustive ADC over the narrow codes
    * relation, then an exact re-rank that reads ONLY the shortlist ids'
    * buckets of the vectors relation — a static partition filter, so the
    * full path's bytes are codes + (touched/buckets)·vectors instead of
    * codes + vectors (measured 0.2× of the brute leg at 1M vectors,
    * SCALEPROBE `pq_bytes_end_to_end`; the inline [[pqTopK]] documents
    * the full-rescan caveat this removes). Same output shape and
    * exact-returned-cosines contract as [[bruteForceTopK]];
    * deterministic for the build's seed. Racing a concurrent
    * [[indexDelete]]/[[pqMaintain]] swap: consistent answer or LOUD
    * retryable failure, never silent partial results — see
    * [[indexDelete]]'s in-flight-readers contract. */
  def pqProbeTopK(spark: SparkSession, path: String, queries: DataFrame,
                  vecCol: String, idCol: String, queryIdCol: String,
                  k: Int, shortlistFactor: Int = 0): DataFrame =
    pqProbeTopKFrom(pqProbeState(spark, path), spark, path, queries,
      vecCol, idCol, queryIdCol, k, shortlistFactor)

  /** [[pqProbeTopK]] against an already-loaded [[PqProbeState]] — the
    * multi-probe-per-construction form (see [[pqProbeState]]). */
  private[graft] def pqProbeTopKFrom(st: PqProbeState, spark: SparkSession,
                                     path: String, queries: DataFrame,
                                     vecCol: String, idCol: String,
                                     queryIdCol: String, k: Int,
                                     shortlistFactor: Int = 0): DataFrame = {
    // 0 (the default) = the pqShortlistForRecall-calibrated width when
    // the index carries one, else the uncalibrated 4 — nProbeForRecall's
    // calibrated-default contract for the flat-PQ layout
    require(shortlistFactor >= 0,
      "shortlistFactor must be >= 0 (0 = calibrated default)")
    val factor =
      if (shortlistFactor > 0) shortlistFactor
      else st.cal.map(_._2).getOrElse(DefaultShortlistFactor)
    val (shortlist, touched) = pqShortlistAndBucketsFrom(st, queries,
      vecCol, idCol, queryIdCol, k * factor)
    // The shortlist names its buckets BEFORE the vectors relation is ever
    // opened, so list ONLY the touched bucket directories instead of the
    // whole id-bucketed tree (guide §6: directory listing is the hidden
    // cost of partitioned reads — a full `vectors/` open lists every
    // bucket dir, which at the 256-bucket fixture already runs a 256-task
    // discovery job per probe and at object-store scale is bucket-count
    // LIST calls for a probe that touches a handful). Dir existence comes
    // from ONE listStatus of `vectors/` instead of |touched| serial
    // exists() RPCs; missing dirs (a bucket fully drained by deletes) are
    // skipped the same way the full listing would; see
    // [[readPartitionDirs]] for the driver-side listing and the
    // empty-subset fallback. Empty shortlist → empty result with the
    // probe's schema, no paths to read.
    val existing = partitionDirs(spark, s"$path/vectors", "__vb")
    val vectors = readPartitionDirs(spark, s"$path/vectors",
        touched.toIndexedSeq.flatMap(existing.get))
      .filter(col("__vb").isin(touched.toIndexedSeq: _*))
    // post-plan race check: codebooks were loaded and codes/vectors
    // listed above — a rebuild completing in between would re-rank a
    // stale-model shortlist against fresh files
    requireGenerationUnchanged(spark, path, st.gen0)
    val qExact = withQueryNorm(queries, Seq(idCol), queryIdCol, vecCol)
    val rescored = vectors
      .select(col(idCol).cast("long").as(idCol), col(vecCol),
        V.norm(col(vecCol)).as("__cn"))
      .join(broadcast(shortlist), Seq(idCol))
      .join(broadcast(qExact), Seq(queryIdCol))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    rankTopK(rescored, queryIdCol, idCol, k)
  }

  /** The ADC shortlist leg of [[pqTopKEncoded]] alone — (queryId, id)
    * candidates from the codes-only scan, before the exact re-rank.
    * Factored out so the `pq_bytes` probe can meter the leg's scan input
    * bytes separately from the re-rank's. */
  private[graft] def pqAdcShortlist(encoded: DataFrame,
                                    corpusCols: Seq[String], model: PqModel,
                                    queries: DataFrame, vecCol: String,
                                    idCol: String, queryIdCol: String,
                                    shortlistK: Int): DataFrame = {
    val q = withQueryNorm(queries, corpusCols, queryIdCol, vecCol)
    rankTopK(adcScored(encoded, q, model, Seq.empty),
      queryIdCol, idCol, shortlistK)
      .select(col(queryIdCol), col(idCol))
  }

  /** ADC scoring core shared by the PQ paths: broadcast the query batch
    * with one lookup table per subspace (LUT(j)(c) = q_j · codebook(j)(c),
    * literal arrays), join into the encoded relation (`joinCols` empty =
    * every query scores every row; `Seq("__cell")` = cell-restricted for
    * IVF-PQ), and emit approximate `cosine` = ADC-dot / (‖v‖·‖q‖).
    * Zero-norm rows score null and are excluded downstream exactly as in
    * the exact path. `q` must carry `__qvec`/`__qn` ([[withQueryNorm]]). */
  private def adcScored(encoded: DataFrame, q: DataFrame, model: PqModel,
                        joinCols: Seq[String]): DataFrame = {
    // ONE flattened lut column (m·ksub contiguous doubles) instead of m
    // separate array columns: the broadcast join then copies a single
    // contiguous array per scored row, and the per-pair score is one
    // native m-add loop (PqAdcDotExpr) instead of an m-deep element_at
    // tree — measured 5.3s -> sub-second for 20 queries x 100k rows
    // (pq_crossover probe) with bit-identical results (same sub-dots,
    // same left-to-right f64 accumulation order)
    val flatLut = array((0 until model.m).flatMap { j =>
      val qSub = slice(col("__qvec"), j * model.dsub + 1, model.dsub)
      model.codebooks(j).map(c => V.dot(qSub, lit(c)))
    }.toIndexedSeq: _*)
    val withLut = q.withColumn("__lut", flatLut)
    val adcDot = graft.functions.VectorExpressions.pqAdcDot(
      col("__codes"), col("__lut"), model.ksub)
    val joined =
      if (joinCols.isEmpty) encoded.join(broadcast(withLut))
      else encoded.join(broadcast(withLut), joinCols)
    joined.withColumn("cosine",
      when(col("__cn") > 0 && col("__qn") > 0,
        adcDot / (col("__cn") * col("__qn"))))
  }

  // --------------------------------------------------------------- IVF-PQ

  /** IVF-PQ (inline form): the billion-scale composition — a coarse
    * quantizer restricts each query to its `nProbe` nearest cells, PQ-ADC
    * scores only those cells' rows via byte codes, and the bounded
    * shortlist is re-ranked on exact cosines. The scored fraction is
    * ~nProbe/nCells AND each scored row costs m table lookups instead of
    * a dim-wide dot product — the two savings multiply. Returned scores
    * are exact for whatever is retrieved (both approximations lose
    * candidates, never mis-score them). Deterministic for a fixed seed.
    * For the persisted form whose probes are partition-pruned reads of a
    * compressed codes column, see [[ivfPqBuild]]/[[ivfPqProbeTopK]]. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                vecCol: String, idCol: String, queryIdCol: String,
                k: Int, nCells: Int = 0, nProbe: Int = 0,
                m: Int = 8, ksub: Int = 16, shortlistFactor: Int = 4,
                seed: Long = 42L, fitSampleRows: Int = 4096): DataFrame = {
    require(shortlistFactor >= 1, "shortlistFactor must be >= 1")
    val known = if (nCells > 0) -1L else corpus.count()
    val cells = if (nCells > 0) nCells else autoCells(known)
    val probes = if (nProbe > 0) nProbe else math.max(1, cells / 8)
    val centroids = fitCentroids(corpus, vecCol, cells, seed, 0.0,
      fitSampleRows, knownRows = known)
    val model = fitPq(corpus, vecCol, m, ksub, seed, fitSampleRows)
    val encoded = pqEncode(corpus.select(col(idCol), col(vecCol)), vecCol,
        model)
      .withColumn("__cell", nearestCell(col(vecCol), centroids))
      .drop(vecCol)
    val q = withProbeCells(
      withQueryNorm(queries, corpus.columns, queryIdCol, vecCol),
      centroids, probes)
    val shortlist = rankTopK(adcScored(encoded, q, model, Seq("__cell")),
      queryIdCol, idCol, k * shortlistFactor)
      .select(col(queryIdCol), col(idCol))
    val qExact = withQueryNorm(queries, corpus.columns, queryIdCol, vecCol)
    val rescored = corpus
      .select(col(idCol).cast("long").as(idCol), col(vecCol),
        V.norm(col(vecCol)).as("__cn"))
      .join(broadcast(shortlist), Seq(idCol))
      .join(broadcast(qExact), Seq(queryIdCol))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    rankTopK(rescored, queryIdCol, idCol, k)
  }

  /** Persist an IVF-PQ index under `path`: the corpus cell-partitioned
    * like [[ivfBuild]] (so probes are statically partition-pruned reads)
    * with the PQ codes column alongside the raw vectors and norms —
    * parquet's columnar layout means the ADC pass reads ONLY
    * (id, codes, norm) from the probed cells' files (column pruning),
    * and the exact re-rank reads the vector column for just the
    * shortlist, from the same pruned directories. Codebooks persist next
    * to the centroids as (subspace, code, centroid) rows. Shares
    * [[ivfBuild]]'s `.rebuilding` fence discipline: both halves are
    * rewritten under the fence, and a completed build self-heals a
    * crashed predecessor. */
  def ivfPqBuild(corpus: DataFrame, vecCol: String, path: String,
                 nCells: Int = 0, m: Int = 8, ksub: Int = 16,
                 seed: Long = 42L, fitSampleRows: Int = 4096): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // fail fast before the auto-sizing count and the two fits — see
    // ivfBuild's precheck rationale
    buildPrecheck(spark, fs, root, "ivfPqBuild")
    val known = if (nCells > 0) -1L else corpus.count()
    val cells = if (nCells > 0) nCells else autoCells(known)
    val centroids = fitCentroids(corpus, vecCol, cells, seed, 0.0,
      fitSampleRows, knownRows = known)
    val (model, fitPoints) =
      fitPqWithSample(corpus, vecCol, m, ksub, seed, fitSampleRows)
    // build-time codebook-fit baseline for ivfPqDriftStats — see
    // pqBuild's fit_mqe note (training-sample optimism applies alike)
    val fitMqe = meanQuantizationError(fitPoints, model)
    // writer lease held across every write (acquire-or-create) — see
    // ivfBuild: a build racing a live ivfPqAppend must refuse, not
    // replace data/ mid-append
    withMutationLease(spark, fs, root, "ivfPqBuild", createRoot = true) {
      val marker = new org.apache.hadoop.fs.Path(root, RebuildMarker)
      fs.create(marker, true).close()
      // width calibrations tuned against the quantizer+codebooks this
      // build replaces would be silently wrong-generation metadata
      fs.delete(new org.apache.hadoop.fs.Path(root, PqCalFile), false)
      pqEncode(corpus, vecCol, model)
        .withColumn("__cell", nearestCell(col(vecCol), centroids))
        .write.mode("overwrite").partitionBy("__cell").parquet(s"$path/data")
      centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
      model.codebooks.zipWithIndex
        .flatMap { case (book, j) =>
          book.zipWithIndex.map { case (c, code) => (j, code, c.toSeq) }
        }.toSeq
        .toDF("subspace", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
      // build-time cell-skew baseline alongside the MQE baseline: clustered
      // corpora are "skewed" at birth (max/mean over cells is a DATA
      // property), so ivfPqMaintain's skew trigger must fire on skew GROWTH
      // relative to this equilibrium — an absolute bound would re-fire the
      // rebuild every night on data no quantizer can flatten (observed in
      // the pq_drift probe before this baseline existed)
      val cellCounts = spark.read.parquet(s"$path/data")
        .groupBy("__cell").count().collect().map(_.getLong(1))
      val fitSkew =
        if (cellCounts.isEmpty || cellCounts.sum == 0) 1.0
        else cellCounts.max /
          (cellCounts.sum.toDouble / math.max(1, centroids.length))
      Seq((fitMqe, fitSkew)).toDF("fit_mqe", "fit_skew")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
      writeGeneration(spark, path)
      fs.delete(marker, false)
    }
    Seq("data", "centroids", "codebooks", "meta").foreach(d =>
      spark.catalog.refreshByPath(s"$path/$d"))
  }

  /** Extend a persisted IVF-PQ index in place: new rows are encoded with
    * the STANDING codebooks and assigned with the STANDING centroids —
    * quantizer, codebooks, and existing cells are untouched, so the
    * append writes only new part files into the cell directories, with
    * the same prefix-visibility contract as [[ivfAppend]] (a concurrent
    * probe sees a consistent smaller index, never torn metadata).
    * Refuses a fenced index. Codes stay exact FOR THE RETAINED model —
    * what drifts under a shifted distribution is the fit quality of
    * cells and codebooks: watch [[ivfCellStats]] for cell skew and
    * [[ivfPqDriftStats]] for codebook fit, or run [[ivfPqMaintain]] to
    * gauge + rebuild automatically, exactly as [[ivfMaintain]] does for
    * the plain IVF index. */
  def ivfPqAppend(newRows: DataFrame, vecCol: String, path: String): Unit = {
    val spark = newRows.sparkSession
    requireNotRebuilding(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // lease HELD across quantizer/codebook read + data write (see
    // ivfAppend): the mid-append swap race refuses loudly instead of
    // silently dropping the in-flight rows
    withMutationLease(spark, fs, root, "ivfPqAppend", AppendLeaseHint) {
      val centroids = loadCentroids(spark, path)
      val model = loadPqModel(spark, path)
      pqEncode(newRows, vecCol, model)
        .withColumn("__cell", nearestCell(col(vecCol), centroids))
        .write.mode("append").partitionBy("__cell").parquet(s"$path/data")
    }
    spark.catalog.refreshByPath(s"$path/data")
  }

  /** Build-time cell-skew baseline (`fit_skew`), when the index records
    * one ([[ivfPqBuild]] since it gauged skew); None on older indexes
    * and on flat-PQ meta (no cells) — callers fall back to 1.0, i.e.
    * absolute (uniform-equilibrium) skew units. */
  private def readFitSkew(spark: SparkSession, path: String): Option[Double] = {
    val p = new org.apache.hadoop.fs.Path(path, "meta")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val meta = spark.read.parquet(s"$path/meta")
      if (!meta.columns.contains("fit_skew")) None
      else Some(meta.select(col("fit_skew")).collect()(0).getDouble(0))
    }
  }

  /** Codebook-drift gauge for an [[ivfPqBuild]] index — one bounded
    * file-sampled read of the data relation's vector column (never a
    * full scan; see [[gaugeSample]]) plus driver-side arithmetic; see
    * [[PqDriftStats]]. */
  def ivfPqDriftStats(spark: SparkSession, path: String, vecCol: String,
                      seed: Long = 42L, sampleRows: Int = 4096,
                      sampleFiles: Int = 16): PqDriftStats =
    pqDriftFrom(spark, path, "data", vecCol, "ivfPqBuild", seed,
      sampleRows, sampleFiles).getOrElse(throw new IllegalStateException(
      s"nothing to gauge at $path: the data relation is empty " +
        "(fully drained corpus) — ivfPqMaintain reports this case as \"ok\""))

  /** Full-health automation for an [[ivfPqBuild]] index — closes the
    * maintenance-doctrine hole [[ivfPqAppend]] documents: appended mass
    * from a shifted distribution quantizes ever worse against the frozen
    * codebooks, degrading ADC shortlist quality (hence recall) gradually
    * and silently; appended mass can ALSO bloat few cells or outgrow the
    * quantizer, exactly [[ivfMaintain]]'s skew/growth concerns. All three
    * triggers are watched — codebook drift via [[ivfPqDriftStats]]
    * (bounded sample), cell skew and corpus growth via [[ivfCellStats]]
    * (directory metadata) — because ONE rebuild cures all three: past any
    * bound the index rebuilds from its own stored rows under the staged
    * swap + `.rebuilding` fence, refitting coarse quantizer AND codebooks
    * on the current distribution, re-deriving the cell count for the
    * grown corpus (`autoCells`), re-assigning + re-encoding every row,
    * and recording fresh drift AND skew baselines. Returns `"ok"` or
    * `"rebuilt"`; `maxDrift` semantics as in [[pqMaintain]].
    *
    * `maxSkew` is in BUILD-TIME units — the trigger fires when max/mean
    * cell skew exceeds `maxSkew` × the recorded `fit_skew` baseline, NOT
    * an absolute bound: clustered corpora are "skewed" at birth (a data
    * property no quantizer can flatten), and an absolute bound would
    * re-fire a full rebuild every night without ever converging (observed
    * in the pq_drift probe before the baseline existed). Because each
    * rebuild records its own equilibrium as the new baseline, the
    * maintain loop converges by construction: the call after a rebuild
    * reads ratio ≈ 1 on every gauge. Indexes built before the baseline
    * fall back to absolute units ([[ivfMaintain]]'s semantics, which suit
    * its near-uniform-corpus probe evidence).
    *
    * `fitSampleRows` budgets the REBUILD's fits;
    * `gaugeSampleRows`/`gaugeSampleFiles` budget the nightly drift gauge
    * — independent knobs, as in [[pqMaintain]]. `recallTarget`: when
    * set, a rebuild is followed by [[ivfPqCalibrate]] at this target
    * (recall@`recallK`), re-deriving BOTH probe widths (`nProbe` and the
    * ADC shortlist factor) against the refitted index — a rebuild
    * restores quantization quality, but the widths that met a recall
    * target on the old corpus may be too narrow for the grown one
    * (measured: SCALEPROBE `pq_drift`). `idCol` names the id column the
    * calibration's ground truth ranks (only used with `recallTarget`). */
  def ivfPqMaintain(spark: SparkSession, path: String, vecCol: String,
                    maxDrift: Double = 2.0, maxSkew: Double = 4.0,
                    maxGrowth: Double = 4.0, seed: Long = 42L,
                    fitSampleRows: Int = 4096, gaugeSampleRows: Int = 4096,
                    gaugeSampleFiles: Int = 16,
                    recallTarget: Option[Double] = None,
                    recallK: Int = 10, idCol: String = "id",
                    maxShortlistFactor: Int = 64): String = {
    require(maxDrift > 1.0, "maxDrift must exceed 1 (1 = freshly fit)")
    require(maxSkew > 1.0, "maxSkew must exceed 1 (1 = perfectly uniform)")
    require(maxGrowth >= 1.0, "maxGrowth must be >= 1")
    val (total, skew, wantCells, nCellsStored) = cellHealth(spark, path)
    // an emptied-out index has nothing to gauge — "ok" like ivfMaintain,
    // and the drift sample (which cannot draw from zero rows) is skipped
    if (total == 0) return "ok"
    val drift = pqDriftFrom(spark, path, "data", vecCol, "ivfPqBuild",
      seed, gaugeSampleRows, gaugeSampleFiles)
    val fitSkew = readFitSkew(spark, path).getOrElse(1.0)
    val healthy = drift.forall(_.ratio <= maxDrift) &&
      skew <= maxSkew * fitSkew && wantCells <= nCellsStored * maxGrowth
    if (healthy) "ok"
    else {
      val model = loadPqModel(spark, path)
      // drop the calibration BEFORE the rebuild (see pqMaintain): a crash
      // between the fence lift and a post-swap delete would leave widths
      // tuned against the replaced quantizer+codebooks silently in force
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      // writer lease across staging-read + swap (see withMutationLease):
      // an append inside the window would be silently dropped by the
      // swap — appends hold the same lease, so it cannot start here
      withMutationLease(spark, fs, root, "ivfPqMaintain") {
        fs.delete(new org.apache.hadoop.fs.Path(path, PqCalFile), false)
        // original columns only: cell/norm/codes recomputed by the build
        val data = spark.read.parquet(s"$path/data")
          .drop("__cell", "__cn", "__codes")
        stagedRebuild(spark, path,
          Seq("data", "centroids", "codebooks", "meta")) { staging =>
          ivfPqBuild(data, vecCol, staging, nCells = 0, m = model.m,
            ksub = model.ksub, seed = seed, fitSampleRows = fitSampleRows)
        }
      }
      recallTarget.foreach(t => ivfPqCalibrate(spark, path, vecCol, idCol,
        t, k = recallK, seed = seed,
        maxShortlistFactor = maxShortlistFactor))
      "rebuilt"
    }
  }

  /** Persisted-index layout detection shared by [[indexMaintain]],
    * [[indexDelete]], and the streaming ingest sink
    * (`StreamOps.annAppendSink`) — the relations each build writes are
    * its signature. None = unrecognized (callers fail loudly: acting
    * with the WRONG family's semantics silently drops relations). */
  private[graft] def detectIndexLayout(spark: SparkSession,
                                       path: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def has(rel: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(root, rel))
    if (has("codes") && has("vectors")) Some("flat-pq")
    else if (has("data") && has("codebooks")) Some("ivf-pq")
    else if (has("data") && has("centroids")) Some("ivf")
    else None
  }

  /** The loud half of [[detectIndexLayout]]'s contract, shared wording
    * for every caller that must refuse an unrecognized directory. */
  private[graft] def requireIndexLayout(spark: SparkSession,
                                        path: String): String =
    detectIndexLayout(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no recognized index layout at $path (expected codes+vectors " +
          "[flat-PQ], data+codebooks [IVF-PQ], or data+centroids [IVF])"))

  /** One-call nightly maintenance for ANY persisted ANN index — the
    * [[graft.operators.Layout.storeMaintain]] analogue for the index
    * family, so a scheduler needs one cron line per index, not one per
    * index KIND. The layout is detected from what is on disk (the
    * relations each build writes are its signature) and the matching
    * measured-trigger maintenance runs:
    *
    *  - `codes/` + `vectors/`            → flat-PQ ([[pqBuild]]):
    *    [[pqMaintain]] (codebook drift; needs `idCol`);
    *  - `data/` + `codebooks/`           → IVF-PQ ([[ivfPqBuild]]):
    *    [[ivfPqMaintain]] (codebook drift + cell skew + growth);
    *  - `data/` + `centroids/` alone     → plain IVF ([[ivfBuild]]):
    *    [[ivfMaintain]] (cell skew + growth).
    *
    * `recallTarget` is honored by EVERY layout — each rebuild is
    * followed by its family's width recalibration at the target
    * ([[nProbeForRecall]] / [[pqShortlistForRecall]] /
    * [[ivfPqCalibrate]]), so a mixed index fleet keeps one recall
    * contract under one cron line. `gaugeSampleRows`/`gaugeSampleFiles`
    * budget the PQ layouts' nightly drift gauge independently of the
    * rebuild's `fitSampleRows`. An index whose rows have been fully
    * drained (e.g. by opt-out deletes) reports "ok" — nothing to gauge,
    * nothing to rebuild.
    *
    * An unrecognized directory fails loudly — running the WRONG family's
    * rebuild would silently drop relations (e.g. [[ivfMaintain]] over an
    * IVF-PQ index rebuilds via [[ivfBuild]] and loses the codes).
    * Returns `(detected layout, decision)`. */
  def indexMaintain(spark: SparkSession, path: String, vecCol: String,
                    idCol: String = "id", maxDrift: Double = 2.0,
                    maxSkew: Double = 4.0, maxGrowth: Double = 4.0,
                    recallTarget: Option[Double] = None,
                    seed: Long = 42L,
                    fitSampleRows: Int = 4096,
                    gaugeSampleRows: Int = 4096,
                    gaugeSampleFiles: Int = 16,
                    recallK: Int = 10,
                    maxShortlistFactor: Int = 64): (String, String) =
    requireIndexLayout(spark, path) match {
      case "flat-pq" =>
        ("flat-pq", pqMaintain(spark, path, vecCol, idCol, maxDrift, seed,
          fitSampleRows, gaugeSampleRows, gaugeSampleFiles, recallTarget,
          recallK, maxShortlistFactor))
      case "ivf-pq" =>
        ("ivf-pq", ivfPqMaintain(spark, path, vecCol, maxDrift, maxSkew,
          maxGrowth, seed, fitSampleRows, gaugeSampleRows,
          gaugeSampleFiles, recallTarget, recallK, idCol,
          maxShortlistFactor))
      case _ =>
        ("ivf", ivfMaintain(spark, path, vecCol, maxSkew, maxGrowth, seed,
          fitSampleRows, recallTarget, recallK))
    }

  /** Probe an [[ivfPqBuild]] index: the probed cell set becomes a literal
    * partition filter (same static pruning as [[ivfProbeTopK]]); the ADC
    * pass projects only (id, codes, norm) — parquet column pruning keeps
    * the raw vectors unread — and the exact re-rank reads the vector
    * column for the broadcast shortlist alone, from the same pruned
    * directories. Same output shape as [[bruteForceTopK]]. Racing a
    * concurrent [[indexDelete]]/[[ivfPqMaintain]] swap: consistent
    * answer or LOUD retryable failure, never silent partial results —
    * see [[indexDelete]]'s in-flight-readers contract (pinned live in
    * `SimilaritySpec`). */
  def ivfPqProbeTopK(spark: SparkSession, path: String, queries: DataFrame,
                     vecCol: String, idCol: String, queryIdCol: String,
                     k: Int, nProbe: Int = 0,
                     shortlistFactor: Int = 0): DataFrame = {
    // 0 defaults = the ivfPqCalibrate-persisted widths when the index
    // carries them (recall-targeted), else cells/8 and factor 4 — the
    // calibrated-default contract ivfProbeTopK has via nProbeForRecall
    require(shortlistFactor >= 0,
      "shortlistFactor must be >= 0 (0 = calibrated default)")
    requireNotRebuilding(spark, path)
    val gen0 = readGeneration(spark, path)
    val centroids = loadCentroids(spark, path)
    val model = loadPqModel(spark, path)
    // lazy: a probe with both widths explicit never reads the cal file
    lazy val cal = calibratedPqWidthsAt(spark, path, gen0)
    val probes =
      if (nProbe > 0) nProbe
      else cal.map(_._1).filter(_ > 0)
        .map(c => math.min(math.max(1, c), centroids.length))
        .getOrElse(math.max(1, centroids.length / 8))
    val factor =
      if (shortlistFactor > 0) shortlistFactor
      else cal.map(_._2).getOrElse(DefaultShortlistFactor)
    // probed-cell-only open of `data/` — same shape and rationale as
    // [[ivfProbeTopK]]: one driver-side listStatus for existence, one
    // cell dir for the query batch's schema needs, basePath keeping
    // `__cell` a partition column so the isin filter stays the
    // PartitionFilters entry the plan contract asserts
    val existing = partitionDirs(spark, s"$path/data", "__cell")
    val schemaProbe = readPartitionDirs(spark, s"$path/data",
      existing.values.take(1).toSeq)
    val q = withProbeCells(
      withQueryNorm(queries, schemaProbe.columns, queryIdCol, vecCol,
        allowed = Set("__cell", "__cn", "__codes")),
      centroids, probes)
      .localCheckpoint(true)
    val probedCells = q.select("__cell").distinct().collect().map(_.getInt(0))
    val corpus = readPartitionDirs(spark, s"$path/data",
      probedCells.toIndexedSeq.flatMap(existing.get))
    // post-plan race check: centroids+codebooks were loaded and data
    // listed above — a rebuild completing in between would prune the NEW
    // files with the OLD quantizer (see requireGenerationUnchanged)
    requireGenerationUnchanged(spark, path, gen0)
    val pruned = corpus
      .filter(col("__cell").isin(probedCells.toIndexedSeq: _*))
    // ADC leg: explicit narrow projection — the scan reads no vectors
    val shortlist = rankTopK(
      adcScored(pruned.select(col(idCol), col("__cell"), col("__codes"),
        col("__cn")), q, model, Seq("__cell")),
      queryIdCol, idCol, k * factor)
      .select(col(queryIdCol), col(idCol))
    val qExact = withQueryNorm(queries, corpus.columns, queryIdCol, vecCol,
      allowed = Set("__cell", "__cn", "__codes"))
    val rescored = pruned
      .select(col(idCol).cast("long").as(idCol), col(vecCol), col("__cn"))
      .join(broadcast(shortlist), Seq(idCol))
      .join(broadcast(qExact), Seq(queryIdCol))
      .withColumn("cosine", V.cosineGivenNorms(
        col(vecCol), col("__qvec"), col("__cn"), col("__qn")))
    rankTopK(rescored, queryIdCol, idCol, k)
  }

  // --------------------------------------------------- index opt-out delete

  /** Delete rows from ANY persisted ANN index by id — the governance
    * primitive that extends the right-to-be-forgotten pipeline
    * (`SnapshotStore.delete` → audit → vacuum; `examples/OptOutExample`)
    * to the indexes SERVING retrieval: deleting a user from the corpus
    * store does nothing to the copies of their vectors an index holds,
    * and every maintenance rebuild re-encodes the index's OWN stored
    * rows, so without this the opted-out vectors would persist — and
    * stay retrievable — forever.
    *
    * Bounded work, never a full rewrite (the `SnapshotStore.delete`
    * economy, per layout):
    *
    *  - **flat-PQ**: the victims' vector buckets are DERIVED
    *    (`pmod(xxhash64(id), idBuckets)` — no scan at all), and only
    *    those `__vb=` directories are rewritten; the codes relation is
    *    unpartitioned, so deletion there is FILE-granular — one scan of
    *    the narrow codes relation (the cheap one by design: ~10× fewer
    *    bytes than the vectors) locates the files containing victims,
    *    and only those files are rewritten.
    *  - **IVF / IVF-PQ**: the victims' cells are located by one
    *    COLUMN-PRUNED scan (id + the directory-derived cell only — the
    *    vector and code columns stay unread), and only those `__cell=`
    *    directories are rewritten.
    *
    * Crash discipline: survivors are staged under `<path>/.staging`
    * FIRST (probes keep running against the untouched live index), then
    * the touched partitions/files swap under the `.rebuilding` fence —
    * readers and appenders refuse a fenced index, and a crash mid-swap
    * leaves the fence plus the `.old`/`.staging` halves for recovery,
    * exactly the staged-rebuild contract. A partition whose rows are all
    * deleted is removed outright; deleting EVERY row leaves an empty
    * index that [[indexMaintain]] gauges as "ok". Width calibrations
    * (`pqcal.json`/`nprobe.json`) are kept — a bounded opt-out batch
    * does not shift the corpus distribution; the next
    * `recallTarget`-bearing maintenance re-checks them anyway.
    * Single-writer, like every mutation path — and mechanically so: the
    * whole delete holds the `.mutating` writer lease ([[withMutationLease]]),
    * under which interleaved appends fail loudly instead of being
    * silently dropped by the swap.
    *
    * IN-FLIGHT READERS during the swap (the probe-vs-delete race,
    * pinned live in `SimilaritySpec`): a probe that passed the fence
    * check and is MID-SCAN when the whole-relation rename runs either
    * completes against a consistent snapshot (pre- or post-delete — its
    * file listing resolved wholly before or after the swap) or fails
    * LOUDLY on a vanished input (Spark's missing-file error; renamed-
    * away relations are absent inputs, and absent inputs are errors,
    * not skips, under the default `ignoreMissingFiles=false` — do not
    * enable that flag on index paths, it would convert this loud
    * failure into silent partial results). Clean-retry-or-consistent,
    * never silently partial — the reader half of the store's
    * reader-vs-vacuum contract.
    *
    * `keys` must carry a column named `idCol` (cast to the stored id
    * type before hashing/joining — an unconformed key would probe the
    * wrong bucket and silently delete nothing). Returns rows removed
    * from the primary relation; ids absent from the index are a no-op,
    * so replaying an opt-out batch converges. */
  def indexDelete(spark: SparkSession, path: String, keys: DataFrame,
                  idCol: String = "id"): Long = {
    require(keys.columns.contains(idCol),
      s"keys must carry the id column '$idCol'")
    requireNotRebuilding(spark, path)
    val layout = requireIndexLayout(spark, path)
    val rel = if (layout == "flat-pq") "vectors" else "data"
    val partCol = if (layout == "flat-pq") "__vb" else "__cell"
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    // writer lease held from BEFORE the primary listing to after the
    // swap (see withMutationLease): an append interleaving in between
    // writes rows the staged survivors do not contain — the swap would
    // drop them silently; appends HOLD the same lease, so the
    // interleaving is structurally impossible
    withMutationLease(spark, fs, root, "indexDelete") {
    val primary = spark.read.parquet(s"$path/$rel")
    val storedIdType = primary.schema(idCol).dataType
    // bounded opt-out batch, materialized once: it feeds several jobs,
    // and a nondeterministic input re-evaluated per job would let
    // victims outside the first evaluation's touched set survive while
    // the count claimed them (SnapshotStore.delete's rationale)
    val k = keys.select(col(idCol).cast(storedIdType).as(idCol))
      .distinct().localCheckpoint(true)
    val existingParts: Set[Int] = fs.listStatus(
        new org.apache.hadoop.fs.Path(root, rel)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(s"$partCol=") =>
        n.stripPrefix(s"$partCol=").toInt }.toSet
    val touched: Set[Int] =
      if (layout == "flat-pq") {
        val buckets = spark.read.parquet(s"$path/meta")
          .select("id_buckets").collect()(0).getInt(0)
        k.select(pmod(xxhash64(col(idCol).cast("long")),
            lit(buckets.toLong)).cast("int").as(partCol))
          .distinct().collect().map(_.getInt(0)).toSet
          .intersect(existingParts)
      } else
        primary.select(col(idCol), col(partCol))
          .join(broadcast(k), Seq(idCol), "left_semi")
          .select(partCol).distinct().collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return 0L
    val target = primary
      .filter(col(partCol).isin(touched.toIndexedSeq: _*))
    val nDel = target.join(broadcast(k), Seq(idCol), "left_semi").count()
    if (nDel == 0L) return 0L
    val staging = new org.apache.hadoop.fs.Path(root, ".staging")
    fs.delete(staging, true)
    // stage the touched partitions' survivors — live index untouched,
    // probes keep running. Flat-PQ keeps the build's within-bucket id
    // sort (tight row-group stats for the re-rank's point lookups).
    val survivors = target.join(broadcast(k), Seq(idCol), "left_anti")
    val arranged =
      if (layout == "flat-pq")
        survivors.repartition(col(partCol))
          .sortWithinPartitions(col(partCol), col(idCol))
      else survivors
    arranged.write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$staging/$rel")
    // flat-PQ: locate and stage the codes files holding victims — one
    // narrow codes scan; only matched files are rewritten
    val codesDf =
      if (layout == "flat-pq") Some(spark.read.parquet(s"$path/codes"))
      else None
    val codesFiles: Seq[String] = codesDf.fold(Seq.empty[String])(
      _.withColumn("__f", input_file_name())
        .join(broadcast(k), Seq(idCol), "left_semi")
        .select("__f").distinct().collect().map(_.getString(0)).toSeq)
    if (codesFiles.nonEmpty)
      spark.read.parquet(codesFiles: _*)
        .join(broadcast(k), Seq(idCol), "left_anti")
        .write.mode("overwrite").parquet(s"$staging/codes")
    // fenced WHOLE-RELATION swap. Swapping partition directories one at
    // a time IN PLACE (the pre-r18 scheme) left a window where a racing
    // probe's file listing could catch SOME partitions swapped and
    // others not — a READABLE mixed state, i.e. silent partial results,
    // exactly what the in-flight-readers contract forbids. Instead the
    // relation directory is renamed AWAY whole, mutated while it sits at
    // the hidden `.old` path (displaced old partitions parked under
    // `.old/parts` for crash recovery, staged survivors moved in), and
    // renamed BACK whole — readers only ever observe all-old, ABSENT (a
    // loud, retryable listing/scan failure under the default
    // ignoreMissingFiles=false), or all-new, and the metadata ops stay
    // O(touched) (2 whole-dir renames + 2 per touched partition), not
    // O(partitions).
    val old = new org.apache.hadoop.fs.Path(root, ".old")
    fs.delete(old, true)
    fs.mkdirs(old)
    val parked = new org.apache.hadoop.fs.Path(old, "parts")
    fs.mkdirs(parked)
    val rod = renameOrDie(fs, path, "indexDelete") _
    withRebuildFence(fs, root) {
      val hiddenRel = new org.apache.hadoop.fs.Path(old, rel)
      rod(new org.apache.hadoop.fs.Path(root, rel), hiddenRel)
      touched.toSeq.sorted.foreach { p =>
        rod(new org.apache.hadoop.fs.Path(hiddenRel, s"$partCol=$p"),
          new org.apache.hadoop.fs.Path(parked, s"$partCol=$p"))
        val stagedPart =
          new org.apache.hadoop.fs.Path(staging, s"$rel/$partCol=$p")
        // a partition whose rows were all victims has no staged
        // survivors: it is removed outright (the probes' partition
        // pruning and the maintainers' cell stats stop seeing it)
        if (fs.exists(stagedPart))
          rod(stagedPart,
            new org.apache.hadoop.fs.Path(hiddenRel, s"$partCol=$p"))
      }
      rod(hiddenRel, new org.apache.hadoop.fs.Path(root, rel))
      // flat-PQ codes: the same hidden-path dance at FILE granularity —
      // victim files deleted while the relation is hidden, rewritten
      // survivors moved in, the directory renamed back whole
      if (layout == "flat-pq") {
        val hiddenCodes = new org.apache.hadoop.fs.Path(old, "codes")
        rod(new org.apache.hadoop.fs.Path(root, "codes"), hiddenCodes)
        // input_file_name() returns the scan's URI-encoded path string
        // (SparkPath.urlEncoded), so the URI round trip is the correct
        // decode for e.g. %20 under a space-containing root; a string
        // that is NOT URI-parseable (foreign producer) falls back to the
        // plain Path constructor instead of aborting the delete mid-fence
        codesFiles.foreach { f =>
          val name = (try new org.apache.hadoop.fs.Path(new java.net.URI(f))
            catch { case _: java.net.URISyntaxException =>
              new org.apache.hadoop.fs.Path(f) }).getName
          fs.delete(new org.apache.hadoop.fs.Path(hiddenCodes, name), false)
        }
        val stagedCodes = new org.apache.hadoop.fs.Path(staging, "codes")
        if (fs.exists(stagedCodes))
          fs.listStatus(stagedCodes).toSeq
            .filter(st => st.isFile &&
              st.getPath.getName.endsWith(".parquet"))
            .foreach(st => rod(st.getPath, new org.apache.hadoop.fs.Path(
              hiddenCodes, st.getPath.getName)))
        rod(hiddenCodes, new org.apache.hadoop.fs.Path(root, "codes"))
      }
      // a FULLY drained relation must stay READABLE: a partitioned write
      // of zero survivors produces no files at all, and a later probe's
      // spark.read.parquet would die on schema inference instead of
      // returning zero rows. Re-seed with ONE empty schema-carrying file
      // INSIDE a partition-shaped subdir (a bare file at the relation
      // root would conflict with partition discovery once appends
      // resume) — the empty file carries the DATA-file schema, the
      // partition column stays directory-derived, and probes/appends
      // after a total drain keep working.
      def ensureReadable(relName: String,
                         fileSchema: org.apache.spark.sql.types.StructType,
                         partitioned: Boolean): Unit = {
        val dir = new org.apache.hadoop.fs.Path(root, relName)
        val baseDepth = fs.makeQualified(dir).depth()
        // only VISIBLE parquet counts as readability: a crashed append's
        // _temporary debris is invisible to Spark's directory reads
        // (the gaugeSample hidden-path rule), so counting it here would
        // skip the re-seed and leave the relation unreadable anyway
        def visible(fp: org.apache.hadoop.fs.Path): Boolean = {
          var q = fp
          while (q != null && q.depth() > baseDepth) {
            val n = q.getName
            if (n.startsWith(".") || (n.startsWith("_") && !n.contains("=")))
              return false
            q = q.getParent
          }
          true
        }
        val it = fs.listFiles(dir, true)
        var any = false
        while (it.hasNext && !any)
          if ({ val st = it.next()
                st.isFile && st.getPath.getName.endsWith(".parquet") &&
                  visible(st.getPath) })
            any = true
        if (!any)
          spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              fileSchema)
            .repartition(1)
            .write.mode("append").parquet(
              if (partitioned) s"$dir/$partCol=0" else dir.toString)
      }
      ensureReadable(rel, org.apache.spark.sql.types.StructType(
        primary.schema.fields.filterNot(_.name == partCol)),
        partitioned = true)
      codesDf.foreach(c =>
        ensureReadable("codes", c.schema, partitioned = false))
    }
    fs.delete(old, true)
    fs.delete(staging, true)
    (rel +: (if (layout == "flat-pq") Seq("codes") else Nil))
      .foreach(r => spark.catalog.refreshByPath(s"$path/$r"))
    nDel
    } // withMutationLease
  }
}
