package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val runStart = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT, codegen and the parquet reader once so the first timed
    // query doesn't absorb JVM startup cost.
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Default action is count() (cheap, stable for regression tracking —
    // but Catalyst prunes computed columns a count never reads);
    // SPARK_GRAFT_BENCH_MODE=noop forces full materialization through the
    // noop writer for honest throughput numbers.
    val noop = sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("noop")
    // Dev loop: SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those queries.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    // Single-run timings swing by tens of percent on a shared box; run the
    // whole suite SPARK_GRAFT_BENCH_PASSES times (default 3) and report the
    // per-query MINIMUM — the least-contended observation is the best
    // estimator of the code's true cost. Both raw pass totals and their
    // spread are emitted so a noisy run is visible in the JSON itself
    // (extra keys are additive to the driver contract). JIT/codegen warmup
    // is CODE, not noise, and it extends well past the first pass (r9
    // measured pass totals 87.0 → 73.5 → 65.3s — still dropping at pass
    // 3), so SPARK_GRAFT_BENCH_WARMUP (default 2) full passes run and are
    // DISCARDED before the recorded ones: the recorded passes measure
    // steady state, and repeat_delta_pct over them gauges environment
    // noise alone instead of folding warmup in.
    val passes = math.max(1, sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(_.trim.toIntOption).getOrElse(3))
    val warmupPasses = math.max(0, sys.env.get("SPARK_GRAFT_BENCH_WARMUP")
      .flatMap(_.trim.toIntOption).getOrElse(2))
    val names = selected.keys.toSeq
    // A failed query must not masquerade as a fast one: it reports -1 in
    // the per-query map, is excluded from the totals, and is listed in
    // "failed".
    def runPass(): Map[String, Double] =
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try {
            val df = fn(spark, sfDir)
            if (noop) df.write.format("noop").mode("overwrite").save()
            else df.count()
            true
          }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
        val secs = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // release operator-persisted relations
        name -> (if (ok) secs else -1.0)
      }.toMap
    val warmupTotals = (1 to warmupPasses).map { _ =>
      runPass().values.filter(_ >= 0.0).sum
    }
    // The box is noisy in BURSTS (one pass can catch an ambient spike and
    // read 50% high), so after the configured passes, keep measuring —
    // bounded by SPARK_GRAFT_BENCH_MAX_PASSES — until the two fastest
    // recorded passes agree within SPARK_GRAFT_BENCH_DELTA_TARGET
    // percent. The agreement pair is the steady-state estimate, matching
    // the per-query min-of-passes philosophy; every raw pass total is
    // still reported so a spike stays visible.
    val deltaTarget = sys.env.get("SPARK_GRAFT_BENCH_DELTA_TARGET")
      .flatMap(_.trim.toDoubleOption).getOrElse(3.0)
    // Ceiling 10: the box's noise is BURSTY (a full-suite run measured
    // pass totals 58, 68, 76, 85, 77, 65 — individual spikes of +45%
    // while the 5 heaviest queries alone sat stable within 2.3%), so
    // converging the fastest PAIR under the target is a waiting game for
    // two quiet passes; 6 recorded passes lose it on an unlucky day and
    // extra passes are cheap relative to a polluted headline figure.
    val maxPasses = math.max(passes,
      sys.env.get("SPARK_GRAFT_BENCH_MAX_PASSES")
        .flatMap(_.trim.toIntOption).getOrElse(10))
    // Wall budget for the whole run (warm-up included), measured from JVM
    // start: the adaptive chase stops extending once spent, so a bursty
    // box degrades to fewer recorded passes instead of an unboundedly
    // long bench — the min-of-passes headline and pass_total_median stay
    // meaningful at any recorded count >= the configured minimum.
    // 1200 fits the 83-query inventory: 2 warm-ups + the 3-pass minimum
    // land near 600 alone, which left the until-two-agree chase no room
    // (round-11 run: budget exhausted at 3 passes, repeat delta 8.9%).
    val maxSeconds = sys.env.get("SPARK_GRAFT_BENCH_MAX_SECONDS")
      .flatMap(_.trim.toDoubleOption).getOrElse(1200.0)
    val perPass = BenchRuns.adaptivePasses(passes, maxPasses, deltaTarget,
      outOfTime = () => (System.nanoTime() - runStart) / 1e9 > maxSeconds)(
      () => runPass())
    // A query that failed SOME passes still reports its best successful
    // time, but must not read as healthy — and its absence from the failed
    // passes' totals would skew the repeat delta, so flag it.
    val summary = BenchRuns.summarize(names, perPass)
    val qs = summary.minTimes.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = summary.failed.map("\"" + _ + "\"")
    val flaky = summary.flaky.map("\"" + _ + "\"")
    val total = summary.minTimes.collect { case (_, v) if v >= 0 => v }.sum
    val passTotals = perPass.map(BenchRuns.passTotal)
    // recorded passes are post-warmup steady state; the delta between the
    // two LEAST-CONTENDED (fastest) of them is the environment-noise
    // figure — a lone ambient spike shows in pass_totals, not here
    val repeatDeltaPct = BenchRuns.fastestPairDeltaPct(passTotals)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":${failed.mkString("[", ",", "]")},""" +
      s""""flaky":${flaky.mkString("[", ",", "]")},""" +
      s""""passes":${perPass.size},""" +
      s""""warmup_passes":$warmupPasses,""" +
      s""""warmup_totals":${warmupTotals.mkString("[", ",", "]")},""" +
      s""""pass_totals":${passTotals.mkString("[", ",", "]")},""" +
      s""""pass_total_median":${BenchRuns.medianTotal(passTotals)},""" +
      s""""repeat_delta_pct":$repeatDeltaPct,""" +
      s""""sf":"$sfDir"}"""
    println(json)
    // The stdout line can fall victim to log-tail truncation when the
    // harness captures only the last N bytes of a long sbt log; persist the
    // identical payload as a file artifact so per-query ratio audits always
    // see the full map.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_queries.json"))
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
