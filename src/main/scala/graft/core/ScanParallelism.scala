package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project, Union}

/** Gated scan-parallelism floor for expensive scan-side compute
  * (optimization guide §2.5 "input skew" / §6 "input split size").
  *
  * The shingling / decode / regex passes of the text and image operators
  * are pure per-row compute bolted onto the scan, so their parallelism is
  * the SCAN's parallelism. Parquet only splits at row-group boundaries: a
  * table written as one row group (the local fixtures; any small-file
  * upstream) plans exactly one task no matter what
  * `spark.sql.files.maxPartitionBytes` / `minPartitionNum` say, and the
  * whole shingle pass serializes on one core of the session while the
  * rest idle — measured 3.5 s of `chargram_pairs`' 4.6 s at sf0.1 on
  * local[32] spent in 1-task jobs.
  *
  * [[ensure]] round-robin-repartitions such an input up to the session's
  * default parallelism BEFORE the expensive projection, paying one small
  * exchange of the raw rows (the payload is the input row, not the
  * exploded shingles — guide §2.3's "shuffle the light rows, not the
  * derived heavy ones"). The gate keeps it scale-correct: a corpus that
  * already scans with at least half the session's parallelism (every real
  * multi-file table at cluster scale) passes through UNCHANGED — the
  * repartition exists for the degenerate-input regime only, so at 100 TB
  * this is a no-op, not an extra corpus shuffle. Streaming inputs pass
  * through unchanged (no RDD plan to inspect; stream sources micro-batch
  * their own parallelism).
  *
  * Determinism: round-robin repartition is deterministic for a fixed
  * input partitioning (`spark.sql.execution.sortBeforeRepartition`, on by
  * default), and every value the operators derive downstream is per-row
  * arithmetic (hashes, md5 coins, shingles), so results are
  * placement-independent. Do NOT route relations through this whose
  * downstream consumes `DataFrame.sample()` (partitioning-dependent
  * draws) — the quantizer-fit paths deliberately keep their inputs
  * untouched. */
object ScanParallelism {

  /** Repartition `df` to the session default parallelism iff its planned
    * parallelism is AT OR UNDER half of it (planned * factor <= default —
    * an input already scanning with more than half passes through
    * unchanged) and the relation is neither streaming nor downstream of a
    * shuffle. `factor` is the under-parallelism threshold. */
  def ensure(df: DataFrame, factor: Int = 2): DataFrame = {
    if (df.isStreaming) return df
    // Probe only NARROW (exchange-free) trees: scans, projections,
    // filters, unions of those, cached relations. `Dataset.rdd` on a plan
    // containing shuffles is NOT "planning only" under AQE — it
    // materializes every shuffle query stage at operator-CONSTRUCTION
    // time, and that work is discarded (exchange reuse does not span
    // QueryExecutions), so the real query pays it again. Narrow trees are
    // exactly where the single-row-group scan floor lives; a composed
    // input already carries the session's shuffle parallelism downstream
    // of its exchanges, so passing it through unchanged also matches what
    // the gate would have decided (shuffle.partitions ≥ half the default
    // parallelism in every session shape this repo runs).
    val narrow = df.queryExecution.optimizedPlan.collectFirst {
      case p if !(p.isInstanceOf[Project] || p.isInstanceOf[Filter] ||
        p.isInstanceOf[Union] || p.isInstanceOf[LeafNode]) => p
    }.isEmpty
    if (!narrow) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // no shuffle stages in the plan, so the RDD probe runs no job
    val planned = df.rdd.getNumPartitions
    if (planned * factor <= target) df.repartition(target) else df
  }
}
