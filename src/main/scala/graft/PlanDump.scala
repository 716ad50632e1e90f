package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans of representative queries to
  * stdout (captured into PLANS.md by scripts/gen_plans.sh). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val picks = Seq(
      "filter_project" -> "predicate + IN pushdown, column pruning",
      "q3_top10" -> "selective dims broadcast into the fact scan; one agg shuffle",
      "q1_agg" -> "partial/final hash aggregation (map-side combine)",
      "similarity_topk" -> "query batch broadcast; corpus scored map-side; bounded top-k partial aggregation",
      "asof_join" -> "DEFAULT as-of plan is now the custom merge node (front-door dispatch): AsofJoinExec with one exchange per side in its own schema, EnsureRequirements-placed sorts, streaming per-partition merge — no Union, no Window",
      "asof_bucketed" -> "hot-key escape hatch: the carry exchanges on (key, time-bucket) so one key's sort splits across buckets; unmatched rows resolve via a second as-of on the BUCKET INDEX against the one-row-per-(key,bucket) extreme relation",
      "sessionize_bucketed" -> "two-phase prefix sessionization: per-(key,bucket) windows for the per-row work; cross-bucket state (prev bucket's last ts, cumulative session offsets) rides the tiny bucket relation's own window",
      "upsert_merge" -> "single full-outer discriminant join resolves insert-vs-update",
      "minhash_pairs" -> "signatures computed scan-side by MinHashSigExpr (no explode/regroup exchange); only band keys shuffle",
      "embcos_exact" -> "norms once per row; small side broadcast into the non-equi pair join; exact f64 scoring",
      "stratified_topk" -> "per-stratum rank<=k plans a WindowGroupLimit: k rows per group retained BEFORE the exchange",
      "events_interval" -> "banded range join: plain equi-join on (user, time-bin) + in-bin filter, no per-key cartesian",
      "chargram_pairs" -> "single-pass inverted-index self-join (default path); stop-shingle anti join broadcasts only under the measured size gate",
      "pack_sequences" -> "one shard exchange + partition-local sort + O(1)-state scan; no global sort, parallelism = shard count",
      "decontaminate_bloom" -> "bloom might_contain prefilter runs scan-side inside the corpus's WholeStageCodegen; only survivors reach the membership join",
      "pq_topk" -> "PQ-ADC: broadcast per-query LUTs score the (id, codes, norm) scan; bounded shortlist aggregation; exact re-rank joins the tiny shortlist back into one corpus scan",
      "pq_index_topk" -> "persisted flat-PQ index: ADC over the narrow codes relation; the exact re-rank is a STATICALLY PARTITION-PRUNED read of the shortlist ids' buckets (PartitionFilters on __vb) -- never a second full vector scan",
      "ivfpq_topk" -> "IVF-PQ composition: probe cells restrict the ADC join on (__cell); shortlist re-ranked exact — probe-fraction and per-row savings multiply",
      "chargram_lm" -> "model pass map-side combined + TakeOrderedAndProject topV cut; scoring via broadcast model join into the exploded scan, per-doc re-agg partial-aggregated",
      "semdedup_pairs" -> "cluster-then-prune: one cached cell-assignment pass; only (id, cell) keys shuffle into the pair join; per-candidate exact-cosine verify joins payloads by id",
      "knn_join" -> "kNN self-join: both sides shuffle on the cached cell assignment (no corpus broadcast); per-query bounded top-k partial aggregation",
      "heavy_hitters" -> "MG sketch pass reduces map-side to bounded buffers (ObjectHashAggregate over binary state); recount joins the broadcast <=k candidate set — the vocabulary never shuffles",
      "hll_rollup" -> "per-group DataSketches HLL partial-aggregated map-side; union-merge re-aggregates sketches without re-scanning the fact table",
      "corpus_semdedup" -> "composed semantic curation: quality scored once pre-filter; doc-embedding equi join; cell keys shuffle into the pair join; per-language re-agg partial-aggregated",
      "incremental_dedup" -> "incremental ingest: new-batch band keys join the old+new key union -- the old corpus pays one signature scan, never a self-join; verification joins each side's own cached shingles",
      "containment_pairs" -> "single-pass inverted-index self-join reused for asymmetric containment; the two join inputs are identical subplans (ReusedExchange), set sizes ride the exploded rows",
      "gap_fill" -> "resample grid generated scan-side (sequence explode), forward-filled by the DISPATCHED merge as-of join -- one exchange per side, no per-slot range probes",
      "asof_nearest" -> "nearest through the dispatched merge node: backward candidate + unconsumed head give both directions in ONE pass (the window fallback would need two sorts)",
      "asof_merge" -> "WHOLE-OPERATOR physical node (AsofJoinExec via the injected planner strategy): one exchange per side in its own schema + EnsureRequirements-placed sorts + a streaming per-partition merge — no Union, no Window; left filters/pruning reach the scan through the custom-node optimizer rule",
      "asof_merge_nearest" -> "nearest in the SAME single merge pass (the union-and-carry plan needs two window sorts); backward candidate + unconsumed head give both directions O(1)-state",
      "percentile_rollup" -> "KLL sketches partial-aggregated map-side (ObjectHashAggregate over binary state); the rollup merges stored sketch bytes -- the fact table is rescanned only by the exact-rank verification branches",
      "bpe_tokens" -> "BPE encode runs inside the scan projection (native BpeEncodeExpr, frozen merge table shipped in the plan) -- no model join, no shuffle before the final sort",
      "bpe_budget_select" -> "tokenizer-true budgeting composes scan-side BPE counts with the per-language running-sum window -- one lang_id exchange, identical shape to budget_select",
      "line_dedup" -> "line doc-frequency map-side combined on trimmed-line keys; boilerplate set anti-joined under the measured broadcast gate; reassembly is one doc-id exchange with per-doc sorted collect_list",
      "line_dedup_scan" -> "frozen-model clean is ONE native scan-side projection (BoilerplateFilterExpr, model shipped in the plan): no explode, no join, no exchange before the presentation sort",
      "curriculum_mix" -> "composed curriculum: charLM model broadcast into the scoring scan; per-language ntile window; md5-coin filter scan-side; final mix aggregation partial-aggregated",
      "curriculum_mix_approx" -> "scale-safe curriculum: decile thresholds from ONE approx_percentile aggregation broadcast back into the scan -- bins assigned scan-side, banded coin scan-side, no per-language sort of CORPUS rows anywhere (the ntile swap for unbounded strata; the only Window/Sort runs over the <=10-rows-per-language bin summary)"
    )
    picks.foreach { case (name, note) =>
      println(s"\n## $name -- $note\n")
      println("```")
      println(Queries.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    spark.stop()
  }
}
