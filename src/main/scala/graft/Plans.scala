package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps formatted physical plans of the headline queries to PLANS.md —
  * the ".explain and iterate" audit trail (brief: "After each operator
  * works, explain(formatted) the plan and iterate until it's the plan
  * you'd want").
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq(
      "knn_l2" -> "k-NN must be TakeOrderedAndProject (bounded per-partition heaps), distance inside codegen",
      "knn_filtered" -> "filter evaluated before scoring, pushed toward the scan",
      "batch_search" -> "broadcast query frame; CollectTopK partial aggregation",
      "scan_filter" -> "PushedFilters + pruned ReadSchema at the parquet scan",
      "q1_agg" -> "partial HashAggregate before the single exchange",
      "join_agg" -> "dimension side broadcast, no SortMergeJoin",
      "bm25_search" -> ("query terms pushed into the postings scan as an " +
        "In predicate (PushedFilters), no corpus-wide join"),
      "hybrid_rrf" -> "two ranked pools, one full-outer join on id",
      "ivf_knn" -> "ivf_part predicate prunes before the distance scan",
      "graftdb_threshold_indexed" ->
        ("SQ8 approximate gate before the exact kernel; PartitionFilters absent " +
          "(all lists relevant at this threshold) but the gate bounds exact work"),
      "graftdb_hybrid_filtered" ->
        ("hybrid vector pool rides the IVF layout (PartitionFilters on _ivf_part), " +
          "lexical pool left-semi gated by filter survivors"),
      "dedup_minhash_lsh" ->
        ("bucketed band self-join (no cartesian), candidate-only collect_set, " +
          "single-job lazy plan"),
      "events_asof_join" ->
        "one user-keyed Sort+Window (running last over union) — no join operator",
      "events_sliding_agg" ->
        ("overlapping windows as a codegen'd 2-row expansion (explode of " +
          "window instances), ONE partial-aggregated shuffle — no self-join"),
      "pipeline_filter" ->
        ("one scan, all signals + rules as codegen'd projections " +
          "(no UDFs, no shuffle before the output sort)"),
      "graftdb_knn_pq_indexed" ->
        ("ADC table lookups as pure column expressions over the PQ codes " +
          "(no UDF), PartitionFilters on _ivf_part, exact rerank on top"),
      "graftdb_knn_rabitq_indexed" ->
        ("sign-bit Hamming estimator (vec_hamming + cos) as pure column " +
          "expressions over 1-bit codes, PartitionFilters on _ivf_part, " +
          "exact rerank on top"),
      "graftdb_hybrid_hamming" ->
        ("popcount pool + BM25 pool, both rank windows bounded at " +
          "poolSize, one full-outer fuse on id"),
      "streaming_minhash" ->
        ("incremental band-key equi-join against accumulated state, " +
          "candidate-only verification sets — no cartesian at any step"),
      "pipeline_dsir_weights" ->
        ("both n-gram distributions reduce to <=1024-row count vectors -> " +
          "BroadcastHashJoins; the only corpus-wide shuffle is the final " +
          "per-doc aggregation"),
      "pipeline_shuffle_shards" ->
        ("one hash projection + one per-shard window (sort WITHIN shards " +
          "only) — no global sort anywhere"),
      "events_range_join" ->
        ("time-range join bucketed on coarse time bins: equi-join on " +
          "(user, bin) with the residual range predicate — no " +
          "BroadcastNestedLoopJoin / cartesian anywhere"),
      "pipeline_pack_sequences" ->
        ("bucket assignment is the codegen'd lower_bound_bucket " +
          "expression (no UDF); per-bucket totals are one tiny " +
          "aggregation; no global-order window operator in the plan"),
      "maxsim_rerank" ->
        ("ColBERT MaxSim two-stage: broadcast 1-row query, bounded " +
          "top-50 candidate cut (TakeOrderedAndProject), then the token " +
          "late-interaction as ONE row-local codegen'd projection over " +
          "the 50 survivors — no Generate, no token-pair join, second " +
          "bounded top-k on the fused score"),
      "mmr_diversify" ->
        ("MMR diversity rerank: broadcast query frame into the scan, " +
          "collect_top_k bounded (os, id) heaps — NO payload rides the " +
          "heaps (that copies a vector per SCORED row; PooledCostProbe " +
          "measured 10x the join at 5M) — winners' vectors " +
          "late-materialized by one broadcast-hash re-join, then the " +
          "greedy lambda-trade as one row-local fold"),
      "mmr_join" ->
        ("joined MMR, both sides large: IVF cell-key equi-join (no " +
          "cartesian), collect_top_k bounded (os, id) heaps, winners' " +
          "vectors late-materialized via broadcast-hash re-join " +
          "(measured at parity with the plain join at 5M rows — " +
          "MmrScaleProbe ratio 1.00), row-local greedy fold"),
      "knn_grouped" ->
        ("diversity-capped knn: collect_top_k bounded per-LABEL heaps " +
          "(partial-aggregated, shuffle = groups x cap structs) + " +
          "TakeOrderedAndProject global cut — no window, no global sort"),
      "embedding_drift" ->
        ("per-dim PSI: ONE posexplode + partial-aggregated (dim, bucket) " +
          "counts per side (shuffle = dims x buckets groups), dense grid " +
          "joined broadcast-tiny, per-dim denominators folded from the " +
          "collected count arrays — NO side-wide count() jobs, no " +
          "quantile pass"),
      "knn_join" ->
        ("two-large-sides k-NN join: equi-join on the IVF cell key — " +
          "no cartesian; at this sf AQE broadcasts the exploded query " +
          "side because it measures small, at scale both sides shuffle " +
          "once on the cell key; CollectTopK bounded per-query heaps " +
          "partial-aggregated before the final exchange"),
      "dedup_substr_spans" ->
        ("window explode + hash-keyed dup count + left-semi mark (AQE " +
          "may broadcast the dup-hash set), per-doc gaps-and-islands " +
          "window — no self-join of the corpus, no pairwise work"),
      "dedup_semantic" ->
        ("pairwise cosine scoped by an equi-join on the cluster key — " +
          "never corpus-cartesian; component convergence and the " +
          "farthest-from-centroid keep rule are keyed aggregates"),
      "pipeline_mix_budget" ->
        ("per-source token totals collapse to a tiny aggregate joined " +
          "back by broadcast; the keep decision is an integer-ppm md5 " +
          "gate per row — no corpus-wide shuffle at all"),
      "text_chunk" ->
        ("chunking is a pure per-row explode (sequence + slice + " +
          "array_join, all codegen'd) — zero shuffle before the output " +
          "sort, no UDFs"),
      "text_hashed_tfidf" ->
        ("ONE corpus scan/tokenize into a (doc,bucket) partial-aggregated " +
          "tf shuffle; df and the L2 norm are bucket-/doc-keyed windows " +
          "over the tiny tf rows (a groupBy df branch re-read the corpus " +
          "— ReuseExchange defeated by count pruning; tools.ReuseCheck " +
          "asserts the single scan)"),
      "text_bigram_ppl" ->
        ("one bigram-keyed counting shuffle builds the LM; context " +
          "counts fold from the bigram counts as a t1-keyed window so " +
          "the LM table is ONE lineage (a groupBy(t1) branch re-read " +
          "the corpus — ReuseExchange defeat, same mechanism as " +
          "hashedTfIdf's df); scoring is an equi-join + per-doc " +
          "aggregation; at this sf AQE broadcasts the LM table, at " +
          "scale both sides shuffle once on the bigram key"),
      "pipeline_quality_score" ->
        ("frozen-model classifier scoring is a single codegen'd " +
          "projection over one scan (weights ride as array literals) — " +
          "zero shuffle before the output sort, no UDFs, no state: the " +
          "same expression streams in append mode (streaming_quality)"),
      "graftdb_knn_after_extend" ->
        ("after the frozen-model tail fold BOTH segments are IVF layouts " +
          "— the probe union shows PartitionFilters on _ivf_part for " +
          "each, SQ8 gate + exact rerank on top, no brute-forced tail " +
          "scan left in the plan"),
      "text_bpe_tokens" ->
        ("frozen-merge BPE encode is ONE codegen'd projection per row " +
          "(spacing regex + a chain of literal StringReplace calls — no " +
          "UDF, no regex engine per merge) — zero shuffle before the " +
          "output sort; the same expression streams in append mode " +
          "(streaming_bpe)"),
      "embedding_project" ->
        ("random projection is row-local: k fold-accumulated inner " +
          "products against a literal sign matrix + posexplode, all " +
          "codegen'd — zero shuffle before the output sort, no model " +
          "table to join or broadcast"),
      "text_normalize" ->
        ("normalization is one codegen'd projection (regex Cc/Cf pass, " +
          "translate, lower, collapse — all string expressions) — zero " +
          "shuffle before the output sort"),
      "pipeline_recipe" ->
        ("the composed four-stage recipe keeps each stage's shape: " +
          "normalize + token gate fuse into the FIRST scan (one " +
          "projection), the dedup is the one fingerprint-keyed " +
          "aggregation + a keep-id join (AQE broadcasts at this sf), " +
          "and the per-source cap is a window sorted WITHIN sources " +
          "only — composition adds no extra corpus scan and no global " +
          "sort"))

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.Plans` against `$sfDir`. ")
    sb.append("Each section states the plan property the design requires; " +
      "`PlanSpec` enforces the same invariants as tests.\n")
    interesting.foreach { case (name, why) =>
      SparkEntry.queries.get(name).foreach { fn =>
        val plan = try
          fn(spark, sfDir).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"(failed: ${e.getMessage})" }
        sb.append(s"\n## $name\n\n_Required property: ${why}._\n\n")
        sb.append("```\n").append(plan.trim).append("\n```\n")
      }
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${interesting.size} plans)")
    spark.stop()
  }
}
