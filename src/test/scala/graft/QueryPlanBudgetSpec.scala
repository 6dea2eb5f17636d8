package graft

import graft.operators.BucketOps

/** Shuffle-budget regression guard: the number of Exchange operators in
  * each headline query's physical plan is pinned, so a refactor that
  * silently adds a shuffle (the round-1 ngram self-join class of bug)
  * fails CI instead of the bench. Counts are taken with AQE off (AQE
  * hides exchanges inside query stages); planning only — nothing
  * executes. Budgets are exact (=, not ≤): a DROP in shuffles is also
  * worth noticing, since it usually means a plan changed shape.
  */
class QueryPlanBudgetSpec extends SparkSpec {

  // Conf-isolated session (r15): exact-count pins evaluated on the
  // shared session raced other suites' session-conf flips.
  override lazy val spark: org.apache.spark.sql.SparkSession = SparkSpec.isolated()

  private val sfDir = "/root/testdata/sf0.001"

  // query → exact Exchange count (includes the final ORDER BY's range
  // exchange and, for documents-based queries, TP's explicit single-file
  // parallelism repartition).
  //
  // r15 counting change (round-14 advisor item 3): the count now ALSO
  // includes exchanges inside eagerly-checkpointed subtrees (recorded
  // via spark.graft.ckpt.record and re-planned — see hiddenExchanges),
  // so an eager pin no longer blinds the guard to shuffles under it.
  // 14 pins were re-derived under the new counting in the same commit;
  // each one's visible-plan breakdown in its comment still holds — the
  // delta is the pinned subtree(s). text_ccnet_buckets moved 13 → 12
  // for BOTH reasons at once: pre-pin, the static plan duplicated the
  // TP exchange under the two bigram consumers (+2, deduped only at
  // runtime by ReuseExchange); the r14 eager pin hid the subtree (−2,
  // the round-14 red-test flake was exactly this, not a conf race);
  // recording restores the subtree ONCE (+1) = 12.
  private val budgets = Map(
    "q1_agg" -> 3,            // SP spread (r14) + agg + final ORDER BY
    "q3_join_topn" -> 1,      // broadcast join (no shuffle) + agg; topN is TakeOrdered
    "q5_multijoin" -> 4,      // 5-table join: nation/region broadcast; the
                              // customer dim side carries NO static hint
                              // (scale-proportional — BroadcastSizeAudit), so
                              // the STATIC plan shows its equi-join exchanges;
                              // AQE collapses them to a broadcast at runtime
                              // while the dim side fits the size threshold
    "q6_selective_agg" -> 1,  // global agg single-partition exchange
    "q10_topk" -> 0,          // TakeOrderedAndProject — no exchange at all
    "dedup_exact" -> 3,       // TP repartition + hash agg + ORDER BY
    "events_window_agg" -> 2, // hour agg + ORDER BY
    "data_split" -> 3,        // TP repartition + split agg + ORDER BY
    "text_topterms" -> 4,     // TP + (doc,token) agg + per-doc window + ORDER BY
    "data_domain_cap" -> 3,   // TP + group-limit window + ORDER BY
    "data_shuffle" -> 5,      // TP + bucket window + count agg (2: partial/final over pruned scan) + ORDER BY; offsets ride a broadcast NLJ
    "text_ngram_topk" -> 3,   // TP + (doc,gram) agg + gram agg; top-k is TakeOrdered
    "quality_model_score" -> 5, // TP + (doc,token) agg + (doc,bucket) agg + doc agg + ORDER BY
    "data_drift" -> 1,        // totals agg only: the vocab-sized conditional agg sits behind
                              // a lazy localCheckpoint (its TP + token-agg exchanges run once
                              // at materialization, outside this measured plan); a count > 1
                              // here means the single-scan shape regressed to a join
    "events_agg_maint" -> 5,  // 3 day-slice aggs + one merge-side exchange + ORDER BY;
                              // both full-outer merges otherwise reuse the aggs' hash partitioning
    "q35_mad" -> 4,           // SP spread (r14) + median agg + deviation agg (med table broadcast back) + ORDER BY
    "events_hopping" -> 2,    // window() is a generator (projection) — agg + ORDER BY only
    "events_debounce" -> 2,   // per-key lag window + ORDER BY
    "events_cooccurrence" -> 3, // user agg + pair agg + ORDER BY (pair expansion is in-row)
    "data_skew_report" -> 2,  // key agg + one-row total agg; top-k is TakeOrdered
    "text_bpe_pairs" -> 3,    // TP + vocab agg + pair agg; top-k is TakeOrdered
    "events_time_split" -> 3, // countDistinct expand pair + ORDER BY; the split itself is a projection
    "events_burst" -> 2,      // user-keyed RANGE window (groupBy reuses it) + ORDER BY
    "events_gap_stats" -> 2,  // one user-keyed sort serves lag + rank + count windows + agg; ORDER BY
    "events_churn" -> 3,      // user agg + 1-row frontier agg + ORDER BY; frontier rides broadcast
    "events_interval_overlap" -> 3, // events window shuffle + interval_id agg + ORDER BY;
                              // the 50-interval side is a BroadcastExchange (not counted)
    "quality_oov" -> 5,       // TP + term agg (ReuseExchange-shared with the vocab subtree)
                              // + vocab token agg + doc agg + ORDER BY; membership rides broadcast
    "text_zipf" -> 10,        // TP + term agg + token agg + banded-rank core ((tf,pfx)
                              // band agg + band-count offset window + in-band window; the
                              // token agg recurs under the band-agg subtree pre-AQE, deduped
                              // by ReuseExchange at runtime) + ORDER BY; total rides a
                              // broadcast NLJ
    "vec_norm_audit" -> 3,    // TP + bucket agg + ORDER BY — norms stay map-side
    "events_ewma" -> 2,       // one user-keyed sort serves all 16 lags + latest-row pick; ORDER BY
    "events_anomaly" -> 2,    // one user-keyed sort serves both moment windows; ORDER BY
    "events_dwell" -> 3,      // user window + type agg + ORDER BY
    "events_transitions" -> 4, // user window + (from,to) agg + per-from window + ORDER BY
    "text_ngram_novelty" -> 4, // TP + shingle-hash window + doc agg + ORDER BY
    "vec_power_iteration" -> 4, // TP + v0-seed single-row + component-index agg + dim-row collect
    "data_profile" -> 2,      // one scan, 4-way countDistinct Expand pair; ORDER BY
    "events_heatmap" -> 2,    // (dow,hour) agg + ORDER BY — pure integer projection beneath
    "events_late_audit" -> 2, // user-keyed running-max window (agg reuses it) + ORDER BY
    "text_langid_eval" -> 4,  // TP + (lang,guess) agg + per-lang window + ORDER BY
    "q38_keyset_pagination" -> 0, // cursor filter pushed to scan + TakeOrderedAndProject — NO exchange
    "events_sequences" -> 2,  // user-keyed sort serves both lags + (t1,t2,t3) agg; top-k is TakeOrdered
    "q39_basket_affinity" -> 1, // pair agg only: the guarded basket expansion
                              // (boundedBucketPairs) lazily checkpoints the basket table,
                              // so the basket agg sits below the truncation; top-k is
                              // TakeOrdered
    "text_readability" -> 2,  // TP + ORDER BY — every feature is a map-side projection
    "events_streaks" -> 3,    // (user,day) distinct + streak agg reusing the island sort + ORDER BY
    "events_wow_change" -> 2, // week agg + week-count-sized lag window (ORDER BY reuses its sort)
    "events_pareto" -> 7,     // user agg + 1-row total agg + banded-rank core ((n,sub)
                              // band agg + band-count offset window + ≤4096-row in-band
                              // window; user agg recurs pre-AQE, ReuseExchange dedupes)
                              // + ORDER BY
    "data_label_balance" -> 4, // TP + label agg + 1-row total agg + ORDER BY; total rides broadcast
    "graph_triangles" -> 5,   // degree agg + orientation join (2) + adjacency agg +
                              // totals agg (r14: the wedge-materializing self-join +
                              // closing semi-join became in-row sorted-adjacency
                              // intersection counting — one attach join reuses the
                              // adjacency agg's partitioning); baskets/edges/oriented
                              // frames are lazily checkpointed below the truncation
    "dedup_prefix_filter" -> 5, // df agg + prefix re-collect + the two explicit pair-keyed
                              // verify repartitions (REPARTITION_BY_NUM — exempt from AQE
                              // coalescing so the per-pair exact-Jaccard verify keeps
                              // core-count parallelism; r14 optimization); candidate +
                              // verify joins hang off the checkpointed docs/bucket frames
    "q41_hotkey_join" -> 5,   // hot-key count agg + cold-path SMJ (2 sorts) + final agg +
                              // ORDER BY; hot path is all BroadcastHashJoin (not counted)
    "data_dense_ids" -> 4,    // band-count agg + band-sized offset window + in-band window
                              // (1024-row cap) + ORDER BY; offsets ride BroadcastExchange
    "events_attribution" -> 2, // ONE user-keyed sort serves all three windows + ORDER BY
    "text_heavy_tokens" -> 3, // TP + exact-count agg + ORDER BY; the MG sketch pass and its
                              // 1-row merge hang off the checkpointed sketch frame, and the
                              // candidate filter rides BroadcastExchange (not counted)
    "vec_centroid_affinity" -> 4, // TP + (label,pos) moment agg; norm/pair aggs + final ORDER BY
                              // hang off the checkpointed label×dim moments frame
    "events_ohlc" -> 2,       // (type,hour) partial-agged shuffle + ORDER BY
    "q40_rfm" -> 19,          // custkey agg + 2 scalar aggs + 3 chained banded-rank
                              // passes (each: band agg + band-count offset window +
                              // in-band window; each pass's band-agg subtree repeats its
                              // input lineage pre-AQE — ReuseExchange collapses them at
                              // runtime, leaving ~12 live) + ORDER BY; scalars broadcast
    "events_trend" -> 3,      // (user,day) agg + user moment agg + ORDER BY — both aggs
                              // partial-agged so each shuffle moves combined rows
    "data_kanonymity" -> 2,   // QI-tuple agg + ORDER BY; class count bounded by QI domain
    "text_fertility" -> 3,    // TP + lang agg + ORDER BY — token counting is map-side
    "vec_kmeans_step" -> 4,   // TP ×2 (corpus + centroid subtree) + 1-row collect agg +
                              // k-row update agg; assignment rides BroadcastExchange (not counted),
                              // init top-k is TakeOrdered, final ORDER BY reuses the agg exchange
    "data_fk_audit" -> 3,     // ONE join for all 7 FK edges: stacked (edge,key) agg + parent
                              // union shuffle + ORDER BY — fact tables scanned once, edges in-row
    "quality_model_auc" -> 8, // TP×2 (docs reread for labels) + score chain (token/bucket/doc
                              // aggs) + label join + (source,score) agg + ORDER BY; the
                              // per-source cumulative runs on the score-domain frame
    "data_ks_drift" -> 6,     // (slice,v) agg + grid agg + slice totals + grid×slice join +
                              // per-slice cum window + ORDER BY — all value-domain sized
    "q42_moments" -> 2,       // one hash agg with map-side partials + ORDER BY
    "q43_percentrank" -> 6,   // grouped-banded-rank core ((nation,bb) band agg +
                              // per-nation band window + in-band window) + nation totals
                              // agg + bounded peer window + ORDER BY; scan recurs
                              // pre-AQE, ReuseExchange dedupes (round-8: replaced the
                              // per-nation hot-partition rank window)
    "events_quantile_sketch" -> 3, // day-sketch agg + 1-row merge + rank-check agg;
                              // the 1-row estimate rides a broadcast NLJ (not counted)
    "events_cms_check" -> 3,  // day-sketch agg + 1-row merge + exact top-10 agg
                              // (TakeOrdered); the sketch rides broadcast
    "q44_joinsize" -> 5,      // 2 sketch 1-row aggs + 2 key-count aggs + full-outer
                              // stats agg (reuses count partitioning); est rides broadcast
    "events_autocorr" -> 2,   // daily-totals agg (behind lazy checkpoint feeding both
                              // pair sides) + ORDER BY; the day+1 join is calendar-sized
    "maint_join_view" -> 1,   // persisted-view scan + TWO broadcast delta joins + ORDER BY
                              // only — the base-base join is never in this plan
    "multimodal_framesample" -> 1, // partition-local decode + in-row frame expand; the one
                              // shuffle (ORDER BY) moves ids+sigs — binary never shuffles
    "data_expectations" -> 2, // ONE scan: countDistinct expand pair; rule rows are an
                              // in-row stack of the 1-row aggregate
    "data_neyman_alloc" -> 3, // stratum moment agg + 1-row weight total + stratum-count
                              // windows + ORDER BY sharing the tiny frame's sort
    "data_benford" -> 3,      // digit agg + 1-row total agg + ORDER BY; total rides broadcast
    "events_gini" -> 5,       // user totals agg + banded-rank core (xb band agg +
                              // band-count offset window + in-band window; totals agg
                              // recurs pre-AQE, ReuseExchange dedupes); final agg is 1 row
    "events_twap" -> 3,       // user-keyed dwell sort + type agg + ORDER BY
    "data_bootstrap_ci" -> 3, // SP spread (r14) + ×64 in-row expand + ONE groupBy(b); rank picks run on
                              // the 64-row mean frame (final agg reuses its sort)
    "dedup_best_match" -> 5,  // minhash band agg + bucket pair-gen + symmetric-union
                              // best window + mutual self-join + ORDER BY, all off the
                              // checkpointed pair frame
    "events_calendar_gaps" -> 4, // distinct types + 1-row bounds + observed distinct +
                              // ORDER BY; grid explodes in-row off broadcast bounds
    "data_ldiversity" -> 3,   // QI agg with countDistinct expand pair + ORDER BY
    "vec_pq" -> 2,            // TP + ORDER BY — codebook is a literal array, assignment
                              // is in-row HOF arithmetic; the corpus never shuffles
    "q46_equidepth" -> 8,     // value-domain agg + 1-row total + banded-rank core (vb
                              // band agg + band-count offset window + in-band window;
                              // domain agg recurs pre-AQE, ReuseExchange dedupes) +
                              // bucket agg + ORDER BY
    "data_kanon_suppress" -> 2, // QI class agg (broadcast back) + ORDER BY
    "events_quantile_by_type" -> 4, // (type,day) sketch agg + per-type merge + rank-check
                              // agg + ORDER BY; the 5-row estimate rides broadcast
    "pipeline_schema_evolution" -> 1, // two-generation mergeSchema union scan + 1-row agg
    "data_oversample" -> 4,   // TP + label join + final agg + ORDER BY; the histogram
                              // (behind a lazy checkpoint) feeds max + factors once
    "text_vocab_coverage" -> 8, // TP + token agg + banded-rank core ((c,pfx) band agg +
                              // band-count offset window + in-band window; token agg recurs
                              // pre-AQE, ReuseExchange dedupes) + ORDER BY; totals ride a
                              // broadcast NLJ
    "q47_setops_all" -> 3,    // intersectAll/exceptAll share one hash partitioning;
                              // per-branch aggs reuse it — 2 branch aggs + ORDER BY
    "ann_pq_adc" -> 7,        // TP×2 (codes + rerank fetch) + per-query ADC window +
                              // candidate join + rerank window + hit agg; queries/
                              // candidates ride broadcast
    "events_ab_test" -> 2,    // one 2-row moment agg; arms meet in a 1×1 broadcast NLJ
    "write_bin_packing" -> 7, // key-size agg + banded-rank core (kb band agg +
                              // band-count offset window + in-band window; key-size agg
                              // recurs pre-AQE, ReuseExchange dedupes) + bin agg + ORDER BY
    "text_rake" -> 3,         // TP + doc-keyed phrase window/agg + phrase score agg;
                              // word stats ride an AQE join off the checkpointed
                              // phrase frame, top-k is TakeOrdered
    "events_forecast_baseline" -> 2, // daily agg (lazy checkpoint feeds actual + lag-7
                              // sides) + ORDER BY; the day+7 join is calendar-sized
    "dedup_tf_cosine" -> 8,   // TP + shingle df agg + g-bucket pair collect + pair-distinct agg + ORDER BY + the
                              // two pair-keyed verify repartitions; the old posting-join
                              // dot (2 more exchanges + SUM agg) is now the in-row native
                              // TfDotProduct over checkpointed sorted term vectors (r14)
    "data_dataset_card" -> 3, // TP + ONE agg (distinct-hash expand pair) + ORDER BY;
                              // metric rows are an in-row stack
    "q48_cohort_ltv" -> 4,    // customer cohort agg + cell agg + cohort-month window +
                              // ORDER BY, off the checkpointed order projection
    "q49_otif" -> 2,          // orderkey fact-fact join shuffle + supplier agg;
                              // ORDER BY reuses the agg partitioning
    "dedup_lsh_tuner" -> 1,   // 100-row in-row grid + S-curve folds; the single
                              // exchange is the grid window's tiny sort
    "data_ablation" -> 2,     // TP + per-source agg (checkpoint feeds global too) +
                              // ORDER BY; global rides a broadcast NLJ
    "events_ab_srm" -> 1,     // one 1-row conditional agg
    "pipeline_json_roundtrip" -> 1, // json file scan + 1-row agg
    "dedup_review_sample" -> 4, // band agg + per-band window + ORDER BY off the
                              // minhash pair chain's checkpointed frames
    "events_chi2" -> 2,       // cell agg + ORDER BY; margins are windows on the lazily-
                              // checkpointed cell frame, the chi2 total rides broadcast
    "quality_kappa" -> 1,     // ONE scan → one 1-row confusion agg
    "events_cusum" -> 3,      // daily agg + type-keyed window exchange + ORDER BY
    "data_quantile_norm" -> 5, // (source,v) agg + source windows + global-domain window +
                              // final ORDER BY off the checkpointed docs frame; domain
                              // lookups ride broadcast
    "events_survival" -> 6,   // user agg + cohort/dur cells + reverse window + cohort
                              // collect + posexplode + ORDER BY; global max rides broadcast
    "dedup_blocking_eval" -> 7, // band histogram agg + truth-side df/prefix aggs (incl.
                              // the truth path's two pair-keyed verify repartitions,
                              // r14) + 1-row confusion agg off the checkpointed bands
    "quality_label_prop" -> 8, // minhash band agg + bucket pair-gen + vote agg + argmax
                              // window + ORDER BY across the pair-chain frames
    "data_temperature_mix" -> 3, // source mass agg + 1-row weight total + source-count
                              // windows + ORDER BY sharing the tiny frame's sort
    "text_retrieval_metrics" -> 14, // bm25 chain (term/dl/df/total aggs + joins) + rel
                              // scan + level counts + ranked join + fold aggs; small
                              // frames ride broadcast
    "graph_sssp" -> 8,        // lane agg; relax rounds hang off checkpointed frames,
                              // ORDER BY reuses the last round's agg partitioning
    "q50_skyline" -> 2,       // quantity-domain agg + single-partition domain window
                              // (ORDER BY reuses its sort)
    "q51_weighted_median" -> 3, // (flag,pc) agg + flag-keyed window + final flag agg; the r14
                              // SP spread was dropped in r15 (driver A/B regressed it 16%)
                              // (ORDER BY reuses it)
    "vec_matryoshka" -> 6,    // TP + two ranking windows + overlap semi join + query
                              // distinct + ORDER BY; 5-row-per-query sets ride broadcast
    "vec_centroid_drift" -> 4, // TP + (label,pos) cell agg + label collect agg + ORDER BY
    "data_tcloseness" -> 4,   // class agg + cell agg + grid left join + final class agg;
                              // segment/global frames ride broadcast
    "events_stl" -> 0,        // daily agg + MA windows sit behind the lazy checkpoint;
                              // seasonal join rides broadcast, ORDER BY reuses its layout
    "events_rolling_median" -> 3, // daily agg + type-keyed window + ORDER BY
    "events_power_analysis" -> 2, // one type-keyed moment agg + ORDER BY
    "data_feature_store" -> 3, // ONE user agg (type counts are conditional sums, not a
                              // pivot join) + 1-row frontier agg + ORDER BY
    "events_cumulative_users" -> 3, // user first-seen agg + day agg + day-domain window
                              // (ORDER BY reuses its sort)
    "events_outlier_iqr" -> 3, // daily agg + domain windows + ORDER BY off the lazily-
                              // checkpointed daily frame; quartiles ride broadcast
    "q53_window_family" -> 2, // ONE nation-keyed window layout serves all five functions
                              // + ORDER BY
    "events_error_wilson" -> 2, // one day-keyed agg + ORDER BY; Wilson bound is projection
    "vec_knn_eval" -> 3,      // knn vote agg + argmax window + final label agg off the
                              // checkpointed vecs frame; probes/neighbors ride AQE broadcast
    "data_fd_check" -> 4,     // ONE denormalized scan (dims broadcast) + stacked (fd,key)
                              // agg with countDistinct expand + fd agg + ORDER BY
    "events_holt" -> 3,       // daily agg + per-type collect agg + ORDER BY; the fold is
                              // in-row
    "events_session_window_builtin" -> 2, // one user-keyed session agg + ORDER BY — the
                              // native SessionWindowing path sorts within the agg
    "q54_not_in_nulls" -> 2,  // two null-aware anti joins over broadcast lists; one
                              // 1-row agg per branch + union ORDER BY
    "q55_join_hints" -> 5,    // merge variant's 2 sorts + shuffle_hash exchange + union
                              // ORDER BY; broadcast/AQE variants add none
    "ann_ivf_sweep" -> 22,    // ONE shared train+assign (r14: centroids and cell
                              // assignment don't depend on nProbe, so the 4 sweep
                              // points probe one eagerly-checkpointed index; the 4
                              // probe pipelines keep their window/agg exchanges)
    "data_cast_audit" -> 3,   // SP spread (r14) + ONE scan + stacked (cast_to) agg + ORDER BY
    "diff_column_stats" -> 3, // full-outer diff join (SMJ sorts ride the lazily-
                              // checkpointed diff frame) + column-stack agg + row-total
                              // agg + union ORDER BY
    "events_json_variant" -> 2, // one k agg + ORDER BY; variant parse is a projection
    "q56_string_funcs" -> 1,  // pure projection + ORDER BY
    "q57_null_ordering" -> 1, // bounded single-partition rank window (ORDER BY reuses it)
    "q58_date_funcs" -> 1,    // pure projection + ORDER BY
    "vec_matryoshka_curve" -> 18, // 4 exact rankings (per-query window + hit agg each) +
                              // union ORDER BY — a planning CURVE runs the ranking once
                              // per dim point by design; queries ride broadcast
    "q59_array_funcs" -> 2,   // TP + ORDER BY — every array op is a projection
    "events_anova" -> 2,      // one type-keyed moment agg + 1-row fold agg
    "data_dedup_idempotence" -> 15, // r15: one eager (id, sh) pin feeds BOTH passes
                              // (the corpus was shingled 4x before); pass-2 band agg +
                              // pair-gen + CC subtrees + two 1-row counts off the
                              // checkpointed survivor signatures
    "quality_calibrate" -> 6, // TP + grouped-banded-rank core ((source,qb) band agg +
                              // per-source band window + in-band window) + per-source
                              // totals agg + ORDER BY (round-8: replaced the per-source
                              // percent_rank hot-partition window; r15: the scored
                              // projection is eager-pinned, so the tokenize scan subtree
                              // is counted once instead of recurring per consumer)
    "data_curriculum" -> 6,   // same calibrate core keyed by lang + the stage projection
                              // (r15: the scored projection is eager-pinned — the
                              // tokenize scan subtree is counted once, not per consumer)
    "q17_subquery" -> 2,      // brand avg agg (broadcast back) + ORDER BY (round-8:
                              // replaced the partitionBy(brand) window)
    "q25_ntile" -> 6,         // grouped-banded-rank core + segment totals agg +
                              // (segment,quartile) agg + ORDER BY (round-8: replaced the
                              // per-segment hot-partition ntile window)
    "ann_ivfpq" -> 8,         // TP×2 (residual-code build + rerank fetch) + per-query
                              // residual-ADC window + candidate dedup agg + rerank window
                              // + hit agg; queries/centroids/codebooks ride broadcast —
                              // the corpus never shuffles to be indexed
    "q61_recursive_cte" -> 2, // one UnionLoop recursion (frontier re-shuffle internal to
                              // the loop) + final group agg; depth = log₁₀(keyspace)
    "q62_sql_udf" -> 2,       // group agg + ORDER BY — the SQL UDF inlines to the same
                              // plan as hand-written decimal arithmetic (no UDF node)
    "q63_pipe_syntax" -> 2,   // group agg + ORDER BY — pipe stages parse to the nested-
                              // SQL plan, post-agg |> WHERE folds into the agg filter
    "q64_trimmed_mean" -> 6,  // grouped-banded-rank core (value agg + band agg, offsets
                              // broadcast back) + group totals agg + trimmed agg +
                              // ORDER BY; no per-group raw-row window anywhere
    "ann_ivf" -> 9,           // round-9: centroid training is driver-side Lloyd over the
                              // capped sample (zero per-pass Catalyst plans — the r8 cost
                              // was per-iteration codegen re-JIT); the measured plan is
                              // brute-force top-k (corpus agg + per-query window) ⊕ IVF
                              // probe (assign projection + dedup agg + window) + recall
                              // join + final 1-row agg
    "q66_jaro_winkler" -> 4,  // distinct-names agg + candidate-pair dedup agg ×2 (the
                              // swapped-direction branch re-plans the vocab subtree;
                              // ReuseExchange dedupes at runtime) + final ORDER BY — the
                              // JW kernel runs only in vocabulary-sized subtrees, the
                              // corpus expands through two (name, block) equi-joins
                              // (round-9: replaced the within-brand quadratic)
    "q65_spearman" -> 10,     // r15: x (bounded domain by contract) ranks via ONE
                              // per-g window over its domain-sized value table — the
                              // banded core's 4 extra exchanges dropped; y keeps the
                              // banded core (value agg + band agg + group-offset agg)
                              // + row⋈y-ranks shuffle join + moment agg + ORDER BY;
                              // x-ranks and band offsets ride broadcast
    "dedup_semantic" -> 3,    // the round-11 pruneCells lazy localCheckpoint: the
                              // assignment scan materializes ONCE and the pair sides /
                              // anti-left all read its blocks (was 7 with 3× TP
                              // re-instantiation) — anti-join id hash + dropped-distinct
                              // agg + ORDER BY remain; the within-cell pair join itself
                              // broadcasts the b side at testdata scale (at corpus scale
                              // it is ONE shuffle on cell — see the semantic_prune probe)
    "data_linkage" -> 2,      // TP spread (the one-file customer scan would otherwise
                              // run all candidate comparators in ONE task — the round-9
                              // 15 s fix) + final ORDER BY; blocked candidates ride a
                              // broadcast hash join on blk, comparators are map-side
    "data_overlap_sketch" -> 2, // two window-slice KMV sketch aggs collapse into one
                              // partkey agg (partial+final) + single-partition estimate
                              // row; k longs per partition per side — no key co-shuffle
    "data_dp_release" -> 2,   // clipped segment agg + ORDER BY — the noise draw is a
                              // seeded md5 projection over the released rows only
    "dedup_semantic_incr" -> 15, // (r15: +1 — the index build's
                              // assignment pin went eager for the concurrent-writer
                              // race, so its subtree is now recorded and counted)
                              // the PROBE plan only (the index build ran eagerly):
                              // 2× TP (delta union branches under the vs-index join
                              // and the verdict spine; the remainder self-prune now
                              // reads the round-10 `rem` checkpoint, which also feeds
                              // the guard's cell count and the survivor append — one
                              // lineage execution instead of three) + delta cell
                              // shuffle + self-prune drop agg + two verdict left-join
                              // id hashes + dropIdx distinct + ORDER BY; the INDEX
                              // side is the bucketed catalog read — Exchange-free
    "dedup_winnowing" -> 2,   // pair-count agg + ORDER BY — measured BELOW the bucket
                              // table's lazy localCheckpoint (allBucketPairs); the
                              // upstream TP + per-doc selection-window sort + fp-hash
                              // bucket agg run once at checkpoint materialization, and
                              // the winnow_fingerprints scale probe covers their shape
    "data_dsir" -> 8,         // 3× TP (gram subtree re-instantiated for the score pass,
                              // the bucket-count pass, and the totals pass — ReuseExchange
                              // dedupes the identical count subtrees at runtime) + bucket
                              // agg ×2 + 1-row totals agg + per-doc weight agg + final
                              // ORDER BY; the lr table and totals ride BROADCAST, the
                              // top-50 rejoin is a broadcast of TakeOrderedAndProject —
                              // every corpus-sized shuffle is a partial-agg gram fold
    "quality_model_fit" -> 3, // 2× TP (the moments pass and the broadcast-eval pass each
                              // re-instantiate the feature projection — fit-then-eval is
                              // two corpus scans by design) + ONE single-partition
                              // exchange for the global moment agg; the Cramer solve,
                              // SSE, and the model→eval rejoin all ride 1-row broadcasts
    "ann_mips" -> 13,         // exact side (brute-force window over the corpus⋈broadcast
                              // queries) ⊕ reduction side (1-row max-norm agg + augmented
                              // IVF: TP re-instantiations under pruning, assign/dedup agg,
                              // per-query window, exact-dot rescore joins) + recall
                              // left-semi agg + final ORDER BY; queries/model rows all
                              // ride broadcast — no corpus self-join anywhere
    "data_active_learning" -> 4, // 2× TP (moments pass + scoring pass) + the global
                              // moments exchange + final ORDER BY; the 1-row model and
                              // the lang rejoin of TakeOrdered's 40 rows ride broadcast
    "text_bpe_train" -> 1,    // measured plan = the driver-assembled 8-row merge table's
                              // ORDER BY only; each training round is its own bounded
                              // job (vocab agg + pair agg + 1-row TakeOrdered) over the
                              // lazily-checkpointed vocab — the corpus is scanned ONCE
    "text_bpe_encode" -> 1,   // one single-partition exchange for the global stats agg
                              // over the final (checkpointed) vocab state; training
                              // rounds ran as their own bounded jobs (see text_bpe_train)
    "multimodal_phash_dedup" -> 2, // candidate-pair distinct agg + ORDER BY —
                              // measured BELOW the sig table's lazy localCheckpoint
                              // (the upstream sample posexplode + two id aggs + band
                              // bucket agg run once at materialization); the verify
                              // sig re-attach joins broadcast at this scale
    "text_entropy" -> 4,      // TP + (doc, token) partial agg + per-doc fold agg +
                              // ORDER BY — ln sites live on the distinct-count rows
    "events_ab_cuped" -> 2,   // per-user pre/post agg + per-arm moment agg (the 1-row
                              // tmin and pooled-fold rows ride broadcast; ORDER BY of 2
                              // rows collapses into the arm agg's exchange)
    "vec_binary_quant" -> 9,  // TP ×2 (corpus + query side under pruning) + the two
                              // per-query rank windows (hamming asc / cosine desc) +
                              // hits semi agg + err agg + rejoin + ORDER BY; queries
                              // ride broadcast, the pair scoring is map-side
    "data_psi" -> 4,          // bin conditional-sum agg + 1-row totals + the ≤10-row
                              // term collect + ORDER BY; PSI fold and totals broadcast
    "data_kfold" -> 6,        // the groupedBandedRank core over (lang, md5-band): band
                              // agg + offset agg + in-band window + (lang,fold) agg +
                              // per-lang balance agg + ORDER BY; never a raw per-lang
                              // window (5-value key — the §5.1 anti-pattern)
    "q67_group_order_all" -> 2, // GROUP BY ALL ≡ plain group agg + ORDER BY ALL sort —
                              // surface syntax, zero extra plan cost
    "quality_ece" -> 5,       // 2× TP (moments + scoring passes) + global moments
                              // exchange + bin agg + final ORDER BY; the model, the
                              // bins-bounded ECE fold, and its broadcast back are free
    "vec_bitext_mining" -> 5, // measured BELOW the two lazy checkpoints (unit vectors,
                              // cross cosines): x-rank window + x-mean agg + y-rank
                              // window + y-mean agg... the pair spine reuses the
                              // cross table; + final ORDER BY
    "data_url_canon" -> 2,    // canonical-key agg + ORDER BY — synthesis and
                              // canonicalization are pure map-side projections
    "text_ccnet_buckets" -> 9, // TP + bigram cf agg + per-doc fam agg + fam⋈lang doc
                              // join + the groupedBandedRank calibrate core ((lang,band)
                              // agg + offset agg + in-band window) + (lang,bucket) agg +
                              // ORDER BY; totals/offsets ride broadcast — the zipf/q65
                              // cost class, never a per-language raw window
    "text_span_scrub" -> 8,   // 4× TP (positions / grams / meta / rebuild consumers of
                              // the tokenize projection — map-side recompute over the
                              // pruned scan is the right 100 TB trade vs checkpointing
                              // a corpus-sized tokens table) + owner min-agg on gram +
                              // coverage anti-join doc hash ×2 + ORDER BY
    "dedup_cross_modal" -> 5, // text side: band-bucket agg + two verify-join doc hashes
                              // (the shingle-set attach); media side: phash pair-gen
                              // below its lazy sig checkpoint + band agg; + final ORDER
                              // BY — the pair-level full outer rides the text side's
                              // hash partitioning, both small dims broadcast
    "dedup_semantic_drift" -> 6, // the occ branch (cell agg) + totals 1-row agg + the
                              // report agg + ORDER-less single row; both branches
                              // re-instantiate the frozen-assign projection's scan under
                              // column pruning (map-side — the training collect ran
                              // eagerly, once) — a count > 6 means a corpus-sized join
                              // crept into what must stay two aggs over one projection
    "text_gopher_rules" -> 3, // TP + rule-keyed agg (verdict stack is an in-row explode
                              // over one scan) + ORDER BY — a count > 3 means a rule
                              // became its own scan instead of a stacked verdict
    "data_weighted_exact_k" -> 2, // TP + (doc, weight) min-key agg; the top-k is
                              // TakeOrdered and the final doc_id sort runs on 60 rows —
                              // the replica explode stays map-side
    "data_semantic_decontam" -> 4, // 2× TP (train union branches re-instantiated under
                              // column pruning) + train-id best-match agg + ORDER BY;
                              // the 8-row eval side rides broadcast
    "data_entity_golden" -> 9, // (r15: the vote and the member count both read ONE
                              // pinned (entity, attr, v) counts table — the second
                              // records⋈labels evaluation and its recurring FS-join
                              // subtrees are gone)
                              // TP comparator spread + the components' label join hash
                              // + entity tag join + vote (entity,attr,v) agg + pick
                              // window + golden pivot agg + sizes agg + final join +
                              // ORDER BY; both FS candidate joins ride broadcast on blk
                              // and the closure's per-round work ran eagerly (bounded
                              // rounds) — a jump here means a match join stopped
                              // broadcasting
    "data_local_dp" -> 2,     // per-user truth agg + the 1-row report agg — the coin
                              // and flip are pure projections
    "dedup_winnow_incremental" -> 17, // r15: the delta is fingerprinted ONCE (eager
                              // pin — its selection sort + distinct now counted, +2;
                              // the former second winnow pass over rem is gone) + probe
                              // pair agg + dropIdx distinct + remFps anti-join + bucket
                              // agg + component/survivor id hashes + ORDER BY; the
                              // index side of the probe join is bucketed on fp_hash —
                              // Exchange-free
    "events_scd2_join" -> 3,  // one user-keyed window sort builds the intervals + the
                              // point↔interval bucket-join hash + ORDER BY; the horizon
                              // is a broadcast 1-row crossJoin and purchases reuse the
                              // user partitioning where AQE allows
    "data_dup_weights" -> 12,  // TP + band-bucket agg (pairs below the allBucketPairs
                              // checkpoint) + component label/size join hashes ×3 +
                              // ORDER BY — the weights themselves are a projection
    "q68_offset" -> 0,        // TakeOrdered absorbs ORDER BY + LIMIT/OFFSET whole —
                              // pagination without a single Exchange
    "data_profile_drift" -> 3, // SP spread (r14) + ONE scan: the 8-way conditional count-distinct Expand's
                              // partial/final pair (+ the 4-row stack is a projection);
                              // a count > 2 means a generation became its own scan
    "dedup_shared_spans" -> 4, // position-bucket agg + per-diagonal agg + the linked-pair
                              // join hash + ORDER BY — the fingerprint selection sort and
                              // winnowDupPairs' own bucket agg sit below their lazy
                              // checkpoints (allBucketPairs), so the report adds one
                              // diag agg over the already-guarded pair machinery
    "vec_maxsim" -> 6,        // 2× TP (query/doc branches) + (qid,grp,tid) max agg +
                              // (qid,grp) decimal-sum agg + per-query rank window +
                              // ORDER BY; the 8-row query side rides broadcast so the
                              // chunk corpus never shuffles to be scored
    "events_funnel_steps" -> 7, // 3 user-keyed step aggs + 2 event-side join hashes
                              // (step joins reuse the previous agg's user partitioning
                              // on one side) + the 1-row count union + ORDER BY
    "text_span_corrupt" -> 2, // map-only like text_fim: ORDER BY range exchange + its
                              // partial only — the T5 masking itself adds no shuffle
    "data_ess" -> 12,          // the dup-weights chain (band agg + pair agg + CC label
                              // agg + cluster-size agg + weight join spine) folded to a
                              // 1-row aggregate; pair gen rides the bucketed band path
    "q70_ignore_nulls" -> 2,  // one window sort per custkey partition (both frames
                              // share it) + final ORDER BY riding the same keys
    "q71_interval_months" -> 1, // pure projection + TakeOrdered — calendar arithmetic
                              // is map-side
    "events_mann_whitney" -> 10, // one banded avg-rank core (vt agg + band agg + global
                              // band-table window + in-band window + gOff agg) + ties agg
                              // + (g,v) join-back + final arm agg + ORDER BY — vs q65's 14
                              // for TWO rank cores; no per-row rank window anywhere
    "quality_pr_curve" -> 10, // the 5 of quality_model_score (hashed-feature scoring) +
                              // label join + (source,score) counts agg + per-source
                              // score-domain window + ORDER BY; totals ride a broadcast
    "text_code_detect" -> 2,  // map-only battery: TP repartition + final ORDER BY — every
                              // feature is a scan-speed projection, the 100 TB contract
    "multimodal_audio_vad" -> 2, // per-clip islands window (bounded frames) reused by both
                              // downstream aggs + ORDER BY; explode/energy are in-row
    "text_mmr" -> 5,          // pool top-k window (query_id) + candidate-vector join +
                              // groupByKey greedy + ORDER BY; queries broadcast into the
                              // scored join so the corpus side never re-shuffles
    "q72_try_arith" -> 2,     // agg (partial+final) + ORDER BY — try_* are row-local
    "q73_lateral_alias" -> 1, // nested projection + TakeOrdered — alias chains are free
    "events_decay_trend" -> 4, // (key,day) agg + 1-row max (single-partition) + per-key
                              // agg + ORDER BY; the decay fold is an in-row aggregate()
                              // over the bounded day list — never a float shuffle agg
    "quality_krippendorff" -> 6, // dedup(item,rater) + (item,lab) agg + item agg (behind a
                              // lazy checkpoint feeding pairs AND n_items) + (c,k) agg +
                              // tiny label-domain aggs; the label-pair cross is an in-row
                              // double explode — 23 → 6 after killing the per-item self-join
    "q74_execute_immediate" -> 2, // the parameterized statement plans exactly like inline
                              // SQL: agg + ORDER BY
    "events_ab_permutation" -> 4, // per-user agg + per-perm agg (the 65× blow-up rides the
                              // USER table via a broadcast literal cross) + obs 1-row +
                              // final 1-row agg — never the raw events ×65
    "events_ams_f2" -> 3,     // ONE scan → 32 integer conditional sums in a single 1-row
                              // agg + the exact-F2 per-key agg + its 1-row fold; the
                              // sketch side is O(1) state, merge-free by addition
    "events_holt_winters" -> 3, // daily agg + per-key collect agg + ORDER BY; the whole
                              // 9-double HW recursion is ONE in-row aggregate() fold
    "text_good_turing" -> 1,  // the count-of-counts lineage (token agg + freq agg) rides
                              // a lazy localCheckpoint shared by rows/next/totals — the
                              // final plan is the 20-row head join + ORDER BY only
    "data_rendezvous" -> 3,   // keys×9 explode → per-key max_by agg (behind a lazy
                              // checkpoint feeding movement AND balance) + 1-row aggs
    "text_dispersion" -> 6,   // (tok,part) agg rides a lazy checkpoint; token-floor agg
                              // + dense broadcast cross + left join back + (tok) agg;
                              // top-k is TakeOrdered — part domain broadcast, never
                              // a corpus-side re-shuffle
    "q75_identifier_clause" -> 2, // IDENTIFIER('t') plans exactly like the literal name:
                              // agg + ORDER BY
    "quality_mcnemar" -> 9, // two hashed-model score chains (each: (doc,token) agg +
                              // (doc,bucket) agg + doc agg over a SHARED token-table
                              // lineage) + the label join + per-source agg + ORDER BY
    "events_shapley" -> 1,    // final plan = the 3-row driver-literal Shapley result +
                              // ORDER BY; the per-user mask agg + 8-row coalition collect
                              // run eagerly at construction (the kmeans1d posture)
    "data_wasserstein" -> 6,  // the ksDistance shapes: slice totals + broadcast grid cross
                              // + slice-count join-back + per-slice CDF window + final agg
                              // + ORDER BY; the (slice,v) agg rides a lazy checkpoint
    "data_simpson" -> 3,      // per-stratum decimal-moment agg + the 1-row aggregate-sign
                              // attach (single-partition agg) + ORDER BY — signs only,
                              // no float in the verdict
    "quality_brier" -> 7,     // one bounded group-agg over the driver-literal calibration
                              // table (ordered in-row folds) + ORDER BY; +5 (r15): the
                              // labeled frame is an EAGER pin (isotonicCalibration reads
                              // it twice) and its recorded featurize⋈label subtree is
                              // now counted once
    "quality_isotonic" -> 6,  // final plan = the bounded driver-literal PAV result +
                              // ORDER BY; the distributed (group, bin) integer-cell agg
                              // runs eagerly at construction (the kmeans1d posture);
                              // +5 (r15): the labeled frame is an EAGER pin (the PAV
                              // core reads it twice) and its recorded featurize⋈label
                              // subtree is now counted once
    "events_kmeans1d" -> 1,   // the FINAL plan is the k-row driver-literal result +
                              // ORDER BY; the distributed work (min/max + 64-cell grid
                              // agg) runs eagerly at construction — two bounded passes,
                              // DP on ≤64 cells driver-side (the trainCentroids contract)
    "text_fim" -> 2,          // pure map-only transform; the 2 = final ORDER BY range
                              // exchange + its TakeOrdered-side partial (the dump sort
                              // only — at scale the transform itself is exchange-free)
    "data_epoch_plan" -> 3,   // stratum-cardinality groupBy (partial+final) + 1-row
                              // plan arithmetic + ORDER BY — the corpus never co-shuffles
    "text_distinct_n" -> 4,   // union of two gram explodes → (lang,n) count-distinct
                              // expand (partial + distinct exchange + final) + ORDER BY
    "text_kn_bigram" -> 3,    // post-checkpoint LM derivation: w1/w2 marginal aggs +
                              // top-k sort; the pair groupBy rides the lazy checkpoint,
                              // marginal joins broadcast (type-table-sized)
    "vec_silhouette" -> 4,    // 1-row centroid collect_list agg (limit-k literal) +
                              // per-cell groupBy (partial+final) + ORDER BY; the
                              // distance fold itself is a pure broadcast projection —
                              // zero corpus pair work
    "text_c4_rules" -> 3,     // explode-verdict stack → rule groupBy (partial agg
                              // before the 7-key exchange) + 1-row ppm projection +
                              // ORDER BY — one corpus scan for all 7 rules
    "dedup_bbit_minhash" -> 3, // post-candidate plan (pairs ride the lazy checkpoint):
                              // (id,i) min-hash agg + per-id bit collect + final sort;
                              // bits/sets joins broadcast (pair-member-sized)
    "q69_agg_filter" -> 3,    // COUNT(DISTINCT) FILTER expands: partial + distinct
                              // exchange + final, then ORDER BY rides the same keys
    "q76_grouping_id" -> 2,   // cube Expand agg + ORDER BY
    "q77_timestamp_arith" -> 1, // pure projection; the 1 = final ORDER BY
    "q78_regexp_funcs" -> 1,  // pure projection; the 1 = final ORDER BY
    "events_nelson_aalen" -> 6, // the events_survival chain verbatim (user agg +
                              // cohort/dur cells + reverse window + cohort collect +
                              // posexplode + ORDER BY) with an additive fold
    "events_fdr_bh" -> 2,     // the m-row p table rides ONE lazy checkpoint (its
                              // (type,user)/(type,perm)/type agg exchanges run once at
                              // materialization, feeding both the ranked and the
                              // NULL-obs_diff degenerate branch); the 2 = the m-row
                              // single-partition BH window + ORDER BY
    "events_theil_sen" -> 3,  // daily agg (ReuseExchange serves both self-join sides)
                              // + per-type rank window + final agg; ORDER BY rides the
                              // agg's partitioning
    "graph_assortativity" -> 5, // edge distinct + degree agg + two degree joins (SMJ
                              // pre-AQE — deg is node-count-sized, correctly NOT
                              // broadcast at graph scale) + 1-row moment agg
    "quality_fleiss" -> 5,    // TP + (item,lab) agg + item agg + label-domain agg +
                              // 1-row cross attach
    "events_dgim" -> 1,       // the ranked/counted event table rides ONE lazy checkpoint
                              // (its per-USER sort runs once at materialization); grid,
                              // bucket join and verdict aggs all reuse tiny frames — the
                              // 1 is the est/exact join's final exchange
    "q81_bitwise_agg" -> 2,   // flag-keyed agg + ORDER BY
    "quality_rater_accuracy" -> 2, // 3-rater union scan + rater agg + ORDER BY rides it
    "quality_conformal" -> 8, // ONE corpus pass lives inside the lazy-checkpointed
                              // (lang, err, is_cal) grid; all 8 exchanges move
                              // DOMAIN-sized frames (per-lang sums ×3 consumers, the
                              // threshold window, coverage agg, final ORDER BY) — the
                              // lang joins ride DomainSized broadcast hints
    "q82_named_window" -> 2,  // ONE shared Sort+Window for all three OVER w functions
                              // (the named-window clause's point) + final ORDER BY
    "q83_sql_scripting" -> 1, // the returned frame is the script's final
                              // variables-only SELECT (OneRowRelation); each loop
                              // step's aggregate ran as its own bounded query
    "events_sax" -> 6,        // ONE raw pass (daily agg, lazy-checkpointed) + the
                              // moment/PAA/word aggs + final ORDER BY — all over
                              // the day/frame DOMAIN grids; mom and word attach
                              // as DomainSized broadcasts
    "graph_louvain_step" -> 7, // weighted-edge agg rides the lazy ckpt; degree agg
                              // + two deg joins + the per-node argmax window +
                              // ORDER BY; m attaches as a 1-row broadcast
    "q84_explode_outer" -> 2, // TP repartition + final ORDER BY; the generator is
                              // in-stage (no shuffle of its own)
    "graph_louvain_coarsen" -> 14, // (r15 second pass: w and the
                              // sweep assignment are EAGER pins — their subtrees are
                              // recorded and counted, +7 vs the lazy-pin counting)
                              // // r15: ONE edge-sized aggregate (the coarse graph
                              // with per-edge counts) now feeds every statistic — the
                              // second keyed-edge agg, the separate m/n_edges scans and
                              // three of six 1-row aggregates are gone; 7 = tot agg +
                              // totals/qterms/assign-summary 1-row aggs + final joins
                              // (the sweep + keyed-join subtrees sit below lazy pins,
                              // per the data_drift counting convention)
    "events_peaks" -> 3,      // daily agg + ONE per-type sort serving both range windows
                              // + final ORDER BY
    "vec_purity" -> 4,        // TP + (cell,label) agg + per-cell rank window + cell agg;
                              // assignment is a broadcast-literal projection (5 seeds
                              // collected at construction, the trainCentroids contract)
    "multimodal_video_shots" -> 3, // TP (the md5 histogram projection was serial on the
                              // 1-task single-file scan — r14) + per-clip lag window +
                              // clip agg reusing its sort; ORDER BY rides the agg keys;
                              // frame expand is in-row
    "events_time_to_convert" -> 6, // the gap table rides a lazy checkpoint (view/buy aggs
                              // run once); banded-rank core = (cohort,band) cell agg +
                              // cohort offset window over the CELL table + in-band
                              // (cohort,band) window; + n-per-cohort agg + verdict agg +
                              // ORDER BY — no raw window keyed by the 2-value cohort
    "text_kn_ppl" -> 5,       // scoring side: doc-pair table (lazy checkpoint) joins the
                              // type-sized model (two marginal-agg exchanges + the model
                              // join) + doc agg + ORDER BY; the pair scan runs once
    "data_token_budget" -> 5, // TP + (lang, md5-prefix) band agg + per-lang offset window
                              // over the 256-band table + in-band cumsum window + ORDER BY —
                              // no raw per-lang window (round-13 WindowKeyAudit's first catch)
    "data_acceptance_sampling" -> 4, // stage-1 rank-predicate exchange ×2 (k1 + the
                              // anti-join build side re-plan the scan) + stage-2
                              // exchange + ORDER BY; both k aggs reuse their window's
                              // source partitioning, sample ids ride BroadcastExchanges
    "events_markov_attribution" -> 1, // the FINAL plan is the channel-count-sized
                              // driver-literal result (the 16 integer absorption steps
                              // fold driver-side over the collected bounded transition
                              // matrix — the kmeans1d contract; the chained-DataFrame
                              // form cost 17 s of pure stage scheduling); 1 = ORDER BY
    "q79_percentile_disc" -> 3, // SP spread (r14: the three PERCENTILE_DISC buffers were serial on the 1-task scan) + ordered-set agg + ORDER BY
    "graph_reciprocity" -> 2, // the distinct edge set rides ONE lazy checkpoint (its
                              // distinct exchange runs once, not once per semi-join
                              // side); the 2 = the swapped semi-join's repartition +
                              // the reciprocated 1-row agg; edge-count agg reuses
    "text_source_overlap" -> 4, // (source,token) distinct rides a lazy checkpoint feeding
                              // sizes agg + token self-join + pair agg + ORDER BY;
                              // size joins broadcast (source-count-sized)
    "q80_posexplode" -> 1,    // generator is a projection; the 1 = final ORDER BY
    "data_fair_share" -> 3,   // tenant agg + 1-row totals + the tenant-count-sized
                              // water-filling window (single-partition) + ORDER BY rides it
    "text_mojibake" -> 2,     // one projection + (source) agg + ORDER BY rides the agg keys;
                              // injection and char strips are map-side
    "data_blocklist" -> 2,    // suffix explode is in-row, rules join broadcasts; the 2 =
                              // (doc,host) regroup + final ORDER BY
    "text_heaps" -> 5,        // TP + 1-row max attach (broadcast) + bucket occurrence agg
                              // + token first-seen agg pair + the 16-row cumulative window
    "vec_sq_dim" -> 2,        // final plan: TP + ORDER BY — codes/errs are broadcast-
                              // literal projections; the per-dim min/max train agg runs
                              // eagerly at construction (the trainCentroids contract)
    "ann_ivfpq_drift" -> 4,   // per-cell occupancy agg + 1-row totals agg + the post-cross
                              // 6-key regroup + final single-row exchange; the index build
                              // runs eagerly at construction, cells are a pure broadcast-
                              // literal projection (no corpus pair work, no join)
    "text_span_scrub_winnow" -> 8 // the winnowing selection window sort + fp distinct agg
                              // + owner min-agg on fp_hash + coverage anti-join doc hash
                              // ×2 + TP consumers of the tokenize projection + ORDER BY —
                              // same shape as text_span_scrub but the positioned table is
                              // the 1/w-selected fingerprints, not every gram
  )

  // Exchanges inside eagerly-checkpointed subtrees (r15, round-14
  // advisor item 3): an eager pin truncates the consumer plan to a
  // LogicalRDD, so its subtree's exchanges vanished from the counted
  // total — every new eagerCkpt silently shrank its query's pin and
  // the guard went blind to shuffle regressions under the pin. With
  // `spark.graft.ckpt.record=true` Ckpt records each pre-checkpoint
  // optimized plan; re-planning those subtrees and adding their
  // exchange counts makes the pin cover the WHOLE query again.
  private def hiddenExchanges(): Int =
    graft.operators.Ckpt.drainRecorded().map { p =>
      spark.sessionState.executePlan(p).executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
    }.sum

  test("headline queries match their pinned shuffle counts") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.graft.ckpt.record", "true")
    try {
      graft.operators.Ckpt.drainRecorded() // discard other suites' leftovers
      val report = budgets.toSeq.sortBy(_._1).map { case (q, budget) =>
        val df = SparkEntry.queries(q)(spark, sfDir)
        (q, BucketOps.countExchanges(df) + hiddenExchanges(), budget)
      }
      val off = report.filter { case (_, n, b) => n != b }
      assert(off.isEmpty,
        off.map { case (q, n, b) => s"$q: planned $n shuffles, pinned $b" }.mkString("; "))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.graft.ckpt.record")
    }
  }

  test("data_acceptance_sampling draws both stages through map-side WindowGroupLimit heaps") {
    // round-12 verdict item 1: the rank must be a PREDICATE (filter on
    // row_number ≤ k) so InferWindowGroupLimit installs the Partial
    // (map-side) heap before each exchange — each task forwards ≤ k rows
    // per source and no full per-source sort ever crosses the shuffle
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("data_acceptance_sampling")(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("row_number(), 20, Partial"),
        s"stage-1 draw lost its map-side group-limit heap:\n$plan")
      assert(plan.contains("row_number(), 40, Partial"),
        s"stage-2 draw lost its map-side group-limit heap:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q41_hotkey_join plans both a broadcast hot path and a shuffle cold path") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q41_hotkey_join")(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"hot path must broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"cold path must stay a shuffle join:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
