package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator surface (SURVEY.md §2) expressed
  * over the driver test tables; `oracleSql` is the DuckDB-dialect
  * equivalent the driver hash-compares against. Aliases and rounding are
  * kept identical on both sides (the driver sorts columns by name before
  * hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.localSupplierVolume(spark, "/root/testdata/sf0.001")

  /** Queries REGISTERED WITHOUT an oracle, each with the reason it is
    * not SQL-oracle-expressible. The registration gate
    * (RegistrationGateSpec) asserts `queries.keySet` is EXACTLY
    * `oracleSql.keySet ∪ rowsOnly.keySet` (disjoint) — so no query can
    * ship unchecked-by-omission again (the r6 q187-q189 drift). Every
    * entry here must still carry a bound/recompute spec; the reason
    * string names it. */
  val rowsOnly: Map[String, String] = Map(
    "q37_event_sketches" ->
      ("approximate sketches (HLL/CPC) — nondeterministic vs exact SQL; " +
        "error-bound spec in SketchSpec"),
    "q66_heavy_users" ->
      "approx_count_distinct inside the query — bound spec in SketchSpec",
    "q74_user_reach_sketch" ->
      ("HLL reach estimates — bound-vs-exact spec in SketchSpec " +
        "(tightened against q189's exact WAU this round)"),
    "q90_decon_bloom" ->
      ("one-sided Bloom filter — false-positive side has no SQL twin; " +
        "one-sidedness + fp-rate spec in DedupSpec"),
    "q96_quality_classifier" ->
      ("learned logistic weights (iterative fit) — recompute spec in " +
        "CurationSpec pins the training trajectory"),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.pricingSummary _),
    "q02_scan_filter_project" -> (Queries.scanFilterProject _),
    "q03_join_orders_customer" -> (Queries.joinOrdersCustomer _),
    "q04_join_nation_region" -> (Queries.joinNationRegion _),
    "q05_global_max" -> (Queries.globalMax _),
    "q06_global_counts" -> (Queries.globalCounts _),
    "q07_global_means" -> (Queries.globalMeans _),
    "q08_distinct_values" -> (Queries.distinctValues _),
    "q09_normalize_by_max" -> (Queries.normalizeByMax _),
    "q10_top_orders" -> (Queries.topOrders _),
    "q11_window_top_per_customer" -> (Queries.windowTopPerCustomer _),
    "q12_semi_join_customers" -> (Queries.semiJoinCustomers _),
    "q13_anti_join_customers" -> (Queries.antiJoinCustomers _),
    "q14_union_high_value" -> (Queries.unionHighValue _),
    "q15_group_having" -> (Queries.groupHaving _),
    "q16_shipping_priority" -> (Queries.shippingPriority _),
    "q17_local_supplier_volume" -> (Queries.localSupplierVolume _),
    "q18_events_hourly" -> (Queries.eventsHourly _),
    "q19_events_sessionize" -> (Queries.eventsSessionize _),
    "q20_orders_by_month" -> (Queries.ordersByMonth _),
    "q21_dedup_exact" -> (Dedup.exact _),
    "q22_dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "q23_dedup_minhash_lsh" -> (Dedup.minhashNearDup _),
    "q24_dedup_simhash" -> (Dedup.simhash _),
    "q25_dedup_embedding_cosine" -> (Dedup.embeddingNearDup _),
    "q26_knn_bruteforce" -> (Similarity.bruteForceTopK _),
    "q27_knn_lsh" -> (Similarity.lshTopK _),
    "q28_text_langid" -> (TextAnalysis.langId _),
    "q29_text_quality" -> (TextAnalysis.qualityScore _),
    "q30_text_token_stats" -> (TextAnalysis.tokenStats _),
    "q31_text_fingerprint" -> (TextAnalysis.fingerprint _),
    "q32_media_metadata" -> (Multimodal.mediaMetadata _),
    // IVF ANN over the persisted index. The index clusters with the
    // deterministic fixed-round integer Lloyd (Similarity.lloyd), so
    // cells, probe selection, and scoring all replay in the oracle —
    // fully hash-checked since round 5 (rows-only before).
    "q33_knn_ivf" -> ((s: SparkSession, dir: String) => Similarity.ivfTopK(s, dir)),
    "q34_orders_rollup" -> (Queries.ordersRollup _),
    // sketches (HLL++/percentile_approx) are engine-specific: rows-only
    // driver check; SketchSpec bounds error vs exact answers.
    "q37_event_sketches" -> (Queries.eventSketches _),
    "q35_text_scalars" -> (Queries.textScalars _),
    "q36_full_outer" -> (Queries.fullOuterAccounting _),
    // exact top-k via bounded-heap TypedImperativeAggregate — same
    // result contract as q26, same oracle
    "q38_knn_topk_agg" -> (Similarity.bruteForceTopKAgg _),
    "q39_orders_cube" -> (Queries.ordersCube _),
    "q40_running_totals" -> (Queries.runningTotals _),
    "q41_date_parts" -> (Queries.orderDateParts _),
    "q42_pivot_by_status" -> (Queries.ordersPivotByStatus _),
    // exact twin of q37: count/distinct/median hash-checked; the sketch
    // columns stay rows-only + SketchSpec-bounded
    "q43_event_exact_stats" -> (Queries.eventExactStats _),
    // temporal joins composed scale-safe (union+window / bucket blocking)
    "q44_asof_join" -> (operators.TemporalJoins.asofJoin _),
    "q45_range_join_agg" -> (operators.TemporalJoins.rangeJoinAgg _),
    // PPJoin-style prefix-filtered exact Jaccard — same contract as q22
    // through a skew-robust candidate index; same oracle
    "q46_dedup_jaccard_prefix" -> (Dedup.ngramJaccardPrefix _),
    // BPE-ish regex pre-tokenization counts (letters/digits/punct runs)
    "q47_text_subwords" -> (TextAnalysis.subwordStats _),
    // int8-quantized coarse scan + exact re-rank (quantized scores are
    // exact integer arithmetic — candidate sets hash-match the oracle)
    "q48_knn_int8" -> ((s: SparkSession, dir: String) => Similarity.int8TopK(s, dir)),
    // connected components over the q23 near-dup pair graph → canonical
    // doc per duplicate cluster (oracle: DuckDB recursive CTE closure)
    "q49_dedup_clusters" -> (Dedup.nearDupClusters _),
    // content-hash-keyed stratified sampling (mixture rebalance, zero
    // shuffle, reproducible under re-ingestion)
    "q50_sample_stratified" -> (Curation.stratifiedSample _),
    // concat-and-chunk context-window packing (per-lang running sums)
    "q51_pack_windows" -> (Curation.packWindows _),
    // ANALYZE-style column profiler: unpivot + one exact hash-agg pass
    "q52_profile_columns" -> (Queries.profileColumns _),
    // weighted-term search: zero-shuffle tf scoring + TakeOrdered top-k
    "q53_term_search" -> (TextAnalysis.termSearch _),
    // content-keyed mixture upweighting (fractional epochs, >=1x langs)
    "q54_sample_upweight" -> (Curation.upsample _),
    // benchmark-leakage scan: 4-gram overlap vs broadcast eval set
    "q55_decontaminate" -> (Dedup.decontaminate _),
    // new-batch-vs-corpus ingest dedup: exact + banded near-dup drops
    "q56_ingest_dedup" -> (Dedup.ingestDedup _),
    // C4-style quality gate: rule cascade with first-fail verdicts
    "q57_corpus_filter" -> (TextAnalysis.corpusFilter _),
    // per-source reputation stats (integer milli-token density)
    "q58_source_stats" -> (Curation.sourceStats _),
    // deterministic curriculum: band + seeded content-hash shuffle rank
    "q59_curriculum" -> (Curation.curriculum _),
    // Z-order (Morton) clustering key: codegen bit-interleave on
    // (custkey, order day) for 2-D parquet data skipping
    "q60_zorder_keys" -> (operators.ZOrder.zorderKeys _),
    // Gopher-style repetition filters: dup-token / dup-5-gram permille
    "q61_repetition" -> (TextAnalysis.repetitionStats _),
    // top-3 TF-IDF terms per doc (integer milli-IDF, planner-chosen df join)
    "q62_tfidf_terms" -> (TextAnalysis.tfidfTerms _),
    // source-pair vocabulary Jaccard (corpus contamination matrix)
    "q63_source_overlap" -> (Curation.sourceOverlap _),
    // per-label embedding centroids (exact micro-unit reduction)
    "q64_label_centroids" -> (Similarity.labelCentroids _),
    // incremental view maintenance: merge-of-partials ≡ direct agg
    "q65_incremental_hourly" -> (operators.IncrementalAgg.incrementalHourly _),
    // Count-Min heavy hitters (rows-only like q37; SketchSpec bounds)
    "q66_heavy_users" -> (Queries.heavyUsers _),
    // as-of join via the custom physical operator (AsOfJoinExec):
    // same semantics and oracle as q44, merge-pass execution
    "q67_asof_exec" -> (operators.TemporalJoins.asofJoinExec _),
    // keyed MERGE/upsert: change batch applied via one full-outer join
    "q68_merge_upsert" -> (operators.MergeUpsert.mergeOrders _),
    // native session_window operator (per-session bounds; streaming-capable)
    "q69_session_windows" -> (Queries.sessionWindows _),
    // explicit GROUPING SETS (not a rollup/cube): one expand+hash-agg
    "q70_grouping_sets" -> (Queries.ordersGroupingSets _),
    // correlated scalar subqueries, executed via Catalyst decorrelation
    "q71_above_cust_avg" -> (Queries.ordersAboveCustAvg _),
    // row-level interval join (bucket-blocked); batch twin of the
    // stream-stream attribution join (EventStreamSpec: stream ≡ batch)
    "q72_interval_pairs" -> (operators.TemporalJoins.intervalPairs _),
    // ranking suite: ntile deciles + percent_rank + lead/lag
    "q73_customer_deciles" -> (Queries.customerDeciles _),
    // mergeable HLL sketch partials (rows-only like q37; SketchSpec
    // pins merged ≡ direct and error vs exact)
    "q74_user_reach_sketch" -> (Queries.userReachSketch _),
    // SCD2 validity-interval build (window lead; as-of join read side)
    "q75_scd2_customers" -> (Queries.scd2Customers _),
    // share-of-total threshold via uncorrelated scalar subquery
    "q76_important_parts" -> (Queries.importantParts _),
    // to_json → get_json_object/from_json round trip (identity oracle)
    "q77_json_roundtrip" -> (Queries.jsonRoundTrip _),
    // posexplode generator (lateral-view unnest with ordinality)
    "q78_token_positions" -> (Queries.tokenPositions _),
    // CDC apply: latest-wins collapse + upsert + delete anti-join;
    // the batch twin of the streaming upsertSink (MergeUpsertSpec)
    "q79_cdc_apply" -> (operators.MergeUpsert.cdcOrders _),
    // blocked fuzzy pairing with exact levenshtein verify
    "q80_fuzzy_pairs" -> (TextAnalysis.fuzzyPairs _),
    // array algebra: sort/distinct/slice/intersect/union/overlap
    "q81_array_ops" -> (TextAnalysis.arrayOps _),
    // MapType in flight, exploded back to relational rows
    "q82_word_map" -> (TextAnalysis.wordMap _),
    // product-quantization ANN: ADC scan over 8-byte codes + exact
    // re-rank. Codebooks learn via the per-subspace integer Lloyd and
    // the ADC table is exact integer arithmetic — fully oracle-checked
    // since round 5 (rows-only before); DedupSpec additionally holds
    // re-rank agreement, recall, and zero-refit.
    "q83_knn_pq" -> ((s: SparkSession, dir: String) => Similarity.pqTopK(s, dir)),
    // explicit INTERSECT / EXCEPT (distinct set semantics)
    "q84_set_ops" -> (Queries.setOps _),
    // string transforms + md5 content hashing
    "q85_string_transforms" -> (Queries.stringTransforms _),
    // first/last/nth value windows + cume_dist
    "q86_window_values" -> (Queries.windowValues _),
    // VARIANT semi-structured type: parse_json + typed variant_get
    "q87_variant_extract" -> (Queries.variantExtract _),
    // PII redaction: global regex masking + match counts
    "q88_pii_redact" -> (TextAnalysis.piiRedact _),
    // RAG token chunking: 50-token windows at stride 40, content-hashed
    "q89_chunk_tokens" -> (Curation.chunkTokens _),
    // bloom-filter decontamination (approximate, one-sided ⇒ rows-only;
    // DedupSpec pins no-false-negative vs exact q55 + FP bound)
    "q90_decon_bloom" -> (Dedup.deconBloom _),
    // exact-integer second moments: hash-exact variance + correlation
    "q91_exact_moments" -> (Queries.exactMoments _),
    // LIMIT/OFFSET pagination (rows 21-30 of the spend ranking)
    "q92_paged_orders" -> (Queries.pagedOrders _),
    // RECURSIVE CTE hierarchy rollup (Spark 4 WITH RECURSIVE)
    "q93_hierarchy_rollup" -> (Queries.hierarchyRollup _),
    // collation-aware grouping (Spark 4 UTF8_LCASE)
    "q94_collation_groups" -> (Queries.collationGroups _),
    // RANGE window frame (value-distance framing, trailing 30 days)
    "q95_range_frame" -> (Queries.rangeFrameSpend _),
    // classifier-based quality filter (HashingTF + LR over weak
    // labels): learned weights ⇒ rows-only; CurationSpec pins tolerance-
    // reproducibility + separation
    "q96_quality_classifier" -> (Curation.qualityClassifier _),
    // error-safe try_divide/try_cast/try_element_at (null, not abort)
    "q97_safe_arith" -> (Queries.safeArithmetic _),
    // parse_url host/path/query extraction (crawl-domain reputation)
    "q98_url_parts" -> (Queries.urlParts _),
    // map HOFs: map_filter + transform_values over per-doc freq maps
    "q99_repeated_tokens" -> (TextAnalysis.repeatedTokenShares _),
    // calendar-spine gap fill (dense months incl. zero-order months)
    "q100_monthly_spine" -> (Queries.monthlySpine _),
    // exact mergeable distinct via bitmap partials (bit_or merge) —
    // exact ⇒ plain COUNT(DISTINCT) oracle, unlike the q74 sketches
    "q101_bitmap_distinct" -> (Queries.bitmapDistinct _),
    // from_xml declared-schema parse (semi-structured trio w/ q77, q87)
    "q102_xml_roundtrip" -> (Queries.xmlRoundTrip _),
    // equi-width histogram via width_bucket
    "q103_value_histogram" -> (Queries.valueHistogram _),
    // Dataset.unpivot (melt) reshaping + profiler agg
    "q104_unpivot_measures" -> (Queries.unpivotMeasures _),
    // ordered listagg string aggregation (Spark 4 WITHIN GROUP)
    "q105_lang_rollup" -> (Queries.langRollup _),
    // 64-bit SimHash production mode: splitmix64 token mixing replayed
    // in the oracle via UBIGINT xor/shift + hi/lo-split wrapping
    // multiplication in HUGEINT — fully hash-checked since round 6
    // (rows-only before); DedupSpec pins chunk blocking ≡ all-pairs.
    "q106_dedup_simhash64" -> (Dedup.simhash64 _),
    // verbatim-span decontamination: longest consecutive shared-4-gram
    // run per contaminated doc (gaps-and-islands over matched positions)
    "q107_contam_spans" -> (Dedup.contamSpans _),
    // n-gram-LM fluency scoring in exact integer micro-units (the
    // CCNet-style perplexity filter; corpus is its own bigram model)
    "q108_bigram_fluency" -> (TextAnalysis.bigramFluency _),
    // ExactSubstr-style cross-doc verbatim overlap: longest shared
    // span via diagonal-grouped runs over the 8-gram inverted index
    "q109_verbatim_overlap" -> (Dedup.verbatimOverlap _),
    // mixture planning: the integer budget solver producing per-lang
    // sampling rates from token inventory + target shares
    "q110_mixture_plan" -> (Curation.mixturePlan _),
    // content-hash train/val/test split: reproducible membership under
    // re-ingestion/re-sharding (98/1/1 permille)
    "q111_split_assign" -> (Curation.splitAssign _),
    // per-benchmark-suite leakage report: q55 with conditional per-suite
    // counts in the one per-doc hash-agg
    "q112_decon_suites" -> (Dedup.deconSuites _),
    // KS-style ingest drift monitor: corpus-vs-batch length CDFs in
    // exact integer permille
    "q113_length_drift" -> (Curation.lengthDrift _),
    // BM25 retrieval in exact integer micro-units (rational Robertson
    // idf — no cross-engine ln drift)
    "q114_bm25_search" -> (TextAnalysis.bm25Search _),
    // SemDeDup semantic dedup: within-cell cosine prune over the
    // persisted IVF cells — oracle-checked since round 5 (the integer
    // Lloyd made the cells replayable); DedupSpec additionally pins
    // local recompute + soundness + zero-refit
    "q115_sem_dedup" -> (Dedup.semDedup _),
    // BPE tokenizer learning: one corpus hash-agg + bounded-vocab merge
    // loop, persisted salted stage. Oracle-checked since round 6: the
    // greedy merge recurrence replays as a DuckDB recursive CTE (state
    // = per-round symbolization; argmax via aggregate over the working
    // table); BpeSpec additionally pins an independent recompute + the
    // zero-relearn warm path.
    "q116_bpe_vocab" -> (Bpe.bpeVocab _),
    // per-doc BPE fertility/compression stats under the learned merges
    // (oracle: final-round CTE state IS each vocab word's encoding)
    "q117_bpe_encode" -> (Bpe.bpeEncode _),
    // winnowing fingerprints over the custom-generator shingle stream
    // (ShingleStreamExpr — the UDTF surface)
    "q118_winnow_fingerprints" -> (TextAnalysis.winnowFingerprints _),
    // cross-doc overlap pairs from shared winnowing fingerprints
    "q119_winnow_overlap" -> (TextAnalysis.winnowOverlap _),
    // exact-k per-stratum eval carve via the bounded-heap top-k
    // aggregate (no per-stratum sort)
    "q120_eval_carve" -> (Curation.evalCarve _),
    // content-defined chunking: offset-independent shared-block
    // inventory (Rabin-style cut rule over the generator hash stream)
    "q121_cdc_chunk_dups" -> (Dedup.cdcChunkDups _),
    // Horvitz-Thompson corpus estimates from the q50 sample cut
    "q122_sample_estimate" -> (Curation.sampleEstimate _),
    // q109 with the df cap real: stop-grams fall out of the index,
    // pair instances per gram bounded at cap^2
    "q123_verbatim_overlap_capped" -> (Dedup.verbatimOverlapCapped _),
    // ordered funnel (view -> click -> purchase), strictly staged
    "q124_event_funnel" -> (Queries.eventFunnel _),
    // cohort retention triangle on exact integer day indexes
    "q125_cohort_retention" -> (Queries.cohortRetention _),
    // PageRank, 5 fixed power iterations in exact integer micro-units
    // over the symmetric supplier-customer trade graph — one lazy plan,
    // no per-round driver barrier
    "q126_pagerank" -> (Graph.pageRank _),
    // degree-oriented triangle counting + local clustering coefficient
    // over the part co-purchase graph (O(sqrt m) out-degree bound)
    "q127_triangle_counts" -> (Graph.triangleCounts _),
    // collocation mining: bigram lift in exact integer milli-units
    // (monotone in PMI, no cross-engine ln)
    "q128_collocations" -> (TextAnalysis.collocations _),
    // DSIR-style importance weights: 1024-bucket hashed-token target/raw
    // probability ratios, broadcast weight table, per-doc mean affinity
    "q129_importance_weights" -> (Curation.importanceWeights _),
    // first-order Markov transition matrix of user event streams
    "q130_event_transitions" -> (Queries.eventTransitions _),
    // seeded multi-source BFS: exact hop distances within 4 rounds
    "q131_bfs_distances" -> (Graph.bfsDistances _),
    // per-document duplicated-span localization: maximal token islands
    // of cross-doc 8-grams (the span-cut step; no pair join)
    "q132_dup_spans" -> (Dedup.dupSpans _),
    // per-type daily volume anomaly monitor: exact-integer 3σ z-test
    // ((nD−T)² > 9(DS−T²)) — no sqrt, no division
    "q133_event_anomalies" -> (Queries.eventAnomalies _),
    // per-source quantile normalization of the integer quality score:
    // exact empirical rank permille within each source
    "q134_quality_calibration" -> (Curation.qualityCalibration _),
    // DSIR selection: deterministic exact-integer acceptance sampling
    // on the q129 weights (u = salted id-hash, keep iff u < min(w,1000))
    "q135_dsir_select" -> (Curation.dsirSelect _),
    // fixed-round integer Lloyd's k-means over embeddings (k=8, 2
    // rounds, first-k init) — unsupervised twin of q64
    "q136_kmeans_embed" -> (Similarity.kmeansEmbed _),
    // 64-token sequence-length buckets with exact padding-waste and
    // fill-ratio accounting — batch-shape planning
    "q137_length_buckets" -> (Curation.lengthBuckets _),
    // asymmetric containment pairs (|∩| / min size ≥ 0.8): the
    // sub-document duplicates symmetric Jaccard cannot see
    "q138_containment_pairs" -> (Dedup.containmentPairs _),
    // transitive contamination blast radius: q55 seeds expanded 2 hops
    // over q23's near-dup graph via frontier-delta BFS
    "q139_contam_radius" -> (Dedup.contamRadius _),
    // hard-negative mining: per query, top-5 nearest DIFFERENT-label
    // vectors via the bounded-heap aggregate — contrastive negatives
    "q140_hard_negatives" -> (Similarity.hardNegatives _),
    // session-level event association rules: support/confidence/lift
    // over q19's sessions in exact integer permille
    "q141_session_associations" -> (Queries.sessionAssociations _),
    // q138 with the stop-shingle df cap REAL (q123's production knob
    // threaded into the containment posting index)
    "q142_containment_capped" -> (Dedup.containmentPairsCapped _),
    // nearest-centroid classification over q64's prototypes: label
    // audit (is_match=0 = boundary/mislabel candidates) + runner-up
    // margin confidence, exact integer micro-units
    "q143_centroid_classify" -> (Similarity.centroidClassify _),
    // PII/policy-pattern scrub cascade (email → IPv4 → phone →
    // digit-run) over the event property channel — row-local regex
    // codegen, engine-portable patterns
    "q144_pii_scrub" -> (Curation.piiScrub _),
    // paragraph-granularity exact dedup (16-token chunks, first
    // occurrence wins) — the sub-document twin of q21
    "q145_chunk_dedup" -> (Dedup.chunkDedup _),
    // ANN eval harness: per-query recall@5 of the int8 (q48) and LSH
    // (q27) paths vs the brute-force truth (q26)
    "q146_quant_recall" -> (Similarity.quantRecall _),
    // per-source document caps (host-cap curation): bounded-heap
    // best-15 by integer quality, per-source retention report
    "q147_source_caps" -> (Curation.sourceCaps _),
    // integer multinomial naive Bayes over a deterministic 80/20
    // split — learned language classifier, fixed-point likelihoods
    "q148_nb_lang_classify" -> (TextAnalysis.nbLangClassify _),
    // per-doc novelty: fraction of a doc's distinct 8-grams whose
    // corpus-wide first holder is this doc — dataset-growth audit
    "q149_doc_novelty" -> (Dedup.docNovelty _),
    // cross-source duplication matrix: distinct shared 16-token
    // chunks per source pair, df-capped against boilerplate
    "q150_cross_source_dup" -> (Dedup.crossSourceDup _),
    // exact per-lang token-length percentiles from the bounded
    // (lang, len) histogram — no per-lang corpus sort
    "q151_length_percentiles" -> (Curation.lengthPercentiles _),
    // leakage-safe split: q111's content-hash split reconciled over
    // q49's near-dup clusters (cluster representative wins)
    "q152_leak_safe_split" -> (Curation.leakSafeSplit _),
    // embedding outlier sweep: distance-to-centroid vs cluster mean
    // in exact Lloyd micro-units; >= 2.5x mean flags
    "q153_embed_outliers" -> (Similarity.embedOutliers _),
    // canonical doc per q49 dup cluster: best quality wins, dropped
    // docs/chars accounted — the collapse step dedup feeds
    "q154_canonical_docs" -> (Curation.canonicalDocs _),
    // ingest-time chunk dedup: the arriving batch probes the
    // persisted standing-corpus chunk index (q145's q56 twin)
    "q155_ingest_chunk_dedup" -> (Dedup.ingestChunkDedup _),
    // embedding-space decontamination: the paraphrase leakage q55's
    // n-grams cannot see — bounded eval carve, exact cosine flags
    "q156_embed_decontam" -> (Dedup.embedDecontam _),
    // temperature-scaled source mixture (α = 1/2 via exact isqrt):
    // shares, drawn tokens, and per-source epoch counts
    "q157_temperature_mix" -> (Curation.temperatureMix _),
    // per-cell prototype exemplars of the q136 clustering via the
    // bounded-heap top-k (most-central 4 per cell)
    "q158_cluster_prototypes" -> (Similarity.clusterPrototypes _),
    // Heaps-law vocabulary growth: cumulative new token types across
    // 20 ingest-order slices, per language
    "q159_vocab_growth" -> (TextAnalysis.vocabGrowth _),
    // Johnson-Lindenstrauss ±1 random projection 64→16 dims (the q27
    // hyperplanes, values kept instead of signs) — map-only sketch
    "q160_rp_project" -> (Similarity.rpProject _),
    // farthest-point coreset (greedy 2-approx k-center): coverage-first
    // diverse selection, the complement of q158's central prototypes
    "q161_coreset_select" -> (Similarity.coresetSelect _),
    // k-core decomposition by fixed-round peeling: peel round + degree
    // at peel per node (0 = survives in the 3-core)
    "q162_k_core" -> (Graph.kCore _),
    // synchronous label-propagation communities (4 rounds, self-vote,
    // (count desc, label asc) tie-break)
    "q163_label_prop" -> (Graph.labelProp _),
    // time-decayed engagement: halving-per-week recency weights in
    // exact cents·permille integers, one user-keyed agg
    "q164_decayed_engagement" -> (Queries.decayedEngagement _),
    // corpus snapshot diff: per-lang added/removed/common distinct
    // contents between the standing corpus and the arriving snapshot
    "q165_snapshot_diff" -> (Curation.snapshotDiff _),
    // frame-sample planning: 4 uniform sample slots per media item
    // with byte offsets — the schedule the decode stage consumes
    "q166_frame_sample_plan" -> (Multimodal.frameSamplePlan _),
    // common-neighbor link prediction: wedge-join candidates (hub
    // df-cap) + exact integer Jaccard over full neighbor sets
    "q167_link_predict" -> (Graph.linkPredict _),
    // per-user inter-event gap order statistics (exact integer
    // min/median/p90/max/mean whole-second gaps)
    "q168_event_gaps" -> (Queries.eventGaps _),
    // per-doc token concentration: exact HHI ppm, top-share pm, TTR pm
    "q169_token_concentration" -> (TextAnalysis.tokenConcentration _),
    // corpus frequency-of-frequency spectrum in exact pow-2 buckets
    "q170_freq_spectrum" -> (TextAnalysis.freqSpectrum _),
    // k-anonymity suppression audit over (lang, length-bucket)
    "q171_k_anonymity" -> (Curation.kAnonymity _),
    // mutual nearest-neighbor pair mining within persisted IVF cells
    "q172_mutual_nn" -> (Similarity.mutualNn _),
    // Borda rank fusion of three quality signals via histogram ranks
    "q173_rank_fusion" -> (Curation.rankFusion _),
    // winsorized per-language length stats (exact p05/p95 clip)
    "q174_winsorize" -> (Curation.winsorizedStats _),
    // last-touch + linear conversion attribution over 7-day windows
    "q175_attribution" -> (Queries.attribution _),
    // deterministic weighted priority sampling (top-K bounded heap)
    "q176_priority_sample" -> (Curation.prioritySample _),
    // per-(lang, source) tokenizer fertility / byte-density profile
    "q177_tokenizer_fertility" -> (TextAnalysis.tokenizerFertility _),
    // seed-restart personalized PageRank over the trade graph
    "q178_personalized_pagerank" -> (Graph.personalizedPageRank _),
    // TPC-H Q17 shape: correlated per-part quantity threshold
    "q179_small_qty_revenue" -> (Queries.smallQuantityRevenue _),
    // per-language budgeted weighted sample (bounded-heap top-K)
    "q180_stratified_sample" -> (Curation.stratifiedPrioritySample _),
    // top 3-step event-type paths inside q19 sessions
    "q181_session_paths" -> (Queries.sessionPaths _),
    // LSH candidate recall/precision vs the exact-Jaccard ground truth
    "q182_lsh_eval" -> (Dedup.lshEval _),
    // minhash-agreement vs exact-Jaccard calibration curve
    "q183_minhash_calibration" -> (Dedup.minhashCalibration _),
    // per-(split, shard) export manifest over canonical docs
    "q184_export_manifest" -> (Curation.exportManifest _),
    // MAD-robust per-language length outlier audit
    "q185_mad_outliers" -> (Curation.madOutliers _),
    // per-dimension embedding health profile (64 rows)
    "q186_embedding_dim_stats" -> (Similarity.embeddingDimStats _),
    // exact phrase search over the persisted positional postings index
    "q187_phrase_search" -> (TextAnalysis.phraseSearch _),
    // equi-depth price histogram via the two-pass bounded cumsum
    "q188_equidepth_hist" -> (Queries.equiDepthHist _),
    // exact sliding 7-day distinct active users (DAU/WAU/stickiness)
    "q189_sliding_active_users" -> (Queries.slidingActiveUsers _),
    // proximity (NEAR/w) search over the persisted postings index
    "q190_proximity_search" -> (TextAnalysis.proximitySearch _),
    // forward-window-3 skip-gram co-occurrence with exact lift
    "q191_skipgram_cooc" -> (TextAnalysis.skipgramCooc _),
    // sparse tf-idf shingle cosine top-30 via inverted index, df-capped
    "q192_sparse_cosine" -> (TextAnalysis.sparseCosineTopK _),
    // gap-correct per-user lag/rolling feature matrix (range frames)
    "q193_lag_features" -> (Queries.lagFeatures _),
    // cross-table data-quality audit: one report row per check
    "q194_dq_violations" -> (Queries.dqViolations _),
    // lang x source chi-square mix-drift audit (exact milli)
    "q195_chisq_mix" -> (Curation.chisqMix _),
    // MRR of LSH/int8 ANN vs the exact rank-1 neighbor (micro units)
    "q196_mrr_eval" -> (Similarity.mrrEval _),
    // term burstiness / top-doc concentration (stopword-list evidence)
    "q197_term_burstiness" -> (TextAnalysis.termBurstiness _),
    // market-basket co-purchase part pairs with exact lift
    "q198_copurchase_pairs" -> (Queries.copurchasePairs _),
    // exact-quintile RFM customer scoring via bounded histograms
    "q199_rfm_scores" -> (Queries.rfmScores _),
    // AQE-style join-key skew profile + salt-split plan
    "q200_salt_plan" -> (Queries.saltPlan _),
    // gap-aware LOCF purchase-spend backfill per (user, active day)
    "q201_locf_features" -> (Queries.locfFeatures _),
    // CBO cardinality-estimate audit: capped stats vs exact self-join size
    "q202_join_card_est" -> (Queries.joinCardEst _),
    // file-stats data-skipping audit: pruned files + scan amplification
    "q203_pruning_stats" -> (Queries.pruningStats _),
    // exact distance-2 distinct reach per trade-graph node
    "q204_two_hop_reach" -> (Graph.twoHopReach _),
    // point-in-time churn labels: obs-window features, next-window label
    "q205_churn_labels" -> (Queries.churnLabels _),
    // deterministic A/B assignment + sample-ratio-mismatch chi-square
    "q206_ab_srm" -> (Queries.abSrm _),
    // precision-by-rank of co-purchase recs vs held-out baskets
    "q207_rec_eval" -> (Queries.recEval _),
    // signed degree-assortativity r^2 of the trade graph (exact milli)
    "q208_assortativity" -> (Graph.degreeAssortativity _),
    // confusion matrix + recall/precision shares of the q148 classifier
    "q209_nb_confusion" -> (TextAnalysis.nbConfusion _),
    // per-(event type, weekday) volume profile vs uniform week
    "q210_dow_profile" -> (Queries.dowProfile _),
    // first-significant-digit distribution of prices vs Benford's law
    "q211_benford_audit" -> (Queries.benfordAudit _),
    // GDPR erasure-batch impact report: per-table cascade tombstone audit
    "q212_forget_cascade" -> (Queries.forgetCascade _),
    // GPT-style concat-and-chunk shard layout: per-doc offset + chunk span
    "q213_context_packing" -> (TextAnalysis.contextPacking _),
    // per-source top shared 8-token prefix/suffix (template boilerplate)
    "q214_boilerplate_audit" -> (TextAnalysis.boilerplateAudit _),
    // Cohen's kappa between the q28 and q148 language classifiers
    "q215_classifier_kappa" -> (TextAnalysis.classifierKappa _),
    // chunk-side manifest of q213: docs per window, mask reset points
    "q216_chunk_manifest" -> (TextAnalysis.chunkManifest _),
    // greedy best-quality-first per-source token budget cutoff
    "q217_token_budget" -> (Curation.tokenBudgetCutoff _),
    // signed Spearman rho^2 of doc length vs quality score, exact milli
    "q218_length_quality_corr" -> (Curation.lengthQualityCorr _),
    // per-source exact KS distance of length CDF vs rest of corpus
    "q219_source_length_drift" -> (Curation.sourceLengthDrift _),
    // pairwise per-source vocabulary Jaccard overlap matrix
    "q220_source_vocab_overlap" -> (TextAnalysis.sourceVocabOverlap _),
    // per-source effective token yield after 1/cluster-size weighting
    "q221_dedup_yield" -> (Dedup.dedupYield _),
    // per-band LSH bucket histogram + candidate-pair cost model
    "q222_lsh_bucket_balance" -> (Dedup.lshBucketBalance _),
    // Kaplan-Meier user-lifetime survival curve, exact micro-units
    "q223_kaplan_meier" -> (Queries.kaplanMeier _),
    // exact p50/p90/p99 of funnel stage-to-stage latencies
    "q224_funnel_latency" -> (Queries.funnelLatency _),
    // ViT tile/patch/padding schedule per image item
    "q225_tile_grid_plan" -> (Multimodal.tileGridPlan _),
    // overlapping-window audio transcription schedule per item
    "q226_audio_chunk_plan" -> (Multimodal.audioChunkPlan _),
    // A-priori co-purchase part triples with support floor
    "q227_copurchase_triples" -> (Queries.copurchaseTriples _),
    // monthly open-order backlog count/value/age snapshots
    "q228_backlog_snapshots" -> (Queries.backlogSnapshots _),
    // cohort × month-offset active/revenue/cumulative-LTV triangle
    "q229_cohort_ltv" -> (Queries.cohortLtv _),
    // matched-sample Laspeyres price index per brand, exact milli
    "q230_price_index" -> (Queries.priceIndex _),
    // per-part cheapest-supplier arg-min with deterministic tie-break
    "q231_cheapest_supplier" -> (Queries.cheapestSupplier _),
    // exact Gini of the per-source document-length distribution
    "q232_length_gini" -> (Curation.lengthGini _),
    // ratio-to-centered-12-month-MA seasonal index per brand, exact milli
    "q233_seasonal_index" -> (Queries.seasonalIndex _),
    // (unit price, ship lag) Pareto frontier of suppliers — 2-D skyline
    "q234_supplier_skyline" -> (Queries.supplierSkyline _),
    // robust Theil-Sen monthly-revenue trend per brand (median pair slope)
    "q235_theilsen_trend" -> (Queries.theilSenTrend _),
    // graded position-discounted nDCG@5 of the LSH/int8 ANN paths
    "q236_ndcg_eval" -> (Similarity.ndcgEval _),
    // gapped ordered event-type triples with session support counts
    "q237_event_seq_triples" -> (Queries.eventSeqTriples _),
    // near-dup clusters mixing predicted languages (translation pairs)
    "q238_cluster_lang_mix" -> (Dedup.clusterLangMix _),
    // all-lines-shipped-within-30d perfect-order rate per month
    "q239_perfect_order" -> (Queries.perfectOrderRate _),
    // top eigenvector of the exact int8 Gram (GramAgg + power iteration)
    "q240_principal_direction" -> (Similarity.principalDirection _),
    // seasonal-naive vs naive-1 MASE forecast backtest per brand
    "q241_seasonal_backtest" -> (Queries.seasonalNaiveBacktest _),
    // per-source embedding anisotropy via GROUPED GramAgg + power iteration
    "q242_source_anisotropy" -> (Similarity.sourceAnisotropy _),
    // within-cluster pairwise length-delta / exact-pair dedup geometry
    "q243_cluster_diff_stats" -> (Dedup.clusterDiffStats _),
    // λ1, λ2 (one exact deflation round), trace, participation ratio
    "q244_spectral_spread" -> (Similarity.spectralSpread _),
    // virtual-pixel aHash near-dup pairs, 10-chunk pigeonhole banding
    "q245_image_ahash_neardup" -> (Multimodal.imageAHashNearDup _),
    // virtual-PCM band-energy hash near-dup pairs (audio payloads)
    "q246_audio_energy_neardup" -> (Multimodal.audioEnergyNearDup _),
    // metadata-filtered (cross-source) exact top-k retrieval
    "q247_filtered_knn" -> (Similarity.filteredKnn _),
    // post-filtered LSH path: fill rate + recall vs the exact answer
    "q248_filtered_lsh_audit" -> (Similarity.filteredLshAudit _),
    // MMR-diversified top-k over the relevance pool (exact integer MMR)
    "q249_mmr_diversified" -> (Similarity.mmrDiversified _),
    // connected components over the q245 aHash pair graph
    "q250_media_dup_clusters" -> (Multimodal.mediaDupClusters _),
    // reciprocal-rank fusion of the LSH and int8 ANN paths
    "q251_rrf_fusion" -> (Similarity.rrfFusion _),
    // pairwise-source linear-kernel MMD^2 embedding drift
    "q252_source_embed_drift" -> (Similarity.sourceEmbeddingDrift _),
    // per-chunk langid sequence: dominant language, share, switches
    "q253_code_switch_segments" -> (TextAnalysis.codeSwitchSegments _),
    // per-bit aHash set-share: the media-hash entropy monitor
    "q254_media_bit_balance" -> (Multimodal.mediaHashBitBalance _),
    // text (q23) vs media (q245) near-dup pair-set agreement
    "q255_dedup_modality_agreement" -> (Multimodal.dedupModalityAgreement _),
    // max-passage BM25: best 32-token window (stride 16) ranks the doc
    "q256_max_passage" -> (TextAnalysis.maxPassage _),
    // margin-based cross-language bitext candidate mining
    "q257_bitext_margin" -> (Similarity.bitextMargin _),
    // k-truss edge peel (k=12, 4 rounds) on the co-purchase graph
    "q258_ktruss" -> (Graph.kTruss _),
    // media-hash Hamming-threshold precision/recall curve vs q23 truth
    "q259_media_threshold_curve" -> (Multimodal.mediaThresholdCurve _),
    // Zipf doubling-ratio rank spectrum + head mass shares (no ln)
    "q260_zipf_spectrum" -> (TextAnalysis.zipfSpectrum _),
    // split-conformal keep-threshold for the q134 quality score
    "q261_conformal_quality" -> (Curation.conformalQuality _),
    // IVF recall@5 vs exact truth at nprobe 1/2/4/8 (one index build)
    "q262_ivf_probe_curve" -> (Similarity.ivfProbeCurve _),
    // passage-size ablation: q256 at {16,32,64} vs the 32 baseline
    "q263_passage_ablation" -> (TextAnalysis.passageSizeAblation _),
    // frame-sequence media containment: 4 per-frame aHashes, exact
    // hash-equality pairing, df-capped — the re-cut/clip detector
    "q264_frame_containment" -> (Multimodal.frameSeqContainment _),
    // lexical (3-gram Jaccard) + dense (cosine) RRF hybrid retrieval
    "q265_hybrid_mlt" -> (Similarity.hybridMoreLikeThis _),
    // dedup-threshold percolation: components/merge mass at 4 Jaccard bars
    "q266_dedup_threshold_curve" -> (Dedup.dedupThresholdCurve _),
    // per-rule curation decision table: flags, unique kills, kill-any
    "q267_rule_audit" -> (TextAnalysis.ruleAudit _),
    // monetary-quintile migration matrix across the order-history halves
    "q268_rfm_migration" -> (Queries.rfmMigration _),
    // per-source int8 quantization fidelity (squared cosine ppm floor)
    "q269_quant_fidelity" -> (Similarity.quantFidelity _),
    // minhash vs simhash pair agreement, exact-Jaccard arbitrated
    "q270_text_method_agreement" -> (Dedup.textMethodAgreement _),
    // per-shard adjacent-same-source rate vs the Simpson baseline
    "q271_interleave_audit" -> (Curation.interleaveAudit _),
    // brand-month revenue anomalies vs the brand's median/MAD
    "q272_mad_anomaly_calendar" -> (Queries.madAnomalyCalendar _),
    // exact Kendall tau-a of monthly revenue per brand pair
    "q273_kendall_comovement" -> (Queries.kendallComovement _),
    // per-source energy along the global v1/x2 spectral directions
    "q274_source_projection_energy" -> (Similarity.sourceProjectionEnergy _),
    // top-3 dims by exact |source mean − corpus mean| per source
    "q275_source_dim_drift" -> (Similarity.sourceDimDrift _),
    // degree-elite internal density vs global (rich-club curve)
    "q276_rich_club" -> (Graph.richClub _),
    // directed A→B rules: exact confidence + conviction, top 30
    "q277_association_rules" -> (Queries.associationRules _),
    // 1/cluster_n doc weights: per-source effective size + inflation
    "q278_dedup_effective_size" -> (Dedup.dedupEffectiveSize _),
    // sampled exact-kNN neighbor-source agreement per source
    "q279_knn_source_purity" -> (Similarity.knnSourcePurity _),
    // 12-tap dyadic EWMA revenue level + month-over-month turn
    "q280_dyadic_momentum" -> (Queries.dyadicMomentum _),
    // per-item PCM loudness/clip/crest audit (one-pass kernel)
    "q281_audio_loudness_audit" -> (Multimodal.audioLoudnessAudit _),
    // exact linear-CKA lexical/embedding alignment (CrossGramAgg)
    "q282_repr_alignment" -> (Similarity.reprAlignment _),
    // per-source distinct/hapax n-gram spectrum at n = 1, 2, 3
    "q283_ngram_diversity" -> (TextAnalysis.ngramDiversity _),
    // lag-1/lag-24 signed r-squared of hourly counts per event type
    "q284_hourly_autocorr" -> (Queries.hourlyAutocorr _),
    // Newman modularity contributions of the brand partition
    "q285_brand_modularity" -> (Graph.brandModularity _),
    // exact OLS slope of monthly qty on unit price per brand
    "q286_price_elasticity" -> (Queries.priceElasticity _),
    // q157 temperature mix over the q278 dedup-effective token supply
    "q287_effective_mixture" -> (Curation.effectiveTemperatureMix _),
    // classic A/B/C cumulative-revenue-share inventory classes
    "q288_abc_classes" -> (Queries.abcClasses _),
    // small-sample-fair supplier ranking: Wilson lower bound, z = 2
    "q289_wilson_ranking" -> (Queries.wilsonRanking _),
    // choose-your-n evidence: df-capped pair mass at n = 3, 5, 8
    "q290_shingle_ablation" -> (Dedup.shingleSizeAblation _),
    // adjacent-frame aHash Hamming boundaries (shot segmentation)
    "q291_scene_cuts" -> (Multimodal.sceneCuts _),
    // per-state next-event Gini impurity within sessions
    "q292_transition_impurity" -> (Queries.transitionImpurity _),
    // uniqueness-band near-dup rates + relative risk (q29 x q49)
    "q293_quality_dup_association" -> (Queries.qualityDupAssociation _),
    // ship-lag P50/P90/max + breach share per order priority tier
    "q294_priority_sla" -> (Queries.prioritySlaAudit _),
    // per-dim same-label vs all-pair spread ratio (pairwise eta^2)
    "q295_dim_label_informativeness" -> (Similarity.dimLabelInformativeness _),
    // exact Rand index of the q136 Lloyd clusters vs the labels
    "q296_cluster_label_rand" -> (Similarity.clusterLabelRand _),
    // deterministic Poisson-bootstrap CI for mean order value
    "q297_bootstrap_ci" -> (Queries.bootstrapCi _),
    // repeat share + first-to-second-order gap percentiles per segment
    "q298_repeat_latency" -> (Queries.repeatLatency _),
    // citation-slot concentration + source retrieval-bias ratio
    "q299_neighbor_concentration" -> (Similarity.neighborConcentration _),
    // Chao1 + Good-Turing vocabulary-saturation estimators per source
    "q300_vocab_saturation" -> (TextAnalysis.vocabSaturation _),
    // exact CUSUM structural-break day per event type
    "q301_cusum_changepoint" -> (Queries.cusumChangepoint _),
    // Mann-Whitney rank-sum test: returned vs kept transit time
    "q302_ranksum_shiplag" -> (Queries.rankSumShipLag _),
    // HITS hub/authority scores over the customer-part purchase graph
    "q303_hits_bipartite" -> (Graph.hitsBipartite _),
    // chi-square independence: priority x returnflag contingency
    "q304_chisq_independence" -> (Queries.chisqIndependence _),
    // variance-to-mean dispersion index per event type (burst audit)
    "q305_event_overdispersion" -> (Queries.eventOverdispersion _),
    // 32-replica bootstrap band for the median repeat-purchase gap
    "q306_median_bootstrap" -> (Queries.bootstrapMedianCi _),
    // pairwise label-AUC of the int8 cosine ranking per query source
    "q307_embedding_label_auc" -> (Similarity.embeddingLabelAuc _),
    // log-rank test: urgent-first-order vs rest repeat-purchase speed
    "q308_logrank_repeat" -> (Queries.logRankRepeat _),
    // BM25 with cluster-level document frequencies (dedup-corrected IDF)
    "q309_bm25_dedup" -> (TextAnalysis.bm25DedupCorrected _),
    // l-diversity + t-closeness release audit on q171's groups
    "q310_l_diversity" -> (Curation.lDiversityAudit _),
    // sampled-seed harmonic closeness within 4 hops (multi-source BFS)
    "q311_harmonic_closeness" -> (Graph.harmonicCloseness _),
    // held-out top-1 next-event accuracy vs the unconditional baseline
    "q312_markov_backtest" -> (Queries.markovBacktest _),
    // Kish effective-sample-size audit of the q129 importance weights
    "q313_importance_ess" -> (Curation.importanceEss _),
    // signed squared cosine + distance between q64 label centroids
    "q314_label_confusability" -> (Similarity.labelConfusability _),
    // pooled two-proportion z^2: return-rate drift across ship periods
    "q315_return_rate_drift" -> (Queries.returnRateDrift _),
    // per-part unit-price CV^2 dispersion shortlist (top-50)
    "q316_price_dispersion" -> (Queries.priceDispersion _),
    // per-label squared-norm bias audit (dot-product retrieval hazard)
    "q317_label_norm_bias" -> (Similarity.labelNormBias _),
    // near-dup cluster size spectrum over the persisted q49 labels
    "q318_dup_size_spectrum" -> (Dedup.dupSizeSpectrum _),
    // k-sample rank test: tie-corrected Kruskal-Wallis over the
    // (priority, lag) grid, doubled ranks, driver BigInt fold
    "q319_kruskal_wallis" -> (Queries.kruskalWallisLag _),
    // Wald-Wolfowitz runs test on daily order volume (randomness audit)
    "q320_runs_test" -> (Queries.runsTestDaily _),
    // Cochran-Armitage ordinal trend test on return rate by priority
    "q321_trend_test" -> (Queries.trendTestReturns _),
    // Spearman rank correlation of daily volume vs revenue (day grid)
    "q322_spearman_daily" -> (Queries.spearmanDaily _),
    // Beyer et al. distance-contrast: is NN search meaningful here?
    "q323_distance_contrast" -> (Similarity.distanceContrast _),
    // Herfindahl supply concentration per nation (ppm, exact cents)
    "q324_supply_hhi" -> (Queries.supplyHhi _),
    // gaps-and-islands purchasing bursts, length histogram per segment
    "q325_order_bursts" -> (Queries.orderBursts _),
    // chi2 term keyness per source vs corpus (df-capped, top-10)
    "q326_term_keyness" -> (TextAnalysis.termKeyness _),
    // LIX readability (integerized), 5-point-bucket histogram per source
    "q327_lix_readability" -> (TextAnalysis.lixReadability _),
    // pairwise Cramér's V over all categorical fact dims (one cube scan)
    "q328_cramers_v_matrix" -> (Queries.cramersVMatrix _),
    // expected-window spine vs observed: dead feeds the stream monitor
    // cannot see (longest dead streak via gaps-and-islands)
    "q329_feed_liveness" -> (Queries.feedLiveness _),
    // Mantel-Haenszel stratified odds ratio + CMH chi2 (confound-proof)
    "q330_mantel_haenszel" -> (Queries.mantelHaenszel _),
    // exact skewness/kurtosis of ship lag per priority (power sums)
    "q331_lag_moments" -> (Queries.lagMoments _),
    // Wilcoxon signed-rank: does the second repeat gap lengthen?
    "q332_wilcoxon_repeat" -> (Queries.wilcoxonRepeat _),
    // Friedman repeated-measures test: weekday exchangeability by week
    "q333_friedman_dow" -> (Queries.friedmanDow _),
    // as-of join with max-staleness TTL (feature-store point-in-time)
    "q334_asof_tolerance" -> (operators.TemporalJoins.asofJoinTolerance _),
    // out-of-orderness audit: the measured P99 watermark per type
    "q335_ooo_lateness" -> (Queries.oooLateness _),
    // connected components over the mutual-NN pair graph, per label
    "q336_mutual_nn_components" -> (Similarity.mutualNnComponents _),
    // code-vs-prose modality gate (symbol density + keyword rule)
    "q337_code_detect" -> (TextAnalysis.codeDetect _),
    // near-hapax token-mass share per source (lexical difficulty)
    "q338_rare_word_share" -> (TextAnalysis.rareWordShare _),
    // JSON key discovery over events.props (variant profiling)
    "q339_props_schema" -> (Queries.propsSchema _),
    // Lorenz points: within-segment revenue deciles + top-share
    "q340_revenue_concentration" -> (Queries.revenueConcentration _),
    // difference-in-differences on return rates across the period break
    "q341_did_returns" -> (Queries.didReturns _),
    // prospective power analysis: per-group n to detect observed deltas
    "q342_power_sample_size" -> (Queries.powerSampleSize _),
    // Little's law reconciliation: backlog vs throughput x latency
    "q343_little_law" -> (Queries.littleLawAudit _),
    // McNemar paired test on the q270 dedup-method 2x2
    "q344_mcnemar_dedup" -> (Dedup.mcnemarDedup _),
    // function-word style cosine between sources (Mosteller-Wallace)
    "q345_style_cosine" -> (TextAnalysis.styleCosine _),
    // Cramer-von Mises whole-CDF two-sample test on fulfillment lag
    "q346_cvm_lag" -> (Queries.cvmLag _),
  )

  /** Shared BPE-recurrence CTE prefix (q116/q117): the bounded
    * word-count cut, then one recursive round per merge — the
    * working-table aggregate picks the argmax pair, the fold applies
    * it. Mirrors Bpe.learnLocal exactly (tie-break (count desc, l, r);
    * stop at NMerges or when no pair remains). */
  private val BpeStateCte: String =
    s"""WITH RECURSIVE wc AS (
       |  SELECT word, count(*)::BIGINT c FROM
       |    (SELECT unnest(regexp_split_to_array(text, ' ')) word FROM documents)
       |  GROUP BY word ORDER BY c DESC, word LIMIT ${Bpe.MaxWords}),
       |state(round, word, syms, c) AS (
       |  SELECT 0, word, regexp_split_to_array(word, ''), c FROM wc
       |  UNION ALL
       |  SELECT round + 1, word,
       |    list_reduce(list_transform(syms, s -> [s]),
       |      (acc, x) -> CASE WHEN acc[-1] = b.l AND x[1] = b.r
       |                  THEN list_append(list_slice(acc, 1, len(acc)-1), b.l || b.r)
       |                  ELSE list_concat(acc, x) END),
       |    c
       |  FROM state, (SELECT syms[i] l, syms[i+1] r, sum(c) pc
       |               FROM state, unnest(generate_series(1, len(syms)-1)) t(i)
       |               GROUP BY 1, 2
       |               ORDER BY pc DESC, l, r LIMIT 1) b
       |  WHERE round < ${Bpe.NMerges}
       |),""".stripMargin

  /** Shared q172 mutual-NN CTE chain (2-round integer Lloyd cells ->
    * within-cell exact cosine top-1 -> reciprocity): `q` through `n1`.
    * Shared by q172 and q336 so the two oracles can never drift. */
  private val MutualNnCte: String =
    """q AS (SELECT vec_id, i::BIGINT - 1 AS pos,
        |             floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS vm
        |           FROM (SELECT vec_id, embedding,
        |                 unnest(generate_series(1, len(embedding))) i FROM embeddings)),
        |seeds AS (SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cid
        |          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |c0 AS (SELECT s.cid, q.pos, q.vm AS cm FROM q JOIN seeds s ON s.vec_id = q.vec_id),
        |e1 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c0 c ON c.pos = q.pos GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |         FROM e1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, q.pos, floor(sum(q.vm) / count(*))::BIGINT AS cm
        |       FROM q JOIN a1 a ON a.vec_id = q.vec_id GROUP BY 1, 2),
        |e2 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c1 c ON c.pos = q.pos GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |         FROM e2) WHERE rn = 1),
        |e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |pr AS (SELECT a.vec_id AS src, a.cid AS cell, b.vec_id AS nbr,
        |       list_dot_product(ae.v, be.v)
        |       / sqrt(list_dot_product(ae.v, ae.v) * list_dot_product(be.v, be.v)) c
        |       FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id != b.vec_id
        |       JOIN e ae ON ae.vec_id = a.vec_id JOIN e be ON be.vec_id = b.vec_id),
        |n1 AS (SELECT src, cell, nbr, c FROM (
        |         SELECT src, cell, nbr, c,
        |                row_number() OVER (PARTITION BY src ORDER BY c DESC, nbr) rn
        |         FROM pr) WHERE rn = 1)""".stripMargin

  /** ONE as-of oracle, shared by q44 (union+window composition) and
    * q67 (custom physical operator): the two entries must stay
    * byte-identical or "q67 shares q44's oracle" silently rots. */
  private val AsofOracleSql: String =
    """WITH c AS (SELECT event_id click_id, user_id, epoch_us(ts) cts
      |           FROM events WHERE event_type = 'click'),
      |v AS (SELECT event_id vid, user_id, epoch_us(ts) vts
      |      FROM events WHERE event_type = 'view'),
      |j AS (SELECT c.click_id, c.user_id, c.cts, v.vid, v.vts,
      |      row_number() OVER (PARTITION BY c.click_id
      |                         ORDER BY v.vts DESC NULLS LAST, v.vid DESC) rn
      |      FROM c LEFT JOIN v ON c.user_id = v.user_id AND v.vts <= c.cts)
      |SELECT click_id, user_id, cts AS click_ts, vid AS view_id,
      |  vts AS view_ts, cts - vts AS gap_us
      |FROM j WHERE rn = 1
      |ORDER BY click_id""".stripMargin

  /** Shared q23-pipeline CTE prefix (shingles → 16 minhashes → band
    * keys → candidate pairs) for the dedup-observability oracles
    * q182/q183 — textually identical to the q23 oracle's chain. */
  private lazy val MinhashCandCte: String =
    s"""t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
       |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
       |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
       |mh AS (SELECT doc_id, j, min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
       |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
       |bands AS (SELECT doc_id, j // 4 AS b,
       |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
       |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
       |          FROM mh GROUP BY doc_id, j // 4),
       |cand AS (SELECT DISTINCT x.doc_id da, y.doc_id db FROM bands x JOIN bands y
       |         ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id)""".stripMargin

  /** Shared q270/q344 chain: the q23 verified-minhash pair set, the
    * q24 simhash pair set, and their full-outer agreement
    * categorization `pr` — extracted so the agreement TABLE (q270)
    * and the McNemar TEST on it (q344) can never drift. */
  private lazy val MethodAgreementCte: String =
    s"""cmc AS (SELECT da, db, count(*) cm FROM cand
       |      JOIN sh p ON p.doc_id = da
       |      JOIN sh q ON q.doc_id = db AND q.h = p.h
       |      GROUP BY da, db),
       |mhp AS MATERIALIZED (SELECT da, db FROM cmc
       |      JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
       |      WHERE cm / (x.sz + y.sz - cm) >= 0.5),
       |th AS (SELECT doc_id, ${H("tok")} AS h FROM
       |  (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) tok
       |   FROM documents)),
       |bits AS (SELECT doc_id, i,
       |        CASE WHEN sum(((h // (1::BIGINT << i)) % 2) * 2 - 1) > 0
       |             THEN (1::BIGINT << i) ELSE 0 END v
       |        FROM th, generate_series(0, 31) g(i) GROUP BY doc_id, i),
       |sig AS (SELECT doc_id, sum(v)::BIGINT s FROM bits GROUP BY doc_id),
       |shp AS MATERIALIZED (SELECT a.doc_id da, b.doc_id db
       |      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |      WHERE bit_count(xor(a.s, b.s)) <= 6),
       |pr AS MATERIALIZED (SELECT coalesce(m.da, s.da) doc_a,
       |        coalesce(m.db, s.db) doc_b,
       |        CASE WHEN m.da IS NOT NULL AND s.da IS NOT NULL THEN 'both'
       |             WHEN m.da IS NOT NULL THEN 'minhash_only'
       |             ELSE 'simhash_only' END cat
       |      FROM mhp m FULL JOIN shp s ON s.da = m.da AND s.db = m.db)""".stripMargin

  /** q148 oracle — the naive-Bayes held-out classification. ONE
    * definition, shared verbatim by q209's confusion matrix (the
    * confusion must grade exactly the predictions the driver checks —
    * the q44/q67 shared-oracle rule). */
  private val NbClassifySql: String =
    """WITH tok AS (SELECT doc_id, lang,
      |             unnest(regexp_split_to_array(text, ' ')) AS w FROM documents),
      |tr AS (SELECT * FROM tok WHERE doc_id % 5 != 0),
      |cnt AS (SELECT lang AS l, w, count(*)::BIGINT c FROM tr GROUP BY 1, 2),
      |tot AS (SELECT lang AS l, count(*)::BIGINT tot FROM tr GROUP BY 1),
      |voc AS (SELECT count(DISTINCT w)::BIGINT v FROM tr),
      |den AS (SELECT l, (tot + v)::BIGINT AS den FROM tot, voc),
      |te AS (SELECT doc_id, lang, w, count(*)::BIGINT m FROM tok
      |       WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
      |sc AS (SELECT te.doc_id, te.lang, den.l,
      |       sum(te.m * ((1000000000000 * (coalesce(cnt.c, 0) + 1)) // den.den))::BIGINT AS score
      |       FROM te CROSS JOIN den LEFT JOIN cnt ON cnt.l = den.l AND cnt.w = te.w
      |       GROUP BY 1, 2, 3),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, l)::BIGINT AS rn FROM sc)
      |SELECT doc_id, lang, l AS pred, score AS pred_score,
      |  (CASE WHEN l = lang THEN 1 ELSE 0 END)::BIGINT AS correct
      |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** DuckDB twin of TextOps.polyHash over a SQL string expression. */
  private def H(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($e, ''), c -> ascii(c)::BIGINT)), (acc, x) -> (acc * 131 + x) % 1000000007)"

  /** Shared trade-graph CTEs (q126/q131): supplier s ↦ 2s, customer
    * c ↦ 2c+1, symmetric arcs — mirrors Graph.tradeArcs exactly. */
  private val TradeGraphCte: String =
    """b AS (SELECT DISTINCT l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
      |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |e AS (SELECT s AS src, c AS dst FROM b
      |      UNION ALL SELECT c AS src, s AS dst FROM b)""".stripMargin

  /** q162 oracle CTE chain: fixed-round peeling — per round the degree
    * table over the remaining arcs, the sub-k peel set (with its
    * degrees), and the arc relation minus everything touching it;
    * mirrors Graph.kCore round for round. */
  private def kCoreCte(k: Int, rounds: Int): String = {
    // MATERIALIZED throughout: DuckDB INLINES plain CTEs, and every
    // round references its predecessor 3× (degree + two NOT INs) — the
    // inlined tree grows 3^rounds and re-opens the base parquet files
    // thousands of times ("Too many open files", measured). Forced
    // materialization makes each round's relation compute once — the
    // oracle twin of the Spark side's persist+truncate rounds.
    val steps = (1 to rounds).map { r =>
      val prevA = if (r == 1) "e" else s"aa${r - 1}"
      val prevN = s"nn${r - 1}"
      s"""gg$r AS MATERIALIZED (SELECT src, count(*)::BIGINT AS dg
         |        FROM $prevA GROUP BY 1),
         |dd$r AS MATERIALIZED (SELECT n.node, coalesce(g.dg, 0)::BIGINT AS dg
         |        FROM $prevN n LEFT JOIN gg$r g ON g.src = n.node),
         |oo$r AS MATERIALIZED (SELECT node, $r::BIGINT AS peel_round,
         |        dg AS degree FROM dd$r WHERE dg < $k),
         |nn$r AS MATERIALIZED (SELECT node FROM dd$r WHERE dg >= $k),
         |aa$r AS MATERIALIZED (SELECT a.src, a.dst FROM $prevA a
         |        WHERE a.src NOT IN (SELECT node FROM oo$r)
         |          AND a.dst NOT IN (SELECT node FROM oo$r))""".stripMargin
    }.mkString(",\n")
    val peels = (1 to rounds).map(r => s"SELECT * FROM oo$r").mkString(" UNION ALL ")
    val graphM = TradeGraphCte
      .replace("b AS (", "b AS MATERIALIZED (")
      .replace("e AS (", "e AS MATERIALIZED (")
    s"""$graphM,
       |nn0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
       |$steps,
       |cg AS MATERIALIZED (SELECT src, count(*)::BIGINT AS dg
       |      FROM aa$rounds GROUP BY 1),
       |core AS (SELECT n.node, 0::BIGINT AS peel_round,
       |         coalesce(g.dg, 0)::BIGINT AS degree
       |         FROM nn$rounds n LEFT JOIN cg g ON g.src = n.node),
       |allrows AS ($peels UNION ALL SELECT * FROM core)""".stripMargin
  }

  /** q163 oracle CTE chain: synchronous label propagation — per round
    * the neighbor+self vote counts and the (count desc, label asc)
    * argmax; mirrors Graph.labelProp. */
  private def labelPropCte(rounds: Int): String = {
    // MATERIALIZED for the same reason as kCoreCte: each round inlines
    // its predecessor twice (neighbor join + self-vote) — 2^rounds
    // re-expansions of the full graph subtree without it.
    val steps = (1 to rounds).map { r =>
      val prev = s"ll${r - 1}"
      s"""vv$r AS MATERIALIZED (SELECT node, lbl, count(*)::BIGINT AS cnt FROM (
         |        SELECT e.src AS node, l.lbl FROM e JOIN $prev l ON l.node = e.dst
         |        UNION ALL SELECT node, lbl FROM $prev) GROUP BY 1, 2),
         |ll$r AS MATERIALIZED (SELECT node, lbl FROM (
         |        SELECT node, lbl,
         |               row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) rn
         |        FROM vv$r) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val graphM = TradeGraphCte
      .replace("b AS (", "b AS MATERIALIZED (")
      .replace("e AS (", "e AS MATERIALIZED (")
    s"""$graphM,
       |ll0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM e),
       |$steps""".stripMargin
  }

  /** q126 oracle: the 5 fixed PageRank rounds as chained CTEs — the
    * same exact integer recurrence Graph.pageRank runs. */
  private val PageRankOracle: String = {
    val rounds = (1 to Graph.PageRankIters).map { k =>
      s"""r$k AS (SELECT e.dst AS node,
         |  (150000 + (850 * sum(r${k - 1}.r // d.outdeg)) // 1000)::BIGINT AS r
         |  FROM e JOIN r${k - 1} ON r${k - 1}.node = e.src
         |         JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $TradeGraphCte,
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT src AS node, 1000000::BIGINT AS r FROM deg),
       |$rounds
       |SELECT node, r AS rank_micro FROM r${Graph.PageRankIters}
       |ORDER BY node""".stripMargin
  }

  /** q178 oracle: the q126 chain with seed-restart teleport — each
    * round re-joins the one-row-per-node seed relation so teleport
    * mass lands only on seeds; mirrors Graph.personalizedPageRank
    * round for round. */
  private val PprOracle: String = {
    val rounds = (1 to Graph.PageRankIters).map { k =>
      s"""p$k AS (SELECT n.node,
         |  (n.seed * 150000 + coalesce((850 * c.s) // 1000, 0))::BIGINT AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(p${k - 1}.r // d.outdeg) AS s
         |    FROM e JOIN p${k - 1} ON p${k - 1}.node = e.src
         |           JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) c ON c.dst = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $TradeGraphCte,
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |nodes AS (SELECT src AS node,
       |  CASE WHEN src % 2 = 0 AND (src // 2) % 5 = 0 THEN 1 ELSE 0 END AS seed
       |  FROM deg),
       |p0 AS (SELECT node, (seed * 1000000)::BIGINT AS r FROM nodes),
       |$rounds
       |SELECT node, r AS ppr_micro FROM p${Graph.PageRankIters}
       |WHERE r > 0 ORDER BY node""".stripMargin
  }

  /** q131 oracle: BFS frontier relaxation rounds as chained CTEs. */
  private val BfsOracle: String = {
    val rounds = (1 to Graph.BfsRounds).map { k =>
      s"""d$k AS (SELECT node, min(dist)::BIGINT AS dist FROM (
         |  SELECT e.dst AS node, x.dist + 1 AS dist
         |  FROM d${k - 1} x JOIN e ON e.src = x.node
         |  UNION ALL SELECT node, dist FROM d${k - 1}) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $TradeGraphCte,
       |d0 AS (SELECT s_suppkey * 2 AS node, 0::BIGINT AS dist
       |       FROM supplier WHERE s_nationkey < 10),
       |$rounds
       |SELECT node, dist FROM d${Graph.BfsRounds} ORDER BY node""".stripMargin
  }

  /** q258 oracle chain — k-truss peel as one CTE block per round:
    * triangle enumeration (a<b<c sorted triples — provably the same
    * triangle set as the Spark side's degree-oriented wedge join),
    * per-edge support via the 3-role union, peel below k−2, then a
    * final support pass pricing the survivors. MATERIALIZED on the
    * edge/support relations so DuckDB doesn't inline the triangle
    * join once per consumer. */
  private def kTrussCte(k: Int, rounds: Int): String = {
    val thr = k - 2
    val base =
      """it0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |it AS (SELECT ok, pk FROM (
        |         SELECT ok, pk, row_number() OVER (PARTITION BY ok ORDER BY pk) AS rn
        |         FROM it0) WHERE rn <= 1024),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS p1, b.pk AS p2
        |      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk)""".stripMargin
    def supBlock(src: String, tri: String, sup: String): String =
      s"""$tri AS (SELECT x.p1 a, x.p2 b, y.p2 c
         |      FROM $src x JOIN $src y ON y.p1 = x.p2
         |      JOIN $src z ON z.p1 = x.p1 AND z.p2 = y.p2),
         |$sup AS MATERIALIZED (SELECT e.p1, e.p2, coalesce(t.s, 0)::BIGINT s
         |      FROM $src e LEFT JOIN (
         |        SELECT p1, p2, count(*)::BIGINT s FROM (
         |          SELECT a AS p1, b AS p2 FROM $tri
         |          UNION ALL SELECT b, c FROM $tri
         |          UNION ALL SELECT a, c FROM $tri) GROUP BY 1, 2) t
         |      ON t.p1 = e.p1 AND t.p2 = e.p2)""".stripMargin
    val blocks = (1 to rounds).map { r =>
      s"""${supBlock(s"e${r - 1}", s"t$r", s"s$r")},
         |pl$r AS (SELECT p1, p2, $r::BIGINT AS peel_round, s AS support
         |      FROM s$r WHERE s < $thr),
         |e$r AS MATERIALIZED (SELECT p1, p2 FROM s$r WHERE s >= $thr)""".stripMargin
    }
    val fin =
      s"""${supBlock(s"e$rounds", "tf", "sf")},
         |allrows AS (${(1 to rounds).map(r => s"SELECT * FROM pl$r")
          .mkString("\n      UNION ALL ")}
         |      UNION ALL SELECT p1, p2, 0::BIGINT, s FROM sf)""".stripMargin
    (base +: blocks :+ fin).mkString(",\n")
  }

  /** q49 oracle CTE chain — the full recursive near-dup closure
    * (shingles -> minhash bands -> verified pairs -> transitive
    * reach -> min-labels + sizes). Shared verbatim by q152's
    * leakage-safe split so the split reconciles against exactly the
    * clusters the driver checks. */
  private val NearDupClusterCte: String =
    s"""RECURSIVE t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |mh AS (SELECT doc_id, j, min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
         |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // 4 AS b,
         |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
         |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
         |          FROM mh GROUP BY doc_id, j // 4),
         |cand AS (SELECT DISTINCT x.doc_id da, y.doc_id db FROM bands x JOIN bands y
         |         ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
         |cm AS (SELECT da, db, count(*) cm FROM cand
         |       JOIN sh p ON p.doc_id = da JOIN sh q ON q.doc_id = db AND q.h = p.h
         |       GROUP BY da, db),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
         |pairs AS (SELECT da, db FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |          WHERE cm / (x.sz + y.sz - cm) >= 0.5),
         |edges AS (SELECT da s, db t2 FROM pairs UNION ALL SELECT db, da FROM pairs),
         |reach AS (SELECT doc_id AS src, doc_id AS dst FROM documents
         |          UNION
         |          SELECT r.src, e.t2 FROM reach r JOIN edges e ON r.dst = e.s),
         |lbl AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
         |cn AS (SELECT cluster_id, count(*) AS cluster_n FROM lbl GROUP BY cluster_id)""".stripMargin

  /** The q136 fixed-round integer Lloyd CTE chain at cluster count k
    * — micro-unit components `q` through final assignment `a2`
    * (vec_id, cid, d2). Shared by q136 and q153. */
  private def lloydCte(k: Int): String =
    s"""q AS (SELECT vec_id, i::BIGINT - 1 AS pos,
       |        floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS vm
       |      FROM (SELECT vec_id, embedding,
       |            unnest(generate_series(1, len(embedding))) i FROM embeddings)),
       |seeds AS (SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cid
       |          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $k)),
       |c0 AS (SELECT s.cid, q.pos, q.vm AS cm FROM q JOIN seeds s ON s.vec_id = q.vec_id),
       |e1 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
       |       FROM q JOIN c0 c ON c.pos = q.pos GROUP BY 1, 2),
       |a1 AS (SELECT vec_id, cid, d2 FROM (
       |         SELECT vec_id, cid, d2,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
       |         FROM e1) WHERE rn = 1),
       |c1 AS (SELECT a.cid, q.pos, floor(sum(q.vm) / count(*))::BIGINT AS cm
       |       FROM q JOIN a1 a ON a.vec_id = q.vec_id GROUP BY 1, 2),
       |e2 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
       |       FROM q JOIN c1 c ON c.pos = q.pos GROUP BY 1, 2),
       |a2 AS (SELECT vec_id, cid, d2 FROM (
       |         SELECT vec_id, cid, d2,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
       |         FROM e2) WHERE rn = 1)""".stripMargin

  /** q161 oracle CTE chain: greedy farthest-point rounds 2..k over the
    * micro-quantized component relation — per round the distances to
    * every selected vector, the per-vector min, and the argmax pick
    * (ties to the smallest vec_id), mirroring Similarity.coresetSelect
    * round for round. */
  private def coresetCte(k: Int): String = {
    val rounds = (2 to k).map { r =>
      val prev = s"ss${r - 1}"
      s"""dd$r AS (SELECT a.vec_id, b.vec_id AS sid,
         |       sum((a.vm - b.vm) * (a.vm - b.vm))::BIGINT AS d2
         |       FROM q a JOIN q b ON b.pos = a.pos
         |       JOIN $prev s ON s.vec_id = b.vec_id GROUP BY 1, 2),
         |mm$r AS (SELECT vec_id, min(d2) AS d2 FROM dd$r GROUP BY 1),
         |pp$r AS (SELECT $r::BIGINT AS rank, vec_id, d2 FROM mm$r
         |        ORDER BY d2 DESC, vec_id LIMIT 1),
         |ss$r AS (SELECT * FROM $prev UNION ALL SELECT * FROM pp$r)""".stripMargin
    }.mkString(",\n")
    s"""q AS (SELECT vec_id, i::BIGINT - 1 AS pos,
       |        floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS vm
       |      FROM (SELECT vec_id, embedding,
       |            unnest(generate_series(1, len(embedding))) i FROM embeddings)),
       |ss1 AS (SELECT 1::BIGINT AS rank, min(vec_id) AS vec_id,
       |        0::BIGINT AS d2 FROM embeddings),
       |$rounds""".stripMargin
  }

  /** q26 oracle — exact cosine top-5 ground truth. Shared verbatim by
    * q146's recall eval (the eval must grade against the same truth
    * the driver checks). */
  /** q33 oracle chain, parameterized by nprobe — shared verbatim by
    * q262's recall curve (the q44/q67/q146 shared-oracle rule: the
    * curve must grade exactly the probe plans the driver checks). */
  /** q256 oracle chain, parameterized by passage size (stride =
    * size/2) — shared verbatim by q263's ablation (the shared-oracle
    * rule again: the ablation grades exactly the plans the driver
    * checks). */
  private def maxPassageSql(psize: Int): String = {
    val stride = psize / 2
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |      FROM documents),
        |ds AS (SELECT count(*)::BIGINT n_docs,
        |  count(*) FILTER (len(list_filter(tk, x -> x = 'hash')) > 0)::BIGINT df_hash,
        |  count(*) FILTER (len(list_filter(tk, x -> x = 'join')) > 0)::BIGINT df_join,
        |  count(*) FILTER (len(list_filter(tk, x -> x = 'vector')) > 0)::BIGINT df_vector
        |  FROM t),
        |ti AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) i FROM t),
        |tw AS (SELECT doc_id, (i - 1) // $stride AS w, tk[i] AS tok FROM ti
        |       UNION ALL
        |       SELECT doc_id, (i - 1) // $stride - 1, tk[i] FROM ti
        |       WHERE (i - 1) // $stride - 1 >= 0),
        |pg AS (SELECT doc_id, w, count(*)::BIGINT pl,
        |  sum(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END)::BIGINT tf_hash,
        |  sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END)::BIGINT tf_join,
        |  sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END)::BIGINT tf_vector
        |  FROM tw GROUP BY 1, 2),
        |ps AS (SELECT count(*)::BIGINT n_pass, sum(pl)::BIGINT pass_tokens FROM pg),
        |c AS (SELECT pg.*, ds.*,
        |  250 + (750000 * pl) // ((1000 * pass_tokens) // n_pass) AS norm_milli
        |  FROM pg CROSS JOIN ps CROSS JOIN ds),
        |sc AS (SELECT doc_id, w, pl,
        |  ((((1000 * (2 * (n_docs - df_hash) + 1)) // (2 * df_hash + 1)) *
        |    ((tf_hash * 2200000000) //
        |     (tf_hash * 1000 + (1200 * norm_milli) // 1000))) // 1000
        |  + (((1000 * (2 * (n_docs - df_join) + 1)) // (2 * df_join + 1)) *
        |    ((tf_join * 2200000000) //
        |     (tf_join * 1000 + (1200 * norm_milli) // 1000))) // 1000
        |  + (((1000 * (2 * (n_docs - df_vector) + 1)) // (2 * df_vector + 1)) *
        |    ((tf_vector * 2200000000) //
        |     (tf_vector * 1000 + (1200 * norm_milli) // 1000))) // 1000)::BIGINT
        |  AS score_micro FROM c),
        |hits AS MATERIALIZED (SELECT * FROM sc WHERE score_micro > 0),
        |nh AS (SELECT doc_id, count(*)::BIGINT n_hit_passages FROM hits GROUP BY 1),
        |arg AS (SELECT doc_id, w, pl, score_micro FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_micro DESC, w) rn FROM hits) WHERE rn = 1)
        |SELECT a.doc_id, nh.n_hit_passages, a.w AS best_window,
        |       a.pl AS best_pl, a.score_micro
        |FROM arg a JOIN nh ON nh.doc_id = a.doc_id
        |ORDER BY a.score_micro DESC, a.doc_id LIMIT 10""".stripMargin
  }

  private def ivfTopkSql(nprobe: Int): String =
    s"""WITH q AS (SELECT vec_id, i::BIGINT - 1 AS pos,
        |             floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS vm
        |           FROM (SELECT vec_id, embedding,
        |                 unnest(generate_series(1, len(embedding))) i FROM embeddings)),
        |seeds AS (SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cid
        |          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |c0 AS (SELECT s.cid, q.pos, q.vm AS cm FROM q JOIN seeds s ON s.vec_id = q.vec_id),
        |e1 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c0 c ON c.pos = q.pos GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |         FROM e1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, q.pos, floor(sum(q.vm) / count(*))::BIGINT AS cm
        |       FROM q JOIN a1 a ON a.vec_id = q.vec_id GROUP BY 1, 2),
        |e2 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c1 c ON c.pos = q.pos GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |         FROM e2) WHERE rn = 1),
        |pd AS (SELECT q.vec_id q_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm)) d2
        |       FROM q JOIN c1 c ON c.pos = q.pos WHERE q.vec_id < 10 GROUP BY 1, 2),
        |probes AS (SELECT q_id, cid FROM (
        |            SELECT q_id, cid,
        |                   row_number() OVER (PARTITION BY q_id ORDER BY d2, cid) pr
        |            FROM pd) WHERE pr <= $nprobe),
        |e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |s AS (SELECT p.q_id, n.vec_id neighbor_id,
        |      list_dot_product(qe.v, ne.v)
        |      / sqrt(list_dot_product(qe.v, qe.v) * list_dot_product(ne.v, ne.v)) c
        |      FROM probes p JOIN a2 n ON n.cid = p.cid
        |      JOIN e qe ON qe.vec_id = p.q_id JOIN e ne ON ne.vec_id = n.vec_id
        |      WHERE n.vec_id != p.q_id),
        |r AS (SELECT q_id, neighbor_id, c,
        |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
        |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  private val BruteTopkSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      |s AS (SELECT q.vec_id q_id, n.vec_id neighbor_id,
      |      list_dot_product(q.v, n.v)
      |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
      |      FROM e q, e n WHERE q.vec_id < 10 AND n.vec_id != q.vec_id),
      |r AS (SELECT q_id, neighbor_id, c,
      |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
      |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
      |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** q27 oracle — hyperplane-LSH top-5 (shared by q146). */
  private val LshTopkSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      |sig AS (SELECT vec_id, t,
      |  list_sum(list_transform(generate_series(0, 3), r ->
      |    CASE WHEN list_sum(list_transform(generate_series(0, 63), i ->
      |      (CASE WHEN ((((t*4 + r)*64 + i) * 2654435761) & 65536) != 0
      |            THEN 1.0 ELSE -1.0 END) * v[i + 1])) > 0
      |    THEN (1::BIGINT << r) ELSE 0 END))::BIGINT AS bucket
      |  FROM e, generate_series(0, 3) g(t)),
      |cand AS (SELECT DISTINCT q.vec_id q_id, c.vec_id vec_id
      |         FROM sig q JOIN sig c ON q.t = c.t AND q.bucket = c.bucket
      |              AND q.vec_id != c.vec_id
      |         WHERE q.vec_id < 10),
      |s AS (SELECT cand.q_id, cand.vec_id neighbor_id,
      |      list_dot_product(q.v, n.v)
      |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
      |      FROM cand JOIN e q ON q.vec_id = cand.q_id JOIN e n ON n.vec_id = cand.vec_id),
      |r AS (SELECT q_id, neighbor_id, c,
      |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
      |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
      |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** q48 oracle — int8 coarse-rank + exact re-rank top-5 (shared by
    * q146). */
  private val Int8TopkSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |       127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
      |       FROM e WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
      |q8 AS (SELECT vec_id, v, list_transform(v, x ->
      |         CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
      |              ELSE -floor(abs(x * sc) + 0.5) END) q FROM s),
      |qq AS (SELECT vec_id, v, q, list_dot_product(q, q) qn FROM q8
      |       WHERE list_dot_product(q, q) > 0),
      |cand AS (SELECT a.vec_id q_id, b.vec_id vec_id,
      |         list_dot_product(a.q, b.q) / sqrt(a.qn * b.qn) ac, a.v qv, b.v nv
      |         FROM qq a JOIN qq b ON b.vec_id != a.vec_id
      |         WHERE a.vec_id < 10),
      |r1 AS (SELECT *, row_number() OVER (PARTITION BY q_id
      |                                    ORDER BY ac DESC, vec_id) rn FROM cand),
      |ex AS (SELECT q_id, vec_id, list_dot_product(qv, nv)
      |       / sqrt(list_dot_product(qv, qv) * list_dot_product(nv, nv)) c
      |       FROM r1 WHERE rn <= 20),
      |r2 AS (SELECT q_id, vec_id neighbor_id, c,
      |       row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) rnk FROM ex)
      |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
      |FROM r2 WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** The q245 aHash pair chain as CTEs ending in `pr` (doc_a, doc_b,
    * dist) — shared by the q245 oracle and q250's recursive-closure
    * clustering oracle. */
  private val AHashPairsCte: String =
    """dd AS (SELECT doc_id, text, (length(text) - 64)::BIGINT n_pix
      |      FROM documents WHERE length(text) - 64 >= 64),
      |px AS (SELECT doc_id, n_pix,
      |        ord(substr(text, (65 + p)::INT, 1))::BIGINT v, p
      |      FROM (SELECT doc_id, text, n_pix,
      |              unnest(generate_series(0, n_pix - 1)) p FROM dd)),
      |bl AS (SELECT doc_id, n_pix, (64 * p) // n_pix blk,
      |        sum(v)::BIGINT bsum, count(*)::BIGINT bcnt
      |      FROM px GROUP BY 1, 2, 3),
      |tt AS (SELECT doc_id, sum(bsum)::BIGINT tot FROM bl GROUP BY 1),
      |bits AS (SELECT bl.doc_id, blk,
      |        CASE WHEN bsum::HUGEINT * n_pix >= tot::HUGEINT * bcnt
      |          THEN 1::BIGINT ELSE 0::BIGINT END bt
      |      FROM bl JOIN tt ON tt.doc_id = bl.doc_id),
      |sg AS MATERIALIZED (SELECT doc_id,
      |        sum(CASE WHEN blk < 32 THEN bt << blk::INT ELSE 0 END)
      |          ::BIGINT lo,
      |        sum(CASE WHEN blk >= 32 THEN bt << (blk - 32)::INT
      |          ELSE 0 END)::BIGINT hi
      |      FROM bits GROUP BY 1),
      |ch AS MATERIALIZED (SELECT doc_id, lo, hi, c,
      |        ((CASE WHEN c < 5 THEN lo ELSE hi END)
      |          >> (CASE c % 5 WHEN 0 THEN 0 WHEN 1 THEN 7 WHEN 2 THEN 14
      |              WHEN 3 THEN 20 ELSE 26 END)::INT)
      |          & (CASE WHEN c % 5 < 2 THEN 127 ELSE 63 END) cv
      |      FROM sg, generate_series(0, 9) g(c)),
      |pr AS MATERIALIZED (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b,
      |       (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))
      |         ::BIGINT dist
      |      FROM ch a JOIN ch b ON b.c = a.c AND b.cv = a.cv
      |        AND a.doc_id < b.doc_id
      |      WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
      |        <= 9)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_orders_customer" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders LEFT OUTER JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q04_join_nation_region" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation LEFT OUTER JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "q05_global_max" ->
      """SELECT max(l_quantity) AS max_qty, max(l_extendedprice) AS max_price,
        |  max(l_discount) AS max_disc, max(l_tax) AS max_tax,
        |  max(l_orderkey) AS max_orderkey
        |FROM lineitem""".stripMargin,
    "q06_global_counts" ->
      """SELECT count(*) AS n_rows, count(o_custkey) AS n_custkey,
        |  count(o_totalprice) AS n_totalprice,
        |  count(DISTINCT o_custkey) AS n_distinct_cust
        |FROM orders""".stripMargin,
    "q07_global_means" ->
      """SELECT round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  round(avg(l_extendedprice), 4) AS avg_price
        |FROM lineitem""".stripMargin,
    "q08_distinct_values" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q09_normalize_by_max" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_quantity / (SELECT max(l_quantity) FROM lineitem), 6) AS qty_norm,
        |  round(l_extendedprice / (SELECT max(l_extendedprice) FROM lineitem), 6) AS price_norm
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q10_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "q11_window_top_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q12_semi_join_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q13_anti_join_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q14_union_high_value" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000.0
        |UNION
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000.0
        |ORDER BY custkey""".stripMargin,
    "q15_group_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_spent
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 3
        |ORDER BY o_custkey""".stripMargin,
    "q16_shipping_priority" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q17_local_supplier_volume" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q18_events_hourly" ->
      """SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY event_type, date_trunc('hour', ts)
        |ORDER BY event_type, hour""".stripMargin,
    "q19_events_sessionize" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(new_sess) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ns IS NULL OR epoch_ns(ts) - prev_ns > 1800000000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM (
        |    SELECT user_id, ts,
        |      lag(epoch_ns(ts)) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id) AS prev_ns
        |    FROM events) a) b
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q20_orders_by_month" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY strftime(o_orderdate, '%Y-%m'), o_orderstatus
        |ORDER BY month, o_orderstatus""".stripMargin,
    "q21_dedup_exact" ->
      """SELECT keep_id, n_copies FROM (
        |  SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |  FROM documents GROUP BY lower(text))
        |ORDER BY keep_id""".stripMargin,
    "q22_dedup_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
         |cm AS (SELECT a.doc_id da, b.doc_id db, count(*) cm
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, round(cm / (x.sz + y.sz - cm), 6) AS jaccard
         |FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE cm / (x.sz + y.sz - cm) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q46_dedup_jaccard_prefix" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
         |cm AS (SELECT a.doc_id da, b.doc_id db, count(*) cm
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, round(cm / (x.sz + y.sz - cm), 6) AS jaccard
         |FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE cm / (x.sz + y.sz - cm) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q23_dedup_minhash_lsh" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |mh AS (SELECT doc_id, j, min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
         |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // 4 AS b,
         |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
         |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
         |          FROM mh GROUP BY doc_id, j // 4),
         |cand AS (SELECT DISTINCT x.doc_id da, y.doc_id db FROM bands x JOIN bands y
         |         ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
         |cm AS (SELECT da, db, count(*) cm FROM cand
         |       JOIN sh p ON p.doc_id = da JOIN sh q ON q.doc_id = db AND q.h = p.h
         |       GROUP BY da, db),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id)
         |SELECT da AS doc_a, db AS doc_b, round(cm / (x.sz + y.sz - cm), 6) AS jaccard
         |FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE cm / (x.sz + y.sz - cm) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    // q23's pair pipeline, then WITH RECURSIVE transitive closure from
    // every doc; component label = min reachable doc_id (incl. self)
    "q49_dedup_clusters" ->
      s"""WITH $NearDupClusterCte
         |SELECT l.doc_id, l.cluster_id, cn.cluster_n
         |FROM lbl l JOIN cn ON cn.cluster_id = l.cluster_id
         |ORDER BY l.doc_id""".stripMargin,
    "q58_source_stats" ->
      """WITH t AS (SELECT source, lang, n_chars,
        |           len(string_split(text, ' '))::BIGINT n_tok FROM documents)
        |SELECT source, count(*) AS n_docs, sum(n_tok)::BIGINT AS sum_tok,
        |       (sum(n_tok) * 1000 // count(*))::BIGINT AS avg_tok_milli,
        |       count(DISTINCT lang) AS n_langs,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "q59_curriculum" ->
      s"""WITH t AS (SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT n_tok,
         |           ${H("'shuffle42:' || text")} % 1000000 AS shuffle_key FROM documents),
         |b AS (SELECT doc_id, lang, shuffle_key,
         |      (CASE WHEN n_tok < 40 THEN 0 WHEN n_tok < 70 THEN 1 ELSE 2 END)::BIGINT AS band
         |      FROM t)
         |SELECT doc_id, lang, band, shuffle_key,
         |       row_number() OVER (PARTITION BY lang
         |         ORDER BY band, shuffle_key, doc_id)::BIGINT AS train_rank
         |FROM b ORDER BY doc_id""".stripMargin,
    "q57_corpus_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') tk FROM documents),
        |m AS (SELECT doc_id, len(tk)::BIGINT n_tok, len(list_distinct(tk)) n_uniq FROM t)
        |SELECT doc_id, n_tok,
        |  CASE WHEN n_tok < 20 THEN 'too_short'
        |       WHEN n_tok > 90 THEN 'too_long'
        |       WHEN n_uniq / n_tok < 0.45 THEN 'repetitive'
        |       ELSE 'keep' END AS verdict
        |FROM m ORDER BY doc_id""".stripMargin,
    "q55_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+3], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) i FROM t)),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id, count(*) AS n_shared
         |FROM sh s JOIN ev ON ev.h = s.h WHERE s.doc_id % 97 != 0
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "q124_event_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts))::BIGINT AS view_us
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(epoch_us(e.ts))::BIGINT AS click_us
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.view_us
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts))::BIGINT AS purchase_us
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.click_us
        |      GROUP BY 1)
        |SELECT v.user_id, v.view_us, c.click_us, p.purchase_us,
        |       (1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS stage
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,
    "q125_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |ch AS (SELECT user_id, min(day)::BIGINT AS cohort_day FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT ch.cohort_day, e.day - ch.cohort_day AS day_offset,
        |      e.user_id FROM e JOIN ch ON ch.user_id = e.user_id)
        |SELECT cohort_day, day_offset::BIGINT AS day_offset, count(*)::BIGINT AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "q126_pagerank" -> PageRankOracle,
    "q131_bfs_distances" -> BfsOracle,
    "q127_triangle_counts" ->
      """WITH it0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |it AS (SELECT ok, pk FROM (
        |         SELECT ok, pk, row_number() OVER (PARTITION BY ok ORDER BY pk) AS rn
        |         FROM it0) WHERE rn <= 1024),
        |pr AS (SELECT DISTINCT a.pk AS p1, b.pk AS p2
        |            FROM it a JOIN it b
        |              ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, count(*)::BIGINT AS dg FROM
        |        (SELECT p1 AS node FROM pr UNION ALL SELECT p2 AS node FROM pr)
        |        GROUP BY 1),
        |o AS (SELECT
        |        CASE WHEN (d1.dg, pr.p1) < (d2.dg, pr.p2) THEN pr.p1 ELSE pr.p2 END AS src,
        |        CASE WHEN (d1.dg, pr.p1) < (d2.dg, pr.p2) THEN pr.p2 ELSE pr.p1 END AS dst,
        |        CASE WHEN (d1.dg, pr.p1) < (d2.dg, pr.p2) THEN d2.dg ELSE d1.dg END AS dd
        |      FROM pr JOIN deg d1 ON d1.node = pr.p1 JOIN deg d2 ON d2.node = pr.p2),
        |t AS (SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
        |      FROM o o1 JOIN o o2 ON o1.src = o2.src
        |             AND (o1.dd, o1.dst) < (o2.dd, o2.dst)
        |      JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst),
        |n AS (SELECT node, count(*)::BIGINT AS tri FROM
        |      (SELECT a AS node FROM t UNION ALL SELECT b AS node FROM t
        |       UNION ALL SELECT c AS node FROM t) GROUP BY 1)
        |SELECT deg.node, deg.dg AS degree, coalesce(n.tri, 0)::BIGINT AS n_tri,
        |       (CASE WHEN deg.dg >= 2
        |             THEN (2000 * coalesce(n.tri, 0)) // (deg.dg * (deg.dg - 1))
        |             ELSE 0 END)::BIGINT AS cc_milli
        |FROM deg LEFT JOIN n ON n.node = deg.node ORDER BY deg.node""".stripMargin,
    "q128_collocations" ->
      """WITH t AS (SELECT regexp_split_to_array(text, ' ') AS tk FROM documents),
        |bi AS (SELECT tk[i] AS w1, tk[i + 1] AS w2
        |       FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM t)),
        |uni AS (SELECT unnest(tk) AS w FROM t),
        |uc AS (SELECT w, count(*)::BIGINT AS cw FROM uni GROUP BY 1),
        |bc AS (SELECT w1, w2, count(*)::BIGINT AS n_pair FROM bi GROUP BY 1, 2
        |       HAVING count(*) >= 5),
        |st AS (SELECT (SELECT count(*) FROM uni)::BIGINT AS n_uni,
        |              (SELECT count(*) FROM bi)::BIGINT AS n_bi)
        |SELECT bc.w1, bc.w2, bc.n_pair, u1.cw AS n_w1, u2.cw AS n_w2,
        |       ((1000::HUGEINT * bc.n_pair * st.n_uni * st.n_uni)
        |         // (st.n_bi::HUGEINT * u1.cw * u2.cw))::BIGINT AS lift_milli
        |FROM bc JOIN uc u1 ON u1.w = bc.w1 JOIN uc u2 ON u2.w = bc.w2, st
        |ORDER BY lift_milli DESC, w1, w2 LIMIT 50""".stripMargin,
    "q129_importance_weights" ->
      s"""WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w
         |           FROM documents),
         |tb AS (SELECT doc_id, ${H("w")} % 1024 AS b FROM t),
         |bc AS (SELECT b, count(*) FILTER (doc_id % 97 = 0)::BIGINT AS tb,
         |              count(*) FILTER (doc_id % 97 != 0)::BIGINT AS rb
         |       FROM tb GROUP BY 1),
         |st AS (SELECT sum(tb)::BIGINT AS tt, sum(rb)::BIGINT AS rt FROM bc),
         |wt AS (SELECT b, ((1000::HUGEINT * (tb + 1) * (rt + 1024))
         |                   // ((rb + 1)::HUGEINT * (tt + 1024)))::BIGINT AS wm
         |       FROM bc, st)
         |SELECT tb.doc_id, count(*)::BIGINT AS n_tok,
         |       (sum(wm) // count(*))::BIGINT AS affinity_milli
         |FROM tb JOIN wt ON wt.b = tb.b WHERE tb.doc_id % 97 != 0
         |GROUP BY tb.doc_id ORDER BY tb.doc_id""".stripMargin,
    "q130_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type AS from_type,
        |             lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY epoch_ns(ts), event_id) AS to_type
        |           FROM events),
        |t AS (SELECT from_type, to_type, count(*)::BIGINT AS n FROM s
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n)::BIGINT AS tot FROM t GROUP BY 1)
        |SELECT t.from_type, t.to_type, t.n, ((1000 * t.n) // tot.tot)::BIGINT AS permille
        |FROM t JOIN tot ON tot.from_type = t.from_type
        |ORDER BY t.from_type, t.to_type""".stripMargin,
    "q123_verbatim_overlap_capped" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |g0 AS (SELECT doc_id, i - 1 AS pos, ${H("array_to_string(tk[i:i+7], ' ')")} AS h
         |      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) i FROM t)),
         |keep AS (SELECT h FROM g0 GROUP BY h HAVING count(*) <= 16),
         |g AS (SELECT g0.* FROM g0 JOIN keep USING (h)),
         |m AS (SELECT a.doc_id doc_a, b.doc_id doc_b, a.pos pa, a.pos - b.pos AS diag
         |      FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
         |r AS (SELECT doc_a, doc_b, diag,
         |      pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
         |      FROM m),
         |agg AS (SELECT doc_a, doc_b, diag, grp, count(*) AS run
         |        FROM r GROUP BY doc_a, doc_b, diag, grp)
         |SELECT doc_a, doc_b, count(*) AS n_regions, max(run)::BIGINT AS max_run,
         |       (max(run) + 7)::BIGINT AS span_tokens
         |FROM agg GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin,
    "q109_verbatim_overlap" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |g AS (SELECT doc_id, i - 1 AS pos, ${H("array_to_string(tk[i:i+7], ' ')")} AS h
         |      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) i FROM t)),
         |m AS (SELECT a.doc_id doc_a, b.doc_id doc_b, a.pos pa, a.pos - b.pos AS diag
         |      FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
         |r AS (SELECT doc_a, doc_b, diag,
         |      pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
         |      FROM m),
         |agg AS (SELECT doc_a, doc_b, diag, grp, count(*) AS run
         |        FROM r GROUP BY doc_a, doc_b, diag, grp)
         |SELECT doc_a, doc_b, count(*) AS n_regions, max(run)::BIGINT AS max_run,
         |       (max(run) + 7)::BIGINT AS span_tokens
         |FROM agg GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin,
    "q132_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |g AS (SELECT doc_id, i - 1 AS pos, ${H("array_to_string(tk[i:i+7], ' ')")} AS h
         |      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) i FROM t)),
         |dup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |hit AS (SELECT g.doc_id, g.pos FROM g JOIN dup ON g.h = dup.h),
         |r AS (SELECT doc_id, pos,
         |      pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM hit)
         |SELECT doc_id, min(pos)::BIGINT AS span_start, count(*)::BIGINT AS n_grams,
         |       (count(*) + 7)::BIGINT AS span_tokens
         |FROM r GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin,
    "q133_event_anomalies" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT event_type, day::BIGINT AS day, count(*)::BIGINT AS n FROM e GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*)::BIGINT AS days, sum(n)::BIGINT AS total,
        |      sum(n * n)::BIGINT AS sumsq FROM c GROUP BY 1),
        |j AS (SELECT c.event_type, c.day, c.n,
        |      (c.n * s.days - s.total)::BIGINT AS dev_scaled,
        |      (s.days * s.sumsq - s.total * s.total)::BIGINT AS var_scaled
        |      FROM c JOIN s ON c.event_type = s.event_type)
        |SELECT event_type, day, n, dev_scaled,
        |  (CASE WHEN var_scaled > 0
        |        THEN (1000 * dev_scaled * dev_scaled) // var_scaled END)::BIGINT AS z2_milli,
        |  (CASE WHEN var_scaled > 0 AND dev_scaled * dev_scaled > 9 * var_scaled
        |        THEN 1 ELSE 0 END)::BIGINT AS flagged
        |FROM j ORDER BY event_type, day""".stripMargin,
    "q134_quality_calibration" ->
      """WITH t AS (SELECT doc_id, source, regexp_split_to_array(text, ' ') tk FROM documents),
        |s AS (SELECT doc_id, source, len(tk)::BIGINT n_tok,
        |      len(list_distinct(tk))::BIGINT n_uniq,
        |      len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
        |      FROM t),
        |sc AS (SELECT doc_id, source,
        |       ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
        |        + (300 * least(n_tok, 200)) // 200)::BIGINT AS score_milli FROM s),
        |r AS (SELECT doc_id, source, score_milli,
        |      row_number() OVER (PARTITION BY source ORDER BY score_milli, doc_id)::BIGINT AS rn,
        |      count(*) OVER (PARTITION BY source)::BIGINT AS nsrc FROM sc)
        |SELECT doc_id, source, score_milli,
        |  (CASE WHEN nsrc > 1 THEN (1000 * (rn - 1)) // (nsrc - 1) ELSE 500 END)::BIGINT AS cal_permille
        |FROM r ORDER BY doc_id""".stripMargin,
    "q135_dsir_select" ->
      s"""WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w
         |           FROM documents),
         |tb AS (SELECT doc_id, ${H("w")} % 1024 AS b FROM t),
         |bc AS (SELECT b, count(*) FILTER (doc_id % 97 = 0)::BIGINT AS tb,
         |              count(*) FILTER (doc_id % 97 != 0)::BIGINT AS rb
         |       FROM tb GROUP BY 1),
         |st AS (SELECT sum(tb)::BIGINT AS tt, sum(rb)::BIGINT AS rt FROM bc),
         |wt AS (SELECT b, ((1000::HUGEINT * (tb + 1) * (rt + 1024))
         |                   // ((rb + 1)::HUGEINT * (tt + 1024)))::BIGINT AS wm
         |       FROM bc, st),
         |af AS (SELECT tb.doc_id, count(*)::BIGINT AS n_tok,
         |              (sum(wm) // count(*))::BIGINT AS affinity_milli
         |       FROM tb JOIN wt ON wt.b = tb.b WHERE tb.doc_id % 97 != 0
         |       GROUP BY tb.doc_id),
         |sel AS (SELECT doc_id, n_tok, affinity_milli,
         |               (${H("'sel:' || doc_id::VARCHAR")} % 1000)::BIGINT AS u_permille
         |        FROM af)
         |SELECT doc_id, n_tok, affinity_milli, u_permille FROM sel
         |WHERE u_permille < least(affinity_milli, 1000)
         |ORDER BY doc_id""".stripMargin,
    // PQ oracle: the per-subspace Lloyd chain (sub = dim div 8 folded
    // into every key), integer ADC table + coarse rank, exact cosine
    // re-rank — replays Similarity.pqTopK bit-for-bit.
    "q83_knn_pq" ->
      """WITH q AS (SELECT vec_id, (i::BIGINT - 1) // 8 AS sub, i::BIGINT - 1 AS pos,
        |             floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS vm
        |           FROM (SELECT vec_id, embedding,
        |                 unnest(generate_series(1, len(embedding))) i FROM embeddings)),
        |seeds AS (SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cid
        |          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |c0 AS (SELECT q.sub, s.cid, q.pos, q.vm AS cm
        |       FROM q JOIN seeds s ON s.vec_id = q.vec_id),
        |e1 AS (SELECT q.vec_id, q.sub, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c0 c ON c.sub = q.sub AND c.pos = q.pos GROUP BY 1, 2, 3),
        |a1 AS (SELECT vec_id, sub, cid FROM (
        |         SELECT vec_id, sub, cid,
        |                row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) rn
        |         FROM e1) WHERE rn = 1),
        |c1 AS (SELECT a.sub, a.cid, q.pos, floor(sum(q.vm) / count(*))::BIGINT AS cm
        |       FROM q JOIN a1 a ON a.vec_id = q.vec_id AND a.sub = q.sub
        |       GROUP BY 1, 2, 3),
        |e2 AS (SELECT q.vec_id, q.sub, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c1 c ON c.sub = q.sub AND c.pos = q.pos GROUP BY 1, 2, 3),
        |a2 AS (SELECT vec_id, sub, cid FROM (
        |         SELECT vec_id, sub, cid,
        |                row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) rn
        |         FROM e2) WHERE rn = 1),
        |t AS (SELECT q.vec_id q_id, c.sub, c.cid, sum(q.vm * c.cm)::BIGINT t
        |      FROM q JOIN c1 c ON c.sub = q.sub AND c.pos = q.pos
        |      WHERE q.vec_id < 10 GROUP BY 1, 2, 3),
        |adc AS (SELECT t.q_id, a.vec_id, sum(t.t)::BIGINT adc
        |        FROM a2 a JOIN t ON t.sub = a.sub AND t.cid = a.cid
        |        WHERE a.vec_id != t.q_id GROUP BY 1, 2),
        |cand AS (SELECT q_id, vec_id FROM (
        |          SELECT q_id, vec_id,
        |                 row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) rn
        |          FROM adc) WHERE rn <= 50),
        |e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |s2 AS (SELECT c2.q_id, c2.vec_id neighbor_id,
        |       list_dot_product(qe.v, ne.v)
        |       / sqrt(list_dot_product(qe.v, qe.v) * list_dot_product(ne.v, ne.v)) c
        |       FROM cand c2 JOIN e qe ON qe.vec_id = c2.q_id
        |       JOIN e ne ON ne.vec_id = c2.vec_id),
        |r AS (SELECT q_id, neighbor_id, c,
        |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s2)
        |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // SemDeDup oracle: the same Lloyd cell chain as q33, then the
    // within-cell cosine prune with the min-partner representative.
    "q115_sem_dedup" ->
      """WITH q AS (SELECT vec_id, i::BIGINT - 1 AS pos,
        |             floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS vm
        |           FROM (SELECT vec_id, embedding,
        |                 unnest(generate_series(1, len(embedding))) i FROM embeddings)),
        |seeds AS (SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cid
        |          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |c0 AS (SELECT s.cid, q.pos, q.vm AS cm FROM q JOIN seeds s ON s.vec_id = q.vec_id),
        |e1 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c0 c ON c.pos = q.pos GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |         FROM e1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, q.pos, floor(sum(q.vm) / count(*))::BIGINT AS cm
        |       FROM q JOIN a1 a ON a.vec_id = q.vec_id GROUP BY 1, 2),
        |e2 AS (SELECT q.vec_id, c.cid, sum((q.vm - c.cm) * (q.vm - c.cm))::BIGINT AS d2
        |       FROM q JOIN c1 c ON c.pos = q.pos GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cid FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |         FROM e2) WHERE rn = 1),
        |e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |pr AS (SELECT b.vec_id, b.cid AS cell, a.vec_id AS partner,
        |       list_dot_product(ae.v, be.v)
        |       / sqrt(list_dot_product(ae.v, ae.v) * list_dot_product(be.v, be.v)) c
        |       FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |       JOIN e ae ON ae.vec_id = a.vec_id JOIN e be ON be.vec_id = b.vec_id),
        |sel AS (SELECT vec_id, cell, partner, round(c, 6) AS cosine,
        |        row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY partner, round(c, 6)) rn
        |        FROM pr WHERE c >= 0.4)
        |SELECT vec_id, cell::INTEGER AS cell, partner AS dup_of, cosine
        |FROM sel WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // IVF oracle: the q136 Lloyd CTE chain at nlist=16, then integer
    // probe selection (nprobe=4) and exact double-cosine scoring on the
    // probed cells — replays Similarity.ivfTopK bit-for-bit.
    "q33_knn_ivf" -> ivfTopkSql(4),
    "q141_session_associations" ->
      """WITH s AS (SELECT user_id, event_id, event_type, epoch_ns(ts) tns,
        |             lag(epoch_ns(ts)) OVER (PARTITION BY user_id
        |               ORDER BY epoch_ns(ts), event_id) prev_ns
        |           FROM events),
        |n AS (SELECT user_id, event_type,
        |        sum(CASE WHEN prev_ns IS NULL OR tns - prev_ns > 1800000000000
        |                 THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM s),
        |u AS (SELECT DISTINCT user_id, sid, event_type FROM n),
        |tot AS (SELECT count(*)::BIGINT n_sess FROM (SELECT DISTINCT user_id, sid FROM u)),
        |tc AS (SELECT event_type, count(*)::BIGINT nt FROM u GROUP BY 1),
        |p AS (SELECT a.event_type ta, b.event_type tb, count(*)::BIGINT n_both
        |      FROM u a JOIN u b ON a.user_id = b.user_id AND a.sid = b.sid
        |                       AND a.event_type < b.event_type
        |      GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT ta AS type_a, tb AS type_b, n_both, x.nt AS na, y.nt AS nb,
        |  ((1000 * n_both) // x.nt)::BIGINT AS conf_a_to_b_permille,
        |  ((1000 * n_both) // y.nt)::BIGINT AS conf_b_to_a_permille,
        |  ((1000::HUGEINT * n_both * t.n_sess) // (x.nt::HUGEINT * y.nt))::BIGINT
        |    AS lift_permille
        |FROM p JOIN tc x ON x.event_type = ta JOIN tc y ON y.event_type = tb, tot t
        |ORDER BY type_a, type_b""".stripMargin,
    "q140_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
        |s AS (SELECT q.vec_id q_id, q.label q_label, n.vec_id neighbor_id,
        |      n.label n_label,
        |      list_dot_product(q.v, n.v)
        |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
        |      FROM e q, e n
        |      WHERE q.vec_id < 10 AND n.vec_id != q.vec_id AND n.label != q.label),
        |r AS (SELECT q_id, q_label, neighbor_id, n_label, c,
        |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
        |SELECT q_id, q_label, neighbor_id, n_label, round(c, 6) AS cosine,
        |       rnk::BIGINT AS rank
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "q138_containment_pairs" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |sz AS (SELECT doc_id, count(*)::BIGINT sz FROM sh GROUP BY doc_id),
         |cm AS (SELECT a.doc_id da, b.doc_id db, count(*)::BIGINT cm
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, cm, x.sz AS sa, y.sz AS sb,
         |       ((1000 * cm) // least(x.sz, y.sz))::BIGINT AS containment_permille,
         |       ((1000 * cm) // (x.sz + y.sz - cm))::BIGINT AS jaccard_permille
         |FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE (1000 * cm) // least(x.sz, y.sz) >= 800
         |ORDER BY doc_a, doc_b""".stripMargin,
    // q138 with the df cap replayed: stop-shingles (df > 64) leave the
    // index before the pair join; sizes stay UNCAPPED (the denominator
    // is the doc's true shingle count, matching Dedup.containmentPairsDf)
    "q142_containment_capped" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |        FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |keep AS (SELECT h FROM sh0 GROUP BY h HAVING count(*) <= ${Dedup.ContainDfCap}),
         |sh AS (SELECT sh0.doc_id, sh0.h FROM sh0 JOIN keep USING (h)),
         |sz AS (SELECT doc_id, count(*)::BIGINT sz FROM sh0 GROUP BY doc_id),
         |cm AS (SELECT a.doc_id da, b.doc_id db, count(*)::BIGINT cm
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, cm, x.sz AS sa, y.sz AS sb,
         |       ((1000 * cm) // least(x.sz, y.sz))::BIGINT AS containment_permille,
         |       ((1000 * cm) // (x.sz + y.sz - cm))::BIGINT AS jaccard_permille
         |FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |WHERE (1000 * cm) // least(x.sz, y.sz) >= 800
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q139_contam_radius" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)
         |       WHERE doc_id % 97 != 0),
         |mh AS (SELECT doc_id, j, min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
         |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // 4 AS b,
         |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
         |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
         |          FROM mh GROUP BY doc_id, j // 4),
         |cand AS (SELECT DISTINCT x.doc_id da, y.doc_id db FROM bands x JOIN bands y
         |         ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
         |cm AS (SELECT da, db, count(*) cm FROM cand
         |       JOIN sh p ON p.doc_id = da JOIN sh q ON q.doc_id = db AND q.h = p.h
         |       GROUP BY da, db),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
         |pairs AS (SELECT da, db FROM cm JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |          WHERE cm / (x.sz + y.sz - cm) >= 0.5),
         |edges AS (SELECT da s, db t2 FROM pairs UNION ALL SELECT db, da FROM pairs),
         |sh4 AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+3], ' ')")} AS h
         |        FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) i FROM t)),
         |ev AS (SELECT DISTINCT h FROM sh4 WHERE doc_id % 97 = 0),
         |h0 AS (SELECT DISTINCT s.doc_id FROM sh4 s JOIN ev ON ev.h = s.h
         |       WHERE s.doc_id % 97 != 0),
         |h1 AS (SELECT DISTINCT e.t2 AS doc_id FROM h0 JOIN edges e ON e.s = h0.doc_id
         |       WHERE e.t2 NOT IN (SELECT doc_id FROM h0)),
         |h2 AS (SELECT DISTINCT e.t2 AS doc_id FROM h1 JOIN edges e ON e.s = h1.doc_id
         |       WHERE e.t2 NOT IN (SELECT doc_id FROM h0)
         |         AND e.t2 NOT IN (SELECT doc_id FROM h1))
         |SELECT doc_id, 0::BIGINT AS hops FROM h0
         |UNION ALL SELECT doc_id, 1::BIGINT AS hops FROM h1
         |UNION ALL SELECT doc_id, 2::BIGINT AS hops FROM h2
         |ORDER BY doc_id""".stripMargin,
    "q136_kmeans_embed" ->
      s"""WITH ${lloydCte(8)}
         |SELECT vec_id, cid, d2 AS dist_sq_micro FROM a2 ORDER BY vec_id""".stripMargin,
    "q137_length_buckets" ->
      """WITH t AS (SELECT len(regexp_split_to_array(text, ' '))::BIGINT AS n_tok
        |           FROM documents),
        |g AS (SELECT n_tok // 64 AS bucket, count(*)::BIGINT AS n_docs,
        |             sum(n_tok)::BIGINT AS sum_tok, max(n_tok)::BIGINT AS max_tok
        |      FROM t GROUP BY 1)
        |SELECT bucket::BIGINT AS bucket, (bucket * 64)::BIGINT AS lo_tok, n_docs,
        |       sum_tok, max_tok,
        |       (n_docs * max_tok - sum_tok)::BIGINT AS pad_waste_tok,
        |       ((1000 * sum_tok) // (n_docs * max_tok))::BIGINT AS fill_permille
        |FROM g ORDER BY bucket""".stripMargin,
    "q122_sample_estimate" ->
      s"""WITH r(lang, permille) AS (VALUES ('en', 250), ('de', 800), ('es', 800),
         |                                 ('fr', 800), ('zh', 800)),
         |s AS (SELECT d.lang, r.permille::BIGINT AS permille,
         |      len(regexp_split_to_array(d.text, ' '))::BIGINT AS n_tok
         |      FROM documents d JOIN r ON r.lang = d.lang
         |      WHERE ${H("d.text")} % 1000 < r.permille),
         |g AS (SELECT lang, permille, count(*)::BIGINT AS n_sampled,
         |      sum(n_tok)::BIGINT AS tok_sampled FROM s GROUP BY 1, 2)
         |SELECT lang, permille, n_sampled, tok_sampled,
         |       ((n_sampled * 1000) // permille)::BIGINT AS est_docs,
         |       ((tok_sampled * 1000) // permille)::BIGINT AS est_tokens
         |FROM g ORDER BY lang""".stripMargin,
    "q121_cdc_chunk_dups" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |tok AS (SELECT doc_id, i::BIGINT - 1 AS i, tk[i] AS w
         |        FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) i FROM t)),
         |sh AS (SELECT doc_id, i::BIGINT - 1 AS p,
         |       ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |bnd AS (SELECT doc_id, p FROM sh WHERE p >= 1 AND h % 8 = 0),
         |mk AS (SELECT tok.doc_id, tok.i, tok.w,
         |       CASE WHEN bnd.p IS NULL THEN 0 ELSE 1 END AS b
         |       FROM tok LEFT JOIN bnd ON bnd.doc_id = tok.doc_id AND bnd.p = tok.i),
         |ch AS (SELECT doc_id, i, w,
         |       sum(b) OVER (PARTITION BY doc_id ORDER BY i)::BIGINT AS chunk_id FROM mk),
         |cg AS (SELECT doc_id, chunk_id,
         |       ${H("string_agg(w, ' ' ORDER BY i)")} AS chunk_hash,
         |       count(*)::BIGINT AS n_tok FROM ch GROUP BY 1, 2)
         |SELECT chunk_hash, min(n_tok)::BIGINT AS n_tok,
         |       count(DISTINCT doc_id)::BIGINT AS n_docs, count(*)::BIGINT AS n_occ
         |FROM cg GROUP BY chunk_hash HAVING count(*) >= 2
         |ORDER BY chunk_hash""".stripMargin,
    "q120_eval_carve" ->
      s"""WITH h AS (SELECT source, ${H("'carve:' || text")} AS hkey, doc_id FROM documents),
         |r AS (SELECT source, hkey, doc_id,
         |      row_number() OVER (PARTITION BY source ORDER BY hkey, doc_id) AS rn
         |      FROM h)
         |SELECT source, rn::BIGINT AS rank, doc_id, hkey
         |FROM r WHERE rn <= 50 ORDER BY source, rank""".stripMargin,
    "q119_winnow_overlap" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT doc_id, i::BIGINT - 1 AS pos,
         |       ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |win AS (SELECT a.doc_id, a.pos AS p, b.pos AS q, b.h AS h
         |        FROM sh a JOIN sh b ON b.doc_id = a.doc_id
         |          AND b.pos BETWEEN a.pos - 3 AND a.pos
         |        WHERE a.pos >= 3),
         |m AS (SELECT doc_id, p, min(h) AS wmin FROM win GROUP BY 1, 2),
         |fp AS (SELECT DISTINCT doc_id, wmin AS h FROM m),
         |sz AS (SELECT doc_id, count(*)::BIGINT AS nfp FROM fp GROUP BY 1),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
         |       FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b, shared, sa.nfp AS nfp_a, sb.nfp AS nfp_b,
         |       ((1000 * shared) // least(sa.nfp, sb.nfp))::BIGINT AS overlap_permille
         |FROM pr JOIN sz sa ON sa.doc_id = pr.doc_a
         |        JOIN sz sb ON sb.doc_id = pr.doc_b
         |WHERE shared >= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // q116/q117: the greedy BPE merge recurrence replayed as a DuckDB
    // recursive CTE. `state` carries the full (bounded, top-MaxWords)
    // word table's symbolization per round; the recursive term picks
    // the (count desc, pair asc) argmax pair by aggregating over the
    // working table and applies it via a left fold (just-merged tokens
    // can never re-match as lhs since lhs||rhs != lhs, so the fold ≡
    // the left-to-right non-overlapping scan in Bpe.applyMerge).
    "q116_bpe_vocab" ->
      s"""$BpeStateCte
         |pairs AS (SELECT round, syms[i] l, syms[i+1] r, sum(c)::BIGINT pc
         |          FROM state, unnest(generate_series(1, len(syms)-1)) t(i)
         |          GROUP BY 1, 2, 3),
         |best AS (SELECT round, l, r, pc,
         |         row_number() OVER (PARTITION BY round ORDER BY pc DESC, l, r) rn
         |         FROM pairs)
         |SELECT round::BIGINT rank, l AS lhs, r AS rhs, l || r AS merged, pc AS pair_count
         |FROM best WHERE rn = 1 AND round < ${Bpe.NMerges} ORDER BY rank""".stripMargin,
    // final-round state IS each vocab word's encoding (learn and encode
    // apply the same merges in the same order); the corpus joins the
    // word -> piece-count relation exactly as Bpe.bpeEncode does. Holds
    // while the corpus vocabulary fits the top-MaxWords cut (it does at
    // every test SF by orders of magnitude).
    "q117_bpe_encode" ->
      s"""$BpeStateCte
         |enc AS (SELECT word, len(syms)::BIGINT n_pieces FROM state
         |        WHERE round = (SELECT max(round) FROM state)),
         |w AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) word FROM documents),
         |agg AS (SELECT doc_id, count(*)::BIGINT n_words, sum(n_pieces)::BIGINT n_bpe,
         |               sum(length(word))::BIGINT n_chars
         |        FROM w JOIN enc USING (word) GROUP BY doc_id)
         |SELECT doc_id, n_words, n_bpe, n_chars,
         |       ((n_bpe * 1000) // n_words)::BIGINT AS pieces_per_word_milli,
         |       ((n_chars * 1000) // n_bpe)::BIGINT AS chars_per_piece_milli
         |FROM agg ORDER BY doc_id""".stripMargin,
    "q118_winnow_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT doc_id, i::BIGINT - 1 AS pos,
         |       ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |win AS (SELECT a.doc_id, a.pos AS p, b.pos AS q, b.h AS h
         |        FROM sh a JOIN sh b ON b.doc_id = a.doc_id
         |          AND b.pos BETWEEN a.pos - 3 AND a.pos
         |        WHERE a.pos >= 3),
         |m AS (SELECT doc_id, p, min(h) AS wmin FROM win GROUP BY 1, 2),
         |sel AS (SELECT w.doc_id, w.p, m.wmin AS h, max(w.q) AS pos
         |        FROM win w JOIN m ON m.doc_id = w.doc_id AND m.p = w.p
         |          AND w.h = m.wmin
         |        GROUP BY 1, 2, 3)
         |SELECT DISTINCT doc_id, pos, h FROM sel
         |ORDER BY doc_id, pos""".stripMargin,
    "q114_bm25_search" ->
      """WITH p AS (SELECT doc_id, len(tk)::BIGINT AS dl,
        |  len(list_filter(tk, x -> x = 'hash'))::BIGINT AS tf_hash,
        |  len(list_filter(tk, x -> x = 'join'))::BIGINT AS tf_join,
        |  len(list_filter(tk, x -> x = 'vector'))::BIGINT AS tf_vector
        |  FROM (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents)),
        |s AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS n_tokens,
        |  count(*) FILTER (tf_hash > 0)::BIGINT AS df_hash,
        |  count(*) FILTER (tf_join > 0)::BIGINT AS df_join,
        |  count(*) FILTER (tf_vector > 0)::BIGINT AS df_vector FROM p),
        |c AS (SELECT p.*, s.*,
        |  250 + (750000 * dl) // ((1000 * n_tokens) // n_docs) AS norm_milli
        |  FROM p CROSS JOIN s),
        |sc AS (SELECT doc_id, dl, tf_hash, tf_join, tf_vector,
        |  ((((1000 * (2 * (n_docs - df_hash) + 1)) // (2 * df_hash + 1)) *
        |    ((tf_hash * 2200000000) //
        |     (tf_hash * 1000 + (1200 * norm_milli) // 1000))) // 1000
        |  + (((1000 * (2 * (n_docs - df_join) + 1)) // (2 * df_join + 1)) *
        |    ((tf_join * 2200000000) //
        |     (tf_join * 1000 + (1200 * norm_milli) // 1000))) // 1000
        |  + (((1000 * (2 * (n_docs - df_vector) + 1)) // (2 * df_vector + 1)) *
        |    ((tf_vector * 2200000000) //
        |     (tf_vector * 1000 + (1200 * norm_milli) // 1000))) // 1000)::BIGINT
        |  AS score_micro FROM c)
        |SELECT * FROM sc WHERE score_micro > 0
        |ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin,
    "q113_length_drift" ->
      """WITH b AS (SELECT len(regexp_split_to_array(text, ' '))::BIGINT // 10 AS bucket,
        |                  substr(source, 4)::INT >= 15 AS is_new
        |           FROM documents),
        |g AS (SELECT bucket,
        |             count(*) FILTER (NOT is_new) AS n_old,
        |             count(*) FILTER (is_new) AS n_new
        |      FROM b GROUP BY bucket),
        |c AS (SELECT bucket, n_old, n_new,
        |             sum(n_old) OVER (ORDER BY bucket)::BIGINT AS cum_old,
        |             sum(n_new) OVER (ORDER BY bucket)::BIGINT AS cum_new,
        |             sum(n_old) OVER ()::BIGINT AS tot_old,
        |             sum(n_new) OVER ()::BIGINT AS tot_new
        |      FROM g)
        |SELECT bucket, n_old, n_new,
        |       cum_old * 1000 // tot_old AS cdf_old_pm,
        |       cum_new * 1000 // tot_new AS cdf_new_pm,
        |       abs(cum_old * 1000 // tot_old - cum_new * 1000 // tot_new) AS drift_pm
        |FROM c ORDER BY bucket""".stripMargin,
    "q112_decon_suites" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+3], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) i FROM t)),
         |ev AS (SELECT DISTINCT (doc_id // 97) % 3 AS suite, h FROM sh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id,
         |  count(*) FILTER (ev.suite = 0) AS n_suite0,
         |  count(*) FILTER (ev.suite = 1) AS n_suite1,
         |  count(*) FILTER (ev.suite = 2) AS n_suite2,
         |  count(DISTINCT ev.suite) AS n_suites
         |FROM sh s JOIN ev ON ev.h = s.h WHERE s.doc_id % 97 != 0
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "q111_split_assign" ->
      s"""WITH s AS (SELECT doc_id, ${H("'split:' || text")} % 1000 AS skey FROM documents)
         |SELECT doc_id, skey,
         |  CASE WHEN skey < 980 THEN 'train'
         |       WHEN skey < 990 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM s ORDER BY doc_id""".stripMargin,
    "q110_mixture_plan" ->
      """WITH tok AS (SELECT lang, sum(len(regexp_split_to_array(text, ' ')))::BIGINT AS n_tokens
        |             FROM documents GROUP BY lang),
        |t(lang, share_pm) AS (VALUES ('en', 400), ('de', 150), ('es', 150), ('fr', 150), ('zh', 150)),
        |j AS (SELECT lang, n_tokens, share_pm::BIGINT AS share_pm,
        |             n_tokens * 1000 // share_pm AS feasible
        |      FROM tok JOIN t USING (lang)),
        |b AS (SELECT min(feasible) AS budget FROM j)
        |SELECT lang, n_tokens, share_pm,
        |       least(1000, (budget * share_pm // 1000) * 1000 // n_tokens)::BIGINT AS rate_permille,
        |       (budget * share_pm // 1000)::BIGINT AS planned_tokens
        |FROM j, b ORDER BY lang""".stripMargin,
    "q108_bigram_fluency" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
        |bi AS (SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS bg, tk[i] AS w1
        |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) i FROM t)),
        |c2 AS (SELECT bg, count(*) AS c2 FROM bi GROUP BY bg),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       (sum(c2.c2 * 1000000 // c1.c1) // count(*))::BIGINT AS fluency_micro
        |FROM bi JOIN c2 USING (bg) JOIN c1 USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q107_contam_spans" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT doc_id, i - 1 AS pos, ${H("array_to_string(tk[i:i+3], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) i FROM t)),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0),
         |hits AS (SELECT s.doc_id, s.pos FROM sh s JOIN ev ON ev.h = s.h
         |         WHERE s.doc_id % 97 != 0),
         |runs AS (SELECT doc_id,
         |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |         FROM hits),
         |agg AS (SELECT doc_id, grp, count(*) AS run FROM runs GROUP BY doc_id, grp)
         |SELECT doc_id, count(*) AS n_spans, max(run)::BIGINT AS max_run,
         |       (max(run) + 3)::BIGINT AS span_tokens
         |FROM agg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q56_ingest_dedup" ->
      s"""WITH t AS (SELECT doc_id, lang, substr(source, 4)::INT >= 15 AS is_new,
         |           regexp_split_to_array(text, ' ') tk, lower(text) lt FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |mh AS (SELECT doc_id, j, min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
         |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // 4 AS b,
         |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
         |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
         |          FROM mh GROUP BY doc_id, j // 4),
         |cand AS (SELECT DISTINCT x.doc_id did, y.doc_id cid
         |         FROM bands x JOIN bands y ON x.b = y.b AND x.key = y.key
         |         JOIN t tx ON tx.doc_id = x.doc_id
         |         JOIN t ty ON ty.doc_id = y.doc_id
         |         WHERE tx.is_new AND NOT ty.is_new),
         |cm AS (SELECT did, cid, count(*) cm FROM cand
         |       JOIN sh p ON p.doc_id = did JOIN sh q ON q.doc_id = cid AND q.h = p.h
         |       GROUP BY did, cid),
         |sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
         |nd AS (SELECT DISTINCT did FROM cm JOIN sz x ON x.doc_id = did
         |       JOIN sz y ON y.doc_id = cid
         |       WHERE cm / (x.sz + y.sz - cm) >= 0.5),
         |ex AS (SELECT DISTINCT a.doc_id FROM t a JOIN t b ON a.lt = b.lt
         |       AND NOT b.is_new WHERE a.is_new)
         |SELECT doc_id, lang FROM t WHERE is_new
         |  AND doc_id NOT IN (SELECT did FROM nd)
         |  AND doc_id NOT IN (SELECT doc_id FROM ex)
         |ORDER BY doc_id""".stripMargin,
    "q60_zorder_keys" -> {
      // same 32-term masked-shift sum as ZOrder.morton16 — pure integer
      // arithmetic, so the hashes match bit-for-bit
      val terms = (0 until 16).flatMap(i => Seq(
        s"(((cust_bits >> $i) & 1) << ${2 * i})",
        s"(((day_bits >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""WITH t AS (SELECT o_orderkey, (o_custkey % 65536)::BIGINT AS cust_bits,
         |  (datediff('day', DATE '1992-01-01', o_orderdate::DATE) % 65536)::BIGINT AS day_bits
         |  FROM orders)
         |SELECT o_orderkey, cust_bits, day_bits, ($terms)::BIGINT AS zkey
         |FROM t ORDER BY o_orderkey""".stripMargin
    },
    "q61_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
        |f AS (SELECT doc_id, tk,
        |      CASE WHEN len(tk) >= 5 THEN
        |        list_transform(range(1, len(tk) - 3), i -> array_to_string(tk[i:i+4], ' '))
        |      ELSE []::VARCHAR[] END g FROM t),
        |w AS (SELECT doc_id, len(g)::BIGINT n_5grams,
        |      len(list_distinct(g))::BIGINT n_uniq_5grams, unnest(tk) word FROM f),
        |wc AS (SELECT doc_id, n_5grams, n_uniq_5grams, word, count(*)::BIGINT c
        |       FROM w GROUP BY 1, 2, 3, 4),
        |ds AS (SELECT doc_id, n_5grams, n_uniq_5grams, sum(c)::BIGINT n_words,
        |       count(*)::BIGINT n_uniq_words FROM wc GROUP BY 1, 2, 3),
        |top AS (SELECT doc_id, word, c,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, word) rn FROM wc)
        |SELECT ds.doc_id, n_words, n_uniq_words,
        |       ((n_words - n_uniq_words) * 1000 // n_words)::BIGINT AS dup_word_permille,
        |       top.word AS top_word, top.c AS top_count, n_5grams, n_uniq_5grams,
        |       CASE WHEN n_5grams > 0
        |            THEN (n_5grams - n_uniq_5grams) * 1000 // n_5grams
        |            ELSE 0 END::BIGINT AS dup_5gram_permille
        |FROM ds JOIN top ON top.doc_id = ds.doc_id AND top.rn = 1
        |ORDER BY ds.doc_id""".stripMargin,
    "q62_tfidf_terms" ->
      """WITH w AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) word FROM documents),
        |tf AS (SELECT doc_id, word, count(*)::BIGINT tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, count(*)::BIGINT df FROM tf GROUP BY 1),
        |n AS (SELECT count(*)::BIGINT n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |      tf.tf * ((1000 * n.n_docs) // df.df) AS score
        |      FROM tf JOIN df USING (word) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, word) rank FROM s)
        |SELECT doc_id, rank::BIGINT AS rank, word, tf, df, score::BIGINT AS score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q65_incremental_hourly" ->
      """SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  count(*) AS n,
        |  sum(floor(value * 1000000)::BIGINT)::BIGINT AS sum_micro,
        |  floor(sum(floor(value * 1000000)::BIGINT) / count(*))::BIGINT AS avg_micro
        |FROM events
        |GROUP BY event_type, date_trunc('hour', ts)
        |ORDER BY event_type, hour""".stripMargin,
    // q143: q64's centroid arithmetic + per-vector integer argmin with
    // (d2, label) tie-break; margin from the rank-2 row of the same
    // window order
    "q143_centroid_classify" ->
      """WITH e AS (SELECT vec_id, label, embedding,
        |           unnest(generate_series(1, len(embedding))) i FROM embeddings),
        |c AS (SELECT vec_id, label, i::BIGINT - 1 AS pos,
        |      floor(embedding[i]::DOUBLE * 1000000)::BIGINT vm FROM e),
        |cent AS (SELECT label clabel, pos, floor(sum(vm) / count(*))::BIGINT cm
        |         FROM c GROUP BY 1, 2),
        |d2 AS (SELECT c.vec_id, c.label, cent.clabel,
        |       sum((vm - cm) * (vm - cm))::BIGINT d2
        |       FROM c JOIN cent ON cent.pos = c.pos GROUP BY 1, 2, 3),
        |r AS (SELECT vec_id, label, clabel, d2,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) rn,
        |      lead(d2) OVER (PARTITION BY vec_id ORDER BY d2, clabel) nx
        |      FROM d2)
        |SELECT vec_id, label, clabel AS pred_label, d2 AS d2_micro,
        |       (nx - d2)::BIGINT AS margin_micro,
        |       (label = clabel)::BIGINT AS is_match
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q64_label_centroids" ->
      """WITH e AS (SELECT label, embedding,
        |           unnest(generate_series(1, len(embedding))) i FROM embeddings),
        |c AS (SELECT label, i::BIGINT - 1 AS pos,
        |      floor(embedding[i]::DOUBLE * 1000000)::BIGINT vm FROM e)
        |SELECT label, pos, count(*)::BIGINT n, sum(vm)::BIGINT sum_micro,
        |       floor(sum(vm) / count(*))::BIGINT centroid_micro
        |FROM c GROUP BY 1, 2 ORDER BY label, pos""".stripMargin,
    "q63_source_overlap" ->
      """WITH w AS (SELECT DISTINCT source, word FROM
        |  (SELECT source, unnest(regexp_split_to_array(text, ' ')) word FROM documents)),
        |s AS (SELECT source, count(*)::BIGINT nv FROM w GROUP BY 1),
        |p AS (SELECT a.source src_a, b.source src_b, count(*)::BIGINT inter
        |      FROM w a JOIN w b ON a.word = b.word AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT src_a, src_b, inter, sa.nv AS nv_a, sb.nv AS nv_b,
        |       ((1000 * inter) // (sa.nv + sb.nv - inter))::BIGINT AS jaccard_permille
        |FROM p JOIN s sa ON sa.source = p.src_a JOIN s sb ON sb.source = p.src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "q52_profile_columns" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem UNION ALL
        |  SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT col_name, count(*) AS n, count(*) - count(v) AS n_null,
        |       count(DISTINCT v) AS n_distinct,
        |       round(min(v), 2) AS min_v, round(max(v), 2) AS max_v
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,
    "q53_term_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') tk FROM documents),
        |s AS (SELECT doc_id,
        |        len(list_filter(tk, x -> x = 'hash'))::BIGINT tf_hash,
        |        len(list_filter(tk, x -> x = 'join'))::BIGINT tf_join,
        |        len(list_filter(tk, x -> x = 'vector'))::BIGINT tf_vector
        |      FROM t)
        |SELECT doc_id, tf_hash, tf_join, tf_vector,
        |       (tf_hash * 3 + tf_join * 2 + tf_vector)::BIGINT AS score
        |FROM s WHERE tf_hash * 3 + tf_join * 2 + tf_vector > 0
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q54_sample_upweight" ->
      s"""WITH w(lang, wpm) AS (VALUES ('en', 1000), ('de', 2500), ('es', 1300),
         |                            ('fr', 1300), ('zh', 700)),
         |dd AS (SELECT doc_id, d.lang, ${H("'upsample:' || text")} % 1000 AS skey, wpm
         |       FROM documents d JOIN w ON w.lang = d.lang),
         |c AS (SELECT doc_id, lang,
         |      (wpm // 1000 + CASE WHEN skey < wpm % 1000 THEN 1 ELSE 0 END)::BIGINT n_copies
         |      FROM dd)
         |SELECT doc_id, lang, unnest(generate_series(1, n_copies))::BIGINT AS copy_id
         |FROM c WHERE n_copies > 0 ORDER BY doc_id, copy_id""".stripMargin,
    "q50_sample_stratified" ->
      s"""WITH r(lang, permille) AS (VALUES ('en', 250), ('de', 800), ('es', 800),
         |                                 ('fr', 800), ('zh', 800)),
         |dd AS (SELECT doc_id, lang, ${H("text")} % 1000 AS skey FROM documents)
         |SELECT dd.doc_id, dd.lang, dd.skey FROM dd JOIN r ON r.lang = dd.lang
         |WHERE dd.skey < r.permille ORDER BY dd.doc_id""".stripMargin,
    "q51_pack_windows" ->
      """WITH t AS (SELECT doc_id, lang,
        |           len(string_split(text, ' '))::BIGINT n_tok FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |      coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) prev_tok FROM t)
        |SELECT doc_id, lang, n_tok, (prev_tok // 512)::BIGINT AS window_id,
        |       (prev_tok % 512)::BIGINT AS off_in_win
        |FROM c ORDER BY doc_id""".stripMargin,
    // q106: splitmix64 mix replayed exactly — UBIGINT carries the
    // unsigned 64-bit state (xor/logical-shift are native); the two
    // wrapping multiplications split multiplier and state into 32-bit
    // halves so every product stays under 2^64 and the mod-2^64 sum
    // runs in HUGEINT: (a*b) mod 2^64 = al*bl + 2^32*((al*bh + ah*bl)
    // mod 2^32). Constants are splitmix64's published mixers
    // (0x9e3779b97f4a7c15; 0xbf58476d1ce4e5b9 = 3210233709·2^32 +
    // 484763065; 0x94d049bb133111eb = 2496678331·2^32 + 321982955).
    // Votes/pack/pairing are q24's oracle at 64-bit width; the unsigned
    // signature maps to Spark's signed Long by subtracting 2^64 ≥ 2^63.
    "q106_dedup_simhash64" ->
      s"""WITH th AS (SELECT doc_id, ${H("tok")}::UBIGINT AS h FROM
         |  (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) tok FROM documents)),
         |m0 AS (SELECT doc_id, ((h::HUGEINT + 11400714819323198485) % 18446744073709551616)::UBIGINT z FROM th),
         |m1 AS (SELECT doc_id, xor(z, z >> 30) z FROM m0),
         |m2 AS (SELECT doc_id, (((z % 4294967296)::HUGEINT * 484763065
         |        + 4294967296::HUGEINT * ((((z % 4294967296)::HUGEINT * 3210233709
         |                                   + (z // 4294967296)::HUGEINT * 484763065) % 4294967296))
         |       ) % 18446744073709551616)::UBIGINT z FROM m1),
         |m3 AS (SELECT doc_id, xor(z, z >> 27) z FROM m2),
         |m4 AS (SELECT doc_id, (((z % 4294967296)::HUGEINT * 321982955
         |        + 4294967296::HUGEINT * ((((z % 4294967296)::HUGEINT * 2496678331
         |                                   + (z // 4294967296)::HUGEINT * 321982955) % 4294967296))
         |       ) % 18446744073709551616)::UBIGINT z FROM m3),
         |m5 AS (SELECT doc_id, xor(z, z >> 31) z FROM m4),
         |bits AS (SELECT doc_id, i,
         |         CASE WHEN sum(((z >> i) & 1)::BIGINT * 2 - 1) > 0
         |              THEN (1::UBIGINT << i) ELSE 0::UBIGINT END v
         |         FROM m5, generate_series(0, 63) g(i) GROUP BY doc_id, i),
         |sig AS (SELECT doc_id,
         |        (CASE WHEN sum(v::HUGEINT) >= 9223372036854775808
         |              THEN sum(v::HUGEINT) - 18446744073709551616
         |              ELSE sum(v::HUGEINT) END)::BIGINT s
         |        FROM bits GROUP BY doc_id)
         |SELECT a.doc_id doc_a, b.doc_id doc_b, bit_count(xor(a.s, b.s))::BIGINT AS dist
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 6
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q24_dedup_simhash" ->
      s"""WITH th AS (SELECT doc_id, ${H("tok")} AS h FROM
         |  (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) tok FROM documents)),
         |bits AS (SELECT doc_id, i,
         |         CASE WHEN sum(((h // (1::BIGINT << i)) % 2) * 2 - 1) > 0
         |              THEN (1::BIGINT << i) ELSE 0 END v
         |         FROM th, generate_series(0, 31) g(i) GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, sum(v)::BIGINT s FROM bits GROUP BY doc_id)
         |SELECT a.doc_id doc_a, b.doc_id doc_b, bit_count(xor(a.s, b.s))::BIGINT AS dist
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 6
         |ORDER BY doc_a, doc_b""".stripMargin,
    // candidates = pairs sharing ≥1 of the 4 deterministic LSH buckets
    // (identical plane arithmetic to q27), verified by exact cosine —
    // the oracle reproduces the blocking so the result hash-checks
    "q25_dedup_embedding_cosine" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |sig AS (SELECT vec_id, t,
        |  list_sum(list_transform(generate_series(0, 3), r ->
        |    CASE WHEN list_sum(list_transform(generate_series(0, 63), i ->
        |      (CASE WHEN ((((t*4 + r)*64 + i) * 2654435761) & 65536) != 0
        |            THEN 1.0 ELSE -1.0 END) * v[i + 1])) > 0
        |    THEN (1::BIGINT << r) ELSE 0 END))::BIGINT AS bucket
        |  FROM e, generate_series(0, 3) g(t)),
        |cand AS (SELECT DISTINCT a.vec_id va, b.vec_id vb
        |         FROM sig a JOIN sig b
        |         ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |SELECT va AS vec_a, vb AS vec_b,
        |  round(list_dot_product(x.v, y.v)
        |        / sqrt(list_dot_product(x.v, x.v) * list_dot_product(y.v, y.v)), 6) AS cosine
        |FROM cand JOIN e x ON x.vec_id = va JOIN e y ON y.vec_id = vb
        |WHERE list_dot_product(x.v, y.v)
        |      / sqrt(list_dot_product(x.v, x.v) * list_dot_product(y.v, y.v)) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q26_knn_bruteforce" -> BruteTopkSql,
    "q27_knn_lsh" -> LshTopkSql,
    "q28_text_langid" ->
      """WITH t AS (SELECT doc_id, lang, regexp_split_to_array(text, ' ') tk FROM documents),
        |s AS (SELECT doc_id, lang,
        |  len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT s_en,
        |  len(list_filter(tk, x -> x IN ('der','die','das','und','ist','zu','ein')))::BIGINT s_de,
        |  len(list_filter(tk, x -> x IN ('el','la','de','y','es','un','en')))::BIGINT s_es
        |  FROM t)
        |SELECT doc_id, lang, s_en, s_de, s_es,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
        |       WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "q29_text_quality" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
        |s AS (SELECT doc_id, len(tk)::BIGINT n_tok, len(list_distinct(tk))::BIGINT n_uniq,
        |      len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
        |      FROM t)
        |SELECT doc_id, n_tok,
        |  round(n_uniq / n_tok, 6) AS uniq_ratio,
        |  round(n_stop / n_tok, 6) AS stop_ratio,
        |  round((n_uniq / n_tok) * 0.5 + (n_stop / n_tok) * 0.2
        |        + least(n_tok, 200) / 200.0 * 0.3, 6) AS quality
        |FROM s ORDER BY doc_id""".stripMargin,
    "q30_text_token_stats" ->
      """SELECT doc_id, len(tk)::BIGINT AS n_tok, len(list_distinct(tk))::BIGINT AS n_uniq,
        |  length(text)::BIGINT AS n_chars_m,
        |  list_aggregate(list_transform(tk, x -> length(x)), 'max')::BIGINT AS max_tok_len
        |FROM (SELECT doc_id, text, regexp_split_to_array(text, ' ') tk FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q31_text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, regexp_split_to_array(text, ' ') tk FROM documents)
         |SELECT doc_id, ${H("text")} AS fp,
         |  list_aggregate(list_transform(generate_series(1, len(tk) - 7),
         |    i -> ${H("array_to_string(tk[i:i+7], ' ')")}), 'min')::BIGINT AS fp_win
         |FROM t ORDER BY doc_id""".stripMargin,
    "q32_media_metadata" ->
      s"""WITH t AS (SELECT doc_id, text, ${H("text")} AS h FROM documents)
         |SELECT doc_id, octet_length(text::BLOB)::BIGINT AS byte_len,
         |  (['jpeg', 'png', 'webp'])[(h % 3)::INT + 1] AS format,
         |  320 + (h % 8) * 160 AS width,
         |  240 + (h % 6) * 120 AS height,
         |  1 + octet_length(text::BLOB) % 24 AS n_frames,
         |  0::BIGINT AS sample_rate,
         |  0::BIGINT AS n_channels
         |FROM t ORDER BY doc_id""".stripMargin,
    "q34_orders_rollup" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
        |  grouping_id(strftime(o_orderdate, '%Y-%m'), o_orderstatus)::BIGINT AS gid,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP(strftime(o_orderdate, '%Y-%m'), o_orderstatus)
        |ORDER BY gid, month NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q35_text_scalars" ->
      """SELECT doc_id, upper(substring(text, 1, 20)) AS head20,
        |  length(trim(text))::BIGINT AS n_trim,
        |  replace(lang, 'e', 'E') AS lang_x,
        |  source || ':' || lang AS src_lang,
        |  instr(text, 'the')::BIGINT AS first_the,
        |  right(text, 10) AS tail10
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q36_full_outer" ->
      """SELECT count(*) AS n_rows, count(o_orderkey) AS n_orders,
        |  count(c_custkey) AS n_cust_side,
        |  sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_customers_no_orders,
        |  round(sum(coalesce(o_totalprice, 0.0)), 2) AS total
        |FROM orders FULL OUTER JOIN customer ON o_custkey = c_custkey""".stripMargin,
    // q38 computes the same contract as q26 through the bounded-heap
    // aggregate — the oracle is identical
    "q38_knn_topk_agg" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |s AS (SELECT q.vec_id q_id, n.vec_id neighbor_id,
        |      list_dot_product(q.v, n.v)
        |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
        |      FROM e q, e n WHERE q.vec_id < 10 AND n.vec_id != q.vec_id),
        |r AS (SELECT q_id, neighbor_id, c,
        |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
        |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "q39_orders_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping_id(o_orderstatus, o_orderpriority)::BIGINT AS gid,
        |  count(*) AS n_orders, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q40_running_totals" ->
      """WITH t AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(o_totalprice * 100)::BIGINT AS cents FROM orders),
        |w AS (SELECT o_custkey, o_orderkey,
        |  sum(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS srun,
        |  sum(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s3,
        |  count(*) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS c3
        |  FROM t)
        |SELECT o_custkey, o_orderkey,
        |  srun / 100.0 AS running_total,
        |  ((2 * s3 + c3) // (2 * c3)) / 100.0 AS avg3
        |FROM w
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q41_date_parts" ->
      """SELECT o_orderkey,
        |  extract(year FROM o_orderdate)::BIGINT AS yr,
        |  extract(month FROM o_orderdate)::BIGINT AS mo,
        |  extract(day FROM o_orderdate)::BIGINT AS dom,
        |  extract(quarter FROM o_orderdate)::BIGINT AS qtr,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        |  datediff('day', o_orderdate, DATE '1999-01-01')::BIGINT AS days_to_1999
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q43_event_exact_stats" ->
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  round(quantile_cont(value, 0.5), 6) AS median_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // as-of: the oracle states the semantics directly (max prior view,
    // ties by greatest view id) — same rows the union+window pass emits
    "q44_asof_join" -> AsofOracleSql,
    // identical semantics through the custom physical operator
    "q67_asof_exec" -> AsofOracleSql,
    "q45_range_join_agg" ->
      """WITH c AS (SELECT event_id click_id, user_id, epoch_us(ts) cts
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, epoch_us(ts) vts, value
        |      FROM events WHERE event_type = 'view'),
        |j AS (SELECT c.click_id, c.user_id, v.vts, v.value, c.cts
        |      FROM c LEFT JOIN v ON c.user_id = v.user_id
        |           AND v.vts <= c.cts AND c.cts - v.vts <= 600000000)
        |SELECT click_id, user_id, count(vts) AS n_views,
        |  min(cts - vts) AS min_gap_us, max(value) AS max_view_value
        |FROM j GROUP BY click_id, user_id
        |ORDER BY click_id""".stripMargin,
    "q48_knn_int8" -> Int8TopkSql,
    "q47_text_subwords" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS n_alpha,
        |  len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS n_digit,
        |  len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))::BIGINT AS n_punct,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))::BIGINT AS n_units
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q68_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |              FROM orders),
        |u AS (SELECT o_orderkey,
        |        (round(o_totalprice * 100)::BIGINT * 11 // 10)::DOUBLE / 100.0
        |          AS o_totalprice,
        |        'U' AS o_orderstatus
        |      FROM base WHERE o_orderkey % 7 = 0),
        |i AS (SELECT o_orderkey + 20000000 AS o_orderkey,
        |        1000.0 AS o_totalprice, 'N' AS o_orderstatus
        |      FROM base WHERE o_orderkey % 97 = 0),
        |ch AS (SELECT * FROM u UNION ALL SELECT * FROM i)
        |SELECT coalesce(ch.o_orderkey, base.o_orderkey) AS o_orderkey,
        |  base.o_custkey AS o_custkey,
        |  coalesce(ch.o_totalprice, base.o_totalprice) AS o_totalprice,
        |  coalesce(ch.o_orderstatus, base.o_orderstatus) AS o_orderstatus
        |FROM base FULL OUTER JOIN ch ON base.o_orderkey = ch.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    // gaps-and-islands twin of the native session_window operator: new
    // session at gap >= 30 min (interval-overlap semantics), session
    // end = last event + gap
    "q69_session_windows" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) tus FROM events),
        |s AS (SELECT user_id, tus,
        |      lag(tus) OVER (PARTITION BY user_id ORDER BY tus) prev_us FROM t),
        |f AS (SELECT user_id, tus,
        |      CASE WHEN prev_us IS NULL OR tus - prev_us >= 1800000000
        |           THEN 1 ELSE 0 END new_sess FROM s),
        |g AS (SELECT user_id, tus,
        |      sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sess_id FROM f)
        |SELECT user_id, min(tus) AS session_start_us,
        |  max(tus) + 1800000000 AS session_end_us,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, sess_id
        |ORDER BY user_id, session_start_us""".stripMargin,
    "q70_grouping_sets" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
        |  grouping_id(strftime(o_orderdate, '%Y-%m'), o_orderstatus)::BIGINT AS gid,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((strftime(o_orderdate, '%Y-%m')), (o_orderstatus), ())
        |ORDER BY gid, month NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q71_above_cust_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, n_cust_orders,
        |  (sum_cents // n_cust_orders)::BIGINT AS avg_cents
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    (SELECT count(*) FROM orders i
        |     WHERE i.o_custkey = o.o_custkey) AS n_cust_orders,
        |    (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
        |     FROM orders i
        |     WHERE i.o_custkey = o.o_custkey) AS sum_cents
        |  FROM orders o) t
        |WHERE 2 * cents * n_cust_orders > 3 * sum_cents
        |ORDER BY o_orderkey""".stripMargin,
    "q72_interval_pairs" ->
      """WITH c AS (SELECT event_id click_id, user_id, epoch_us(ts) cts
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id view_id, user_id, epoch_us(ts) vts
        |      FROM events WHERE event_type = 'view')
        |SELECT c.click_id, c.user_id, v.view_id, c.cts - v.vts AS gap_us
        |FROM c JOIN v ON c.user_id = v.user_id
        |     AND v.vts <= c.cts AND c.cts - v.vts <= 600000000
        |ORDER BY click_id, view_id""".stripMargin,
    "q73_customer_deciles" ->
      """WITH s AS (SELECT o_custkey,
        |           sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents,
        |           count(*) AS n_orders FROM orders GROUP BY o_custkey),
        |w AS (SELECT o_custkey, cents, n_orders,
        |      ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile,
        |      round(percent_rank() OVER (ORDER BY cents DESC, o_custkey), 6) AS pct_rank,
        |      lead(cents) OVER (ORDER BY cents DESC, o_custkey) AS next_cents,
        |      lag(cents) OVER (ORDER BY cents DESC, o_custkey) AS prev_cents
        |      FROM s)
        |SELECT o_custkey, cents / 100.0 AS total_spent, n_orders,
        |  decile::BIGINT AS decile, pct_rank,
        |  next_cents / 100.0 AS next_spent, prev_cents / 100.0 AS prev_spent
        |FROM w ORDER BY o_custkey""".stripMargin,
    "q75_scd2_customers" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w::BIGINT AS version,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
        |  o_orderstatus, o_totalprice
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    "q76_important_parts" ->
      """SELECT l_partkey, n_items,
        |  CAST(part_cents AS DOUBLE) / 100.0 AS value
        |FROM (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS part_cents,
        |    count(*) AS n_items
        |  FROM lineitem GROUP BY l_partkey) p
        |WHERE part_cents * 2000 >
        |  (SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |   FROM lineitem)
        |ORDER BY l_partkey""".stripMargin,
    // identity oracle: the JSON round trip must hand back exactly the
    // source columns (see Queries.jsonRoundTrip)
    "q77_json_roundtrip" ->
      """SELECT doc_id, lang AS j_lang, n_chars AS j_chars, source AS j_source
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q78_token_positions" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |           FROM documents WHERE doc_id < 50)
        |SELECT doc_id, (i - 1)::BIGINT AS pos, tk[i] AS token
        |FROM t, unnest(generate_series(1, len(tk))) g(i)
        |ORDER BY doc_id, pos""".stripMargin,
    "q79_cdc_apply" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |              FROM orders),
        |u1 AS (SELECT o_orderkey,
        |       (round(o_totalprice * 100)::BIGINT + 100000)::DOUBLE / 100.0
        |         AS o_totalprice,
        |       'U1' AS o_orderstatus, 'U' AS op, 1::BIGINT AS seq
        |       FROM base WHERE o_orderkey % 5 = 0),
        |d2 AS (SELECT o_orderkey, NULL::DOUBLE, NULL::VARCHAR, 'D', 2::BIGINT
        |       FROM base WHERE o_orderkey % 15 = 0),
        |u3 AS (SELECT o_orderkey,
        |       (round(o_totalprice * 100)::BIGINT * 2)::DOUBLE / 100.0,
        |       'U3', 'U', 3::BIGINT
        |       FROM base WHERE o_orderkey % 25 = 0),
        |ch AS (SELECT * FROM u1 UNION ALL SELECT * FROM d2
        |       UNION ALL SELECT * FROM u3),
        |latest AS (SELECT * FROM (
        |  SELECT ch.*, row_number() OVER (PARTITION BY o_orderkey
        |                                  ORDER BY seq DESC) rn FROM ch)
        |  WHERE rn = 1),
        |ups AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        |        FROM latest WHERE op = 'U'),
        |dels AS (SELECT o_orderkey FROM latest WHERE op = 'D'),
        |merged AS (
        |  SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    b.o_custkey AS o_custkey,
        |    coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice,
        |    coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus
        |  FROM base b FULL OUTER JOIN ups u ON b.o_orderkey = u.o_orderkey)
        |SELECT m.* FROM merged m
        |WHERE m.o_orderkey NOT IN (SELECT o_orderkey FROM dels)
        |ORDER BY o_orderkey""".stripMargin,
    "q80_fuzzy_pairs" ->
      """WITH t AS (SELECT doc_id, lang, substring(text, 1, 30) head30,
        |           regexp_split_to_array(text, ' ')[1] tok0,
        |           (len(regexp_split_to_array(text, ' ')) // 10)::BIGINT len_band
        |           FROM documents)
        |SELECT a.doc_id doc_a, b.doc_id doc_b,
        |  levenshtein(a.head30, b.head30)::BIGINT AS edit_dist
        |FROM t a JOIN t b ON a.lang = b.lang AND a.tok0 = b.tok0
        |     AND a.len_band = b.len_band AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head30, b.head30) <= 20
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q81_array_ops" ->
      """WITH t AS (SELECT doc_id,
        |           list_distinct(regexp_split_to_array(text, ' ')) tk
        |           FROM documents)
        |SELECT doc_id, len(tk)::BIGINT AS n_uniq,
        |  array_to_string(list_sort(tk)[1:3], '|') AS head3_sorted,
        |  len(list_intersect(tk, ['the','a','of','and','is','to','in']))::BIGINT
        |    AS n_stop_uniq,
        |  len(list_distinct(list_concat(tk,
        |    ['the','a','of','and','is','to','in'])))::BIGINT AS n_union_stop,
        |  len(list_intersect(tk, ['the','a','of','and','is','to','in'])) > 0
        |    AS has_stop,
        |  list_sort(tk)[-1] AS max_token
        |FROM t ORDER BY doc_id""".stripMargin,
    "q82_word_map" ->
      """SELECT doc_id, word, count(*) AS n
        |FROM (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) word
        |      FROM documents WHERE doc_id < 50)
        |GROUP BY doc_id, word
        |ORDER BY doc_id, word""".stripMargin,
    "q84_set_ops" ->
      """WITH ho AS (SELECT o_custkey AS custkey FROM orders
        |            WHERE o_totalprice > 300000.0),
        |bb AS (SELECT c_custkey AS custkey FROM customer
        |       WHERE c_acctbal > 5000.0)
        |SELECT custkey, 'both' AS side FROM (SELECT custkey FROM ho
        |  INTERSECT SELECT custkey FROM bb)
        |UNION ALL
        |SELECT custkey, 'balance_only' AS side FROM (SELECT custkey FROM bb
        |  EXCEPT SELECT custkey FROM ho)
        |ORDER BY side, custkey""".stripMargin,
    "q85_string_transforms" ->
      """SELECT doc_id,
        |  substring(regexp_replace(text, '[0-9]+', '#', 'g'), 1, 40) AS masked40,
        |  reverse(substring(text, 1, 10)) AS rev10,
        |  lpad(n_chars::VARCHAR, 8, '0') AS padded,
        |  split_part(text, ' ', 1) AS first_word,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q86_window_values" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER wf AS first_price,
        |  last_value(o_totalprice) OVER wf AS last_price,
        |  nth_value(o_orderkey, 2) OVER wf AS second_key,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // identity oracle like q77: variant extraction must hand back the
    // source columns; absent path → null
    "q87_variant_extract" ->
      """SELECT doc_id, lang AS v_lang, n_chars::BIGINT AS v_chars,
        |  source AS v_source, NULL::VARCHAR AS v_missing
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q88_pii_redact" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' contact: user' || doc_id || '@example.com or 555-' ||
        |  lpad((doc_id % 10000)::VARCHAR, 4, '0') AS raw FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(raw, '555-[0-9]{4}'))::BIGINT AS n_phones,
        |  right(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g'), 40) AS tail40
        |FROM t ORDER BY doc_id""".stripMargin,
    "q89_chunk_tokens" -> {
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
         |           FROM documents),
         |s AS (SELECT doc_id, tk, len(tk)::BIGINT n_tok,
         |      unnest(generate_series(0, GREATEST(len(tk) - 1, 0), 40)) tok_start
         |      FROM t),
         |f AS (SELECT * FROM s WHERE tok_start = 0 OR tok_start - 40 + 50 < n_tok)
         |SELECT doc_id, (tok_start // 40)::BIGINT AS chunk_id,
         |  tok_start::BIGINT AS tok_start,
         |  LEAST(50, n_tok - tok_start)::BIGINT AS n_in_chunk,
         |  ${H("array_to_string(tk[tok_start + 1 : tok_start + 50], ' ')")} AS chunk_hash
         |FROM f ORDER BY doc_id, chunk_id""".stripMargin
    },
    "q91_exact_moments" ->
      """WITH t AS (SELECT event_type, floor(value * 1000)::BIGINT AS x,
        |           user_id AS y FROM events),
        |a AS (SELECT event_type, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |      sum(y)::BIGINT AS sy,
        |      sum(x::HUGEINT * x::HUGEINT) AS sxx,
        |      sum(y::HUGEINT * y::HUGEINT) AS syy,
        |      sum(x::HUGEINT * y::HUGEINT) AS sxy
        |      FROM t GROUP BY event_type)
        |SELECT event_type, n, sx,
        |  round(((n * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE)
        |        / (n::DOUBLE * n::DOUBLE) / 1000000.0, 6) AS var_pop,
        |  round(((n * sxy - sx::HUGEINT * sy::HUGEINT)::DOUBLE)
        |        / sqrt((n * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE
        |             * (n * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE), 6) AS corr_xy
        |FROM a ORDER BY event_type""".stripMargin,
    "q92_paged_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin,
    "q93_hierarchy_rollup" ->
      """WITH RECURSIVE spend AS (
        |  SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY o_custkey),
        |anc AS (
        |  SELECT o_custkey AS custkey, o_custkey AS anc_key FROM spend
        |  UNION ALL
        |  SELECT custkey, anc_key // 10 AS anc_key FROM anc WHERE anc_key > 0)
        |SELECT anc_key AS group_key, count(*) AS n_desc,
        |  CAST(sum(s.cents) AS DOUBLE) / 100.0 AS total_spent
        |FROM anc a JOIN spend s ON s.o_custkey = a.custkey
        |GROUP BY anc_key
        |ORDER BY group_key""".stripMargin,
    "q94_collation_groups" ->
      """WITH t AS (SELECT doc_id, lang,
        |  CASE doc_id % 3 WHEN 0 THEN upper(lang)
        |       WHEN 1 THEN upper(substring(lang, 1, 1)) || lower(substring(lang, 2))
        |       ELSE lang END AS mixed
        |  FROM documents)
        |SELECT lower(mixed) AS lang_ci, count(*) AS n_docs,
        |  count(DISTINCT mixed) AS n_case_variants
        |FROM t GROUP BY lower(mixed) ORDER BY lang_ci""".stripMargin,
    "q95_range_frame" ->
      """WITH t AS (SELECT o_custkey, o_orderkey,
        |  datediff('day', DATE '1992-01-01', o_orderdate::DATE)::BIGINT AS day,
        |  round(o_totalprice * 100)::BIGINT AS cents FROM orders)
        |SELECT o_custkey, o_orderkey, day,
        |  sum(cents) OVER w / 100.0 AS spend_30d,
        |  count(*) OVER w AS n_30d
        |FROM t
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q97_safe_arith" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE n_chars / (doc_id % 5) END AS div_maybe,
        |  TRY_CAST(CASE WHEN doc_id % 3 = 0 THEN n_chars::VARCHAR
        |           ELSE substring(text, 1, 3) END AS BIGINT) AS cast_maybe,
        |  regexp_split_to_array(text, ' ')[50] AS elem_maybe,
        |  TRY_CAST(lang AS BIGINT) AS lang_num
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q98_url_parts" ->
      """SELECT doc_id,
        |  source || '.example.com' AS host,
        |  '/docs/' || lang AS path,
        |  'id=' || doc_id AS query,
        |  'https' AS protocol
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q99_repeated_tokens" ->
      """WITH w AS (SELECT doc_id, len(regexp_split_to_array(text, ' '))::BIGINT n_tok,
        |           unnest(regexp_split_to_array(text, ' ')) word
        |           FROM documents WHERE doc_id < 100),
        |c AS (SELECT doc_id, n_tok, word, count(*)::BIGINT c
        |      FROM w GROUP BY doc_id, n_tok, word HAVING count(*) >= 2)
        |SELECT doc_id, word, c AS n, (c * 1000 // n_tok)::BIGINT AS permille
        |FROM c ORDER BY doc_id, word""".stripMargin,
    "q100_monthly_spine" ->
      """WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
        |           round(o_totalprice * 100)::BIGINT AS cents FROM orders),
        |actual AS (SELECT o_custkey, m, count(*)::BIGINT n_orders,
        |           sum(cents)::BIGINT cents FROM o GROUP BY o_custkey, m),
        |bounds AS (SELECT o_custkey, min(m) m0, max(m) m1 FROM o GROUP BY o_custkey),
        |spine AS (SELECT o_custkey,
        |          unnest(generate_series(m0, m1, INTERVAL 1 MONTH)) AS m
        |          FROM bounds)
        |SELECT s.o_custkey, strftime(s.m, '%Y-%m') AS month,
        |  coalesce(a.n_orders, 0) AS n_orders,
        |  coalesce(a.cents, 0) / 100.0 AS total
        |FROM spine s LEFT JOIN actual a ON a.o_custkey = s.o_custkey AND a.m = s.m
        |ORDER BY s.o_custkey, month""".stripMargin,
    // the bitmap pipeline is exact, so the oracle is the plain
    // distinct count it must equal
    "q101_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q102_xml_roundtrip" ->
      """SELECT doc_id, doc_id AS x_id, lang AS x_lang,
        |  n_chars::BIGINT AS x_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // DuckDB has no width_bucket: the oracle replays Spark's exact
    // formula floor((v-min)*numBucket/(max-min))+1 IN THE SAME
    // OPERATION ORDER (multiply then divide — a different order can
    // floor differently half-an-ulp from a boundary), and mirrors
    // Spark's NULL-on-NaN explicitly (DuckDB sorts NaN above all
    // values, so a bare >= guard would send NaN to the top bucket)
    "q103_value_histogram" ->
      """SELECT event_type,
        |  (CASE WHEN isnan(value) THEN NULL
        |        WHEN value < 0.0 THEN 0
        |        WHEN value >= 100.0 THEN 21
        |        ELSE floor(value * 20 / 100.0) + 1 END)::BIGINT AS bucket,
        |  count(*) AS n
        |FROM events GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,
    "q104_unpivot_measures" ->
      """WITH u AS (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS col_name,
        |         l_quantity AS v FROM lineitem UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |SELECT col_name, count(*) AS n,
        |  sum(round(v * 100)::BIGINT)::BIGINT / 100.0 AS sum_v,
        |  round(min(v), 2) AS min_v, round(max(v), 2) AS max_v
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,
    "q105_lang_rollup" ->
      """SELECT source,
        |  string_agg(lang, ',' ORDER BY lang) AS langs,
        |  count(*) AS n_langs
        |FROM (SELECT DISTINCT source, lang FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,
    "q42_pivot_by_status" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_F,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_O,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_P,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2) AS rev_F,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END), 2) AS rev_O,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END), 2) AS rev_P
        |FROM orders
        |GROUP BY strftime(o_orderdate, '%Y-%m')
        |ORDER BY month""".stripMargin,
    // q144: same regex cascade, RE2 side. Counts read the string as the
    // previous family left it, exactly like the plan.
    "q144_pii_scrub" ->
      s"""WITH s AS (SELECT event_id, event_type, props,
         |  regexp_replace(props, '${Curation.PiiEmailRe}', '<EMAIL>', 'g') AS s1
         |  FROM events),
         |s2t AS (SELECT *, regexp_replace(s1, '${Curation.PiiIpRe}', '<IP>', 'g') AS s2
         |        FROM s),
         |s3t AS (SELECT *, regexp_replace(s2, '${Curation.PiiPhoneRe}', '<PHONE>', 'g') AS s3
         |        FROM s2t)
         |SELECT event_id, event_type,
         |  len(regexp_extract_all(props, '${Curation.PiiEmailRe}'))::BIGINT AS n_email,
         |  len(regexp_extract_all(s1, '${Curation.PiiIpRe}'))::BIGINT AS n_ipv4,
         |  len(regexp_extract_all(s2, '${Curation.PiiPhoneRe}'))::BIGINT AS n_phone,
         |  len(regexp_extract_all(s3, '${Curation.PiiNumRe}'))::BIGINT AS n_num,
         |  (length(props) - length(regexp_replace(regexp_replace(regexp_replace(
         |     regexp_replace(props, '${Curation.PiiEmailRe}', '', 'g'),
         |     '${Curation.PiiIpRe}', '', 'g'), '${Curation.PiiPhoneRe}', '', 'g'),
         |     '${Curation.PiiNumRe}', '', 'g')))::BIGINT AS chars_redacted,
         |  regexp_replace(s3, '${Curation.PiiNumRe}', '<NUM>', 'g') AS redacted
         |FROM s3t ORDER BY event_id""".stripMargin,
    // q145: chunk rows via unnest(generate_series), keeper = min packed
    // (doc_id, chunk_idx) per chunk hash — mirrors Dedup.chunkDedup.
    "q145_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |x AS (SELECT doc_id, tk,
         |      unnest(generate_series(0, (len(tk) + 15) // 16 - 1)) AS cidx FROM t),
         |c AS (SELECT doc_id, cidx,
         |      len(tk[cidx*16+1 : cidx*16+16])::BIGINT AS ctok,
         |      ${H("array_to_string(tk[cidx*16+1 : cidx*16+16], ' ')")} AS h,
         |      doc_id * 1048576 + cidx AS ckey FROM x),
         |k AS (SELECT h, min(ckey) AS keep_key FROM c GROUP BY h)
         |SELECT c.doc_id, count(*)::BIGINT AS n_chunks,
         |  sum(CASE WHEN ckey = keep_key THEN 1 ELSE 0 END)::BIGINT AS kept_chunks,
         |  (count(*) - sum(CASE WHEN ckey = keep_key THEN 1 ELSE 0 END))::BIGINT AS dup_chunks,
         |  sum(ctok)::BIGINT AS n_tokens,
         |  sum(CASE WHEN ckey = keep_key THEN ctok ELSE 0 END)::BIGINT AS kept_tokens
         |FROM c JOIN k USING (h)
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    // q146: recall@5 against the SAME three oracle plans the driver
    // checks individually (q26/q48/q27 SQL embedded verbatim).
    "q146_quant_recall" ->
      s"""WITH gt AS (SELECT q_id, neighbor_id FROM ($BruteTopkSql)),
         |i8 AS (SELECT q_id, neighbor_id FROM ($Int8TopkSql)),
         |ls AS (SELECT q_id, neighbor_id FROM ($LshTopkSql)),
         |g AS (SELECT q_id, count(*)::BIGINT AS n_gt FROM gt GROUP BY q_id),
         |h8 AS (SELECT gt.q_id, count(*)::BIGINT AS h FROM gt
         |       JOIN i8 ON gt.q_id = i8.q_id AND gt.neighbor_id = i8.neighbor_id
         |       GROUP BY gt.q_id),
         |hl AS (SELECT gt.q_id, count(*)::BIGINT AS h FROM gt
         |       JOIN ls ON gt.q_id = ls.q_id AND gt.neighbor_id = ls.neighbor_id
         |       GROUP BY gt.q_id)
         |SELECT g.q_id, g.n_gt,
         |  coalesce(h8.h, 0)::BIGINT AS hits_int8,
         |  round(coalesce(h8.h, 0) / g.n_gt, 6) AS recall_int8,
         |  coalesce(hl.h, 0)::BIGINT AS hits_lsh,
         |  round(coalesce(hl.h, 0) / g.n_gt, 6) AS recall_lsh
         |FROM g LEFT JOIN h8 ON g.q_id = h8.q_id LEFT JOIN hl ON g.q_id = hl.q_id
         |ORDER BY g.q_id""".stripMargin,
    // q147: q134's integer milli-score, best-15 per source by
    // (score desc, doc_id) — the window replays the bounded heap.
    "q147_source_caps" ->
      """WITH t AS (SELECT doc_id, source, n_chars,
        |           regexp_split_to_array(text, ' ') tk FROM documents),
        |s AS (SELECT doc_id, source, n_chars, len(tk)::BIGINT n_tok,
        |      len(list_distinct(tk))::BIGINT n_uniq,
        |      len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
        |      FROM t),
        |sc AS (SELECT doc_id, source, n_chars,
        |       ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
        |        + (300 * least(n_tok, 200)) // 200)::BIGINT AS score_milli FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY score_milli DESC, doc_id)::BIGINT AS rn FROM sc),
        |ks AS (SELECT source, count(*)::BIGINT kept_docs, sum(n_chars)::BIGINT kept_chars,
        |       min(score_milli)::BIGINT cap_score_milli FROM r WHERE rn <= 15 GROUP BY source),
        |a AS (SELECT source, count(*)::BIGINT n_docs, sum(n_chars)::BIGINT n_chars_total
        |      FROM sc GROUP BY source)
        |SELECT a.source, a.n_docs, ks.kept_docs,
        |  (a.n_docs - ks.kept_docs)::BIGINT AS dropped_docs,
        |  a.n_chars_total, ks.kept_chars,
        |  ((1000 * ks.kept_docs) // a.n_docs)::BIGINT AS retention_permille,
        |  ks.cap_score_milli
        |FROM a JOIN ks ON a.source = ks.source ORDER BY a.source""".stripMargin,
    // q148: fixed-point NB likelihoods term-for-term; argmax ties →
    // lang asc (the window ORDER BY mirrors min(struct(-score, l))).
    "q148_nb_lang_classify" -> NbClassifySql,
    // q149: distinct 8-gram sets (q31's gram unit), first holder =
    // min doc_id per hash — mirrors Dedup.docNovelty.
    "q149_doc_novelty" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |g AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+7], ' ')")} AS h
         |      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) i FROM t)),
         |f AS (SELECT h, min(doc_id) AS first_doc FROM g GROUP BY h)
         |SELECT g.doc_id, count(*)::BIGINT AS n_grams,
         |  sum(CASE WHEN first_doc = g.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
         |  ((1000 * sum(CASE WHEN first_doc = g.doc_id THEN 1 ELSE 0 END))
         |   // count(*))::BIGINT AS novelty_permille
         |FROM g JOIN f USING (h)
         |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // q150: distinct (source, chunk-hash) before the pair join; a
    // chunk in > 16 sources leaves the index (boilerplate cap).
    "q150_cross_source_dup" ->
      s"""WITH t AS (SELECT doc_id, source, regexp_split_to_array(text, ' ') tk
         |           FROM documents),
         |x AS (SELECT doc_id, source, tk,
         |      unnest(generate_series(0, (len(tk) + 15) // 16 - 1)) AS cidx FROM t),
         |c AS (SELECT DISTINCT source,
         |      ${H("array_to_string(tk[cidx*16+1 : cidx*16+16], ' ')")} AS h FROM x),
         |ps AS (SELECT source, count(*)::BIGINT sz FROM c GROUP BY source),
         |keep AS (SELECT h FROM c GROUP BY h HAVING count(*) <= 16),
         |cc AS (SELECT c.source, c.h FROM c JOIN keep USING (h)),
         |sh AS (SELECT a.source src_a, b.source src_b, count(*)::BIGINT shared_chunks
         |       FROM cc a JOIN cc b ON a.h = b.h AND a.source < b.source
         |       GROUP BY 1, 2)
         |SELECT sh.src_a, sh.src_b, sh.shared_chunks, x1.sz AS sa, x2.sz AS sb,
         |  ((1000 * sh.shared_chunks) // least(x1.sz, x2.sz))::BIGINT AS overlap_permille
         |FROM sh JOIN ps x1 ON x1.source = sh.src_a JOIN ps x2 ON x2.source = sh.src_b
         |ORDER BY sh.src_a, sh.src_b""".stripMargin,
    // q151: cumulative over the bounded (lang, len) histogram; pK =
    // smallest len with cum >= ceil(n·K/100).
    "q151_length_percentiles" ->
      """WITH s AS (SELECT lang, len(regexp_split_to_array(text, ' '))::BIGINT n_tok
        |           FROM documents),
        |h AS (SELECT lang, n_tok, count(*)::BIGINT c FROM s GROUP BY 1, 2),
        |r AS (SELECT *,
        |      sum(c) OVER (PARTITION BY lang ORDER BY n_tok
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT cum,
        |      sum(c) OVER (PARTITION BY lang)::BIGINT n FROM h)
        |SELECT lang, max(n)::BIGINT AS n_docs,
        |  min(n_tok) AS min_tok, max(n_tok) AS max_tok,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN n_tok END)::BIGINT AS p50_tok,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN n_tok END)::BIGINT AS p90_tok,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN n_tok END)::BIGINT AS p99_tok
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    // q152: the q49 closure + the q111 hash split; every doc takes
    // its cluster representative's split.
    "q152_leak_safe_split" ->
      s"""WITH $NearDupClusterCte,
         |sp AS (SELECT doc_id, CASE WHEN ${H("'split:' || text")} % 1000 < 980 THEN 'train'
         |       WHEN ${H("'split:' || text")} % 1000 < 990 THEN 'val'
         |       ELSE 'test' END AS split FROM documents)
         |SELECT l.doc_id, sp.split AS orig_split, l.cluster_id, cn.cluster_n,
         |  rp.split AS final_split,
         |  (CASE WHEN sp.split != rp.split THEN 1 ELSE 0 END)::BIGINT AS moved
         |FROM lbl l JOIN cn ON cn.cluster_id = l.cluster_id
         |JOIN sp ON sp.doc_id = l.doc_id
         |JOIN sp rp ON rp.doc_id = l.cluster_id
         |ORDER BY l.doc_id""".stripMargin,
    // q153: the q136 Lloyd chain, then per-cluster integer mean and
    // row-local ratio/flag.
    "q153_embed_outliers" ->
      s"""WITH ${lloydCte(8)},
         |st AS (SELECT cid, (sum(d2) // count(*))::BIGINT AS mean_d2 FROM a2 GROUP BY cid)
         |SELECT a2.vec_id, a2.cid, a2.d2 AS dist_sq_micro, st.mean_d2,
         |  ((1000 * a2.d2) // greatest(st.mean_d2, 1))::BIGINT AS ratio_permille,
         |  (CASE WHEN (1000 * a2.d2) // greatest(st.mean_d2, 1) >= 2500
         |        THEN 1 ELSE 0 END)::BIGINT AS is_outlier
         |FROM a2 JOIN st USING (cid) ORDER BY a2.vec_id""".stripMargin,
    // q154: the q49 closure + the q134 integer quality; per-cluster
    // argmax (score desc, doc_id) picks the canonical survivor.
    "q154_canonical_docs" ->
      s"""WITH $NearDupClusterCte,
         |tq AS (SELECT doc_id, n_chars, regexp_split_to_array(text, ' ') tk FROM documents),
         |sq AS (SELECT doc_id, n_chars, len(tk)::BIGINT n_tok,
         |       len(list_distinct(tk))::BIGINT n_uniq,
         |       len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
         |       FROM tq),
         |scq AS (SELECT doc_id, n_chars,
         |        ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
         |         + (300 * least(n_tok, 200)) // 200)::BIGINT AS score_milli FROM sq),
         |jq AS (SELECT l.doc_id, l.cluster_id, sc.n_chars, sc.score_milli
         |       FROM lbl l JOIN scq sc ON sc.doc_id = l.doc_id),
         |rq AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |        ORDER BY score_milli DESC, doc_id) rn FROM jq),
         |ag AS (SELECT cluster_id, count(*)::BIGINT cluster_n, sum(n_chars)::BIGINT chars_total
         |       FROM jq GROUP BY cluster_id)
         |SELECT rq.cluster_id, rq.doc_id AS canonical_id,
         |  rq.score_milli AS canonical_score_milli,
         |  ag.cluster_n, (ag.cluster_n - 1)::BIGINT AS dropped_docs,
         |  (ag.chars_total - rq.n_chars)::BIGINT AS chars_saved
         |FROM rq JOIN ag ON ag.cluster_id = rq.cluster_id
         |WHERE rq.rn = 1 ORDER BY rq.cluster_id""".stripMargin,
    // q155: corpus membership = distinct chunk hashes of the standing
    // half (the persisted index's content); the batch left-joins it.
    "q155_ingest_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, substr(source, 4)::INT >= 15 AS is_new,
         |           regexp_split_to_array(text, ' ') tk FROM documents),
         |x AS (SELECT doc_id, is_new, tk,
         |      unnest(generate_series(0, (len(tk) + 15) // 16 - 1)) AS cidx FROM t),
         |c AS (SELECT doc_id, is_new,
         |      len(tk[cidx*16+1 : cidx*16+16])::BIGINT AS ctok,
         |      ${H("array_to_string(tk[cidx*16+1 : cidx*16+16], ' ')")} AS h FROM x),
         |ci AS (SELECT DISTINCT h FROM c WHERE NOT is_new),
         |j AS (SELECT c.doc_id, c.ctok, (ci.h IS NOT NULL) AS dup
         |      FROM c LEFT JOIN ci ON ci.h = c.h WHERE c.is_new)
         |SELECT doc_id, count(*)::BIGINT AS n_chunks,
         |  sum(CASE WHEN dup THEN 1 ELSE 0 END)::BIGINT AS corpus_dup_chunks,
         |  (count(*) - sum(CASE WHEN dup THEN 1 ELSE 0 END))::BIGINT AS fresh_chunks,
         |  sum(ctok)::BIGINT AS n_tokens,
         |  sum(CASE WHEN NOT dup THEN ctok ELSE 0 END)::BIGINT AS fresh_tokens,
         |  ((1000 * sum(CASE WHEN dup THEN 1 ELSE 0 END)) // count(*))::BIGINT AS dup_permille
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q156: the 64-vector eval carve is the TOP-64 by salted content
    // hash (deterministic, size-fixed); flags replay q25's exact
    // double cosine; best match = (cos desc, eval_id asc).
    "q156_embed_decontam" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |ev AS (SELECT vec_id AS eval_id, v FROM e
         |       ORDER BY ${H("'ed:' || vec_id")}, vec_id LIMIT 64),
         |s AS (SELECT e.vec_id, ev.eval_id,
         |      list_dot_product(e.v, ev.v)
         |      / sqrt(list_dot_product(e.v, e.v) * list_dot_product(ev.v, ev.v)) c
         |      FROM e, ev
         |      WHERE e.vec_id NOT IN (SELECT eval_id FROM ev)),
         |f AS (SELECT vec_id, eval_id, c,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, eval_id) rn
         |      FROM s WHERE c >= 0.4)
         |SELECT vec_id, (SELECT count(*) FROM f g
         |                WHERE g.vec_id = f.vec_id)::BIGINT AS n_eval_hits,
         |  eval_id, round(c, 6) AS cosine
         |FROM f WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // q157: exact isqrt = floor(sqrt(double)) with the one-step
    // correction both ways (IEEE sqrt is correctly rounded, so the
    // corrected integer is exact in both engines).
    "q157_temperature_mix" ->
      """WITH inv AS (SELECT source,
        |       sum(len(regexp_split_to_array(text, ' ')))::BIGINT AS n_tokens
        |       FROM documents GROUP BY 1),
        |w0 AS (SELECT source, n_tokens,
        |       floor(sqrt(n_tokens::DOUBLE))::BIGINT AS s0 FROM inv),
        |w1 AS (SELECT source, n_tokens,
        |       CASE WHEN s0 * s0 > n_tokens THEN s0 - 1 ELSE s0 END AS s1 FROM w0),
        |wt AS (SELECT source, n_tokens,
        |       CASE WHEN (s1 + 1) * (s1 + 1) <= n_tokens THEN s1 + 1 ELSE s1 END AS w
        |       FROM w1),
        |t AS (SELECT sum(w)::BIGINT AS tw, sum(n_tokens)::BIGINT AS tn FROM wt)
        |SELECT source, n_tokens, w::BIGINT AS weight,
        |  ((1000 * w) // tw)::BIGINT AS share_pm,
        |  ((tn * w) // tw)::BIGINT AS tokens_drawn,
        |  ((1000 * ((tn * w) // tw)) // n_tokens)::BIGINT AS epochs_milli
        |FROM wt, t ORDER BY source""".stripMargin,
    // q158: the q136 Lloyd CTEs verbatim, then the per-cell top-4 by
    // (d2, vec_id) — the oracle's window sort equals the bounded heap.
    "q158_cluster_prototypes" ->
      s"""WITH ${lloydCte(8)},
         |r AS (SELECT cid, vec_id, d2,
         |      row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) rn FROM a2)
         |SELECT cid, rn::BIGINT AS rank, vec_id, d2 AS dist_sq_micro
         |FROM r WHERE rn <= 4 ORDER BY cid, rank""".stripMargin,
    // q159: same integer bucket rule; first-seen = min bucket per
    // (lang, token); cumulative over the ≤20-row per-lang curve.
    "q159_vocab_growth" ->
      """WITH m AS (SELECT max(doc_id) AS mx FROM documents),
        |occ AS (SELECT lang,
        |        least(19, (doc_id * 20) // (mx + 1))::BIGINT AS bucket,
        |        unnest(regexp_split_to_array(text, ' ')) AS tok
        |        FROM documents, m),
        |g AS (SELECT lang, bucket, tok, count(*)::BIGINT AS n
        |      FROM occ GROUP BY 1, 2, 3),
        |vol AS (SELECT lang, bucket, sum(n)::BIGINT AS bucket_tokens
        |        FROM g GROUP BY 1, 2),
        |fresh AS (SELECT lang, bucket, count(*)::BIGINT AS new_types FROM (
        |            SELECT lang, tok, min(bucket) AS bucket FROM g GROUP BY 1, 2)
        |          GROUP BY 1, 2)
        |SELECT v.lang, v.bucket,
        |  coalesce(f.new_types, 0)::BIGINT AS new_types, v.bucket_tokens,
        |  sum(coalesce(f.new_types, 0)) OVER
        |    (PARTITION BY v.lang ORDER BY v.bucket)::BIGINT AS cum_types,
        |  sum(v.bucket_tokens) OVER
        |    (PARTITION BY v.lang ORDER BY v.bucket)::BIGINT AS cum_tokens
        |FROM vol v LEFT JOIN fresh f ON f.lang = v.lang AND f.bucket = v.bucket
        |ORDER BY v.lang, v.bucket""".stripMargin,
    // q160: the q27 ±1 hyperplane arithmetic with the projection VALUES
    // kept (list_transform product + sequential list_sum — the same
    // fold the sign test already proves bit-identical), floor-scaled
    // to micro units at the boundary.
    "q160_rp_project" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |p AS (SELECT vec_id, j::BIGINT AS pdim,
        |  list_sum(list_transform(generate_series(0, 63), i ->
        |    (CASE WHEN (((j*64 + i) * 2654435761) & 65536) != 0
        |          THEN 1.0 ELSE -1.0 END) * v[i + 1])) AS pr
        |  FROM e, generate_series(0, 15) g(j))
        |SELECT vec_id, pdim, floor(pr * 1000000)::BIGINT AS val_micro
        |FROM p ORDER BY vec_id, pdim""".stripMargin,
    // q161: the greedy farthest-point recurrence as a fixed CTE chain
    // (the q136/q126 fixed-round pattern).
    "q161_coreset_select" ->
      s"""WITH ${coresetCte(8)}
         |SELECT rank, vec_id, d2 AS min_d2_micro FROM ss8 ORDER BY rank""".stripMargin,
    // q162: the peeling cascade as a fixed CTE chain over the shared
    // trade-graph CTEs.
    "q162_k_core" ->
      s"""WITH ${kCoreCte(Graph.KCoreK, Graph.KCoreRounds)}
         |SELECT node, peel_round, degree FROM allrows ORDER BY node""".stripMargin,
    // q163: synchronous label propagation as a fixed CTE chain.
    "q163_label_prop" ->
      s"""WITH ${labelPropCte(Graph.LabelPropRounds)}
         |SELECT node, lbl AS community FROM ll${Graph.LabelPropRounds}
         |ORDER BY node""".stripMargin,
    // q164: same integer day/age/halving arithmetic; cents via floor.
    "q164_decayed_engagement" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |            floor(value * 100)::BIGINT AS cents FROM events),
        |a AS (SELECT max(day) AS mxd FROM ev),
        |w AS (SELECT user_id, day, cents,
        |      CASE WHEN (mxd - day) // 7 >= 10 THEN 0
        |           ELSE 1000 // (1 << ((mxd - day) // 7)) END AS w_pm
        |      FROM ev, a)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  sum(cents)::BIGINT AS raw_cents,
        |  sum(cents * w_pm)::BIGINT AS score_cpm,
        |  (CASE WHEN sum(cents) != 0
        |        THEN sum(cents * w_pm) // sum(cents) END)::BIGINT AS freshness_pm,
        |  max(day)::BIGINT AS last_day
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q165: distinct (lang, content-hash) sets full-outer joined; the
    // split convention is q113/q155's source-index cut.
    "q165_snapshot_diff" ->
      s"""WITH t AS (SELECT lang, substr(source, 4)::INT >= 15 AS is_new,
         |           ${H("text")} AS h FROM documents),
         |o AS (SELECT DISTINCT lang, h FROM t WHERE NOT is_new),
         |n AS (SELECT DISTINCT lang, h FROM t WHERE is_new),
         |j AS (SELECT coalesce(o.lang, n.lang) AS lang,
         |      (CASE WHEN o.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS ov,
         |      (CASE WHEN n.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS nv
         |      FROM o FULL JOIN n ON n.lang = o.lang AND n.h = o.h)
         |SELECT lang, sum(ov)::BIGINT AS n_old, sum(nv)::BIGINT AS n_new,
         |  sum(CASE WHEN nv = 1 AND ov = 0 THEN 1 ELSE 0 END)::BIGINT AS added,
         |  sum(CASE WHEN ov = 1 AND nv = 0 THEN 1 ELSE 0 END)::BIGINT AS removed,
         |  sum(CASE WHEN ov = 1 AND nv = 1 THEN 1 ELSE 0 END)::BIGINT AS common,
         |  (CASE WHEN sum(nv) > 0 THEN
         |    (1000 * sum(CASE WHEN nv = 1 AND ov = 0 THEN 1 ELSE 0 END)) // sum(nv)
         |   END)::BIGINT AS added_pm,
         |  (CASE WHEN sum(ov) > 0 THEN
         |    (1000 * sum(CASE WHEN ov = 1 AND nv = 0 THEN 1 ELSE 0 END)) // sum(ov)
         |   END)::BIGINT AS removed_pm
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    // q166: q32's pseudo-decode arithmetic + the endpoints-inclusive
    // uniform sample rule, one generate_series fan-out per item.
    "q166_frame_sample_plan" ->
      s"""WITH t AS (SELECT doc_id, text, ${H("text")} AS h FROM documents),
         |m AS (SELECT doc_id,
         |      (['jpeg', 'png', 'webp'])[(h % 3)::INT + 1] AS format,
         |      320 + (h % 8) * 160 AS width,
         |      240 + (h % 6) * 120 AS height,
         |      1 + octet_length(text::BLOB) % 24 AS n_frames FROM t)
         |SELECT doc_id, format, n_frames::BIGINT AS n_frames,
         |  slot::BIGINT AS slot,
         |  ((slot * (n_frames - 1)) // 3)::BIGINT AS frame_idx,
         |  (64 + ((slot * (n_frames - 1)) // 3) * width * height * 3)::BIGINT
         |    AS byte_offset
         |FROM m, unnest(generate_series(0, 3)) AS g(slot)
         |ORDER BY doc_id, slot""".stripMargin,
    // q167: same hub-capped wedge enumeration over the shared trade
    // graph; Jaccard denominators from FULL degrees.
    "q167_link_predict" ->
      s"""WITH $TradeGraphCte,
         |deg AS (SELECT src, count(*)::BIGINT AS dg FROM e GROUP BY 1),
         |mid AS (SELECT src AS m FROM deg WHERE dg <= ${Graph.LinkDegCap}),
         |em AS (SELECT e.src, e.dst FROM e JOIN mid ON e.dst = mid.m),
         |p AS (SELECT w1.src AS a, w2.src AS b, count(*)::BIGINT AS common
         |      FROM em w1 JOIN em w2
         |        ON w1.dst = w2.dst AND w1.src < w2.src
         |      GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT p.a AS node_a, p.b AS node_b, p.common,
         |  da.dg AS dg_a, db.dg AS dg_b,
         |  ((1000 * p.common) // (da.dg + db.dg - p.common))::BIGINT
         |    AS jaccard_pm
         |FROM p JOIN deg da ON da.src = p.a
         |       JOIN deg db ON db.src = p.b
         |ORDER BY node_a, node_b""".stripMargin,
    // q168: first differences of each user's sorted ts multiset, then
    // rank-picked exact order statistics (lower median, ceil-p90).
    "q168_event_gaps" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) AS tns FROM events),
        |g AS (SELECT user_id,
        |      (tns - lag(tns) OVER (PARTITION BY user_id ORDER BY tns))
        |        // 1000000000 AS gap_s FROM ev),
        |g2 AS (SELECT user_id, gap_s FROM g WHERE gap_s IS NOT NULL),
        |r AS (SELECT user_id, gap_s,
        |      row_number() OVER (PARTITION BY user_id ORDER BY gap_s) AS rn,
        |      count(*) OVER (PARTITION BY user_id) AS n FROM g2)
        |SELECT user_id, max(n)::BIGINT AS n_gaps,
        |  min(gap_s)::BIGINT AS min_gap_s,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN gap_s END)::BIGINT
        |    AS median_gap_s,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_s END)::BIGINT
        |    AS p90_gap_s,
        |  max(gap_s)::BIGINT AS max_gap_s,
        |  (sum(gap_s) // max(n))::BIGINT AS mean_gap_s
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q169: exact rational concentration indices over per-doc token
    // counts; floors via // match `div`.
    "q169_token_concentration" ->
      """WITH t AS (SELECT doc_id,
        |      unnest(regexp_split_to_array(text, ' ')) AS w FROM documents),
        |c AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
        |a AS (SELECT doc_id, sum(c) AS n_tok, count(*) AS n_distinct,
        |      sum(c * c) AS sumsq, max(c) AS top_c FROM c GROUP BY 1)
        |SELECT doc_id, n_tok::BIGINT AS n_tok,
        |  n_distinct::BIGINT AS n_distinct,
        |  ((1000000 * sumsq) // (n_tok * n_tok))::BIGINT AS hhi_ppm,
        |  ((1000 * top_c) // n_tok)::BIGINT AS top_share_pm,
        |  ((1000 * n_distinct) // n_tok)::BIGINT AS ttr_pm
        |FROM a ORDER BY doc_id""".stripMargin,
    // q170: floor(log2 c) exactly as length(bin(c)) - 1 on both
    // engines — no floating log at power-of-two boundaries.
    "q170_freq_spectrum" ->
      """WITH t AS (SELECT unnest(regexp_split_to_array(text, ' ')) AS w
        |           FROM documents),
        |c AS (SELECT w, count(*)::BIGINT AS c FROM t GROUP BY 1),
        |b AS (SELECT w, c, (length(bin(c)) - 1)::BIGINT AS bucket FROM c)
        |SELECT bucket, count(*)::BIGINT AS n_types,
        |  sum(c)::BIGINT AS n_occurrences,
        |  min(w) AS first_type
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // q172: the q115 Lloyd cell chain (nlist=16), full directed
    // within-cell cosine ranking, top-1 per vector with (c DESC, nbr)
    // tie-break = TopKByScore order, then the reciprocity self-join.
    "q172_mutual_nn" ->
      s"""WITH $MutualNnCte
         |SELECT x.src AS vec_a, y.src AS vec_b, x.cell::INTEGER AS cell,
        |  round(x.c, 6) AS cosine
        |FROM n1 x JOIN n1 y ON x.nbr = y.src AND y.nbr = x.src AND x.src < y.src
        |ORDER BY vec_a""".stripMargin,
    // q173: plain rank() windows per signal — DuckDB's rank() IS the
    // min-rank the histogram cumsum computes on the Spark side.
    "q173_rank_fusion" ->
      """WITH m AS (SELECT doc_id, lang, n_chars,
        |      len(regexp_split_to_array(text, ' '))::BIGINT AS n_tok,
        |      len(list_distinct(regexp_split_to_array(text, ' ')))::BIGINT AS n_types
        |      FROM documents),
        |r AS (SELECT doc_id, lang, n_tok, n_types, n_chars,
        |      rank() OVER (PARTITION BY lang ORDER BY n_tok DESC)::BIGINT AS r_tok,
        |      rank() OVER (PARTITION BY lang ORDER BY n_types DESC)::BIGINT AS r_types,
        |      rank() OVER (PARTITION BY lang ORDER BY n_chars DESC)::BIGINT AS r_chars
        |      FROM m)
        |SELECT doc_id, lang, n_tok, n_types, n_chars, r_tok, r_types, r_chars,
        |  (r_tok + r_types + r_chars)::BIGINT AS borda
        |FROM r ORDER BY doc_id""".stripMargin,
    // q174: rank-picked p05/p95 (ceil thresholds over the sorted
    // multiset), clip, integer floor means — mirrors the histogram
    // cumsum exactly.
    "q174_winsorize" ->
      """WITH t AS (SELECT lang,
        |      len(regexp_split_to_array(text, ' '))::BIGINT AS n_tok
        |      FROM documents),
        |r AS (SELECT lang, n_tok,
        |      row_number() OVER (PARTITION BY lang ORDER BY n_tok) AS rn,
        |      count(*) OVER (PARTITION BY lang) AS n FROM t),
        |b AS (SELECT lang, max(n)::BIGINT AS n_docs,
        |      min(CASE WHEN rn >= (n * 5 + 99) // 100 THEN n_tok END) AS lo,
        |      min(CASE WHEN rn >= (n * 95 + 99) // 100 THEN n_tok END) AS hi
        |      FROM r GROUP BY lang)
        |SELECT t.lang, max(b.n_docs)::BIGINT AS n_docs,
        |  max(b.lo)::BIGINT AS p05_tok, max(b.hi)::BIGINT AS p95_tok,
        |  sum(CASE WHEN n_tok < lo THEN 1 ELSE 0 END)::BIGINT AS clipped_low,
        |  sum(CASE WHEN n_tok > hi THEN 1 ELSE 0 END)::BIGINT AS clipped_high,
        |  (sum(n_tok) // count(*))::BIGINT AS raw_mean_tok,
        |  (sum(greatest(lo, least(hi, n_tok))) // count(*))::BIGINT
        |    AS winsor_mean_tok
        |FROM t JOIN b ON b.lang = t.lang
        |GROUP BY t.lang ORDER BY t.lang""".stripMargin,
    // q175: same user-keyed band join; last touch via row_number
    // (tts DESC, tid DESC) = max(struct); floor micro-credit split.
    "q175_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS tns
        |            FROM events),
        |conv AS (SELECT event_id AS conv_id, user_id, tns AS cts FROM ev
        |         WHERE event_type = 'purchase'),
        |touch AS (SELECT user_id, event_type AS channel, tns AS tts,
        |                 event_id AS tid FROM ev
        |          WHERE event_type IN ('click', 'view')),
        |j AS (SELECT c.conv_id, t.channel, t.tts, t.tid
        |      FROM conv c LEFT JOIN touch t ON t.user_id = c.user_id
        |        AND t.tts <= c.cts AND t.tts > c.cts - 604800000000000),
        |per AS (SELECT conv_id, count(tid)::BIGINT AS n_touches FROM j GROUP BY 1),
        |lastw AS (SELECT channel, count(*)::BIGINT AS last_touch_wins FROM (
        |           SELECT conv_id, channel,
        |                  row_number() OVER (PARTITION BY conv_id
        |                                     ORDER BY tts DESC, tid DESC) rn
        |           FROM j WHERE tid IS NOT NULL) WHERE rn = 1 GROUP BY 1),
        |lin AS (SELECT j.channel,
        |        sum((1000000 * cnt) // p.n_touches)::BIGINT AS linear_credit_micro,
        |        count(DISTINCT j.conv_id)::BIGINT AS conversions_touched
        |        FROM (SELECT conv_id, channel, count(*)::BIGINT AS cnt FROM j
        |              WHERE channel IS NOT NULL GROUP BY 1, 2) j
        |        JOIN per p ON p.conv_id = j.conv_id GROUP BY 1),
        |org AS (SELECT 'organic' AS channel,
        |        count(*)::BIGINT AS conversions_touched,
        |        (count(*) * 1000000)::BIGINT AS linear_credit_micro,
        |        count(*)::BIGINT AS last_touch_wins
        |        FROM per WHERE n_touches = 0)
        |SELECT l.channel, l.conversions_touched, l.linear_credit_micro,
        |  coalesce(w.last_touch_wins, 0)::BIGINT AS last_touch_wins
        |FROM lin l LEFT JOIN lastw w ON w.channel = l.channel
        |UNION ALL SELECT * FROM org
        |ORDER BY channel""".stripMargin,
    // q176: identical integer priority arithmetic; top-K by
    // (priority DESC, doc_id).
    "q176_priority_sample" ->
      s"""WITH p AS (SELECT doc_id, source, n_chars,
         |      (${H("'smp:' || doc_id::VARCHAR")} % 1000000 + 1)::BIGINT AS u_ppm
         |      FROM documents)
         |SELECT doc_id, source, n_chars, u_ppm,
         |  ((n_chars * 1000000) // u_ppm)::BIGINT AS priority
         |FROM p ORDER BY priority DESC, doc_id
         |LIMIT ${Curation.PrioritySampleK}""".stripMargin,
    // q177: one unnest + one rollup; ceil(len/4) granules as
    // (len+3)//4; byte totals summed per doc (octet_length).
    "q177_tokenizer_fertility" ->
      """WITH t AS (SELECT lang, source, strlen(text)::BIGINT AS db,
        |      generate_subscripts(regexp_split_to_array(text, ' '), 1) AS p,
        |      unnest(regexp_split_to_array(text, ' ')) AS w
        |      FROM documents),
        |a AS (SELECT lang, source,
        |      sum(CASE WHEN p = 1 THEN 1 ELSE 0 END)::BIGINT AS n_docs,
        |      count(*)::BIGINT AS n_words,
        |      sum((strlen(w) + 3) // 4)::BIGINT AS n_granules,
        |      sum(CASE WHEN p = 1 THEN db ELSE 0 END)::BIGINT AS n_bytes
        |      FROM t GROUP BY 1, 2)
        |SELECT lang, source, n_docs, n_words, n_granules, n_bytes,
        |  ((1000 * n_granules) // n_words)::BIGINT AS fertility_milli,
        |  ((1000 * n_words) // greatest(n_bytes, 1))::BIGINT AS words_per_kb,
        |  ((1000 * n_bytes) // n_words)::BIGINT AS bytes_per_word_milli
        |FROM a ORDER BY lang, source""".stripMargin,
    "q178_personalized_pagerank" -> PprOracle,
    // q179: the correlated threshold decorrelated identically —
    // per-part sums joined back, exact cents arithmetic throughout.
    "q179_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey,
        |      CAST(round(l_quantity * 100) AS BIGINT) AS qc,
        |      CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
        |      FROM lineitem),
        |p AS (SELECT l_partkey, sum(qc)::BIGINT AS sq, count(*)::BIGINT AS cnt
        |      FROM li GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_items,
        |  count(DISTINCT li.l_partkey)::BIGINT AS n_parts,
        |  (sum(pc) // 7)::BIGINT AS yearly_cents
        |FROM li JOIN p ON p.l_partkey = li.l_partkey
        |WHERE 5 * qc * cnt < sq""".stripMargin,
    // q180: q176's priorities ranked per language; row_number
    // (priority DESC, doc_id) = TopKByScore order.
    "q180_stratified_sample" ->
      s"""WITH p AS (SELECT doc_id, lang,
         |      ((n_chars * 1000000) //
         |       (${H("'smp:' || doc_id::VARCHAR")} % 1000000 + 1))::BIGINT AS priority
         |      FROM documents),
         |r AS (SELECT lang, doc_id, priority,
         |      row_number() OVER (PARTITION BY lang
         |                         ORDER BY priority DESC, doc_id) AS rn
         |      FROM p)
         |SELECT lang, rn::BIGINT AS rank, doc_id, priority FROM r
         |WHERE rn <= ${Curation.StratSampleK} ORDER BY lang, rank""".stripMargin,
    // q181: same session numbering as q19/q141, two leads inside the
    // (user, sid) refinement, top-20 with full tie-break.
    "q181_session_paths" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS tns
        |            FROM events),
        |s AS (SELECT user_id, event_id, event_type, tns,
        |      CASE WHEN lag(tns) OVER w IS NULL
        |             OR tns - lag(tns) OVER w > 1800000000000
        |           THEN 1 ELSE 0 END AS ns
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
        |s2 AS (SELECT user_id, event_id, event_type, tns,
        |       sum(ns) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid FROM s),
        |p AS (SELECT user_id, sid, event_type AS step1,
        |      lead(event_type, 1) OVER w2 AS step2,
        |      lead(event_type, 2) OVER w2 AS step3
        |      FROM s2 WINDOW w2 AS (PARTITION BY user_id, sid
        |                            ORDER BY tns, event_id))
        |SELECT step1, step2, step3, count(*)::BIGINT AS n_occurrences,
        |  count(DISTINCT (user_id, sid))::BIGINT AS n_sessions
        |FROM p WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_occurrences DESC, step1, step2, step3 LIMIT 20""".stripMargin,
    // q182: q23's candidate chain + the q22-shape exact baseline at
    // the q23 threshold; three scalar counts + floor permilles.
    "q182_lsh_eval" ->
      s"""WITH $MinhashCandCte,
         |cm AS (SELECT a.doc_id da, b.doc_id db, count(*) cm
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2),
         |ex AS (SELECT da, db FROM cm
         |       JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
         |       WHERE cm / (x.sz + y.sz - cm) >= 0.5),
         |n1 AS (SELECT count(*)::BIGINT n_exact FROM ex),
         |n2 AS (SELECT count(*)::BIGINT n_candidates FROM cand),
         |n3 AS (SELECT count(*)::BIGINT n_hit
         |       FROM ex JOIN cand c ON c.da = ex.da AND c.db = ex.db)
         |SELECT n_exact, n_candidates, n_hit,
         |  ((1000 * n_hit) // greatest(n_exact, 1))::BIGINT AS recall_pm,
         |  ((1000 * n_hit) // greatest(n_candidates, 1))::BIGINT AS precision_pm
         |FROM n1, n2, n3""".stripMargin,
    // q183: per-candidate minhash agreement (position-joined) vs the
    // exact permille, grouped by agreement level.
    "q183_minhash_calibration" ->
      s"""WITH $MinhashCandCte,
         |ag AS (SELECT c.da, c.db,
         |       sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END)::BIGINT AS agreement
         |       FROM cand c JOIN mh x ON x.doc_id = c.da
         |            JOIN mh y ON y.doc_id = c.db AND y.j = x.j
         |       GROUP BY 1, 2),
         |cm AS (SELECT c.da, c.db, count(*)::BIGINT cm FROM cand c
         |       JOIN sh p ON p.doc_id = c.da
         |       JOIN sh q ON q.doc_id = c.db AND q.h = p.h
         |       GROUP BY 1, 2),
         |e AS (SELECT a.da, a.db, a.agreement,
         |      (1000 * coalesce(cm.cm, 0))
         |        // (x.sz + y.sz - coalesce(cm.cm, 0)) AS epm
         |      FROM ag a LEFT JOIN cm ON cm.da = a.da AND cm.db = a.db
         |      JOIN sz x ON x.doc_id = a.da JOIN sz y ON y.doc_id = a.db)
         |SELECT agreement, count(*)::BIGINT AS n_pairs,
         |  (sum(epm) // count(*))::BIGINT AS mean_exact_pm,
         |  min(epm)::BIGINT AS min_exact_pm,
         |  max(epm)::BIGINT AS max_exact_pm,
         |  ((1000 * agreement) // 16)::BIGINT AS est_pm
         |FROM e GROUP BY agreement ORDER BY agreement""".stripMargin,
    // q184: q154's canonical chain + q111's split of the cluster
    // representative + shard hash, one (split, shard) rollup.
    "q184_export_manifest" ->
      s"""WITH $NearDupClusterCte,
         |tq AS (SELECT doc_id, n_chars, regexp_split_to_array(text, ' ') tk FROM documents),
         |sq AS (SELECT doc_id, n_chars, len(tk)::BIGINT n_tok,
         |       len(list_distinct(tk))::BIGINT n_uniq,
         |       len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
         |       FROM tq),
         |scq AS (SELECT doc_id, n_chars,
         |        ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
         |         + (300 * least(n_tok, 200)) // 200)::BIGINT AS score_milli FROM sq),
         |jq AS (SELECT l.doc_id, l.cluster_id, sc.n_chars, sc.score_milli
         |       FROM lbl l JOIN scq sc ON sc.doc_id = l.doc_id),
         |rq AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |        ORDER BY score_milli DESC, doc_id) rn FROM jq),
         |can AS (SELECT cluster_id, doc_id AS canonical_id FROM rq WHERE rn = 1),
         |spl AS (SELECT doc_id,
         |        CASE WHEN k < 980 THEN 'train' WHEN k < 990 THEN 'val'
         |             ELSE 'test' END AS split
         |        FROM (SELECT doc_id, ${H("'split:' || text")} % 1000 AS k
         |              FROM documents)),
         |m AS (SELECT s.split,
         |      (${H("'shard:' || c.canonical_id::VARCHAR")} % ${Curation.ManifestShards})::BIGINT AS shard,
         |      c.canonical_id, dch.n_chars
         |      FROM can c JOIN spl s ON s.doc_id = c.cluster_id
         |      JOIN documents dch ON dch.doc_id = c.canonical_id)
         |SELECT split, shard, count(*)::BIGINT AS n_docs,
         |  sum(n_chars)::BIGINT AS n_chars, min(canonical_id)::BIGINT AS min_doc,
         |  max(canonical_id)::BIGINT AS max_doc
         |FROM m GROUP BY 1, 2 ORDER BY split, shard""".stripMargin,
    // q185: both lower medians rank-picked; 3·MAD flags; floor pm.
    "q185_mad_outliers" ->
      """WITH t AS (SELECT lang,
        |      len(regexp_split_to_array(text, ' '))::BIGINT AS n_tok
        |      FROM documents),
        |r AS (SELECT lang, n_tok,
        |      row_number() OVER (PARTITION BY lang ORDER BY n_tok) rn,
        |      count(*) OVER (PARTITION BY lang) n FROM t),
        |med AS (SELECT lang, max(n)::BIGINT n_docs,
        |        min(CASE WHEN rn >= (n + 1) // 2 THEN n_tok END)::BIGINT med
        |        FROM r GROUP BY 1),
        |dv AS (SELECT t.lang, abs(t.n_tok - m.med) AS dev
        |       FROM t JOIN med m ON m.lang = t.lang),
        |r2 AS (SELECT lang, dev,
        |       row_number() OVER (PARTITION BY lang ORDER BY dev) rn,
        |       count(*) OVER (PARTITION BY lang) n FROM dv),
        |mad AS (SELECT lang,
        |        min(CASE WHEN rn >= (n + 1) // 2 THEN dev END)::BIGINT mad
        |        FROM r2 GROUP BY 1),
        |fl AS (SELECT t.lang,
        |       sum(CASE WHEN abs(t.n_tok - m.med) > 3 * md.mad
        |                THEN 1 ELSE 0 END)::BIGINT n_outliers
        |       FROM t JOIN med m ON m.lang = t.lang
        |            JOIN mad md ON md.lang = t.lang GROUP BY 1)
        |SELECT m.lang, m.n_docs, m.med AS median_tok, md.mad AS mad_tok,
        |  fl.n_outliers,
        |  ((1000 * fl.n_outliers) // m.n_docs)::BIGINT AS outlier_pm
        |FROM med m JOIN mad md ON md.lang = m.lang JOIN fl ON fl.lang = m.lang
        |ORDER BY m.lang""".stripMargin,
    // q186: same +1e6 shift (floor ≡ truncate on the nonnegative
    // domain), HUGEINT variance products.
    "q186_embedding_dim_stats" ->
      """WITH q AS (SELECT i::BIGINT - 1 AS pos,
        |      floor(embedding[i]::DOUBLE * 1000000)::BIGINT + 1000000 AS vms
        |      FROM (SELECT embedding,
        |            unnest(generate_series(1, len(embedding))) i FROM embeddings))
        |SELECT pos, count(*)::BIGINT AS n_vecs,
        |  (min(vms) - 1000000)::BIGINT AS min_micro,
        |  (max(vms) - 1000000)::BIGINT AS max_micro,
        |  (sum(vms) // count(*) - 1000000)::BIGINT AS mean_micro,
        |  ((count(*)::HUGEINT * sum(vms * vms) - sum(vms)::HUGEINT * sum(vms))
        |    // (count(*)::HUGEINT * count(*)))::BIGINT AS var_micro2,
        |  (CASE WHEN min(vms) = max(vms) THEN 1 ELSE 0 END)::BIGINT AS dead
        |FROM q GROUP BY pos ORDER BY pos""".stripMargin,
    // q171: the (lang, len-bucket) audit with the K=8 floor.
    "q171_k_anonymity" ->
      s"""WITH t AS (SELECT lang,
         |      len(regexp_split_to_array(text, ' '))::BIGINT
         |        // ${Curation.AnonBucketTokens} AS len_bucket
         |      FROM documents),
         |g AS (SELECT lang, len_bucket, count(*)::BIGINT AS n_docs
         |      FROM t GROUP BY 1, 2)
         |SELECT lang, len_bucket, n_docs,
         |  (CASE WHEN n_docs < ${Curation.AnonK} THEN 1 ELSE 0 END)::BIGINT
         |    AS suppressed,
         |  (CASE WHEN n_docs < ${Curation.AnonK} THEN 0 ELSE n_docs
         |   END)::BIGINT AS retained_docs
         |FROM g ORDER BY lang, len_bucket""".stripMargin,
    // q187: replay the positional-postings phrase search — postings as
    // a (term, doc_id, pos) CTE, each phrase as a chain of
    // (doc_id, pos+offset) self-joins, best doc via (count desc, id
    // asc) LIMIT 1 subqueries so empty phrases degrade to NULLs the
    // same way Spark's min(struct) does.
    "q187_phrase_search" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |           FROM documents),
        |post AS (SELECT doc_id, i - 1 AS pos, tk[i] AS term
        |         FROM (SELECT doc_id, tk,
        |               unnest(generate_series(1, len(tk))) i FROM t)),
        |s1 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |       WHERE a.term = 'hash' AND b.term = 'join'),
        |p1 AS (SELECT doc_id, count(*)::BIGINT c FROM s1 GROUP BY 1),
        |b1 AS (SELECT doc_id, c FROM p1 ORDER BY c DESC, doc_id LIMIT 1),
        |s2 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |       WHERE a.term = 'merge' AND b.term = 'sort'),
        |p2 AS (SELECT doc_id, count(*)::BIGINT c FROM s2 GROUP BY 1),
        |b2 AS (SELECT doc_id, c FROM p2 ORDER BY c DESC, doc_id LIMIT 1),
        |s3 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |       JOIN post d ON d.doc_id = a.doc_id AND d.pos = a.pos + 2
        |       WHERE a.term = 'slow' AND b.term = 'hash' AND d.term = 'batch'),
        |p3 AS (SELECT doc_id, count(*)::BIGINT c FROM s3 GROUP BY 1),
        |b3 AS (SELECT doc_id, c FROM p3 ORDER BY c DESC, doc_id LIMIT 1)
        |SELECT * FROM (
        |  SELECT 'hash join' AS phrase,
        |    (SELECT count(*) FROM p1)::BIGINT AS n_docs,
        |    (SELECT coalesce(sum(c), 0) FROM p1)::BIGINT AS n_matches,
        |    (SELECT doc_id FROM b1) AS best_doc,
        |    (SELECT c FROM b1)::BIGINT AS best_matches
        |  UNION ALL
        |  SELECT 'merge sort',
        |    (SELECT count(*) FROM p2)::BIGINT,
        |    (SELECT coalesce(sum(c), 0) FROM p2)::BIGINT,
        |    (SELECT doc_id FROM b2), (SELECT c FROM b2)::BIGINT
        |  UNION ALL
        |  SELECT 'slow hash batch',
        |    (SELECT count(*) FROM p3)::BIGINT,
        |    (SELECT coalesce(sum(c), 0) FROM p3)::BIGINT,
        |    (SELECT doc_id FROM b3), (SELECT c FROM b3)::BIGINT
        |) ORDER BY phrase""".stripMargin,
    // q188: equi-depth bins over the dollar-grid histogram — DuckDB
    // can afford the plain cumulative window (the value-bounded
    // relation is small); bin assignment is the identical exact
    // integer formula (rows_before * 8) // n.
    "q188_equidepth_hist" ->
      """WITH h AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 100
        |             AS dollars, count(*)::BIGINT AS c
        |           FROM lineitem GROUP BY 1),
        |cum AS (SELECT dollars, c,
        |               sum(c) OVER (ORDER BY dollars)::BIGINT AS cumc,
        |               sum(c) OVER ()::BIGINT AS n
        |        FROM h)
        |SELECT ((cumc - c) * 8) // n AS bin, sum(c)::BIGINT AS n_rows,
        |       min(dollars) AS lo_dollars, max(dollars) AS hi_dollars,
        |       count(*)::BIGINT AS n_distinct_dollars
        |FROM cum GROUP BY 1 ORDER BY bin""".stripMargin,
    // q189: exact sliding 7-day distinct users — the same bounded 7×
    // fan-out rewrite (user-day × window-ends it is visible from),
    // inner join drops phantom trailing days exactly as Spark does.
    "q189_sliding_active_users" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |           FROM events),
        |daily AS (SELECT day, count(*)::BIGINT AS n_events,
        |                 count(DISTINCT user_id)::BIGINT AS dau
        |          FROM e GROUP BY 1),
        |ud AS (SELECT DISTINCT user_id, day FROM e),
        |fan AS (SELECT user_id, day + i AS day
        |        FROM (SELECT user_id, day,
        |              unnest(generate_series(0, 6)) i FROM ud)),
        |wau AS (SELECT day, count(DISTINCT user_id)::BIGINT AS wau
        |        FROM fan GROUP BY 1)
        |SELECT d.day, d.n_events, d.dau, w.wau,
        |       (1000 * d.dau) // w.wau AS stickiness_pm
        |FROM daily d JOIN wau w USING (day)
        |ORDER BY day""".stripMargin,
    // q190: per probe pair, postings rows within |Δpos| <= w — the
    // window membership itself, independent of Spark's rarest-side
    // fan-out rewrite.
    "q190_proximity_search" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |           FROM documents),
        |post AS (SELECT doc_id, i - 1 AS pos, tk[i] AS term
        |         FROM (SELECT doc_id, tk,
        |               unnest(generate_series(1, len(tk))) i FROM t)),
        |h1 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND abs(b.pos - a.pos) <= 4
        |       WHERE a.term = 'hash' AND b.term = 'join'),
        |p1 AS (SELECT doc_id, count(*)::BIGINT c FROM h1 GROUP BY 1),
        |b1 AS (SELECT doc_id, c FROM p1 ORDER BY c DESC, doc_id LIMIT 1),
        |h2 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND abs(b.pos - a.pos) <= 4
        |       WHERE a.term = 'sort' AND b.term = 'merge'),
        |p2 AS (SELECT doc_id, count(*)::BIGINT c FROM h2 GROUP BY 1),
        |b2 AS (SELECT doc_id, c FROM p2 ORDER BY c DESC, doc_id LIMIT 1),
        |h3 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND abs(b.pos - a.pos) <= 6
        |       WHERE a.term = 'slow' AND b.term = 'batch'),
        |p3 AS (SELECT doc_id, count(*)::BIGINT c FROM h3 GROUP BY 1),
        |b3 AS (SELECT doc_id, c FROM p3 ORDER BY c DESC, doc_id LIMIT 1)
        |SELECT * FROM (
        |  SELECT 'hash NEAR/4 join' AS probe,
        |    (SELECT count(*) FROM p1)::BIGINT AS n_docs,
        |    (SELECT coalesce(sum(c), 0) FROM p1)::BIGINT AS n_pairs,
        |    (SELECT doc_id FROM b1) AS best_doc,
        |    (SELECT c FROM b1)::BIGINT AS best_pairs
        |  UNION ALL
        |  SELECT 'sort NEAR/4 merge',
        |    (SELECT count(*) FROM p2)::BIGINT,
        |    (SELECT coalesce(sum(c), 0) FROM p2)::BIGINT,
        |    (SELECT doc_id FROM b2), (SELECT c FROM b2)::BIGINT
        |  UNION ALL
        |  SELECT 'slow NEAR/6 batch',
        |    (SELECT count(*) FROM p3)::BIGINT,
        |    (SELECT coalesce(sum(c), 0) FROM p3)::BIGINT,
        |    (SELECT doc_id FROM b3), (SELECT c FROM b3)::BIGINT
        |) ORDER BY probe""".stripMargin,
    // q191: forward-window-3 ordered pairs; M = total in-window slots
    // = count of all pairs; lift in HUGEINT exactly as Spark's
    // DECIMAL(38,0).
    "q191_skipgram_cooc" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |           FROM documents),
        |post AS (SELECT doc_id, i - 1 AS pos, tk[i] AS term
        |         FROM (SELECT doc_id, tk,
        |               unnest(generate_series(1, len(tk))) i FROM t)),
        |pr AS (SELECT a.term w1, b.term w2, count(*)::BIGINT c_ab
        |       FROM post a JOIN post b ON b.doc_id = a.doc_id
        |            AND b.pos BETWEEN a.pos + 1 AND a.pos + 3
        |       GROUP BY 1, 2),
        |uc AS (SELECT term, count(*)::BIGINT c FROM post GROUP BY 1),
        |st AS (SELECT (SELECT count(*) FROM post)::BIGINT n,
        |              (SELECT sum(c_ab) FROM pr)::BIGINT m)
        |SELECT pr.w1, pr.w2, pr.c_ab,
        |       ((1000::HUGEINT * pr.c_ab * st.n * st.n)
        |         // (st.m::HUGEINT * u1.c * u2.c))::BIGINT AS lift_milli
        |FROM pr JOIN uc u1 ON u1.term = pr.w1
        |        JOIN uc u2 ON u2.term = pr.w2, st
        |ORDER BY pr.c_ab DESC, pr.w1, pr.w2 LIMIT 40""".stripMargin,
    // q192: tf-idf (idfw = 100000 // df, df in [2, cap]) shingle
    // cosine^2 in exact micro units, HUGEINT mirror of the
    // DECIMAL(38,0) floor arithmetic.
    "q192_sparse_cosine" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
         |           FROM documents),
         |sh AS (SELECT doc_id, array_to_string(tk[i:i+2], ' ') g
         |       FROM (SELECT doc_id, tk,
         |             unnest(generate_series(1, len(tk) - 2)) i FROM t)
         |       WHERE len(tk) >= 3),
         |tf AS (SELECT doc_id, g, count(*)::BIGINT tf FROM sh GROUP BY 1, 2),
         |df AS (SELECT g, count(*)::BIGINT df FROM tf GROUP BY 1
         |       HAVING count(*) BETWEEN 2 AND ${TextAnalysis.SparseCosineDfCap}),
         |w AS (SELECT tf.doc_id, tf.g, tf.tf * (100000 // df.df) AS wt
         |      FROM tf JOIN df USING (g)),
         |nrm AS (SELECT doc_id, sum(wt::HUGEINT * wt) n2 FROM w GROUP BY 1),
         |dots AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
         |                sum(a.wt::HUGEINT * b.wt) dt
         |         FROM w a JOIN w b ON a.g = b.g AND a.doc_id < b.doc_id
         |         GROUP BY 1, 2)
         |SELECT d.doc_a, d.doc_b,
         |       ((1000000::HUGEINT * d.dt * d.dt) // (na.n2 * nb.n2))::BIGINT
         |         AS cos2_micro
         |FROM dots d JOIN nrm na ON na.doc_id = d.doc_a
         |            JOIN nrm nb ON nb.doc_id = d.doc_b
         |ORDER BY cos2_micro DESC, d.doc_a, d.doc_b LIMIT 30""".stripMargin,
    // q193: identical RANGE frames over the numeric day — gap-correct
    // lags with no spine in either engine.
    "q193_lag_features" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |           FROM events),
        |daily AS (SELECT user_id, day, count(*)::BIGINT AS n
        |          FROM e GROUP BY 1, 2)
        |SELECT user_id, day, n,
        |  coalesce(sum(n) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING), 0)::BIGINT AS lag1,
        |  coalesce(sum(n) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING), 0)::BIGINT AS lag7,
        |  coalesce(sum(n) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 27 PRECEDING AND CURRENT ROW), 0)::BIGINT AS sum28,
        |  coalesce(sum(n) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING), 0)::BIGINT AS next1
        |FROM daily ORDER BY user_id, day""".stripMargin,
    // q194: each check restated as its own aggregate — the oracle
    // checks the CONTRACT (violation counts), not Spark's fused
    // two-pass plan.
    "q194_dq_violations" ->
      """WITH cents AS (SELECT l_orderkey,
        |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) c
        |       FROM lineitem GROUP BY 1),
        |li AS (SELECT count(*)::BIGINT n,
        |  sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT v_orphan,
        |  sum(CASE WHEN l.l_quantity <= 0 OR l.l_quantity > 100
        |      THEN 1 ELSE 0 END)::BIGINT v_qty,
        |  sum(CASE WHEN l.l_discount < 0 OR l.l_discount > 0.5
        |      THEN 1 ELSE 0 END)::BIGINT v_disc
        |  FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |od AS (SELECT count(*)::BIGINT n,
        |  sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT v_orphan,
        |  (count(*) - count(DISTINCT o.o_orderkey))::BIGINT v_dup,
        |  sum(CASE WHEN o.o_orderdate < TIMESTAMP '1995-01-01'
        |        OR o.o_orderdate >= TIMESTAMP '2002-01-01'
        |      THEN 1 ELSE 0 END)::BIGINT v_date,
        |  sum(CASE WHEN CAST(round(o.o_totalprice * 100) AS BIGINT)
        |        != coalesce(cents.c, 0) THEN 1 ELSE 0 END)::BIGINT v_recon,
        |  sum(CASE WHEN cents.c IS NULL THEN 1 ELSE 0 END)::BIGINT v_childless
        |  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        |       LEFT JOIN cents ON cents.l_orderkey = o.o_orderkey),
        |rep AS (
        |  SELECT 'li_orphan_orderkey' check_name, n n_checked, v_orphan v FROM li
        |  UNION ALL SELECT 'li_quantity_range', n, v_qty FROM li
        |  UNION ALL SELECT 'li_discount_range', n, v_disc FROM li
        |  UNION ALL SELECT 'ord_orphan_custkey', n, v_orphan FROM od
        |  UNION ALL SELECT 'ord_dup_pk', n, v_dup FROM od
        |  UNION ALL SELECT 'ord_date_range', n, v_date FROM od
        |  UNION ALL SELECT 'ord_total_recon', n, v_recon FROM od
        |  UNION ALL SELECT 'ord_childless', n, v_childless FROM od)
        |SELECT check_name, n_checked, v AS n_violations,
        |       (1000000 * v) // n_checked AS viol_ppm
        |FROM rep ORDER BY check_name""".stripMargin,
    // q195: chi-square cell contributions via integer cross-
    // multiplication, HUGEINT mirror of DECIMAL(38,0).
    "q195_chisq_mix" ->
      """WITH cells AS (SELECT lang, source, count(*)::BIGINT o
        |               FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, sum(o)::BIGINT r FROM cells GROUP BY 1),
        |c AS (SELECT source, sum(o)::BIGINT c FROM cells GROUP BY 1),
        |n AS (SELECT sum(o)::BIGINT n FROM cells)
        |SELECT cells.lang, cells.source, cells.o AS n_obs,
        |       (1000 * r.r * c.c) // n.n AS exp_milli,
        |       ((1000::HUGEINT * (cells.o*n.n - r.r*c.c)
        |                       * (cells.o*n.n - r.r*c.c))
        |         // (n.n::HUGEINT * r.r * c.c))::BIGINT AS contrib_milli
        |FROM cells JOIN r USING (lang) JOIN c USING (source), n
        |ORDER BY cells.lang, cells.source""".stripMargin,
    // q196: composes the SAME three top-k oracles the driver already
    // checks (q26/q27/q48) — rank of the true rank-1 neighbor in each
    // approximate list, reciprocal rank floored to micro units.
    "q196_mrr_eval" ->
      s"""WITH gt AS (SELECT q_id, neighbor_id true_nn
         |            FROM ($BruteTopkSql) WHERE rank = 1),
         |ls AS (SELECT q_id, neighbor_id, rank FROM ($LshTopkSql)),
         |i8 AS (SELECT q_id, neighbor_id, rank FROM ($Int8TopkSql)),
         |rl AS (SELECT gt.q_id, ls.rank FROM gt
         |       JOIN ls ON ls.q_id = gt.q_id AND ls.neighbor_id = gt.true_nn),
         |r8 AS (SELECT gt.q_id, i8.rank FROM gt
         |       JOIN i8 ON i8.q_id = gt.q_id AND i8.neighbor_id = gt.true_nn)
         |SELECT gt.q_id, gt.true_nn,
         |       rl.rank AS rank_lsh,
         |       coalesce(1000000 // rl.rank, 0)::BIGINT AS rr_lsh_micro,
         |       r8.rank AS rank_int8,
         |       coalesce(1000000 // r8.rank, 0)::BIGINT AS rr_int8_micro
         |FROM gt LEFT JOIN rl ON rl.q_id = gt.q_id
         |        LEFT JOIN r8 ON r8.q_id = gt.q_id
         |ORDER BY gt.q_id""".stripMargin,
    // q197: (doc, term) tf roll-up; heaviest doc via min over
    // (-tf, doc_id) exactly like Spark's min(struct).
    "q197_term_burstiness" ->
      """WITH tf AS (SELECT doc_id, w, count(*)::BIGINT tf FROM
        |    (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) w
        |     FROM documents) GROUP BY 1, 2),
        |agg AS (SELECT w, count(*)::BIGINT df, sum(tf)::BIGINT cf
        |        FROM tf GROUP BY 1),
        |top AS (SELECT w, doc_id, tf FROM
        |    (SELECT w, doc_id, tf, row_number() OVER
        |       (PARTITION BY w ORDER BY tf DESC, doc_id) rn FROM tf)
        |    WHERE rn = 1)
        |SELECT agg.w, agg.df, agg.cf,
        |       (1000 * agg.cf) // agg.df AS burstiness_milli,
        |       top.doc_id AS top_doc,
        |       (1000 * top.tf) // agg.cf AS top_doc_share_pm
        |FROM agg JOIN top USING (w)
        |ORDER BY agg.cf DESC, agg.w""".stripMargin,
    // q198: distinct (order, part) baskets; lift vs part basket
    // frequencies, T = ordering baskets.
    "q198_copurchase_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey ok, l_partkey p
        |               FROM lineitem),
        |pr AS (SELECT a.p pa, b.p pb, count(*)::BIGINT c_ab
        |       FROM items a JOIN items b ON a.ok = b.ok AND a.p < b.p
        |       GROUP BY 1, 2 HAVING count(*) >= 3),
        |fr AS (SELECT p, count(*)::BIGINT c FROM items GROUP BY 1),
        |st AS (SELECT count(DISTINCT ok)::BIGINT t FROM items)
        |SELECT pr.pa, pr.pb, pr.c_ab, fa.c AS c_a, fb.c AS c_b,
        |       ((1000::HUGEINT * pr.c_ab * st.t)
        |        // (fa.c::HUGEINT * fb.c))::BIGINT AS lift_milli
        |FROM pr JOIN fr fa ON fa.p = pr.pa JOIN fr fb ON fb.p = pr.pb, st
        |ORDER BY pr.c_ab DESC, pr.pa, pr.pb LIMIT 30""".stripMargin,
    // q199: value-group empirical-CDF quintiles — before = customers
    // strictly better-ranked; DuckDB can afford the plain histogram
    // window where Spark runs the two-pass.
    "q199_rfm_scores" ->
      """WITH per AS (SELECT o_custkey,
        |         max(date_diff('day', DATE '1970-01-01', o_orderdate))::BIGINT
        |           AS last_day,
        |         count(*)::BIGINT AS f,
        |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS m_cents
        |       FROM orders GROUP BY 1),
        |base AS (SELECT o_custkey,
        |           (SELECT max(last_day) FROM per) - last_day AS r_days,
        |           f, m_cents, m_cents // 10000 AS m_hund FROM per),
        |rs AS (SELECT r_days, ((coalesce(sum(c) OVER (ORDER BY r_days DESC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |         // (SELECT count(*) FROM base) + 1)::BIGINT s
        |       FROM (SELECT r_days, count(*)::BIGINT c FROM base GROUP BY 1)),
        |fs AS (SELECT f, ((coalesce(sum(c) OVER (ORDER BY f
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |         // (SELECT count(*) FROM base) + 1)::BIGINT s
        |       FROM (SELECT f, count(*)::BIGINT c FROM base GROUP BY 1)),
        |ms AS (SELECT m_hund, ((coalesce(sum(c) OVER (ORDER BY m_hund
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |         // (SELECT count(*) FROM base) + 1)::BIGINT s
        |       FROM (SELECT m_hund, count(*)::BIGINT c FROM base GROUP BY 1))
        |SELECT b.o_custkey, b.r_days, b.f, (b.m_cents // 100)::BIGINT AS m_dollars,
        |       rs.s AS r_score, fs.s AS f_score, ms.s AS m_score,
        |       rs.s * 100 + fs.s * 10 + ms.s AS rfm_code
        |FROM base b JOIN rs ON rs.r_days = b.r_days
        |     JOIN fs ON fs.f = b.f JOIN ms ON ms.m_hund = b.m_hund
        |ORDER BY b.o_custkey""".stripMargin,
    // q200: count profile + scalar mean; 2x-mean salt target.
    "q200_salt_plan" ->
      """WITH c AS (SELECT o_custkey, count(*)::BIGINT n FROM orders GROUP BY 1),
        |st AS (SELECT sum(n)::BIGINT total, count(*)::BIGINT nkeys FROM c)
        |SELECT c.o_custkey, c.n,
        |       (1000 * c.n) // st.total AS share_pm,
        |       (1000 * c.n * st.nkeys) // st.total AS ratio_to_mean_milli,
        |       (c.n + greatest(1, (2 * st.total) // st.nkeys) - 1)
        |         // greatest(1, (2 * st.total) // st.nkeys) AS n_splits
        |FROM c, st ORDER BY c.n DESC, c.o_custkey LIMIT 10""".stripMargin,
    // q201: purchase day visible from the ≤8 trailing days; latest
    // wins (arg_max on pday — unique per (user, pday)).
    "q201_locf_features" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |                  event_type,
        |                  CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events),
        |days AS (SELECT user_id, day, count(*)::BIGINT n_events
        |         FROM e GROUP BY 1, 2),
        |pur AS (SELECT user_id, day pday, sum(cents)::BIGINT pcents
        |        FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
        |best AS (SELECT d.user_id, d.day, max(p.pday) lpd,
        |                arg_max(p.pcents, p.pday) lpc
        |         FROM days d JOIN pur p ON p.user_id = d.user_id
        |              AND p.pday BETWEEN d.day - 7 AND d.day
        |         GROUP BY 1, 2)
        |SELECT d.user_id, d.day, d.n_events,
        |       b.lpd AS last_purchase_day,
        |       coalesce(b.lpc, 0) AS carried_cents,
        |       d.day - b.lpd AS age_days
        |FROM days d LEFT JOIN best b
        |     ON b.user_id = d.user_id AND b.day = d.day
        |ORDER BY d.user_id, d.day""".stripMargin,
    // q202: same capped-statistics estimate formula, scalar math.
    "q202_join_card_est" ->
      """WITH c AS (SELECT l_partkey, count(*)::BIGINT c FROM lineitem
        |           GROUP BY 1),
        |full_ AS (SELECT sum(c)::BIGINT n_rows, count(*)::BIGINT n_keys,
        |                 sum(c * c)::BIGINT exact_rows FROM c),
        |top_ AS (SELECT sum(c * c)::BIGINT top_sq, sum(c)::BIGINT top_rows,
        |                count(*)::BIGINT top_keys
        |         FROM (SELECT c FROM c ORDER BY c DESC, l_partkey LIMIT 20)),
        |est AS (SELECT f.n_keys, f.n_rows, f.exact_rows,
        |          t.top_sq + CASE WHEN f.n_keys > t.top_keys
        |            THEN ((f.n_rows - t.top_rows) * (f.n_rows - t.top_rows))
        |                 // (f.n_keys - t.top_keys)
        |            ELSE 0 END AS est_rows
        |        FROM full_ f, top_ t)
        |SELECT n_keys, n_rows, exact_rows, est_rows,
        |       (1000 * abs(est_rows - exact_rows)) // exact_rows AS err_pm
        |FROM est""".stripMargin,
    // q203: month-files min/max stats; per predicate pruned files,
    // rows in surviving files, exact matches, amplification.
    "q203_pruning_stats" ->
      """WITH li AS (SELECT strftime(l_shipdate, '%Y-%m') AS f, l_orderkey ok,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) pc,
        |         l_quantity q
        |       FROM lineitem),
        |st AS (SELECT f, count(*)::BIGINT c,
        |         min(ok) min_ok, max(ok) max_ok, max(pc) max_pc, max(q) max_q
        |       FROM li GROUP BY 1),
        |pa AS (SELECT count(*)::BIGINT n_files,
        |  sum(CASE WHEN max_pc < 5000000 THEN 1 ELSE 0 END)::BIGINT pr1,
        |  sum(CASE WHEN max_pc < 5000000 THEN 0 ELSE c END)::BIGINT sc1,
        |  sum(CASE WHEN max_ok < 1000 OR min_ok > 2000 THEN 1 ELSE 0 END)::BIGINT pr2,
        |  sum(CASE WHEN max_ok < 1000 OR min_ok > 2000 THEN 0 ELSE c END)::BIGINT sc2,
        |  sum(CASE WHEN max_q < 45 THEN 1 ELSE 0 END)::BIGINT pr3,
        |  sum(CASE WHEN max_q < 45 THEN 0 ELSE c END)::BIGINT sc3,
        |  sum(CASE WHEN f < '1998-01' THEN 1 ELSE 0 END)::BIGINT pr4,
        |  sum(CASE WHEN f < '1998-01' THEN 0 ELSE c END)::BIGINT sc4
        |  FROM st),
        |ex AS (SELECT
        |  sum(CASE WHEN pc >= 5000000 THEN 1 ELSE 0 END)::BIGINT m1,
        |  sum(CASE WHEN ok BETWEEN 1000 AND 2000 THEN 1 ELSE 0 END)::BIGINT m2,
        |  sum(CASE WHEN q >= 45 THEN 1 ELSE 0 END)::BIGINT m3,
        |  sum(CASE WHEN f >= '1998-01' THEN 1 ELSE 0 END)::BIGINT m4
        |  FROM li),
        |rep AS (
        |  SELECT 'price_ge_50k' pred, n_files, pr1 n_pruned, sc1 rows_scanned,
        |         (SELECT m1 FROM ex) n_match FROM pa
        |  UNION ALL SELECT 'orderkey_1k_2k', n_files, pr2, sc2,
        |         (SELECT m2 FROM ex) FROM pa
        |  UNION ALL SELECT 'quantity_ge_45', n_files, pr3, sc3,
        |         (SELECT m3 FROM ex) FROM pa
        |  UNION ALL SELECT 'shipdate_ge_1998', n_files, pr4, sc4,
        |         (SELECT m4 FROM ex) FROM pa)
        |SELECT pred, n_files, n_pruned, rows_scanned, n_match,
        |       CASE WHEN n_match > 0
        |            THEN (1000 * rows_scanned) // n_match END AS amp_pm
        |FROM rep ORDER BY pred""".stripMargin,
    // q204: wedge join minus direct arcs minus self, distinct ends.
    "q204_two_hop_reach" ->
      s"""WITH $TradeGraphCte,
         |w AS (SELECT DISTINCT x.src a, y.dst b
         |      FROM e x JOIN e y ON x.dst = y.src
         |      WHERE x.src != y.dst),
         |r2 AS (SELECT w.a, count(*)::BIGINT reach2 FROM w
         |       WHERE NOT EXISTS (SELECT 1 FROM e
         |                         WHERE e.src = w.a AND e.dst = w.b)
         |       GROUP BY 1),
         |deg AS (SELECT src node, count(*)::BIGINT degree FROM e GROUP BY 1)
         |SELECT d.node, d.degree, coalesce(r2.reach2, 0)::BIGINT AS reach2
         |FROM deg d LEFT JOIN r2 ON r2.a = d.node
         |ORDER BY d.node""".stripMargin,
    // q205: one conditional-agg pass; windows anchored at max day.
    "q205_churn_labels" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |                  event_type
        |           FROM events),
        |mx AS (SELECT max(day) md FROM e),
        |agg AS (SELECT user_id,
        |  sum(CASE WHEN day BETWEEN mx.md - 13 AND mx.md - 7
        |      THEN 1 ELSE 0 END)::BIGINT n_events_obs,
        |  count(DISTINCT CASE WHEN day BETWEEN mx.md - 13 AND mx.md - 7
        |      THEN day END)::BIGINT active_days_obs,
        |  sum(CASE WHEN day BETWEEN mx.md - 13 AND mx.md - 7
        |       AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END)::BIGINT n_purchases_obs,
        |  max(CASE WHEN day BETWEEN mx.md - 13 AND mx.md - 7
        |      THEN day END) last_obs_day,
        |  max(mx.md) md,
        |  sum(CASE WHEN day >= mx.md - 6 AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END)::BIGINT n_label
        |  FROM e, mx GROUP BY 1)
        |SELECT user_id, n_events_obs, active_days_obs, n_purchases_obs,
        |       (md - 7 - last_obs_day)::BIGINT AS gap_days,
        |       (CASE WHEN n_label = 0 THEN 1 ELSE 0 END)::BIGINT AS churned
        |FROM agg WHERE n_events_obs > 0 ORDER BY user_id""".stripMargin,
    // q206: the identical integer assignment hash; chi-square SRM via
    // (2o - n)^2 // (2n).
    "q206_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |a AS (SELECT exp,
        |        CASE WHEN ((user_id % 1000000007 + exp * 1000003)
        |                   * 2654435761) % 1000 < 500
        |             THEN 'a' ELSE 'b' END arm
        |      FROM u, unnest(generate_series(0, 4)) t(exp)),
        |c AS (SELECT exp::BIGINT exp, arm, count(*)::BIGINT n_users
        |      FROM a GROUP BY 1, 2),
        |t AS (SELECT exp, sum(n_users)::BIGINT n FROM c GROUP BY 1)
        |SELECT c.exp, c.arm, c.n_users,
        |       (1000 * t.n) // 2 AS expected_milli,
        |       (1000 * (2 * c.n_users - t.n) * (2 * c.n_users - t.n))
        |         // (2 * t.n) AS chi2_contrib_milli
        |FROM c JOIN t USING (exp)
        |ORDER BY c.exp, c.arm""".stripMargin,
    // q207: train-split co-occurrence, window top-3 per item, hit =
    // recommended part present elsewhere in the held-out basket.
    "q207_rec_eval" ->
      """WITH items AS (SELECT DISTINCT l_orderkey ok, l_partkey p
        |               FROM lineitem),
        |tr AS (SELECT * FROM items WHERE ok % 5 != 0),
        |te AS (SELECT * FROM items WHERE ok % 5 = 0),
        |pr AS (SELECT a.p pa, b.p pb, count(*)::BIGINT c
        |       FROM tr a JOIN tr b ON a.ok = b.ok AND a.p != b.p
        |       GROUP BY 1, 2),
        |recs AS (SELECT pa item, pb rec, rk FROM
        |    (SELECT pa, pb, row_number() OVER
        |       (PARTITION BY pa ORDER BY c DESC, pb)::BIGINT rk FROM pr)
        |    WHERE rk <= 3),
        |cand AS (SELECT te.ok, recs.rec, recs.rk
        |         FROM te JOIN recs ON recs.item = te.p)
        |SELECT cand.rk AS rank, count(*)::BIGINT n_recs,
        |       sum(CASE WHEN EXISTS (SELECT 1 FROM te
        |                WHERE te.ok = cand.ok AND te.p = cand.rec)
        |           THEN 1 ELSE 0 END)::BIGINT n_hits,
        |       ((1000 * sum(CASE WHEN EXISTS (SELECT 1 FROM te
        |                WHERE te.ok = cand.ok AND te.p = cand.rec)
        |           THEN 1 ELSE 0 END)) // count(*))::BIGINT AS hit_pm
        |FROM cand GROUP BY 1 ORDER BY rank""".stripMargin,
    // q208: endpoint-degree moments over arcs, signed r^2 in HUGEINT.
    "q208_assortativity" ->
      s"""WITH $TradeGraphCte,
         |deg AS (SELECT src, count(*)::BIGINT dg FROM e GROUP BY 1),
         |xy AS (SELECT a.dg dx, b.dg dy FROM e
         |       JOIN deg a ON a.src = e.src JOIN deg b ON b.src = e.dst),
         |m AS (SELECT count(*)::HUGEINT n, sum(dx)::HUGEINT sx,
         |             sum(dy)::HUGEINT sy, sum(dx::HUGEINT * dy) sxy,
         |             sum(dx::HUGEINT * dx) sxx, sum(dy::HUGEINT * dy) syy
         |      FROM xy)
         |SELECT n::BIGINT AS n_arcs,
         |  (CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) = 0 THEN NULL
         |   ELSE (CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END) *
         |     ((1000::HUGEINT * (n*sxy - sx*sy) * (n*sxy - sx*sy))
         |      // ((n*sxx - sx*sx) * (n*syy - sy*sy)))
         |   END)::BIGINT AS assort_r2_signed_milli
         |FROM m""".stripMargin,
    // q209: confusion cells over the SHARED q148 prediction oracle.
    "q209_nb_confusion" ->
      s"""WITH p AS ($NbClassifySql),
         |cells AS (SELECT lang, pred, count(*)::BIGINT n FROM p GROUP BY 1, 2),
         |r AS (SELECT lang lg, sum(n)::BIGINT rt FROM cells GROUP BY 1),
         |c AS (SELECT pred pd, sum(n)::BIGINT ct FROM cells GROUP BY 1)
         |SELECT cells.lang, cells.pred, cells.n,
         |       (1000 * cells.n) // r.rt AS recall_share_pm,
         |       (1000 * cells.n) // c.ct AS precision_share_pm
         |FROM cells JOIN r ON r.lg = cells.lang JOIN c ON c.pd = cells.pred
         |ORDER BY cells.lang, cells.pred""".stripMargin,
    // q210: epoch-day weekday ((day+3)%7, Monday=0), share and
    // uniform-week deviation.
    "q210_dow_profile" ->
      """WITH e AS (SELECT event_type,
        |           ((epoch_ns(ts) // 86400000000000) + 3) % 7 AS dow
        |           FROM events),
        |cells AS (SELECT event_type, dow, count(*)::BIGINT n
        |          FROM e GROUP BY 1, 2),
        |t AS (SELECT event_type et, sum(n)::BIGINT t FROM cells GROUP BY 1)
        |SELECT cells.event_type, cells.dow, cells.n,
        |       (1000 * cells.n) // t.t AS share_pm,
        |       (1000 * (7 * cells.n - t.t)) // t.t AS dev_milli
        |FROM cells JOIN t ON t.et = cells.event_type
        |ORDER BY cells.event_type, cells.dow""".stripMargin,
    // q211: digit off the decimal string of exact cents; expected
    // permille as the 9 hardcoded floor(1000*log10(1+1/d)) literals
    // (no cross-engine transcendental). CASE literals cast ::BIGINT —
    // DuckDB would otherwise type them int32 vs Spark's int64.
    "q211_benford_audit" ->
      """WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |             AS cents FROM lineitem),
        |cells AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1)
        |                 AS BIGINT) AS digit, count(*)::BIGINT AS n
        |          FROM c WHERE cents > 0 GROUP BY 1),
        |t AS (SELECT sum(n)::BIGINT AS t FROM cells)
        |SELECT cells.digit, cells.n,
        |       ((1000 * cells.n) // t.t)::BIGINT AS share_pm,
        |       (CASE cells.digit WHEN 1 THEN 301 WHEN 2 THEN 176
        |         WHEN 3 THEN 124 WHEN 4 THEN 96 WHEN 5 THEN 79
        |         WHEN 6 THEN 66 WHEN 7 THEN 57 WHEN 8 THEN 51
        |         ELSE 45 END)::BIGINT AS expected_pm,
        |       ((1000 * cells.n) // t.t
        |        - CASE cells.digit WHEN 1 THEN 301 WHEN 2 THEN 176
        |           WHEN 3 THEN 124 WHEN 4 THEN 96 WHEN 5 THEN 79
        |           WHEN 6 THEN 66 WHEN 7 THEN 57 WHEN 8 THEN 51
        |           ELSE 45 END)::BIGINT AS dev_milli
        |FROM cells, t ORDER BY cells.digit""".stripMargin,
    // q212: subject set is pure key arithmetic (every 97th identity);
    // lineitem cascades through its order's custkey via the tombstoned
    // order subset only.
    "q212_forget_cascade" ->
      """WITH ev AS (SELECT 'events' AS tbl, count(*)::BIGINT AS n_rows,
        |         sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)::BIGINT
        |           AS n_del,
        |         count(DISTINCT CASE WHEN user_id % 97 = 0 THEN user_id
        |           END)::BIGINT AS n_subjects FROM events),
        |cu AS (SELECT 'customer', count(*)::BIGINT,
        |         sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)::BIGINT,
        |         count(DISTINCT CASE WHEN c_custkey % 97 = 0 THEN c_custkey
        |           END)::BIGINT FROM customer),
        |orr AS (SELECT 'orders', count(*)::BIGINT,
        |         sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END)::BIGINT,
        |         count(DISTINCT CASE WHEN o_custkey % 97 = 0 THEN o_custkey
        |           END)::BIGINT FROM orders),
        |li AS (SELECT 'lineitem', count(*)::BIGINT,
        |         sum(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0
        |           END)::BIGINT,
        |         count(DISTINCT o.o_custkey)::BIGINT
        |       FROM lineitem l LEFT JOIN
        |         (SELECT o_orderkey, o_custkey FROM orders
        |          WHERE o_custkey % 97 = 0) o
        |         ON l.l_orderkey = o.o_orderkey),
        |u AS (SELECT * FROM ev UNION ALL SELECT * FROM cu
        |      UNION ALL SELECT * FROM orr UNION ALL SELECT * FROM li)
        |SELECT tbl, n_rows, n_del, (n_rows - n_del)::BIGINT AS n_kept,
        |       ((1000 * n_del) // n_rows)::BIGINT AS del_pm, n_subjects
        |FROM u ORDER BY tbl""".stripMargin,
    // q213: plain window cumsum where Spark runs the two-pass; chunk
    // ids are integer division on the running offset.
    "q213_context_packing" ->
      """WITH t AS (SELECT doc_id, len(regexp_split_to_array(text, ' '))::BIGINT n
        |           FROM documents),
        |o AS (SELECT doc_id, n,
        |        coalesce(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT toff
        |      FROM t)
        |SELECT doc_id, n AS n_tok, toff AS tok_offset,
        |       (toff // 128)::BIGINT AS first_chunk,
        |       ((toff + n - 1) // 128)::BIGINT AS last_chunk,
        |       ((toff + n - 1) // 128 - toff // 128 + 1)::BIGINT AS n_chunks
        |FROM o ORDER BY doc_id""".stripMargin,
    // q214: first-occurrence via per-term min doc, running totals via
    // window cumsum.
    // q214: list-slice fingerprints via the shared polyhash macro;
    // per-source winner via row_number on (count desc, hash).
    "q214_boilerplate_audit" ->
      s"""WITH t AS (SELECT doc_id, source, regexp_split_to_array(text, ' ') tk
         |           FROM documents),
         |b AS (SELECT source,
         |        ${H("array_to_string(tk[1:8], ' ')")} pre,
         |        ${H("array_to_string(tk[-8:], ' ')")} suf
         |      FROM t WHERE len(tk) >= 8),
         |n AS (SELECT source, count(*)::BIGINT n_docs FROM b GROUP BY 1),
         |pt AS (SELECT source, h, c FROM
         |        (SELECT source, pre h, count(*)::BIGINT c,
         |           row_number() OVER (PARTITION BY source
         |             ORDER BY count(*) DESC, pre) rn
         |         FROM b GROUP BY 1, 2) WHERE rn = 1),
         |st AS (SELECT source, h, c FROM
         |        (SELECT source, suf h, count(*)::BIGINT c,
         |           row_number() OVER (PARTITION BY source
         |             ORDER BY count(*) DESC, suf) rn
         |         FROM b GROUP BY 1, 2) WHERE rn = 1)
         |SELECT n.source, n.n_docs,
         |       pt.h AS top_prefix_hash, pt.c AS n_prefix,
         |       ((1000 * pt.c) // n.n_docs)::BIGINT AS prefix_share_pm,
         |       st.h AS top_suffix_hash, st.c AS n_suffix,
         |       ((1000 * st.c) // n.n_docs)::BIGINT AS suffix_share_pm
         |FROM n JOIN pt ON pt.source = n.source
         |     JOIN st ON st.source = n.source
         |ORDER BY n.source""".stripMargin,
    // q215: kappa in HUGEINT with the sign decomposed so // (floor)
    // matches Spark's div (truncation) on non-negative operands.
    "q215_classifier_kappa" ->
      s"""WITH hh AS (SELECT doc_id,
         |  CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_es THEN 'de' ELSE 'es' END p1
         |  FROM (SELECT doc_id,
         |    len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT s_en,
         |    len(list_filter(tk, x -> x IN ('der','die','das','und','ist','zu','ein')))::BIGINT s_de,
         |    len(list_filter(tk, x -> x IN ('el','la','de','y','es','un','en')))::BIGINT s_es
         |   FROM (SELECT doc_id, regexp_split_to_array(text, ' ') tk
         |         FROM documents))),
         |p AS ($NbClassifySql),
         |j AS (SELECT hh.p1, p.pred p2 FROM hh JOIN p ON p.doc_id = hh.doc_id),
         |ag AS (SELECT count(*)::BIGINT n,
         |         sum(CASE WHEN p1 = p2 THEN 1 ELSE 0 END)::BIGINT a FROM j),
         |r AS (SELECT p1 lab, count(*)::BIGINT r FROM j GROUP BY 1),
         |c AS (SELECT p2 lab, count(*)::BIGINT c FROM j GROUP BY 1),
         |sv AS (SELECT coalesce(sum(r.r::HUGEINT * c.c), 0) s
         |       FROM r JOIN c ON c.lab = r.lab)
         |SELECT ag.n AS n_docs, ag.a AS n_agree, sv.s::BIGINT AS s_chance,
         |       (CASE WHEN ag.n::HUGEINT * ag.n - sv.s = 0 THEN NULL
         |         WHEN ag.a::HUGEINT * ag.n - sv.s < 0
         |         THEN -((1000 * (sv.s - ag.a::HUGEINT * ag.n))
         |                // (ag.n::HUGEINT * ag.n - sv.s))
         |         ELSE (1000 * (ag.a::HUGEINT * ag.n - sv.s))
         |              // (ag.n::HUGEINT * ag.n - sv.s)
         |        END)::BIGINT AS kappa_milli
         |FROM ag, sv""".stripMargin,
    // q216: the doc→chunk fan-out via generate_series, then one
    // chunk-keyed agg.
    "q216_chunk_manifest" ->
      """WITH t AS (SELECT doc_id, len(regexp_split_to_array(text, ' '))::BIGINT n
        |           FROM documents),
        |o AS (SELECT doc_id, n,
        |        coalesce(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT toff
        |      FROM t),
        |x AS (SELECT doc_id, n, toff,
        |        unnest(generate_series(toff // 128, (toff + n - 1) // 128))
        |          AS chunk_id
        |      FROM o)
        |SELECT chunk_id::BIGINT AS chunk_id, count(*)::BIGINT AS n_docs,
        |       min(doc_id)::BIGINT AS first_doc,
        |       max(doc_id)::BIGINT AS last_doc,
        |       sum(CASE WHEN toff // 128 = chunk_id THEN 1 ELSE 0 END)::BIGINT
        |         AS n_starts
        |FROM x GROUP BY 1 ORDER BY chunk_id""".stripMargin,
    // q217: the q134 integer quality score, source-partitioned greedy
    // prefix including the budget-crossing doc.
    "q217_token_budget" ->
      """WITH s AS (SELECT doc_id, source, len(tk)::BIGINT n_tok,
        |         len(list_distinct(tk))::BIGINT n_uniq,
        |         len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
        |       FROM (SELECT doc_id, source, regexp_split_to_array(text, ' ') tk
        |             FROM documents)),
        |q AS (SELECT doc_id, source, n_tok,
        |        ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
        |         + (300 * least(n_tok, 200)) // 200)::BIGINT q_milli
        |      FROM s),
        |c AS (SELECT source, n_tok, q_milli,
        |        sum(n_tok) OVER (PARTITION BY source
        |          ORDER BY q_milli DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum
        |      FROM q)
        |SELECT source, count(*)::BIGINT AS n_docs_kept,
        |       sum(n_tok)::BIGINT AS tokens_kept,
        |       min(q_milli)::BIGINT AS cutoff_q_milli
        |FROM c WHERE cum - n_tok < 1000 GROUP BY 1
        |ORDER BY source""".stripMargin,
    // q218: doubled average ranks off each metric's value histogram
    // (2r = 2*before + c + 1), Pearson moments on ranks in HUGEINT,
    // sign decomposed for // vs div agreement.
    "q218_length_quality_corr" ->
      """WITH s AS (SELECT doc_id, len(tk)::BIGINT n_tok,
        |         len(list_distinct(tk))::BIGINT n_uniq,
        |         len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
        |       FROM (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |             FROM documents)),
        |q AS (SELECT doc_id, n_tok,
        |        ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
        |         + (300 * least(n_tok, 200)) // 200)::BIGINT q_milli
        |      FROM s),
        |hx AS (SELECT n_tok, count(*)::BIGINT c FROM q GROUP BY 1),
        |rx AS (SELECT n_tok,
        |         (2 * coalesce(sum(c) OVER (ORDER BY n_tok ROWS BETWEEN
        |            UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1)::BIGINT r
        |       FROM hx),
        |hy AS (SELECT q_milli, count(*)::BIGINT c FROM q GROUP BY 1),
        |ry AS (SELECT q_milli,
        |         (2 * coalesce(sum(c) OVER (ORDER BY q_milli ROWS BETWEEN
        |            UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1)::BIGINT r
        |       FROM hy),
        |m AS (SELECT count(*)::HUGEINT n, sum(rx.r)::HUGEINT sx,
        |        sum(ry.r)::HUGEINT sy, sum(rx.r::HUGEINT * ry.r) sxy,
        |        sum(rx.r::HUGEINT * rx.r) sxx, sum(ry.r::HUGEINT * ry.r) syy
        |      FROM q JOIN rx ON rx.n_tok = q.n_tok
        |           JOIN ry ON ry.q_milli = q.q_milli)
        |SELECT n::BIGINT AS n_docs,
        |  (CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
        |    WHEN n * sxy - sx * sy < 0
        |    THEN -((1000 * (sx * sy - n * sxy) * (sx * sy - n * sxy))
        |           // ((n * sxx - sx * sx) * (n * syy - sy * sy)))
        |    ELSE (1000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
        |         // ((n * sxx - sx * sx) * (n * syy - sy * sy))
        |   END)::BIGINT AS rho2_milli
        |FROM m""".stripMargin,
    // q219: per-source CDF on the shared corpus grid (zero-fill cross
    // join), cross-multiplied gap in HUGEINT, peak via row_number.
    "q219_source_length_drift" ->
      """WITH t AS (SELECT doc_id, source,
        |         len(regexp_split_to_array(text, ' '))::BIGINT n_tok
        |       FROM documents),
        |cells AS (SELECT source, n_tok, count(*)::BIGINT c FROM t GROUP BY 1, 2),
        |grid AS (SELECT n_tok g, sum(c)::BIGINT cc FROM cells GROUP BY 1),
        |gcum AS (SELECT g, cc, sum(cc) OVER (ORDER BY g)::BIGINT cumAll
        |         FROM grid),
        |tot AS (SELECT sum(c)::BIGINT nAll FROM cells),
        |st AS (SELECT source, sum(c)::BIGINT nS FROM cells GROUP BY 1),
        |f AS (SELECT st.source src, st.nS, gcum.g, gcum.cumAll,
        |        coalesce(cells.c, 0)::BIGINT c
        |      FROM st CROSS JOIN gcum LEFT JOIN cells
        |        ON cells.source = st.source AND cells.n_tok = gcum.g),
        |cum AS (SELECT src, nS, g, cumAll,
        |          sum(c) OVER (PARTITION BY src ORDER BY g)::BIGINT cumS
        |        FROM f),
        |gaps AS (SELECT cum.src, cum.nS, (tot.nAll - cum.nS) nR, cum.g,
        |           abs(cumS::HUGEINT * (tot.nAll - cum.nS)
        |               - (cumAll - cumS)::HUGEINT * cum.nS) gap
        |         FROM cum, tot),
        |pk AS (SELECT src, g, row_number() OVER (PARTITION BY src
        |         ORDER BY gap DESC, g) rn FROM gaps WHERE gap > 0)
        |SELECT gaps.src AS source, gaps.nS AS n_docs,
        |       ((1000 * max(gaps.gap)) // (max(gaps.nS)::HUGEINT
        |         * max(gaps.nR)))::BIGINT AS ks_pm,
        |       max(pk.g) AS peak_len
        |FROM gaps LEFT JOIN pk ON pk.src = gaps.src AND pk.rn = 1
        |GROUP BY 1, 2 ORDER BY source""".stripMargin,
    // q220: distinct (source, term) then a term-keyed pair join.
    "q220_source_vocab_overlap" ->
      """WITH sv AS (SELECT DISTINCT source, w FROM
        |        (SELECT source, unnest(regexp_split_to_array(text, ' ')) w
        |         FROM documents)),
        |sz AS (SELECT source, count(*)::BIGINT v FROM sv GROUP BY 1),
        |cm AS (SELECT a.source sa, b.source sb, count(*)::BIGINT cm
        |       FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT cm.sa AS source_a, cm.sb AS source_b,
        |       za.v AS vocab_a, zb.v AS vocab_b, cm.cm AS n_common,
        |       ((1000 * cm.cm) // (za.v + zb.v - cm.cm))::BIGINT AS jaccard_pm
        |FROM cm JOIN sz za ON za.source = cm.sa
        |     JOIN sz zb ON zb.source = cm.sb
        |ORDER BY source_a, source_b""".stripMargin,
    // q221: the q49 cluster recurrence (shared CTE) joined to per-doc
    // token counts; per-doc 1/cluster_n weights in exact milli.
    "q221_dedup_yield" ->
      s"""WITH $NearDupClusterCte,
         |dt AS (SELECT doc_id, source,
         |         len(regexp_split_to_array(text, ' '))::BIGINT n_tok
         |       FROM documents),
         |jy AS (SELECT dt.source, dt.n_tok, cn.cluster_n
         |       FROM dt JOIN lbl ON lbl.doc_id = dt.doc_id
         |            JOIN cn ON cn.cluster_id = lbl.cluster_id)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |       sum(n_tok)::BIGINT AS raw_tokens,
         |       sum(CASE WHEN cluster_n > 1 THEN 1 ELSE 0 END)::BIGINT
         |         AS n_dup_docs,
         |       sum((1000 * n_tok) // cluster_n)::BIGINT AS eff_tokens_milli,
         |       (sum((1000 * n_tok) // cluster_n) // sum(n_tok))::BIGINT
         |         AS yield_pm
         |FROM jy GROUP BY 1 ORDER BY source""".stripMargin,
    // q222: the q23 minhash/band scheme replayed, then per-band bucket
    // histogram stats; pair mass per bucket in HUGEINT.
    "q222_lsh_bucket_balance" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
         |           FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk,
         |             unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |mh AS (SELECT doc_id, j,
         |         min(((2*j + 1) * h + 12345 + 7919*j) % 1000000007) m
         |       FROM sh, generate_series(0, 15) g(j) GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // 4 AS b,
         |          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
         |                      (acc, x) -> (acc * 131 + x) % 1000000007) AS key
         |          FROM mh GROUP BY doc_id, j // 4),
         |bk AS (SELECT b, key, count(*)::BIGINT n FROM bands GROUP BY 1, 2)
         |SELECT b::BIGINT AS band, count(*)::BIGINT AS n_buckets,
         |       max(n) AS max_bucket,
         |       sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_singletons,
         |       (sum((n::HUGEINT * (n - 1)) // 2))::BIGINT AS cand_pairs
         |FROM bk GROUP BY 1 ORDER BY band""".stripMargin,
    // q223: the sequential survival recurrence replayed via
    // list_reduce over (d,n) pairs packed into one BIGINT each
    // (d*10^10 + n; acc stays <= 10^6 * n < 2^63) — prefix i gives
    // day i's survival; O(days^2) lambda work on a calendar-bounded
    // grid.
    "q223_kaplan_meier" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |           FROM events),
        |u AS (SELECT user_id, min(day) f, max(day) l FROM e GROUP BY 1),
        |mx AS (SELECT max(l) md FROM u),
        |en AS (SELECT f AS day, count(*)::BIGINT e FROM u GROUP BY 1),
        |ex AS (SELECT l AS day, count(*)::BIGINT x FROM u GROUP BY 1),
        |grid AS (SELECT f AS day FROM u UNION SELECT l FROM u),
        |g AS (SELECT grid.day, coalesce(en.e, 0)::BIGINT e,
        |        coalesce(ex.x, 0)::BIGINT x
        |      FROM grid LEFT JOIN en ON en.day = grid.day
        |           LEFT JOIN ex ON ex.day = grid.day),
        |c AS (SELECT day, e, x,
        |        sum(e) OVER (ORDER BY day)::BIGINT cumE,
        |        coalesce(sum(x) OVER (ORDER BY day ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT cumXb
        |      FROM g),
        |dd AS (SELECT c.day, (cumE - cumXb) n,
        |         CASE WHEN c.day < mx.md THEN x ELSE 0 END d, x
        |       FROM c, mx),
        |lst AS (SELECT list(d * 10000000000 + n ORDER BY day) l,
        |          list(day ORDER BY day) ds, list(n ORDER BY day) ns,
        |          list(d ORDER BY day) dds, list(x ORDER BY day) xs
        |        FROM dd)
        |SELECT ds[i]::BIGINT AS day, ns[i]::BIGINT AS at_risk,
        |       dds[i]::BIGINT AS n_churned, xs[i]::BIGINT AS n_ended,
        |       list_reduce(list_prepend(1000000::BIGINT, l[1:i]),
        |         (acc, v) -> (acc * ((v % 10000000000) - (v // 10000000000)))
        |                     // (v % 10000000000))::BIGINT AS survival_micro
        |FROM lst, unnest(generate_series(1, len(ds))) t(i)
        |ORDER BY day""".stripMargin,
    // q224: q124's stage CTEs, latencies floored to seconds, q151's
    // exact ceil-percentile formula.
    "q224_funnel_latency" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts))::BIGINT AS view_us
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(v.view_us) view_us,
        |        min(epoch_us(e.ts))::BIGINT AS click_us
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.view_us
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(c.click_us) click_us,
        |        min(epoch_us(e.ts))::BIGINT AS purchase_us
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.click_us
        |      GROUP BY 1),
        |lat AS (SELECT '1_view_to_click' stage,
        |          (click_us - view_us) // 1000000 lat_s FROM c
        |        UNION ALL
        |        SELECT '2_click_to_purchase',
        |          (purchase_us - click_us) // 1000000 FROM p),
        |h AS (SELECT stage, lat_s, count(*)::BIGINT c FROM lat GROUP BY 1, 2),
        |cum AS (SELECT stage, lat_s, c,
        |          sum(c) OVER (PARTITION BY stage ORDER BY lat_s)::BIGINT cum,
        |          sum(c) OVER (PARTITION BY stage)::BIGINT n
        |        FROM h)
        |SELECT stage, max(n) AS n_conversions,
        |       min(lat_s)::BIGINT AS min_s, max(lat_s)::BIGINT AS max_s,
        |       min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN lat_s END)::BIGINT AS p50_s,
        |       min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN lat_s END)::BIGINT AS p90_s,
        |       min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN lat_s END)::BIGINT AS p99_s
        |FROM cum GROUP BY 1 ORDER BY stage""".stripMargin,
    // q225: the q32 pseudo-decode replay + ceil-division tiling.
    "q225_tile_grid_plan" ->
      s"""WITH t AS (SELECT doc_id, text, ${H("text")} AS h FROM documents),
         |m AS (SELECT doc_id,
         |      (['jpeg', 'png', 'webp'])[(h % 3)::INT + 1] AS format,
         |      320 + (h % 8) * 160 AS width,
         |      240 + (h % 6) * 120 AS height FROM t),
         |g AS (SELECT doc_id, format, width, height,
         |      (width + 223) // 224 tx, (height + 223) // 224 ty FROM m)
         |SELECT doc_id, format, width::BIGINT AS width,
         |  height::BIGINT AS height, tx::BIGINT AS tiles_x,
         |  ty::BIGINT AS tiles_y, (tx * ty)::BIGINT AS n_tiles,
         |  (tx * 224 - width)::BIGINT AS pad_right,
         |  (ty * 224 - height)::BIGINT AS pad_bottom,
         |  (tx * ty * 196)::BIGINT AS n_patches,
         |  (tx * ty * 224 * 224 * 3)::BIGINT AS decode_bytes
         |FROM g ORDER BY doc_id""".stripMargin,
    // q226: the virtual-PCM contract (s16le mono 16 kHz, 64-byte
    // header) on the text-byte corpus; window 10 ms, hop 8 ms.
    "q226_audio_chunk_plan" ->
      """WITH t AS (SELECT doc_id, octet_length(text::BLOB)::BIGINT bl
        |           FROM documents),
        |a AS (SELECT doc_id, 16000::BIGINT sr, 1::BIGINT ch,
        |        greatest(bl - 64, 0) // 2 AS n_samples FROM t),
        |b AS (SELECT doc_id, sr, ch,
        |        ((1000 * n_samples) // sr)::BIGINT AS duration_ms
        |      FROM a WHERE (1000 * n_samples) // sr > 0),
        |c AS (SELECT doc_id, sr, ch, duration_ms,
        |        1 + (greatest(duration_ms - 10, 0) + 7) // 8 AS n_chunks
        |      FROM b),
        |x AS (SELECT doc_id, sr, ch, duration_ms,
        |        unnest(generate_series(0, n_chunks - 1)) chunk FROM c)
        |SELECT doc_id, sr, ch, duration_ms, chunk::BIGINT AS chunk,
        |  (chunk * 8)::BIGINT AS start_ms,
        |  least(chunk * 8 + 10, duration_ms)::BIGINT AS end_ms,
        |  (64 + ((chunk * 8 * sr) // 1000) * 2 * ch)::BIGINT AS start_byte,
        |  (((least(chunk * 8 + 10, duration_ms) - chunk * 8) * sr)
        |   // 1000 * 2 * ch)::BIGINT AS n_bytes
        |FROM x ORDER BY doc_id, chunk""".stripMargin,
    // q227: level-1 prefilter then the three-way basket self-join.
    "q227_copurchase_triples" ->
      // two MATERIALIZED binary joins, each anchored on the ok
      // equality: the 3-way form let DuckDB's join reorderer pick the
      // `b.p < c.p` inequality FIRST (a piecewise merge join over all
      // pairs of rows — measured 80+ GB of spill at sf0.1 before this
      // barrier; 2 s after)
      """WITH items AS (SELECT DISTINCT l_orderkey ok, l_partkey p
        |               FROM lineitem),
        |fr AS (SELECT p FROM items GROUP BY p HAVING count(*) >= 2),
        |fi AS MATERIALIZED (SELECT ok, items.p
        |      FROM items JOIN fr ON fr.p = items.p),
        |pr AS MATERIALIZED (SELECT a.ok, a.p pa, b.p pb
        |      FROM fi a JOIN fi b ON b.ok = a.ok AND a.p < b.p)
        |SELECT pa, pb, c.p AS pc, count(*)::BIGINT AS support
        |FROM pr JOIN fi c ON c.ok = pr.ok AND pr.pb < c.p
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY support DESC, pa, pb, pc""".stripMargin,
    // q228: interval -> month-boundary fan-out via generate_series,
    // then one month-keyed agg; value in exact cents.
    "q228_backlog_snapshots" ->
      """WITH cl AS (SELECT l_orderkey, max(l_shipdate) cls
        |            FROM lineitem GROUP BY 1),
        |o AS (SELECT o_orderdate,
        |        CAST(round(o_totalprice * 100) AS BIGINT) cents,
        |        (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT m0,
        |        (year(cl.cls) * 12 + month(cl.cls) - 1)::BIGINT m1
        |      FROM orders JOIN cl ON cl.l_orderkey = orders.o_orderkey),
        |x AS (SELECT o_orderdate, cents,
        |        unnest(generate_series(m0 + 1, m1)) m
        |      FROM o WHERE m1 >= m0 + 1),
        |y AS (SELECT m, make_date((m // 12)::INT, (m % 12 + 1)::INT, 1) t,
        |        o_orderdate, cents FROM x)
        |SELECT m::BIGINT AS month_idx, max(t) AS snapshot_date,
        |       count(*)::BIGINT AS n_open,
        |       sum(cents)::BIGINT AS open_value_cents,
        |       max(date_diff('day', CAST(o_orderdate AS DATE), t))::BIGINT
        |         AS max_age_days
        |FROM y GROUP BY 1 ORDER BY month_idx""".stripMargin,
    // q229: custkey-keyed cohort min, (cohort, offset) agg, window
    // cumulative over the calendar-bounded triangle; exact cents.
    "q229_cohort_ltv" ->
      // (`off` is reserved in DuckDB — the offset column is `moff`)
      """WITH o AS (SELECT o_custkey ck,
        |        CAST(round(o_totalprice * 100) AS BIGINT) cents,
        |        (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT m
        |      FROM orders),
        |ch AS (SELECT ck, min(m) cm FROM o GROUP BY 1),
        |sz AS (SELECT cm, count(*)::BIGINT cohort_size FROM ch GROUP BY 1),
        |cells AS (SELECT ch.cm, o.m - ch.cm moff,
        |        count(DISTINCT o.ck)::BIGINT n_active,
        |        sum(cents)::BIGINT rev_cents
        |      FROM o JOIN ch ON ch.ck = o.ck GROUP BY 1, 2)
        |SELECT cells.cm AS cohort_month, moff AS month_offset, n_active,
        |       rev_cents,
        |       (sum(rev_cents) OVER (PARTITION BY cells.cm ORDER BY moff
        |          ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_rev_cents,
        |       cohort_size,
        |       ((sum(rev_cents) OVER (PARTITION BY cells.cm ORDER BY moff
        |          ROWS UNBOUNDED PRECEDING)) // cohort_size)::BIGINT
        |         AS ltv_cents_per_user
        |FROM cells JOIN sz ON sz.cm = cells.cm
        |ORDER BY cohort_month, month_offset""".stripMargin,
    // q230: (part, month) unit prices in floored milli-cents, brand's
    // own min month as base, matched-sample inner join, HUGEINT-safe
    // numerators cast back to BIGINT.
    "q230_price_index" ->
      """WITH pm AS (SELECT l_partkey pk,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        ((1000 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)))
        |          // sum(CAST(round(l_quantity) AS BIGINT)))::BIGINT unit_mc,
        |        sum(CAST(round(l_quantity) AS BIGINT))::BIGINT sq
        |      FROM lineitem GROUP BY 1, 2),
        |bp AS (SELECT p_brand brand, pk, m, unit_mc, sq
        |      FROM pm JOIN part ON p_partkey = pk),
        |b0 AS (SELECT brand, min(m) m0 FROM bp GROUP BY 1),
        |base AS (SELECT bp.brand, pk, sq q0, unit_mc p0
        |      FROM bp JOIN b0 ON b0.brand = bp.brand AND bp.m = b0.m0)
        |SELECT bp.brand, bp.m AS month_idx, count(*)::BIGINT AS n_parts,
        |       ((1000 * sum(CAST(q0 AS HUGEINT) * unit_mc))
        |          // sum(CAST(q0 AS HUGEINT) * p0))::BIGINT AS index_milli
        |FROM bp JOIN base ON base.brand = bp.brand AND base.pk = bp.pk
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q231: (part, supplier) agg then the two-pass arg-min the struct
    // ordering gives Spark in one agg: min unit, then min suppkey
    // among the minimum-price suppliers.
    "q231_cheapest_supplier" ->
      """WITH ps AS (SELECT l_partkey pk, l_suppkey sk,
        |        ((1000 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)))
        |          // sum(CAST(round(l_quantity) AS BIGINT)))::BIGINT unit_mc,
        |        count(*)::BIGINT n_lines
        |      FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT pk, min(unit_mc) u, count(*)::BIGINT n_suppliers,
        |        (max(unit_mc) - min(unit_mc))::BIGINT spread_mc
        |      FROM ps GROUP BY 1)
        |SELECT m.pk AS p_partkey, min(ps.sk)::BIGINT AS best_suppkey,
        |       m.u AS best_unit_mc, m.n_suppliers, m.spread_mc
        |FROM ps JOIN m ON ps.pk = m.pk AND ps.unit_mc = m.u
        |GROUP BY 1, 3, 4, 5 ORDER BY p_partkey""".stripMargin,
    // q232: per-source length histogram, strictly-before cumulatives,
    // Δ/2 moment in HUGEINT, floored milli Gini.
    "q232_length_gini" ->
      """WITH h AS (SELECT source, n_chars v, count(*)::BIGINT c
        |      FROM documents GROUP BY 1, 2),
        |w AS (SELECT source, v, c,
        |        COALESCE(sum(c) OVER (PARTITION BY source ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cb,
        |        COALESCE(sum(c * v) OVER (PARTITION BY source ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) sb
        |      FROM h)
        |SELECT source, sum(c)::BIGINT AS n_docs,
        |       (sum(c * v) // sum(c))::BIGINT AS mean_chars,
        |       ((1000 * sum(CAST(c AS HUGEINT) * (v * cb - sb)))
        |          // (CAST(sum(c) AS HUGEINT) * sum(c * v)))::BIGINT
        |         AS gini_milli
        |FROM w GROUP BY 1 ORDER BY source""".stripMargin,
    // q233: brand-month grid first, centered-year RANGE frame, full-
    // window filter, HUGEINT-safe milli ratio.
    "q233_seasonal_index" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2),
        |w AS (SELECT brand, m, rev_cents,
        |        count(*) OVER win cnt, sum(rev_cents) OVER win s
        |      FROM bm WINDOW win AS (PARTITION BY brand ORDER BY m
        |        RANGE BETWEEN 6 PRECEDING AND 5 FOLLOWING))
        |SELECT brand, m AS month_idx, rev_cents,
        |       (s // 12)::BIGINT AS ma_cents,
        |       ((CAST(12000 AS HUGEINT) * rev_cents) // s)::BIGINT
        |         AS seasonal_milli
        |FROM w WHERE cnt = 12 ORDER BY brand, month_idx""".stripMargin,
    // q234: supplier aggregates once, then the O(n²) NOT EXISTS
    // dominance test — deliberately a DIFFERENT formula from the
    // engine's sort-based prefix-min skyline.
    "q234_supplier_skyline" ->
      """WITH s AS (SELECT l_suppkey sk,
        |        ((1000 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)))
        |          // sum(CAST(round(l_quantity) AS BIGINT)))::BIGINT unit_mc,
        |        (CASE WHEN sum(date_diff('day', CAST(o_orderdate AS DATE),
        |            CAST(l_shipdate AS DATE))) >= 0
        |          THEN (1000 * sum(date_diff('day', CAST(o_orderdate AS DATE),
        |            CAST(l_shipdate AS DATE)))) // count(*)
        |          ELSE -((1000 * -sum(date_diff('day', CAST(o_orderdate AS DATE),
        |            CAST(l_shipdate AS DATE)))) // count(*)) END)::BIGINT lag_md,
        |        count(*)::BIGINT n_lines
        |      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |      GROUP BY 1)
        |SELECT a.sk AS suppkey, a.unit_mc, a.lag_md, a.n_lines
        |FROM s a WHERE NOT EXISTS (SELECT 1 FROM s b
        |  WHERE b.unit_mc <= a.unit_mc AND b.lag_md <= a.lag_md
        |    AND (b.unit_mc < a.unit_mc OR b.lag_md < a.lag_md))
        |ORDER BY suppkey""".stripMargin,
    // q235: calendar-bounded pair slopes, sign-decomposed floors,
    // lower-median pick by deterministic rank.
    "q235_theilsen_trend" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2),
        |p AS (SELECT a.brand, a.m m1, b.m m2,
        |        (CASE WHEN b.rev_cents >= a.rev_cents
        |          THEN (CAST(1000 AS HUGEINT) * (b.rev_cents - a.rev_cents))
        |            // (b.m - a.m)
        |          ELSE -((CAST(1000 AS HUGEINT) * (a.rev_cents - b.rev_cents))
        |            // (b.m - a.m)) END)::BIGINT slope
        |      FROM bm a JOIN bm b ON a.brand = b.brand AND b.m > a.m),
        |r AS (SELECT brand, m1, m2, slope,
        |        row_number() OVER (PARTITION BY brand
        |          ORDER BY slope, m1, m2) rk,
        |        count(*) OVER (PARTITION BY brand) np
        |      FROM p),
        |mo AS (SELECT brand, count(*)::BIGINT n_months FROM bm GROUP BY 1)
        |SELECT r.brand, n_months, np::BIGINT AS n_pairs,
        |       slope AS trend_milli_per_month
        |FROM r JOIN mo ON mo.brand = r.brand
        |WHERE rk = (np + 1) // 2
        |ORDER BY r.brand""".stripMargin,
    // q236: gains from the exact list, hardcoded micro discounts
    // (⌊1e6/log₂(pos+1)⌋ — the q211 constant-table move), left joins
    // keep missed neighbors at gain 0.
    "q236_ndcg_eval" ->
      s"""WITH ex AS (SELECT q_id, neighbor_id,
         |        (CASE WHEN rank = 1 THEN 3 WHEN rank <= 3 THEN 2
         |          ELSE 1 END)::BIGINT g, rank
         |      FROM ($BruteTopkSql)),
         |dt(pos, dm) AS (VALUES (1, 1000000), (2, 630929), (3, 500000),
         |      (4, 430676), (5, 386852)),
         |id AS (SELECT q_id, sum(g * dm)::BIGINT idcg_micro
         |      FROM ex JOIN dt ON dt.pos = ex.rank GROUP BY 1),
         |dl AS (SELECT l.q_id, sum(COALESCE(e.g, 0) * dm)::BIGINT dcg
         |      FROM ($LshTopkSql) l JOIN dt ON dt.pos = l.rank
         |        LEFT JOIN ex e ON e.q_id = l.q_id
         |          AND e.neighbor_id = l.neighbor_id
         |      GROUP BY 1),
         |d8 AS (SELECT i.q_id, sum(COALESCE(e.g, 0) * dm)::BIGINT dcg
         |      FROM ($Int8TopkSql) i JOIN dt ON dt.pos = i.rank
         |        LEFT JOIN ex e ON e.q_id = i.q_id
         |          AND e.neighbor_id = i.neighbor_id
         |      GROUP BY 1)
         |SELECT id.q_id, idcg_micro,
         |       COALESCE(dl.dcg, 0)::BIGINT AS dcg_lsh_micro,
         |       COALESCE((1000 * dl.dcg) // idcg_micro, 0)::BIGINT
         |         AS ndcg_lsh_milli,
         |       COALESCE(d8.dcg, 0)::BIGINT AS dcg_int8_micro,
         |       COALESCE((1000 * d8.dcg) // idcg_micro, 0)::BIGINT
         |         AS ndcg_int8_milli
         |FROM id LEFT JOIN dl ON dl.q_id = id.q_id
         |  LEFT JOIN d8 ON d8.q_id = id.q_id
         |ORDER BY id.q_id""".stripMargin,
    // q237: capped session positions, two ordered self-joins, distinct
    // per session BEFORE support counting, min-support filter.
    "q237_event_seq_triples" ->
      // (`day` is reserved in DuckDB — the session day column is `dy`)
      """WITH e AS (SELECT user_id u, epoch_ns(ts) // 86400000000000 dy,
        |        event_type t, ts, event_id FROM events),
        |p AS (SELECT u, dy, t, row_number() OVER (PARTITION BY u, dy
        |        ORDER BY ts, event_id) rn FROM e),
        |cp AS MATERIALIZED (SELECT u, dy, t, rn FROM p WHERE rn <= 24),
        |pr AS MATERIALIZED (SELECT a.u, a.dy, a.t t1, b.t t2, b.rn r2
        |      FROM cp a JOIN cp b ON b.u = a.u AND b.dy = a.dy
        |        AND b.rn > a.rn),
        |tr AS (SELECT DISTINCT pr.u, pr.dy, t1, t2, c.t t3
        |      FROM pr JOIN cp c ON c.u = pr.u AND c.dy = pr.dy
        |        AND c.rn > pr.r2)
        |SELECT t1, t2, t3, count(*)::BIGINT AS support
        |FROM tr GROUP BY 1, 2, 3 HAVING count(*) >= 3
        |ORDER BY 1, 2, 3""".stripMargin,
    // q238: the q49 label recurrence + the q28 language heuristic,
    // majority by (count desc, pred desc) row_number — the same order
    // max(struct(n, pred)) induces.
    "q238_cluster_lang_mix" ->
      s"""WITH $NearDupClusterCte,
         |td AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk2
         |       FROM documents),
         |lp AS (SELECT doc_id,
         |        CASE WHEN len(list_filter(tk2, x -> x IN
         |            ('the','a','of','and','is','to','in'))) >=
         |          len(list_filter(tk2, x -> x IN
         |            ('der','die','das','und','ist','zu','ein')))
         |          AND len(list_filter(tk2, x -> x IN
         |            ('the','a','of','and','is','to','in'))) >=
         |          len(list_filter(tk2, x -> x IN
         |            ('el','la','de','y','es','un','en'))) THEN 'en'
         |        WHEN len(list_filter(tk2, x -> x IN
         |            ('der','die','das','und','ist','zu','ein'))) >=
         |          len(list_filter(tk2, x -> x IN
         |            ('el','la','de','y','es','un','en'))) THEN 'de'
         |        ELSE 'es' END pred
         |      FROM td),
         |m AS (SELECT lbl.cluster_id, pred, count(*)::BIGINT n
         |      FROM lbl JOIN cn ON cn.cluster_id = lbl.cluster_id
         |        JOIN lp ON lp.doc_id = lbl.doc_id
         |      WHERE cn.cluster_n > 1 GROUP BY 1, 2),
         |top AS (SELECT cluster_id, pred, n,
         |        row_number() OVER (PARTITION BY cluster_id
         |          ORDER BY n DESC, pred DESC) rk,
         |        sum(n) OVER (PARTITION BY cluster_id) tot,
         |        count(*) OVER (PARTITION BY cluster_id) nl
         |      FROM m)
         |SELECT cluster_id, tot::BIGINT AS n_docs, nl::BIGINT AS n_langs,
         |       pred AS maj_lang,
         |       ((1000 * (tot - n)) // tot)::BIGINT AS minority_pm
         |FROM top WHERE rk = 1 ORDER BY cluster_id""".stripMargin,
    // q239: per-order worst line lag (orderkey-keyed), month rollup,
    // HUGEINT-safe permille/milli ratios.
    "q239_perfect_order" ->
      """WITH x AS (SELECT l_orderkey ok,
        |        (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT m,
        |        max(date_diff('day', CAST(o_orderdate AS DATE),
        |          CAST(l_shipdate AS DATE))) wl
        |      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |      GROUP BY 1, 2)
        |SELECT m AS month_idx, count(*)::BIGINT AS n_orders,
        |       sum(CASE WHEN wl <= 30 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_perfect,
        |       ((1000 * sum(CASE WHEN wl <= 30 THEN 1 ELSE 0 END))
        |          // count(*))::BIGINT AS perfect_pm,
        |       (CASE WHEN sum(wl) >= 0 THEN (1000 * sum(wl)) // count(*)
        |          ELSE -((1000 * -sum(wl)) // count(*)) END)::BIGINT
        |         AS mean_worst_lag_md
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    // q240: q48's quantization, the Gram via a generate_series pair
    // grid (materialized — the q162 lesson), then the EXACT integer
    // power-iteration recurrence as chained CTEs with sign-decomposed
    // rescaling to max|v| = 1000 per round.
    "q240_principal_direction" -> {
      // every round CTE is MATERIALIZED: each vN is referenced 3× by
      // round N+1 (join + two scalar subqueries) — plain CTEs inline,
      // and the chain re-expands 3^rounds (the q162 lesson, measured
      // here as a parity hang before the keyword went in)
      val rounds = (1 to Similarity.PowerRounds).map { r =>
        s"""w$r AS MATERIALIZED (SELECT g.i, sum(g.gv * v${r - 1}.x) w
           |      FROM g JOIN v${r - 1} ON v${r - 1}.i = g.j GROUP BY 1),
           |v$r AS MATERIALIZED (SELECT i,
           |      CASE WHEN w >= 0 THEN (1000 * w) // (SELECT max(abs(w)) FROM w$r)
           |        ELSE -((1000 * -w) // (SELECT max(abs(w)) FROM w$r)) END x
           |      FROM w$r)""".stripMargin
      }.mkString(",\n")
      val last = s"v${Similarity.PowerRounds}"
      s"""WITH e AS (SELECT embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM s),
         |g AS MATERIALIZED (SELECT i.i, j.j, sum(q[i.i] * q[j.j])::HUGEINT gv
         |      FROM q8, generate_series(1, 64) i(i), generate_series(1, 64) j(j)
         |      GROUP BY 1, 2),
         |v0 AS (SELECT i, 1000::HUGEINT x FROM generate_series(1, 64) t(i)),
         |$rounds,
         |wf AS (SELECT g.i, sum(g.gv * $last.x) w
         |      FROM g JOIN $last ON $last.i = g.j GROUP BY 1),
         |ray AS (SELECT ((1000 * sum(wf.w * $last.x))
         |        // (SELECT sum(x * x) FROM $last))::BIGINT r
         |      FROM wf JOIN $last ON $last.i = wf.i)
         |SELECT ($last.i - 1)::BIGINT AS dim, $last.x::BIGINT AS v_milli,
         |       ray.r AS rayleigh_milli
         |FROM $last, ray ORDER BY dim""".stripMargin
    },
    // q241: the shared brand-month grid, two keyed lag joins, HUGEINT-
    // safe milli MASE; absolute errors keep every floor non-negative.
    "q241_seasonal_backtest" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2)
        |SELECT a.brand, count(*)::BIGINT AS n_eval,
        |       (sum(abs(a.rev_cents - s.rev_cents)) // count(*))::BIGINT
        |         AS mae_seasonal_cents,
        |       (sum(abs(a.rev_cents - n.rev_cents)) // count(*))::BIGINT
        |         AS mae_naive1_cents,
        |       ((1000 * sum(abs(a.rev_cents - s.rev_cents)))
        |          // sum(abs(a.rev_cents - n.rev_cents)))::BIGINT
        |         AS mase_milli
        |FROM bm a
        |JOIN bm s ON s.brand = a.brand AND s.m = a.m - 12
        |JOIN bm n ON n.brand = a.brand AND n.m = a.m - 1
        |GROUP BY 1 ORDER BY a.brand""".stripMargin,
    // q242: the q240 chain replayed PER SOURCE — every CTE carries the
    // source key and every round is MATERIALIZED (3× references).
    "q242_source_anisotropy" -> {
      val rounds = (1 to Similarity.PowerRounds).map { r =>
        s"""w$r AS MATERIALIZED (SELECT g.source, g.i, sum(g.gv * p.x) w
           |      FROM g JOIN v${r - 1} p ON p.source = g.source AND p.i = g.j
           |      GROUP BY 1, 2),
           |m$r AS MATERIALIZED (SELECT source, max(abs(w)) mx
           |      FROM w$r GROUP BY 1),
           |v$r AS MATERIALIZED (SELECT t.source, t.i,
           |      CASE WHEN t.w >= 0 THEN (1000 * t.w) // m.mx
           |        ELSE -((1000 * -t.w) // m.mx) END x
           |      FROM w$r t JOIN m$r m ON m.source = t.source)""".stripMargin
      }.mkString(",\n")
      val last = s"v${Similarity.PowerRounds}"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT vec_id, v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT vec_id, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM s),
         |qd AS MATERIALIZED (SELECT source, q
         |      FROM q8 JOIN documents ON doc_id = vec_id),
         |g AS MATERIALIZED (SELECT source, i.i, j.j,
         |        sum(q[i.i] * q[j.j])::HUGEINT gv
         |      FROM qd, generate_series(1, 64) i(i), generate_series(1, 64) j(j)
         |      GROUP BY 1, 2, 3),
         |nv AS (SELECT source, count(*)::BIGINT n_vecs FROM qd GROUP BY 1),
         |v0 AS MATERIALIZED (SELECT src.source, t.i, 1000::HUGEINT x
         |      FROM (SELECT DISTINCT source FROM g) src,
         |        generate_series(1, 64) t(i)),
         |$rounds,
         |wf AS MATERIALIZED (SELECT g.source, g.i, sum(g.gv * p.x) w
         |      FROM g JOIN $last p ON p.source = g.source AND p.i = g.j
         |      GROUP BY 1, 2),
         |tr AS (SELECT source, sum(gv) trace FROM g WHERE i = j GROUP BY 1),
         |dn AS (SELECT source, sum(x * x) dnm FROM $last GROUP BY 1),
         |nm AS (SELECT w.source, sum(w.w * p.x) num
         |      FROM wf w JOIN $last p ON p.source = w.source AND p.i = w.i
         |      GROUP BY 1),
         |td AS (SELECT source, i, row_number() OVER (PARTITION BY source
         |        ORDER BY abs(x) DESC, i) rk FROM $last)
         |SELECT nm.source, nv.n_vecs, tr.trace::BIGINT AS trace,
         |       ((1000 * nm.num) // dn.dnm)::BIGINT AS rayleigh_milli,
         |       ((1000 * nm.num) // (dn.dnm * tr.trace))::BIGINT
         |         AS anisotropy_pm,
         |       (td.i - 1)::BIGINT AS top_dim
         |FROM nm JOIN dn ON dn.source = nm.source
         |  JOIN tr ON tr.source = nm.source
         |  JOIN nv ON nv.source = nm.source
         |  JOIN td ON td.source = nm.source AND td.rk = 1
         |ORDER BY nm.source""".stripMargin
    },
    // q243: the q49 label recurrence, one (length, polyhash) scan,
    // size-capped cluster-keyed pair join — the same H() whole-text
    // hash as q31.
    "q243_cluster_diff_stats" ->
      s"""WITH $NearDupClusterCte,
         |dd AS (SELECT doc_id, n_chars::BIGINT nc, ${H("text")} fp
         |      FROM documents),
         |jj AS MATERIALIZED (SELECT lbl.cluster_id, lbl.doc_id, nc, fp
         |      FROM lbl JOIN cn ON cn.cluster_id = lbl.cluster_id
         |        JOIN dd ON dd.doc_id = lbl.doc_id
         |      WHERE cn.cluster_n >= 2 AND cn.cluster_n <= 64)
         |SELECT a.cluster_id, count(*)::BIGINT AS n_pairs,
         |       ((1000 * sum(abs(a.nc - b.nc))) // count(*))::BIGINT
         |         AS mean_len_delta_milli,
         |       sum(CASE WHEN a.fp = b.fp THEN 1 ELSE 0 END)::BIGINT
         |         AS n_exact_pairs
         |FROM jj a JOIN jj b ON b.cluster_id = a.cluster_id
         |  AND a.doc_id < b.doc_id
         |GROUP BY 1 ORDER BY a.cluster_id""".stripMargin,
    // q244: the q240 chain (Gram + 8 power rounds → v1), THEN the
    // deflated chain — 8 more rounds, each matvec followed by an exact
    // integer projection p = u·(v1ᵀv1) − (v1ᵀu)·v1 — plus trace /
    // Frobenius sums. Every vector CTE is MATERIALIZED (multiply
    // referenced; the q162 3^rounds inlining lesson). G is PSD, so
    // every Rayleigh numerator is ≥ 0 and DuckDB's floor // equals
    // the driver's truncating BigInt division; degenerate rank-1
    // corpora give a zero deflated vector and NULL λ2/ratio in both
    // engines (x//0 is NULL in DuckDB, guarded None on the driver).
    "q244_spectral_spread" -> {
      val v1rounds = (1 to Similarity.PowerRounds).map { r =>
        s"""w$r AS MATERIALIZED (SELECT g.i, sum(g.gv * v${r - 1}.x) w
           |      FROM g JOIN v${r - 1} ON v${r - 1}.i = g.j GROUP BY 1),
           |v$r AS MATERIALIZED (SELECT i,
           |      CASE WHEN w >= 0 THEN (1000 * w) // (SELECT max(abs(w)) FROM w$r)
           |        ELSE -((1000 * -w) // (SELECT max(abs(w)) FROM w$r)) END x
           |      FROM w$r)""".stripMargin
      }.mkString(",\n")
      val v1 = s"v${Similarity.PowerRounds}"
      val defRounds = (1 to Similarity.PowerRounds).map { r =>
        s"""u$r AS MATERIALIZED (SELECT g.i, sum(g.gv * x${r - 1}.x) u
           |      FROM g JOIN x${r - 1} ON x${r - 1}.i = g.j GROUP BY 1),
           |d$r AS MATERIALIZED (SELECT sum($v1.x * u$r.u) dot
           |      FROM u$r JOIN $v1 ON $v1.i = u$r.i),
           |p$r AS MATERIALIZED (SELECT u$r.i,
           |      u$r.u * (SELECT dd FROM dn1) - (SELECT dot FROM d$r) * $v1.x p
           |      FROM u$r JOIN $v1 ON $v1.i = u$r.i),
           |m$r AS (SELECT greatest(max(abs(p)), 1) mx FROM p$r),
           |x$r AS MATERIALIZED (SELECT i,
           |      CASE WHEN p >= 0 THEN (1000 * p) // (SELECT mx FROM m$r)
           |        ELSE -((1000 * -p) // (SELECT mx FROM m$r)) END x
           |      FROM p$r)""".stripMargin
      }.mkString(",\n")
      val xf = s"x${Similarity.PowerRounds}"
      s"""WITH e AS (SELECT embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM s),
         |g AS MATERIALIZED (SELECT i.i, j.j, sum(q[i.i] * q[j.j])::HUGEINT gv
         |      FROM q8, generate_series(1, 64) i(i), generate_series(1, 64) j(j)
         |      GROUP BY 1, 2),
         |v0 AS (SELECT i, 1000::HUGEINT x FROM generate_series(1, 64) t(i)),
         |$v1rounds,
         |wf AS MATERIALIZED (SELECT g.i, sum(g.gv * $v1.x) w
         |      FROM g JOIN $v1 ON $v1.i = g.j GROUP BY 1),
         |dn1 AS MATERIALIZED (SELECT sum(x * x) dd FROM $v1),
         |nm1 AS MATERIALIZED (SELECT sum(wf.w * $v1.x) nn
         |      FROM wf JOIN $v1 ON $v1.i = wf.i),
         |tr AS (SELECT sum(gv) t FROM g WHERE i = j),
         |fro AS (SELECT sum(gv * gv) f FROM g),
         |d0 AS MATERIALIZED (SELECT 1000 * sum(x) dot FROM $v1),
         |p0 AS MATERIALIZED (SELECT $v1.i,
         |      1000 * (SELECT dd FROM dn1) - (SELECT dot FROM d0) * $v1.x p
         |      FROM $v1),
         |m0 AS (SELECT greatest(max(abs(p)), 1) mx FROM p0),
         |x0 AS MATERIALIZED (SELECT i,
         |      CASE WHEN p >= 0 THEN (1000 * p) // (SELECT mx FROM m0)
         |        ELSE -((1000 * -p) // (SELECT mx FROM m0)) END x
         |      FROM p0),
         |$defRounds,
         |gf AS MATERIALIZED (SELECT g.i, sum(g.gv * $xf.x) u
         |      FROM g JOIN $xf ON $xf.i = g.j GROUP BY 1),
         |fn2 AS (SELECT sum(gf.u * $xf.x) nn FROM gf JOIN $xf ON $xf.i = gf.i),
         |fd2 AS (SELECT sum(x * x) dd FROM $xf)
         |SELECT tr.t::BIGINT AS trace,
         |       (CASE WHEN fn2.nn * dn1.dd > nm1.nn * fd2.dd
         |          THEN (1000 * fn2.nn) // fd2.dd
         |          ELSE (1000 * nm1.nn) // dn1.dd END)::BIGINT
         |         AS lambda1_milli,
         |       (CASE WHEN fn2.nn * dn1.dd > nm1.nn * fd2.dd
         |          THEN (1000 * nm1.nn) // dn1.dd
         |          ELSE (1000 * fn2.nn) // fd2.dd END)::BIGINT
         |         AS lambda2_milli,
         |       (CASE WHEN fn2.nn * dn1.dd > nm1.nn * fd2.dd
         |          THEN (1000 * nm1.nn * fd2.dd) // (dn1.dd * fn2.nn)
         |          ELSE (1000 * fn2.nn * dn1.dd) // (fd2.dd * nm1.nn) END)
         |         ::BIGINT AS ratio_pm,
         |       ((1000 * tr.t * tr.t) // fro.f)::BIGINT AS pr_milli
         |FROM tr, fro, nm1, dn1, fn2, fd2""".stripMargin
    },
    // q245: the virtual pixel stream (bytes after the 64-byte header),
    // 64 grid cells by (64·p)//n_pix, cross-multiplied mean threshold,
    // the 64-bit hash as two 32-bit halves, 10-chunk pigeonhole join,
    // exact Hamming ≤ 9 verify — the full aHash replay.
    "q245_image_ahash_neardup" ->
      s"""WITH $AHashPairsCte
         |SELECT doc_a, doc_b, dist FROM pr
         |ORDER BY doc_a, doc_b""".stripMargin,
    // q246: the q226 virtual-PCM contract (s16le mono after the 64-byte
    // header, signed decode), 32 temporal bands by (32·k)//n_s, energy
    // mean threshold cross-multiplied in HUGEINT, 5-chunk pigeonhole,
    // exact Hamming ≤ 4 verify.
    "q246_audio_energy_neardup" ->
      """WITH dd AS (SELECT * FROM (SELECT doc_id, text,
        |        (greatest(length(text) - 64, 0) // 2)::BIGINT n_s
        |      FROM documents) WHERE n_s >= 32),
        |sm AS (SELECT doc_id, n_s, k,
        |        ord(substr(text, (65 + 2 * k)::INT, 1))
        |          + 256 * ord(substr(text, (66 + 2 * k)::INT, 1)) raw
        |      FROM (SELECT doc_id, text, n_s,
        |              unnest(generate_series(0, n_s - 1)) k FROM dd)),
        |sv AS (SELECT doc_id, n_s, k,
        |        (CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END)
        |          ::BIGINT v
        |      FROM sm),
        |bd AS (SELECT doc_id, n_s, (32 * k) // n_s band,
        |        sum(v * v)::BIGINT e, count(*)::BIGINT bcnt
        |      FROM sv GROUP BY 1, 2, 3),
        |tt AS (SELECT doc_id, sum(e)::BIGINT tot FROM bd GROUP BY 1),
        |bits AS (SELECT bd.doc_id, band,
        |        CASE WHEN e::HUGEINT * n_s >= tot::HUGEINT * bcnt
        |          THEN 1::BIGINT ELSE 0::BIGINT END bt
        |      FROM bd JOIN tt ON tt.doc_id = bd.doc_id),
        |sg AS MATERIALIZED (SELECT doc_id, sum(bt << band::INT)::BIGINT s
        |      FROM bits GROUP BY 1),
        |ch AS MATERIALIZED (SELECT doc_id, s, c,
        |        CASE c WHEN 0 THEN s & 127 WHEN 1 THEN (s >> 7) & 127
        |          WHEN 2 THEN (s >> 14) & 63 WHEN 3 THEN (s >> 20) & 63
        |          ELSE (s >> 26) & 63 END cv
        |      FROM sg, generate_series(0, 4) g(c))
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       bit_count(xor(a.s, b.s))::BIGINT AS dist
        |FROM ch a JOIN ch b ON b.c = a.c AND b.cv = a.cv
        |  AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.s, b.s)) <= 4
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q247: the q26 exact-cosine chain with the cross-source predicate
    // in the candidate join (pre-filter evaluation order).
    "q247_filtered_knn" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |es AS (SELECT e.vec_id, e.v, d.source
        |      FROM e JOIN documents d ON d.doc_id = e.vec_id),
        |s AS (SELECT q.vec_id q_id, n.vec_id neighbor_id,
        |      list_dot_product(q.v, n.v)
        |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
        |      FROM es q, es n WHERE q.vec_id < 10 AND n.vec_id != q.vec_id
        |        AND n.source != q.source),
        |r AS (SELECT q_id, neighbor_id, c, row_number() OVER
        |      (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM s)
        |SELECT q_id, neighbor_id, round(c, 6) AS cosine, rnk::BIGINT AS rank
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // q248: the q27 signature/bucket chain, source labels joined on,
    // post-filter counts, filtered top-5, and exact recall vs the q247
    // chain — every multiply-referenced CTE MATERIALIZED.
    "q248_filtered_lsh_audit" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |es AS MATERIALIZED (SELECT e.vec_id, e.v, d.source
        |      FROM e JOIN documents d ON d.doc_id = e.vec_id),
        |sig AS (SELECT vec_id, t,
        |  list_sum(list_transform(generate_series(0, 3), r ->
        |    CASE WHEN list_sum(list_transform(generate_series(0, 63), i ->
        |      (CASE WHEN ((((t*4 + r)*64 + i) * 2654435761) & 65536) != 0
        |            THEN 1.0 ELSE -1.0 END) * v[i + 1])) > 0
        |    THEN (1::BIGINT << r) ELSE 0 END))::BIGINT AS bucket
        |  FROM e, generate_series(0, 3) g(t)),
        |cand AS (SELECT DISTINCT q.vec_id q_id, c.vec_id vec_id
        |         FROM sig q JOIN sig c ON q.t = c.t AND q.bucket = c.bucket
        |              AND q.vec_id != c.vec_id
        |         WHERE q.vec_id < 10),
        |cs AS MATERIALIZED (SELECT cand.q_id, cand.vec_id,
        |        qs.source q_src, ns.source n_src
        |      FROM cand JOIN es qs ON qs.vec_id = cand.q_id
        |           JOIN es ns ON ns.vec_id = cand.vec_id),
        |nc AS (SELECT q_id, count(*)::BIGINT n_cand,
        |        sum(CASE WHEN n_src != q_src THEN 1 ELSE 0 END)::BIGINT nf
        |      FROM cs GROUP BY 1),
        |sc AS (SELECT cs.q_id, cs.vec_id neighbor_id,
        |      list_dot_product(q.v, n.v)
        |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
        |      FROM cs JOIN e q ON q.vec_id = cs.q_id
        |           JOIN e n ON n.vec_id = cs.vec_id
        |      WHERE cs.n_src != cs.q_src),
        |lt AS MATERIALIZED (SELECT q_id, neighbor_id FROM
        |      (SELECT q_id, neighbor_id, row_number() OVER
        |        (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM sc)
        |      WHERE rnk <= 5),
        |xs AS (SELECT q.vec_id q_id, n.vec_id neighbor_id,
        |      list_dot_product(q.v, n.v)
        |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
        |      FROM es q, es n WHERE q.vec_id < 10 AND n.vec_id != q.vec_id
        |        AND n.source != q.source),
        |xt AS MATERIALIZED (SELECT q_id, neighbor_id FROM
        |      (SELECT q_id, neighbor_id, row_number() OVER
        |        (PARTITION BY q_id ORDER BY c DESC, neighbor_id) rnk FROM xs)
        |      WHERE rnk <= 5),
        |ov AS (SELECT lt.q_id, count(*)::BIGINT n_hit
        |      FROM lt JOIN xt ON xt.q_id = lt.q_id
        |        AND xt.neighbor_id = lt.neighbor_id GROUP BY 1),
        |xn AS (SELECT q_id, count(*)::BIGINT n_exact FROM xt GROUP BY 1),
        |fl AS (SELECT q_id, count(*)::BIGINT n_filled FROM lt GROUP BY 1)
        |SELECT base.vec_id AS q_id,
        |       coalesce(nc.n_cand, 0)::BIGINT AS n_cand,
        |       coalesce(nc.nf, 0)::BIGINT AS n_cand_filtered,
        |       coalesce(fl.n_filled, 0)::BIGINT AS n_filled,
        |       ((1000 * coalesce(ov.n_hit, 0)) // xn.n_exact)::BIGINT
        |         AS recall_pm
        |FROM (SELECT vec_id FROM es WHERE vec_id < 10) base
        |LEFT JOIN nc ON nc.q_id = base.vec_id
        |LEFT JOIN fl ON fl.q_id = base.vec_id
        |LEFT JOIN ov ON ov.q_id = base.vec_id
        |LEFT JOIN xn ON xn.q_id = base.vec_id
        |ORDER BY q_id""".stripMargin,
    // q249: int8 quantization (the q240 q8 chain), signed-square micro
    // relevance, top-12 pool, pool-pair sims, then MmrK−1 greedy
    // rounds as chained MATERIALIZED CTEs — each round = candidates
    // minus selected, penalty = max pool-pair sim to the selected set,
    // argmax (score desc, id asc).
    "q249_mmr_diversified" -> {
      val rounds = (2 to Similarity.MmrK).map { r =>
        s"""c$r AS MATERIALIZED (
           |  SELECT p.q_id, p.vec_id, p.srel, p.srel - max(x.ssim) score
           |  FROM pool p JOIN pp x ON x.q_id = p.q_id AND x.bb = p.vec_id
           |       JOIN u${r - 1} u ON u.q_id = x.q_id AND u.vec_id = x.aa
           |  WHERE NOT EXISTS (SELECT 1 FROM u${r - 1} u2
           |    WHERE u2.q_id = p.q_id AND u2.vec_id = p.vec_id)
           |  GROUP BY 1, 2, 3),
           |s$r AS MATERIALIZED (SELECT q_id, vec_id, srel, score, $r rnk FROM
           |  (SELECT *, row_number() OVER (PARTITION BY q_id
           |     ORDER BY score DESC, vec_id) rn FROM c$r) WHERE rn = 1),
           |u$r AS MATERIALIZED (SELECT q_id, vec_id FROM u${r - 1}
           |  UNION ALL SELECT q_id, vec_id FROM s$r)""".stripMargin
      }.mkString(",\n")
      val unions = (2 to Similarity.MmrK)
        .map(r => s"SELECT * FROM s$r").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |sq AS (SELECT vec_id, v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT vec_id, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM sq),
         |qq AS MATERIALIZED (SELECT vec_id, q,
         |      list_dot_product(q, q)::BIGINT qn FROM q8
         |      WHERE list_dot_product(q, q) > 0),
         |sr AS (SELECT a.vec_id q_id, b.vec_id vec_id, b.q, b.qn,
         |      CASE WHEN list_dot_product(a.q, b.q) >= 0
         |        THEN (1000000 * list_dot_product(a.q, b.q)::BIGINT
         |              * list_dot_product(a.q, b.q)::BIGINT) // (a.qn * b.qn)
         |        ELSE -((1000000 * list_dot_product(a.q, b.q)::BIGINT
         |              * list_dot_product(a.q, b.q)::BIGINT) // (a.qn * b.qn))
         |      END srel
         |      FROM qq a JOIN qq b ON b.vec_id != a.vec_id
         |      WHERE a.vec_id < 10),
         |pool AS MATERIALIZED (SELECT q_id, vec_id, q, qn, srel FROM
         |      (SELECT *, row_number() OVER (PARTITION BY q_id
         |         ORDER BY srel DESC, vec_id) rnk FROM sr)
         |      WHERE rnk <= ${Similarity.MmrPool}),
         |pp AS MATERIALIZED (SELECT a.q_id, a.vec_id aa, b.vec_id bb,
         |      CASE WHEN list_dot_product(a.q, b.q) >= 0
         |        THEN (1000000 * list_dot_product(a.q, b.q)::BIGINT
         |              * list_dot_product(a.q, b.q)::BIGINT) // (a.qn * b.qn)
         |        ELSE -((1000000 * list_dot_product(a.q, b.q)::BIGINT
         |              * list_dot_product(a.q, b.q)::BIGINT) // (a.qn * b.qn))
         |      END ssim
         |      FROM pool a JOIN pool b ON b.q_id = a.q_id
         |        AND b.vec_id != a.vec_id),
         |s1 AS MATERIALIZED (SELECT q_id, vec_id, srel, srel score, 1 rnk
         |      FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |         ORDER BY srel DESC, vec_id) rn FROM pool) WHERE rn = 1),
         |u1 AS (SELECT q_id, vec_id FROM s1),
         |$rounds
         |SELECT q_id, rnk::BIGINT AS rank, vec_id AS neighbor_id,
         |       srel::BIGINT AS srel_micro, score::BIGINT AS score_micro
         |FROM (SELECT * FROM s1 UNION ALL $unions)
         |ORDER BY q_id, rank""".stripMargin
    },
    // q250: the shared q245 pair chain, then the q49-style recursive
    // closure (symmetrized edges, reach, min-label), then cluster-
    // keyed edge stats.
    "q250_media_dup_clusters" ->
      s"""WITH RECURSIVE $AHashPairsCte,
         |edges AS (SELECT doc_a s, doc_b t2 FROM pr
         |      UNION ALL SELECT doc_b, doc_a FROM pr),
         |reach AS (SELECT doc_id AS src, doc_id AS dst FROM dd
         |      UNION
         |      SELECT r.src, e.t2 FROM reach r JOIN edges e ON r.dst = e.s),
         |lbl AS (SELECT src AS doc_id, min(dst) AS cluster_id
         |      FROM reach GROUP BY src),
         |cn AS (SELECT cluster_id, count(*)::BIGINT n_docs FROM lbl
         |      GROUP BY 1),
         |ed AS (SELECT l.cluster_id, count(*)::BIGINT n_edges,
         |        sum(CASE WHEN pr.dist = 0 THEN 1 ELSE 0 END)::BIGINT
         |          n_exact_edges,
         |        max(pr.dist)::BIGINT max_dist
         |      FROM pr JOIN lbl l ON l.doc_id = pr.doc_a GROUP BY 1)
         |SELECT cn.cluster_id, cn.n_docs, ed.n_edges, ed.n_exact_edges,
         |       ed.max_dist
         |FROM cn JOIN ed ON ed.cluster_id = cn.cluster_id
         |WHERE cn.n_docs >= 2 ORDER BY cn.cluster_id""".stripMargin,
    // q251: both ANN-path oracles as subqueries, ranks → hardcoded
    // RRF discounts, (q, neighbor)-keyed vote sum, fused top-5.
    "q251_rrf_fusion" -> {
      val discCase = Similarity.RrfDiscounts.zipWithIndex
        .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }
        .mkString("CASE rank ", " ", " END")
      s"""WITH lshr AS ($LshTopkSql),
         |i8r AS ($Int8TopkSql),
         |votes AS (SELECT q_id, neighbor_id, $discCase v FROM lshr
         |      UNION ALL SELECT q_id, neighbor_id, $discCase v FROM i8r),
         |fused AS (SELECT q_id, neighbor_id, sum(v)::BIGINT rrf_micro,
         |        count(*)::BIGINT n_paths
         |      FROM votes GROUP BY 1, 2),
         |r AS (SELECT q_id, neighbor_id, rrf_micro, n_paths,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY rrf_micro DESC, neighbor_id) rnk FROM fused)
         |SELECT q_id, rnk::BIGINT AS rank, neighbor_id, rrf_micro, n_paths
         |FROM r WHERE rnk <= 5 ORDER BY q_id, rank""".stripMargin
    },
    // q252: the q240 quantization chain labeled by source, per-
    // (source, dim) sums + counts, alphabet-bounded pair join on dim,
    // cross-multiplied HUGEINT difference squared.
    "q252_source_embed_drift" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |sq AS (SELECT vec_id, v,
        |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
        |      FROM e
        |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
        |q8 AS (SELECT vec_id, list_transform(v, x ->
        |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
        |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM sq),
        |qd AS MATERIALIZED (SELECT d.source, q
        |      FROM q8 JOIN documents d ON d.doc_id = q8.vec_id),
        |sums AS (SELECT source, i.i pos, sum(q[i.i])::BIGINT s
        |      FROM qd, generate_series(1, 64) i(i) GROUP BY 1, 2),
        |nt AS (SELECT source, count(*)::BIGINT n FROM qd GROUP BY 1),
        |pj AS (SELECT a.source sa, b.source sb, na.n n_a, nb.n n_b,
        |        sum((na.n::HUGEINT * b.s - nb.n::HUGEINT * a.s)
        |            * (na.n::HUGEINT * b.s - nb.n::HUGEINT * a.s)) d2
        |      FROM sums a JOIN sums b ON b.pos = a.pos AND a.source < b.source
        |        JOIN nt na ON na.source = a.source
        |        JOIN nt nb ON nb.source = b.source
        |      GROUP BY 1, 2, 3, 4)
        |SELECT sa AS source_a, sb AS source_b, n_a, n_b,
        |       ((1000 * d2) // (n_a::HUGEINT * n_a * n_b * n_b))::BIGINT
        |         AS mmd_milli
        |FROM pj ORDER BY source_a, source_b""".stripMargin,
    // q253: the q28 stopword rule per 64-token chunk, then a per-doc
    // lag window for switches and an argmax for the dominant language
    // (ties DESC-count then ASC-code, matching min(struct(-c, pred))).
    "q253_code_switch_segments" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |      FROM documents),
        |tok AS (SELECT doc_id, (i - 1) // 64 chunk, tk[i] w
        |      FROM (SELECT doc_id, tk,
        |              unnest(generate_series(1, len(tk))) i FROM t)),
        |chk AS (SELECT doc_id, chunk,
        |   sum(CASE WHEN w IN ('the','a','of','and','is','to','in')
        |     THEN 1 ELSE 0 END)::BIGINT s_en,
        |   sum(CASE WHEN w IN ('der','die','das','und','ist','zu','ein')
        |     THEN 1 ELSE 0 END)::BIGINT s_de,
        |   sum(CASE WHEN w IN ('el','la','de','y','es','un','en')
        |     THEN 1 ELSE 0 END)::BIGINT s_es
        |  FROM tok GROUP BY 1, 2),
        |pd AS MATERIALIZED (SELECT doc_id, chunk,
        |   CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
        |        WHEN s_de >= s_es THEN 'de' ELSE 'es' END pred
        |  FROM chk),
        |sw AS (SELECT doc_id, count(*)::BIGINT n_chunks,
        |   sum(CASE WHEN prev IS NOT NULL AND prev != pred
        |     THEN 1 ELSE 0 END)::BIGINT n_switches
        |  FROM (SELECT doc_id, pred,
        |          lag(pred) OVER (PARTITION BY doc_id ORDER BY chunk) prev
        |        FROM pd)
        |  GROUP BY 1),
        |dm AS (SELECT doc_id, pred dom_lang, c FROM (
        |   SELECT doc_id, pred, count(*)::BIGINT c,
        |     row_number() OVER (PARTITION BY doc_id
        |       ORDER BY count(*) DESC, pred) rn
        |   FROM pd GROUP BY 1, 2) WHERE rn = 1)
        |SELECT sw.doc_id, sw.n_chunks, dm.dom_lang,
        |       ((1000 * dm.c) // sw.n_chunks)::BIGINT AS dom_share_pm,
        |       sw.n_switches
        |FROM sw JOIN dm ON dm.doc_id = sw.doc_id
        |ORDER BY sw.doc_id""".stripMargin,
    // q254: the q245 hash chain through sg, then a 64-way bit fan-out
    // and one bit-keyed agg (pr goes unreferenced → unevaluated).
    "q254_media_bit_balance" ->
      s"""WITH $AHashPairsCte,
         |pb AS (SELECT t.bit,
         |    CASE WHEN t.bit < 32 THEN (sg.lo >> t.bit::INT) & 1
         |      ELSE (sg.hi >> (t.bit - 32)::INT) & 1 END b
         |  FROM sg, generate_series(0, 63) t(bit))
         |SELECT bit::BIGINT AS bit, count(*)::BIGINT AS n_docs,
         |       sum(b)::BIGINT AS n_set,
         |       ((1000 * sum(b)) // count(*))::BIGINT AS share_pm
         |FROM pb GROUP BY 1 ORDER BY bit""".stripMargin,
    // q255: the q23 text pair chain (NearDupClusterCte through
    // `pairs`; the closure CTEs go unreferenced) + the q245 media
    // chain, full-outer joined on the pair key, one-row agg.
    "q255_dedup_modality_agreement" ->
      s"""WITH $NearDupClusterCte,
         |$AHashPairsCte,
         |fo AS (SELECT
         |   sum(CASE WHEN p.da IS NOT NULL AND m.doc_a IS NULL
         |     THEN 1 ELSE 0 END)::BIGINT n_text_only,
         |   sum(CASE WHEN p.da IS NULL AND m.doc_a IS NOT NULL
         |     THEN 1 ELSE 0 END)::BIGINT n_media_only,
         |   sum(CASE WHEN p.da IS NOT NULL AND m.doc_a IS NOT NULL
         |     THEN 1 ELSE 0 END)::BIGINT n_both
         |  FROM pairs p FULL OUTER JOIN pr m
         |    ON m.doc_a = p.da AND m.doc_b = p.db)
         |SELECT n_text_only, n_media_only, n_both,
         |       ((1000 * n_both) //
         |        greatest(n_text_only + n_media_only + n_both, 1))::BIGINT
         |         AS jaccard_pm
         |FROM fo""".stripMargin,
    // q256: q114's integer BM25 over 32-token stride-16 passages —
    // token→(window, window−1) via the two-branch union, doc-level
    // df, passage-length norm against the mean passage length, then
    // per-doc argmax (score desc, window asc) and global top-10.
    "q256_max_passage" -> maxPassageSql(32),
    // q257: q25's sign-plane LSH buckets carrying lang, cross-language
    // candidates only, cosine floored to ppm, per-vector top-4
    // neighborhood sums, margin = c·(na+nb) div (sa+sb) in milli.
    "q257_bitext_margin" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |lg AS MATERIALIZED (SELECT e.vec_id, e.v, d.lang
         |      FROM e JOIN documents d ON d.doc_id = e.vec_id),
         |sig AS (SELECT vec_id, lang, t,
         |  list_sum(list_transform(generate_series(0, 3), r ->
         |    CASE WHEN list_sum(list_transform(generate_series(0, 63), i ->
         |      (CASE WHEN ((((t*4 + r)*64 + i) * 2654435761) & 65536) != 0
         |            THEN 1.0 ELSE -1.0 END) * v[i + 1])) > 0
         |    THEN (1::BIGINT << r) ELSE 0 END))::BIGINT AS bucket
         |  FROM lg, generate_series(0, 3) g(t)),
         |hotb AS (SELECT t, bucket FROM sig GROUP BY t, bucket
         |         HAVING count(*) > ${Similarity.BitextBucketCap}),
         |cand AS (SELECT DISTINCT a.vec_id va, b.vec_id vb
         |         FROM sig a JOIN sig b
         |         ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |           AND a.lang != b.lang
         |         WHERE NOT EXISTS (SELECT 1 FROM hotb h
         |           WHERE h.t = a.t AND h.bucket = a.bucket)),
         |sc AS MATERIALIZED (SELECT va, vb, x.lang lang_a, y.lang lang_b,
         |  floor(1000000 * (list_dot_product(x.v, y.v)
         |    / sqrt(list_dot_product(x.v, x.v) * list_dot_product(y.v, y.v))))
         |    ::BIGINT c_ppm
         |  FROM cand JOIN lg x ON x.vec_id = va JOIN lg y ON y.vec_id = vb),
         |nb AS (SELECT va vid, vb partner, c_ppm FROM sc
         |       UNION ALL SELECT vb, va, c_ppm FROM sc),
         |hood AS (SELECT vid, sum(c_ppm)::BIGINT s, count(*)::BIGINT n FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vid
         |    ORDER BY c_ppm DESC, partner) rn FROM nb) WHERE rn <= ${Similarity.BitextK}
         |  GROUP BY vid)
         |SELECT va AS vec_a, vb AS vec_b, lang_a, lang_b, c_ppm,
         |  ((1000 * c_ppm * (ha.n + hb.n)) // (ha.s + hb.s))::BIGINT margin_milli
         |FROM sc JOIN hood ha ON ha.vid = va JOIN hood hb ON hb.vid = vb
         |WHERE ha.s + hb.s > 0
         |  AND (1000 * c_ppm * (ha.n + hb.n)) // (ha.s + hb.s)
         |      >= ${Similarity.BitextMarginMilli}
         |ORDER BY margin_milli DESC, vec_a, vec_b""".stripMargin,
    // q258: the fixed-round peel chain + final survivor pricing.
    "q258_ktruss" ->
      s"""WITH ${kTrussCte(Graph.KTrussK, Graph.KTrussRounds)}
         |SELECT p1, p2, peel_round, support FROM allrows
         |ORDER BY p1, p2""".stripMargin,
    // q259: q23's text pair set (both endpoints hash-eligible = the dd
    // doc set) against the aHash pair relation, unrolled over every
    // Hamming threshold via the per-pair τ-suffix fan-out.
    "q259_media_threshold_curve" ->
      s"""WITH $NearDupClusterCte,
         |$AHashPairsCte,
         |tpe AS MATERIALIZED (SELECT da, db FROM pairs
         |      JOIN dd x ON x.doc_id = da JOIN dd y ON y.doc_id = db),
         |ntx AS (SELECT count(*)::BIGINT n_text_pairs FROM tpe),
         |fl AS (SELECT pr.dist,
         |      (CASE WHEN tpe.da IS NOT NULL THEN 1 ELSE 0 END)::BIGINT t
         |      FROM pr LEFT JOIN tpe ON tpe.da = pr.doc_a AND tpe.db = pr.doc_b),
         |bt AS (SELECT tau, count(*)::BIGINT n_pairs, sum(t)::BIGINT n_confirmed
         |      FROM (SELECT unnest(generate_series(dist, 9)) tau, t FROM fl)
         |      GROUP BY 1)
         |SELECT g.tau::BIGINT AS tau,
         |  coalesce(bt.n_pairs, 0)::BIGINT AS n_pairs,
         |  coalesce(bt.n_confirmed, 0)::BIGINT AS n_confirmed,
         |  ntx.n_text_pairs,
         |  ((1000000 * coalesce(bt.n_confirmed, 0)) //
         |   greatest(coalesce(bt.n_pairs, 0), 1))::BIGINT AS precision_ppm,
         |  ((1000000 * coalesce(bt.n_confirmed, 0)) //
         |   greatest(ntx.n_text_pairs, 1))::BIGINT AS recall_ppm
         |FROM generate_series(0, 9) g(tau) LEFT JOIN bt ON bt.tau = g.tau, ntx
         |ORDER BY tau""".stripMargin,
    // q260: full-vocab rank by (count desc, token asc), cumulative
    // head mass over the top-1024, the power-of-two grid via bit
    // shifts; f(2r) LEFT JOINs so past-vocab octaves go NULL exactly
    // like the Spark fold's bounds check.
    "q260_zipf_spectrum" ->
      s"""WITH tok AS (SELECT unnest(regexp_split_to_array(text, ' ')) w
         |      FROM documents),
         |f AS (SELECT w, count(*)::BIGINT c FROM tok GROUP BY 1),
         |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) rk FROM f),
         |cum AS (SELECT rk, c, sum(c) OVER (ORDER BY rk)::BIGINT cm
         |      FROM r WHERE rk <= ${TextAnalysis.ZipfTopN}),
         |tot AS (SELECT sum(c)::BIGINT tt FROM f),
         |g AS (SELECT (1 << i)::BIGINT r FROM generate_series(0, 9) t(i))
         |SELECT g.r AS rank, a.c AS freq_r, b.c AS freq_2r,
         |  (CASE WHEN b.c IS NULL THEN NULL
         |        ELSE (1000 * b.c) // a.c END)::BIGINT AS ratio_milli,
         |  ((1000 * a.cm) // tt)::BIGINT AS head_share_pm
         |FROM g JOIN cum a ON a.rk = g.r
         |  LEFT JOIN cum b ON b.rk = 2 * g.r, tot
         |ORDER BY rank""".stripMargin,
    // q261: the q134/q217 integer quality formula, even-id calibration
    // half, k = (n+1) div 10 smallest calibration score via the
    // cumulative value histogram, keep-all (NULL) when k = 0, odd-id
    // coverage. Tie/floor points identical to the Spark plan.
    "q261_conformal_quality" ->
      s"""WITH t AS (SELECT doc_id, source,
         |        regexp_split_to_array(text, ' ') tk,
         |        ${H("'cal:' || text")} % 2 = 0 AS is_cal FROM documents),
         |q AS (SELECT doc_id, source, is_cal,
         |        len(tk)::BIGINT n_tok,
         |        len(list_distinct(tk))::BIGINT n_uniq,
         |        len(list_filter(tk, x -> x IN
         |          ('the','a','of','and','is','to','in')))::BIGINT n_stop
         |      FROM t),
         |s AS (SELECT doc_id, source, is_cal,
         |        ((500 * n_uniq) // n_tok + (200 * n_stop) // n_tok
         |         + (300 * least(n_tok, 200)) // 200)::BIGINT q_milli
         |      FROM q),
        |h AS (SELECT source, q_milli, count(*)::BIGINT c FROM s
        |      WHERE is_cal GROUP BY 1, 2),
        |cu AS (SELECT source, q_milli, c,
        |        sum(c) OVER (PARTITION BY source ORDER BY q_milli)::BIGINT cum,
        |        sum(c) OVER (PARTITION BY source)::BIGINT n_cal
        |      FROM h),
        |thr AS (SELECT source, max(n_cal)::BIGINT n_cal,
        |        min(CASE WHEN (n_cal + 1) // 10 > 0
        |                  AND cum >= (n_cal + 1) // 10
        |                 THEN q_milli END)::BIGINT thr_milli
        |      FROM cu GROUP BY 1)
        |SELECT s.source, coalesce(max(thr.n_cal), 0)::BIGINT AS n_cal,
        |  count(*)::BIGINT AS n_test,
        |  max(thr.thr_milli)::BIGINT AS thr_milli,
        |  ((1000 * sum(CASE WHEN thr.thr_milli IS NULL
        |                     OR s.q_milli >= thr.thr_milli
        |                    THEN 1 ELSE 0 END)) // count(*))::BIGINT
        |    AS coverage_pm
        |FROM s LEFT JOIN thr ON thr.source = s.source
        |WHERE NOT s.is_cal
        |GROUP BY s.source ORDER BY s.source""".stripMargin,
    // q262: the q26 truth and the four q33 probe plans embedded
    // verbatim (shared-oracle rule), one scalar-count hit join per
    // grid point.
    "q262_ivf_probe_curve" -> {
      val cols = Similarity.IvfProbeGrid.map(np =>
        s"i$np AS (SELECT q_id, neighbor_id FROM (${ivfTopkSql(np)}))")
        .mkString(",\n")
      val pts = Similarity.IvfProbeGrid.map(np =>
        s"""SELECT $np::BIGINT nprobe,
           |  (SELECT count(*) FROM gt JOIN i$np
           |     USING (q_id, neighbor_id))::BIGINT n_hits"""
          .stripMargin).mkString("\nUNION ALL\n")
      s"""WITH gt AS (SELECT q_id, neighbor_id FROM ($BruteTopkSql)),
         |$cols,
         |u AS ($pts),
         |tot AS (SELECT count(*)::BIGINT n_truth FROM gt)
         |SELECT nprobe, n_truth, n_hits,
         |  ((1000 * n_hits) // n_truth)::BIGINT AS recall_pm
         |FROM u, tot ORDER BY nprobe""".stripMargin
    },
    // q263: the three parameterized q256 chains; rank re-derived by
    // row_number over each 10-row result, overlap/displacement vs the
    // size-32 baseline as scalar subqueries (grid-bounded).
    "q263_passage_ablation" -> {
      val sizes = TextAnalysis.PassageSizeGrid
      val tops = sizes.map(sz =>
        s"""t$sz AS (SELECT doc_id, score_micro,
           |  row_number() OVER (ORDER BY score_micro DESC, doc_id) - 1 AS rk
           |  FROM (${maxPassageSql(sz)}))""".stripMargin).mkString(",\n")
      val rows = sizes.map(sz =>
        s"""SELECT $sz::BIGINT psize,
           |  coalesce((SELECT doc_id FROM t$sz WHERE rk = 0), -1)::BIGINT
           |    AS top1_doc,
           |  coalesce((SELECT score_micro FROM t$sz WHERE rk = 0), 0)::BIGINT
           |    AS top1_score_micro,
           |  (SELECT count(*) FROM t$sz a JOIN t${TextAnalysis.PassageSize} b
           |     USING (doc_id))::BIGINT AS n_common_vs32,
           |  coalesce((SELECT sum(abs(a.rk - b.rk)) FROM t$sz a
           |     JOIN t${TextAnalysis.PassageSize} b USING (doc_id)), 0)::BIGINT
           |    AS rank_delta_sum""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH $tops
         |SELECT * FROM ($rows) ORDER BY psize""".stripMargin
    },
    // q264: the q245 block-hash arithmetic per (doc, frame) slice —
    // pixel p of frame f is payload byte f·flen + p, 64 blocks per
    // frame, (lo, hi) packed halves join on exact equality, df cap,
    // shared-count pairing.
    "q264_frame_containment" ->
      s"""WITH fd AS (SELECT doc_id, text,
         |        ((length(text) - 64) // ${Multimodal.FrameCount})::BIGINT flen
         |      FROM documents
         |      WHERE (length(text) - 64) // ${Multimodal.FrameCount} >= 64),
         |ff AS (SELECT doc_id, text, flen,
         |        unnest(generate_series(0, ${Multimodal.FrameCount - 1})) f
         |      FROM fd),
         |fpx AS (SELECT doc_id, f, flen, p,
         |        ord(substr(text, (65 + f * flen + p)::INT, 1))::BIGINT v
         |      FROM (SELECT doc_id, text, flen, f,
         |              unnest(generate_series(0, flen - 1)) p FROM ff)),
         |fbl AS (SELECT doc_id, f, flen, (64 * p) // flen blk,
         |        sum(v)::BIGINT bsum, count(*)::BIGINT bcnt
         |      FROM fpx GROUP BY 1, 2, 3, 4),
         |ftt AS (SELECT doc_id, f, sum(bsum)::BIGINT tot FROM fbl GROUP BY 1, 2),
         |fbits AS (SELECT fbl.doc_id, fbl.f, blk,
         |        CASE WHEN bsum::HUGEINT * flen >= tot::HUGEINT * bcnt
         |          THEN 1::BIGINT ELSE 0::BIGINT END bt
         |      FROM fbl JOIN ftt ON ftt.doc_id = fbl.doc_id AND ftt.f = fbl.f),
         |fsg AS MATERIALIZED (SELECT doc_id, f,
         |        sum(CASE WHEN blk < 32 THEN bt << blk::INT ELSE 0 END)::BIGINT lo,
         |        sum(CASE WHEN blk >= 32 THEN bt << (blk - 32)::INT
         |          ELSE 0 END)::BIGINT hi
         |      FROM fbits GROUP BY 1, 2),
         |fh AS MATERIALIZED (SELECT DISTINCT doc_id, lo, hi FROM fsg),
         |fdf AS (SELECT lo, hi FROM fh GROUP BY lo, hi
         |        HAVING count(*) <= ${Multimodal.FrameDfCap}),
         |fidx AS (SELECT fh.* FROM fh JOIN fdf USING (lo, hi)),
         |fsz AS (SELECT doc_id, count(*)::BIGINT nf FROM fh GROUP BY 1),
         |fpr AS (SELECT a.doc_id da, b.doc_id db, count(*)::BIGINT n_shared
         |      FROM fidx a JOIN fidx b
         |        ON a.lo = b.lo AND a.hi = b.hi AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT da AS doc_a, db AS doc_b, n_shared,
         |  ((1000 * n_shared) // least(x.nf, y.nf))::BIGINT AS containment_pm
         |FROM fpr JOIN fsz x ON x.doc_id = da JOIN fsz y ON y.doc_id = db
         |ORDER BY doc_a, doc_b""".stripMargin,
    // q265: the q22 shingle relation query-side-restricted, exact
    // Jaccard lexical top-5, the q26 dense top-5, q251's hardcoded
    // RRF discounts, fused top-5.
    "q265_hybrid_mlt" -> {
      val discCase = Similarity.RrfDiscounts.zipWithIndex
        .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }
        .mkString("CASE rank ", " ", " END")
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
         |      FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |      FROM (SELECT doc_id, tk,
         |              unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |szs AS (SELECT doc_id, count(*)::BIGINT sz FROM sh GROUP BY 1),
         |cm AS (SELECT q.doc_id q_id, p.doc_id did, count(*)::BIGINT c
         |      FROM sh q JOIN sh p ON p.h = q.h AND p.doc_id != q.doc_id
         |      WHERE q.doc_id < 10 GROUP BY 1, 2),
         |lex AS (SELECT q_id, did AS neighbor_id,
         |        row_number() OVER (PARTITION BY q_id
         |          ORDER BY c / (a.sz + b.sz - c) DESC, did)::BIGINT rank
         |      FROM cm JOIN szs a ON a.doc_id = q_id
         |        JOIN szs b ON b.doc_id = did),
         |dn AS (SELECT q_id, neighbor_id, rank FROM ($BruteTopkSql)),
         |votes AS (SELECT q_id, neighbor_id, $discCase v
         |        FROM lex WHERE rank <= 5
         |      UNION ALL SELECT q_id, neighbor_id, $discCase v FROM dn),
         |fused AS (SELECT q_id, neighbor_id, sum(v)::BIGINT rrf_micro,
         |        count(*)::BIGINT n_paths FROM votes GROUP BY 1, 2),
         |r AS (SELECT q_id, neighbor_id, rrf_micro, n_paths,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY rrf_micro DESC, neighbor_id) rnk FROM fused)
         |SELECT q_id, rnk::BIGINT AS rank, neighbor_id, rrf_micro, n_paths
         |FROM r WHERE rnk <= 5 ORDER BY q_id, rank""".stripMargin
    },
    // q266: ONE candidate+verify prefix (the q23 chain with exact
    // integer intersection/union), then per threshold an integer
    // filter, a recursive closure, and a cluster-size summary.
    "q266_dedup_threshold_curve" -> {
      val prefix =
        s"""RECURSIVE $MinhashCandCte,
           |cmr AS (SELECT da, db, count(*) cm FROM cand
           |      JOIN sh p ON p.doc_id = da
           |      JOIN sh q ON q.doc_id = db AND q.h = p.h
           |      GROUP BY da, db),
           |pc AS MATERIALIZED (SELECT da, db, cm,
           |        (x.sz + y.sz - cm)::BIGINT un
           |      FROM cmr JOIN sz x ON x.doc_id = da
           |        JOIN sz y ON y.doc_id = db)""".stripMargin
      val per = Dedup.PercolationGridPm.map { tpm =>
        s"""p$tpm AS (SELECT da, db FROM pc WHERE 1000 * cm >= $tpm * un),
           |e$tpm AS (SELECT da s, db t2 FROM p$tpm
           |      UNION ALL SELECT db, da FROM p$tpm),
           |r$tpm AS (SELECT doc_id AS src, doc_id AS dst FROM documents
           |      UNION
           |      SELECT r.src, e.t2 FROM r$tpm r JOIN e$tpm e ON r.dst = e.s),
           |l$tpm AS (SELECT src, min(dst) cid FROM r$tpm GROUP BY 1),
           |c$tpm AS (SELECT cid, count(*) n FROM l$tpm GROUP BY 1),
           |w$tpm AS (SELECT $tpm::BIGINT tau_pm,
           |      (SELECT count(*) FROM p$tpm)::BIGINT n_edges,
           |      count(*) FILTER (n >= 2)::BIGINT n_multi_clusters,
           |      coalesce(sum(n) FILTER (n >= 2), 0)::BIGINT n_docs_in_multi,
           |      max(n)::BIGINT largest_cluster FROM c$tpm)""".stripMargin
      }
      val rows = Dedup.PercolationGridPm
        .map(tpm => s"SELECT * FROM w$tpm").mkString(" UNION ALL ")
      s"""WITH ${(prefix +: per).mkString(",\n")}
         |SELECT * FROM ($rows) ORDER BY tau_pm""".stripMargin
    },
    // q267: the six rule flags as independent integer comparisons, the
    // (rule, flag) unnest, per-rule counts + unique kills, one-row doc
    // totals cross-joined on.
    "q267_rule_audit" ->
      """WITH tk AS (SELECT doc_id, text, string_split(text, ' ') t
        |      FROM documents),
        |s AS (SELECT doc_id,
        |        len(t)::BIGINT n_tok,
        |        len(list_distinct(t))::BIGINT n_uniq,
        |        len(list_filter(t, x -> x IN
        |          ('the','a','of','and','is','to','in')))::BIGINT n_stop,
        |        greatest(len(t) - 4, 0)::BIGINT n5,
        |        len(list_distinct(list_transform(
        |          generate_series(1, greatest(len(t) - 4, 0)),
        |          i -> array_to_string(t[i:i+4], ' '))))::BIGINT u5,
        |        length(text)::BIGINT len,
        |        (length(text) - length(regexp_replace(text,
        |          '[^A-Za-z0-9 ]', '', 'g')))::BIGINT n_punct
        |      FROM tk),
        |f AS MATERIALIZED (SELECT doc_id,
        |        CASE WHEN n_tok < 20 THEN 1 ELSE 0 END::BIGINT f1,
        |        CASE WHEN n_tok > 90 THEN 1 ELSE 0 END::BIGINT f2,
        |        CASE WHEN n_uniq * 100 < n_tok * 45 THEN 1 ELSE 0
        |          END::BIGINT f3,
        |        CASE WHEN (n5 - u5) * 1000 > n5 * 150 THEN 1 ELSE 0
        |          END::BIGINT f4,
        |        CASE WHEN n_stop < 2 THEN 1 ELSE 0 END::BIGINT f5,
        |        CASE WHEN n_punct * 1000 > len * 30 THEN 1 ELSE 0
        |          END::BIGINT f6
        |      FROM s),
        |ff AS (SELECT doc_id, f1, f2, f3, f4, f5, f6,
        |        (f1 + f2 + f3 + f4 + f5 + f6)::BIGINT nf FROM f),
        |d AS (SELECT count(*)::BIGINT n_docs,
        |        sum(CASE WHEN nf > 0 THEN 1 ELSE 0 END)::BIGINT n_killed
        |      FROM ff),
        |r AS (SELECT rule,
        |        CASE rule WHEN 'r1_short' THEN f1 WHEN 'r2_long' THEN f2
        |          WHEN 'r3_low_uniq' THEN f3 WHEN 'r4_dup5gram' THEN f4
        |          WHEN 'r5_no_stop' THEN f5 ELSE f6 END fl, nf
        |      FROM ff, (VALUES ('r1_short'), ('r2_long'), ('r3_low_uniq'),
        |        ('r4_dup5gram'), ('r5_no_stop'), ('r6_symbol')) rules(rule)),
        |a AS (SELECT rule, sum(fl)::BIGINT n_flagged,
        |        sum(CASE WHEN fl = 1 AND nf = 1 THEN 1 ELSE 0 END)
        |          ::BIGINT n_unique
        |      FROM r GROUP BY rule)
        |SELECT a.rule, a.n_flagged,
        |       ((1000 * a.n_flagged) // d.n_docs)::BIGINT AS flag_rate_pm,
        |       a.n_unique, d.n_docs, d.n_killed
        |FROM a, d ORDER BY rule""".stripMargin,
    // q268: midpoint-day split, per-half monetary quintile on the
    // hundred-dollar grid (the q199 strictly-before cumulative), full
    // outer flow matrix with 0 = absent.
    "q268_rfm_migration" ->
      """WITH o AS (SELECT o_custkey,
        |        date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT dy,
        |        CAST(round(o_totalprice * 100) AS BIGINT) cents FROM orders),
        |pv AS (SELECT ((min(dy) + max(dy)) // 2)::BIGINT p FROM o),
        |ha AS (SELECT o_custkey, (sum(cents) // 10000)::BIGINT mh
        |      FROM o, pv WHERE dy < p GROUP BY 1),
        |hb AS (SELECT o_custkey, (sum(cents) // 10000)::BIGINT mh
        |      FROM o, pv WHERE dy >= p GROUP BY 1),
        |ga AS (SELECT mh, ((coalesce(sum(c) OVER (ORDER BY mh
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |        // (SELECT count(*) FROM ha) + 1)::BIGINT s
        |      FROM (SELECT mh, count(*)::BIGINT c FROM ha GROUP BY 1)),
        |gb AS (SELECT mh, ((coalesce(sum(c) OVER (ORDER BY mh
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5)
        |        // (SELECT count(*) FROM hb) + 1)::BIGINT s
        |      FROM (SELECT mh, count(*)::BIGINT c FROM hb GROUP BY 1)),
        |sa AS (SELECT ha.o_custkey, ga.s FROM ha JOIN ga ON ga.mh = ha.mh),
        |sb AS (SELECT hb.o_custkey, gb.s FROM hb JOIN gb ON gb.mh = hb.mh)
        |SELECT coalesce(sa.s, 0)::BIGINT AS seg_then,
        |       coalesce(sb.s, 0)::BIGINT AS seg_now,
        |       count(*)::BIGINT AS n_customers
        |FROM sa FULL JOIN sb ON sb.o_custkey = sa.o_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q269: the q48 quant chain, dt = the same sequential double fold,
    // per-row ppm floor, then pure integer per-source aggregates.
    "q269_quant_fidelity" -> {
      val floor = Similarity.QuantFidFloorPpm
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |sq AS (SELECT vec_id, v, list_dot_product(v, v) nn,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT vec_id, v, nn, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::DOUBLE) q FROM sq),
         |qq AS (SELECT vec_id, v, nn, q,
         |      list_dot_product(q, q)::BIGINT qn FROM q8
         |      WHERE list_dot_product(q, q) > 0),
         |dd AS (SELECT vec_id, nn, qn, list_dot_product(v, q) dt FROM qq),
         |f AS (SELECT vec_id,
         |      (CASE WHEN dt >= 0
         |        THEN floor(1000000.0 * dt * dt / (nn * qn))
         |        ELSE -floor(1000000.0 * dt * dt / (nn * qn))
         |       END)::BIGINT fid FROM dd),
         |j AS (SELECT d.source, f.fid FROM f
         |      JOIN documents d ON d.doc_id = f.vec_id)
         |SELECT source, count(*)::BIGINT AS n_vecs,
         |       (sum(fid) // count(*))::BIGINT AS mean_fid_ppm,
         |       min(fid)::BIGINT AS min_fid_ppm,
         |       sum(CASE WHEN fid < $floor THEN 1 ELSE 0 END)::BIGINT
         |         AS n_below
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // q270: the q23 verified-pair chain + the q24 simhash chain, full
    // outer flag union, exact per-pair Jaccard from the shared shingle
    // postings (left join — disjoint-set pairs score 0), 3-key agg.
    "q270_text_method_agreement" ->
      s"""WITH $MinhashCandCte,
         |$MethodAgreementCte,
         |ex AS (SELECT p.doc_a, p.doc_b, count(*)::BIGINT cm FROM pr p
         |      JOIN sh a ON a.doc_id = p.doc_a
         |      JOIN sh b ON b.doc_id = p.doc_b AND b.h = a.h
         |      GROUP BY 1, 2),
         |jj AS (SELECT pr.cat,
         |        ((1000 * coalesce(ex.cm, 0)) //
         |         (x.sz + y.sz - coalesce(ex.cm, 0)))::BIGINT j_pm
         |      FROM pr JOIN sz x ON x.doc_id = pr.doc_a
         |      JOIN sz y ON y.doc_id = pr.doc_b
         |      LEFT JOIN ex ON ex.doc_a = pr.doc_a AND ex.doc_b = pr.doc_b)
         |SELECT cat, count(*)::BIGINT AS n_pairs,
         |       (sum(j_pm) // count(*))::BIGINT AS mean_j_pm,
         |       min(j_pm)::BIGINT AS min_j_pm, max(j_pm)::BIGINT AS max_j_pm
         |FROM jj GROUP BY 1 ORDER BY 1""".stripMargin,
    // q271: salted polyhash order, shard = h mod S, per-shard lag
    // adjacency, Simpson baseline in HUGEINT.
    "q271_interleave_audit" -> {
      val s = Curation.InterleaveShards
      s"""WITH dd AS (SELECT doc_id, source,
         |        ${H("'interleave42:' || text")} AS h FROM documents),
         |sd AS (SELECT doc_id, source, h, h % $s AS shard FROM dd),
         |lg AS (SELECT shard, source, lag(source) OVER
         |        (PARTITION BY shard ORDER BY h, doc_id) prev FROM sd),
         |aj AS (SELECT shard, count(*)::BIGINT n_docs,
         |        sum(CASE WHEN prev = source THEN 1 ELSE 0 END)::BIGINT
         |          n_adj_same
         |      FROM lg GROUP BY shard),
         |bs AS (SELECT ((1000 * sum(ns::HUGEINT * ns)) //
         |        (sum(ns)::HUGEINT * sum(ns)))::BIGINT expected_pm
         |      FROM (SELECT count(*)::BIGINT ns FROM documents
         |            GROUP BY source))
         |SELECT shard::BIGINT AS shard, n_docs, n_adj_same,
         |       ((1000 * n_adj_same) // (n_docs - 1))::BIGINT AS rate_pm,
         |       expected_pm
         |FROM aj, bs ORDER BY shard""".stripMargin
    },
    // q272: the q235 brand-month grid, deterministic lower medians by
    // rank (n+1)//2 under (value, month) order for med and MAD, 3-MAD
    // flag per cell.
    "q272_mad_anomaly_calendar" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2),
        |med AS (SELECT brand, rev_cents med_cents FROM
        |      (SELECT brand, rev_cents, row_number() OVER
        |        (PARTITION BY brand ORDER BY rev_cents, m) rk,
        |        count(*) OVER (PARTITION BY brand) n FROM bm)
        |      WHERE rk = (n + 1) // 2),
        |dv AS (SELECT bm.brand, bm.m, bm.rev_cents, med.med_cents,
        |        abs(bm.rev_cents - med.med_cents)::BIGINT dev_cents
        |      FROM bm JOIN med ON med.brand = bm.brand),
        |mad AS (SELECT brand, dev_cents mad_cents FROM
        |      (SELECT brand, dev_cents, row_number() OVER
        |        (PARTITION BY brand ORDER BY dev_cents, m) rk,
        |        count(*) OVER (PARTITION BY brand) n FROM dv)
        |      WHERE rk = (n + 1) // 2)
        |SELECT dv.brand, dv.m, dv.rev_cents, dv.med_cents, mad.mad_cents,
        |       dv.dev_cents,
        |       (CASE WHEN dv.dev_cents > 3 * mad.mad_cents THEN 1 ELSE 0
        |        END)::BIGINT AS is_anomaly
        |FROM dv JOIN mad ON mad.brand = dv.brand
        |ORDER BY dv.brand, dv.m""".stripMargin,
    // q273: month-aligned brand-pair grid, month-pair sign products,
    // tau-a = (C − D) / C(n,2) sign-decomposed in milli. pv
    // MATERIALIZED: the self-join references it twice and its
    // equality anchor must not be reordered into a piecewise range
    // join (the q227/q237 lesson).
    "q273_kendall_comovement" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2),
        |pv AS MATERIALIZED (SELECT a.brand ba, b.brand bb, a.m,
        |        a.rev_cents ra, b.rev_cents rb
        |      FROM bm a JOIN bm b ON b.m = a.m AND a.brand < b.brand),
        |mp AS (SELECT p.ba, p.bb,
        |        (CASE WHEN q.ra > p.ra THEN 1 WHEN q.ra < p.ra THEN -1
        |          ELSE 0 END) *
        |        (CASE WHEN q.rb > p.rb THEN 1 WHEN q.rb < p.rb THEN -1
        |          ELSE 0 END) s
        |      FROM pv p JOIN pv q ON q.ba = p.ba AND q.bb = p.bb
        |        AND q.m > p.m),
        |ag AS (SELECT ba, bb,
        |        sum(CASE WHEN s > 0 THEN 1 ELSE 0 END)::BIGINT n_conc,
        |        sum(CASE WHEN s < 0 THEN 1 ELSE 0 END)::BIGINT n_disc,
        |        count(*)::BIGINT np
        |      FROM mp GROUP BY 1, 2),
        |nm AS (SELECT ba, bb, count(*)::BIGINT n_months FROM pv
        |      GROUP BY 1, 2)
        |SELECT nm.ba AS brand_a, nm.bb AS brand_b, nm.n_months,
        |       ag.n_conc, ag.n_disc,
        |       (CASE WHEN ag.n_conc >= ag.n_disc
        |         THEN (1000 * (ag.n_conc - ag.n_disc)) // ag.np
        |         ELSE -((1000 * (ag.n_disc - ag.n_conc)) // ag.np)
        |        END)::BIGINT AS tau_milli
        |FROM nm JOIN ag ON ag.ba = nm.ba AND ag.bb = nm.bb
        |ORDER BY brand_a, brand_b""".stripMargin,
    // q274: the q240 power chain + the q244 deflation chain (both
    // MATERIALIZED round-for-round), per-vector dots with each
    // direction via an index cross-join, per-source HUGEINT energy
    // ratios against the direction norms.
    "q274_source_projection_energy" -> {
      val v1rounds = (1 to Similarity.PowerRounds).map { r =>
        s"""w$r AS MATERIALIZED (SELECT g.i, sum(g.gv * v${r - 1}.x) w
           |      FROM g JOIN v${r - 1} ON v${r - 1}.i = g.j GROUP BY 1),
           |v$r AS MATERIALIZED (SELECT i,
           |      CASE WHEN w >= 0 THEN (1000 * w) // (SELECT max(abs(w)) FROM w$r)
           |        ELSE -((1000 * -w) // (SELECT max(abs(w)) FROM w$r)) END x
           |      FROM w$r)""".stripMargin
      }.mkString(",\n")
      val v1 = s"v${Similarity.PowerRounds}"
      val defRounds = (1 to Similarity.PowerRounds).map { r =>
        s"""u$r AS MATERIALIZED (SELECT g.i, sum(g.gv * x${r - 1}.x) u
           |      FROM g JOIN x${r - 1} ON x${r - 1}.i = g.j GROUP BY 1),
           |d$r AS MATERIALIZED (SELECT sum($v1.x * u$r.u) dot
           |      FROM u$r JOIN $v1 ON $v1.i = u$r.i),
           |p$r AS MATERIALIZED (SELECT u$r.i,
           |      u$r.u * (SELECT dd FROM dn1) - (SELECT dot FROM d$r) * $v1.x p
           |      FROM u$r JOIN $v1 ON $v1.i = u$r.i),
           |m$r AS (SELECT greatest(max(abs(p)), 1) mx FROM p$r),
           |x$r AS MATERIALIZED (SELECT i,
           |      CASE WHEN p >= 0 THEN (1000 * p) // (SELECT mx FROM m$r)
           |        ELSE -((1000 * -p) // (SELECT mx FROM m$r)) END x
           |      FROM p$r)""".stripMargin
      }.mkString(",\n")
      val xf = s"x${Similarity.PowerRounds}"
      s"""WITH ee AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |ss AS (SELECT vec_id, v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM ee
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |qs AS MATERIALIZED (SELECT vec_id, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM ss),
         |g AS MATERIALIZED (SELECT i.i, j.j, sum(q[i.i] * q[j.j])::HUGEINT gv
         |      FROM qs, generate_series(1, 64) i(i), generate_series(1, 64) j(j)
         |      GROUP BY 1, 2),
         |v0 AS (SELECT i, 1000::HUGEINT x FROM generate_series(1, 64) t(i)),
         |$v1rounds,
         |dn1 AS MATERIALIZED (SELECT sum(x * x) dd FROM $v1),
         |d0 AS MATERIALIZED (SELECT 1000 * sum(x) dot FROM $v1),
         |p0 AS MATERIALIZED (SELECT $v1.i,
         |      1000 * (SELECT dd FROM dn1) - (SELECT dot FROM d0) * $v1.x p
         |      FROM $v1),
         |m0 AS (SELECT greatest(max(abs(p)), 1) mx FROM p0),
         |x0 AS MATERIALIZED (SELECT i,
         |      CASE WHEN p >= 0 THEN (1000 * p) // (SELECT mx FROM m0)
         |        ELSE -((1000 * -p) // (SELECT mx FROM m0)) END x
         |      FROM p0),
         |$defRounds,
         |fd2 AS (SELECT sum(x * x) dd FROM $xf),
         |pd1 AS MATERIALIZED (SELECT qs.vec_id,
         |      sum(qs.q[vv.i] * vv.x)::HUGEINT dt FROM qs, $v1 vv GROUP BY 1),
         |pd2 AS MATERIALIZED (SELECT qs.vec_id,
         |      sum(qs.q[xx.i] * xx.x)::HUGEINT dt FROM qs, $xf xx GROUP BY 1),
         |qn AS (SELECT vec_id, list_dot_product(q, q)::HUGEINT qn FROM qs),
         |per AS (SELECT doc.source, qn.qn,
         |        pd1.dt * pd1.dt d1sq, pd2.dt * pd2.dt d2sq
         |      FROM qn JOIN pd1 ON pd1.vec_id = qn.vec_id
         |      JOIN pd2 ON pd2.vec_id = qn.vec_id
         |      JOIN documents doc ON doc.doc_id = qn.vec_id)
         |SELECT source, count(*)::BIGINT AS n_vecs,
         |       ((1000 * sum(d1sq)) //
         |        ((SELECT dd FROM dn1) * sum(qn)))::BIGINT AS energy1_pm,
         |       ((1000 * sum(d2sq)) //
         |        ((SELECT dd FROM fd2) * sum(qn)))::BIGINT AS energy2_pm
         |FROM per GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // q275: the q186 micro-shift integerization per (source, dim)
    // cell, corpus re-agg of the cells, exact cross-multiplied
    // |mean diff| ranking in HUGEINT, sign-decomposed micro diff.
    "q275_source_dim_drift" -> {
      val topk = Similarity.DimDriftTopK
      s"""WITH x AS (SELECT doc.source, e.i::BIGINT - 1 AS dim,
         |      floor(e.embedding[e.i]::DOUBLE * 1000000)::BIGINT
         |        + 1000000 AS vms
         |      FROM (SELECT vec_id, embedding,
         |            unnest(generate_series(1, len(embedding))) i
         |            FROM embeddings) e
         |      JOIN documents doc ON doc.doc_id = e.vec_id),
         |cells AS MATERIALIZED (SELECT source, dim, sum(vms)::BIGINT s_sd,
         |      count(*)::BIGINT n_s FROM x GROUP BY 1, 2),
         |corp AS (SELECT dim, sum(s_sd)::BIGINT c_p, sum(n_s)::BIGINT n
         |      FROM cells GROUP BY 1),
         |j AS (SELECT cells.source, cells.dim, s_sd, n_s, c_p, n,
         |      s_sd::HUGEINT * n - c_p::HUGEINT * n_s AS num
         |      FROM cells JOIN corp ON corp.dim = cells.dim),
         |r AS (SELECT *, row_number() OVER
         |      (PARTITION BY source ORDER BY abs(num) DESC, dim) rnk FROM j)
         |SELECT source, rnk::BIGINT AS rnk, dim,
         |       (s_sd // n_s - 1000000)::BIGINT AS mean_src_micro,
         |       (c_p // n - 1000000)::BIGINT AS mean_corpus_micro,
         |       (CASE WHEN num >= 0 THEN num // (n_s::HUGEINT * n)
         |             ELSE -((-num) // (n_s::HUGEINT * n))
         |        END)::BIGINT AS diff_micro
         |FROM r WHERE rnk <= $topk ORDER BY source, rnk""".stripMargin
    },
    // q276: the q127 capped edge CTE, degree ranking, per-k elite
    // membership edge counts, one cross-multiplied HUGEINT ratio.
    "q276_rich_club" -> {
      val per = Graph.RichClubKs.map { k =>
        s"""c$k AS (SELECT count(*)::BIGINT c FROM e
           |      WHERE p1 IN (SELECT node FROM rk WHERE rn <= $k)
           |        AND p2 IN (SELECT node FROM rk WHERE rn <= $k)),
           |w$k AS (SELECT $k::BIGINT k,
           |      least($k, (SELECT nn FROM tot))::BIGINT m, c
           |      FROM c$k)""".stripMargin
      }.mkString(",\n")
      val rows = Graph.RichClubKs.map(k => s"SELECT * FROM w$k")
        .mkString(" UNION ALL ")
      s"""WITH it0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         |      FROM lineitem),
         |it AS (SELECT ok, pk FROM (
         |        SELECT ok, pk, row_number() OVER
         |          (PARTITION BY ok ORDER BY pk) AS rn
         |        FROM it0) WHERE rn <= 1024),
         |e AS MATERIALIZED (SELECT DISTINCT a.pk AS p1, b.pk AS p2
         |      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
         |deg AS MATERIALIZED (SELECT node, count(*)::BIGINT AS dg FROM
         |      (SELECT p1 AS node FROM e UNION ALL SELECT p2 AS node FROM e)
         |      GROUP BY 1),
         |rk AS MATERIALIZED (SELECT node, dg,
         |      row_number() OVER (ORDER BY dg DESC, node) rn FROM deg),
         |tot AS MATERIALIZED (SELECT (SELECT count(*) FROM deg) nn,
         |      (SELECT count(*) FROM e) ee),
         |$per
         |SELECT k, m AS n_members, c AS n_edges_within,
         |       (CASE WHEN m < 2 THEN 0 ELSE (2000 * c) // (m * (m - 1))
         |        END)::BIGINT AS density_milli,
         |       (CASE WHEN m < 2 OR (SELECT ee FROM tot) = 0 THEN 0
         |        ELSE (1000::HUGEINT * c * (SELECT nn FROM tot)
         |              * ((SELECT nn FROM tot) - 1))
         |          // ((SELECT ee FROM tot)::HUGEINT * m * (m - 1))
         |        END)::BIGINT AS rc_ratio_milli
         |FROM ($rows) ORDER BY k""".stripMargin
    },
    // q277: the q198 basket self-join, direction union, exact
    // confidence and one cross-multiplied conviction (c_a = c_ab ⇒
    // //0 ⇒ NULL ⇒ the honest infinity), top 30.
    "q277_association_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey ok, l_partkey p
        |      FROM lineitem),
        |pairs AS (SELECT a.p pa, b.p pb, count(*)::BIGINT c_ab
        |      FROM items a JOIN items b ON a.ok = b.ok AND a.p < b.p
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |dir AS (SELECT pa ante, pb cons, c_ab FROM pairs
        |      UNION ALL SELECT pb, pa, c_ab FROM pairs),
        |freq AS (SELECT p, count(*)::BIGINT c FROM items GROUP BY 1),
        |bt AS (SELECT count(DISTINCT ok)::BIGINT tb FROM items)
        |SELECT ante, cons, c_ab, fa.c AS c_a, fb.c AS c_b,
        |       ((1000::HUGEINT * c_ab) // fa.c)::BIGINT
        |         AS confidence_milli,
        |       ((1000::HUGEINT * (bt.tb - fb.c) * fa.c) //
        |        (bt.tb::HUGEINT * (fa.c - c_ab)))::BIGINT
        |         AS conviction_milli
        |FROM dir JOIN freq fa ON fa.p = dir.ante
        |     JOIN freq fb ON fb.p = dir.cons, bt
        |ORDER BY confidence_milli DESC, ante, cons LIMIT 30""".stripMargin,
    // q278: the q49 cluster closure verbatim (shared-oracle rule),
    // one documents join, per-source agg; the per-doc 1000//n floor
    // is the defined semantic on both engines.
    "q278_dedup_effective_size" ->
      s"""WITH $NearDupClusterCte,
         |w AS (SELECT l.doc_id, l.cluster_id, cn.cluster_n
         |      FROM lbl l JOIN cn ON cn.cluster_id = l.cluster_id),
         |j AS (SELECT d.source, w.doc_id, w.cluster_id, w.cluster_n
         |      FROM w JOIN documents d ON d.doc_id = w.doc_id)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |       sum(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END)
         |         ::BIGINT AS n_canonical,
         |       sum(1000 // cluster_n)::BIGINT AS eff_milli,
         |       sum(CASE WHEN cluster_n = 1 THEN 1 ELSE 0 END)
         |         ::BIGINT AS n_singletons,
         |       ((1000000 * count(*)) // sum(1000 // cluster_n))
         |         ::BIGINT AS inflation_milli
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // q279: the q26 exact-cosine chain over the mod-7 query sample,
    // top-5 per query (ties (c desc, id)), two source joins, agg.
    "q279_knn_source_purity" -> {
      val stride = Similarity.PurityStride
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT q.vec_id q_id, n.vec_id nid,
         |      list_dot_product(q.v, n.v)
         |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
         |      FROM e q, e n
         |      WHERE q.vec_id % $stride = 0 AND n.vec_id != q.vec_id),
         |r AS (SELECT q_id, nid FROM (SELECT q_id, nid,
         |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, nid) rnk
         |      FROM s) WHERE rnk <= 5),
         |m AS (SELECT dq.source q_src, r.q_id,
         |      sum(CASE WHEN dn.source = dq.source THEN 1 ELSE 0 END)
         |        ::BIGINT mm
         |      FROM r JOIN documents dq ON dq.doc_id = r.q_id
         |           JOIN documents dn ON dn.doc_id = r.nid
         |      GROUP BY 1, 2)
         |SELECT q_src AS source, count(*)::BIGINT AS n_queries,
         |       sum(mm)::BIGINT AS n_matched,
         |       ((1000 * sum(mm)) // (5 * count(*)))::BIGINT AS purity_milli,
         |       sum(CASE WHEN mm = 5 THEN 1 ELSE 0 END)::BIGINT AS n_pure,
         |       sum(CASE WHEN mm <= 1 THEN 1 ELSE 0 END)::BIGINT AS n_foreign
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // q280: the q272 brand-month CTE, zero-filled spine grid, 12
    // explicit dyadic lag taps, num//4095 level, lagged delta.
    "q280_dyadic_momentum" -> {
      val taps = (0 until Queries.MomentumTaps).map { k =>
        s"lag(rev, $k, 0) OVER w * ${1L << (Queries.MomentumTaps - 1 - k)}"
      }.mkString("\n        |        + ").stripMargin
      s"""WITH bm AS (SELECT p_brand brand,
         |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
         |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
         |          rev_cents
         |      FROM lineitem JOIN part ON p_partkey = l_partkey
         |      GROUP BY 1, 2),
         |bounds AS (SELECT min(m) mn, max(m) mx FROM bm),
         |sp AS (SELECT unnest(generate_series((SELECT mn FROM bounds),
         |        (SELECT mx FROM bounds)))::BIGINT m),
         |br AS (SELECT DISTINCT brand FROM bm),
         |g AS (SELECT br.brand, sp.m, coalesce(bm.rev_cents, 0)::BIGINT rev
         |      FROM br CROSS JOIN sp
         |      LEFT JOIN bm ON bm.brand = br.brand AND bm.m = sp.m),
         |lv AS (SELECT brand, m,
         |        ($taps)::BIGINT num
         |      FROM g WINDOW w AS (PARTITION BY brand ORDER BY m)),
         |l2 AS (SELECT brand, m, (num // 4095)::BIGINT level_cents,
         |        lag(num // 4095, 1) OVER
         |          (PARTITION BY brand ORDER BY m)::BIGINT prev_level_cents
         |      FROM lv)
         |SELECT brand, m, level_cents, prev_level_cents,
         |       (level_cents - prev_level_cents)::BIGINT AS momentum_cents,
         |       (CASE WHEN level_cents > prev_level_cents THEN 1
         |             WHEN level_cents < prev_level_cents THEN -1
         |             ELSE 0 END)::BIGINT AS direction
         |FROM l2 WHERE m >= (SELECT mn FROM bounds) + ${Queries.MomentumTaps}
         |ORDER BY brand, m""".stripMargin
    },
    // q281: the q246 virtual-PCM decode CTE (shared contract), one
    // per-doc agg, floored milli divisions; crest guards Σ|s| = 0.
    "q281_audio_loudness_audit" -> {
      val clip = graft.functions.PerceptualHash.ClipThreshold
      s"""WITH dd AS (SELECT * FROM (SELECT doc_id, text,
         |        (greatest(length(text) - 64, 0) // 2)::BIGINT n_s
         |      FROM documents) WHERE n_s >= 32),
         |sm AS (SELECT doc_id, n_s, k,
         |        ord(substr(text, (65 + 2 * k)::INT, 1))
         |          + 256 * ord(substr(text, (66 + 2 * k)::INT, 1)) raw
         |      FROM (SELECT doc_id, text, n_s,
         |              unnest(generate_series(0, n_s - 1)) k FROM dd)),
         |sv AS (SELECT doc_id, n_s,
         |        (CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END)
         |          ::BIGINT v
         |      FROM sm),
         |ag AS (SELECT doc_id, n_s, sum(abs(v))::BIGINT sa,
         |        sum(v * v)::BIGINT sq, max(abs(v))::BIGINT pk,
         |        sum(CASE WHEN abs(v) >= $clip THEN 1 ELSE 0 END)::BIGINT cl
         |      FROM sv GROUP BY 1, 2)
         |SELECT doc_id, n_s AS n_samples,
         |       ((1000 * sa) // n_s)::BIGINT AS mean_abs_milli,
         |       sq AS energy, pk AS peak_abs,
         |       ((1000 * cl) // n_s)::BIGINT AS clip_pm,
         |       (CASE WHEN sa > 0 THEN (1000 * pk * n_s) // sa ELSE 0 END)
         |         ::BIGINT AS crest_milli
         |FROM ag ORDER BY doc_id""".stripMargin
    },
    // q282: the q269 quant chain for the embedding view, H(tok) mod 64
    // capped counts for the lexical view, sparse (i,j) product cells
    // per source, the dense 64x64 centered-M grid (n*C − s_i*s_j),
    // HUGEINT Frobenius sums, one floored division per alignment.
    "q282_repr_alignment" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |sq AS (SELECT vec_id, v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |yq AS (SELECT vec_id, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::BIGINT) q FROM sq),
         |dj AS MATERIALIZED (SELECT d.source, d.doc_id, d.text, yq.q
         |      FROM yq JOIN documents d ON d.doc_id = yq.vec_id),
         |ns AS (SELECT source, count(*)::BIGINT n FROM dj GROUP BY 1),
         |tk AS (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM dj),
         |bc AS (SELECT doc_id, ${H("tok")} % 64 AS i,
         |      least(count(*), 127)::BIGINT xv FROM tk GROUP BY 1, 2),
         |xs AS MATERIALIZED (SELECT dj.source, bc.doc_id, bc.i, bc.xv
         |      FROM bc JOIN dj ON dj.doc_id = bc.doc_id),
         |yl AS MATERIALIZED (SELECT dj.source, dj.doc_id,
         |      g.i::BIGINT - 1 AS j, q[g.i] AS yv
         |      FROM dj, generate_series(1, 64) g(i) WHERE q[g.i] != 0),
         |sx AS (SELECT source, i, sum(xv)::BIGINT s FROM xs GROUP BY 1, 2),
         |sy AS (SELECT source, j, sum(yv)::BIGINT s FROM yl GROUP BY 1, 2),
         |cxy AS (SELECT xs.source, xs.i, yl.j, sum(xs.xv * yl.yv)::BIGINT c
         |      FROM xs JOIN yl ON yl.doc_id = xs.doc_id GROUP BY 1, 2, 3),
         |cxx AS (SELECT a.source, a.i, b.i AS j, sum(a.xv * b.xv)::BIGINT c
         |      FROM xs a JOIN xs b ON b.doc_id = a.doc_id GROUP BY 1, 2, 3),
         |cyy AS (SELECT a.source, a.j AS i, b.j, sum(a.yv * b.yv)::BIGINT c
         |      FROM yl a JOIN yl b ON b.doc_id = a.doc_id GROUP BY 1, 2, 3),
         |grid AS (SELECT ns.source, gi.i::BIGINT - 1 AS i,
         |      gj.i::BIGINT - 1 AS j, ns.n
         |      FROM ns, generate_series(1, 64) gi(i),
         |           generate_series(1, 64) gj(i)),
         |mm AS MATERIALIZED (SELECT g.source, g.i, g.j,
         |      (g.n * coalesce(cxy.c, 0)
         |        - coalesce(pxi.s, 0) * coalesce(pyj.s, 0))::BIGINT mxy,
         |      (g.n * coalesce(cxx.c, 0)
         |        - coalesce(pxi.s, 0) * coalesce(pxj.s, 0))::BIGINT mxx,
         |      (g.n * coalesce(cyy.c, 0)
         |        - coalesce(pyi.s, 0) * coalesce(pyj.s, 0))::BIGINT myy
         |      FROM grid g
         |      LEFT JOIN cxy ON cxy.source = g.source AND cxy.i = g.i
         |        AND cxy.j = g.j
         |      LEFT JOIN cxx ON cxx.source = g.source AND cxx.i = g.i
         |        AND cxx.j = g.j
         |      LEFT JOIN cyy ON cyy.source = g.source AND cyy.i = g.i
         |        AND cyy.j = g.j
         |      LEFT JOIN sx pxi ON pxi.source = g.source AND pxi.i = g.i
         |      LEFT JOIN sx pxj ON pxj.source = g.source AND pxj.i = g.j
         |      LEFT JOIN sy pyi ON pyi.source = g.source AND pyi.j = g.i
         |      LEFT JOIN sy pyj ON pyj.source = g.source AND pyj.j = g.j),
         |fr AS (SELECT source,
         |      sum(mxy::HUGEINT * mxy) fxy, sum(mxx::HUGEINT * mxx) fxx,
         |      sum(myy::HUGEINT * myy) fyy,
         |      sum(CASE WHEN i = j THEN mxx ELSE 0 END)::BIGINT trx,
         |      sum(CASE WHEN i = j THEN myy ELSE 0 END)::BIGINT trY
         |      FROM mm GROUP BY 1)
         |SELECT fr.source, ns.n AS n_vecs, trx AS tr_lex, trY AS tr_emb,
         |       (CASE WHEN fxx > 0 THEN (1000000::HUGEINT * fxy) // fxx
         |        ELSE 0 END)::BIGINT AS align_lex_ppm,
         |       (CASE WHEN fyy > 0 THEN (1000000::HUGEINT * fxy) // fyy
         |        ELSE 0 END)::BIGINT AS align_emb_ppm
         |FROM fr JOIN ns ON ns.source = fr.source ORDER BY 1""".stripMargin,
    // q283: per n the window hashes via the q22/q23 H(array_to_string)
    // identity, (source, h) occurrence counts, source re-agg.
    "q283_ngram_diversity" -> {
      val blocks = TextAnalysis.DiversityNs.map { n =>
        val hi = if (n == 1) "tk[i:i]" else s"tk[i:i+${n - 1}]"
        s"""oc$n AS (SELECT source, ${H(s"array_to_string($hi, ' ')")} AS h
           |      FROM (SELECT source, tk,
           |            unnest(generate_series(1, len(tk) - ${n - 1})) i FROM t)),
           |cn$n AS (SELECT source, h, count(*)::BIGINT c FROM oc$n
           |      GROUP BY 1, 2),
           |ag$n AS (SELECT source, $n::BIGINT n, sum(c)::BIGINT total_ngrams,
           |      count(*)::BIGINT distinct_ngrams,
           |      sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT hapax
           |      FROM cn$n GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      val un = TextAnalysis.DiversityNs.map(n => s"SELECT * FROM ag$n")
        .mkString(" UNION ALL ")
      s"""WITH t AS (SELECT doc_id, source,
         |      regexp_split_to_array(text, ' ') tk FROM documents),
         |$blocks
         |SELECT source, n, total_ngrams, distinct_ngrams,
         |       ((1000 * distinct_ngrams) // total_ngrams)::BIGINT
         |         AS distinct_pm,
         |       hapax AS hapax_ngrams,
         |       ((1000 * hapax) // distinct_ngrams)::BIGINT AS hapax_pm
         |FROM ($un) ORDER BY source, n""".stripMargin
    },
    // q284: (type, hour) counts, calendar-bounded zero-filled spine,
    // two lag reads, the q91 exact-moment numerators in HUGEINT, one
    // sign-decomposed floored division.
    "q284_hourly_autocorr" -> {
      val lagBlocks = Queries.AcfLags.map { l =>
        s"""SELECT event_type, $l::BIGINT lag_h, h, c AS x,
           |      lag(c, $l) OVER (PARTITION BY event_type ORDER BY h) AS y
           |      FROM g""".stripMargin
      }.mkString("\n      UNION ALL ")
      s"""WITH cc AS (SELECT event_type,
         |      (epoch_ns(ts) // 3600000000000)::BIGINT h,
         |      count(*)::BIGINT c FROM events GROUP BY 1, 2),
         |bounds AS (SELECT min(h) mn, max(h) mx FROM cc),
         |sp AS (SELECT unnest(generate_series((SELECT mn FROM bounds),
         |      (SELECT mx FROM bounds)))::BIGINT h),
         |ty AS (SELECT DISTINCT event_type FROM cc),
         |g AS (SELECT ty.event_type, sp.h, coalesce(cc.c, 0)::BIGINT c
         |      FROM ty CROSS JOIN sp
         |      LEFT JOIN cc ON cc.event_type = ty.event_type AND cc.h = sp.h),
         |lg AS ($lagBlocks),
         |fl AS (SELECT * FROM lg
         |      WHERE h >= (SELECT mn FROM bounds) + lag_h),
         |ag AS (SELECT event_type, lag_h, count(*)::BIGINT n_pairs,
         |      sum(x)::BIGINT sx, sum(y)::BIGINT sy,
         |      sum(x::HUGEINT * y) sxy, sum(x::HUGEINT * x) sxx,
         |      sum(y::HUGEINT * y) syy
         |      FROM fl GROUP BY 1, 2),
         |mo AS (SELECT event_type, lag_h, n_pairs,
         |      n_pairs::HUGEINT * sxy - sx::HUGEINT * sy num,
         |      n_pairs::HUGEINT * sxx - sx::HUGEINT * sx dx,
         |      n_pairs::HUGEINT * syy - sy::HUGEINT * sy dy FROM ag)
         |SELECT event_type, lag_h, n_pairs,
         |       (CASE WHEN dx = 0 OR dy = 0 THEN 0
         |             WHEN num >= 0
         |               THEN (1000000::HUGEINT * num * num) // (dx * dy)
         |             ELSE -((1000000::HUGEINT * num * num) // (dx * dy))
         |        END)::BIGINT AS r2_signed_ppm
         |FROM mo ORDER BY event_type, lag_h""".stripMargin
    },
    // q285: the q276 capped edge CTE, brand labels on both endpoints,
    // degree mass per brand, the common-denominator modularity
    // numerator in HUGEINT, one sign-decomposed floored division.
    "q285_brand_modularity" ->
      """WITH it0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |      FROM lineitem),
        |it AS (SELECT ok, pk FROM (
        |        SELECT ok, pk, row_number() OVER
        |          (PARTITION BY ok ORDER BY pk) AS rn
        |        FROM it0) WHERE rn <= 1024),
        |e AS MATERIALIZED (SELECT DISTINCT a.pk AS p1, b.pk AS p2
        |      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
        |mm AS (SELECT count(*)::BIGINT m FROM e),
        |lb AS (SELECT p_partkey AS node, p_brand AS b FROM part),
        |ew AS (SELECT x.b AS brand, count(*)::BIGINT ew FROM e
        |      JOIN lb x ON x.node = e.p1 JOIN lb y ON y.node = e.p2
        |      WHERE x.b = y.b GROUP BY 1),
        |dg AS (SELECT node, count(*)::BIGINT dg FROM
        |      (SELECT p1 AS node FROM e UNION ALL SELECT p2 AS node FROM e)
        |      GROUP BY 1),
        |bd AS (SELECT lb.b AS brand, count(*)::BIGINT n_nodes,
        |      sum(dg.dg)::BIGINT deg_sum
        |      FROM dg JOIN lb ON lb.node = dg.node GROUP BY 1),
        |j AS (SELECT bd.brand, bd.n_nodes,
        |      coalesce(ew.ew, 0)::BIGINT n_edges_within, bd.deg_sum,
        |      4::HUGEINT * (SELECT m FROM mm) * coalesce(ew.ew, 0)
        |        - bd.deg_sum::HUGEINT * bd.deg_sum AS num
        |      FROM bd LEFT JOIN ew ON ew.brand = bd.brand)
        |SELECT brand, n_nodes, n_edges_within, deg_sum,
        |       (CASE WHEN num >= 0
        |          THEN (1000000::HUGEINT * num)
        |            // (4::HUGEINT * (SELECT m FROM mm) * (SELECT m FROM mm))
        |          ELSE -((1000000::HUGEINT * (-num))
        |            // (4::HUGEINT * (SELECT m FROM mm) * (SELECT m FROM mm)))
        |        END)::BIGINT AS contrib_micro
        |FROM j ORDER BY brand""".stripMargin,
    // q286: the q272 brand-month CTE with quantities, one floored
    // unit-price division per cell, the q91 moment numerators in
    // HUGEINT, sign-decomposed slope and r-squared divisions.
    "q286_price_elasticity" ->
      """WITH bm AS (SELECT p_brand brand,
        |        (year(l_shipdate) * 12 + month(l_shipdate) - 1)::BIGINT m,
        |        sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |          rev_cents,
        |        sum(l_quantity::BIGINT)::BIGINT qty
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      GROUP BY 1, 2),
        |pt AS (SELECT brand, m, rev_cents // qty AS x, qty AS y FROM bm),
        |ag AS (SELECT brand, count(*)::BIGINT n, sum(x)::BIGINT sx,
        |      sum(y)::BIGINT sy, sum(x::HUGEINT * y) sxy,
        |      sum(x::HUGEINT * x) sxx, sum(y::HUGEINT * y) syy
        |      FROM pt GROUP BY 1),
        |mo AS (SELECT brand, n,
        |      n::HUGEINT * sxy - sx::HUGEINT * sy num,
        |      n::HUGEINT * sxx - sx::HUGEINT * sx dx,
        |      n::HUGEINT * syy - sy::HUGEINT * sy dy FROM ag)
        |SELECT brand, n AS n_months,
        |       (CASE WHEN dx = 0 THEN 0
        |             WHEN num >= 0 THEN (1000000::HUGEINT * num) // dx
        |             ELSE -((1000000::HUGEINT * (-num)) // dx)
        |        END)::BIGINT AS slope_micro,
        |       (CASE WHEN dx = 0 OR dy = 0 THEN 0
        |             WHEN num >= 0
        |               THEN (1000000::HUGEINT * num * num) // (dx * dy)
        |             ELSE -((1000000::HUGEINT * num * num) // (dx * dy))
        |        END)::BIGINT AS r2_signed_ppm
        |FROM mo ORDER BY brand""".stripMargin,
    // q287: the q49 closure verbatim + token inventory, per-doc
    // (1000·nt)//cluster_n effective supply, the q157 corrected-isqrt
    // weight replay, 1-row weight total.
    "q287_effective_mixture" ->
      s"""WITH $NearDupClusterCte,
         |inv AS (SELECT d.source, d.doc_id,
         |      len(regexp_split_to_array(d.text, ' '))::BIGINT nt,
         |      cn.cluster_n
         |      FROM documents d JOIN lbl l ON l.doc_id = d.doc_id
         |      JOIN cn ON cn.cluster_id = l.cluster_id),
         |ag AS (SELECT source, sum(nt)::BIGINT raw_tokens,
         |      sum((1000 * nt) // cluster_n)::BIGINT eff_milli
         |      FROM inv GROUP BY 1),
         |e2 AS (SELECT source, raw_tokens, eff_milli,
         |      (eff_milli // 1000)::BIGINT eff_tokens FROM ag),
         |w0 AS (SELECT *, floor(sqrt(eff_tokens::DOUBLE))::BIGINT s0 FROM e2),
         |w1 AS (SELECT *, CASE WHEN s0 * s0 > eff_tokens THEN s0 - 1
         |      ELSE s0 END s1 FROM w0),
         |wt AS (SELECT source, raw_tokens, eff_tokens, eff_milli,
         |      CASE WHEN (s1 + 1) * (s1 + 1) <= eff_tokens THEN s1 + 1
         |      ELSE s1 END w FROM w1),
         |twt AS (SELECT sum(w)::BIGINT tw FROM wt)
         |SELECT source, raw_tokens, eff_tokens,
         |       (eff_milli // raw_tokens)::BIGINT AS discount_pm,
         |       w::BIGINT AS weight,
         |       ((1000 * w) // tw)::BIGINT AS share_pm
         |FROM wt, twt ORDER BY source""".stripMargin,
    // q288: (brand, part) revenue agg, in-brand rank/cumulative
    // windows, the prior-cumulative class rule, (brand, class) re-agg.
    "q288_abc_classes" -> {
      val (aBar, bBar) = Queries.AbcBarsPm
      s"""WITH pr AS (SELECT p_brand brand, l_partkey pk,
         |      sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT rev
         |      FROM lineitem JOIN part ON p_partkey = l_partkey
         |      GROUP BY 1, 2),
         |cw AS (SELECT brand, pk, rev,
         |      sum(rev) OVER (PARTITION BY brand ORDER BY rev DESC, pk
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
         |      sum(rev) OVER (PARTITION BY brand) brand_rev FROM pr),
         |cl AS (SELECT brand, rev, brand_rev,
         |      (1000 * (cum - rev)) // brand_rev AS prev_pm FROM cw),
         |cc AS (SELECT brand,
         |      CASE WHEN prev_pm < $aBar THEN 'A'
         |           WHEN prev_pm < $bBar THEN 'B' ELSE 'C' END cls,
         |      rev, brand_rev FROM cl)
         |SELECT brand, cls, count(*)::BIGINT AS n_parts,
         |       sum(rev)::BIGINT AS class_rev_cents,
         |       ((1000 * sum(rev)) // max(brand_rev))::BIGINT AS share_pm
         |FROM cc GROUP BY 1, 2 ORDER BY brand, cls""".stripMargin
    },
    // q289: supplier-keyed agg, the corrected ceil-isqrt radical
    // replay, one floored division clamped at 0 (pre-clamp sign
    // differences between // and div are absorbed by the clamp).
    "q289_wilson_ranking" ->
      """WITH ag AS (SELECT l_suppkey suppkey, count(*)::BIGINT n,
        |      sum(CASE WHEN l_returnflag != 'R' THEN 1 ELSE 0 END)::BIGINT s
        |      FROM lineitem GROUP BY 1),
        |r0 AS (SELECT *, n * (s * (n - s) + n) AS arg FROM ag),
        |r1 AS (SELECT *, floor(sqrt(arg::DOUBLE))::BIGINT s0 FROM r0),
        |r2 AS (SELECT *, CASE WHEN s0 * s0 > arg THEN s0 - 1 ELSE s0 END s1
        |      FROM r1),
        |r3 AS (SELECT *, CASE WHEN (s1 + 1) * (s1 + 1) <= arg THEN s1 + 1
        |      ELSE s1 END fl FROM r2),
        |r4 AS (SELECT *, CASE WHEN fl * fl = arg THEN fl ELSE fl + 1 END rad
        |      FROM r3)
        |SELECT suppkey, n AS n_lines, s AS n_ok,
        |       ((1000000 * s) // n)::BIGINT AS rate_ppm,
        |       greatest(0, (1000000 * (n * (s + 2) - 2 * rad))
        |         // (n * (n + 4)))::BIGINT AS wilson_lb_ppm
        |FROM r4 ORDER BY suppkey""".stripMargin,
    // q290: per n the distinct-per-doc shingle relation (the q23 sh
    // CTE at each order), df stats, capped equi-join pair set with
    // the source split, one row per n.
    "q290_shingle_ablation" -> {
      val cap = Dedup.AblationDfCap
      val blocks = Dedup.AblationNs.map { n =>
        val hi = if (n == 1) "tk[i:i]" else s"tk[i:i+${n - 1}]"
        s"""sh$n AS (SELECT DISTINCT doc_id,
           |      ${H(s"array_to_string($hi, ' ')")} h
           |      FROM (SELECT doc_id, tk,
           |            unnest(generate_series(1, len(tk) - ${n - 1})) i FROM t)),
           |df$n AS (SELECT h, count(*)::BIGINT df FROM sh$n GROUP BY 1),
           |st$n AS (SELECT count(*)::BIGINT gd,
           |      sum(CASE WHEN df > $cap THEN 1 ELSE 0 END)::BIGINT gx
           |      FROM df$n),
           |gi$n AS (SELECT sh.doc_id, sh.h FROM sh$n sh
           |      JOIN df$n dd ON dd.h = sh.h AND dd.df <= $cap),
           |pr$n AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM gi$n a
           |      JOIN gi$n b ON a.h = b.h AND a.doc_id < b.doc_id),
           |ps$n AS (SELECT
           |      sum(CASE WHEN x.source = y.source THEN 1 ELSE 0 END)
           |        ::BIGINT w,
           |      sum(CASE WHEN x.source != y.source THEN 1 ELSE 0 END)
           |        ::BIGINT c
           |      FROM pr$n JOIN documents x ON x.doc_id = da
           |      JOIN documents y ON y.doc_id = db),
           |row$n AS (SELECT $n::BIGINT n, gd, gx, coalesce(w, 0)::BIGINT pw,
           |      coalesce(c, 0)::BIGINT pc FROM st$n, ps$n)""".stripMargin
      }.mkString(",\n")
      val un = Dedup.AblationNs.map(n => s"SELECT * FROM row$n")
        .mkString(" UNION ALL ")
      s"""WITH t AS (SELECT doc_id,
         |      regexp_split_to_array(text, ' ') tk FROM documents),
         |$blocks
         |SELECT n, gd AS grams_distinct, gx AS grams_dropped,
         |       pw AS pairs_within, pc AS pairs_cross,
         |       (CASE WHEN pw + pc = 0 THEN 0
         |        ELSE (1000 * pc) // (pw + pc) END)::BIGINT AS cross_share_pm
         |FROM ($un) ORDER BY n""".stripMargin
    },
    // q291: the q264 per-frame relational aHash chain at 8 frames,
    // adjacent-frame join, split-half Hamming.
    "q291_scene_cuts" -> {
      val sf = Multimodal.SceneFrames
      s"""WITH fd AS (SELECT doc_id, text,
         |        ((length(text) - 64) // $sf)::BIGINT flen
         |      FROM documents
         |      WHERE (length(text) - 64) // $sf >= 64),
         |ff AS (SELECT doc_id, text, flen,
         |        unnest(generate_series(0, ${sf - 1})) f FROM fd),
         |fpx AS (SELECT doc_id, f, flen, p,
         |        ord(substr(text, (65 + f * flen + p)::INT, 1))::BIGINT v
         |      FROM (SELECT doc_id, text, flen, f,
         |              unnest(generate_series(0, flen - 1)) p FROM ff)),
         |fbl AS (SELECT doc_id, f, flen, (64 * p) // flen blk,
         |        sum(v)::BIGINT bsum, count(*)::BIGINT bcnt
         |      FROM fpx GROUP BY 1, 2, 3, 4),
         |ftt AS (SELECT doc_id, f, sum(bsum)::BIGINT tot FROM fbl
         |      GROUP BY 1, 2),
         |fbits AS (SELECT fbl.doc_id, fbl.f, blk,
         |        CASE WHEN bsum::HUGEINT * flen >= tot::HUGEINT * bcnt
         |          THEN 1::BIGINT ELSE 0::BIGINT END bt
         |      FROM fbl JOIN ftt ON ftt.doc_id = fbl.doc_id
         |        AND ftt.f = fbl.f),
         |fsg AS MATERIALIZED (SELECT doc_id, f,
         |        sum(CASE WHEN blk < 32 THEN bt << blk::INT ELSE 0 END)
         |          ::BIGINT lo,
         |        sum(CASE WHEN blk >= 32 THEN bt << (blk - 32)::INT
         |          ELSE 0 END)::BIGINT hi
         |      FROM fbits GROUP BY 1, 2)
         |SELECT a.doc_id, b.f::BIGINT AS frame,
         |       (bit_count(xor(a.lo, b.lo))
         |         + bit_count(xor(a.hi, b.hi)))::BIGINT AS dist,
         |       (CASE WHEN bit_count(xor(a.lo, b.lo))
         |           + bit_count(xor(a.hi, b.hi)) > ${Multimodal.SceneCutBits}
         |         THEN 1 ELSE 0 END)::BIGINT AS is_cut
         |FROM fsg a JOIN fsg b ON b.doc_id = a.doc_id AND b.f = a.f + 1
         |ORDER BY a.doc_id, frame""".stripMargin
    },
    // q292: the q181 session chain at lead-1, transition counts, one
    // cross-multiplied Gini division, modal pick via rank window.
    "q292_transition_impurity" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_ns(ts) tns
        |            FROM events),
        |s AS (SELECT user_id, event_id, event_type, tns,
        |      CASE WHEN lag(tns) OVER w IS NULL
        |             OR tns - lag(tns) OVER w > 1800000000000
        |           THEN 1 ELSE 0 END AS ns
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
        |s2 AS (SELECT user_id, event_id, event_type, tns,
        |       sum(ns) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid FROM s),
        |p AS (SELECT event_type AS ante, lead(event_type, 1) OVER w2 AS nxt
        |      FROM s2 WINDOW w2 AS (PARTITION BY user_id, sid
        |                            ORDER BY tns, event_id)),
        |c AS (SELECT ante, nxt, count(*)::BIGINT c FROM p
        |      WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |a AS (SELECT ante, sum(c)::BIGINT n, count(*)::BIGINT k,
        |      sum(c::HUGEINT * c) ssq FROM c GROUP BY 1),
        |tp AS (SELECT ante, nxt, c FROM (SELECT ante, nxt, c,
        |      row_number() OVER (PARTITION BY ante ORDER BY c DESC, nxt) rn
        |      FROM c) WHERE rn = 1)
        |SELECT a.ante, a.n AS n_transitions, a.k AS n_next_types,
        |       ((1000000::HUGEINT * (a.n::HUGEINT * a.n - ssq))
        |         // (a.n::HUGEINT * a.n))::BIGINT AS gini_ppm,
        |       tp.nxt AS top_next,
        |       ((1000 * tp.c) // a.n)::BIGINT AS top_share_pm
        |FROM a JOIN tp ON tp.ante = a.ante ORDER BY a.ante""".stripMargin,
    // q293: the q49 closure verbatim, row-local uniqueness banding,
    // band agg, 1-row corpus totals, cross-multiplied risk.
    "q293_quality_dup_association" ->
      s"""WITH $NearDupClusterCte,
         |b AS (SELECT d.doc_id,
         |      (((1000 * len(list_distinct(string_split(d.text, ' '))))
         |        // len(string_split(d.text, ' '))) // 100)::BIGINT band,
         |      CASE WHEN cn.cluster_n >= 2 THEN 1 ELSE 0 END dup
         |      FROM documents d JOIN lbl l ON l.doc_id = d.doc_id
         |      JOIN cn ON cn.cluster_id = l.cluster_id),
         |g AS (SELECT band, count(*)::BIGINT n_docs,
         |      sum(dup)::BIGINT n_dups FROM b GROUP BY 1),
         |t2 AS (SELECT sum(n_docs)::BIGINT nn, sum(n_dups)::BIGINT dd FROM g)
         |SELECT band, n_docs, n_dups,
         |       ((1000 * n_dups) // n_docs)::BIGINT AS dup_rate_pm,
         |       (CASE WHEN dd = 0 THEN 0
         |        ELSE (1000 * n_dups * nn) // (n_docs * dd)
         |        END)::BIGINT AS risk_milli
         |FROM g, t2 ORDER BY band""".stripMargin,
    // q294: (tier, lag-day) histogram, in-tier cumulatives, type-1
    // lower percentiles at the q272 ranks, breach share.
    "q294_priority_sla" ->
      s"""WITH lg AS (SELECT o_orderpriority priority,
         |      date_diff('day', o_orderdate, l_shipdate)::BIGINT lag
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |h AS (SELECT priority, lag, count(*)::BIGINT c FROM lg
         |      GROUP BY 1, 2),
         |cw AS (SELECT priority, lag, c,
         |      sum(c) OVER (PARTITION BY priority ORDER BY lag
         |        ROWS UNBOUNDED PRECEDING) cum,
         |      sum(c) OVER (PARTITION BY priority) n FROM h),
         |r AS (SELECT *, (n + 1) // 2 r50, (9 * n + 9) // 10 r90 FROM cw)
         |SELECT priority, max(n)::BIGINT AS n_lines,
         |       min(CASE WHEN cum >= r50 THEN lag END)::BIGINT AS p50_days,
         |       min(CASE WHEN cum >= r90 THEN lag END)::BIGINT AS p90_days,
         |       max(lag)::BIGINT AS max_days,
         |       ((1000 * sum(CASE WHEN lag > ${Queries.SlaBreachDays}
         |          THEN c ELSE 0 END)) // max(n))::BIGINT AS breach_pm
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // q295: (label, dim) micro moments, per-dim pairwise spreads
    // (integral — no per-class division), ONE cross-multiplied ratio.
    "q295_dim_label_informativeness" ->
      """WITH q AS (SELECT "label"::BIGINT lbl, i::BIGINT - 1 dim,
        |      floor(embedding[i]::DOUBLE * 1000000)::BIGINT vm
        |      FROM (SELECT label, embedding,
        |            unnest(generate_series(1, len(embedding))) i
        |            FROM embeddings)),
        |c AS (SELECT lbl, dim, count(*)::BIGINT nl, sum(vm)::BIGINT sl,
        |      sum(vm::HUGEINT * vm) ql FROM q GROUP BY 1, 2),
        |a AS (SELECT dim, sum(nl)::BIGINT n, sum(sl)::BIGINT s, sum(ql) q,
        |      sum(nl::HUGEINT * ql - sl::HUGEINT * sl) wp,
        |      sum(nl * (nl - 1))::BIGINT wpairs FROM c GROUP BY 1),
        |b AS (SELECT dim, n, wp, wpairs,
        |      n::HUGEINT * q - s::HUGEINT * s tp FROM a)
        |SELECT dim, n AS n_vecs, wp::BIGINT AS within_spread,
        |       tp::BIGINT AS total_spread,
        |       (CASE WHEN tp = 0 OR wpairs = 0 THEN 0
        |        ELSE (1000000::HUGEINT * wp * (n * (n - 1)))
        |          // (tp * wpairs) END)::BIGINT AS within_ratio_ppm
        |FROM b ORDER BY dim""".stripMargin,
    // q296: the q136 Lloyd CTEs verbatim, label contingency, doubled
    // pair masses, one floored division.
    "q296_cluster_label_rand" ->
      s"""WITH ${lloydCte(8)},
         |lb AS (SELECT vec_id, "label"::BIGINT lbl FROM embeddings),
         |cells AS (SELECT a2.cid, lb.lbl, count(*)::BIGINT nij
         |      FROM a2 JOIN lb ON lb.vec_id = a2.vec_id GROUP BY 1, 2),
         |t0 AS (SELECT sum(nij)::BIGINT n,
         |      sum(nij * (nij - 1))::BIGINT sij FROM cells),
         |ta AS (SELECT count(*)::BIGINT n_clusters,
         |      sum(a * (a - 1))::BIGINT sa FROM
         |      (SELECT cid, sum(nij)::BIGINT a FROM cells GROUP BY 1)),
         |tb AS (SELECT count(*)::BIGINT n_labels,
         |      sum(b * (b - 1))::BIGINT sb FROM
         |      (SELECT lbl, sum(nij)::BIGINT b FROM cells GROUP BY 1))
         |SELECT n AS n_vecs, n_clusters, n_labels,
         |       sij AS pair_mass_joint, sa AS pair_mass_clusters,
         |       sb AS pair_mass_labels,
         |       ((1000000 * (n * (n - 1) + 2 * sij - sa - sb))
         |         // (n * (n - 1)))::BIGINT AS rand_ppm
         |FROM t0, ta, tb""".stripMargin,
    // q297: 32-replica hash-weight fan, per-(segment, replica) exact
    // weighted means, 2nd/31st order statistics in 32-row partitions.
    "q297_bootstrap_ci" -> {
      val b = Queries.BootstrapB
      s"""WITH base AS (SELECT c_mktsegment segment, o_orderkey ok,
         |      CAST(round(o_totalprice * 100) AS BIGINT) cents
         |      FROM orders JOIN customer ON o_custkey = c_custkey),
         |fan AS (SELECT segment, ok, cents, b,
         |      bit_count(${H("CAST(ok AS VARCHAR) || ':' || CAST(b AS VARCHAR)")}
         |        % 16)::BIGINT w
         |      FROM base, generate_series(0, ${b - 1}) g(b)),
         |mn AS (SELECT segment, b, sum(w)::BIGINT sw,
         |      sum(w::HUGEINT * cents) swx FROM fan GROUP BY 1, 2),
         |mb AS (SELECT segment, b, (swx // sw)::BIGINT mb FROM mn
         |      WHERE sw > 0),
         |rk AS (SELECT segment, b, mb, row_number() OVER
         |      (PARTITION BY segment ORDER BY mb, b) rn FROM mb),
         |lo AS (SELECT segment,
         |      min(CASE WHEN rn = 2 THEN mb END)::BIGINT lo,
         |      min(CASE WHEN rn = ${b - 1} THEN mb END)::BIGINT hi
         |      FROM rk GROUP BY 1),
         |ag AS (SELECT segment, count(*)::BIGINT n_orders,
         |      (sum(cents) // count(*))::BIGINT mean_cents
         |      FROM base GROUP BY 1)
         |SELECT ag.segment, n_orders, mean_cents,
         |       lo.lo AS boot_lo_cents, lo.hi AS boot_hi_cents,
         |       (lo.hi - lo.lo)::BIGINT AS band_cents
         |FROM ag JOIN lo ON lo.segment = ag.segment ORDER BY 1""".stripMargin
    },
    // q298: customer-partition first/second order lead, segment gap
    // histogram, type-1 lower quartiles (the q294 cumulative shape).
    "q298_repeat_latency" ->
      """WITH o2 AS (SELECT o_custkey ck, o_orderdate,
        |      row_number() OVER w rn, lead(o_orderdate, 1) OVER w nxt
        |      FROM orders WINDOW w AS (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey)),
        |f AS (SELECT ck, date_diff('day', o_orderdate, nxt)::BIGINT gap
        |      FROM o2 WHERE rn = 1),
        |g AS (SELECT f.ck, f.gap, c_mktsegment segment FROM f
        |      JOIN customer ON c_custkey = f.ck),
        |cn AS (SELECT segment, count(*)::BIGINT n_customers,
        |      sum(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |        n_repeat FROM g GROUP BY 1),
        |h AS (SELECT segment, gap, count(*)::BIGINT c FROM g
        |      WHERE gap IS NOT NULL GROUP BY 1, 2),
        |cw AS (SELECT segment, gap, c,
        |      sum(c) OVER (PARTITION BY segment ORDER BY gap
        |        ROWS UNBOUNDED PRECEDING) cum,
        |      sum(c) OVER (PARTITION BY segment) n FROM h),
        |r AS (SELECT *, (n + 3) // 4 r25, (n + 1) // 2 r50,
        |      (3 * n + 3) // 4 r75 FROM cw),
        |p AS (SELECT segment,
        |      min(CASE WHEN cum >= r25 THEN gap END)::BIGINT p25_days,
        |      min(CASE WHEN cum >= r50 THEN gap END)::BIGINT p50_days,
        |      min(CASE WHEN cum >= r75 THEN gap END)::BIGINT p75_days
        |      FROM r GROUP BY 1)
        |SELECT cn.segment, n_customers, n_repeat,
        |       ((1000 * n_repeat) // n_customers)::BIGINT AS repeat_pm,
        |       p25_days, p50_days, p75_days
        |FROM cn LEFT JOIN p ON p.segment = cn.segment
        |ORDER BY 1""".stripMargin,
    // q299: the q279 exact top-5 chain, neighbor in-degrees, source
    // rollup, one-row slot/corpus totals, cross-multiplied bias.
    "q299_neighbor_concentration" -> {
      val stride = Similarity.PurityStride
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT q.vec_id q_id, n.vec_id nid,
         |      list_dot_product(q.v, n.v)
         |      / sqrt(list_dot_product(q.v, q.v) * list_dot_product(n.v, n.v)) c
         |      FROM e q, e n
         |      WHERE q.vec_id % $stride = 0 AND n.vec_id != q.vec_id),
         |r AS (SELECT q_id, nid FROM (SELECT q_id, nid,
         |      row_number() OVER (PARTITION BY q_id ORDER BY c DESC, nid) rnk
         |      FROM s) WHERE rnk <= 5),
         |ind AS (SELECT nid, count(*)::BIGINT indeg FROM r GROUP BY 1),
         |bs AS (SELECT d.source, sum(indeg)::BIGINT n_cited_slots,
         |      count(*)::BIGINT n_distinct_docs, max(indeg)::BIGINT max_indeg
         |      FROM ind JOIN documents d ON d.doc_id = ind.nid GROUP BY 1),
         |cp AS (SELECT d.source, count(*)::BIGINT n_corpus FROM e
         |      JOIN documents d ON d.doc_id = e.vec_id GROUP BY 1),
         |g AS (SELECT bs.*, cp.n_corpus FROM bs
         |      JOIN cp ON cp.source = bs.source),
         |t3 AS (SELECT sum(n_cited_slots)::BIGINT ts,
         |      sum(n_corpus)::BIGINT tc FROM g)
         |SELECT source, n_corpus, n_cited_slots, n_distinct_docs, max_indeg,
         |       ((1000 * n_cited_slots) // ts)::BIGINT AS slot_share_pm,
         |       ((1000 * n_cited_slots * tc) // (ts * n_corpus))::BIGINT
         |         AS bias_milli
         |FROM g, t3 ORDER BY source""".stripMargin
    },
    // q300: (source, token) counts -> count-of-counts rollup; Chao1 /
    // Good-Turing floors replayed in plain BIGINT arithmetic.
    "q300_vocab_saturation" ->
      """WITH t AS (SELECT source, unnest(regexp_split_to_array(text, ' ')) AS tok
        |           FROM documents),
        |c AS (SELECT source, tok, count(*)::BIGINT n FROM t GROUP BY 1, 2),
        |a AS (SELECT source, sum(n)::BIGINT n_tokens, count(*)::BIGINT n_types,
        |      count(*) FILTER (n = 1)::BIGINT f1,
        |      count(*) FILTER (n = 2)::BIGINT f2
        |      FROM c GROUP BY 1),
        |k AS (SELECT *, (n_types + (f1 * (f1 - 1)) // (2 * (f2 + 1)))::BIGINT chao1
        |      FROM a)
        |SELECT source, n_tokens, n_types, f1, f2, chao1,
        |  ((1000000 * f1) // n_tokens)::BIGINT AS unseen_ppm,
        |  (1000000 - (1000000 * f1) // n_tokens)::BIGINT AS coverage_ppm,
        |  ((1000 * n_types) // chao1)::BIGINT AS saturation_pm
        |FROM k ORDER BY source""".stripMargin,
    // q301: day-grid cumsum, cross-multiplied CUSUM deviation, argmax
    // row per type (ties to earliest day), div-NULL after-rate at k=n.
    "q301_cusum_changepoint" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT event_type, day::BIGINT AS day, count(*)::BIGINT AS n
        |      FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n,
        |      row_number() OVER (PARTITION BY event_type ORDER BY day)::BIGINT AS k,
        |      sum(n) OVER (PARTITION BY event_type ORDER BY day
        |        ROWS UNBOUNDED PRECEDING)::BIGINT AS s,
        |      count(*) OVER (PARTITION BY event_type)::BIGINT AS nd,
        |      sum(n) OVER (PARTITION BY event_type)::BIGINT AS total
        |      FROM c),
        |d AS (SELECT *, abs(nd * s - k * total)::BIGINT AS dev FROM w),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY dev DESC, day) AS rn FROM d)
        |SELECT event_type, nd AS n_days, total, day AS cut_day, k AS cut_k,
        |  dev AS dev_scaled,
        |  ((1000 * dev) // (nd * total))::BIGINT AS cusum_pm,
        |  ((1000 * s) // k)::BIGINT AS rate_before_milli,
        |  (CASE WHEN k < nd THEN (1000 * (total - s)) // (nd - k)
        |   END)::BIGINT AS rate_after_milli
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // q302: (priority, lag) histogram, strictly-below kept cumulative,
    // doubled-U / tie-corrected z^2 in HUGEINT (mirrors the Spark
    // DECIMAL(38,0) arithmetic); degenerate groups -> div-NULL.
    "q302_ranksum_shiplag" ->
      """WITH lg AS (SELECT o_orderpriority priority,
        |      date_diff('day', o_orderdate, l_shipdate)::BIGINT lag,
        |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END ret
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h AS (SELECT priority, lag, sum(ret)::BIGINT a,
        |      sum(1 - ret)::BIGINT b FROM lg GROUP BY 1, 2),
        |c AS (SELECT priority, lag, a, b,
        |      coalesce(sum(b) OVER (PARTITION BY priority ORDER BY lag
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT blt
        |      FROM h),
        |g AS (SELECT priority, sum(a)::BIGINT n_ret, sum(b)::BIGINT n_kept,
        |      sum(a * (2 * blt + b))::BIGINT u2,
        |      sum((a + b) * (a + b) * (a + b) - (a + b))::BIGINT ties3
        |      FROM c GROUP BY 1),
        |f AS (SELECT *, (n_ret + n_kept)::BIGINT n,
        |      (u2 - n_ret * n_kept)::BIGINT dev2 FROM g)
        |SELECT priority, n_ret, n_kept, u2,
        |  ((1000000 * u2::HUGEINT) // (2 * n_ret::HUGEINT * n_kept))::BIGINT AS cles_ppm,
        |  dev2,
        |  ((3000 * dev2::HUGEINT * dev2 * n * (n - 1))
        |    // (n_ret::HUGEINT * n_kept
        |        * ((n::HUGEINT * n * n - n) - ties3)))::BIGINT AS z2_milli
        |FROM f ORDER BY priority""".stripMargin,
    // q303: bipartite edge CTE, three unnormalized a->h HITS rounds in
    // HUGEINT (mirrors Graph.hitsBipartite's DECIMAL(38,0) sums round
    // for round), one final ppm normalization per side. MATERIALIZED
    // throughout - each round is referenced twice (next round + final
    // select) and DuckDB would otherwise inline the tree exponentially
    // (the q162 kCore lesson).
    "q303_hits_bipartite" -> {
      val K = Graph.HitsIters
      val rounds = (2 to K).map { k =>
        s"""a$k AS MATERIALIZED (SELECT p, sum(h)::HUGEINT a FROM be
           |      JOIN h${k - 1} USING (c) GROUP BY 1),
           |h$k AS MATERIALIZED (SELECT c, sum(a)::HUGEINT h FROM be
           |      JOIN a$k USING (p) GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH be AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, l_partkey AS p
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |a1 AS MATERIALIZED (SELECT p, count(*)::HUGEINT a FROM be GROUP BY 1),
         |h1 AS MATERIALIZED (SELECT c, sum(a)::HUGEINT h FROM be
         |      JOIN a1 USING (p) GROUP BY 1),
         |$rounds,
         |att AS (SELECT sum(a) ta FROM a$K),
         |htt AS (SELECT sum(h) th FROM h$K),
         |dp AS (SELECT p, count(*)::BIGINT degree FROM be GROUP BY 1),
         |dc AS (SELECT c, count(*)::BIGINT degree FROM be GROUP BY 1)
         |SELECT * FROM (
         |  SELECT 'auth' AS node_type, a.p AS node, dp.degree,
         |         ((1000000 * a.a) // att.ta)::BIGINT AS score_ppm
         |  FROM a$K a JOIN dp ON dp.p = a.p, att
         |  UNION ALL
         |  SELECT 'hub' AS node_type, h.c AS node, dc.degree,
         |         ((1000000 * h.h) // htt.th)::BIGINT AS score_ppm
         |  FROM h$K h JOIN dc ON dc.c = h.c, htt)
         |ORDER BY node_type, node""".stripMargin
    },
    // q304: r*c cell grid, margin/total CTEs, HUGEINT squared residual
    // (mirrors the Spark DECIMAL(38,0) arithmetic cell for cell).
    "q304_chisq_independence" ->
      """WITH cells AS (SELECT o_orderpriority priority, l_returnflag returnflag,
        |      count(*)::BIGINT o
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
        |rm AS (SELECT priority, sum(o)::BIGINT r_tot FROM cells GROUP BY 1),
        |cm AS (SELECT returnflag, sum(o)::BIGINT c_tot FROM cells GROUP BY 1),
        |tot AS (SELECT sum(o)::BIGINT n, count(DISTINCT priority)::BIGINT r,
        |      count(DISTINCT returnflag)::BIGINT c FROM cells),
        |g AS (SELECT cells.priority, cells.returnflag, o, r_tot, c_tot, n, r, c,
        |      ((1000 * (n::HUGEINT * o - r_tot::HUGEINT * c_tot)
        |            * (n::HUGEINT * o - r_tot::HUGEINT * c_tot))
        |        // (n::HUGEINT * r_tot * c_tot))::BIGINT contrib_milli
        |      FROM cells JOIN rm ON rm.priority = cells.priority
        |                 JOIN cm ON cm.returnflag = cells.returnflag, tot),
        |ch AS (SELECT sum(contrib_milli)::BIGINT chisq_milli FROM g)
        |SELECT priority, returnflag, o,
        |  ((1000 * r_tot::HUGEINT * c_tot) // n)::BIGINT AS expected_milli,
        |  contrib_milli, chisq_milli,
        |  ((r - 1) * (c - 1))::BIGINT AS df,
        |  ((1000 * chisq_milli) // (n * (least(r, c) - 1)))::BIGINT AS v2_ppm
        |FROM g, ch ORDER BY priority, returnflag""".stripMargin,
    // q305: day-grid moments per type; the burst flag's squared compare
    // in HUGEINT with the direction guard (over-dispersed side only).
    "q305_event_overdispersion" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT event_type, day, count(*)::BIGINT n FROM e GROUP BY 1, 2),
        |a AS (SELECT event_type, count(*)::BIGINT nd, sum(n)::BIGINT total,
        |      sum(n * n)::BIGINT sumsq FROM c GROUP BY 1),
        |k AS (SELECT *, (nd * sumsq - total * total)::BIGINT num FROM a)
        |SELECT event_type, nd AS n_days, total,
        |  ((1000 * num) // ((nd - 1) * total))::BIGINT AS vmr_milli,
        |  ((1000 * num) // total)::BIGINT AS dispersion_milli,
        |  (CASE WHEN (num::HUGEINT - (nd - 1) * total)
        |           * (num::HUGEINT - (nd - 1) * total)
        |         > 18 * (nd::HUGEINT - 1) * total * total
        |        AND num > (nd - 1) * total THEN 1 ELSE 0 END)::BIGINT AS burst_flag
        |FROM k ORDER BY event_type""".stripMargin,
    // q306: the q298 gap relation, q297's hash weights fanned 32x,
    // weighted type-1 medians per replica, 2nd/31st order statistics.
    "q306_median_bootstrap" -> {
      val b = Queries.BootstrapB
      s"""WITH o2 AS (SELECT o_custkey ck, o_orderdate,
         |      row_number() OVER w rn, lead(o_orderdate, 1) OVER w nxt
         |      FROM orders WINDOW w AS (PARTITION BY o_custkey
         |        ORDER BY o_orderdate, o_orderkey)),
         |f AS (SELECT ck, date_diff('day', o_orderdate, nxt)::BIGINT gap
         |      FROM o2 WHERE rn = 1 AND nxt IS NOT NULL),
         |g AS (SELECT f.ck, f.gap, c_mktsegment segment FROM f
         |      JOIN customer ON c_custkey = f.ck),
         |fan AS (SELECT segment, ck, gap, b,
         |      bit_count(${H("CAST(ck AS VARCHAR) || ':' || CAST(b AS VARCHAR)")}
         |        % 16)::BIGINT w
         |      FROM g, generate_series(0, ${b - 1}) gs(b)),
         |hb AS (SELECT segment, b, gap, sum(w)::BIGINT c FROM fan GROUP BY 1, 2, 3),
         |cw AS (SELECT segment, b, gap, c,
         |      sum(c) OVER (PARTITION BY segment, b ORDER BY gap
         |        ROWS UNBOUNDED PRECEDING) cum,
         |      sum(c) OVER (PARTITION BY segment, b) tw FROM hb),
         |md AS (SELECT segment, b,
         |      min(CASE WHEN cum >= (tw + 1) // 2 THEN gap END)::BIGINT med
         |      FROM cw WHERE tw > 0 GROUP BY 1, 2),
         |rk AS (SELECT segment, b, med, row_number() OVER
         |      (PARTITION BY segment ORDER BY med, b) rn FROM md),
         |bb AS (SELECT segment,
         |      min(CASE WHEN rn = 2 THEN med END)::BIGINT lo,
         |      min(CASE WHEN rn = ${b - 1} THEN med END)::BIGINT hi
         |      FROM rk GROUP BY 1),
         |hp AS (SELECT segment, gap, count(*)::BIGINT c FROM g GROUP BY 1, 2),
         |cp AS (SELECT segment, gap, c,
         |      sum(c) OVER (PARTITION BY segment ORDER BY gap
         |        ROWS UNBOUNDED PRECEDING) cum,
         |      sum(c) OVER (PARTITION BY segment) tw FROM hp),
         |pt AS (SELECT segment, max(tw)::BIGINT n_gaps,
         |      min(CASE WHEN cum >= (tw + 1) // 2 THEN gap END)::BIGINT med_days
         |      FROM cp GROUP BY 1)
         |SELECT pt.segment, n_gaps, med_days, bb.lo AS boot_lo_days,
         |       bb.hi AS boot_hi_days, (bb.hi - bb.lo)::BIGINT AS band_days
         |FROM pt JOIN bb ON bb.segment = pt.segment ORDER BY 1""".stripMargin
    },
    // q307: the q269 int8 quantization twin, sampled pairs, exact
    // cross-multiplied signed-squared-cosine ppm in HUGEINT, bucketed
    // score histogram, q302's doubled-U rank sum per query source.
    "q307_embedding_label_auc" -> {
      val stride = Similarity.PurityStride
      val bw = Similarity.AucBucketWidth
      s"""WITH e AS (SELECT vec_id, "label" lbl, embedding::DOUBLE[] v FROM embeddings
         |      WHERE "label" IS NOT NULL),
         |sq AS (SELECT vec_id, lbl, v,
         |      127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') sc
         |      FROM e
         |      WHERE list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0),
         |q8 AS (SELECT vec_id, lbl, list_transform(v, x ->
         |        (CASE WHEN x >= 0 THEN floor(abs(x * sc) + 0.5)
         |          ELSE -floor(abs(x * sc) + 0.5) END)::DOUBLE) q FROM sq),
         |qq AS (SELECT vec_id, lbl, q, list_dot_product(q, q)::BIGINT qn
         |      FROM q8 WHERE list_dot_product(q, q) > 0),
         |pr AS (SELECT a.vec_id q_id, a.lbl = b.lbl same,
         |      list_dot_product(a.q, b.q)::BIGINT dq,
         |      a.qn qnq, b.qn qnb
         |      FROM qq a, qq b
         |      WHERE a.vec_id % $stride = 0 AND b.vec_id != a.vec_id),
         |sc2 AS (SELECT q_id, same,
         |      (CASE WHEN dq >= 0
         |        THEN (1000000 * dq::HUGEINT * dq) // (qnq::HUGEINT * qnb)
         |        ELSE -((1000000 * dq::HUGEINT * dq) // (qnq::HUGEINT * qnb))
         |       END)::BIGINT s_ppm FROM pr),
         |bk AS (SELECT d.source, (s_ppm + 1000000) // $bw AS bucket,
         |      sum(CASE WHEN same THEN 1 ELSE 0 END)::BIGINT a,
         |      sum(CASE WHEN same THEN 0 ELSE 1 END)::BIGINT b
         |      FROM sc2 JOIN documents d ON d.doc_id = sc2.q_id
         |      GROUP BY 1, 2),
         |cw AS (SELECT source, bucket, a, b,
         |      coalesce(sum(b) OVER (PARTITION BY source ORDER BY bucket
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT blt
         |      FROM bk),
         |g AS (SELECT source, sum(a)::BIGINT n_same, sum(b)::BIGINT n_diff,
         |      sum(a::HUGEINT * (2 * blt + b)) u2h FROM cw GROUP BY 1)
         |SELECT source, n_same, n_diff, u2h::BIGINT AS u2,
         |  ((1000000 * u2h) // (2 * n_same::HUGEINT * n_diff))::BIGINT AS auc_ppm
         |FROM g ORDER BY source""".stripMargin
    },
    // q308: q306's gap relation with 365-day administrative censoring,
    // event-day grid windows, per-day micro-floored hypergeometric
    // moments (mirrors the Spark driver's BigInt fold day for day).
    "q308_logrank_repeat" -> {
      val h = Queries.LogRankHorizonDays
      s"""WITH o2 AS (SELECT o_custkey ck, o_orderdate, o_orderpriority,
         |      row_number() OVER w rn, lead(o_orderdate, 1) OVER w nxt
         |      FROM orders WINDOW w AS (PARTITION BY o_custkey
         |        ORDER BY o_orderdate, o_orderkey)),
         |f AS (SELECT CASE WHEN substr(o_orderpriority, 1, 1)::INT <= 2
         |        THEN 1 ELSE 0 END g1,
         |      CASE WHEN nxt IS NOT NULL
         |        AND date_diff('day', o_orderdate, nxt) <= $h
         |        THEN date_diff('day', o_orderdate, nxt)::BIGINT END t
         |      FROM o2 WHERE rn = 1),
         |tt AS (SELECT sum(g1)::BIGINT n1, count(*)::BIGINT n,
         |      sum(CASE WHEN t IS NOT NULL THEN g1 ELSE 0 END)::BIGINT ev1,
         |      sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END)::BIGINT ev
         |      FROM f),
         |dd AS (SELECT t, sum(g1)::BIGINT d1, count(*)::BIGINT dt FROM f
         |      WHERE t IS NOT NULL GROUP BY 1),
         |cw AS (SELECT t, d1, dt,
         |      coalesce(sum(d1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
         |        PRECEDING AND 1 PRECEDING), 0)::BIGINT cum1,
         |      coalesce(sum(dt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
         |        PRECEDING AND 1 PRECEDING), 0)::BIGINT cum FROM dd),
         |pp AS (SELECT dt, (tt.n1 - cum1)::BIGINT n1t, (tt.n - cum)::BIGINT nt
         |      FROM cw, tt),
         |sm AS (SELECT sum((1000000 * dt::HUGEINT * n1t) // nt) e1mic,
         |      sum(CASE WHEN nt > 1 THEN
         |        (1000000 * dt::HUGEINT * n1t * (nt - n1t) * (nt - dt))
         |          // (nt::HUGEINT * nt * (nt - 1)) ELSE 0 END) vmic
         |      FROM pp),
         |zz AS (SELECT tt.n1, tt.n, tt.ev1, tt.ev,
         |      coalesce(sm.e1mic, 0) e1mic, coalesce(sm.vmic, 0) vmic,
         |      1000000 * tt.ev1 - coalesce(sm.e1mic, 0) delta
         |      FROM tt, sm)
         |SELECT n1 AS n_urgent, (n - n1)::BIGINT AS n_rest,
         |  ev1 AS events_urgent, (ev - ev1)::BIGINT AS events_rest,
         |  e1mic::BIGINT AS e1_micro, vmic::BIGINT AS v_micro,
         |  ((1000 * delta::HUGEINT * delta)
         |    // (CASE WHEN vmic > 0 THEN 1000000 * vmic END))::BIGINT
         |    AS z2_milli,
         |  (CASE WHEN delta > 0 THEN 1 WHEN delta < 0 THEN -1
         |   ELSE 0 END)::BIGINT AS urgent_faster
         |FROM zz""".stripMargin
    },
    // q309: the q114 scoring chain with BOTH stat sets — raw doc dfs
    // and cluster dfs over the shared recursive near-dup closure.
    "q309_bm25_dedup" ->
      s"""WITH $NearDupClusterCte,
         |pd AS (SELECT p.doc_id, lbl.cluster_id, len(tk)::BIGINT AS dl,
         |  len(list_filter(tk, x -> x = 'hash'))::BIGINT AS tf_hash,
         |  len(list_filter(tk, x -> x = 'join'))::BIGINT AS tf_join,
         |  len(list_filter(tk, x -> x = 'vector'))::BIGINT AS tf_vector
         |  FROM t p JOIN lbl ON lbl.doc_id = p.doc_id),
         |st AS (SELECT count(*)::BIGINT AS n_docs,
         |  count(DISTINCT cluster_id)::BIGINT AS n_clusters,
         |  sum(dl)::BIGINT AS n_tokens,
         |  count(*) FILTER (tf_hash > 0)::BIGINT AS dfr_hash,
         |  count(*) FILTER (tf_join > 0)::BIGINT AS dfr_join,
         |  count(*) FILTER (tf_vector > 0)::BIGINT AS dfr_vector,
         |  count(DISTINCT CASE WHEN tf_hash > 0 THEN cluster_id END)::BIGINT AS dfc_hash,
         |  count(DISTINCT CASE WHEN tf_join > 0 THEN cluster_id END)::BIGINT AS dfc_join,
         |  count(DISTINCT CASE WHEN tf_vector > 0 THEN cluster_id END)::BIGINT AS dfc_vector
         |  FROM pd),
         |c AS (SELECT pd.*, st.*,
         |  250 + (750000 * dl) // ((1000 * n_tokens) // n_docs) AS norm_milli
         |  FROM pd CROSS JOIN st),
         |sc AS (SELECT doc_id, cluster_id, dl,
         |  ((((1000 * (2 * (n_docs - dfr_hash) + 1)) // (2 * dfr_hash + 1)) *
         |    ((tf_hash * 2200000000) //
         |     (tf_hash * 1000 + (1200 * norm_milli) // 1000))) // 1000
         |  + (((1000 * (2 * (n_docs - dfr_join) + 1)) // (2 * dfr_join + 1)) *
         |    ((tf_join * 2200000000) //
         |     (tf_join * 1000 + (1200 * norm_milli) // 1000))) // 1000
         |  + (((1000 * (2 * (n_docs - dfr_vector) + 1)) // (2 * dfr_vector + 1)) *
         |    ((tf_vector * 2200000000) //
         |     (tf_vector * 1000 + (1200 * norm_milli) // 1000))) // 1000)::BIGINT
         |  AS score_raw_micro,
         |  ((((1000 * (2 * (n_clusters - dfc_hash) + 1)) // (2 * dfc_hash + 1)) *
         |    ((tf_hash * 2200000000) //
         |     (tf_hash * 1000 + (1200 * norm_milli) // 1000))) // 1000
         |  + (((1000 * (2 * (n_clusters - dfc_join) + 1)) // (2 * dfc_join + 1)) *
         |    ((tf_join * 2200000000) //
         |     (tf_join * 1000 + (1200 * norm_milli) // 1000))) // 1000
         |  + (((1000 * (2 * (n_clusters - dfc_vector) + 1)) // (2 * dfc_vector + 1)) *
         |    ((tf_vector * 2200000000) //
         |     (tf_vector * 1000 + (1200 * norm_milli) // 1000))) // 1000)::BIGINT
         |  AS score_dedup_micro FROM c)
         |SELECT doc_id, cluster_id, dl, score_raw_micro, score_dedup_micro,
         |  (score_dedup_micro - score_raw_micro)::BIGINT AS shift_micro
         |FROM sc WHERE score_dedup_micro > 0
         |ORDER BY score_dedup_micro DESC, doc_id LIMIT 10""".stripMargin,
    // q310: the q171 grouping with source as the sensitive attribute;
    // the (group x source) grid completed by a bounded cross join so
    // missing cells contribute their full corpus mass to t.
    "q310_l_diversity" ->
      s"""WITH c0 AS (SELECT lang,
         |      len(regexp_split_to_array(text, ' '))::BIGINT
         |        // ${Curation.AnonBucketTokens} AS len_bucket,
         |      source FROM documents),
         |cl AS (SELECT lang, len_bucket, source, count(*)::BIGINT n_gs
         |      FROM c0 GROUP BY 1, 2, 3),
         |g AS (SELECT lang, len_bucket, sum(n_gs)::BIGINT n_docs,
         |      count(*)::BIGINT l_distinct, max(n_gs)::BIGINT modal_n
         |      FROM cl GROUP BY 1, 2),
         |s AS (SELECT source, sum(n_gs)::BIGINT n_s FROM cl GROUP BY 1),
         |tt AS (SELECT sum(n_s)::BIGINT n_corpus FROM s),
         |grid AS (SELECT g.lang, g.len_bucket, g.n_docs, s.source, s.n_s,
         |      coalesce(cl.n_gs, 0)::BIGINT n_gs
         |      FROM g CROSS JOIN s
         |      LEFT JOIN cl ON cl.lang = g.lang
         |        AND cl.len_bucket = g.len_bucket AND cl.source = s.source),
         |tn AS (SELECT lang, len_bucket,
         |      sum(abs(n_gs * tt.n_corpus - n_s * n_docs))::BIGINT t_num,
         |      max(tt.n_corpus)::BIGINT n_corpus
         |      FROM grid, tt GROUP BY 1, 2)
         |SELECT g.lang, g.len_bucket, g.n_docs, g.l_distinct,
         |  ((1000 * modal_n) // n_docs)::BIGINT AS modal_share_pm,
         |  ((1000 * t_num) // (2 * n_docs * tn.n_corpus))::BIGINT AS t_pm,
         |  (CASE WHEN n_docs < ${Curation.AnonK} THEN 1 ELSE 0 END)::BIGINT
         |    AS k_suppressed,
         |  (CASE WHEN l_distinct < ${Curation.LDiversityL} THEN 1 ELSE 0
         |   END)::BIGINT AS l_low
         |FROM g JOIN tn ON tn.lang = g.lang AND tn.len_bucket = g.len_bucket
         |ORDER BY g.lang, g.len_bucket""".stripMargin,
    // q311: the q131 BFS relaxation with a seed dimension —
    // MATERIALIZED rounds (each referenced by the next round's join
    // AND union; inlined the tree doubles per round, the q162 lesson).
    "q311_harmonic_closeness" -> {
      val rounds = (1 to Graph.BfsRounds).map { k =>
        s"""d$k AS MATERIALIZED (SELECT seed, node, min(dist)::BIGINT AS dist FROM (
           |  SELECT x.seed, e.dst AS node, x.dist + 1 AS dist
           |  FROM d${k - 1} x JOIN e ON e.src = x.node
           |  UNION ALL SELECT seed, node, dist FROM d${k - 1})
           |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $TradeGraphCte,
         |sd AS (SELECT DISTINCT src AS seed FROM e
         |       WHERE src % 2 = 0 AND (src // 2) % 5 = 0
         |       ORDER BY src LIMIT ${Graph.HarmonicSeeds}),
         |d0 AS (SELECT seed, seed AS node, 0::BIGINT AS dist FROM sd),
         |$rounds
         |SELECT node, count(*)::BIGINT AS n_seeds_reached,
         |       sum(1000 // dist)::BIGINT AS harmonic_milli
         |FROM d${Graph.BfsRounds} WHERE dist > 0
         |GROUP BY 1 ORDER BY node""".stripMargin
    },
    // q312: q130's transition window, even-user train grid, modal
    // predictor + unconditional baseline, odd-user top-1 scoring.
    "q312_markov_backtest" ->
      """WITH tr0 AS (SELECT user_id, event_type AS from_type,
        |      lead(event_type, 1) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS to_type
        |      FROM events),
        |tr AS (SELECT from_type, to_type, user_id % 2 = 0 AS is_train
        |      FROM tr0 WHERE to_type IS NOT NULL),
        |c AS (SELECT from_type, to_type, count(*)::BIGINT n FROM tr
        |      WHERE is_train GROUP BY 1, 2),
        |p AS (SELECT from_type, to_type AS predicted FROM (
        |      SELECT *, row_number() OVER (PARTITION BY from_type
        |        ORDER BY n DESC, to_type) rn FROM c) WHERE rn = 1),
        |b AS (SELECT to_type AS base_pred FROM (
        |      SELECT to_type, sum(n) nb FROM c GROUP BY 1
        |      ORDER BY nb DESC, to_type LIMIT 1)),
        |ev AS (SELECT tr.from_type, tr.to_type, p.predicted, b.base_pred
        |      FROM tr LEFT JOIN p ON p.from_type = tr.from_type, b
        |      WHERE NOT is_train)
        |SELECT from_type, max(predicted) AS predicted,
        |  count(*)::BIGINT AS n_test,
        |  sum(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)::BIGINT
        |    AS n_hits,
        |  ((1000 * sum(CASE WHEN to_type = predicted THEN 1 ELSE 0 END))
        |    // count(*))::BIGINT AS acc_pm,
        |  sum(CASE WHEN to_type = base_pred THEN 1 ELSE 0 END)::BIGINT
        |    AS n_base_hits,
        |  ((1000 * sum(CASE WHEN to_type = base_pred THEN 1 ELSE 0 END))
        |    // count(*))::BIGINT AS base_acc_pm,
        |  ((1000 * sum(CASE WHEN to_type = predicted THEN 1 ELSE 0 END))
        |    // sum(CASE WHEN to_type = base_pred THEN 1 ELSE 0 END))::BIGINT
        |    AS lift_milli
        |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    // q313: the q129 weight chain + source join + HUGEINT Kish rollup.
    "q313_importance_ess" ->
      s"""WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w
         |           FROM documents),
         |tb AS (SELECT doc_id, ${H("w")} % 1024 AS b FROM t),
         |bc AS (SELECT b, count(*) FILTER (doc_id % 97 = 0)::BIGINT AS tb,
         |              count(*) FILTER (doc_id % 97 != 0)::BIGINT AS rb
         |       FROM tb GROUP BY 1),
         |st AS (SELECT sum(tb)::BIGINT AS tt, sum(rb)::BIGINT AS rt FROM bc),
         |wt AS (SELECT b, ((1000::HUGEINT * (tb + 1) * (rt + 1024))
         |                   // ((rb + 1)::HUGEINT * (tt + 1024)))::BIGINT AS wm
         |       FROM bc, st),
         |af AS (SELECT tb.doc_id, (sum(wm) // count(*))::BIGINT w
         |       FROM tb JOIN wt ON wt.b = tb.b WHERE tb.doc_id % 97 != 0
         |       GROUP BY tb.doc_id),
         |j AS (SELECT d.source, af.w FROM af
         |      JOIN documents d ON d.doc_id = af.doc_id),
         |g AS (SELECT source, count(*)::BIGINT n_docs, sum(w)::BIGINT sw,
         |      sum(w::HUGEINT * w) sww, max(w)::BIGINT w_max
         |      FROM j GROUP BY 1)
         |SELECT source, n_docs, sw, w_max,
         |  ((1000 * sw::HUGEINT * sw) // (n_docs::HUGEINT * sww))::BIGINT
         |    AS ess_pm,
         |  ((1000 * w_max) // sw)::BIGINT AS max_share_pm
         |FROM g ORDER BY source""".stripMargin,
    // q314: q64's centroid grid, pos-keyed pair self-join, the
    // q269/q307 signed-squared-cosine integerization in HUGEINT.
    "q314_label_confusability" ->
      """WITH e AS (SELECT label, embedding,
        |           unnest(generate_series(1, len(embedding))) i FROM embeddings),
        |c0 AS (SELECT "label"::BIGINT lbl, i::BIGINT - 1 pos,
        |      floor(embedding[i]::DOUBLE * 1000000)::BIGINT vm FROM e),
        |ct AS (SELECT lbl, pos, floor(sum(vm) / count(*))::BIGINT c
        |      FROM c0 GROUP BY 1, 2),
        |pr AS (SELECT a.lbl la, b.lbl lb, sum(a.c * b.c)::BIGINT dot,
        |      sum(a.c * a.c)::BIGINT na, sum(b.c * b.c)::BIGINT nb,
        |      sum((a.c - b.c) * (a.c - b.c))::BIGINT d2
        |      FROM ct a JOIN ct b ON a.pos = b.pos AND a.lbl < b.lbl
        |      GROUP BY 1, 2)
        |SELECT la AS label_a, lb AS label_b,
        |  (CASE WHEN dot >= 0
        |    THEN (1000000 * dot::HUGEINT * dot) // (na::HUGEINT * nb)
        |    ELSE -((1000000 * dot::HUGEINT * dot) // (na::HUGEINT * nb))
        |   END)::BIGINT AS cos2_ppm,
        |  d2 AS d2_micro2
        |FROM pr ORDER BY label_a, label_b""".stripMargin,
    // q315: (priority, period) counts, cleared-denominator pooled z^2
    // in HUGEINT; degenerate slices -> div-NULL.
    "q315_return_rate_drift" -> {
      val cut = Queries.PeriodSplitDate
      s"""WITH lg AS (SELECT o_orderpriority priority,
         |      CASE WHEN l_shipdate < TIMESTAMP '$cut' THEN 1 ELSE 0 END early,
         |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END ret
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |g AS (SELECT priority, sum(early)::BIGINT n_a,
         |      sum(early * ret)::BIGINT x_a,
         |      sum(1 - early)::BIGINT n_b,
         |      sum((1 - early) * ret)::BIGINT x_b FROM lg GROUP BY 1)
         |SELECT priority, n_a, x_a, n_b, x_b,
         |  ((1000 * x_a) // n_a)::BIGINT AS rate_a_pm,
         |  ((1000 * x_b) // n_b)::BIGINT AS rate_b_pm,
         |  ((1000 * x_a) // n_a - (1000 * x_b) // n_b)::BIGINT AS diff_pm,
         |  ((1000 * (x_a::HUGEINT * n_b - x_b::HUGEINT * n_a)
         |         * (x_a::HUGEINT * n_b - x_b::HUGEINT * n_a) * (n_a + n_b))
         |    // (n_a::HUGEINT * n_b * (x_a + x_b)
         |         * (n_a + n_b - x_a - x_b)))::BIGINT AS z2_milli
         |FROM g ORDER BY priority""".stripMargin
    },
    // q316: part-keyed unit-cents moments in HUGEINT, top-50 by CV^2.
    "q316_price_dispersion" ->
      s"""WITH u AS (SELECT l_partkey partkey, l_suppkey,
         |      CAST(round(l_extendedprice * 100) AS BIGINT)
         |        // CAST(l_quantity AS BIGINT) unit_cents
         |      FROM lineitem),
         |g AS (SELECT partkey, count(*)::BIGINT n_quotes,
         |      count(DISTINCT l_suppkey)::BIGINT n_suppliers,
         |      sum(unit_cents)::BIGINT s,
         |      sum(unit_cents::HUGEINT * unit_cents) q,
         |      min(unit_cents)::BIGINT min_cents,
         |      max(unit_cents)::BIGINT max_cents
         |      FROM u GROUP BY 1)
         |SELECT partkey, n_quotes, n_suppliers, min_cents, max_cents,
         |  ((1000000 * (n_quotes::HUGEINT * q - s::HUGEINT * s))
         |    // (s::HUGEINT * s))::BIGINT AS cv2_ppm,
         |  ((1000 * (max_cents - min_cents)) // min_cents)::BIGINT
         |    AS spread_pm
         |FROM g ORDER BY cv2_ppm DESC, partkey
         |LIMIT ${Queries.PriceDispersionTopK}""".stripMargin,
    // q317: identical IEEE norm fold then ONE floor (the q269 double
    // discipline), per-label rollup, cross-multiplied corpus ratio.
    "q317_label_norm_bias" ->
      """WITH e AS (SELECT "label"::BIGINT AS label,
        |      floor(1000000 * list_dot_product(embedding::DOUBLE[],
        |        embedding::DOUBLE[]))::BIGINT n2
        |      FROM embeddings),
        |g AS (SELECT label, count(*)::BIGINT n_vecs, sum(n2)::BIGINT s2,
        |      min(n2)::BIGINT min_n2_ppm, max(n2)::BIGINT max_n2_ppm
        |      FROM e GROUP BY 1),
        |tt AS (SELECT sum(n_vecs)::BIGINT nt, sum(s2)::BIGINT st FROM g)
        |SELECT label, n_vecs, (s2 // n_vecs)::BIGINT AS mean_n2_ppm,
        |  min_n2_ppm, max_n2_ppm,
        |  ((1000 * s2::HUGEINT * nt) // (n_vecs::HUGEINT * st))::BIGINT
        |    AS bias_milli
        |FROM g, tt ORDER BY label""".stripMargin,
    // q318: the shared recursive cluster closure + row-local token
    // counts, k-keyed spectrum, one-row totals.
    "q318_dup_size_spectrum" ->
      s"""WITH $NearDupClusterCte,
         |ntk AS (SELECT doc_id, len(tk)::BIGINT n_tok FROM t),
         |jj AS (SELECT lbl.doc_id, lbl.cluster_id, cn.cluster_n, ntk.n_tok
         |      FROM lbl JOIN cn ON cn.cluster_id = lbl.cluster_id
         |      JOIN ntk ON ntk.doc_id = lbl.doc_id),
         |g AS (SELECT cluster_n AS k, count(DISTINCT cluster_id)::BIGINT
         |        n_clusters, count(*)::BIGINT n_docs,
         |      sum(n_tok)::BIGINT n_tokens FROM jj GROUP BY 1),
         |tt AS (SELECT sum(n_docs)::BIGINT td, sum(n_tokens)::BIGINT tt2
         |      FROM g)
         |SELECT k, n_clusters, n_docs,
         |  ((1000 * n_docs) // td)::BIGINT AS docs_share_pm,
         |  n_tokens, ((1000 * n_tokens) // tt2)::BIGINT AS tokens_share_pm
         |FROM g, tt ORDER BY k""".stripMargin,
    // q319: pooled doubled ranks over the (priority, lag) grid, per-
    // group micro floors, clamped numerator, tie-corrected H (mirrors
    // the Spark driver's BigInt fold floor for floor).
    "q319_kruskal_wallis" ->
      """WITH lg AS (SELECT o_orderpriority priority,
        |      date_diff('day', o_orderdate, l_shipdate)::BIGINT lag
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h AS (SELECT priority, lag, count(*)::BIGINT c FROM lg GROUP BY 1, 2),
        |tv AS (SELECT lag, sum(c)::BIGINT t FROM h GROUP BY 1),
        |dr AS (SELECT lag, (2 * coalesce(sum(t) OVER (ORDER BY lag
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        + t + 1)::BIGINT dr2 FROM tv),
        |sj AS (SELECT priority, sum(c)::BIGINT n, sum(c::HUGEINT * dr2) s2
        |      FROM h JOIN dr USING (lag) GROUP BY 1),
        |tot AS (SELECT sum(n)::BIGINT nn, count(*)::BIGINT k FROM sj),
        |tie AS (SELECT sum(t::HUGEINT * t * t - t) tt FROM tv),
        |cj AS (SELECT sum((1000000 * s2 * s2) // n) csum FROM sj),
        |gl AS (SELECT greatest(3 * csum
        |        - 3000000::HUGEINT * nn * (nn + 1) * (nn + 1), 0) num,
        |      nn, k FROM cj, tot),
        |hh AS (SELECT (num // (1000::HUGEINT * nn * (nn + 1)))::BIGINT h_milli,
        |      nn, k FROM gl),
        |hc AS (SELECT h_milli,
        |      (CASE WHEN (nn::HUGEINT * nn * nn - nn) > tt
        |        THEN (h_milli::HUGEINT * (nn::HUGEINT * nn * nn - nn))
        |          // ((nn::HUGEINT * nn * nn - nn) - tt) END)::BIGINT hc_milli,
        |      (k - 1)::BIGINT df FROM hh, tie)
        |SELECT priority, n, s2::BIGINT AS rank_sum2,
        |  ((500 * s2) // n)::BIGINT AS mean_rank_milli,
        |  h_milli, hc_milli, df
        |FROM sj, hc ORDER BY priority""".stripMargin,
    // q320: day grid, strict above/below-mean binarization (equals
    // drop), lag-window run count, exact permutation moments.
    "q320_runs_test" ->
      s"""WITH c AS (SELECT o_orderdate dy, count(*)::BIGINT c FROM orders
         |      GROUP BY 1),
         |t AS (SELECT count(*)::BIGINT nd, sum(c)::BIGINT s FROM c),
         |k AS (SELECT dy, (CASE WHEN nd * c > s THEN 1 ELSE 0 END)::BIGINT x
         |      FROM c, t WHERE nd * c <> s),
         |r AS (SELECT x, lag(x) OVER (ORDER BY dy) px FROM k),
         |rr AS (SELECT (CASE WHEN count(*) = 0 THEN 0 ELSE 1 +
         |        coalesce(sum(CASE WHEN px IS NOT NULL AND px <> x
         |          THEN 1 ELSE 0 END), 0) END)::BIGINT runs,
         |      coalesce(sum(x), 0)::BIGINT n1,
         |      coalesce(sum(1 - x), 0)::BIGINT n2,
         |      count(*)::BIGINT nk FROM r),
         |f AS (SELECT runs, n1, n2, nk,
         |      ((runs - 1)::HUGEINT * nk - 2::HUGEINT * n1 * n2) dev FROM rr)
         |SELECT t.nd AS n_days, n1 AS n_above, n2 AS n_below, nk AS n_kept,
         |  runs,
         |  (CASE WHEN nk > 0 THEN 1000 + (2000 * n1 * n2) // nk END)::BIGINT
         |    AS expected_runs_milli,
         |  (CASE WHEN 2::HUGEINT * n1 * n2 * (2::HUGEINT * n1 * n2 - nk) > 0
         |    THEN (1000 * dev * dev * (nk - 1))
         |      // (2::HUGEINT * n1 * n2 * (2::HUGEINT * n1 * n2 - nk))
         |    END)::BIGINT AS z2_milli,
         |  (CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 ELSE 0 END)::BIGINT
         |    AS trend
         |FROM f, t""".stripMargin,
    // q321: 2x5 priority table, ordinal scores from the priority
    // prefix, two-floor z^2 (vN = Var//N then milli division) —
    // mirrors the Spark driver's BigInt fold.
    "q321_trend_test" ->
      """WITH g AS (SELECT o_orderpriority priority,
        |      substr(o_orderpriority, 1, 1)::BIGINT w, count(*)::BIGINT n,
        |      sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT x
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      GROUP BY 1, 2),
        |t AS (SELECT sum(n)::HUGEINT nn, sum(x)::HUGEINT r,
        |      sum(w::HUGEINT * x) swx, sum(w::HUGEINT * n) swn,
        |      sum(w::HUGEINT * w * n) sw2n FROM g),
        |s AS (SELECT (nn * swx - r * swn) tc,
        |      (CASE WHEN nn > 0 THEN (r * (nn - r) * (nn * sw2n - swn * swn)) // nn
        |       ELSE 0 END) vn FROM t),
        |z AS (SELECT (CASE WHEN vn > 0 THEN (1000 * tc * tc) // vn END)::BIGINT
        |        z2_milli,
        |      (CASE WHEN tc > 0 THEN 1 WHEN tc < 0 THEN -1 ELSE 0 END)::BIGINT
        |        trend FROM s)
        |SELECT priority, w, n, x, ((1000 * x) // n)::BIGINT AS rate_pm,
        |  z2_milli, trend
        |FROM g, z ORDER BY priority""".stripMargin,
    // q322: per-variable doubled tie-averaged ranks over the day grid,
    // signed squared rho in ppm (q307 sign-square integerization).
    "q322_spearman_daily" ->
      """WITH c AS (SELECT o_orderdate dy, count(*)::BIGINT x,
        |      sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT y
        |      FROM orders GROUP BY 1),
        |xg AS (SELECT x v, count(*)::BIGINT t FROM c GROUP BY 1),
        |xr AS (SELECT v, (2 * coalesce(sum(t) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        + t + 1)::BIGINT dr FROM xg),
        |yg AS (SELECT y v, count(*)::BIGINT t FROM c GROUP BY 1),
        |yr AS (SELECT v, (2 * coalesce(sum(t) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        + t + 1)::BIGINT dr FROM yg),
        |j AS (SELECT xr.dr dx, yr.dr dy FROM c
        |      JOIN xr ON xr.v = c.x JOIN yr ON yr.v = c.y),
        |m AS (SELECT count(*)::HUGEINT n, sum(dx)::HUGEINT sx,
        |      sum(dy)::HUGEINT sy, sum(dx::HUGEINT * dy) sxy,
        |      sum(dx::HUGEINT * dx) sxx, sum(dy::HUGEINT * dy) syy FROM j),
        |f AS (SELECT n, (n * sxy - sx * sy) cov, (n * sxx - sx * sx) vx,
        |      (n * syy - sy * sy) vy FROM m)
        |SELECT n::BIGINT AS n_days,
        |  (CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END)::BIGINT
        |    AS direction,
        |  (CASE WHEN vx > 0 AND vy > 0 THEN
        |    (CASE WHEN cov >= 0 THEN (1000000 * cov * cov) // (vx * vy)
        |     ELSE -((1000000 * cov * cov) // (vx * vy)) END)
        |   END)::BIGINT AS rho2_ppm
        |FROM f""".stripMargin,
    // q323: micro-quantized components as exact integer-valued
    // doubles (the q307 trick), squared-L2 via norms + dot, per-query
    // extremes/sums, one floor per ratio.
    "q323_distance_contrast" -> {
      val stride = Similarity.PurityStride
      s"""WITH e AS (SELECT vec_id,
         |      list_transform(embedding::DOUBLE[], x -> floor(x * 1000000)) v
         |      FROM embeddings),
         |n AS (SELECT vec_id, v, list_dot_product(v, v)::BIGINT n2 FROM e),
         |p AS (SELECT a.vec_id q_id,
         |      (a.n2 + b.n2 - 2 * list_dot_product(a.v, b.v)::BIGINT)::BIGINT d2
         |      FROM n a, n b
         |      WHERE a.vec_id % $stride = 0 AND b.vec_id <> a.vec_id),
         |g AS (SELECT q_id, count(*)::BIGINT n_cand, min(d2)::BIGINT d2_min,
         |      max(d2)::BIGINT d2_max, sum(d2::HUGEINT) d2_sum FROM p GROUP BY 1)
         |SELECT q_id, n_cand, d2_min, d2_max,
         |  (CASE WHEN d2_sum > 0 THEN
         |    (1000 * (d2_max::HUGEINT - d2_min) * n_cand) // d2_sum
         |   END)::BIGINT AS contrast_milli,
         |  (CASE WHEN d2_min > 0 THEN
         |    (1000 * d2_sum) // (n_cand::HUGEINT * d2_min) END)::BIGINT
         |    AS meanmin_milli
         |FROM g ORDER BY q_id""".stripMargin
    },
    // q324: cents-exact supplier revenue, per-nation share moments in
    // HUGEINT (mirrors the Spark DECIMAL(38,0) arithmetic).
    "q324_supply_hhi" ->
      """WITH rev AS (SELECT s_nationkey, s_suppkey,
        |      sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT r
        |      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |      GROUP BY 1, 2),
        |g AS (SELECT s_nationkey, count(*)::BIGINT n_suppliers,
        |      sum(r)::BIGINT total_cents, sum(r::HUGEINT * r) rr,
        |      max(r)::BIGINT top_cents FROM rev GROUP BY 1),
        |h AS (SELECT s_nationkey, n_suppliers, total_cents,
        |      ((1000000 * rr) // (total_cents::HUGEINT * total_cents))::BIGINT
        |        hhi_ppm,
        |      ((1000000 * top_cents::HUGEINT) // total_cents)::BIGINT
        |        top_share_ppm FROM g)
        |SELECT n_name AS nation, n_suppliers, total_cents, hhi_ppm,
        |  top_share_ppm,
        |  (CASE WHEN hhi_ppm > 0 THEN 1000000000 // hhi_ppm END)::BIGINT
        |    AS effective_suppliers_milli
        |FROM h JOIN nation ON n_nationkey = s_nationkey
        |ORDER BY nation""".stripMargin,
    // q325: gaps-and-islands — lag gap, burst starts, running-sum
    // island ids, per-island sizes, segment histogram.
    "q325_order_bursts" -> {
      val g = Queries.BurstGapDays
      s"""WITH o2 AS (SELECT o_custkey, o_orderdate, o_orderkey,
         |      date_diff('day', lag(o_orderdate) OVER w, o_orderdate)::BIGINT gap
         |      FROM orders WINDOW w AS (PARTITION BY o_custkey
         |        ORDER BY o_orderdate, o_orderkey)),
         |b AS (SELECT o_custkey,
         |      sum(CASE WHEN gap IS NULL OR gap > $g THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |          ROWS UNBOUNDED PRECEDING)::BIGINT burst_id FROM o2),
         |l AS (SELECT o_custkey, burst_id, count(*)::BIGINT burst_len
         |      FROM b GROUP BY 1, 2)
         |SELECT c_mktsegment AS segment, burst_len, count(*)::BIGINT n_bursts,
         |  count(DISTINCT o_custkey)::BIGINT n_customers
         |FROM l JOIN customer ON c_custkey = o_custkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // q326: per-(source, term) document frequency 2x2, q304-style
    // single-floor chi^2, df caps, over-represented side only,
    // deterministic top-k per source.
    "q326_term_keyness" -> {
      val minDf = TextAnalysis.KeynessMinDf
      val topK = TextAnalysis.KeynessTopK
      s"""WITH dt AS (SELECT DISTINCT doc_id, source,
         |      unnest(regexp_split_to_array(text, ' ')) term FROM documents),
         |sdf AS (SELECT source, term, count(*)::BIGINT a FROM dt GROUP BY 1, 2),
         |gdf AS (SELECT term, sum(a)::BIGINT df FROM sdf GROUP BY 1),
         |sn AS (SELECT source, count(*)::BIGINT ns FROM documents GROUP BY 1),
         |t AS (SELECT count(*)::BIGINT nn FROM documents),
         |sc AS (SELECT source, term, a, df, ns, nn,
         |      (a::HUGEINT * ((nn - ns) - (df - a))
         |        - (ns - a)::HUGEINT * (df - a)) adbc
         |      FROM sdf JOIN gdf USING (term) JOIN sn USING (source), t
         |      WHERE df >= $minDf AND df * 2 <= nn),
         |k AS (SELECT source, term, a, df,
         |      ((1000 * nn::HUGEINT * adbc * adbc)
         |        // (ns::HUGEINT * (nn - ns) * df * (nn - df)))::BIGINT chi2_milli
         |      FROM sc WHERE adbc > 0),
         |r AS (SELECT source, term, a, df, chi2_milli,
         |      row_number() OVER (PARTITION BY source
         |        ORDER BY chi2_milli DESC, term)::BIGINT rank FROM k)
         |SELECT source, rank, term, a AS df_in, df, chi2_milli
         |FROM r WHERE rank <= $topK ORDER BY source, rank""".stripMargin
    },
    // q327: integerized LIX (words/sentence + 100*longwords/words),
    // terminator-run sentence count floored at 1, 5-point buckets.
    "q327_lix_readability" ->
      """WITH d AS (SELECT doc_id, source,
        |      greatest(len(regexp_split_to_array(text, ' ')), 1)::BIGINT w,
        |      len(list_filter(regexp_split_to_array(text, ' '),
        |        t -> length(t) > 6))::BIGINT l,
        |      greatest(len(regexp_extract_all(text, '[.!?]+', 0)), 1)::BIGINT s
        |      FROM documents),
        |x AS (SELECT source,
        |      ((1000 * w) // s + (100000 * l) // w)::BIGINT lix_milli, w
        |      FROM d)
        |SELECT source, (lix_milli // 5000)::BIGINT AS lix_bucket,
        |  count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS total_words,
        |  (sum(lix_milli) // count(*))::BIGINT AS mean_lix_milli
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q328: one 4-D categorical cube CTE, then per pair the 2-D
    // margins and the q304 per-cell-floored chi^2 (mirrors the Spark
    // driver's BigInt fold cell for cell) — blocks generated per pair.
    "q328_cramers_v_matrix" -> {
      val cats = Seq("priority", "returnflag", "segment", "linestatus")
      val pairs = for {
        i <- cats.indices; j <- cats.indices if i < j
      } yield (cats(i), cats(j))
      val blocks = pairs.map { case (a, b) =>
        s"""g_${a}_$b AS (SELECT $a va, $b vb, sum(c)::BIGINT o
           |      FROM cells GROUP BY 1, 2),
           |rm_${a}_$b AS (SELECT va, sum(o)::BIGINT rt FROM g_${a}_$b GROUP BY 1),
           |cm_${a}_$b AS (SELECT vb, sum(o)::BIGINT ct FROM g_${a}_$b GROUP BY 1),
           |tt_${a}_$b AS (SELECT sum(o)::BIGINT n,
           |      count(DISTINCT va)::BIGINT r, count(DISTINCT vb)::BIGINT c
           |      FROM g_${a}_$b),
           |x_${a}_$b AS (SELECT '$a' col_a, '$b' col_b, t.r, t.c, t.n,
           |      sum((1000 * (t.n::HUGEINT * o - rt::HUGEINT * ct)
           |            * (t.n::HUGEINT * o - rt::HUGEINT * ct))
           |        // (t.n::HUGEINT * rt * ct))::BIGINT chi2_milli
           |      FROM g_${a}_$b JOIN rm_${a}_$b USING (va)
           |        JOIN cm_${a}_$b USING (vb), tt_${a}_$b t
           |      GROUP BY 1, 2, 3, 4, 5)""".stripMargin
      }.mkString(",\n")
      val union = pairs.map { case (a, b) => s"SELECT * FROM x_${a}_$b" }
        .mkString("\n UNION ALL ")
      s"""WITH cells AS (SELECT o_orderpriority priority,
         |      l_returnflag returnflag, c_mktsegment segment,
         |      l_linestatus linestatus, count(*)::BIGINT c
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |      JOIN customer ON c_custkey = o_custkey
         |      GROUP BY 1, 2, 3, 4),
         |$blocks
         |SELECT col_a, col_b, r, c, n, chi2_milli,
         |  (CASE WHEN least(r, c) > 1 THEN
         |    (1000 * chi2_milli) // (n * (least(r, c) - 1)) END)::BIGINT
         |    AS v2_ppm
         |FROM ($union)
         |ORDER BY col_a, col_b""".stripMargin
    },
    // q329: generate_series window spine x observed types, left-join
    // counts, dead streaks via the win - row_number constancy trick.
    "q329_feed_liveness" -> {
      val win = Queries.LivenessWinNs
      s"""WITH ev AS (SELECT event_type, epoch_ns(ts) // $win AS win FROM events),
         |cnt AS (SELECT event_type, win, count(*)::BIGINT n FROM ev
         |      GROUP BY 1, 2),
         |rng AS (SELECT min(win) mn, max(win) mx FROM ev),
         |ty AS (SELECT DISTINCT event_type FROM ev),
         |spine AS (SELECT ty.event_type, uw.win FROM ty,
         |      (SELECT unnest(generate_series(mn, mx)) win FROM rng) uw),
         |grid AS (SELECT spine.event_type, spine.win,
         |      (CASE WHEN cnt.n IS NULL THEN 1 ELSE 0 END)::BIGINT dead
         |      FROM spine LEFT JOIN cnt ON cnt.event_type = spine.event_type
         |        AND cnt.win = spine.win),
         |dk AS (SELECT event_type, win,
         |      win - row_number() OVER (PARTITION BY event_type ORDER BY win)
         |        grp FROM grid WHERE dead = 1),
         |st AS (SELECT event_type, max(len)::BIGINT longest FROM
         |      (SELECT event_type, grp, count(*)::BIGINT len FROM dk
         |       GROUP BY 1, 2) GROUP BY 1),
         |ag AS (SELECT event_type, count(*)::BIGINT n_windows,
         |      sum(1 - dead)::BIGINT n_live, sum(dead)::BIGINT n_dead
         |      FROM grid GROUP BY 1)
         |SELECT ag.event_type, n_windows, n_live, n_dead,
         |  ((1000 * n_dead) // n_windows)::BIGINT AS dead_share_pm,
         |  coalesce(st.longest, 0)::BIGINT AS longest_dead_streak
         |FROM ag LEFT JOIN st ON st.event_type = ag.event_type
         |ORDER BY ag.event_type""".stripMargin
    },
    // q330: per-stratum 2x2 with micro-floored MH terms, pooled OR and
    // CMH chi^2 in HUGEINT (mirrors the Spark DECIMAL(38,0) floors).
    "q330_mantel_haenszel" -> {
      val cut = Queries.MhQtyCut
      s"""WITH s0 AS (SELECT o_orderpriority priority,
         |      (CASE WHEN l_quantity >= $cut THEN 1 ELSE 0 END)::BIGINT hi,
         |      (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT ret
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |s AS (SELECT priority, sum(hi * ret)::BIGINT a,
         |      sum(hi * (1 - ret))::BIGINT b,
         |      sum((1 - hi) * ret)::BIGINT cc,
         |      sum((1 - hi) * (1 - ret))::BIGINT dd FROM s0 GROUP BY 1),
         |m AS (SELECT *, (a + b + cc + dd)::BIGINT n,
         |      ((1000000 * a::HUGEINT * dd) // (a + b + cc + dd))::BIGINT num_micro,
         |      ((1000000 * b::HUGEINT * cc) // (a + b + cc + dd))::BIGINT den_micro,
         |      ((1000000 * (a + b)::HUGEINT * (a + cc)) // (a + b + cc + dd))::BIGINT e_micro,
         |      ((1000000 * (a + b)::HUGEINT * (cc + dd) * (a + cc) * (b + dd))
         |        // ((a + b + cc + dd)::HUGEINT * (a + b + cc + dd)
         |           * (a + b + cc + dd - 1)))::BIGINT v_micro
         |      FROM s),
         |g AS (SELECT sum(a)::HUGEINT sa, sum(num_micro)::HUGEINT sn,
         |      sum(den_micro)::HUGEINT sd, sum(e_micro)::HUGEINT se,
         |      sum(v_micro)::HUGEINT sv FROM m)
         |SELECT priority, a, b, cc AS c, dd AS d,
         |  (CASE WHEN b * cc > 0 THEN
         |    (1000 * a::HUGEINT * dd) // (b::HUGEINT * cc) END)::BIGINT
         |    AS or_stratum_milli,
         |  (CASE WHEN sd > 0 THEN (1000 * sn) // sd END)::BIGINT AS or_mh_milli,
         |  (CASE WHEN sv > 0 THEN
         |    (1000 * (1000000 * sa - se) * (1000000 * sa - se))
         |      // (1000000 * sv) END)::BIGINT AS cmh_milli,
         |  (CASE WHEN 1000000 * sa - se > 0 THEN 1
         |    WHEN 1000000 * sa - se < 0 THEN -1 ELSE 0 END)::BIGINT
         |    AS direction
         |FROM m, g ORDER BY priority""".stripMargin
    },
    // q331: four raw power sums, integer central-sum identities, the
    // ratio-first two-floor skew chain, kurtosis A4/A2^2 in milli.
    "q331_lag_moments" ->
      """WITH lg AS (SELECT o_orderpriority priority,
        |      date_diff('day', o_orderdate, l_shipdate)::BIGINT x
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |p AS (SELECT priority, count(*)::BIGINT n, sum(x)::BIGINT s,
        |      sum(x::HUGEINT * x) p2, sum(x::HUGEINT * x * x) p3,
        |      sum(x::HUGEINT * x * x * x) p4 FROM lg GROUP BY 1),
        |a AS (SELECT priority, n, s,
        |      (n * p2 - s::HUGEINT * s) a2,
        |      (n::HUGEINT * n * p3 - 3 * n::HUGEINT * s * p2
        |        + 2 * s::HUGEINT * s * s) a3,
        |      (n::HUGEINT * n * n * p4 - 4 * n::HUGEINT * n * s * p3
        |        + 6 * n::HUGEINT * s * s * p2
        |        - 3 * s::HUGEINT * s * s * s) a4 FROM p)
        |SELECT priority, n, ((1000 * s) // n)::BIGINT AS mean_milli,
        |  (CASE WHEN n > 0 THEN (1000 * a2) // (n::HUGEINT * n) END)::BIGINT
        |    AS var_milli,
        |  (CASE WHEN a2 > 0 THEN
        |    (CASE WHEN a3 < 0 THEN -1 ELSE 1 END) *
        |    ((((1000000 * abs(a3)) // a2) * ((1000000 * abs(a3)) // a2))
        |      // (1000000000 * a2)) END)::BIGINT AS skew2_milli,
        |  (CASE WHEN a2 > 0 THEN (1000 * (a4 // a2)) // a2 END)::BIGINT
        |    AS kurt_milli
        |FROM a ORDER BY priority""".stripMargin,
    // q332: per-customer 3-order pivot, |diff|-day histogram, doubled
    // signed ranks, tie-corrected z^2 (mirrors the driver BigInt fold).
    "q332_wilcoxon_repeat" ->
      """WITH o2 AS (SELECT o_custkey, o_orderdate,
        |      row_number() OVER w rn FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey)),
        |pv AS (SELECT o_custkey,
        |      max(CASE WHEN rn = 1 THEN o_orderdate END) d1,
        |      max(CASE WHEN rn = 2 THEN o_orderdate END) d2,
        |      max(CASE WHEN rn = 3 THEN o_orderdate END) d3
        |      FROM o2 WHERE rn <= 3 GROUP BY 1),
        |f AS (SELECT (date_diff('day', d2, d3)
        |      - date_diff('day', d1, d2))::BIGINT df FROM pv
        |      WHERE d3 IS NOT NULL),
        |z AS (SELECT count(*)::BIGINT n_zero FROM f WHERE df = 0),
        |h AS (SELECT abs(df)::BIGINT ad,
        |      sum(CASE WHEN df > 0 THEN 1 ELSE 0 END)::BIGINT pos,
        |      count(*)::BIGINT t FROM f WHERE df <> 0 GROUP BY 1),
        |r AS (SELECT ad, pos, t,
        |      (2 * coalesce(sum(t) OVER (ORDER BY ad
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        + t + 1)::BIGINT dr FROM h),
        |g AS (SELECT coalesce(sum(pos::HUGEINT * dr), 0) w2,
        |      coalesce(sum(pos), 0)::BIGINT n_pos,
        |      coalesce(sum(t - pos), 0)::BIGINT n_neg,
        |      coalesce(sum(t), 0)::BIGINT n,
        |      coalesce(sum(t::HUGEINT * t * t - t), 0) tie FROM r),
        |e AS (SELECT *, (w2 - (n::HUGEINT * (n + 1)) // 2) dev,
        |      (2::HUGEINT * n * (n + 1) * (2 * n + 1) - tie) den FROM g)
        |SELECT (n + n_zero)::BIGINT AS n_pairs, n_zero, n_pos, n_neg,
        |  w2::BIGINT AS w2,
        |  (CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 ELSE 0 END)::BIGINT
        |    AS decel,
        |  (CASE WHEN den > 0 AND n > 0 THEN
        |    (12000 * dev * dev) // den END)::BIGINT AS z2_milli,
        |  (CASE WHEN n > 0 THEN
        |    (1000 * (n_pos - n_neg)::HUGEINT * (n_pos - n_neg)) // n
        |   END)::BIGINT AS sign_z2_milli
        |FROM e, z""".stripMargin,
    // q333: complete-week spine with zero fill, in-block doubled ranks
    // (rank + peer count), tie-corrected Friedman Q in milli.
    "q333_friedman_dow" ->
      """WITH dd AS (SELECT date_diff('day', DATE '1970-01-01',
        |        o_orderdate)::BIGINT dy FROM orders),
        |cnt AS (SELECT dy // 7 wk, dy % 7 dow, count(*)::BIGINT n
        |      FROM dd GROUP BY 1, 2),
        |rng AS (SELECT min(wk) + 1 w0, max(wk) - 1 w1 FROM cnt),
        |spine AS (SELECT uw.wk, dw.dow FROM
        |      (SELECT unnest(generate_series(w0, w1)) wk FROM rng) uw,
        |      generate_series(0, 6) dw(dow)),
        |grid AS (SELECT spine.wk, spine.dow,
        |      coalesce(cnt.n, 0)::BIGINT n FROM spine
        |      LEFT JOIN cnt ON cnt.wk = spine.wk AND cnt.dow = spine.dow),
        |rk AS (SELECT wk, dow, n,
        |      rank() OVER (PARTITION BY wk ORDER BY n)::BIGINT r,
        |      count(*) OVER (PARTITION BY wk, n)::BIGINT t FROM grid),
        |dr AS (SELECT wk, dow, (2 * (r - 1) + t + 1)::BIGINT dr2 FROM rk),
        |pd AS (SELECT dow, count(*)::BIGINT b, sum(dr2)::BIGINT rank_sum2
        |      FROM dr GROUP BY 1),
        |nm AS (SELECT sum((rank_sum2::HUGEINT - b * 8)
        |        * (rank_sum2::HUGEINT - b * 8)) num, max(b)::BIGINT bb FROM pd),
        |dn AS (SELECT sum(dr2::HUGEINT * dr2) sdr2 FROM dr),
        |gl AS (SELECT num, (sdr2 - bb::HUGEINT * 7 * 64) den FROM nm, dn)
        |SELECT dow, b, rank_sum2,
        |  ((500 * rank_sum2) // b)::BIGINT AS mean_rank_milli,
        |  (CASE WHEN den > 0 THEN (1000 * 6 * num) // den END)::BIGINT
        |    AS q_milli,
        |  6::BIGINT AS df
        |FROM pd, gl ORDER BY dow""".stripMargin,
    // q334: q44's as-of oracle plus the TTL CASE columns.
    "q334_asof_tolerance" -> {
      val tol = operators.TemporalJoins.AsofToleranceUs
      s"""WITH c AS (SELECT event_id click_id, user_id, epoch_us(ts) cts
         |           FROM events WHERE event_type = 'click'),
         |v AS (SELECT event_id vid, user_id, epoch_us(ts) vts
         |      FROM events WHERE event_type = 'view'),
         |j AS (SELECT c.click_id, c.user_id, c.cts, v.vid, v.vts,
         |      row_number() OVER (PARTITION BY c.click_id
         |                         ORDER BY v.vts DESC NULLS LAST, v.vid DESC) rn
         |      FROM c LEFT JOIN v ON c.user_id = v.user_id AND v.vts <= c.cts)
         |SELECT click_id, user_id, cts AS click_ts,
         |  (CASE WHEN cts - vts <= $tol THEN vid END)::BIGINT AS view_id,
         |  (CASE WHEN cts - vts <= $tol THEN vts END)::BIGINT AS view_ts,
         |  (CASE WHEN cts - vts <= $tol THEN cts - vts END)::BIGINT
         |    AS fresh_gap_us,
         |  (CASE WHEN vts IS NULL THEN -1
         |    WHEN cts - vts <= $tol THEN 1 ELSE 0 END)::BIGINT AS matched
         |FROM j WHERE rn = 1
         |ORDER BY click_id""".stripMargin
    },
    // q335: per-type running-max lateness via arrival-order windows,
    // minute-bucket histogram, smallest bucket with 100*cum >= 99*n.
    "q335_ooo_lateness" ->
      """WITH e AS (SELECT event_type, event_id, epoch_ns(ts) tns FROM events),
        |l AS (SELECT event_type,
        |      greatest(coalesce(max(tns) OVER (PARTITION BY event_type
        |          ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - tns,
        |        0), 0)::BIGINT late_ns FROM e),
        |h AS (SELECT event_type, late_ns // 60000000000 late_min,
        |      count(*)::BIGINT c FROM l GROUP BY 1, 2),
        |cw AS (SELECT event_type, late_min, c,
        |      sum(c) OVER (PARTITION BY event_type ORDER BY late_min
        |        ROWS UNBOUNDED PRECEDING)::BIGINT cum,
        |      sum(c) OVER (PARTITION BY event_type)::BIGINT n FROM h)
        |SELECT event_type, max(n)::BIGINT AS n_events,
        |  sum(CASE WHEN late_min > 0 THEN c ELSE 0 END)::BIGINT AS n_late_1min,
        |  ((1000 * sum(CASE WHEN late_min > 0 THEN c ELSE 0 END))
        |    // max(n))::BIGINT AS late_share_pm,
        |  max(late_min)::BIGINT AS max_late_min,
        |  min(CASE WHEN 100 * cum >= 99 * n THEN late_min END)::BIGINT
        |    AS watermark_p99_min
        |FROM cw GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q336: the shared q172 chain, mutual pairs, RECURSIVE min-label
    // closure (the q49 reach pattern), per-label component rollup.
    "q336_mutual_nn_components" ->
      s"""WITH RECURSIVE $MutualNnCte,
         |mp AS (SELECT x.src a, y.src b FROM n1 x
         |      JOIN n1 y ON x.nbr = y.src AND y.nbr = x.src AND x.src < y.src),
         |vv AS (SELECT vec_id, "label" lbl FROM embeddings
         |      WHERE "label" IS NOT NULL),
         |edges AS (SELECT a s, b t2 FROM mp UNION ALL SELECT b, a FROM mp),
         |reach AS (SELECT vec_id AS src, vec_id AS dst FROM vv
         |          UNION
         |          SELECT r.src, e.t2 FROM reach r JOIN edges e ON r.dst = e.s),
         |lbl AS (SELECT src AS vec_id, min(dst) AS cluster_id FROM reach
         |      GROUP BY src),
         |pd AS (SELECT DISTINCT u AS vec_id FROM (SELECT a u FROM mp
         |      UNION ALL SELECT b FROM mp)),
         |jn AS (SELECT vv.vec_id, vv.lbl, lbl.cluster_id,
         |      (CASE WHEN pd.vec_id IS NULL THEN 0 ELSE 1 END)::BIGINT in_pair
         |      FROM vv JOIN lbl ON lbl.vec_id = vv.vec_id
         |      LEFT JOIN pd ON pd.vec_id = vv.vec_id),
         |cmp AS (SELECT lbl, count(*)::BIGINT n_components,
         |      max(csz)::BIGINT largest_comp FROM
         |      (SELECT lbl, cluster_id, count(*)::BIGINT csz FROM jn
         |       WHERE in_pair = 1 GROUP BY 1, 2) GROUP BY 1),
         |ag AS (SELECT lbl, count(*)::BIGINT n_vecs,
         |      sum(in_pair)::BIGINT n_paired FROM jn GROUP BY 1)
         |SELECT ag.lbl::BIGINT AS "label", n_vecs, n_paired,
         |  coalesce(cmp.n_components, 0)::BIGINT AS n_components,
         |  coalesce(cmp.largest_comp, 0)::BIGINT AS largest_comp,
         |  ((1000 * (n_vecs - n_paired)) // n_vecs)::BIGINT
         |    AS isolated_share_pm
         |FROM ag LEFT JOIN cmp ON cmp.lbl = ag.lbl
         |ORDER BY "label"""".stripMargin,
    // q337: structural-symbol density + keyword hits over the shared
    // token split; the integer decision rule replayed verbatim.
    "q337_code_detect" ->
      """WITH d AS (SELECT doc_id, source, n_chars,
        |      len(regexp_extract_all(text, '[{}();=<>]', 0))::BIGINT sym,
        |      len(list_filter(regexp_split_to_array(text, ' '),
        |        t -> t IN ('def', 'return', 'import', 'class', 'if', 'else', 'for', 'while', 'function', 'var', 'let', 'const', 'void', 'int', 'public', 'static')))::BIGINT kw_hits
        |      FROM documents),
        |x AS (SELECT source, n_chars, sym, kw_hits,
        |      ((1000 * sym) // greatest(n_chars, 1))::BIGINT sym_pm FROM d),
        |f AS (SELECT source, n_chars, sym,
        |      (CASE WHEN sym_pm >= 20 OR kw_hits >= 3 THEN 1 ELSE 0 END)::BIGINT
        |        is_code FROM x)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(is_code)::BIGINT AS n_code,
        |  ((1000 * sum(is_code)) // count(*))::BIGINT AS code_share_pm,
        |  ((1000 * sum(sym)) // greatest(sum(n_chars), 1))::BIGINT
        |    AS sym_density_pm
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    // q338: doc-level df over distinct terms, rare mass via tf join.
    "q338_rare_word_share" -> {
      val rmax = TextAnalysis.RareDfMax
      s"""WITH w AS (SELECT doc_id, source,
         |      unnest(regexp_split_to_array(text, ' ')) term FROM documents),
         |tf AS (SELECT doc_id, source, term, count(*)::BIGINT tf
         |      FROM w GROUP BY 1, 2, 3),
         |df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
         |pd AS (SELECT doc_id, source, sum(tf)::BIGINT n_tok,
         |      sum(CASE WHEN df <= $rmax THEN tf ELSE 0 END)::BIGINT n_rare
         |      FROM tf JOIN df USING (term) GROUP BY 1, 2),
         |px AS (SELECT source, n_tok, n_rare,
         |      ((1000 * n_rare) // n_tok)::BIGINT rare_pm FROM pd)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(n_tok)::BIGINT AS total_tokens,
         |  sum(n_rare)::BIGINT AS rare_tokens,
         |  ((1000 * sum(n_rare)) // sum(n_tok))::BIGINT AS rare_share_pm,
         |  ((1000 * sum(CASE WHEN rare_pm > 100 THEN 1 ELSE 0 END))
         |    // count(*))::BIGINT AS heavy_doc_share_pm
         |FROM px GROUP BY source ORDER BY source""".stripMargin
    },
    // q339: json_keys enumeration per type; per-type totals and the
    // bounded key grid.
    "q339_props_schema" ->
      """WITH k AS (SELECT event_type, unnest(json_keys(props)) kname
        |      FROM events),
        |g AS (SELECT event_type, kname, count(*)::BIGINT n_present
        |      FROM k GROUP BY 1, 2),
        |t AS (SELECT event_type, count(*)::BIGINT n_events FROM events
        |      GROUP BY 1),
        |x AS (SELECT g.event_type, g.kname, g.n_present, t.n_events,
        |      count(*) OVER (PARTITION BY g.event_type)::BIGINT n_keys
        |      FROM g JOIN t ON t.event_type = g.event_type)
        |SELECT event_type, kname AS key, n_present, n_events,
        |  ((1000 * n_present) // n_events)::BIGINT AS present_share_pm,
        |  n_keys
        |FROM x ORDER BY event_type, kname""".stripMargin,
    // q340: customer revenue rollup, within-segment ntile with the
    // deterministic (revenue DESC, custkey) tie-break, cumulative
    // share from the top.
    "q340_revenue_concentration" ->
      """WITH cu AS (SELECT o_custkey,
        |      sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT cents
        |      FROM orders GROUP BY 1),
        |j AS (SELECT c_mktsegment segment, cu.o_custkey, cents,
        |      ntile(10) OVER (PARTITION BY c_mktsegment
        |        ORDER BY cents DESC, cu.o_custkey)::BIGINT decile
        |      FROM cu JOIN customer ON c_custkey = cu.o_custkey),
        |g AS (SELECT segment, decile, count(*)::BIGINT n_customers,
        |      sum(cents)::BIGINT cents FROM j GROUP BY 1, 2),
        |w AS (SELECT segment, decile, n_customers, cents,
        |      sum(cents) OVER (PARTITION BY segment ORDER BY decile
        |        ROWS UNBOUNDED PRECEDING)::BIGINT cum_cents,
        |      sum(cents) OVER (PARTITION BY segment)::BIGINT total_cents
        |      FROM g)
        |SELECT segment, decile, n_customers, cents,
        |  ((1000 * cents) // total_cents)::BIGINT AS share_pm,
        |  ((1000 * cum_cents) // total_cents)::BIGINT AS cum_share_pm
        |FROM w ORDER BY segment, decile""".stripMargin,
    // q341: the 2x2 (group, period) grid, ppm rate floors, micro
    // variance floors, one-row DiD scalar back onto the cells.
    "q341_did_returns" -> {
      val split = Queries.PeriodSplitDate
      s"""WITH c AS (SELECT
         |      (CASE WHEN substr(o_orderpriority, 1, 1)::INT <= 2
         |        THEN 1 ELSE 0 END)::BIGINT grp,
         |      (CASE WHEN l_shipdate < TIMESTAMP '$split' THEN 0 ELSE 1
         |        END)::BIGINT period,
         |      (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT ret
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |g AS (SELECT grp, period, count(*)::BIGINT n, sum(ret)::BIGINT x
         |      FROM c GROUP BY 1, 2),
         |m AS (SELECT *, ((1000000 * x) // n)::BIGINT rate_ppm,
         |      ((1000000000000 * x::HUGEINT * (n - x))
         |        // (n::HUGEINT * n * n))::BIGINT var_micro FROM g),
         |t AS (SELECT
         |      sum(CASE WHEN grp = 1 AND period = 1 THEN rate_ppm ELSE 0 END)
         |        ::BIGINT p11,
         |      sum(CASE WHEN grp = 1 AND period = 0 THEN rate_ppm ELSE 0 END)
         |        ::BIGINT p10,
         |      sum(CASE WHEN grp = 0 AND period = 1 THEN rate_ppm ELSE 0 END)
         |        ::BIGINT p01,
         |      sum(CASE WHEN grp = 0 AND period = 0 THEN rate_ppm ELSE 0 END)
         |        ::BIGINT p00,
         |      sum(var_micro)::BIGINT var_sum, min(n)::BIGINT min_cell
         |      FROM m)
         |SELECT grp, period, n, x, rate_ppm,
         |  ((p11 - p10) - (p01 - p00))::BIGINT AS did_ppm,
         |  (CASE WHEN var_sum > 0 AND min_cell > 0 THEN
         |    (1000 * ((p11 - p10) - (p01 - p00))::HUGEINT
         |          * ((p11 - p10) - (p01 - p00)))
         |      // var_sum END)::BIGINT AS z2_milli
         |FROM m, t ORDER BY grp, period""".stripMargin
    },
    // q342: the 5-row priority grid self-joined on adjacency; the
    // ceiling cross-multiply with fixed z design constants.
    "q342_power_sample_size" -> {
      val z2 = (Queries.PowerZAlphaMilli + Queries.PowerZBetaMilli) *
        (Queries.PowerZAlphaMilli + Queries.PowerZBetaMilli)
      s"""WITH g AS (SELECT substr(o_orderpriority, 1, 1)::BIGINT w,
         |      count(*)::BIGINT n,
         |      sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT x
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |      GROUP BY 1),
         |p AS (SELECT w, n, ((1000000 * x) // n)::BIGINT p_ppm FROM g),
         |j AS (SELECT a.w w_lo, b.w w_hi, a.n n_lo, b.n n_hi,
         |      a.p_ppm p_lo_ppm, b.p_ppm p_hi_ppm,
         |      (a.p_ppm - b.p_ppm)::BIGINT delta_ppm,
         |      (CASE WHEN a.p_ppm <> b.p_ppm THEN
         |        ($z2::HUGEINT
         |          * (a.p_ppm::HUGEINT * (1000000 - a.p_ppm)
         |             + b.p_ppm::HUGEINT * (1000000 - b.p_ppm))
         |          + (a.p_ppm - b.p_ppm)::HUGEINT
         |            * (a.p_ppm - b.p_ppm) * 1000000 - 1)
         |        // ((a.p_ppm - b.p_ppm)::HUGEINT
         |             * (a.p_ppm - b.p_ppm) * 1000000) END)::BIGINT n_req
         |      FROM p a JOIN p b ON b.w = a.w + 1)
         |SELECT w_lo, w_hi, n_lo, n_hi, p_lo_ppm, p_hi_ppm, delta_ppm,
         |  n_req AS n_required,
         |  (CASE WHEN n_req IS NULL THEN NULL
         |    WHEN least(n_lo, n_hi) >= n_req THEN 1 ELSE 0 END)::BIGINT
         |    AS powered
         |FROM j ORDER BY w_lo""".stripMargin
    },
    // q343: delta-sweep backlog over the day spine, exact milli
    // lambda/W/L, the 10^6-scaled consistency ratio.
    "q343_little_law" ->
      """WITH li AS (SELECT
        |      date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT od,
        |      date_diff('day', DATE '1970-01-01', l_shipdate)::BIGINT sd
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |g AS (SELECT od, sd, count(*)::BIGINT c FROM li GROUP BY 1, 2),
        |rng AS (SELECT min(od) d0, greatest(max(od), max(sd)) d1 FROM g),
        |del AS (SELECT od AS dy, sum(c)::BIGINT dd FROM g GROUP BY 1
        |      UNION ALL SELECT sd, -sum(c) FROM g GROUP BY sd),
        |dd2 AS (SELECT dy, sum(dd)::BIGINT dd FROM del GROUP BY 1),
        |spine AS (SELECT uw.dy FROM
        |      (SELECT unnest(generate_series(d0, d1)) dy FROM rng) uw),
        |bl AS (SELECT spine.dy, coalesce(dd2.dd, 0)::BIGINT dd FROM spine
        |      LEFT JOIN dd2 ON dd2.dy = spine.dy),
        |run AS (SELECT dy,
        |      sum(dd) OVER (ORDER BY dy ROWS UNBOUNDED PRECEDING)::BIGINT
        |        backlog FROM bl),
        |tot AS (SELECT (SELECT d1 - d0 + 1 FROM rng)::BIGINT n_days,
        |      (SELECT sum(c) FROM g)::BIGINT n_items,
        |      (SELECT sum((sd - od)::HUGEINT * c) FROM g) w_sum,
        |      (SELECT sum(backlog::HUGEINT) FROM run) l_sum),
        |f AS (SELECT n_days, n_items,
        |      ((1000 * n_items) // n_days)::BIGINT lambda_milli,
        |      ((1000 * w_sum) // n_items)::BIGINT w_milli,
        |      ((1000 * l_sum) // n_days)::BIGINT l_milli FROM tot)
        |SELECT n_days, n_items, lambda_milli, w_milli, l_milli,
        |  (CASE WHEN lambda_milli > 0 AND w_milli > 0 THEN
        |    (1000000 * l_milli::HUGEINT)
        |      // (lambda_milli::HUGEINT * w_milli) END)::BIGINT
        |    AS consistency_milli
        |FROM f""".stripMargin,
    // q344: the shared q270 chain, then the discordant-count test.
    "q344_mcnemar_dedup" ->
      s"""WITH $MinhashCandCte,
         |$MethodAgreementCte,
         |cnt AS (SELECT
         |      sum(CASE WHEN cat = 'both' THEN 1 ELSE 0 END)::BIGINT n_both,
         |      sum(CASE WHEN cat = 'minhash_only' THEN 1 ELSE 0 END)::BIGINT
         |        n_mh_only,
         |      sum(CASE WHEN cat = 'simhash_only' THEN 1 ELSE 0 END)::BIGINT
         |        n_sh_only
         |      FROM pr)
         |SELECT n_both, n_mh_only, n_sh_only,
         |  (CASE WHEN n_mh_only + n_sh_only > 0 THEN
         |    (1000 * (n_mh_only - n_sh_only) * (n_mh_only - n_sh_only))
         |      // (n_mh_only + n_sh_only) END)::BIGINT AS z2_milli,
         |  (CASE WHEN n_sh_only > 0 THEN (1000 * n_mh_only) // n_sh_only
         |   END)::BIGINT AS odds_milli,
         |  (CASE WHEN n_mh_only > n_sh_only THEN 1
         |    WHEN n_mh_only < n_sh_only THEN -1 ELSE 0 END)::BIGINT
         |    AS direction
         |FROM cnt""".stripMargin,
    // q345: fixed function-word lexicon counts, bounded self-join on
    // the word key, one squared-cosine floor per source pair.
    "q345_style_cosine" -> {
      val lex = TextAnalysis.StyleLexicon.map(w => s"'$w'").mkString(", ")
      s"""WITH w AS (SELECT source,
         |      unnest(regexp_split_to_array(text, ' ')) tok FROM documents),
         |c AS (SELECT source, tok, count(*)::BIGINT c FROM w
         |      WHERE tok IN ($lex) GROUP BY 1, 2),
         |n AS (SELECT source, sum(c::HUGEINT * c) n2, sum(c)::BIGINT mass
         |      FROM c GROUP BY 1),
         |d AS (SELECT a.source source_a, b.source source_b,
         |      sum(a.c::HUGEINT * b.c) dot FROM c a
         |      JOIN c b ON b.tok = a.tok AND a.source < b.source
         |      GROUP BY 1, 2)
         |SELECT source_a, source_b, x.mass AS mass_a, y.mass AS mass_b,
         |  dot::BIGINT AS dot,
         |  (CASE WHEN x.n2 > 0 AND y.n2 > 0 THEN
         |    (1000000 * dot * dot) // (x.n2 * y.n2) END)::BIGINT AS cos2_ppm
         |FROM d JOIN n x ON x.source = d.source_a
         |JOIN n y ON y.source = d.source_b
         |ORDER BY source_a, source_b""".stripMargin
    },
    // q346: pooled (priority, lag) grid, in-partition cumulatives,
    // the single cross-multiplied CvM floor.
    "q346_cvm_lag" ->
      """WITH lg AS (SELECT o_orderpriority priority,
        |      date_diff('day', o_orderdate, l_shipdate)::BIGINT lag,
        |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END ret
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h AS (SELECT priority, lag, sum(ret)::BIGINT a,
        |      sum(1 - ret)::BIGINT b FROM lg GROUP BY 1, 2),
        |cw AS (SELECT priority, lag, a, b,
        |      sum(a) OVER w1 ::BIGINT c1, sum(b) OVER w1 ::BIGINT c2,
        |      sum(a) OVER w2 ::BIGINT n, sum(b) OVER w2 ::BIGINT m
        |      FROM h
        |      WINDOW w1 AS (PARTITION BY priority ORDER BY lag
        |        ROWS UNBOUNDED PRECEDING),
        |      w2 AS (PARTITION BY priority)),
        |g AS (SELECT priority, max(n)::BIGINT n_ret, max(m)::BIGINT n_kept,
        |      sum((a + b)::HUGEINT
        |          * (m::HUGEINT * c1 - n::HUGEINT * c2)
        |          * (m::HUGEINT * c1 - n::HUGEINT * c2)) tsum
        |      FROM cw GROUP BY 1)
        |SELECT priority, n_ret, n_kept,
        |  (CASE WHEN n_ret > 0 AND n_kept > 0 THEN
        |    (1000 * tsum) // ((n_ret + n_kept)::HUGEINT * (n_ret + n_kept)
        |      * n_ret * n_kept) END)::BIGINT AS cvm_milli
        |FROM g ORDER BY priority""".stripMargin,
  )
}
