package graft

import org.apache.spark.sql.functions._

/** Dev probe (`sbt "Test/runMain graft.ScaleProbe"`): materialize a
  * 10× copy of the sf0.1 `documents` table (id-shifted, texts salted
  * per replica so replicas don't trivially near-dup each other) and
  * time the heaviest dedup-family queries at 1× and 10× — empirical
  * backing for the near-linear scale claims in SURVEY §8. Writes under
  * java.io.tmpdir only; not part of the test suite. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    // optional family filter (dedup graph events ann text phrase) so a
    // run fits a bounded window; no args = all families
    val fams = if (args.isEmpty) Set("dedup","dedup8","graph","events","ann","text","phrase")
               else args.map(_.toLowerCase).toSet
    val spark = SparkSpec.session
    val d1 = "/root/testdata/sf0.1"
    val dir = s"${sys.props("java.io.tmpdir")}/graft-scale-10x"
    val d10 = s"$dir"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/documents.parquet/_SUCCESS"))) {
      val base = spark.read.parquet(s"$d1/documents.parquet")
      // shift by max+1, not count: collision-free even if doc_ids are
      // ever sparse or non-zero-based
      val n = base.agg(max(col("doc_id"))).head().getLong(0) + 1
      val reps = (0 until 10).map { r =>
        // perturb each replica's text with a replica-specific token so
        // cross-replica pairs don't all share every shingle; replica 0
        // keeps the original corpus byte-for-byte
        val salted = if (r == 0) base else base
          .withColumn("text", concat(col("text"), lit(s" replica$r marker$r")))
        salted.withColumn("doc_id", col("doc_id") + lit(r * n))
      }
      reps.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      println(s"[probe] built 10x corpus at $dir")
    }
    def time(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        d: String): Double = {
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[probe] $name%-28s $d%-40s rows=$n%-8d ${dt}%7.2f s")
      dt
    }
    val qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("q21_dedup_exact" -> (Dedup.exact _),
        "q23_dedup_minhash_lsh" -> (Dedup.minhashNearDup _),
        "q24_dedup_simhash" -> (Dedup.simhash _),
        "q46_dedup_jaccard_prefix" -> (Dedup.ngramJaccardPrefix _),
        "q49_dedup_clusters" -> (Dedup.nearDupClusters _),
        "q56_ingest_dedup" -> (Dedup.ingestDedup _),
        "q106_dedup_simhash64" -> (Dedup.simhash64 _),
        "q107_contam_spans" -> (Dedup.contamSpans _),
        "q109_verbatim_overlap" -> (Dedup.verbatimOverlap _),
        "q118_winnow_fingerprints" -> (TextAnalysis.winnowFingerprints _),
        "q119_winnow_overlap" -> (TextAnalysis.winnowOverlap _),
        "q121_cdc_chunk_dups" -> (Dedup.cdcChunkDups _),
        "q145_chunk_dedup" -> (Dedup.chunkDedup _),
        "q148_nb_lang_classify" -> (TextAnalysis.nbLangClassify _),
        "q149_doc_novelty" -> (Dedup.docNovelty _),
        "q150_cross_source_dup" -> (Dedup.crossSourceDup _),
        "q151_length_percentiles" -> (Curation.lengthPercentiles _),
        "q152_leak_safe_split" -> (Curation.leakSafeSplit _),
        "q155_ingest_chunk_dedup" -> (Dedup.ingestChunkDedup _),
        // round-6 curation additions — all histogram/heap-bounded plans
        "q173_rank_fusion" -> (Curation.rankFusion _),
        "q174_winsorize" -> (Curation.winsorizedStats _),
        "q176_priority_sample" -> (Curation.prioritySample _),
        "q177_tokenizer_fertility" -> (TextAnalysis.tokenizerFertility _),
        "q180_stratified_sample" -> (Curation.stratifiedPrioritySample _),
        // round-12: pairwise source TV rides the salted doc replicas
        "q348_source_tv" -> (TextAnalysis.sourceTvDistance _))
    // round-8 dedup-economics additions, probe-able without the full
    // dedup family re-run (q221 rides the q49 persisted label stage —
    // its first 10x pass pays that build; min-of-2 below measures warm)
    val q8: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("q221_dedup_yield" -> (Dedup.dedupYield _),
        "q222_lsh_bucket_balance" -> (Dedup.lshBucketBalance _),
        // round-8f: warm persisted labels + row-local langid scan
        "q238_cluster_lang_mix" -> (Dedup.clusterLangMix _),
        // round-8h: size-capped within-cluster pair geometry
        "q243_cluster_diff_stats" -> (Dedup.clusterDiffStats _))
    val ratios8 = (if (fams("dedup8")) q8 else Nil).map { case (name, fn) =>
      val t1 = math.min(time(name, fn, d1), time(name, fn, d1))
      val t10 = math.min(time(name, fn, d10), time(name, fn, d10))
      println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
      name -> (t10 / t1)
    }
    println(ratios8.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] dedup8 ratios: ", ", ", ""))
    val ratios = (if (fams("dedup")) qs else Nil).map { case (name, fn) =>
      val t1 = math.min(time(name, fn, d1), time(name, fn, d1))
      val t10 = time(name, fn, d10)
      println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
      name -> (t10 / t1)
    }
    println(ratios.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] ratios: ", ", ", ""))

    // Graph-family probe: 10 DISJOINT replicas of the trade/co-purchase
    // graph (every key space shifted per replica) → 10× nodes and arcs
    // with identical per-replica structure. That is the honest scale
    // model for these operators: a 10× crawl graph grows nodes and
    // edges, not the degree of each existing node (which is what naively
    // replicating orderkeys alone would measure after distinct()).
    val gdir = s"${sys.props("java.io.tmpdir")}/graft-scale-graph10x"
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$gdir/supplier.parquet/_SUCCESS"))) {
      val li = spark.read.parquet(s"$d1/lineitem.parquet")
      val os = spark.read.parquet(s"$d1/orders.parquet")
      val su = spark.read.parquet(s"$d1/supplier.parquet")
      val mo = os.agg(max(col("o_orderkey"))).head().getLong(0) + 1
      val mc = os.agg(max(col("o_custkey"))).head().getLong(0) + 1
      val ms = su.agg(max(col("s_suppkey"))).head().getLong(0) + 1
      val mp = li.agg(max(col("l_partkey"))).head().getLong(0) + 1
      def reps(base: org.apache.spark.sql.DataFrame)(
          shift: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame) =
        (0 until 10).map(r => shift(base, r)).reduce(_ unionByName _).repartition(32)
      reps(li) { (b, r) =>
        b.withColumn("l_orderkey", col("l_orderkey") + lit(r * mo))
          .withColumn("l_suppkey", col("l_suppkey") + lit(r * ms))
          .withColumn("l_partkey", col("l_partkey") + lit(r * mp))
      }.write.mode("overwrite").parquet(s"$gdir/lineitem.parquet")
      reps(os) { (b, r) =>
        b.withColumn("o_orderkey", col("o_orderkey") + lit(r * mo))
          .withColumn("o_custkey", col("o_custkey") + lit(r * mc))
      }.write.mode("overwrite").parquet(s"$gdir/orders.parquet")
      reps(su) { (b, r) =>
        b.withColumn("s_suppkey", col("s_suppkey") + lit(r * ms))
      }.write.mode("overwrite").parquet(s"$gdir/supplier.parquet")
      println(s"[probe] built 10x graph corpus at $gdir")
    }
    // part dimension for the round-8 price/procurement probes — its
    // p_partkey shift MUST mirror the lineitem l_partkey shift above
    // (same max+1 base from d1), so FK integrity holds per replica.
    // Separate existence check: graph corpora built by earlier rounds
    // cached the dir without it.
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$gdir/part.parquet/_SUCCESS"))) {
      val pt = spark.read.parquet(s"$d1/part.parquet")
      val mp = spark.read.parquet(s"$d1/lineitem.parquet")
        .agg(max(col("l_partkey"))).head().getLong(0) + 1
      (0 until 10).map(r =>
        pt.withColumn("p_partkey", col("p_partkey") + lit(r * mp)))
        .reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$gdir/part.parquet")
      println(s"[probe] built 10x part dimension at $gdir")
    }
    // SF-invariant dimensions (nation/region): copied verbatim — a 10×
    // fact corpus still has 25 nations, and the round-11 HHI probe
    // joins them. Separate existence check (older cached dirs lack
    // them). Supplier s_nationkey shifts don't touch nation keys.
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$gdir/nation.parquet/_SUCCESS"))) {
      spark.read.parquet(s"$d1/nation.parquet").coalesce(1)
        .write.mode("overwrite").parquet(s"$gdir/nation.parquet")
      spark.read.parquet(s"$d1/region.parquet").coalesce(1)
        .write.mode("overwrite").parquet(s"$gdir/region.parquet")
      println(s"[probe] copied nation/region dimensions to $gdir")
    }
    val gqs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("q126_pagerank" -> (Graph.pageRank _),
        // round-7 relational ops ride the same 10× lineitem/orders
        // replicas: basket pair mining, RFM quintiles, skew profile
        "q198_copurchase_pairs" -> (Queries.copurchasePairs _),
        "q199_rfm_scores" -> (Queries.rfmScores _),
        "q200_salt_plan" -> (Queries.saltPlan _),
        // round-8: the three-way basket join and the interval fan-out
        "q227_copurchase_triples" -> (Queries.copurchaseTriples _),
        "q228_backlog_snapshots" -> (Queries.backlogSnapshots _),
        // round-8d: the cohort triangle (replicas share the calendar,
        // so the triangle's CELL count stays fixed while cell
        // populations grow 10× — sub-linear wall is the expectation),
        // the matched-sample price index, and the per-part arg-min
        "q229_cohort_ltv" -> (Queries.cohortLtv _),
        "q230_price_index" -> (Queries.priceIndex _),
        "q231_cheapest_supplier" -> (Queries.cheapestSupplier _),
        // round-8e: the calendar-grid windows (cells fixed across
        // replicas) and the sort-based skyline over supplier aggs
        "q233_seasonal_index" -> (Queries.seasonalIndex _),
        "q234_supplier_skyline" -> (Queries.supplierSkyline _),
        "q235_theilsen_trend" -> (Queries.theilSenTrend _),
        // round-8f: the all-lines order-grain quantifier
        "q239_perfect_order" -> (Queries.perfectOrderRate _),
        // round-8h: grid-first MASE backtest (calendar-bounded joins)
        "q241_seasonal_backtest" -> (Queries.seasonalNaiveBacktest _),
        "q127_triangle_counts" -> (Graph.triangleCounts _),
        "q131_bfs_distances" -> (Graph.bfsDistances _),
        "q162_k_core" -> (Graph.kCore _),
        "q163_label_prop" -> (Graph.labelProp _),
        "q178_personalized_pagerank" -> (Graph.personalizedPageRank _),
        // round-12: customer-keyed gap windows over the orders replicas
        "q347_repeat_hazard" -> (Queries.repeatHazard _),
        // round-13: one supplier-dim broadcast join + 25-row driver fold
        "q349_fdr_returns" -> (Queries.fdrReturns _))
    val gratios = (if (fams("graph")) gqs else Nil).map { case (name, fn) =>
      val t1 = math.min(time(name, fn, d1), time(name, fn, d1))
      val t10 = time(name, fn, gdir)
      println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
      name -> (t10 / t1)
    }
    println(gratios.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] graph ratios: ", ", ", ""))

    // Events-family probe: 10 replicas with DISJOINT user/event id
    // spaces and the SAME time distribution — 10× users and volume in
    // every hour/day bucket, which is how an event stream actually
    // grows (more users, not a longer history). Sessionization, funnel,
    // retention and the anomaly monitor are all user- or bucket-keyed,
    // so near-linear wall ratios here mean the shuffles stay keyed and
    // nothing degenerates to a global sort.
    val edir = s"${sys.props("java.io.tmpdir")}/graft-scale-events10x"
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$edir/events.parquet/_SUCCESS"))) {
      val ev = spark.read.parquet(s"$d1/events.parquet")
      val mu = ev.agg(max(col("user_id"))).head().getLong(0) + 1
      val me = ev.agg(max(col("event_id"))).head().getLong(0) + 1
      (0 until 10).map { r =>
        ev.withColumn("user_id", col("user_id") + lit(r * mu))
          .withColumn("event_id", col("event_id") + lit(r * me))
      }.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$edir/events.parquet")
      println(s"[probe] built 10x events corpus at $edir")
    }
    val eqs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("q19_events_sessionize" -> (Queries.eventsSessionize _),
        "q124_event_funnel" -> (Queries.eventFunnel _),
        "q125_cohort_retention" -> (Queries.cohortRetention _),
        "q133_event_anomalies" -> (Queries.eventAnomalies _),
        "q144_pii_scrub" -> (Curation.piiScrub _),
        "q175_attribution" -> (Queries.attribution _),
        "q181_session_paths" -> (Queries.sessionPaths _),
        // round-7: user-keyed range-frame feature matrix and the exact
        // sliding-distinct rewrite — both user/day-keyed shuffles
        "q189_sliding_active_users" -> (Queries.slidingActiveUsers _),
        "q193_lag_features" -> (Queries.lagFeatures _),
        "q201_locf_features" -> (Queries.locfFeatures _),
        // round-8: calendar-bounded driver fold + percentile histograms
        "q223_kaplan_meier" -> (Queries.kaplanMeier _),
        "q224_funnel_latency" -> (Queries.funnelLatency _),
        // round-8f: capped C(24,3) session fan-out, alphabet³ output
        "q237_event_seq_triples" -> (Queries.eventSeqTriples _),
        // round-13: (user, wk)-keyed exposure grid + 16-row driver fold
        "q350_shapley_attribution" -> (Queries.shapleyAttribution _))
    val eratios = (if (fams("events")) eqs else Nil).map { case (name, fn) =>
      val t1 = math.min(time(name, fn, d1), time(name, fn, d1))
      val t10 = time(name, fn, edir)
      println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
      name -> (t10 / t1)
    }
    println(eratios.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] events ratios: ", ", ", ""))

    // ANN-family probe: 10 disjoint-id replicas of the embeddings table
    // (vectors unchanged — per-replica geometry is identical, which is
    // the honest model: the corpus grows, the 10-query probe batch does
    // not). IVF/PQ are persisted salted stages, so BOTH scales take
    // min-of-2: the first 10× run pays the one-time index build, the
    // second measures the zero-refit steady state a deployment lives in.
    val vdir = s"${sys.props("java.io.tmpdir")}/graft-scale-vec10x"
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$vdir/embeddings.parquet/_SUCCESS"))) {
      val em = spark.read.parquet(s"$d1/embeddings.parquet")
      val mv = em.agg(max(col("vec_id"))).head().getLong(0) + 1
      (0 until 10).map { r =>
        em.withColumn("vec_id", col("vec_id") + lit(r * mv))
      }.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$vdir/embeddings.parquet")
      println(s"[probe] built 10x embeddings corpus at $vdir")
    }
    // documents twin for q242's source join: only the vec-aligned doc
    // rows matter (vec_id = doc_id), replicated with the SAME +r·mv
    // shift so alignment holds per replica. Separate existence check —
    // vector corpora built by earlier rounds cached the dir without it.
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$vdir/documents.parquet/_SUCCESS"))) {
      val em = spark.read.parquet(s"$d1/embeddings.parquet").select(col("vec_id"))
      val mv = em.agg(max(col("vec_id"))).head().getLong(0) + 1
      val dj = spark.read.parquet(s"$d1/documents.parquet")
        .join(em, col("doc_id") === col("vec_id")).drop("vec_id")
      (0 until 10).map(r => dj.withColumn("doc_id", col("doc_id") + lit(r * mv)))
        .reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$vdir/documents.parquet")
      println(s"[probe] built 10x vec-aligned documents twin at $vdir")
    }
    val aqs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("q27_knn_lsh" -> (Similarity.lshTopK _),
        "q33_knn_ivf" -> ((s: org.apache.spark.sql.SparkSession, dir: String) => Similarity.ivfTopK(s, dir)),
        "q48_knn_int8" -> ((s: org.apache.spark.sql.SparkSession, dir: String) => Similarity.int8TopK(s, dir)),
        "q83_knn_pq" -> ((s: org.apache.spark.sql.SparkSession, dir: String) => Similarity.pqTopK(s, dir)),
        "q156_embed_decontam" -> (Dedup.embedDecontam _),
        "q160_rp_project" -> (Similarity.rpProject _),
        "q161_coreset_select" -> (Similarity.coresetSelect _),
        // mutual-NN probes the persisted-IVF cell self-join (q115's
        // cost contract) plus the reciprocity join; min-of-2 so the
        // warm zero-refit path is measured like the other index users
        "q172_mutual_nn" -> (Similarity.mutualNn _),
        // round-8e: all three top-k inputs re-run at 10×; the eval
        // arithmetic itself is query-bounded (≤ 5 rows per list)
        "q236_ndcg_eval" -> (Similarity.ndcgEval _),
        // round-8g: one GramAgg scan (32 KB buffer) + O(d²) driver
        // iteration — expect scan-bound, ≈ linear at worst
        "q240_principal_direction" -> (Similarity.principalDirection _),
        // round-8h: the grouped-kernel variant (|sources| buffers);
        // NOTE the 10× vector replica has no documents twin, so this
        // probes against the same corpus dir's documents — the join is
        // the constant part, the grouped scan is what scales
        "q242_source_anisotropy" -> (Similarity.sourceAnisotropy _))
    val aratios = (if (fams("ann")) aqs else Nil).map { case (name, fn) =>
      val t1 = math.min(time(name, fn, d1), time(name, fn, d1))
      val t10 = math.min(time(name, fn, vdir), time(name, fn, vdir))
      println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
      name -> (t10 / t1)
    }
    println(aratios.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] ann ratios: ", ", ", ""))

    // Text-family probe on the 10× doc corpus (built above): BM25's
    // inverted-index scoring and TF-IDF's vocabulary join are the two
    // text plans with corpus-wide joins worth an empirical datapoint
    // (q118 winnowing already probes in the dedup block).
    val tqs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("q62_tfidf_terms" -> (TextAnalysis.tfidfTerms _),
        "q114_bm25_search" -> (TextAnalysis.bm25Search _),
        // round-7 corpus-join additions: windowed co-occurrence and the
        // df-capped inverted-index pair join (its pair mass tracks
        // Σ C(df,2) — the df cap is what the 10× ratio evidences)
        "q191_skipgram_cooc" -> (TextAnalysis.skipgramCooc _),
        "q192_sparse_cosine" -> (TextAnalysis.sparseCosineTopK _),
        "q197_term_burstiness" -> (TextAnalysis.termBurstiness _),
        // round-8 corpus passes: the two-pass-cumulative packing pair,
        // the edge-fingerprint audit, the two-classifier join, and the
        // per-source windowed budget prefix
        "q213_context_packing" -> (TextAnalysis.contextPacking _),
        "q214_boilerplate_audit" -> (TextAnalysis.boilerplateAudit _),
        "q215_classifier_kappa" -> (TextAnalysis.classifierKappa _),
        "q216_chunk_manifest" -> (TextAnalysis.chunkManifest _),
        "q217_token_budget" -> (Curation.tokenBudgetCutoff _),
        // round-8b: map-only multimodal plans on the same doc corpus
        "q225_tile_grid_plan" -> (Multimodal.tileGridPlan _),
        "q226_audio_chunk_plan" -> (Multimodal.audioChunkPlan _),
        // round-8d: per-source Gini — one histogram agg + bounded
        // windows; the value GRID is shared across replicas so rows
        // past the first agg don't grow at all
        "q232_length_gini" -> (Curation.lengthGini _))
    val tratios = (if (fams("text")) tqs else Nil).map { case (name, fn) =>
      val t1 = math.min(time(name, fn, d1), time(name, fn, d1))
      // min-of-2 at 10× too: q191 rides the persisted postings stage,
      // and its first 10× pass pays that one-time build
      val t10 = math.min(time(name, fn, d10), time(name, fn, d10))
      println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
      name -> (t10 / t1)
    }
    println(tratios.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] text ratios: ", ", ", ""))

    // Postings/phrase-family probe on the 10× doc corpus: q187 is a
    // persisted-index operator like IVF/PQ, so the honest scale story
    // has TWO numbers — the one-time postings build (linear in corpus
    // tokens by design: one posexplode + one term-clustered shuffle
    // write) and the warm probe (∝ queried-term DF only, which grows
    // ~10× here because every replica repeats the corpus text — an
    // upper bound; real growth adds new terms too, diluting hot-term
    // DF). Timed separately: cold first run = build + probe, min of
    // two subsequent runs = the zero-refit steady state a search
    // deployment lives in.
    def phraseProbe(d: String): (Double, Double) = {
      val p = new org.apache.hadoop.fs.Path(PhraseIndex.dir(spark, d))
      val pfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (pfs.exists(p)) pfs.delete(p, true) // force a cold build
      val cold = time("q187_phrase_search(cold)", TextAnalysis.phraseSearch _, d)
      val warm = math.min(
        time("q187_phrase_search(warm)", TextAnalysis.phraseSearch _, d),
        time("q187_phrase_search(warm)", TextAnalysis.phraseSearch _, d))
      (cold, warm)
    }
    if (fams("phrase")) {
      val (c1, w1) = phraseProbe(d1)
      val (c10, w10) = phraseProbe(d10)
      println(f"[probe] q187 build+probe cold ratio = ${c10 / c1}%5.1f, warm probe ratio = ${w10 / w1}%5.1f (linear would be ~10)")
    }

    // Round-9 probes. (a) GROUPED-GRAM stress: q242's hash-agg state is
    // |sources| × d² longs, but the vec10x twin keeps the corpus's few
    // sources — it never stresses the per-group buffers or their
    // serialize/merge. This corpus remaps every doc to one of 64
    // synthetic sources (doc_id % 64) over the SAME 10× vectors, so a
    // map-side partial carries 64 × 32 KB of Gram state and every
    // partial merge moves all of it. (b) the new q244/q245/q246 at 10×.
    val g64 = s"${sys.props("java.io.tmpdir")}/graft-scale-gram64"
    if (fams("r9")) {
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$g64/embeddings.parquet/_SUCCESS")))
        spark.read.parquet(s"$vdir/embeddings.parquet")
          .write.mode("overwrite").parquet(s"$g64/embeddings.parquet")
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$g64/documents.parquet/_SUCCESS")))
        spark.read.parquet(s"$vdir/documents.parquet")
          .withColumn("source", concat(lit("s"),
            lpad((col("doc_id") % 64).cast("string"), 2, "0")))
          .write.mode("overwrite").parquet(s"$g64/documents.parquet")
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val t1g = min2("q242_source_anisotropy", Similarity.sourceAnisotropy _, d1)
      val t10g = min2("q242_source_anisotropy", Similarity.sourceAnisotropy _, vdir)
      val t64g = min2("q242_source_anisotropy", Similarity.sourceAnisotropy _, g64)
      println(f"[probe] q242 10x/1x = ${t10g / t1g}%5.1f, 10x+64src/1x = ${t64g / t1g}%5.1f (linear would be ~10; the 64src delta is the grouped-state cost)")
      val r9qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
        Seq("q244_spectral_spread" -> (Similarity.spectralSpread _),
          "q245_image_ahash" -> (Multimodal.imageAHashNearDup _),
          "q246_audio_energy" -> (Multimodal.audioEnergyNearDup _),
          // 9c/9d additions: CC over the (replica-dense) media pair
          // graph, the one-pass bit-balance agg, the chunked-langid
          // token explode, and the two-pair-plan agreement join
          "q250_media_dup_clusters" -> (Multimodal.mediaDupClusters _),
          "q253_code_switch" -> (TextAnalysis.codeSwitchSegments _),
          "q254_media_bit_balance" -> (Multimodal.mediaHashBitBalance _),
          "q255_modality_agreement" -> (Multimodal.dedupModalityAgreement _),
          // 9e additions: passage-exploded BM25, the bucket-blocked
          // margin miner (vec-aligned corpus → vdir), the 4-round
          // triangle peel, and the τ-fan-out curve
          "q256_max_passage" -> (TextAnalysis.maxPassage _),
          "q257_bitext_margin" -> (Similarity.bitextMargin _),
          "q258_ktruss" -> (Graph.kTruss _),
          "q259_media_threshold_curve" -> (Multimodal.mediaThresholdCurve _))
      val r9ratios = r9qs.map { case (name, fn) =>
        // embeddings-driven ops ride the vec-aligned twin, the graph
        // peel rides the disjoint-replica trade corpus, text/media
        // ops ride the perturbed-replica documents corpus
        val dd =
          if (name.startsWith("q244") || name.startsWith("q257")) vdir
          else if (name.startsWith("q258")) gdir
          else d10
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(r9ratios.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r9 ratios: ", ", ", ""))
    }
    // 9f additions: token-frequency spectrum and conformal calibration
    // ride the perturbed-replica documents corpus; the IVF curve rides
    // the vec-aligned twin (per-replica index build amortized by min2)
    if (fams("r9f")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val r9fqs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, String)] =
        Seq(("q260_zipf_spectrum", TextAnalysis.zipfSpectrum _, d10),
          ("q261_conformal_quality", Curation.conformalQuality _, d10),
          ("q262_ivf_probe_curve", Similarity.ivfProbeCurve _, vdir))
      val rr = r9fqs.map { case (name, fn, dd) =>
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(rr.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r9f ratios: ", ", ", ""))
    }
    // 9g additions: the 3-size ablation and frame hashing ride the
    // documents replicas; the hybrid rides the vec-aligned twin (its
    // lexical side explodes only the 10 query docs' shingles)
    if (fams("r9g")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val r9gqs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, String)] =
        Seq(("q263_passage_ablation", TextAnalysis.passageSizeAblation _, d10),
          ("q264_frame_containment", Multimodal.frameSeqContainment _, d10),
          ("q265_hybrid_mlt", Similarity.hybridMoreLikeThis _, vdir))
      val rr = r9gqs.map { case (name, fn, dd) =>
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(rr.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r9g ratios: ", ", ", ""))
    }
    // 9h addition: one candidate+verify pass + 4 threshold CC runs on
    // the (replica-dense, so pair-inflated) documents corpus
    if (fams("r9h")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val t1 = min2("q266_dedup_threshold_curve", Dedup.dedupThresholdCurve _, d1)
      val t10 = min2("q266_dedup_threshold_curve", Dedup.dedupThresholdCurve _, d10)
      println(f"[probe] q266_dedup_threshold_curve 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
      println(f"[probe] r9h ratios: q266_dedup_threshold_curve=${t10 / t1}%.1f")
    }
    // round-10 additions: text/doc-scan ops ride the perturbed-replica
    // documents corpus, vector ops the vec-aligned twin, orders/brand
    // analytics the disjoint-replica trade corpus (10× customers,
    // orders, and parts — the honest model for quintiles/calendars:
    // more keys, not denser keys)
    if (fams("r10")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val r10qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, String)] =
        Seq(("q267_rule_audit", TextAnalysis.ruleAudit _, d10),
          ("q268_rfm_migration", Queries.rfmMigration _, gdir),
          ("q269_quant_fidelity", Similarity.quantFidelity _, vdir),
          ("q270_text_method_agreement", Dedup.textMethodAgreement _, d10),
          ("q271_interleave_audit", Curation.interleaveAudit _, d10),
          ("q272_mad_anomaly_calendar", Queries.madAnomalyCalendar _, gdir),
          ("q273_kendall_comovement", Queries.kendallComovement _, gdir),
          ("q274_source_projection_energy",
            Similarity.sourceProjectionEnergy _, vdir),
          ("q275_source_dim_drift", Similarity.sourceDimDrift _, vdir),
          ("q276_rich_club", Graph.richClub _, gdir))
      val rr = r10qs.map { case (name, fn, dd) =>
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(rr.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r10 ratios: ", ", ", ""))
    }
    // r10 late addition, separable so re-probing it doesn't pay the
    // q270 replica-pair cost again
    if (fams("r10d")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val t1 = min2("q277_association_rules", Queries.associationRules _, d1)
      val t10 = min2("q277_association_rules", Queries.associationRules _, gdir)
      println(f"[probe] q277_association_rules 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
      println(f"[probe] r10d ratios: q277_association_rules=${t10 / t1}%.1f")
    }
    // Round-10 batches d/e (q278-q285), each on its family's replica
    // corpus. q278 min-of-2 at 10× (first pass pays the one-time q49
    // cluster-stage build). q279 probes the PRODUCTION deployment
    // model: the stride scales with the corpus so the query sample
    // stays pinned (the ANN "10-query batch does not grow" contract);
    // the scan side still grows 10×, so ~linear is the expectation.
    if (fams("r10e")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val r10e: Seq[(String,
          (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          String)] = Seq(
        ("q278_dedup_effective_size", Dedup.dedupEffectiveSize _, d10),
        ("q281_audio_loudness_audit", Multimodal.audioLoudnessAudit _, d10),
        ("q283_ngram_diversity", TextAnalysis.ngramDiversity _, d10),
        ("q279_knn_source_purity",
          (s: org.apache.spark.sql.SparkSession, dir: String) =>
            Similarity.knnSourcePurityAt(s, dir,
              if (dir == d1) Similarity.PurityStride
              else Similarity.PurityStride * 10L), vdir),
        ("q282_repr_alignment", Similarity.reprAlignment _, vdir),
        ("q280_dyadic_momentum", Queries.dyadicMomentum _, gdir),
        ("q285_brand_modularity", Graph.brandModularity _, gdir),
        ("q284_hourly_autocorr", Queries.hourlyAutocorr _, edir))
      val rr = r10e.map { case (name, fn, dd) =>
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(rr.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r10e ratios: ", ", ", ""))
    }
    // Round-10 batches f/g/h (q286-q294) on the same replica corpora.
    // The orders twin for q294 mirrors the lineitem orderkey shift.
    if (fams("r10f")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val r10f: Seq[(String,
          (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          String)] = Seq(
        ("q286_price_elasticity", Queries.priceElasticity _, gdir),
        ("q288_abc_classes", Queries.abcClasses _, gdir),
        ("q289_wilson_ranking", Queries.wilsonRanking _, gdir),
        ("q294_priority_sla", Queries.prioritySlaAudit _, gdir),
        ("q287_effective_mixture", Curation.effectiveTemperatureMix _, d10),
        ("q290_shingle_ablation", Dedup.shingleSizeAblation _, d10),
        ("q291_scene_cuts", Multimodal.sceneCuts _, d10),
        ("q293_quality_dup_association", Queries.qualityDupAssociation _, d10),
        ("q292_transition_impurity", Queries.transitionImpurity _, edir))
      val rr = r10f.map { case (name, fn, dd) =>
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(rr.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r10f ratios: ", ", ", ""))
    }
    // Round-10 batches g-k (q295-q303). The customer twin mirrors the
    // orders o_custkey shift (same max+1 base from d1) so the
    // segment join holds per replica; separate existence check —
    // graph corpora built by earlier rounds cached the dir without it.
    if (fams("r10g")) {
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$gdir/customer.parquet/_SUCCESS"))) {
        val cu = spark.read.parquet(s"$d1/customer.parquet")
        val mc = spark.read.parquet(s"$d1/orders.parquet")
          .agg(max(col("o_custkey"))).head().getLong(0) + 1
        (0 until 10).map(r =>
            cu.withColumn("c_custkey", col("c_custkey") + lit(r * mc)))
          .reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(s"$gdir/customer.parquet")
        println(s"[probe] built 10x customer twin at $gdir")
      }
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val r10g: Seq[(String,
          (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          String)] = Seq(
        ("q295_dim_label_informativeness",
          Similarity.dimLabelInformativeness _, vdir),
        ("q296_cluster_label_rand", Similarity.clusterLabelRand _, vdir),
        ("q297_bootstrap_ci", Queries.bootstrapCi _, gdir),
        ("q298_repeat_latency", Queries.repeatLatency _, gdir),
        ("q300_vocab_saturation", TextAnalysis.vocabSaturation _, d10),
        ("q301_cusum_changepoint", Queries.cusumChangepoint _, edir),
        ("q302_ranksum_shiplag", Queries.rankSumShipLag _, gdir),
        ("q303_hits_bipartite", Graph.hitsBipartite _, gdir))
      val rr = r10g.map { case (name, fn, dd) =>
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(rr.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r10g ratios: ", ", ", ""))
    }
    // Round-10 batches l/m (q304-q308); the customer twin from r10g is
    // required for q306/q308 (run r10g first on a fresh corpus dir).
    if (fams("r10h")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val r10h: Seq[(String,
          (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          String)] = Seq(
        ("q304_chisq_independence", Queries.chisqIndependence _, gdir),
        ("q305_event_overdispersion", Queries.eventOverdispersion _, edir),
        ("q306_median_bootstrap", Queries.bootstrapMedianCi _, gdir),
        ("q307_embedding_label_auc", Similarity.embeddingLabelAuc _, vdir),
        ("q308_logrank_repeat", Queries.logRankRepeat _, gdir))
      val rr = r10h.map { case (name, fn, dd) =>
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(rr.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r10h ratios: ", ", ", ""))
    }
    // Round-10 batch n (q309-q310) on the perturbed-replica documents
    // corpus; q309's first 10x pass pays the one-time q49 label-stage
    // build (min-of-2 measures the warm steady state, the q221 model).
    if (fams("r10i")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val r10i: Seq[(String,
          (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          String)] = Seq(
        ("q309_bm25_dedup", TextAnalysis.bm25DedupCorrected _, d10),
        ("q310_l_diversity", Curation.lDiversityAudit _, d10))
      val rr = r10i.map { case (name, fn, dd) =>
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(rr.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r10i ratios: ", ", ", ""))
    }
    // Round-10 batch o: q311 on the disjoint-replica trade graph
    // (10x seeds AND 10x per-seed reach stays per-replica-local —
    // the honest multi-source-BFS scale model), q312 on the events
    // replica corpus.
    if (fams("r10j")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val r10j: Seq[(String,
          (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          String)] = Seq(
        ("q311_harmonic_closeness", Graph.harmonicCloseness _, gdir),
        ("q312_markov_backtest", Queries.markovBacktest _, edir),
        ("q313_importance_ess", Curation.importanceEss _, d10),
        ("q314_label_confusability", Similarity.labelConfusability _, vdir),
        ("q315_return_rate_drift", Queries.returnRateDrift _, gdir),
        ("q316_price_dispersion", Queries.priceDispersion _, gdir),
        ("q317_label_norm_bias", Similarity.labelNormBias _, vdir),
        ("q318_dup_size_spectrum", Dedup.dupSizeSpectrum _, d10))
      val rr = r10j.map { case (name, fn, dd) =>
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(rr.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r10j ratios: ", ", ", ""))
    }
    // Round-11 batch a/b: rank-test battery + HHI/bursts on the
    // replicated trade tables; q323 on the replicated vectors (sample
    // AND corpus both grow 10x — the honest broadcast-scan model);
    // q326/q327 on the perturbed-replica documents corpus.
    if (fams("r11a")) {
      def min2(name: String,
          fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          d: String): Double = math.min(time(name, fn, d), time(name, fn, d))
      val r11a: Seq[(String,
          (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
          String)] = Seq(
        ("q319_kruskal_wallis", Queries.kruskalWallisLag _, gdir),
        ("q320_runs_test", Queries.runsTestDaily _, gdir),
        ("q321_trend_test", Queries.trendTestReturns _, gdir),
        ("q322_spearman_daily", Queries.spearmanDaily _, gdir),
        ("q323_distance_contrast", Similarity.distanceContrast _, vdir),
        ("q324_supply_hhi", Queries.supplyHhi _, gdir),
        ("q325_order_bursts", Queries.orderBursts _, gdir),
        ("q326_term_keyness", TextAnalysis.termKeyness _, d10),
        ("q327_lix_readability", TextAnalysis.lixReadability _, d10),
        ("q328_cramers_v_matrix", Queries.cramersVMatrix _, gdir),
        ("q329_feed_liveness", Queries.feedLiveness _, edir),
        ("q330_mantel_haenszel", Queries.mantelHaenszel _, gdir),
        ("q331_lag_moments", Queries.lagMoments _, gdir),
        ("q332_wilcoxon_repeat", Queries.wilcoxonRepeat _, gdir),
        ("q333_friedman_dow", Queries.friedmanDow _, gdir),
        ("q334_asof_tolerance",
          graft.operators.TemporalJoins.asofJoinTolerance _, edir),
        ("q335_ooo_lateness", Queries.oooLateness _, edir),
        ("q336_mutual_nn_components", Similarity.mutualNnComponents _, vdir),
        ("q337_code_detect", TextAnalysis.codeDetect _, d10),
        ("q338_rare_word_share", TextAnalysis.rareWordShare _, d10),
        ("q339_props_schema", Queries.propsSchema _, edir),
        ("q340_revenue_concentration", Queries.revenueConcentration _, gdir),
        ("q341_did_returns", Queries.didReturns _, gdir),
        ("q342_power_sample_size", Queries.powerSampleSize _, gdir),
        ("q343_little_law", Queries.littleLawAudit _, gdir),
        ("q344_mcnemar_dedup", Dedup.mcnemarDedup _, d10),
        ("q345_style_cosine", TextAnalysis.styleCosine _, d10),
        ("q346_cvm_lag", Queries.cvmLag _, gdir))
      val rr = r11a.map { case (name, fn, dd) =>
        val t1 = min2(name, fn, d1)
        val t10 = min2(name, fn, dd)
        println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
        name -> (t10 / t1)
      }
      println(rr.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] r11a ratios: ", ", ", ""))
    }
    spark.stop()
  }
}
