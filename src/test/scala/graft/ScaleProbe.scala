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
        "q180_stratified_sample" -> (Curation.stratifiedPrioritySample _))
    val ratios = qs.map { case (name, fn) =>
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
    val gqs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("q126_pagerank" -> (Graph.pageRank _),
        "q127_triangle_counts" -> (Graph.triangleCounts _),
        "q131_bfs_distances" -> (Graph.bfsDistances _),
        "q162_k_core" -> (Graph.kCore _),
        "q163_label_prop" -> (Graph.labelProp _),
        "q178_personalized_pagerank" -> (Graph.personalizedPageRank _))
    val gratios = gqs.map { case (name, fn) =>
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
        "q181_session_paths" -> (Queries.sessionPaths _))
    val eratios = eqs.map { case (name, fn) =>
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
        "q172_mutual_nn" -> (Similarity.mutualNn _))
    val aratios = aqs.map { case (name, fn) =>
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
        "q114_bm25_search" -> (TextAnalysis.bm25Search _))
    val tratios = tqs.map { case (name, fn) =>
      val t1 = math.min(time(name, fn, d1), time(name, fn, d1))
      val t10 = time(name, fn, d10)
      println(f"[probe] $name%-28s 10x/1x wall ratio = ${t10 / t1}%5.1f (linear would be ~10)")
      name -> (t10 / t1)
    }
    println(tratios.map { case (k, v) => f"$k=${v}%.1f" }.mkString("[probe] text ratios: ", ", ", ""))
    spark.stop()
  }
}
