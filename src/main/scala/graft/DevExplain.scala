package graft

import org.apache.spark.sql.SparkSession

/** Scratch: dump formatted plans for plan-quality review (not part of
  * the driver contract).
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // exec=<query>: RUN the query and dump the post-execution adaptive
    // plan — runtime exchange/stage reuse (AQE) is invisible in the
    // static formatted plan, so multi-branch reuse must be audited here.
    args.collectFirst { case s if s.startsWith("exec=") => s.substring(5) }
      .foreach { q =>
        val df = SparkEntry.queries(q)(spark, dir)
        df.collect()
        println(s"===== $q (executed) =====")
        println(df.queryExecution.executedPlan.toString)
        spark.stop()
        return
      }
    // audit: execute EVERY query and report how many times each parquet
    // file is ACTUALLY scanned in the final adaptive plan. A tree walk,
    // not a string grep: the printed plan embeds provenance FileScans
    // inside InMemoryRelation/Initial-Plan sections that never execute.
    // Recurses into query stages; stops at InMemoryTableScan (reading
    // cache, counted separately) and ReusedExchange (counted, no
    // re-scan). >1 live scan of the same file means a multi-branch
    // subtree failed exchange reuse (the isnotnull-pushdown
    // canonicalization break) and re-executes upstream work — the
    // round-2 7x pathology in query form.
    if (args.exists(_.startsWith("audit"))) {
      val subset = args.collectFirst {
        case s if s.startsWith("audit=") =>
          s.substring(6).split(",").map(_.trim).toSet
      }
      SparkEntry.queries.keys.toSeq.sorted
        .filter(q => subset.forall(_.contains(q))).foreach { q =>
        try {
          val df = SparkEntry.queries(q)(spark, dir)
          df.collect()
          val a = PlanAudit.audit(df.queryExecution.executedPlan)
          val byFile = a.scans.groupBy(identity).view.mapValues(_.size).toMap
            .toSeq.sortBy(-_._2).map { case (p, n) => s"${p}x$n" }
          println(s"[audit] $q scans=${byFile.mkString(",")} " +
            s"cachereads=${a.cacheReads} reused=${a.reused}")
        } catch {
          case e: Throwable => println(s"[audit] $q ERROR ${e.getMessage}")
        }
        // drop persisted frames between queries: an identical cached
        // subtree from an earlier query (e.g. q41's Bm25 perDoc inside
        // t24) would otherwise satisfy later scans from cache and hide
        // the very re-scan regressions this audit exists to catch
        finally spark.catalog.clearCache()
      }
      spark.stop()
      return
    }
    Seq("q1_agg", "q3_join_agg", "q8_pagination", "t6_ngram_neardup",
      "e1_ann_topk", "kg_sections", "t10_dedup_canon",
      "kg_media_resized", "kg_media_frames",
      "q16_asof", "q17_rollup", "q18_range_join", "q19_interval_join",
      "q20_cube", "q21_median", "q22_pivot", "t11_splits", "t12_pack",
      "t13_chunk", "q23_skew_join", "t14_stratified",
      "t15_group_sample", "q24_grouping_sets", "q25_event_windows",
      "t16_repetition", "t17_decontam", "t18_token_budget",
      "t19_vocab", "q26_funnel", "q27_json", "q28_gap_sessions",
      "q29_path2", "q30_pagerank", "q31_cohort", "q32_histogram",
      "q33_corr", "t20_zscore", "q34_bloom_join",
      "q35_triangles", "kg_entity_rank", "q36_window_suite",
      "q37_collect", "q38_star_join", "q41_bm25", "q42_setops",
      "q43_range_frame", "q44_subquery", "q45_unpivot", "q40_date_spine",
      "q46_fill_forward", "q47_full_outer", "t21_regex_mine",
      "t22_para_dedup", "t23_redact", "q48_sliding_dau",
      "t24_rrf", "t25_bigram_lm", "t26_pmi", "t27_tfidf",
      "t28_entropy", "t29_kl", "q49_markov", "q50_paths",
      "e5_kmeans_step", "q51_rfm", "q52_benford", "t30_dsir").foreach { q =>
      println(s"\n===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
