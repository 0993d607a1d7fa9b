package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 that is implemented has a `queries`
  * entry; SQL-expressible ones also have a DuckDB oracle in `oracleSql`
  * (column names aliased identically on both sides — the driver's compare
  * sorts columns by name before hashing).
  *
  * Float determinism policy: sums/averages of doubles are order-dependent
  * under shuffles, so every aggregated money/measure column is summed as
  * DECIMAL (exact, associative) and divisions happen on the exact decimal
  * result. Per-row double arithmetic (deterministic IEEE) stays double.
  */
object SparkEntry {
  import Tables._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end KB-population: interleaved spans -> mentions -> linking ->
    * clustering -> triples (north rule headline).
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.triples(spark, "/root/testdata/sf0.001")

  // Decimal cast used for exact, order-independent aggregation.
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(30,6)")

  /** Cross-query memo for shared dedup stages (same discipline as
    * Pipeline.runCached): several driver queries expose different
    * policies over the SAME intermediate — t6/t7/t8/t32/t35 the shingle
    * frame, t7/t10/t39 the banded minhash pair graph, t10/t39 its
    * connected-component canonicalization — and within one Verify/Bench
    * session each re-derived the chain from the corpus scan (a .cache()
    * does not survive Verify's per-query clearCache; a localCheckpoint
    * does). Frames are materialized via Ckpt (serialized blocks, lineage
    * truncated), keyed by (session, dir, stage); entries of stopped
    * sessions are evicted on access.
    */
  private val stageMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  private def memoStage(s: SparkSession, dir: String, stage: String)(
      f: => DataFrame): DataFrame = {
    stageMemo.keySet.filter(_._1.sparkContext.isStopped)
      .foreach(stageMemo.remove)
    stageMemo.getOrElseUpdate((s, dir, stage), graft.Ckpt(f))
  }
  private def memoShingles(s: SparkSession, dir: String): DataFrame =
    memoStage(s, dir, "shingles")(
      graft.ops.Dedup.shingles(documents(s, dir), "doc_id", "text"))
  private def memoLshPairs(s: SparkSession, dir: String): DataFrame =
    memoStage(s, dir, "lsh_pairs_0.8")(
      graft.ops.Dedup.minhashLshPairs(memoShingles(s, dir), 0.8))
  private def memoCanon(s: SparkSession, dir: String): DataFrame =
    memoStage(s, dir, "canon_0.8")(
      graft.ops.Dedup.canonicalize(s, memoLshPairs(s, dir)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4 aggregations (A-ops) -----------------------------------
    "q1_agg" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy($c("l_returnflag"), $c("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // ---- §2.5 window top-k (W1/T5) ------------------------------------
    "q2_topk_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, dir)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    }),

    // ---- §2.3 joins (J2 broadcast hydrate) -----------------------------
    "q3_join_agg" -> ((s, dir) => {
      val c = customer(s, dir)
      val n = nation(s, dir)
      orders(s, dir)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // ---- semi-join (P4 whitelist semantics) ----------------------------
    "q4_semijoin" -> ((s, dir) => {
      val o = orders(s, dir).filter(col("o_orderstatus") === "F")
      customer(s, dir)
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // ---- anti-join (P5 exclusion semantics) ----------------------------
    "q5_antijoin" -> ((s, dir) => {
      val urgent = orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // ---- §2.5 W5 sessionize (sequential grouping sweep) ----------------
    "q6_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      events(s, dir)
        .withColumn("gap",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .withColumn("brk", when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("brk")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // ---- §2.7 set ops (U1/U2) ------------------------------------------
    "q7_union_distinct" -> ((s, dir) => {
      val li = lineitem(s, dir)
      li.select(col("l_returnflag").as("tag"))
        .union(li.select(col("l_linestatus").as("tag")))
        .distinct()
    }),

    // ---- §2.1 S4 regex filter + pagination -----------------------------
    "q8_pagination" -> ((s, dir) => {
      documents(s, dir)
        .filter(col("text").rlike("join.*merge"))
        .select(
          col("doc_id"),
          col("lang"),
          substring(col("text"), 1, 40).as("preview"))
        .orderBy(col("doc_id"))
        .offset(5)
        .limit(20)
    }),

    // ---- §2.4 A1/A5 mode with deterministic tie-break ------------------
    "q9_mode" -> ((s, dir) => {
      val counts = documents(s, dir).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("source").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("lang"), col("source").as("top_source"), col("cnt"))
    }),

    // ---- §2.4 A7 score stats (mean/median over groups) -----------------
    "q10_stats" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          (sum(dec(col("value"))).cast("double") / count(lit(1)))
            .as("mean_value"),
          round(expr("percentile(value, 0.5)"), 6).as("median_value"))
    }),

    // ---- §2.8 F11/F12 substring mention/context extraction -------------
    "q11_substr_ctx" -> ((s, dir) => {
      documents(s, dir)
        .withColumn("pos", locate("customer", col("text")))
        .filter(col("pos") > 0)
        .select(
          col("doc_id"),
          col("pos"),
          substring(col("text"), greatest(col("pos") - 10, lit(1)), lit(10)).as("ctx_left"),
          substring(col("text"), col("pos"), lit(8)).as("mention"),
          substring(col("text"), col("pos") + 8, lit(10)).as("ctx_right"))
    }),

    // ---- training-data op: exact dedup (hash-groupBy) ------------------
    "t1_exact_dedup" -> ((s, dir) => {
      documents(s, dir)
        .groupBy(md5(col("text")).as("text_md5"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_dups"))
    }),

    // ---- streaming-shaped tumbling window agg (§2.9 analog) ------------
    "q12_window_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy(
          date_format(window(col("ts"), "1 hour")("start"),
            "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
    }),

    // ---- J4 interval-overlap sweep (merge-sets core pattern) -----------
    "q13_interval_overlap" -> ((s, dir) => {
      val o = orders(s, dir)
        .withColumn("start_s", unix_timestamp(col("o_orderdate")))
        .withColumn("end_s", col("start_s") + lit(7L * 86400))
      val ord = Window.partitionBy(col("o_custkey"))
        .orderBy(col("start_s"), col("end_s"), col("o_orderkey"))
      o.withColumn("prev_max",
          max(col("end_s")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("brk",
          when(col("prev_max").isNull || col("start_s") >= col("prev_max"), 1)
            .otherwise(0))
        .groupBy(col("o_custkey"))
        .agg(sum(col("brk")).as("n_groups"), count(lit(1)).as("n_orders"))
    }),

    // ---- distinct aggregation (A8 analog) -------------------------------
    "q14_distinct_agg" -> ((s, dir) => {
      documents(s, dir).groupBy(col("lang"))
        .agg(countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"))
    }),

    // ---- F3 fuzzy matching: levenshtein pairs ---------------------------
    "q15_fuzzy" -> ((s, dir) => {
      val n1 = nation(s, dir).select(col("n_name").as("a"))
      val n2 = nation(s, dir).select(col("n_name").as("b"))
      n1.crossJoin(n2)
        .filter(col("a") < col("b"))
        .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
        .filter(col("dist") <= 2)
    }),

    // ==== KG pipeline over the interleaved corpus =======================
    // exploded span table: the input_hint shape, verifiable in SQL
    "kg_spans" -> ((s, dir) => {
      import s.implicits._
      graft.fixtures.Corpus.inputDocs(s, dir)
        .flatMap(d => d.spans.zipWithIndex.map { case (sp, i) =>
          (d.doc_id.toLong, i, sp.kind, sp.text, sp.media_ref, sp.offset) })
        .toDF("doc_id", "span_idx", "kind", "text", "media_ref", "offset")
    }),

    // section sweep (W6): token markers, running last(ignoreNulls)
    "kg_sections" -> ((s, dir) => {
      graft.ner.Sectionator.tokenSections(
          documents(s, dir), "doc_id", "text",
          Seq("window", "stream", "batch"))
        .groupBy(col("doc_id"), col("section"))
        .agg(count(lit(1)).as("n_tokens"))
    }),

    // reference-faithful section SPANS (W6/F15 incl. end-offset fixup):
    // the corpus is single-line, so deterministic marker lines are
    // injected (every " window " becomes a P.Q.M. line) — the kernel
    // runs the full reference state machine, the oracle mirrors the
    // resulting two-section split arithmetic.
    "kg_section_spans" -> ((s, dir) => {
      val lined = documents(s, dir).withColumn("t2",
        expr("replace(text, ' window ', concat(chr(10), 'P.Q.M.', chr(10)))"))
      graft.ner.Sectionator.sectionSpans(s, lined, "doc_id", "t2")
        .select(col("doc_id").cast("long").as("doc_id"), col("section"),
          col("start"), col("end"))
    }),

    // gazetteer NER mention counts (greedy trie semantics — no SQL oracle)
    "kg_mentions" -> ((s, dir) => {
      import s.implicits._
      Pipeline.mentions(s, dir).toDF()
        .groupBy(col("mention"), col("mention_type"), col("skip"))
        .agg(count(lit(1)).as("n"))
    }),

    // merged annotation set (anchored groups + 5-case consensus). One
    // corner is excluded from the driver slice on BOTH sides: regex
    // mentions with qualifier "big" can be covered by a "data big" trie
    // take, whose survival depends on recursive anchor absorption — not
    // closed-form in SQL (kernel behavior is unit-tested instead).
    "kg_merged" -> ((s, dir) =>
      Pipeline.merged(s, dir).toDF()
        .filter(!(col("source") === "regex" && col("mention").startsWith("big ")))
        .groupBy(col("mention"), col("mention_type"), col("source"))
        .agg(count(lit(1)).as("n"))),

    // linking decisions, hash-checked on the deterministic skip-path
    // slice (dictionary-resolved mentions: entity_id = gazetteer id,
    // url = TRIE<id> — the same determinism the kg_notnil oracle uses).
    // The full output incl. score-linked/NIL rows is embedding-dependent
    // and covered by GoldenSpec/PipelineSpec + the kg_candidates and
    // kg_notnil oracles. The FULL linked frame is still computed here
    // (runCached), so the driver gate exercises the whole path.
    "kg_linked" -> ((s, dir) =>
      Pipeline.linked(s, dir)
        .filter(col("skip"))
        .groupBy(col("doc_id").cast("long").as("doc_id"), col("mention"),
          col("entity_id"), col("url"))
        .agg(count(lit(1)).as("n"))),

    // per-mention persisted candidate SETS (J1 persistence,
    // indexer/main.py:175-182). Rank/scores are embedding-dependent;
    // the candidate GENERATION (token-blocked join vs the seed registry)
    // is deterministic and SQL-checkable, so the query exposes the sets.
    "kg_candidates" -> ((s, dir) => {
      val res = Pipeline.runCached(s, dir)
      res.candidates
        .join(res.linked.select("doc_id", "annset", "ann_id", "mention"),
          Seq("doc_id", "annset", "ann_id"))
        .filter(!col("mention").startsWith("big ")) // same corner as kg_merged
        .select(col("doc_id").cast("long").as("doc_id"), col("mention"),
          explode(col("candidates")).as("c"))
        .select(col("doc_id"), col("mention"),
          col("c.entity_id").as("entity_id"))
        .distinct()
    }),

    // J9 pseudo-clusters of NOT-NIL mentions grouped by url
    // (nilcluster/main.py:124-161), restricted to the deterministic
    // dictionary-skip slice (TRIE urls) so DuckDB can oracle it; the
    // full output incl. score-linked entities is covered by PipelineSpec.
    "kg_notnil" -> ((s, dir) => {
      Pipeline.runCached(s, dir).notNilClusters
        .filter(col("url").startsWith("TRIE"))
        .select(col("url"), col("title"), col("cluster_type"),
          col("nelements"))
    }),

    // end-to-end triples (flagship). The FULL pipeline executes
    // (runCached materializes every stage incl. clustering and the whole
    // triple frame), and the driver hash-checks the deterministic slice:
    // all :hasMedia triples from the real triple frame, plus the
    // :mentions/:typedAs triples rebuilt over the deterministic mention
    // subset — skip-path entities and the exact-title links (spark->1,
    // customer->3; equal titles embed identically, tie-break entity_id
    // asc, so the outcome is engine-guaranteed). Score-linked partial
    // overlaps (context-dependent embeddings), nil:* names,
    // :sameAsCluster and :coOccursWith are not SQL-expressible and stay
    // under GoldenSpec/PipelineSpec.
    "kg_triples" -> ((s, dir) => {
      val res = Pipeline.runCached(s, dir)
      val det = res.linked.filter(col("skip") ||
        (col("mention").isin("spark", "customer") && !col("is_nil")))
      val m = det.select(col("doc_id"),
        concat(lit("doc:"), col("doc_id")).as("subj"),
        lit(":mentions").as("pred"), col("name").as("obj")).distinct()
      val t = det.select(col("doc_id"), col("name").as("subj"),
        lit(":typedAs").as("pred"), col("rtype").as("obj")).distinct()
      val media = res.triples.filter(col("pred") === ":hasMedia")
        .select("doc_id", "subj", "pred", "obj")
      m.unionByName(t).unionByName(media)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("subj"), col("pred"), col("obj"))
    }),

    // media metadata (SQL-expressible slice of the multimodal stage)
    "kg_media" -> ((s, dir) => {
      import s.implicits._
      val media = graft.multimodal.Multimodal.mediaRows(
        s, graft.fixtures.Corpus.inputDocs(s, dir))
      graft.multimodal.Multimodal.extractFeatures(s, media)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("media_ref"), col("media_kind"))
    }),

    // full multimodal feature extraction. The stub decode is a pure
    // function of media_ref, so the whole feature set is DuckDB-
    // expressible (phash excluded: its 64-bit wrap-around multiply
    // overflows DuckDB BIGINT; covered by the sbt suite instead).
    "kg_media_features" -> ((s, dir) => {
      import s.implicits._
      val media = graft.multimodal.Multimodal.mediaRows(
        s, graft.fixtures.Corpus.inputDocs(s, dir))
      graft.multimodal.Multimodal.extractFeatures(s, media).toDF()
        .select(col("doc_id").cast("long").as("doc_id"), col("media_ref"),
          col("media_kind"), col("width"), col("height"), col("n_frames"),
          col("bytes_len"))
    }),

    // aspect-preserving resize to fit 256x256 (exact integer math so the
    // oracle reproduces it bit-for-bit)
    "kg_media_resized" -> ((s, dir) => {
      import s.implicits._
      val media = graft.multimodal.Multimodal.mediaRows(
        s, graft.fixtures.Corpus.inputDocs(s, dir))
      val feats = graft.multimodal.Multimodal.extractFeatures(s, media).toDF()
      graft.multimodal.Multimodal.resizePlan(feats, 256, 256)
        .select(col("doc_id").cast("long").as("doc_id"), col("media_ref"),
          col("out_width"), col("out_height"), col("out_bytes"))
    }),

    // every-10th-frame sampling over the decoded frame counts
    "kg_media_frames" -> ((s, dir) => {
      import s.implicits._
      val media = graft.multimodal.Multimodal.mediaRows(
        s, graft.fixtures.Corpus.inputDocs(s, dir))
      val feats = graft.multimodal.Multimodal.extractFeatures(s, media).toDF()
      graft.multimodal.Multimodal.sampleFrames(feats, 10)
        .select(col("doc_id").cast("long").as("doc_id"), col("media_ref"),
          col("frame_idx"))
    }),

    // ==== text analysis ==================================================
    "t2_tokstats" -> ((s, dir) => {
      val d = documents(s, dir)
        .withColumn("n_tokens", graft.ops.TextAnalysis.tokenCount(col("text")))
      d.groupBy(col("lang"))
        .agg(sum(col("n_tokens")).as("total_tokens"),
          max(col("n_tokens")).as("max_tokens"),
          min(col("n_tokens")).as("min_tokens"))
    }),

    "t3_quality" -> ((s, dir) => {
      graft.ops.TextAnalysis.qualityFeatures(documents(s, dir), col("text"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
          round(col("dup_token_ratio"), 6).as("dup_token_ratio"),
          round(col("stopword_ratio"), 6).as("stopword_ratio"))
    }),

    "t4_langid" -> ((s, dir) => {
      documents(s, dir)
        .withColumn("pred_lang", graft.ops.TextAnalysis.langId(col("text")))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
    }),

    // canonical-form fingerprint (md5 over the sorted distinct token
    // set): whitespace/duplication-robust content hash, SQL-expressible
    // so the driver can oracle it. The rolling-hash variant
    // (TextAnalysis.fingerprintUdf) stays covered by the sbt suite.
    "t5_fingerprint" -> ((s, dir) => {
      documents(s, dir)
        .withColumn("fp",
          md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), "\\s+"))))))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("keep_doc_id"),
          count(lit(1)).as("n_dups"))
    }),

    // ==== near-duplicate detection =======================================
    // EXACT Jaccard via prefix filtering (TokenJoin/PPJoin family):
    // lossless recall, and stop-shingles never enter the prefix join
    "t6_ngram_neardup" -> ((s, dir) =>
      // memoShingles: the df/size aggregates, prefix join and verify join
      // would otherwise re-explode the shingles (multiple corpus scans at
      // 100 TB), and the materialized frame is shared with t8/t32/t35 and
      // the minhash chain within one session
      graft.ops.Dedup.prefixJaccardPairs(memoShingles(s, dir), 0.8)),

    "t7_minhash_lsh" -> ((s, dir) => memoLshPairs(s, dir)),

    // Asymmetric near-dup: the smaller doc's rare-shingle set mostly
    // inside the larger's (quote/subset duplication Jaccard misses).
    "t35_containment" -> ((s, dir) =>
      graft.ops.Dedup.containmentPairs(memoShingles(s, dir), 0.9)),

    // Sub-document dedup: maximal per-doc spans of 8-token windows that
    // occur in more than one document (Lee et al. substring dedup).
    "t36_dup_spans" -> ((s, dir) =>
      graft.ops.Dedup.dupSubstringSpans(documents(s, dir), "doc_id", "text")),

    // Apply the dup spans: corpus with duplicated substrings cut out.
    "t37_despanned" -> ((s, dir) =>
      graft.ops.Dedup.removeDupSpans(documents(s, dir), "doc_id", "text")),

    "t8_simhash" -> ((s, dir) =>
      graft.ops.Dedup.simhashPairs(memoShingles(s, dir), 3)),

    // INCREMENTAL dedup: new batch (odd ids) vs existing index (even
    // ids) — asymmetric bucket join, no old×old pair generation.
    "t32_incr_dedup" -> ((s, dir) => {
      val sh = memoShingles(s, dir)
      graft.ops.Dedup.incrementalPairs(sh,
        graft.ops.Dedup.minhashSignatures(sh), col("doc_id") % 2 === 0, 0.8)
    }),

    // near-dup CANONICALIZATION: pairs chain, so keep/drop is decided per
    // connected component of the pair graph; canonical = min doc id.
    // Oracled end-to-end (DuckDB recursive-CTE transitive closure).
    "t10_dedup_canon" -> ((s, dir) => memoCanon(s, dir)),

    // keep-the-BEST-copy dedup policy: one representative per near-dup
    // cluster by quality (longest text, ties -> min id) instead of t10's
    // min-id canonical — the rule production corpus dedup actually wants.
    "t39_best_rep" -> ((s, dir) =>
      graft.ops.Dedup.bestRepresentatives(
        memoCanon(s, dir),
        documents(s, dir).select(col("doc_id"), col("n_chars")),
        "n_chars")),

    // SCALE path ships: banded sign-LSH candidates + exact verify (the
    // O(n^2) cross join stays a test-only oracle in OpsSpec). The DuckDB
    // oracle mirrors the banding exactly, so recall is checked too.
    "t9_embed_neardup" -> ((s, dir) => {
      graft.ops.Dedup.signLshPairs(
        embeddings(s, dir), "vec_id", "embedding", 0.4)
        .select(col("a"), col("b")) // ids only: cosine repr differs per engine
    }),

    // ==== similarity search ==============================================
    "e1_ann_topk" -> ((s, dir) => {
      val all = embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.ops.Ann.bruteForceTopK(all.filter(col("id") < 10), all, 5)
        .select("query_id", "neighbor_id", "rnk")
    }),

    // axis-aligned sign-LSH (bucket = leading-8-dim sign pattern):
    // bucketed ANN whose bucket function is SQL-expressible -> oracled
    "e2_ann_lsh" -> ((s, dir) => {
      val all = embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.ops.Ann.signLshTopK(all, 3)
        .select("query_id", "neighbor_id", "rnk")
    }),

    // IVF ANN (scale path beside e2's LSH): deterministic seed centroids
    // (16 smallest vec_ids), corpus sharded into nearest-centroid lists,
    // queries probe their 3 nearest lists, exact rescore within — the
    // whole index structure is SQL-reproducible, so the oracle checks
    // assignment + probing + ranking end-to-end
    "e4_ann_ivf" -> ((s, dir) => {
      val all = embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.ops.Ann.ivfTopK(all.filter(col("id") < 10), all, 5,
          nlist = 16, nprobe = 3)
        .select("query_id", "neighbor_id", "rnk")
    }),

    // element-wise centroid (A3). Floats are quantized to 1e-6 via double
    // arithmetic before summing: float->decimal casts round differently
    // across engines, but double ops are IEEE-identical, so the quantized
    // mean is bit-equal in Spark and DuckDB.
    "e3_centroids" -> ((s, dir) => {
      embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .withColumn("vq", round(col("v").cast("double") * 1000000).cast("long"))
        .groupBy(col("label"), col("dim"))
        .agg((sum(col("vq")).cast("double") /
          (count(lit(1)) * lit(1000000.0))).as("mean_v"))
    }),

    // ---- RFM segmentation (value-based quartile bucketing) ---------------
    // Classic customer segmentation: recency/frequency/monetary quartile
    // buckets. Scale shape: ONE orders shuffle to the per-customer
    // aggregate (persisted — the boundary scalars and the bucketing both
    // consume it); quartile BOUNDARIES are three scalars per metric
    // (exact percentile, proven to match DuckDB quantile_cont in q21)
    // broadcast into codegen comparisons — never an ntile window over
    // the customer frame (single-partition at 10^9 customers). Monetary
    // sums exact CENTS longs (order-independent across engines).
    "q51_rfm" -> ((s, dir) => {
      val byCust = orders(s, dir).groupBy(col("o_custkey"))
        // parquet timestamps are NTZ; session TZ is pinned UTC, so the
        // cast is instant-preserving and matches DuckDB epoch_us
        .agg(max(unix_micros(col("o_orderdate").cast("timestamp"))).as("last_us"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .persist()
      val bounds = byCust.agg(
        expr("percentile(last_us, array(0.25, 0.5, 0.75))").as("qr"),
        expr("percentile(freq, array(0.25, 0.5, 0.75))").as("qf"),
        expr("percentile(cents, array(0.25, 0.5, 0.75))").as("qm"))
      def bucket(v: Column, qs: Column): Column =
        lit(1) + (v > element_at(qs, 1)).cast("int") +
          (v > element_at(qs, 2)).cast("int") +
          (v > element_at(qs, 3)).cast("int")
      byCust.crossJoin(broadcast(bounds))
        .withColumn("r", bucket(col("last_us"), col("qr")))
        .withColumn("f", bucket(col("freq"), col("qf")))
        .withColumn("m", bucket(col("cents"), col("qm")))
        .groupBy("r", "f", "m").agg(count(lit(1)).as("n_customers"))
    }),

    // ---- Benford first-digit audit ---------------------------------------
    // Data-quality / fraud screen: distribution of the first significant
    // digit of order totals. The digit comes from the DECIMAL STRING of
    // exact cents (identical across engines), never from log10 on a
    // double (ulp-sensitive at powers of ten). One tiny aggregate; the
    // share window runs over the 9-row digit frame.
    "q52_benford" -> ((s, dir) => {
      orders(s, dir)
        .withColumn("d",
          substring(round(col("o_totalprice") * 100).cast("long")
            .cast("string"), 1, 1))
        .groupBy("d").agg(count(lit(1)).as("n"))
        .withColumn("share_ppm",
          round(col("n") * lit(1e6) /
            sum(col("n")).over(Window.partitionBy())).cast("long"))
    }),

    // ---- common-path mining (ordered sequence extraction) ---------------
    // Top entry paths: each user's first 3 event types IN TIME ORDER
    // (array_sort on the unique rank, then join — order-preserving,
    // unlike q37's sorted-set collect). One user_id shuffle for the
    // window; the rank filter cuts to <=3 rows/user BEFORE the path
    // aggregate, which groups on the same key (exchange reuse); path
    // counts are tiny; top-10 is TakeOrderedAndProject.
    "q50_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy("user_id")
        .agg(concat_ws(">",
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x("event_type"))).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path").asc)
        .limit(10)
    }),

    // ---- k-means refinement step (IVF training kernel) ------------------
    // One Lloyd iteration from the deterministic seed centroids:
    // broadcast-argmax assignment + quantized element-wise mean
    // (composes the proven e4 assignment and e3 mean patterns).
    "e5_kmeans_step" -> ((s, dir) => {
      val emb = embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.cluster.KMeans.step(emb, graft.cluster.KMeans.seed(emb, 16))
    }),

    // ---- as-of join (point-in-time feature attribution) ----------------
    // Each purchase joined to the user's most recent prior click — the
    // single-sweep encoding (graft.ops.AsOf): one shuffle on the key, no
    // (left, earlier-right) pair materialization. Oracle = DuckDB's
    // native ASOF JOIN, checking the full operator semantics end-to-end.
    "q16_asof" -> ((s, dir) => {
      val e = events(s, dir)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("p_ts"))
      // clicks dedup to one row per (user, ts): DuckDB's ASOF JOIN gives
      // no tie-break among equal right timestamps, so same-instant
      // duplicates would make the compare engine-dependent
      val c = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("c_ts"))
        .agg(max(col("event_id")).as("click_id"))
      // events ts is TIMESTAMP_NTZ; session TZ is UTC so the cast is the
      // identity on the instant (unix_micros only accepts TIMESTAMP)
      def us(n: String) = unix_micros(col(n).cast("timestamp"))
      graft.ops.AsOf.asofJoin(p, c, "user_id", "p_ts", "c_ts")
        .select(col("purchase_id"), col("user_id"),
          us("p_ts").as("p_us"), col("click_id"),
          (us("p_ts") - us("c_ts")).as("gap_us"))
    }),

    // ---- rollup (hierarchical aggregate, one pass) ----------------------
    "q17_rollup" -> ((s, dir) => {
      lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n_rows"))
    }),

    // ---- deterministic train/eval splits (reproducible sampling) -------
    // Split assignment is a pure function of the document text (md5-prefix
    // thresholds, graft.ops.Sampling): identical on every run, engine and
    // partitioning. 80/10/10; the oracle re-derives the same buckets in SQL.
    "t11_splits" -> ((s, dir) => {
      documents(s, dir)
        .withColumn("split",
          graft.ops.Sampling.splitIndex(col("text"), Seq(0.8, 0.1, 0.1)))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
    }),

    // ---- bucketized range join (interval containment without equi-key) --
    // Shipments falling inside 7-day order windows. A bare BETWEEN join has
    // no equi-key, so Catalyst would plan a BroadcastNestedLoopJoin —
    // O(|ships| x |windows|). RangeJoin.pointInInterval quantizes time into
    // 1-day buckets: intervals replicate across the ~8 buckets they touch,
    // points land in one, and the plan becomes a hash equi-join on the
    // bucket id + residual filter. Oracle = DuckDB's native IEJoin on the
    // same BETWEEN predicate, checking the full operator end-to-end.
    "q18_range_join" -> ((s, dir) => {
      def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
      val day = 86400000000L
      val windows = orders(s, dir)
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("window_id"),
          us(col("o_orderdate")).as("lo_us"),
          (us(col("o_orderdate")) + lit(7 * day)).as("hi_us"))
      val ships = lineitem(s, dir)
        .select(us(col("l_shipdate")).as("ship_us"), col("l_quantity"))
      graft.ops.RangeJoin
        .pointInInterval(ships, windows, "ship_us", "lo_us", "hi_us", day)
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_ship"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
    }),

    // ---- interval-interval overlap join (bucketized, exactly-once) -----
    // Pairs of overlapping 7-day order windows. The dedup is shuffle-free:
    // a pair is emitted only from the bucket containing max(lo1, lo2),
    // which both intervals cover — no distinct over the output.
    "q19_interval_join" -> ((s, dir) => {
      def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
      val day = 86400000000L
      def windows(pfx: String) = orders(s, dir)
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as(s"${pfx}_id"),
          us(col("o_orderdate")).as(s"${pfx}_lo"),
          (us(col("o_orderdate")) + lit(7 * day)).as(s"${pfx}_hi"))
      graft.ops.RangeJoin
        .intervalOverlap(windows("w1"), windows("w2"),
          "w1_lo", "w1_hi", "w2_lo", "w2_hi", day)
        .filter(col("w1_id") < col("w2_id"))
        .select(col("w1_id"), col("w2_id"),
          (least(col("w1_hi"), col("w2_hi")) -
            greatest(col("w1_lo"), col("w2_lo"))).as("overlap_us"))
    }),

    // ---- cube (all grouping combinations, one pass) --------------------
    "q20_cube" -> ((s, dir) => {
      lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n_rows"))
    }),

    // ---- exact interpolated quantiles ----------------------------------
    // percentile() (exact, type-7 linear interpolation at index p*(N-1))
    // = DuckDB quantile_cont. Computed over l_quantity: integer-valued
    // doubles, so every interpolated value is an exact dyadic rational
    // and the result is bit-identical across engines — the float-quantize
    // trick the oracle contract otherwise needs is unnecessary here.
    "q21_median" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.25)").cast("double").as("p25"),
          expr("percentile(l_quantity, 0.5)").cast("double").as("p50"),
          expr("percentile(l_quantity, 0.75)").cast("double").as("p75"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- training-sequence packing (greedy linear, one window) ---------
    // Documents packed into 4096-char bins per language; bin id is a pure
    // window function of the data (no driver-side bin state), identical
    // on any partitioning — the streaming-friendly packer of a
    // pretraining pipeline. Aggregated per bin for a compact result.
    "t12_pack" -> ((s, dir) => {
      val d = documents(s, dir)
        .select(col("doc_id"), col("lang"), length(col("text")).as("n_chars"))
      graft.ops.Pack.linearPack(d, Seq("lang"), "doc_id", "n_chars", 4096L)
        .groupBy(col("lang"), col("bin_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("bin_chars"),
          min(col("doc_id")).as("first_doc"))
    }),

    // ---- overlapping text chunking (RAG-style sliding window) ----------
    // 200-char chunks advancing by 150 (50 overlap): generate-and-explode
    // projection, zero shuffle, codegen'd end to end.
    "t13_chunk" -> ((s, dir) => {
      graft.ops.Pack
        .chunk(documents(s, dir).select(col("doc_id"), col("text")), "text", 200, 50)
        .select(col("doc_id"), col("chunk_idx"),
          col("chunk_start").cast("long").as("chunk_start"),
          length(col("chunk")).cast("long").as("chunk_len"),
          substring(col("chunk"), 1, 16).as("head"))
    }),

    // ---- pivot (wide conditional aggregation) --------------------------
    // Explicit value list => no extra distinct-values job, stable column
    // order; the oracle is the equivalent conditional aggregation.
    "q22_pivot" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec(col("l_quantity"))).cast("double"))
        .select(col("l_returnflag"), col("F").as("qty_f"), col("O").as("qty_o"))
    }),

    // ---- two-path salted skew join (head-key defense, end to end) ------
    // lineitem x part through SkewJoin.adaptiveSaltedJoin: keys above the
    // hot threshold take the salted path (hot key spread over 8 shuffle
    // sub-keys, dim rows replicated), the long tail takes the plain join;
    // the union must be row-identical to the unsalted join — which is
    // exactly what the oracle (a plain SQL join) checks. The salt is
    // pmod(hash(orderkey, linenumber), 8): deterministic, replay-stable.
    "q23_skew_join" -> ((s, dir) => {
      val large = lineitem(s, dir)
        .select(col("l_partkey").as("partkey"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"))
      val small = part(s, dir)
        .select(col("p_partkey").as("partkey"), col("p_brand"))
      graft.ops.SkewJoin
        .adaptiveSaltedJoin(large, small, "partkey",
          Seq(col("l_orderkey"), col("l_linenumber")), salts = 8,
          hotThreshold = 40L)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_rows"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
    }),

    // ---- stratified deterministic sampling ------------------------------
    // Downsample the dominant language, keep rare ones denser: en 50%,
    // zh 25%, everything else 12.5%. Membership is a pure md5-prefix
    // function of doc_id (graft.ops.Sampling) — changing a stratum's rate
    // never reshuffles WHICH rows survive within it, only the cutoff.
    "t14_stratified" -> ((s, dir) => {
      documents(s, dir)
        .filter(graft.ops.Sampling.stratifiedSampled(
          col("doc_id").cast("string"),
          col("lang"), Seq("en" -> 0.5, "zh" -> 0.25), 0.125))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
    }),

    // ---- grouping sets (explicit aggregation lattice, one pass) ---------
    // Arbitrary grouping combinations — (returnflag, linestatus) and
    // (returnflag) only, no grand total — via the SQL front-end: one
    // Expand + two-phase aggregate, same physical shape as rollup/cube
    // but with a caller-chosen lattice.
    "q24_grouping_sets" -> ((s, dir) => {
      lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                  coalesce(l_linestatus, 'ALL') AS linestatus,
                  CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
                  count(*) AS n_rows
           FROM lineitem_gs
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))""")
    }),

    // ---- deterministic k-per-group sample (domain cap) ------------------
    // At most 20 docs per language, chosen by md5 order — the "cap
    // documents per domain" primitive of corpus curation. One sort+window
    // per group partition; order is content-derived, so the same docs are
    // kept on any cluster size or physical layout.
    "t15_group_sample" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      documents(s, dir)
        .select(col("lang"), col("doc_id"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 20)
    }),

    // ---- event-time tumbling window --------------------------------
    // The same window(ts, "1 hour") groupBy shape StreamKb.mentionCounts
    // runs watermarked on an unbounded stream; driven here in batch so
    // the DuckDB oracle (date_trunc) can hash-check it. Window starts are
    // epoch-aligned in the UTC session, so they equal date_trunc('hour').
    "q25_event_windows" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("ws"),
                col("event_type"), col("n_events"), col("sum_value"))
    }),

    // ---- n-gram repetition quality filter (Gopher-style) --------------
    "t16_repetition" -> ((s, dir) => {
      graft.ops.TextAnalysis
        .ngramRepetition(documents(s, dir).select(col("doc_id"), col("text")),
          col("text"))
        .select(col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
          col("n_trigrams"), col("n_distinct_trigrams"), col("rep_flagged"))
    }),

    // ---- benchmark decontamination (word 5-gram overlap) ---------------
    // Probe set = doc_id % 5 == 0 stands in for an eval benchmark; the
    // benchmark n-gram set is broadcast, the corpus side never shuffles
    // before the per-doc count.
    "t17_decontam" -> ((s, dir) => {
      val docs = documents(s, dir).select(col("doc_id"), col("text"))
      graft.ops.Decontam.hits(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "text", "doc_id", n = 5)
    }),

    // ---- end-to-end curation report ---------------------------------------
    // The pipeline's final keep/drop decision, composed from the proven
    // component operators: quality flags (pure expressions), later-
    // occurrence exact near-dup drop (prefix-filtered Jaccard — shingles
    // cached once for the pair pass), and benchmark decontamination
    // (broadcast probe n-grams). One report row per source with each
    // drop-reason counted independently plus the surviving count —
    // what a curation run actually publishes.
    "t33_curation_report" -> ((s, dir) => {
      val docs = documents(s, dir)
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val probe = docs.filter(col("doc_id") % 5 === 0)
      val toks = split(col("text"), " ")
      val flags = corpus.select(col("doc_id"), col("source"),
          size(toks).as("n_tokens"), size(array_distinct(toks)).as("n_distinct"))
        .withColumn("bad_quality",
          col("n_tokens") < 5 ||
            (lit(1.0) - col("n_distinct").cast("double") /
              col("n_tokens").cast("double")) > 0.6)
      val sh = graft.ops.Dedup.shingles(corpus, "doc_id", "text").cache()
      val dupLater = graft.ops.Dedup.prefixJaccardPairs(sh, 0.8)
        .select(greatest(col("a"), col("b")).as("doc_id")).distinct()
        .withColumn("dup_hit", lit(true))
      val contam = graft.ops.Decontam.hits(corpus, probe, "text", "doc_id", n = 5)
        .select(col("doc_id")).withColumn("contam_hit", lit(true))
      flags.join(dupLater, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce(col("dup_hit"), lit(false)))
        .withColumn("is_contam", coalesce(col("contam_hit"), lit(false)))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("bad_quality"), 1L).otherwise(0L)).as("n_bad_quality"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
          sum(when(col("is_contam"), 1L).otherwise(0L)).as("n_contam"),
          sum(when(!col("bad_quality") && !col("is_dup") && !col("is_contam"),
            1L).otherwise(0L)).as("n_kept"))
    }),

    // ---- token-budget corpus mixing ------------------------------------
    // "2000 en tokens, 1000 zh, 500 of each other language": prefix of the
    // deterministic md5 order per stratum, running sum inside the budget.
    "t18_token_budget" -> ((s, dir) => {
      graft.ops.Sampling.tokenBudget(
        documents(s, dir).select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "lang", size(split(col("text"), " ")),
        Seq("en" -> 2000L, "zh" -> 1000L), defaultBudget = 500L)
        .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
    }),

    // ---- vocabulary induction (top-k by term frequency) -----------------
    // Tokenizer-vocab building: per-word corpus tf + df, global top-k
    // (ties at the cut broken by word asc on both engines).
    // Partial hash agg map-side; the final top-k is TakeOrderedAndProject
    // (per-partition heap then merge on the driver) — never a full sort.
    "t19_vocab" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("tf"),
             countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("word"))
        .limit(20)
    }),

    // ---- time-bounded sequential funnel ---------------------------------
    // view -> click -> purchase, each within 24h of the previous stage's
    // first qualifying event. Per-user frontier frames shrink with depth.
    "q26_funnel" -> ((s, dir) => {
      graft.ops.Funnel.stageCounts(events(s, dir), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"), windowSec = 24 * 3600)
    }),

    // ---- semi-structured extraction (JSON props) -------------------------
    // Metadata filtering over a JSON column: numeric field extraction +
    // aggregate, all inside codegen (get_json_object).
    "q27_json" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
             sum(col("k")).as("sum_k"),
             max(col("k")).as("max_k"))
    }),

    // ---- inactivity-gap sessionization ----------------------------------
    // 12h-gap sessions per user (the time-gap counterpart of q6's BIO
    // token sessionize); microsecond-exact boundaries.
    "q28_gap_sessions" -> ((s, dir) => {
      graft.ops.Sessionize.userStats(
        events(s, dir).select(col("user_id"), col("ts"), col("event_id")),
        "user_id", "ts", "event_id", gapUs = 12L * 3600 * 1000000)
    }),

    // ---- 2-hop graph neighborhood expansion (seed frontier) -------------
    // Parts co-ordered with the parts co-ordered with a seed part, minus
    // direct neighbors — the BFS frontier-expansion kernel over the
    // materialized co-occurrence graph. Seeds stay a broadcast side; the
    // distinct collapses the frontier before the anti-join.
    "q29_path2" -> ((s, dir) => {
      val seeds = part(s, dir).filter(col("p_size") === 25)
        .select(col("p_partkey").as("vertex"))
      graft.ops.Graph.twoHopFromSeeds(coEdges(s, dir), broadcast(seeds),
        edgesMaterialized = true)
    }),

    // ---- fixed-point PageRank (iterative DataFrame joins) ---------------
    // 5 damped iterations over the co-order graph in scaled-integer
    // arithmetic: exact associative long sums make the distributed result
    // bit-identical to the unrolled SQL oracle regardless of shuffle order.
    "q30_pagerank" -> ((s, dir) =>
      graft.ops.Graph.pageRank(coEdges(s, dir), iterations = 5,
        edgesMaterialized = true)),

    // ---- skyline / Pareto frontier (two-phase) -----------------------------
    // Orders that are Pareto-optimal on (price low, date recent), over
    // DISTINCT (price, date) points so the strict sorted-scan rule is
    // exact. Two-phase at scale: hash-bucket-local skylines first (one
    // window per bucket prunes everything locally dominated), then the
    // global pass runs over the union of local skylines — a frame the
    // size of the frontier, not the corpus, so the final unpartitioned
    // window is safe. Exact: dominance is transitive, so every global
    // skyline point survives its own bucket and kills all dominated
    // survivors in phase 2. The oracle checks SEMANTICS independently
    // of the algorithm (NOT EXISTS dominator).
    "q54_skyline" -> ((s, dir) => {
      val pts = orders(s, dir).select(
        round(col("o_totalprice") * 100).cast("long").as("price_c"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("date_us"))
        .distinct()
      def sky(df: DataFrame, parts: Seq[Column]): DataFrame = {
        val w = Window.partitionBy(parts: _*)
          .orderBy(col("price_c").asc, col("date_us").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        df.withColumn("best_prev", max(col("date_us")).over(w))
          .filter(col("best_prev").isNull || col("date_us") > col("best_prev"))
          .drop("best_prev")
      }
      sky(sky(pts, Seq(pmod(hash(col("price_c"), col("date_us")), lit(32)))),
        Seq.empty)
    }),

    // ---- weighted sample (A-ES) -----------------------------------------
    // k docs per language with probability ~ n_chars, WITHOUT
    // replacement: top-k by the Efraimidis–Spirakis priority ln(u)/w
    // (Sampling.weightedPriority; u from the row's own md5, so the
    // sample is deterministic and engine-portable). Scale: the top-k is
    // TopK's map-side combining aggregate — shuffle = langs x k rows,
    // no global sort, no RNG state.
    "t34_weighted_sample" -> ((s, dir) => {
      val keyed = documents(s, dir).withColumn("pri",
        graft.ops.Sampling.weightedPriority(
          col("doc_id").cast("string"), col("n_chars")))
      graft.ops.TopK.topKPerKey(keyed, Seq("lang"), "pri", "doc_id", 5)
        .select(col("lang"), col("doc_id"), col("rnk").cast("long").as("rnk"))
    }),

    // ---- BPE merge step (tokenizer-training inner loop) --------------------
    // One BPE training iteration (Sennrich et al. '16): adjacent-symbol
    // pair counts over the word-frequency dict, top candidates by
    // (count desc, pair asc) — the argmax IS the next merge rule. Same
    // one-refinement-step contract as e5_kmeans_step: callers loop it.
    // Scale: the corpus collapses to the word dict in one hash-agg (vocab
    //-sized, not corpus-sized); pair explode is per-word-length over the
    // DICT; top-k plans as TakeOrderedAndProject (per-partition heaps).
    "t40_bpe_step" -> ((s, dir) => {
      val words = documents(s, dir)
        .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
        .filter(length(col("word")) >= 2)
        .groupBy(col("word")).agg(count(lit(1)).as("wcount"))
      words
        .select(col("word"), col("wcount"),
          explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
        .select(expr("substr(word, i, 2)").as("pair"), col("wcount"))
        .groupBy(col("pair")).agg(sum(col("wcount")).as("total"))
        .orderBy(col("total").desc, col("pair").asc)
        .limit(10)
    }),

    // ---- domain-mixture resampling weights --------------------------------
    // Per (lang, source) domain: corpus share vs a sqrt-scaled target
    // mixture (the standard multilingual-training rebalance, alpha=0.5)
    // and the per-doc resampling weight target/corpus. Determinism across
    // engines: per-group sqrt is quantized to an integer (round(sqrt*1e6))
    // BEFORE the cross-group sum, so every sum is exact and the final
    // doubles are single divisions of exact values — no float-accumulation
    // order sensitivity. Scale: one hash-agg to G domain rows, totals
    // broadcast back; nothing here is corpus-sized after the first agg.
    "t38_domain_mix" -> ((s, dir) => {
      // totals come from unpartitioned window sums over the G-row domain
      // frame (bounded by |lang x source|, same rationale as t24/q58) —
      // NOT a separate aggregate of g, which would re-run the corpus scan
      val g = documents(s, dir).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("sq",
          round(sqrt(col("n_docs").cast("double")) * 1e6, 0).cast("long"))
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      g.withColumn("n_total", sum(col("n_docs")).over(all))
        .withColumn("sq_total", sum(col("sq")).over(all))
        .select(
        col("lang"), col("source"), col("n_docs"),
        (col("n_docs").cast("double") / col("n_total").cast("double"))
          .as("corpus_share"),
        (col("sq").cast("double") / col("sq_total").cast("double"))
          .as("target_share"),
        ((col("sq").cast("double") * col("n_total").cast("double")) /
          (col("sq_total").cast("double") * col("n_docs").cast("double")))
          .as("weight"))
    }),

    // ---- association rules over order baskets ---------------------------
    // Market-basket co-occurrence: support / confidence / lift per part
    // pair. Shape at scale: distinct (order, part) first (baskets are
    // small, ~7 items, so the per-order self-join is linear-ish in
    // lineitem), one hash-agg per pair, then per-item counts join back —
    // the item-count side is |parts|-sized, broadcastable. All metrics
    // are double divisions of exact integer products (bit-identical
    // across engines; counts << 2^53).
    "q55_assoc" -> ((s, dir) => {
      // cache: the basket frame feeds three consumers (n_orders, item
      // counts, pair self-join x2) — uncached, each re-scans lineitem
      val li = lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct().cache()
      val nOrders = li.agg(countDistinct(col("ok")).as("n_orders"))
      val itemCnt = li.groupBy(col("pk")).agg(count(lit(1)).as("icnt"))
      val pairCnt = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("part_a"), col("y.pk").as("part_b"))
        .agg(count(lit(1)).as("pair_cnt"))
        .filter(col("pair_cnt") >= 2)
      pairCnt
        .join(broadcast(itemCnt.withColumnRenamed("icnt", "cnt_a")),
          col("part_a") === col("pk")).drop("pk")
        .join(broadcast(itemCnt.withColumnRenamed("icnt", "cnt_b")),
          col("part_b") === col("pk")).drop("pk")
        .crossJoin(broadcast(nOrders))
        .select(col("part_a"), col("part_b"), col("pair_cnt"),
          (col("pair_cnt").cast("double") / col("n_orders")).as("support"),
          (col("pair_cnt").cast("double") / col("cnt_a")).as("conf_ab"),
          (col("pair_cnt").cast("double") / col("cnt_b")).as("conf_ba"),
          ((col("pair_cnt") * col("n_orders")).cast("double") /
            (col("cnt_a") * col("cnt_b")).cast("double")).as("lift"))
    }),

    // ---- exact ROC-AUC, rank-free ----------------------------------------
    // Does `value` separate purchases from the rest? Mann–Whitney AUC
    // with midrank ties, computed WITHOUT a global sort: per-distinct-
    // score counts, then a two-level (bucket + within-bucket) prefix
    // sum — see Eval.auc. Integer numerator; one final double division.
    "q56_auc" -> ((s, dir) =>
      graft.ops.Eval.auc(events(s, dir), col("value"),
        col("event_type") === "purchase")),

    // ---- key-skew profile ---------------------------------------------------
    // The diagnostic run BEFORE choosing a join/partition strategy at
    // 100 TB: per-key multiplicities of a candidate shuffle key, reduced
    // to (rows, keys, hottest-key share, discrete p50/p99 multiplicity).
    // Percentiles come from the COUNTS-OF-COUNTS histogram (smallest
    // multiplicity whose cumulative key count reaches the quantile) —
    // exact, and the only corpus-sized shuffle is the first hash-agg;
    // the histogram frame is |distinct multiplicities|, so the
    // unpartitioned cum-sum window is O(that) regardless of key count
    // (same bounded-frame rationale as t24's rank window).
    "q58_skew_profile" -> ((s, dir) => {
      // ONE corpus scan: the tiny histogram is materialized once
      // (localCheckpoint — multi-branch invariant) and totals derive
      // from IT (n_rows = Σ cnt·nk, n_keys = Σ nk), never from a second
      // pass over the key counts
      val hist = events(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("cnt")).agg(count(lit(1)).as("nk"))
        .localCheckpoint(true)
      val tot = hist.agg(
        sum(col("cnt") * col("nk")).as("n_rows"), sum(col("nk")).as("n_keys"),
        max(col("cnt")).as("max_cnt"))
      val cum = hist.withColumn("cum",
        sum(col("nk")).over(Window.orderBy(col("cnt"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      cum.crossJoin(broadcast(tot))
        .groupBy(col("n_rows"), col("n_keys"), col("max_cnt")).agg(
          min(when(col("cum") >= ceil(col("n_keys") * 0.5), col("cnt")))
            .as("p50_cnt"),
          min(when(col("cum") >= ceil(col("n_keys") * 0.99), col("cnt")))
            .as("p99_cnt"))
        .select(col("n_rows"), col("n_keys"), col("max_cnt"),
          round(col("max_cnt").cast("double") / col("n_rows").cast("double"), 6)
            .as("max_share"),
          col("p50_cnt"), col("p99_cnt"))
    }),

    // ---- label-propagation community detection ---------------------------
    // 2 synchronous rounds over the co-order graph; min-label tie-break
    // makes the iteration deterministic and SQL-unrollable (no RNG).
    "q53_labelprop" -> ((s, dir) =>
      graft.ops.Graph.labelPropagation(coEdges(s, dir), iterations = 2,
        edgesMaterialized = true)),

    // ---- ancestor closure via path doubling --------------------------------
    // Full ancestor chains over the deterministic binary-heap forest
    // parent(k) = k div 2: 5 doubling rounds cover depth <= 32 (a 4-billion
    // node tree) where a frontier loop would need one join per level.
    // Output is per-vertex (count, sum) of the ancestor set — compact, and
    // any closure error (missed hop, duplicate pair) breaks one of the two.
    "q57_ancestors" -> ((s, dir) => {
      val parents = part(s, dir).filter(col("p_partkey") >= 2)
        .select(col("p_partkey").as("src"),
          expr("p_partkey div 2").as("dst"))
      graft.ops.Graph.transitiveClosure(parents, rounds = 5)
        .groupBy(col("src").as("vertex"))
        .agg(count(lit(1)).as("n_anc"), sum(col("dst")).as("anc_sum"))
    }),

    // ---- weekly cohort retention --------------------------------------
    // Integer-exact calendar math (epoch-microsecond div), per-user
    // distinct-activity collapse BEFORE the window so the windowed frame
    // is (user, week)-sized, not event-sized.
    "q31_cohort" -> ((s, dir) => {
      val activity = events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 div 7")
            .as("week"))
        .distinct()
      val w = Window.partitionBy(col("user_id"))
      activity.withColumn("cohort_week", min(col("week")).over(w))
        .withColumn("week_offset", col("week") - col("cohort_week"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // ---- fixed-width histogram ------------------------------------------
    // One hash aggregation, bin id from a single IEEE division + floor —
    // deterministic across engines, zero extra shuffle beyond the group.
    "q32_histogram" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"), floor(col("value") / 25).as("bin"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- Pearson correlation from exact integer moments -----------------
    // value quantized to whole units (round-half-up, both engines agree on
    // positives), then all five moments are exact associative long sums;
    // the only floating-point work is the final closed form.
    "q33_corr" -> ((s, dir) => {
      val e = events(s, dir)
        .withColumn("x", round(col("value")).cast("long"))
        .withColumn("y", hour(col("ts")).cast("long"))
      e.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
        .select(col("event_type"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
            6).as("corr_xy"))
    }),

    // ---- per-group z-score outliers (training-data quality gate) --------
    // Two-pass: exact integer moments per group (tiny frame, broadcast
    // back), then a codegen-only map stage — no second shuffle of the
    // corpus. Filter applies to the ROUNDED z so both engines cut
    // identically.
    "t20_zscore" -> ((s, dir) => {
      val d = documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      val stats = d.groupBy("lang").agg(
        count(lit(1)).as("n"), sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      d.join(broadcast(stats), "lang")
        .withColumn("mean", col("sx").cast("double") / col("n").cast("double"))
        .withColumn("z", round(
          (col("n_chars").cast("double") - col("mean"))
            / sqrt(col("sxx").cast("double") / col("n").cast("double")
              - col("mean") * col("mean")), 6))
        .filter(abs(col("z")) > 2)
        .select("doc_id", "lang", "z")
    }),

    // ---- bloom pre-shuffle semi-join ------------------------------------
    // Explicit runtime-filter shape: the big side is pruned by a codegen
    // might_contain BEFORE its shuffle; the trailing exact semi-join only
    // sees survivors, so results equal the plain semi-join.
    "q34_bloom_join" -> ((s, dir) => {
      val keys = part(s, dir).filter(col("p_size") === 25)
        .select(col("p_partkey").as("l_partkey"))
      graft.ops.BloomJoin.semiJoin(
        lineitem(s, dir).select("l_orderkey", "l_partkey", "l_suppkey"),
        keys, "l_partkey", expectedKeys = 1000L)
    }),

    // ---- triangle / wedge census (degree-ordered orientation) ----------
    // Each triangle counted once as an oriented a->b->c path closed by
    // a->c; the (degree, id) orientation bounds forward degree so hub
    // vertices cannot blow up the wedge join.
    "q35_triangles" -> ((s, dir) =>
      graft.ops.Graph.triangleStats(coEdges(s, dir), edgesMaterialized = true)),

    // ---- bounded BFS reachability (iterative frontier + visited set) ----
    // Vertices within <=3 hops of each seed: per round only the NEW
    // frontier joins the edge list (anti-join vs visited), so saturated
    // neighborhoods stop generating work — the canonical iterative graph
    // traversal at scale.
    "q39_reach3" -> ((s, dir) => {
      val seeds = part(s, dir).filter(col("p_size") === 25)
        .select(col("p_partkey").as("vertex"))
      graft.ops.Graph.reachableWithin(coEdges(s, dir), broadcast(seeds), 3,
        edgesMaterialized = true)
    }),

    // ---- entity-graph rank (KG graph-materialize leg) -------------------
    // Co-mention edges between gazetteer entities (distinct mentions
    // sharing a document — the per-doc pair blowup is bounded by mentions
    // per doc), then the same fixed-point PageRank kernel as q30. The
    // trie mention set is deterministic, so the whole entity graph + rank
    // is SQL-oracled end-to-end.
    "kg_entity_rank" -> ((s, dir) => {
      val m = Pipeline.mentions(s, dir).toDF()
        .select(col("doc_id"), col("mention")).distinct()
      val pairs = m.as("x").join(m.as("y"),
          col("x.doc_id") === col("y.doc_id") &&
            col("x.mention") < col("y.mention"))
        .select(col("x.mention").as("a"), col("y.mention").as("b"))
        .distinct()
      graft.ops.Graph.pageRank(graft.ops.Graph.symmetrize(pairs), 5)
        .select(col("vertex").as("mention"), col("pr_int"))
    }),

    // ---- analytic window-function suite ---------------------------------
    // lag/lead/rank/percent_rank/cume_dist/ntile over ONE window spec, so
    // Spark plans a single sort+Window pass per partition key; the unique
    // orderkey tie-break keeps every rank family deterministic.
    "q36_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        rank().over(w).as("rnk"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(4).over(w).as("quartile"))
    }),

    // ---- array aggregation rendered canonically --------------------------
    // Per-group top-3 collected into a SORTED array (canonical order, so
    // the collect is shuffle-order-independent), rendered as JSON for a
    // cross-engine comparable string.
    "q37_collect" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      documents(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy("lang")
        .agg(to_json(sort_array(collect_list(col("doc_id")))).as("top_docs"),
          count(lit(1)).as("n"))
    }),

    // ---- star-schema multi-join ------------------------------------------
    // region -> nation -> customer -> orders -> lineitem revenue rollup.
    // Honest 100 TB shape: the two fact-fact joins (lineitem-orders,
    // orders-customer) are key shuffles (AQE upgrades them to broadcast
    // at small sf); only the true dimensions (nation, region) get a
    // broadcast hint. Filters sit on the fact scans so they push down.
    "q38_star_join" -> ((s, dir) => {
      val r = region(s, dir).filter(col("r_name") === "ASIA")
      val n = nation(s, dir)
      val c = customer(s, dir)
      val o = orders(s, dir).filter(col("o_orderstatus") =!= "F")
      lineitem(s, dir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ---- BM25 ranked keyword retrieval -----------------------------------
    // Search/ranking leg: top-10 docs for a 3-term query. Per-(doc,term)
    // scores quantize to scaled longs BEFORE the per-doc sum, so the
    // aggregate is associative; the top-k plans as TakeOrderedAndProject.
    "q41_bm25" -> ((s, dir) =>
      graft.ops.Bm25.topDocs(documents(s, dir), "doc_id", "text",
        Seq("spark", "merge", "query"))),

    // ---- row-set INTERSECT / EXCEPT ---------------------------------------
    // Set-op coverage the reference lacks entirely: customers ordering in
    // BOTH statuses (INTERSECT) and in 'F' only (EXCEPT), tagged and
    // unioned. Both ops hash-partition on the full row — one shuffle each,
    // no join blowup.
    "q42_setops" -> ((s, dir) => {
      val f = orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val o = orders(s, dir).filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      f.intersect(o).withColumn("side", lit("both"))
        .unionByName(f.except(o).withColumn("side", lit("f_only")))
    }),

    // ---- RANGE-framed sliding window --------------------------------------
    // Trailing-hour rollup per user with a true RANGE frame (value-based,
    // not row-count): one sort+Window pass per user partition; ties on the
    // order key all enter the frame, so the result is order-independent.
    // Values quantize to integer cents so the running sum is exact.
    "q43_range_frame" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600L * 1000000, 0)
      e.select(col("user_id"), col("event_id"),
        sum(col("cents")).over(w).as("roll_cents"),
        count(lit(1)).over(w).as("n_in_hour"))
    }),

    // ---- unpivot (wide -> long, the inverse of q22's pivot) ---------------
    // Dataset.unpivot is a zero-shuffle Expand over the aggregated frame;
    // metric values quantize to integer cents so both engines agree.
    "q45_unpivot" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * 100).cast("long")).as("sum_cents"))
        .unpivot(Array(col("event_type")),
          Array(col("n_rows"), col("sum_cents")), "metric", "value")
    }),

    // ---- date-spine densification (gap-free time series) -------------------
    // Daily event rollup left-joined onto a generated day spine so silent
    // days appear as explicit zero rows. The spine is `sequence` over the
    // global min/max day (O(days) rows from a 1-row agg — never a driver
    // loop), and both join sides are post-aggregation small; the only big
    // shuffle at any scale is the daily rollup itself.
    "q40_date_spine" -> ((s, dir) => {
      val e = events(s, dir)
        .select(to_date(col("ts")).as("d"), col("value"))
      val daily = e.groupBy(col("d"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      val spine = e.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      spine.join(daily, Seq("d"), "left")
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("sum_cents"), lit(0L)).as("sum_cents"))
    }),

    // ---- fill-forward / LOCF gap fill (time-series imputation) ------------
    // Last observed purchase amount carried forward across each user's
    // event stream: last(IGNORE NULLS) over a ROWS running frame — one
    // sort+Window pass per user partition, microsecond ts + event_id
    // tie-break keeps it deterministic. Cents are per-row exact longs.
    "q46_fill_forward" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .filter(col("user_id") % 37 === 0)
        .withColumn("purchase_cents",
          when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")))
        .select(col("event_id"), col("user_id"), col("event_type"),
          coalesce(last(col("purchase_cents"), ignoreNulls = true).over(w),
            lit(-1L)).as("last_purchase_cents"))
    }),

    // ---- full outer join reconciliation ------------------------------------
    // Per-(user, day) purchase revenue vs error counts: both sides aggregate
    // on the join keys first, so their hash partitioning already satisfies
    // the join — Catalyst plans the full outer with NO extra exchange. Rows
    // survive from either side; coalesce makes the null semantics explicit.
    "q47_full_outer" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"),
          col("event_type"), col("value"))
      val p = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("d"))
        .agg(sum(round(col("value") * 100).cast("long")).as("purchase_cents"))
      val er = e.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("d"))
        .agg(count(lit(1)).as("n_errors"))
      p.join(er, Seq("user_id", "d"), "full_outer")
        .select(col("user_id"), date_format(col("d"), "yyyy-MM-dd").as("day"),
          coalesce(col("purchase_cents"), lit(0L)).as("purchase_cents"),
          coalesce(col("n_errors"), lit(0L)).as("n_errors"))
    }),

    // ---- regex term mining (regexp_extract_all + explode + top-k) ---------
    // All ≥4-char lowercase runs across the corpus, counted, global top-10.
    // Extraction+explode is a narrow codegen projection (zero shuffle), the
    // count is one hash agg, and the cut plans as TakeOrderedAndProject
    // (per-partition heaps — no full sort). count desc + word asc makes the
    // boundary deterministic.
    "t21_regex_mine" -> ((s, dir) => {
      documents(s, dir)
        .select(explode(
          expr("regexp_extract_all(lower(text), '[a-z]{4,}', 0)")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(10)
    }),

    // ---- paragraph-level corpus dedup (C4-style line dedup) ---------------
    // Docs split into 8-token segments; each segment kept only at its FIRST
    // corpus-wide occurrence ((doc_id, seg_idx) order — deterministic), and
    // surviving segments reassembled in place. One shuffle on the segment
    // content (the dedup key itself — unavoidable), one back per doc; the
    // reassembly collect is bounded by a single document's length. The
    // result carries a fingerprint of the rewritten text, not the text.
    "t22_para_dedup" -> ((s, dir) => {
      graft.ops.Dedup.paragraphDedup(documents(s, dir), "doc_id", "text", 8)
        .select(col("doc_id"), col("n_kept"), col("n_dropped"),
          md5(col("new_text")).as("fp"))
    }),

    // ---- regex redaction (PII-style masking) -------------------------------
    // Global regexp_replace of entity-like tokens with a placeholder plus a
    // per-doc hit count: a narrow, codegen'd projection — zero shuffle, and
    // the doc_id filter prunes at the scan. Output is a fingerprint of the
    // redacted text so the compare stays compact.
    "t23_redact" -> ((s, dir) => {
      documents(s, dir)
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          size(expr("regexp_extract_all(text, '\\\\b(customer|supplier)\\\\b', 0)"))
            .cast("long").as("n_hits"),
          md5(regexp_replace(col("text"), "\\b(customer|supplier)\\b", "<ENT>"))
            .as("fp"))
    }),

    // ---- sliding-window COUNT DISTINCT (trailing 3-day active users) ------
    // Distinct-over-window isn't a Spark window function; the scalable shape
    // is fanout: collapse to distinct (type, day, user) first, then explode
    // each row to the 3 window-end days it contributes to and hash-aggregate
    // a plain count distinct. Fanout factor = window length (bounded, 3),
    // applied AFTER the distinct collapse — never to the raw event stream.
    "q48_sliding_dau" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
        .distinct()
        .withColumn("w", explode(sequence(col("d"), date_add(col("d"), 2))))
        .groupBy(col("event_type"), col("w"))
        .agg(countDistinct(col("user_id")).as("dau3"))
        .select(col("event_type"),
          date_format(col("w"), "yyyy-MM-dd").as("day"), col("dau3"))
    }),

    // ---- hybrid retrieval: reciprocal-rank fusion (BM25 + dense) ----------
    // Lexical BM25 ranker over documents fused with an embedding-cosine
    // ranker (query = vector 0) via RRF. Each ranker is cut to its top-100
    // by a per-partition heap BEFORE the unpartitioned rank window, so the
    // single-partition stage sees ≤100 rows regardless of corpus size.
    "t24_rrf" -> ((s, dir) => {
      val lex = graft.ops.Bm25.scores(documents(s, dir), "doc_id", "text",
        Seq("spark", "merge", "query"))
      val emb = embeddings(s, dir)
        .select(col("vec_id").as("doc_id"), col("embedding").as("v"))
      val dense = emb
        .crossJoin(broadcast(emb.filter(col("doc_id") === 0)
          .select(col("v").as("qv"))))
        .withColumn("cos",
          graft.functions.Similarity.cosineCol(col("v"), col("qv")))
        .select(col("doc_id"), col("cos"))
      graft.ops.Fusion.rrf(lex, col("score_scaled"), dense, col("cos"),
        "doc_id", perList = 100, k = 60, topK = 50)
    }),

    // ---- bigram language-model estimation ---------------------------------
    // P(w2|w1) corpus-wide: one (w1,w2) hash-agg shuffle; prefix counts
    // re-aggregated from the bigram counts (no second corpus scan); top-k
    // as TakeOrderedAndProject.
    "t25_bigram_lm" -> ((s, dir) =>
      graft.ops.TextAnalysis.bigramLm(documents(s, dir), "text", topK = 20)),

    // ---- PMI collocation mining --------------------------------------------
    // Multi-word-expression detection: PMI over the single corpus bigram
    // aggregate with a min-count floor; marginals re-aggregated from the
    // bigram-count frame, scalar total broadcast.
    "t26_pmi" -> ((s, dir) =>
      graft.ops.TextAnalysis.pmiCollocations(documents(s, dir), "text",
        minCount = 5, topK = 30)),

    // ---- TF-IDF top terms per document -------------------------------------
    // Per-doc keyword extraction; the rank window partitions BY DOC, so
    // the heap work is embarrassingly parallel at any corpus size.
    "t27_tfidf" -> ((s, dir) =>
      graft.ops.TextAnalysis.tfidfTopTerms(documents(s, dir), "doc_id",
        "text", k = 3)),

    // ---- per-doc token entropy ---------------------------------------------
    // Quality feature: token-distribution entropy; per-term quantized
    // longs summed exactly (order-independent across engines).
    "t28_entropy" -> ((s, dir) =>
      graft.ops.TextAnalysis.tokenEntropy(documents(s, dir), "doc_id", "text")),

    // ---- corpus-slice KL divergence ----------------------------------------
    // Domain-shift detection between even/odd doc-id slices: both slice
    // counts from ONE corpus aggregate; smoothed over the joint vocab.
    "t29_kl" -> ((s, dir) =>
      graft.ops.TextAnalysis.klDivergence(documents(s, dir), "doc_id", "text")),

    // ---- DSIR importance weights (target-vs-source LM ratio) ---------------
    // Two-pass data-selection scoring: bigram LMs estimated from the
    // even/odd slices in ONE conditional aggregate, then every doc
    // scored by its quantized log-likelihood-ratio sum.
    "t30_dsir" -> ((s, dir) =>
      graft.ops.TextAnalysis.dsirWeights(documents(s, dir), "doc_id", "text")),

    // ---- perplexity quality filter (CCNet-style) ----------------------------
    // Every doc scored by exp(mean NLL) under the corpus bigram LM with
    // add-one smoothing — high ppl = boilerplate/gibberish candidate.
    "t31_perplexity" -> ((s, dir) =>
      graft.ops.TextAnalysis.perplexity(documents(s, dir), "doc_id", "text")),

    // ---- Markov transition matrix over event sequences ---------------------
    // Sequence mining: per-user next-event via lead() (ONE shuffle on
    // user_id, parallel windows), then a tiny (from,to) aggregate whose
    // row-count is bounded by |event_type|^2. From-totals attach as a
    // window sum over that frame (single consumer — a self-join would
    // re-execute the event window twice; see TextAnalysis.bigramLm).
    // P(to|from) quantized; ties in event ordering broken by event_id
    // so both engines see one sequence.
    "q49_markov" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_from",
          sum(col("n")).over(Window.partitionBy(col("from_type"))))
        .withColumn("p_scaled",
          round(col("n").cast("double") / col("n_from").cast("double")
            * lit(1e6)).cast("long"))
        .select("from_type", "to_type", "n", "p_scaled")
    }),

    // ---- correlated scalar subquery (decorrelation surface) ---------------
    // Each customer's maximal order(s) via a correlated subquery; Catalyst
    // decorrelates it into an aggregate + equi-join (no per-row re-scan).
    // max over doubles is order-independent, so the compare is exact.
    "q44_subquery" -> ((s, dir) => {
      orders(s, dir).createOrReplaceTempView("orders_sq")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
           FROM orders_sq o
           WHERE o_totalprice >= (SELECT max(o2.o_totalprice)
                                  FROM orders_sq o2
                                  WHERE o2.o_custkey = o.o_custkey)""")
    })
  )

  /** Part co-occurrence graph: symmetrized distinct (a, b) part pairs that
    * appear in the same order. Order groups are naturally tiny (≤7 items),
    * so the per-order pair blowup is bounded by construction — the same
    * shape as entity co-mention edges per document.
    */
  private def coEdges(s: SparkSession, dir: String): DataFrame =
    // memoized + checkpointed like the dedup stage hubs: five graph
    // queries (q29/q30/q35/q39/q53) derive from the SAME materialized
    // co-occurrence graph, and each Graph kernel checkpoints its edge
    // input anyway — memoizing the checkpoint means the lineitem
    // self-join + distinct runs once per session instead of once per
    // query (the kernels are told the frame is already materialized).
    memoStage(s, dir, "co_edges") {
      val li = lineitem(s, dir).select(col("l_orderkey").as("ok"),
        col("l_partkey").as("pk"))
      val pairs = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b"))
        .distinct()
      graft.ops.Graph.symmetrize(pairs)
    }

  /** DuckDB CTE block materializing the same co-occurrence graph. */
  private val coEdgeCtes: String =
    """WITH pairs AS (
         SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
         FROM lineitem x JOIN lineitem y
           ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       edges AS (SELECT a AS src, b AS dst FROM pairs
                 UNION ALL SELECT b, a FROM pairs)"""

  /** Unrolled fixed-point PageRank oracle body (k iterations, scale 1e9),
    * mirroring Graph.pageRank's integer arithmetic exactly. Composes onto
    * any prior CTE chain that defines `edges(src, dst)`; the caller
    * appends its own final SELECT over `it<k>`.
    */
  private def pageRankIters(k: Int): String = {
    val prelude =
      """,
       odeg AS (SELECT src AS vertex, count(*) AS outdeg FROM edges GROUP BY 1),
       verts AS (
         SELECT u.vertex, COALESCE(o.outdeg, 0) AS outdeg
         FROM (SELECT DISTINCT vertex FROM (
                 SELECT src AS vertex FROM edges
                 UNION ALL SELECT dst FROM edges)) u
         LEFT JOIN odeg o USING (vertex)),
       params AS (SELECT count(*) AS n FROM verts),
       it0 AS (SELECT vertex, outdeg,
                      CAST(1000000000 AS BIGINT) // (SELECT n FROM params) AS pr
               FROM verts)"""
    val iters = (1 to k).map { i =>
      s""",
       it$i AS (
         SELECT v.vertex, v.outdeg,
                ((15 * CAST(1000000000 AS BIGINT)) // 100)
                  // (SELECT n FROM params)
                + (85 * COALESCE(CAST(s.m AS BIGINT), 0)) // 100 AS pr
         FROM verts v LEFT JOIN (
           SELECT e.dst AS vertex, SUM(p.pr // p.outdeg) AS m
           FROM edges e JOIN it${i - 1} p ON p.vertex = e.src
           GROUP BY 1) s USING (vertex))"""
    }.mkString
    prelude + iters
  }

  // Spark column helper to keep groupBy(...) varargs tidy.
  private def $c(name: String) = col(name)

  /** Shared DuckDB CTE block reproducing the trie NER semantics over the
    * deterministic gazetteer (fixtures/Gazetteer.scala): greedy longest
    * match = bigram matches win at even offsets within runs of
    * consecutive bigram-matching positions (unigram and bigram token
    * vocabularies are disjoint, so those never conflict), plus all
    * unigram hits. Used by the kg_mentions/kg_merged/kg_candidates/
    * kg_notnil oracles.
    */
  private val trieCtes: String =
    """WITH toks AS (
         SELECT doc_id, unnest(t) AS tok, unnest(generate_series(1, len(t))) AS i
         FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
       pats(pat, mention_type, skip) AS (VALUES
         ('spark','ORG',false), ('customer','PER',false),
         ('window','OP',true), ('vector','TYPE',true), ('stream','OP',true),
         ('batch','OP',true), ('query','OP',true), ('filter','OP',true),
         ('group','OP',true),
         ('merge join','ALG',true), ('join merge','ALG',true),
         ('hash join','ALG',true), ('join hash','ALG',true),
         ('sort merge','ALG',true), ('merge sort','ALG',true),
         ('table scan','OP',true), ('scan table','OP',true),
         ('big data','FIELD',true), ('data big','FIELD',true)),
       tokpairs AS (
         SELECT doc_id, i, tok,
                lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
         FROM toks),
       bigm AS (
         SELECT doc_id, i, tok || ' ' || nxt AS big2 FROM tokpairs
         WHERE tok || ' ' || nxt IN (SELECT pat FROM pats WHERE contains(pat, ' '))),
       runs AS (
         SELECT doc_id, i, big2,
                i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
         FROM bigm),
       takes AS (
         SELECT doc_id, i, big2 AS mention FROM (
           SELECT doc_id, i, big2, min(i) OVER (PARTITION BY doc_id, grp) AS g0
           FROM runs)
         WHERE (i - g0) % 2 = 0),
       unis AS (
         SELECT doc_id, i, tok AS mention FROM toks
         WHERE tok IN (SELECT pat FROM pats WHERE NOT contains(pat, ' ')))"""

  /** Merge-stage CTEs on top of [[trieCtes]]: regex survivors (a regex
    * qual-noun bigram dies iff a trie take starts at its noun — under
    * faithful consensus the trie side always wins its anchored group;
    * qual 'big' is excluded, see the kg_merged query note).
    */
  private val mergeCtes: String =
    """,
       trie_pos AS (
         SELECT doc_id, i FROM takes UNION ALL SELECT doc_id, i FROM unis),
       rgx AS (
         SELECT doc_id, i, tok || ' ' || nxt AS mention FROM tokpairs
         WHERE tok IN ('fast','slow','small')
           AND nxt IN ('key','merge','part','scan','sort','value','row',
                       'column','data','line','table','hash','batch',
                       'stream','window','vector','group','query','filter',
                       'order','join','spark','customer')),
       rsurv AS (
         SELECT r.doc_id, r.mention FROM rgx r
         WHERE NOT EXISTS (SELECT 1 FROM trie_pos tp
                           WHERE tp.doc_id = r.doc_id AND tp.i = r.i + 1))"""

  def oracleSql: Map[String, String] = Map(
    "kg_mentions" -> (trieCtes +
      """, all_m AS (SELECT mention FROM takes UNION ALL SELECT mention FROM unis)
         SELECT m.mention, p.mention_type, p.skip, count(*) AS n
         FROM all_m m JOIN pats p ON p.pat = m.mention
         GROUP BY 1, 2, 3"""),
    "kg_merged" -> (trieCtes + mergeCtes +
      """, merged AS (
           SELECT t.mention, p.mention_type, 'trie' AS source
           FROM (SELECT doc_id, mention FROM takes
                 UNION ALL SELECT doc_id, mention FROM unis) t
           JOIN pats p ON p.pat = t.mention
           UNION ALL
           SELECT mention, 'PRODUCT', 'regex' FROM rsurv)
         SELECT mention, mention_type, source, count(*) AS n
         FROM merged GROUP BY 1, 2, 3"""),
    "kg_candidates" -> (trieCtes + mergeCtes +
      """, linkable AS (
           SELECT doc_id, mention FROM unis WHERE mention IN ('spark','customer')
           UNION ALL SELECT doc_id, mention FROM rsurv),
         tok2ent(tok, entity_id) AS (VALUES
           ('spark',1),('spark',2),('customer',3),('customer',4),
           ('merge',5),('merge',7),('join',5),('join',6),('hash',6),
           ('sort',7),('table',8),('scan',8),('window',9),('vector',10),
           ('stream',11),('batch',12),('big',13),('data',13),('query',14),
           ('filter',15),('group',16)),
         mtoks AS (
           SELECT DISTINCT doc_id, mention,
                  unnest(string_split(mention, ' ')) AS tok
           FROM linkable)
         SELECT DISTINCT doc_id, mention, CAST(entity_id AS BIGINT) AS entity_id
         FROM mtoks JOIN tok2ent USING (tok)"""),
    "kg_linked" -> (trieCtes +
      """, pat2id(pat, id) AS (VALUES
           ('merge join',5),('join merge',5),('hash join',6),('join hash',6),
           ('sort merge',7),('merge sort',7),('table scan',8),('scan table',8),
           ('big data',13),('data big',13),('window',9),('vector',10),
           ('stream',11),('batch',12),('query',14),('filter',15),('group',16)),
         skipm AS (
           SELECT t.doc_id, t.mention, p.id
           FROM (SELECT doc_id, mention FROM takes
                 UNION ALL SELECT doc_id, mention FROM unis) t
           JOIN pat2id p ON p.pat = t.mention)
         SELECT doc_id, mention, CAST(id AS BIGINT) AS entity_id,
                'TRIE' || CAST(id AS VARCHAR) AS url, count(*) AS n
         FROM skipm GROUP BY 1, 2, 3, 4"""),
    "kg_triples" -> (trieCtes +
      """, reg(id, title, type_) AS (VALUES
           (1,'spark','ORG'),(3,'customer','PER'),
           (5,'merge join','ALG'),(6,'hash join','ALG'),(7,'sort merge','ALG'),
           (8,'table scan','OP'),(9,'window','OP'),(10,'vector','TYPE'),
           (11,'stream','OP'),(12,'batch','OP'),(13,'big data','FIELD'),
           (14,'query','OP'),(15,'filter','OP'),(16,'group','OP')),
         pat2id(pat, id) AS (VALUES
           ('merge join',5),('join merge',5),('hash join',6),('join hash',6),
           ('sort merge',7),('merge sort',7),('table scan',8),('scan table',8),
           ('big data',13),('data big',13),('window',9),('vector',10),
           ('stream',11),('batch',12),('query',14),('filter',15),('group',16)),
         skipm AS (
           SELECT t.doc_id, p.id
           FROM (SELECT doc_id, mention FROM takes
                 UNION ALL SELECT doc_id, mention FROM unis) t
           JOIN pat2id p ON p.pat = t.mention),
         linkm AS (
           SELECT doc_id, CASE mention WHEN 'spark' THEN 1 ELSE 3 END AS id
           FROM unis WHERE mention IN ('spark','customer')),
         names AS (
           SELECT e.doc_id, r.title, r.type_
           FROM (SELECT doc_id, id FROM skipm
                 UNION ALL SELECT doc_id, id FROM linkm) e
           JOIN reg r USING (id)),
         media AS (
           SELECT doc_id, 'media://img/' || doc_id AS mref
           FROM documents WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id, 'media://vid/' || doc_id
           FROM documents WHERE doc_id % 5 = 0)
         SELECT DISTINCT doc_id, 'doc:' || doc_id AS subj,
                ':mentions' AS pred, 'ent:' || title AS obj
         FROM names
         UNION ALL
         SELECT DISTINCT doc_id, 'ent:' || title, ':typedAs', type_
         FROM names
         UNION ALL
         SELECT doc_id, 'doc:' || doc_id, ':hasMedia', mref FROM media"""),
    "kg_notnil" -> (trieCtes +
      """, reg(id, title, type_) AS (VALUES
           (5,'merge join','ALG'),(6,'hash join','ALG'),(7,'sort merge','ALG'),
           (8,'table scan','OP'),(9,'window','OP'),(10,'vector','TYPE'),
           (11,'stream','OP'),(12,'batch','OP'),(13,'big data','FIELD'),
           (14,'query','OP'),(15,'filter','OP'),(16,'group','OP')),
         pat2id(pat, id) AS (VALUES
           ('merge join',5),('join merge',5),('hash join',6),('join hash',6),
           ('sort merge',7),('merge sort',7),('table scan',8),('scan table',8),
           ('big data',13),('data big',13),('window',9),('vector',10),
           ('stream',11),('batch',12),('query',14),('filter',15),('group',16)),
         skipm AS (
           SELECT t.doc_id, p.id
           FROM (SELECT doc_id, mention FROM takes
                 UNION ALL SELECT doc_id, mention FROM unis) t
           JOIN pat2id p ON p.pat = t.mention)
         SELECT 'TRIE' || CAST(id AS VARCHAR) AS url, r.title,
                r.type_ AS cluster_type, count(*) AS nelements
         FROM skipm JOIN reg r USING (id)
         GROUP BY 1, 2, 3"""),
    "kg_media_features" ->
      """WITH m AS (
           SELECT doc_id, 'media://img/' || doc_id AS media_ref,
                  'image' AS media_kind
           FROM documents WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id, 'media://vid/' || doc_id, 'video'
           FROM documents WHERE doc_id % 5 = 0),
         n AS (
           SELECT doc_id, media_ref, media_kind,
                  list_reduce([CAST(ascii(substring(CAST(doc_id AS VARCHAR),
                                CAST(i AS INT), 1)) AS BIGINT)
                               for i in generate_series(1, length(CAST(doc_id AS VARCHAR)))],
                              (a, c) -> a * 31 + c) AS nv
           FROM m)
         SELECT doc_id, media_ref, media_kind,
                CAST(640 + (nv*37) % 1280 AS INT) AS width,
                CAST(360 + (nv*73) % 720 AS INT) AS height,
                CAST(CASE WHEN media_kind = 'video' THEN 24 + nv % 1000 ELSE 1 END AS INT) AS n_frames,
                CAST((640 + (nv*37) % 1280) * (360 + (nv*73) % 720) * 3 *
                     (CASE WHEN media_kind = 'video' THEN 24 + nv % 1000 ELSE 1 END) AS BIGINT) AS bytes_len
         FROM n""",
    "kg_media_resized" ->
      """WITH m AS (
           SELECT doc_id, 'media://img/' || doc_id AS media_ref,
                  'image' AS media_kind
           FROM documents WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id, 'media://vid/' || doc_id, 'video'
           FROM documents WHERE doc_id % 5 = 0),
         n AS (
           SELECT doc_id, media_ref, media_kind,
                  list_reduce([CAST(ascii(substring(CAST(doc_id AS VARCHAR),
                                CAST(i AS INT), 1)) AS BIGINT)
                               for i in generate_series(1, length(CAST(doc_id AS VARCHAR)))],
                              (a, c) -> a * 31 + c) AS nv
           FROM m),
         f AS (
           SELECT doc_id, media_ref,
                  CAST(640 + (nv*37) % 1280 AS INT) AS width,
                  CAST(360 + (nv*73) % 720 AS INT) AS height,
                  CAST(CASE WHEN media_kind = 'video' THEN 24 + nv % 1000 ELSE 1 END AS INT) AS n_frames
           FROM n),
         r AS (
           SELECT doc_id, media_ref, n_frames,
                  CAST(CASE WHEN width >= height THEN 256
                            ELSE (width * 256) // height END AS INT) AS out_width,
                  CAST(CASE WHEN width >= height THEN (height * 256) // width
                            ELSE 256 END AS INT) AS out_height
           FROM f)
         SELECT doc_id, media_ref, out_width, out_height,
                CAST(out_width AS BIGINT) * out_height * 3 * n_frames AS out_bytes
         FROM r""",
    "kg_media_frames" ->
      """WITH m AS (
           SELECT doc_id, 'media://img/' || doc_id AS media_ref,
                  'image' AS media_kind
           FROM documents WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id, 'media://vid/' || doc_id, 'video'
           FROM documents WHERE doc_id % 5 = 0),
         n AS (
           SELECT doc_id, media_ref, media_kind,
                  list_reduce([CAST(ascii(substring(CAST(doc_id AS VARCHAR),
                                CAST(i AS INT), 1)) AS BIGINT)
                               for i in generate_series(1, length(CAST(doc_id AS VARCHAR)))],
                              (a, c) -> a * 31 + c) AS nv
           FROM m),
         f AS (
           SELECT doc_id, media_ref,
                  CAST(CASE WHEN media_kind = 'video' THEN 24 + nv % 1000 ELSE 1 END AS INT) AS n_frames
           FROM n)
         SELECT doc_id, media_ref,
                CAST(unnest(generate_series(0, n_frames - 1, 10)) AS INT) AS frame_idx
         FROM f""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q2_topk_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
           FROM orders) WHERE rnk <= 3""",
    "q3_join_agg" ->
      """SELECT n_name,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q4_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "q5_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')""",
    "q6_sessionize" ->
      """SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
           SELECT user_id,
                  CASE WHEN date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) > 1800
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       THEN 1 ELSE 0 END AS brk
           FROM events) GROUP BY user_id""",
    "q7_union_distinct" ->
      """SELECT DISTINCT tag FROM (
           SELECT l_returnflag AS tag FROM lineitem
           UNION ALL
           SELECT l_linestatus AS tag FROM lineitem)""",
    "q8_pagination" ->
      """SELECT doc_id, lang, substring(text, 1, 40) AS preview
         FROM documents WHERE regexp_matches(text, 'join.*merge')
         ORDER BY doc_id OFFSET 5 LIMIT 20""",
    "q9_mode" ->
      """SELECT lang, source AS top_source, cnt FROM (
           SELECT lang, source, count(*) AS cnt,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY count(*) DESC, source ASC) AS rn
           FROM documents GROUP BY lang, source) WHERE rn = 1""",
    "q10_stats" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(*) AS mean_value,
         round(quantile_cont(value, 0.5), 6) AS median_value
         FROM events GROUP BY event_type""",
    "q11_substr_ctx" ->
      """SELECT doc_id, strpos(text, 'customer') AS pos,
              substring(text, greatest(strpos(text, 'customer') - 10, 1), 10) AS ctx_left,
              substring(text, strpos(text, 'customer'), 8) AS mention,
              substring(text, strpos(text, 'customer') + 8, 10) AS ctx_right
         FROM documents WHERE strpos(text, 'customer') > 0""",
    "t1_exact_dedup" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id, count(*) AS n_dups
         FROM documents GROUP BY md5(text)""",
    "q12_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
              event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q13_interval_overlap" ->
      """SELECT o_custkey, CAST(sum(brk) AS BIGINT) AS n_groups, count(*) AS n_orders
         FROM (
           SELECT o_custkey,
                  CASE WHEN max_prev IS NULL OR start_s >= max_prev THEN 1 ELSE 0 END AS brk
           FROM (
             SELECT o_custkey,
                    epoch(o_orderdate) AS start_s,
                    max(epoch(o_orderdate) + 604800)
                      OVER (PARTITION BY o_custkey
                            ORDER BY epoch(o_orderdate), epoch(o_orderdate) + 604800, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev
             FROM orders))
         GROUP BY o_custkey""",
    "q14_distinct_agg" ->
      """SELECT lang, count(DISTINCT source) AS n_sources, count(*) AS n_docs
         FROM documents GROUP BY lang""",
    "q15_fuzzy" ->
      """SELECT n1.n_name AS a, n2.n_name AS b, levenshtein(n1.n_name, n2.n_name) AS dist
         FROM nation n1, nation n2
         WHERE n1.n_name < n2.n_name AND levenshtein(n1.n_name, n2.n_name) <= 2""",
    "kg_spans" ->
      """WITH sp AS (
           SELECT doc_id, text, length(text) AS len,
                  CASE WHEN strpos(substr(text, length(text)//2 + 1), ' ') = 0 THEN length(text)
                       ELSE length(text)//2 + strpos(substr(text, length(text)//2 + 1), ' ') END AS split_at
           FROM documents)
         SELECT doc_id, CAST(0 AS BIGINT) AS span_idx, 'text' AS kind,
                substr(text, 1, split_at) AS text, '' AS media_ref, CAST(0 AS BIGINT) AS "offset"
         FROM sp
         UNION ALL
         SELECT doc_id, 1, 'media', '', 'media://img/' || doc_id, split_at
         FROM sp WHERE doc_id % 3 = 0
         UNION ALL
         SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END, 'text',
                substr(text, split_at + 1), '', split_at
         FROM sp WHERE split_at < len
         UNION ALL
         SELECT doc_id,
                (CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END +
                 CASE WHEN split_at < len THEN 1 ELSE 0 END),
                'media', '', 'media://vid/' || doc_id, len
         FROM sp WHERE doc_id % 5 = 0""",
    "kg_sections" ->
      """SELECT doc_id, section, count(*) AS n_tokens FROM (
           SELECT doc_id,
                  coalesce(last_value(marker IGNORE NULLS)
                    OVER (PARTITION BY doc_id ORDER BY ord
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    'PREAMBLE') AS section
           FROM (
             SELECT doc_id,
                    CASE WHEN tok IN ('window','stream','batch') THEN tok END AS marker,
                    ord
             FROM (SELECT doc_id, unnest(t) AS tok,
                          unnest(generate_series(1, len(t))) AS ord
                   FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))))
         GROUP BY doc_id, section""",
    "kg_section_spans" ->
      """WITH t AS (
           SELECT doc_id,
                  replace(text, ' window ', chr(10) || 'P.Q.M.' || chr(10)) AS t2
           FROM documents),
         p AS (
           SELECT doc_id, t2,
                  strpos(t2, chr(10) || 'P.Q.M.' || chr(10)) AS pos
           FROM t)
         SELECT doc_id, 'preambolo' AS section, CAST(0 AS INT) AS "start",
                CAST(CASE WHEN pos > 0 THEN pos ELSE length(t2) - 1 END AS INT) AS "end"
         FROM p
         UNION ALL
         SELECT doc_id, 'dispositivo', CAST(pos AS INT), CAST(length(t2) - 1 AS INT)
         FROM p WHERE pos > 0""",
    "kg_media" ->
      """SELECT doc_id, 'media://img/' || doc_id AS media_ref, 'image' AS media_kind
         FROM documents WHERE doc_id % 3 = 0
         UNION ALL
         SELECT doc_id, 'media://vid/' || doc_id, 'video'
         FROM documents WHERE doc_id % 5 = 0""",
    "t2_tokstats" ->
      """SELECT lang,
              CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_tokens,
              CAST(max(len(string_split_regex(text, '\s+'))) AS BIGINT) AS max_tokens,
              CAST(min(len(string_split_regex(text, '\s+'))) AS BIGINT) AS min_tokens
         FROM documents GROUP BY lang""",
    "t3_quality" ->
      """SELECT doc_id,
              CAST(len(t) AS INT) AS n_tokens,
              CAST(len(list_distinct(t)) AS INT) AS n_distinct_tokens,
              round(1.0 - len(list_distinct(t)) * 1.0 / greatest(len(t), 1), 6) AS dup_token_ratio,
              round(len(list_filter(t, x -> x IN ('the','a','of','and'))) * 1.0 / greatest(len(t), 1), 6) AS stopword_ratio
         FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)""",
    "t4_langid" ->
      """SELECT lang, pred_lang, count(*) AS n FROM (
           SELECT lang,
                  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
                       WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
                       WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                       WHEN s_fr > 0 THEN 'fr'
                       ELSE 'und' END AS pred_lang
           FROM (
             SELECT lang,
                    len(list_filter(t, x -> x IN ('der','die','und','das'))) * 1.0 / greatest(len(t),1) AS s_de,
                    len(list_filter(t, x -> x IN ('the','and','of','to'))) * 1.0 / greatest(len(t),1) AS s_en,
                    len(list_filter(t, x -> x IN ('el','la','de','que'))) * 1.0 / greatest(len(t),1) AS s_es,
                    len(list_filter(t, x -> x IN ('le','la','et','les'))) * 1.0 / greatest(len(t),1) AS s_fr
             FROM (SELECT lang, string_split_regex(lower(text), '\s+') AS t FROM documents)))
         GROUP BY lang, pred_lang""",
    // pure exact Jaccard over FULL shingle sets: the prefix-filtered
    // Spark plan is lossless, so the oracle needs no candidate pruning
    // mirror at all (the old df<=1000 cap redefined the metric; gone)
    "t6_ngram_neardup" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, unnest([array_to_string(t[i:i+2], ' ')
                  for i in generate_series(1, len(t)-2)]) AS shingle
           FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)),
         sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         shared AS (
           SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
           FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id
           GROUP BY 1, 2)
         SELECT a, b, shared * 1.0 / (sa.nsh + sb.nsh - shared) AS jaccard
         FROM shared JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         WHERE shared * 1.0 / (sa.nsh + sb.nsh - shared) >= 0.8""",
    "t7_minhash_lsh" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, unnest([array_to_string(t[i:i+2], ' ')
                  for i in generate_series(1, len(t)-2)]) AS shingle
           FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)),
         sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         shared AS (
           SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
           FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id
           GROUP BY 1, 2)
         SELECT a, b, shared * 1.0 / (sa.nsh + sb.nsh - shared) AS jaccard
         FROM shared JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         WHERE shared * 1.0 / (sa.nsh + sb.nsh - shared) >= 0.8""",
    "t32_incr_dedup" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, unnest([array_to_string(t[i:i+2], ' ')
                  for i in generate_series(1, len(t)-2)]) AS shingle
           FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)),
         sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         shared AS (
           SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
           FROM sh x JOIN sh y USING (shingle)
           WHERE x.doc_id % 2 <> 0 AND y.doc_id % 2 = 0
           GROUP BY 1, 2)
         SELECT a, b, shared * 1.0 / (sa.nsh + sb.nsh - shared) AS jaccard
         FROM shared JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         WHERE shared * 1.0 / (sa.nsh + sb.nsh - shared) >= 0.8""",
    // Simhash bit i of a shingle = bit (i%4) of md5-hex-nibble i/4 —
    // md5 is bit-identical in Spark and DuckDB, so the oracle recomputes
    // the full simhash. Brute-force all-pairs here IS the oracle for the
    // chunk-blocked Spark plan: 16-bit-chunk pigeonhole has exact recall
    // at hamming<=3, so the row sets must match exactly.
    "t8_simhash" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, unnest([array_to_string(t[i:i+2], ' ')
                  for i in generate_series(1, len(t)-2)]) AS shingle
           FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)),
         acc AS (
           SELECT doc_id, i,
                  SUM(CASE WHEN (((strpos('0123456789abcdef',
                                          substr(md5(shingle), (i // 4) + 1, 1)) - 1)
                                  >> (i % 4)) & 1) = 1
                           THEN 1 ELSE -1 END) AS s
           FROM sh, range(0, 64) r(i) GROUP BY 1, 2),
         bits AS (SELECT doc_id, i, CASE WHEN s > 0 THEN 1 ELSE 0 END AS bit FROM acc)
         SELECT x.doc_id AS a, y.doc_id AS b,
                CAST(SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS INT) AS hamming
         FROM bits x JOIN bits y ON x.i = y.i AND x.doc_id < y.doc_id
         GROUP BY 1, 2
         HAVING SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) <= 3""",
    // transitive closure of the exact-Jaccard pair graph (the LSH+verify
    // pair set equals the exact set at threshold 0.8 — t7's own oracle),
    // canonical = min reachable id; checks the Spark CC end-to-end
    "t10_dedup_canon" ->
      """WITH RECURSIVE sh AS (
           SELECT DISTINCT doc_id, unnest([array_to_string(t[i:i+2], ' ')
                  for i in generate_series(1, len(t)-2)]) AS shingle
           FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)),
         sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         shared AS (
           SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
           FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a, b FROM shared
           JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
           WHERE shared * 1.0 / (sa.nsh + sb.nsh - shared) >= 0.8),
         edges AS (SELECT a AS src, b AS dst FROM pairs
                   UNION SELECT b, a FROM pairs),
         reach(id, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.id)
         SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id""",
    // same closure as t10, then the keep-best policy: per component the
    // max-n_chars member (ties -> min doc_id) and the member count
    "t39_best_rep" ->
      """WITH RECURSIVE sh AS (
           SELECT DISTINCT doc_id, unnest([array_to_string(t[i:i+2], ' ')
                  for i in generate_series(1, len(t)-2)]) AS shingle
           FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)),
         sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         shared AS (
           SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
           FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a, b FROM shared
           JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
           WHERE shared * 1.0 / (sa.nsh + sb.nsh - shared) >= 0.8),
         edges AS (SELECT a AS src, b AS dst FROM pairs
                   UNION SELECT b, a FROM pairs),
         reach(id, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.id),
         canon AS (SELECT id AS doc_id, min(r) AS canonical_id
                   FROM reach GROUP BY id),
         m AS (
           SELECT c.canonical_id, c.doc_id, d.n_chars,
                  row_number() OVER (PARTITION BY c.canonical_id
                    ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn,
                  count(*) OVER (PARTITION BY c.canonical_id) AS n_members
           FROM canon c JOIN documents d USING (doc_id))
         SELECT canonical_id, doc_id AS rep_doc_id,
                n_chars AS rep_quality, n_members
         FROM m WHERE rn = 1""",
    "t9_embed_neardup" ->
      """WITH b AS (
           SELECT vec_id, band,
                  (CASE WHEN embedding[band*4+1] >= 0 THEN 1 ELSE 0 END
                 + 2*(CASE WHEN embedding[band*4+2] >= 0 THEN 1 ELSE 0 END)
                 + 4*(CASE WHEN embedding[band*4+3] >= 0 THEN 1 ELSE 0 END)
                 + 8*(CASE WHEN embedding[band*4+4] >= 0 THEN 1 ELSE 0 END)) AS bucket
           FROM embeddings, (SELECT unnest(generate_series(0, 3)) AS band)),
         cand AS (
           SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
           FROM b x JOIN b y USING (band, bucket)
           WHERE x.vec_id < y.vec_id)
         SELECT a, b FROM cand
         JOIN embeddings va ON va.vec_id = cand.a
         JOIN embeddings vb ON vb.vec_id = cand.b
         WHERE list_cosine_similarity(va.embedding, vb.embedding) >= 0.4""",
    "e2_ann_lsh" ->
      """WITH b AS (
           SELECT vec_id, embedding,
                  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
                 + 2*(CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END)
                 + 4*(CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END)
                 + 8*(CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END)
                 + 16*(CASE WHEN embedding[5] >= 0 THEN 1 ELSE 0 END)
                 + 32*(CASE WHEN embedding[6] >= 0 THEN 1 ELSE 0 END)
                 + 64*(CASE WHEN embedding[7] >= 0 THEN 1 ELSE 0 END)
                 + 128*(CASE WHEN embedding[8] >= 0 THEN 1 ELSE 0 END)) AS bucket
           FROM embeddings)
         SELECT query_id, neighbor_id, rnk FROM (
           SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id,
                  row_number() OVER (PARTITION BY x.vec_id
                    ORDER BY list_cosine_similarity(x.embedding, y.embedding) DESC,
                             y.vec_id ASC) AS rnk
           FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id)
         WHERE rnk <= 3""",
    "t5_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(
                string_split_regex(text, '\s+'))), ' ')) AS fp,
              min(doc_id) AS keep_doc_id, count(*) AS n_dups
         FROM documents GROUP BY 1""",
    "e1_ann_topk" ->
      """SELECT query_id, neighbor_id, rnk FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  row_number() OVER (PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                             c.vec_id ASC) AS rnk
           FROM embeddings q, embeddings c
           WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
         WHERE rnk <= 5""",
    "e4_ann_ivf" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv
                    FROM embeddings ORDER BY vec_id LIMIT 16),
         a0 AS (SELECT e.vec_id, e.embedding, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(e.embedding, c.cv) DESC,
                             c.cid ASC) AS rn
                FROM embeddings e CROSS JOIN c),
         assign AS (SELECT vec_id, embedding, cid FROM a0 WHERE rn = 1),
         p0 AS (SELECT q.vec_id AS query_id, q.embedding AS qv, c.cid,
                  row_number() OVER (PARTITION BY q.vec_id
                    ORDER BY list_cosine_similarity(q.embedding, c.cv) DESC,
                             c.cid ASC) AS rn
                FROM embeddings q CROSS JOIN c WHERE q.vec_id < 10),
         probe AS (SELECT query_id, qv, cid FROM p0 WHERE rn <= 3)
         SELECT query_id, neighbor_id, rnk FROM (
           SELECT p.query_id, s.vec_id AS neighbor_id,
                  row_number() OVER (PARTITION BY p.query_id
                    ORDER BY list_cosine_similarity(p.qv, s.embedding) DESC,
                             s.vec_id ASC) AS rnk
           FROM probe p JOIN assign s
             ON s.cid = p.cid AND s.vec_id <> p.query_id)
         WHERE rnk <= 5""",
    "e3_centroids" ->
      """SELECT label, dim,
              CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
                / (count(*) * 1000000.0) AS mean_v
         FROM (SELECT label, unnest(embedding) AS v,
                      unnest(generate_series(0, len(embedding) - 1)) AS dim
               FROM embeddings)
         GROUP BY label, dim""",
    "q51_rfm" ->
      """WITH bc AS (SELECT o_custkey,
                            max(epoch_us(o_orderdate)) AS last_us,
                            count(*) AS freq,
                            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                                 AS BIGINT) AS cents
                     FROM orders GROUP BY 1),
         b AS (SELECT quantile_cont(last_us, [0.25, 0.5, 0.75]) AS qr,
                      quantile_cont(freq, [0.25, 0.5, 0.75]) AS qf,
                      quantile_cont(cents, [0.25, 0.5, 0.75]) AS qm
               FROM bc)
         SELECT r, f, m, count(*) AS n_customers FROM (
           SELECT 1 + CAST(last_us > qr[1] AS INTEGER)
                    + CAST(last_us > qr[2] AS INTEGER)
                    + CAST(last_us > qr[3] AS INTEGER) AS r,
                  1 + CAST(freq > qf[1] AS INTEGER)
                    + CAST(freq > qf[2] AS INTEGER)
                    + CAST(freq > qf[3] AS INTEGER) AS f,
                  1 + CAST(cents > qm[1] AS INTEGER)
                    + CAST(cents > qm[2] AS INTEGER)
                    + CAST(cents > qm[3] AS INTEGER) AS m
           FROM bc CROSS JOIN b)
         GROUP BY 1, 2, 3""",
    "q52_benford" ->
      """WITH dd AS (SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                   AS VARCHAR), 1, 1) AS d
                     FROM orders),
         c AS (SELECT d, count(*) AS n FROM dd GROUP BY 1)
         SELECT d, n, CAST(round(n * 1000000.0 / sum(n) OVER ()) AS BIGINT)
                  AS share_ppm
         FROM c""",
    "q50_paths" ->
      """WITH r AS (SELECT user_id, event_type,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY ts ASC, event_id ASC) AS rn
                    FROM events),
         p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
               FROM r WHERE rn <= 3 GROUP BY user_id)
         SELECT path, count(*) AS n_users FROM p
         GROUP BY path ORDER BY n_users DESC, path ASC LIMIT 10""",
    "e5_kmeans_step" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv
                    FROM embeddings ORDER BY vec_id LIMIT 16),
         a0 AS (SELECT e.vec_id, e.embedding, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY list_cosine_similarity(e.embedding, c.cv) DESC,
                             c.cid ASC) AS rn
                FROM embeddings e CROSS JOIN c),
         assign AS (SELECT cid, embedding FROM a0 WHERE rn = 1)
         SELECT cid, dim, count(*) AS n,
                CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
                     AS DOUBLE) / (count(*) * 1000000.0) AS c_v
         FROM (SELECT cid, unnest(embedding) AS v,
                      unnest(generate_series(0, len(embedding) - 1)) AS dim
               FROM assign)
         GROUP BY cid, dim""",
    "q16_asof" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT max(event_id) AS click_id, user_id, ts AS c_ts
                    FROM events WHERE event_type = 'click'
                    GROUP BY user_id, ts)
         SELECT p.purchase_id, p.user_id, epoch_us(p.p_ts) AS p_us,
                c.click_id,
                epoch_us(p.p_ts) - epoch_us(c.c_ts) AS gap_us
         FROM p ASOF JOIN c
           ON p.user_id = c.user_id AND p.p_ts >= c.c_ts""",
    "q17_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
                count(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "t11_splits" ->
      """SELECT lang,
                CASE WHEN substr(md5(text), 1, 4) < 'cccc' THEN 0
                     WHEN substr(md5(text), 1, 4) < 'e666' THEN 1
                     ELSE 2 END AS split,
                count(*) AS n_docs, min(doc_id) AS min_doc_id
         FROM documents GROUP BY 1, 2""",
    "q18_range_join" ->
      """WITH w AS (SELECT o_orderkey AS window_id,
                           epoch_us(o_orderdate) AS lo_us,
                           epoch_us(o_orderdate) + 604800000000 AS hi_us
                    FROM orders WHERE o_orderkey % 100 = 0)
         SELECT w.window_id, count(*) AS n_ship,
                CAST(sum(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
         FROM w JOIN lineitem l
           ON epoch_us(l.l_shipdate) BETWEEN w.lo_us AND w.hi_us
         GROUP BY w.window_id""",
    "q19_interval_join" ->
      """WITH w AS (SELECT o_orderkey AS id, epoch_us(o_orderdate) AS lo,
                           epoch_us(o_orderdate) + 604800000000 AS hi
                    FROM orders WHERE o_orderkey % 100 = 0)
         SELECT a.id AS w1_id, b.id AS w2_id,
                least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_us
         FROM w a JOIN w b
           ON a.lo <= b.hi AND b.lo <= a.hi AND a.id < b.id""",
    "q20_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
                count(*) AS n_rows
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "q21_median" ->
      """SELECT l_returnflag,
                CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS p25,
                CAST(quantile_cont(l_quantity, 0.5)  AS DOUBLE) AS p50,
                CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS p75,
                count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "q22_pivot" ->
      """SELECT l_returnflag,
                CAST(sum(CASE WHEN l_linestatus = 'F'
                              THEN CAST(l_quantity AS DECIMAL(30,6)) END) AS DOUBLE) AS qty_f,
                CAST(sum(CASE WHEN l_linestatus = 'O'
                              THEN CAST(l_quantity AS DECIMAL(30,6)) END) AS DOUBLE) AS qty_o
         FROM lineitem GROUP BY l_returnflag""",
    "t12_pack" ->
      """WITH d AS (SELECT doc_id, lang, length(text) AS n_chars FROM documents),
              p AS (SELECT doc_id, lang, n_chars,
                           sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                             - n_chars AS bin_offset
                    FROM d)
         SELECT lang, CAST(floor(bin_offset / 4096.0) AS BIGINT) AS bin_id,
                count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS bin_chars,
                min(doc_id) AS first_doc
         FROM p GROUP BY 1, 2""",
    "t13_chunk" ->
      """SELECT doc_id, CAST(s / 150 AS BIGINT) AS chunk_idx,
                CAST(s AS BIGINT) AS chunk_start,
                CAST(length(substr(text, s + 1, 200)) AS BIGINT) AS chunk_len,
                substr(text, s + 1, 16) AS head
         FROM (SELECT doc_id, text,
                      unnest(generate_series(0, greatest(length(text) - 1, 0), 150)) AS s
               FROM documents)""",
    "q23_skew_join" ->
      """SELECT p.p_brand,
                count(*) AS n_rows,
                CAST(sum(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY p.p_brand""",
    "t14_stratified" ->
      """SELECT lang, count(*) AS n_docs, min(doc_id) AS min_doc_id
         FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
               CASE lang WHEN 'en' THEN '8000'
                         WHEN 'zh' THEN '4000'
                         ELSE '2000' END
         GROUP BY lang""",
    "q24_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
                count(*) AS n_rows
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))""",
    "t15_group_sample" ->
      """SELECT lang, doc_id, rn FROM (
           SELECT lang, doc_id,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents)
         WHERE rn <= 20""",
    "q25_event_windows" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws,
                event_type,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY 1, 2""",
    "t16_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              b AS (SELECT doc_id,
                           list_transform(range(1, len(ws)),
                             i -> array_to_string(ws[i:i+1], ' ')) AS bg,
                           list_transform(range(1, len(ws) - 1),
                             i -> array_to_string(ws[i:i+2], ' ')) AS tg
                    FROM w)
         SELECT doc_id,
                len(bg) AS n_bigrams,
                len(list_distinct(bg)) AS n_distinct_bigrams,
                len(tg) AS n_trigrams,
                len(list_distinct(tg)) AS n_distinct_trigrams,
                (len(bg) - len(list_distinct(bg))) * 10 > len(bg) AS rep_flagged
         FROM b""",
    "t17_decontam" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              g AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS ng
                    FROM w, unnest(range(1, len(ws) - 3)) t(i)),
              probe AS (SELECT DISTINCT ng FROM g WHERE doc_id % 5 = 0),
              corpus AS (SELECT DISTINCT doc_id, ng FROM g WHERE doc_id % 5 <> 0)
         SELECT c.doc_id, count(*) AS n_contaminated_ngrams
         FROM corpus c JOIN probe p USING (ng)
         GROUP BY 1""",
    "t33_curation_report" ->
      """WITH corpus AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
         q AS (SELECT doc_id, source,
                      len(string_split(text, ' ')) AS n_tokens,
                      len(list_distinct(string_split(text, ' '))) AS n_distinct
               FROM corpus),
         flags AS (SELECT doc_id, source,
                     (n_tokens < 5 OR (1.0 - CAST(n_distinct AS DOUBLE)
                        / CAST(n_tokens AS DOUBLE)) > 0.6) AS bad_quality
                   FROM q),
         sh AS (SELECT DISTINCT doc_id,
                       unnest([array_to_string(t[i:i+2], ' ')
                               for i in generate_series(1, len(t)-2)]) AS shingle
                FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t
                      FROM corpus)),
         sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         shared AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
                    FROM sh x JOIN sh y USING (shingle)
                    WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
         dup AS (SELECT DISTINCT greatest(a, b) AS doc_id
                 FROM shared
                 JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
                 WHERE shared * 1.0 / (sa.nsh + sb.nsh - shared) >= 0.8),
         w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS ng
               FROM w, unnest(range(1, len(ws) - 3)) t(i)),
         probe AS (SELECT DISTINCT ng FROM g WHERE doc_id % 5 = 0),
         contam AS (SELECT DISTINCT doc_id
                    FROM (SELECT DISTINCT doc_id, ng FROM g
                          WHERE doc_id % 5 <> 0) c
                    JOIN probe USING (ng))
         SELECT f.source, count(*) AS n_docs,
                CAST(sum(CASE WHEN f.bad_quality THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_bad_quality,
                CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dup,
                CAST(sum(CASE WHEN ct.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_contam,
                CAST(sum(CASE WHEN NOT f.bad_quality AND d.doc_id IS NULL
                               AND ct.doc_id IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kept
         FROM flags f
         LEFT JOIN dup d USING (doc_id) LEFT JOIN contam ct USING (doc_id)
         GROUP BY 1""",
    "t18_token_budget" ->
      """SELECT lang, doc_id, n_tokens, cum_tokens FROM (
           SELECT lang, doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(sum(len(string_split(text, ' '))) OVER (
                    PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
           FROM documents)
         WHERE cum_tokens <= CASE lang WHEN 'en' THEN 2000
                                       WHEN 'zh' THEN 1000
                                       ELSE 500 END""",
    "t19_vocab" ->
      """SELECT word, count(*) AS tf,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents)
         GROUP BY word
         ORDER BY tf DESC, word
         LIMIT 20""",
    "q26_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS vt FROM events
                    WHERE event_type = 'view' GROUP BY 1),
              c AS (SELECT e.user_id, min(e.ts) AS ct
                    FROM events e JOIN v USING (user_id)
                    WHERE e.event_type = 'click' AND e.ts > v.vt
                      AND e.ts <= v.vt + INTERVAL 24 HOUR GROUP BY 1),
              p AS (SELECT e.user_id, min(e.ts) AS pt
                    FROM events e JOIN c USING (user_id)
                    WHERE e.event_type = 'purchase' AND e.ts > c.ct
                      AND e.ts <= c.ct + INTERVAL 24 HOUR GROUP BY 1)
         SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
                (SELECT count(*) FROM v) AS n_users
         UNION ALL
         SELECT CAST(1 AS BIGINT), 'click', (SELECT count(*) FROM c)
         UNION ALL
         SELECT CAST(2 AS BIGINT), 'purchase', (SELECT count(*) FROM p)""",
    "q27_json" ->
      """SELECT event_type, count(*) AS n_rows,
                CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
                max(CAST(props->>'$.k' AS BIGINT)) AS max_k
         FROM events GROUP BY 1""",
    "q28_gap_sessions" ->
      """WITH g AS (
           SELECT user_id, event_id, epoch_us(ts) AS tus,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev
           FROM events),
         s AS (
           SELECT user_id,
                  sum(CASE WHEN prev IS NULL
                             OR tus - prev > CAST(43200000000 AS BIGINT)
                           THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY tus, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
           FROM g),
         per_sess AS (
           SELECT user_id, session_id, count(*) AS n
           FROM s GROUP BY 1, 2)
         SELECT user_id,
                CAST(max(session_id) AS BIGINT) AS n_sessions,
                CAST(sum(n) AS BIGINT) AS n_events,
                max(n) AS max_session_events
         FROM per_sess GROUP BY 1""",
    "q29_path2" -> (coEdgeCtes +
      """,
         seeds AS (SELECT p_partkey AS vertex FROM part WHERE p_size = 25),
         hop1 AS (SELECT s.vertex, e.dst AS mid
                  FROM seeds s JOIN edges e ON e.src = s.vertex),
         hop2 AS (SELECT DISTINCT h.vertex, e.dst AS nbr2
                  FROM hop1 h JOIN edges e ON e.src = h.mid
                  WHERE e.dst <> h.vertex)
         SELECT h.vertex, count(*) AS n_2hop
         FROM hop2 h
         WHERE NOT EXISTS (SELECT 1 FROM hop1 d
                           WHERE d.vertex = h.vertex AND d.mid = h.nbr2)
         GROUP BY 1"""),
    "q30_pagerank" -> (coEdgeCtes + pageRankIters(5) +
      "\n         SELECT vertex, pr AS pr_int FROM it5"),
    "q54_skyline" ->
      """WITH pts AS (SELECT DISTINCT
                        CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
                        epoch_us(o_orderdate) AS date_us
                      FROM orders)
         SELECT price_c, date_us FROM pts p
         WHERE NOT EXISTS (
           SELECT 1 FROM pts q
           WHERE q.price_c <= p.price_c AND q.date_us >= p.date_us
             AND (q.price_c < p.price_c OR q.date_us > p.date_us))""",
    "t34_weighted_sample" ->
      """WITH k AS (
           SELECT lang, doc_id,
                  ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                      + 0.5) / 4294967296.0) / CAST(n_chars AS DOUBLE) AS pri
           FROM documents)
         SELECT lang, doc_id, rnk FROM (
           SELECT lang, doc_id,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY pri DESC, doc_id ASC) AS rnk
           FROM k)
         WHERE rnk <= 5""",
    "t35_containment" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, unnest([array_to_string(t[i:i+2], ' ')
                  for i in generate_series(1, len(t)-2)]) AS shingle
           FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)),
         sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         shared AS (
           SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
           FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id
           GROUP BY 1, 2)
         SELECT a, b, shared * 1.0 / least(sa.nsh, sb.nsh) AS containment
         FROM shared JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         WHERE shared * 1.0 / least(sa.nsh, sb.nsh) >= 0.9""",
    "t36_dup_spans" ->
      """WITH w AS (
           SELECT doc_id, u.i - 1 AS s, u.i - 1 + 8 AS e,
                  array_to_string(t[u.i:u.i+7], ' ') AS win
           FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t
                 FROM documents) d,
                LATERAL unnest(generate_series(1, len(t) - 7)) AS u(i)),
         dup AS (SELECT win FROM w GROUP BY win
                 HAVING count(DISTINCT doc_id) > 1),
         fl AS (SELECT doc_id, s, e FROM w JOIN dup USING (win)),
         m AS (SELECT doc_id, s, e,
                 CASE WHEN coalesce(max(e) OVER (PARTITION BY doc_id
                      ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), -1) >= s
                      THEN 0 ELSE 1 END AS ni FROM fl),
         isl AS (SELECT doc_id, s, e,
                 sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e) AS island
                 FROM m)
         SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
                CAST(max(e) AS BIGINT) AS span_end, count(*) AS n_windows
         FROM isl GROUP BY doc_id, island""",
    "t37_despanned" ->
      """WITH d AS (SELECT doc_id, string_split_regex(text, '\s+') AS t
                    FROM documents),
         w AS (
           SELECT doc_id, u.i - 1 AS s, u.i - 1 + 8 AS e,
                  array_to_string(t[u.i:u.i+7], ' ') AS win
           FROM d, LATERAL unnest(generate_series(1, len(t) - 7)) AS u(i)),
         dup AS (SELECT win FROM w GROUP BY win
                 HAVING count(DISTINCT doc_id) > 1),
         fl AS (SELECT doc_id, s, e FROM w JOIN dup USING (win)),
         tok AS (SELECT doc_id, u.i - 1 AS i, t[u.i] AS tok
                 FROM d, LATERAL unnest(generate_series(1, len(t))) AS u(i)),
         kept AS (SELECT doc_id, i, tok FROM tok
                  WHERE NOT EXISTS (SELECT 1 FROM fl
                    WHERE fl.doc_id = tok.doc_id
                      AND tok.i >= fl.s AND tok.i < fl.e))
         SELECT d.doc_id,
                coalesce((SELECT string_agg(tok, ' ' ORDER BY i)
                          FROM kept WHERE kept.doc_id = d.doc_id), '')
                  AS clean_text,
                CAST(len(d.t) AS BIGINT) AS n_tokens,
                CAST(len(d.t) - (SELECT count(*) FROM kept
                                 WHERE kept.doc_id = d.doc_id) AS BIGINT)
                  AS n_removed
         FROM d""",
    "q56_auc" ->
      """WITH g AS (
           SELECT value AS s,
                  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
                  sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS nn
           FROM events GROUP BY 1),
         c AS (
           SELECT np, nn, coalesce(sum(nn) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cum_neg
           FROM g)
         SELECT CAST(sum(np * (2 * cum_neg + nn)) AS DOUBLE)
                  / CAST(2 * sum(np) * sum(nn) AS DOUBLE) AS auc,
                CAST(sum(np) AS BIGINT) AS n_pos,
                CAST(sum(nn) AS BIGINT) AS n_neg
         FROM c""",
    "q55_assoc" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                     FROM lineitem),
         n AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
         ic AS (SELECT pk, count(*) AS icnt FROM li GROUP BY pk),
         pc AS (SELECT x.pk AS part_a, y.pk AS part_b, count(*) AS pair_cnt
                FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
                GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT part_a, part_b, pair_cnt,
                CAST(pair_cnt AS DOUBLE) / n_orders AS support,
                CAST(pair_cnt AS DOUBLE) / a.icnt AS conf_ab,
                CAST(pair_cnt AS DOUBLE) / b.icnt AS conf_ba,
                CAST(pair_cnt * n_orders AS DOUBLE)
                  / CAST(a.icnt * b.icnt AS DOUBLE) AS lift
         FROM pc
         JOIN ic a ON a.pk = pc.part_a
         JOIN ic b ON b.pk = pc.part_b
         CROSS JOIN n""",
    "q53_labelprop" -> (coEdgeCtes +
      """,
         verts AS (SELECT DISTINCT src AS vertex FROM edges),
         l0 AS (SELECT vertex, vertex AS label FROM verts),
         n1 AS (SELECT e.dst AS vertex, l.label, count(*) AS cnt
                FROM edges e JOIN l0 l ON l.vertex = e.src
                GROUP BY 1, 2),
         l1 AS (SELECT vertex, label FROM (
                  SELECT vertex, label, row_number() OVER (PARTITION BY vertex
                    ORDER BY cnt DESC, label ASC) AS rn
                  FROM n1) WHERE rn = 1),
         n2 AS (SELECT e.dst AS vertex, l.label, count(*) AS cnt
                FROM edges e JOIN l1 l ON l.vertex = e.src
                GROUP BY 1, 2),
         l2 AS (SELECT vertex, label FROM (
                  SELECT vertex, label, row_number() OVER (PARTITION BY vertex
                    ORDER BY cnt DESC, label ASC) AS rn
                  FROM n2) WHERE rn = 1)
         SELECT vertex, label FROM l2"""),
    "q58_skew_profile" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
         h AS (SELECT cnt, count(*) AS nk FROM c GROUP BY 1),
         t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys,
                      CAST(max(cnt) AS BIGINT) AS max_cnt FROM c),
         cu AS (SELECT cnt, sum(nk) OVER (ORDER BY cnt
                  ROWS UNBOUNDED PRECEDING) AS cum FROM h)
         SELECT n_rows, n_keys, max_cnt,
                round(CAST(max_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
                  AS max_share,
                min(CASE WHEN cum >= ceil(n_keys * 0.5) THEN cnt END)
                  AS p50_cnt,
                min(CASE WHEN cum >= ceil(n_keys * 0.99) THEN cnt END)
                  AS p99_cnt
         FROM cu, t GROUP BY 1, 2, 3""",
    // true recursion is the oracle for the log-step doubling closure:
    // both converge to the same ancestor set over the parent forest
    "q57_ancestors" ->
      """WITH RECURSIVE par AS (
           SELECT p_partkey AS v, p_partkey // 2 AS p
           FROM part WHERE p_partkey >= 2),
         anc(v, a) AS (
           SELECT v, p FROM par
           UNION
           SELECT anc.v, par.p FROM anc JOIN par ON par.v = anc.a)
         SELECT v AS vertex, count(*) AS n_anc,
                CAST(sum(a) AS BIGINT) AS anc_sum
         FROM anc GROUP BY 1""",
    "t40_bpe_step" ->
      """WITH w AS (
           SELECT word, count(*) AS wcount FROM (
             SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
             FROM documents)
           WHERE len(word) >= 2 GROUP BY 1),
         p AS (
           SELECT unnest([substr(word, i, 2)
                          for i in generate_series(1, len(word)-1)]) AS pair,
                  wcount
           FROM w)
         SELECT pair, CAST(sum(wcount) AS BIGINT) AS total
         FROM p GROUP BY 1
         ORDER BY total DESC, pair ASC LIMIT 10""",
    "t38_domain_mix" ->
      """WITH g AS (
           SELECT lang, source, count(*) AS n_docs,
                  CAST(round(sqrt(count(*) * 1.0) * 1e6, 0) AS BIGINT) AS sq
           FROM documents GROUP BY 1, 2),
         tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
                        CAST(sum(sq) AS BIGINT) AS sq_total FROM g)
         SELECT lang, source, n_docs,
                CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS corpus_share,
                CAST(sq AS DOUBLE) / CAST(sq_total AS DOUBLE) AS target_share,
                (CAST(sq AS DOUBLE) * CAST(n_total AS DOUBLE)) /
                  (CAST(sq_total AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS weight
         FROM g, tot""",
    "q31_cohort" ->
      """WITH a AS (
           SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 // 7 AS week
           FROM events),
         c AS (
           SELECT user_id, week,
                  min(week) OVER (PARTITION BY user_id) AS cohort_week
           FROM a)
         SELECT cohort_week, week - cohort_week AS week_offset,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM c GROUP BY 1, 2""",
    "q32_histogram" ->
      """SELECT event_type, CAST(floor(value / 25) AS BIGINT) AS bin,
                count(*) AS n
         FROM events GROUP BY 1, 2""",
    "q33_corr" ->
      """WITH m AS (
           SELECT event_type,
                  CAST(round(value) AS BIGINT) AS x,
                  CAST(hour(ts) AS BIGINT) AS y
           FROM events),
         s AS (
           SELECT event_type, count(*) AS n,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x*x) AS BIGINT) AS sxx,
                  CAST(sum(y*y) AS BIGINT) AS syy,
                  CAST(sum(x*y) AS BIGINT) AS sxy
           FROM m GROUP BY 1)
         SELECT event_type, n,
                round(CAST(n*sxy - sx*sy AS DOUBLE)
                      / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                         * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS corr_xy
         FROM s""",
    "t20_zscore" ->
      """WITH st AS (
           SELECT lang, count(*) AS n,
                  CAST(sum(n_chars) AS BIGINT) AS sx,
                  CAST(sum(n_chars*n_chars) AS BIGINT) AS sxx
           FROM documents GROUP BY 1),
         z AS (
           SELECT d.doc_id, d.lang,
                  round((CAST(d.n_chars AS DOUBLE)
                         - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
                        / sqrt(CAST(sxx AS DOUBLE)/CAST(n AS DOUBLE)
                               - (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
                                 * (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))),
                        6) AS z
           FROM documents d JOIN st USING (lang))
         SELECT doc_id, lang, z FROM z WHERE abs(z) > 2""",
    "q34_bloom_join" ->
      """SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 25)""",
    "q35_triangles" -> (coEdgeCtes +
      """,
         deg AS (SELECT src AS v, count(*) AS deg FROM edges GROUP BY 1),
         orient AS (
           SELECT e.src, e.dst FROM edges e
           JOIN deg ds ON ds.v = e.src
           JOIN deg dd ON dd.v = e.dst
           WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)),
         tri AS (
           SELECT count(*) AS t FROM orient e1
           JOIN orient e2 ON e1.dst = e2.src
           WHERE EXISTS (SELECT 1 FROM orient e3
                         WHERE e3.src = e1.src AND e3.dst = e2.dst)),
         wedges AS (SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS w
                    FROM deg)
         SELECT (SELECT w FROM wedges) AS n_wedges,
                CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
                round(3.0 * (SELECT t FROM tri) / (SELECT w FROM wedges), 6)
                  AS global_cc"""),
    "q36_window_suite" ->
      """SELECT o_custkey, o_orderkey,
                lag(o_totalprice, 1) OVER w AS prev_price,
                lead(o_totalprice, 1) OVER w AS next_price,
                CAST(rank() OVER w AS INTEGER) AS rnk,
                round(percent_rank() OVER w, 6) AS pct_rank,
                round(cume_dist() OVER w, 6) AS cume,
                CAST(ntile(4) OVER w AS INTEGER) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC)""",
    "kg_entity_rank" -> (trieCtes +
      """,
         ments AS (
           SELECT DISTINCT doc_id, mention FROM (
             SELECT doc_id, mention FROM takes
             UNION ALL SELECT doc_id, mention FROM unis)),
         mpairs AS (
           SELECT DISTINCT x.mention AS a, y.mention AS b
           FROM ments x JOIN ments y
             ON x.doc_id = y.doc_id AND x.mention < y.mention),
         edges AS (SELECT a AS src, b AS dst FROM mpairs
                   UNION ALL SELECT b, a FROM mpairs)""" +
      pageRankIters(5) +
      "\n         SELECT vertex AS mention, pr AS pr_int FROM it5"),
    "q37_collect" ->
      """WITH r AS (
           SELECT lang, doc_id,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY n_chars DESC, doc_id ASC) AS rn
           FROM documents)
         SELECT lang,
                CAST(to_json(list_sort(list(doc_id))) AS VARCHAR) AS top_docs,
                count(*) AS n
         FROM r WHERE rn <= 3 GROUP BY 1""",
    "q39_reach3" -> (coEdgeCtes +
      """,
         seeds AS (SELECT p_partkey AS vertex FROM part WHERE p_size = 25),
         r0 AS (SELECT vertex AS seed, vertex FROM seeds),
         r1 AS (SELECT DISTINCT seed, vertex FROM (
                  SELECT seed, vertex FROM r0
                  UNION ALL
                  SELECT r0.seed, e.dst FROM r0 JOIN edges e ON e.src = r0.vertex)),
         r2 AS (SELECT DISTINCT seed, vertex FROM (
                  SELECT seed, vertex FROM r1
                  UNION ALL
                  SELECT r1.seed, e.dst FROM r1 JOIN edges e ON e.src = r1.vertex)),
         r3 AS (SELECT DISTINCT seed, vertex FROM (
                  SELECT seed, vertex FROM r2
                  UNION ALL
                  SELECT r2.seed, e.dst FROM r2 JOIN edges e ON e.src = r2.vertex))
         SELECT seed, count(*) AS n_reach FROM r3 GROUP BY 1"""),
    "q38_star_join" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                              AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
                count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' AND o_orderstatus <> 'F'
         GROUP BY 1""",
    // Mirrors Bm25.topDocs verbatim: identical parenthesization per IEEE
    // op; per-(doc,term) quantization to BIGINT before the per-doc sum.
    "q41_bm25" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
                       FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         params AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
                WHERE tok IN ('spark', 'merge', 'query') GROUP BY 1, 2),
         dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         scored AS (
           SELECT t.doc_id,
                  CAST(round(
                    ln(1.0 + (CAST(p.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
                             / (CAST(f.df AS DOUBLE) + 0.5))
                    * (CAST(t.tf AS DOUBLE) * (1.2 + 1.0))
                    / (CAST(t.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75 + 0.75 * CAST(d.dl AS DOUBLE)
                                / (CAST(p.sum_dl AS DOUBLE) / CAST(p.n_docs AS DOUBLE))))
                    * 1000000.0) AS BIGINT) AS s_scaled
           FROM tf t JOIN dft f USING (tok) JOIN dl d USING (doc_id)
           CROSS JOIN params p)
         SELECT doc_id, count(*) AS n_terms,
                CAST(sum(s_scaled) AS BIGINT) AS score_scaled
         FROM scored GROUP BY 1
         ORDER BY score_scaled DESC, doc_id ASC LIMIT 10""",
    "q42_setops" ->
      """WITH f AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
         b AS (SELECT custkey FROM f INTERSECT SELECT custkey FROM o),
         fo AS (SELECT custkey FROM f EXCEPT SELECT custkey FROM o)
         SELECT custkey, 'both' AS side FROM b
         UNION ALL
         SELECT custkey, 'f_only' AS side FROM fo""",
    "q43_range_frame" ->
      """WITH e AS (SELECT user_id, event_id,
                           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events)
         SELECT user_id, event_id,
                CAST(sum(cents) OVER w AS BIGINT) AS roll_cents,
                count(*) OVER w AS n_in_hour
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
                             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
    "q44_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders o
         WHERE o_totalprice >= (SELECT max(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)""",
    "q40_date_spine" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS d, count(*) AS n_events,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS sum_cents
           FROM events GROUP BY 1),
         bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
         spine AS (
           SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                    AS d
           FROM bounds)
         SELECT strftime(spine.d, '%Y-%m-%d') AS day,
                coalesce(n_events, 0) AS n_events,
                coalesce(sum_cents, 0) AS sum_cents
         FROM spine LEFT JOIN daily USING (d)""",
    "q46_fill_forward" ->
      """SELECT event_id, user_id, event_type,
              coalesce(last_value(purchase_cents IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
                AS last_purchase_cents
         FROM (SELECT event_id, user_id, event_type, ts,
                      CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT) END
                        AS purchase_cents
               FROM events WHERE user_id % 37 = 0)""",
    "q47_full_outer" ->
      """WITH p AS (
           SELECT user_id, CAST(ts AS DATE) AS d,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS purchase_cents
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         er AS (
           SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n_errors
           FROM events WHERE event_type = 'error' GROUP BY 1, 2)
         SELECT coalesce(p.user_id, er.user_id) AS user_id,
                strftime(coalesce(p.d, er.d), '%Y-%m-%d') AS day,
                coalesce(purchase_cents, 0) AS purchase_cents,
                coalesce(n_errors, 0) AS n_errors
         FROM p FULL OUTER JOIN er ON p.user_id = er.user_id AND p.d = er.d""",
    "t21_regex_mine" ->
      """SELECT word, count(*) AS n FROM (
           SELECT unnest(regexp_extract_all(lower(text), '[a-z]{4,}')) AS word
           FROM documents)
         GROUP BY word ORDER BY n DESC, word ASC LIMIT 10""",
    "t22_para_dedup" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         segs AS (
           SELECT doc_id, i AS seg_idx,
                  array_to_string(t[(i*8+1):(i*8+8)], ' ') AS seg
           FROM toks,
                unnest(generate_series(0, CAST(ceil(len(t)/8.0) AS INT) - 1))
                  AS u(i)),
         ranked AS (
           SELECT doc_id, seg_idx, seg,
                  row_number() OVER (PARTITION BY seg
                                     ORDER BY doc_id, seg_idx) AS rn
           FROM segs)
         SELECT doc_id,
                count(*) FILTER (rn = 1) AS n_kept,
                count(*) FILTER (rn > 1) AS n_dropped,
                md5(coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
                               FILTER (rn = 1), '')) AS fp
         FROM ranked GROUP BY doc_id""",
    "t23_redact" ->
      """SELECT doc_id,
              CAST(len(regexp_extract_all(text, '\b(customer|supplier)\b'))
                AS BIGINT) AS n_hits,
              md5(regexp_replace(text, '\b(customer|supplier)\b', '<ENT>', 'g'))
                AS fp
         FROM documents WHERE doc_id % 7 = 0""",
    "q48_sliding_dau" ->
      """WITH active AS (
           SELECT DISTINCT event_type, CAST(ts AS DATE) AS d, user_id
           FROM events),
         fan AS (
           SELECT event_type,
                  CAST(unnest(generate_series(d, d + INTERVAL 2 DAY,
                                              INTERVAL 1 DAY)) AS DATE) AS w,
                  user_id
           FROM active)
         SELECT event_type, strftime(w, '%Y-%m-%d') AS day,
                count(DISTINCT user_id) AS dau3
         FROM fan GROUP BY 1, 2""",
    "t24_rrf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
                       FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         params AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
                WHERE tok IN ('spark', 'merge', 'query') GROUP BY 1, 2),
         dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         scored AS (
           SELECT t.doc_id,
                  CAST(round(
                    ln(1.0 + (CAST(p.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
                             / (CAST(f.df AS DOUBLE) + 0.5))
                    * (CAST(t.tf AS DOUBLE) * (1.2 + 1.0))
                    / (CAST(t.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75 + 0.75 * CAST(d.dl AS DOUBLE)
                                / (CAST(p.sum_dl AS DOUBLE) / CAST(p.n_docs AS DOUBLE))))
                    * 1000000.0) AS BIGINT) AS s_scaled
           FROM tf t JOIN dft f USING (tok) JOIN dl d USING (doc_id)
           CROSS JOIN params p),
         lex AS (SELECT doc_id, CAST(sum(s_scaled) AS BIGINT) AS score_scaled
                 FROM scored GROUP BY 1),
         lexr AS (SELECT doc_id, row_number() OVER
                    (ORDER BY score_scaled DESC, doc_id ASC) AS rank_a
                  FROM (SELECT * FROM lex
                        ORDER BY score_scaled DESC, doc_id ASC LIMIT 100)),
         dense AS (SELECT c.vec_id AS doc_id,
                          list_cosine_similarity(c.embedding, q.embedding) AS cos
                   FROM embeddings c,
                        (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
         denser AS (SELECT doc_id, row_number() OVER
                      (ORDER BY cos DESC, doc_id ASC) AS rank_b
                    FROM (SELECT * FROM dense
                          ORDER BY cos DESC, doc_id ASC LIMIT 100)),
         fused AS (
           SELECT coalesce(l.doc_id, d.doc_id) AS doc_id, l.rank_a, d.rank_b
           FROM lexr l FULL OUTER JOIN denser d ON l.doc_id = d.doc_id)
         SELECT doc_id, coalesce(rank_a, 0) AS rank_a,
                coalesce(rank_b, 0) AS rank_b,
                CAST(round((
                  CASE WHEN rank_a IS NOT NULL
                       THEN 1.0 / (CAST(rank_a AS DOUBLE) + 60.0) ELSE 0.0 END
                + CASE WHEN rank_b IS NOT NULL
                       THEN 1.0 / (CAST(rank_b AS DOUBLE) + 60.0) ELSE 0.0 END
                ) * 1000000000.0) AS BIGINT) AS rrf_scaled
         FROM fused ORDER BY rrf_scaled DESC, doc_id ASC LIMIT 50""",
    "t25_bigram_lm" ->
      """WITH t AS (SELECT string_split_regex(lower(text), '\s+') AS t
                    FROM documents),
         bi AS (SELECT t[i] AS w1, t[i+1] AS w2
                FROM t, unnest(generate_series(1, len(t) - 1)) AS u(i)),
         c2 AS (SELECT w1, w2, count(*) AS n FROM bi GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n1 FROM c2 GROUP BY 1)
         SELECT c2.w1, c2.w2, c2.n,
                CAST(round(CAST(c2.n AS DOUBLE) / CAST(c1.n1 AS DOUBLE)
                           * 1000000.0) AS BIGINT) AS p_scaled
         FROM c2 JOIN c1 ON c2.w1 = c1.w1
         ORDER BY c2.n DESC, c2.w1 ASC, c2.w2 ASC LIMIT 20""",
    "t26_pmi" ->
      """WITH t AS (SELECT string_split_regex(lower(text), '\s+') AS t
                    FROM documents),
         bi AS (SELECT t[i] AS w1, t[i+1] AS w2
                FROM t, unnest(generate_series(1, len(t) - 1)) AS u(i)),
         c2 AS (SELECT w1, w2, count(*) AS n FROM bi GROUP BY 1, 2),
         cl AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n1 FROM c2 GROUP BY 1),
         cr AS (SELECT w2, CAST(sum(n) AS BIGINT) AS n2 FROM c2 GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS tb FROM c2)
         SELECT c2.w1, c2.w2, c2.n,
                CAST(round(ln(CAST(c2.n AS DOUBLE) * CAST(tot.tb AS DOUBLE)
                              / (CAST(cl.n1 AS DOUBLE) * CAST(cr.n2 AS DOUBLE)))
                           * 1000000.0) AS BIGINT) AS pmi_scaled
         FROM c2 JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN tot
         WHERE c2.n >= 5
         ORDER BY pmi_scaled DESC, w1 ASC, w2 ASC LIMIT 30""",
    "t27_tfidf" ->
      """WITH toks AS (SELECT doc_id,
                              unnest(string_split_regex(lower(text), '\s+')) AS word
                       FROM documents),
         tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
         dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         nd AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT t.doc_id, t.word, t.tf,
                  CAST(round(CAST(t.tf AS DOUBLE)
                             * (ln((CAST(nd.n_docs AS DOUBLE) + 1.0)
                                   / (CAST(f.df AS DOUBLE) + 1.0)) + 1.0)
                             * 1000000.0) AS BIGINT) AS score_scaled
           FROM tf t JOIN dfreq f USING (word) CROSS JOIN nd),
         r AS (SELECT doc_id,
                      CAST(row_number() OVER (PARTITION BY doc_id
                        ORDER BY score_scaled DESC, word ASC) AS INTEGER) AS rnk,
                      word, tf, score_scaled
               FROM scored)
         SELECT doc_id, rnk, word, tf, score_scaled FROM r WHERE rnk <= 3""",
    "t28_entropy" ->
      """WITH toks AS (SELECT doc_id,
                              unnest(string_split_regex(lower(text), '\s+')) AS word
                       FROM documents),
         tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
         wd AS (SELECT doc_id, tf,
                       CAST(sum(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
                FROM tf),
         terms AS (SELECT doc_id, dl,
                          CAST(round(-(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE))
                                     * ln(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE))
                                     * 1000000000.0) AS BIGINT) AS ts
                   FROM wd)
         SELECT doc_id, CAST(max(dl) AS BIGINT) AS n_tokens,
                CAST(sum(ts) AS BIGINT) AS h_scaled
         FROM terms GROUP BY 1""",
    "t29_kl" ->
      """WITH toks AS (SELECT doc_id % 2 = 0 AS is_p,
                              unnest(string_split_regex(lower(text), '\s+')) AS word
                       FROM documents),
         counts AS (SELECT word,
                           CAST(sum(CASE WHEN is_p THEN 1 ELSE 0 END) AS BIGINT) AS cp,
                           CAST(sum(CASE WHEN NOT is_p THEN 1 ELSE 0 END) AS BIGINT) AS cq
                    FROM toks GROUP BY 1),
         tot AS (SELECT CAST(sum(cp) AS BIGINT) AS tp,
                        CAST(sum(cq) AS BIGINT) AS tq,
                        count(*) AS v
                 FROM counts),
         terms AS (SELECT tot.v,
                          (CAST(cp AS DOUBLE) + 1.0)
                            / CAST(tot.tp + tot.v AS DOUBLE) AS p,
                          (CAST(cq AS DOUBLE) + 1.0)
                            / CAST(tot.tq + tot.v AS DOUBLE) AS q
                   FROM counts CROSS JOIN tot)
         SELECT CAST(max(v) AS BIGINT) AS n_vocab,
                CAST(sum(CAST(round(p * ln(p / q) * 1000000000.0) AS BIGINT))
                     AS BIGINT) AS kl_scaled
         FROM terms""",
    "t30_dsir" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
                    FROM documents),
         bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
                FROM t, unnest(generate_series(1, len(t) - 1)) AS u(i)),
         c AS (SELECT w1, w2,
                 CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                 CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cs
               FROM bi GROUP BY 1, 2),
         tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
                        CAST(sum(cs) AS BIGINT) AS ts_, count(*) AS v
                 FROM c),
         terms AS (
           SELECT bi.doc_id,
                  CAST(round(ln(((CAST(ct AS DOUBLE) + 1.0)
                                 / CAST(tt + v AS DOUBLE))
                              / ((CAST(cs AS DOUBLE) + 1.0)
                                 / CAST(ts_ + v AS DOUBLE))) * 1000000.0)
                       AS BIGINT) AS term
           FROM bi JOIN c USING (w1, w2) CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_bigrams,
                CAST(sum(term) AS BIGINT) AS w_scaled
         FROM terms GROUP BY 1""",
    "t31_perplexity" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
                    FROM documents),
         bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
                FROM t, unnest(generate_series(1, len(t) - 1)) AS u(i)),
         c2 AS (SELECT w1, w2, count(*) AS n12 FROM bi GROUP BY 1, 2),
         v AS (SELECT count(DISTINCT w2) AS v FROM c2),
         cw AS (SELECT w1, w2, n12,
                       CAST(sum(n12) OVER (PARTITION BY w1) AS BIGINT) AS n1
                FROM c2),
         terms AS (
           SELECT bi.doc_id,
                  CAST(round(-ln((CAST(n12 AS DOUBLE) + 1.0)
                                 / CAST(n1 + v AS DOUBLE)) * 1000000.0)
                       AS BIGINT) AS nll
           FROM bi JOIN cw USING (w1, w2) CROSS JOIN v),
         agg AS (SELECT doc_id, count(*) AS n_bigrams,
                        CAST(sum(nll) AS BIGINT) AS nll_scaled
                 FROM terms GROUP BY 1)
         SELECT doc_id, n_bigrams, nll_scaled,
                CAST(round(exp(CAST(nll_scaled AS DOUBLE)
                               / (CAST(n_bigrams AS DOUBLE) * 1000000.0))
                           * 1000000.0) AS BIGINT) AS ppl_scaled
         FROM agg""",
    "q49_markov" ->
      """WITH seq AS (
           SELECT event_type,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts ASC, event_id ASC) AS next_type
           FROM events),
         c AS (SELECT event_type AS from_type, next_type AS to_type,
                      count(*) AS n
               FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
         ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
                FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, c.n,
                CAST(round(CAST(c.n AS DOUBLE) / CAST(ft.n_from AS DOUBLE)
                           * 1000000.0) AS BIGINT) AS p_scaled
         FROM c JOIN ft USING (from_type)""",
    // row-equivalent long form (UNPIVOT syntax varies across DuckDB
    // versions; the engine side is what demonstrates the operator)
    "q45_unpivot" ->
      """WITH agg AS (
           SELECT event_type, count(*) AS n_rows,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS sum_cents
           FROM events GROUP BY 1)
         SELECT event_type, 'n_rows' AS metric, n_rows AS value FROM agg
         UNION ALL
         SELECT event_type, 'sum_cents' AS metric, sum_cents AS value FROM agg"""
  )
}
