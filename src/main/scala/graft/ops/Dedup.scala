package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.util.hashing.MurmurHash3

/** Deduplication operators for web-scale training-data curation:
  * exact (content hash), n-gram Jaccard via shingle inverted index,
  * MinHash + LSH banding, SimHash hamming buckets, embedding-cosine
  * near-dup. Every variant is expressed as joins/aggregations over
  * exploded keys — never an all-pairs cross join — so the shuffle volume
  * is bounded by (docs x shingles) and by candidate-pair counts, not n^2.
  */
object Dedup {

  val ShingleSize = 3
  val MinHashK = 32       // signature length
  val LshBands = 8        // bands of 4 rows each (threshold ~0.72)
  val SimHashBits = 64

  /** Distinct token n-gram shingles per doc: (doc_id, shingle). Docs
    * shorter than n tokens yield no shingles (guard below — an unguarded
    * `sequence(0, size-n)` DESCENDS for short docs and crashes slice()).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = ShingleSize): DataFrame = {
    val toks = split(col(textCol), "\\s+")
    df.select(col(idCol).as("doc_id"), toks.as("toks"))
      .withColumn("idx",
        when(size(col("toks")) >= n, sequence(lit(0), size(col("toks")) - n))
          .otherwise(array().cast("array<int>")))
      .withColumn("i", explode(col("idx")))
      .withColumn("shingle",
        concat_ws(" ", slice(col("toks"), col("i") + 1, lit(n))))
      .select(col("doc_id"), col("shingle"))
      .distinct()
  }

  /** Hot-shingle document-frequency cap. A stop-shingle shared by 10^6
    * docs creates 10^12 candidate pairs in the inverted-index self-join;
    * dropping shingles with df > maxDf BEFORE the join bounds the pair
    * fan-out at maxDf^2 per shingle. Jaccard is then computed over the
    * RARE shingle sets on both numerator and denominator (consistent
    * semantics; near-dup pairs share their rare shingles). maxDf is
    * chosen so small-sf outputs are unchanged (no shingle reaches it).
    */
  val HotShingleDf = 1000

  /** Exact n-gram Jaccard >= threshold via the shingle inverted index:
    * shared-shingle counts per pair (one shuffle on shingle), then
    * |A ∩ B| / (|A| + |B| - |A ∩ B|) — over df<=maxDf shingles (cap
    * above). This is also the verification stage of the MinHash path.
    */
  def ngramJaccardPairs(sh: DataFrame, threshold: Double,
                        maxDf: Int = HotShingleDf): DataFrame =
    sharedRareCounts(sh, maxDf)
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")

  /** Asymmetric near-dup (subset/quote detection): containment
    * |A ∩ B| / min(|A|, |B|) >= threshold flags pairs where the SMALLER
    * document is mostly contained in the larger — a short document
    * quoted inside a long one has Jaccard ~ 0 but containment ~ 1, so
    * symmetric Jaccard dedup misses it entirely. Same inverted-index
    * shape and hot-shingle df cap as [[ngramJaccardPairs]]; only the
    * denominator changes (the smaller rare-shingle set).
    */
  def containmentPairs(sh: DataFrame, threshold: Double,
                       maxDf: Int = HotShingleDf): DataFrame =
    sharedRareCounts(sh, maxDf)
      .withColumn("containment",
        col("shared").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select("a", "b", "containment")

  /** Duplicated-substring spans (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022): any k-token window
    * occurring in MORE THAN ONE document is duplicated text; overlapping
    * or touching flagged windows merge into maximal per-doc spans —
    * the unit a curation pipeline cuts or down-weights. Unlike doc-level
    * near-dup, this catches boilerplate and quotations embedded in
    * otherwise-unique documents.
    *
    * Shape at scale: one shuffle on the WINDOW FINGERPRINT (the dedup
    * key; the suffix-array of the paper is a single-machine structure —
    * the hash-group over windows is its distributed equivalent), a
    * semi-join back, and the island merge runs in windows partitioned BY
    * doc — every frame is doc-bounded, nothing global. The group/join
    * key is xxhash64 of the window, not its text: a k-token window is
    * tens of bytes where the hash is 8, so the big shuffle shrinks ~6x;
    * a 64-bit collision falsely flags one k-token span (dedup is
    * advisory, not destructive of meaning), with corpus-wide P(any
    * collision) ~ n^2/2^65 — a few percent even at 10^12 windows.
    * Output: (doc_id, span_start, span_end, n_windows), token offsets,
    * end exclusive.
    */
  def dupSubstringSpans(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col(textCol), "\\s+")
    val wins = df.select(col(idCol).as("doc_id"), toks.as("toks"))
      .withColumn("i",
        explode(when(size(col("toks")) >= k,
          sequence(lit(0), size(col("toks")) - k))
          .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), col("i"),
        xxhash64(concat_ws(" ", slice(col("toks"), col("i") + 1, lit(k))))
          .as("win"))
    val dup = wins.groupBy(col("win"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1).select("win")
    val flagged = wins.join(dup, Seq("win"))
      .select(col("doc_id"), col("i").as("s"), (col("i") + k).as("e"))
    // island merge: a window opens a new span iff it starts past the
    // running max end of everything before it (touching spans merge)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val prevMax = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    flagged
      .withColumn("ni",
        when(coalesce(max(col("e")).over(prevMax), lit(-1)) >= col("s"), 0)
          .otherwise(1))
      .withColumn("island", sum(col("ni")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).cast("long").as("span_start"),
        max(col("e")).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** Apply [[dupSubstringSpans]]: emit every document with its flagged
    * spans cut out — (doc_id, clean_text, n_tokens, n_removed). Policy:
    * remove EVERY copy of duplicated text (the conservative curation
    * default; keep-one-occurrence is a policy variant that needs a
    * global owner election per window and buys little for boilerplate).
    * Documents with no flagged spans pass through whole, with
    * whitespace normalized to single spaces (the tokenizer's quotient).
    *
    * Shape at scale: the span frame is doc-keyed and tiny next to the
    * corpus; the apply step is one shuffle join on doc_id plus a
    * doc-local array filter (tokens x spans per doc, both doc-bounded).
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8): DataFrame = {
    val spans = dupSubstringSpans(df, idCol, textCol, k)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("spans"))
    val toks = split(col(textCol), "\\s+")
    df.select(col(idCol).as("doc_id"), toks.as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("spans").isNull, col("toks")).otherwise(
          // zip each token with its 0-based index, drop those inside a span
          filter(col("toks"), (_, i) =>
            !exists(col("spans"), sp => i >= sp("s") && i < sp("e")))))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("clean_text"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"))
  }

  /** Shared-rare-shingle counts per doc pair: (a, b, shared, na, nb)
    * over df<=maxDf shingles — the common core of the Jaccard and
    * containment exact paths. One shuffle on shingle for the
    * inverted-index self-join, one hash-agg per pair.
    */
  /** Shingle strings projected to xxhash64 longs — used wherever the
    * shingle is only a JOIN/GROUP key (set semantics): a 3-token shingle
    * is ~20-30 bytes where the hash is 8, so every shingle-keyed shuffle
    * (df counts, inverted-index self-joins, verify joins) shrinks ~3x in
    * bytes and compares longs instead of strings. A 64-bit collision
    * merges two distinct shingles — P(any) ~ n²/2⁶⁵ over the corpus's
    * distinct shingles, and it perturbs one pair's Jaccard by one
    * element at most (same advisory-dedup tradeoff as
    * [[dupSubstringSpans]]'s window fingerprints). NOT applied where the
    * string itself is the contract: [[simhash]] (md5 bit projection) and
    * [[minhashSignatures]] (UDF hashes internally).
    */
  private def hashedShingles(sh: DataFrame): DataFrame =
    sh.withColumn("shingle", xxhash64(col("shingle")))

  private def sharedRareCounts(shRaw: DataFrame, maxDf: Int): DataFrame = {
    val sh = hashedShingles(shRaw)
    val rare = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("shingle"),
      Seq("shingle"))
    val sizes = rare.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val a = rare.select(col("doc_id").as("a"), col("shingle"))
    val b = rare.select(col("doc_id").as("b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("a"), col("nsh").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("nsh").as("nb")), Seq("b"))
  }

  /** C4-style segment-level corpus dedup: docs split into fixed-size
    * token segments; each distinct segment survives only at its FIRST
    * corpus-wide occurrence (ordered by (doc_id, seg_idx) — deterministic
    * under any partitioning), and survivors are reassembled in place.
    * One shuffle on the segment content (the dedup key itself), one back
    * per doc; the reassembly collect is bounded by a single document's
    * segment count. Returns (doc_id, n_kept, n_dropped, new_text).
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     segTokens: Int = 8): DataFrame = {
    val segs = df
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, cast(ceil(size(t) / $segTokens.0) as int) - 1),
            i -> concat_ws(' ', slice(t, i * $segTokens + 1, $segTokens)))""")))
      .withColumnRenamed("pos", "seg_idx")
      .withColumnRenamed("col", "seg")
    val w = Window.partitionBy(col("seg"))
      .orderBy(col("doc_id").asc, col("seg_idx").asc)
    segs.withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(
        expr("count(CASE WHEN rn = 1 THEN 1 END)").as("n_kept"),
        expr("count(CASE WHEN rn > 1 THEN 1 END)").as("n_dropped"),
        expr("""concat_ws(' ', transform(array_sort(
               collect_list(CASE WHEN rn = 1 THEN struct(seg_idx, seg) END)),
               x -> x.seg))""").as("new_text"))
  }

  private val minhashUdf = udf((shingles: Seq[String]) => {
    val sig = Array.fill(MinHashK)(Int.MaxValue)
    shingles.foreach { s =>
      var k = 0
      while (k < MinHashK) {
        val h = MurmurHash3.stringHash(s, k * 0x01000193 + 7)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
    }
    sig.toSeq
  })

  /** MinHash signatures: (doc_id, sig array<int>). */
  def minhashSignatures(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id")
      .agg(collect_list("shingle").as("shs"))
      .withColumn("sig", minhashUdf(col("shs")))
      .select("doc_id", "sig")

  /** LSH candidate pairs: docs sharing any band-hash bucket. Bands of
    * r = MinHashK/LshBands rows; two docs with Jaccard j collide in some
    * band with prob 1-(1-j^r)^b (≈0.99 at j=0.8 with 8x4).
    */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val r = MinHashK / LshBands
    val banded = sigs.withColumn("band", explode(sequence(lit(0), lit(LshBands - 1))))
      .withColumn("bucket",
        hash(col("band"), slice(col("sig"), col("band") * r + 1, lit(r))))
      .select(col("doc_id"), col("band"), col("bucket"))
    banded.select(col("band"), col("bucket"), col("doc_id").as("a"))
      .join(banded.select(col("band"), col("bucket"), col("doc_id").as("b")),
        Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact-Jaccard verification of candidate pairs (a, b) over the FULL
    * shingle sets — the shared verify stage of the MinHash and
    * prefix-filter paths. Shuffle volume is bounded by candidate count
    * times per-doc shingle count, never corpus^2.
    */
  private def verifyJaccard(shRaw: DataFrame, cands: DataFrame,
                            threshold: Double): DataFrame = {
    val sh = hashedShingles(shRaw)
    verifyJaccardHashed(sh, sh.groupBy("doc_id").agg(count(lit(1)).as("nsh")),
      cands, threshold)
  }

  /** [[verifyJaccard]] over pre-hashed shingles + precomputed doc sizes —
    * lets prefixJaccardPairs share ONE hashed frame and ONE sizes
    * aggregate between candidate generation and verification (identical
    * subtrees previously re-derived on each side; AQE exchange reuse only
    * caught some of them).
    */
  private def verifyJaccardHashed(sh: DataFrame, sizes: DataFrame,
                                  cands: DataFrame,
                                  threshold: Double): DataFrame = {
    val shared = cands.join(sh.select(col("doc_id").as("a"), col("shingle")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("a"), col("nsh").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("nsh").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Full MinHash+LSH near-dup: LSH candidates verified with exact
    * shingle Jaccard (false positives removed; result identical to the
    * exact ngramJaccardPairs for thresholds where LSH recall ~1).
    */
  def minhashLshPairs(sh: DataFrame, threshold: Double): DataFrame =
    verifyJaccard(sh, lshCandidates(minhashSignatures(sh)), threshold)

  /** INCREMENTAL near-dup: a NEW batch tested against an EXISTING index
    * — the daily-crawl-vs-history shape a production dedup actually
    * runs (the symmetric all-corpus join never re-runs; only new×old
    * and new×new matter, and this is the new×old leg). Banding is
    * identical to [[lshCandidates]] but the bucket join is asymmetric:
    * new on one side, old on the other — no old×old pair generation at
    * all, so daily cost is O(batch × collision rate), not O(corpus²).
    * At scale the old side's banded buckets are a MATERIALIZED index
    * (write once, reuse every day); exact-Jaccard verification follows.
    * Output: (a = new doc, b = old doc, jaccard).
    */
  def incrementalPairs(sh: DataFrame, sigs: DataFrame, isOld: Column,
                       threshold: Double): DataFrame = {
    val r = MinHashK / LshBands
    val banded = sigs
      .withColumn("band", explode(sequence(lit(0), lit(LshBands - 1))))
      .withColumn("bucket",
        hash(col("band"), slice(col("sig"), col("band") * r + 1, lit(r))))
      .withColumn("is_old", isOld)
      .select(col("doc_id"), col("band"), col("bucket"), col("is_old"))
    val cands = banded.filter(!col("is_old"))
      .select(col("band"), col("bucket"), col("doc_id").as("a"))
      .join(banded.filter(col("is_old"))
        .select(col("band"), col("bucket"), col("doc_id").as("b")),
        Seq("band", "bucket"))
      .select("a", "b").distinct()
    verifyJaccard(sh, cands, threshold)
  }

  /** Candidate pairs under PREFIX FILTERING (the TokenJoin / PPJoin
    * family — PAPERS.md): order each doc's shingles rarest-first by
    * global document frequency; two sets with Jaccard >= t MUST share a
    * shingle among each one's first n - ceil(t*n) + 1 (pigeonhole over
    * the canonical order), so self-joining only those PREFIX shingles is
    * lossless. A stop-shingle shared by 10^6 docs is the most FREQUENT,
    * lands at the back of every ordering, and never enters a prefix
    * unless a doc has almost nothing rarer — the skew that motivated the
    * [[HotShingleDf]] cap disappears without changing semantics. The
    * length filter (min size >= t * max size, a Jaccard necessary
    * condition) prunes cross-size pairs before the distinct.
    */
  def prefixCandidates(shRaw: DataFrame, threshold: Double): DataFrame = {
    // hashed longs as the canonical order + join key: prefix filtering is
    // lossless under ANY fixed total order of shingles, so ordering by
    // (df, hash) instead of (df, string) keeps exact recall
    val sh = hashedShingles(shRaw)
    prefixCandidatesHashed(sh,
      sh.groupBy("doc_id").agg(count(lit(1)).as("nsh")), threshold)
  }

  private def prefixCandidatesHashed(sh: DataFrame, sizes: DataFrame,
                                     threshold: Double): DataFrame = {
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    // the prefix frame feeds both sides of its self-join as the SAME
    // plan subtree (shared sh/sizes objects), so AQE exchange reuse
    // dedups the df-join + window chain at runtime (an explicit Ckpt
    // here A/B-measured slightly WORSE — the barrier costs more than
    // the reuse gamble at bench scale)
    val prefix = sh.join(df, Seq("shingle"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .join(sizes, Seq("doc_id"))
      .filter(col("pos") <= col("nsh") - ceil(lit(threshold) * col("nsh")) + lit(1))
      .select(col("doc_id"), col("nsh"), col("shingle"))
    prefix.select(col("doc_id").as("a"), col("nsh").as("na"), col("shingle"))
      .join(prefix.select(col("doc_id").as("b"), col("nsh").as("nb"), col("shingle")),
        Seq("shingle"))
      .filter(col("a") < col("b"))
      .filter(greatest(col("na"), col("nb")) * threshold <= least(col("na"), col("nb")))
      .select("a", "b").distinct()
  }

  /** EXACT n-gram Jaccard >= threshold at scale: prefix-filtered
    * candidates + exact verification. Unlike [[ngramJaccardPairs]]'s df
    * cap (which redefines Jaccard over rare shingles), this is the true
    * Jaccard over FULL shingle sets with provably complete recall — the
    * preferred shipping path.
    */
  def prefixJaccardPairs(shRaw: DataFrame, threshold: Double): DataFrame = {
    val sh = hashedShingles(shRaw)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    verifyJaccardHashed(sh, sizes,
      prefixCandidatesHashed(sh, sizes, threshold), threshold)
  }

  /** Per-shingle 64-bit projection = the first 16 hex nibbles of
    * md5(shingle). md5 is available bit-identically in Spark AND DuckDB,
    * which makes the whole simhash pipeline oracle-checkable in SQL
    * (bit i of shingle s = ((hexval(md5(s)[i/4]) >> (i%4)) & 1).
    */
  private val simhashUdf = udf((shingles: Seq[String]) => {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](SimHashBits)
    shingles.foreach { s =>
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var i = 0
      while (i < SimHashBits) {
        val nib = i >> 2                   // hex-char index in the md5 string
        val byte = d(nib >> 1) & 0xff
        val nibVal = if ((nib & 1) == 0) (byte >>> 4) & 0xf else byte & 0xf
        if (((nibVal >> (i & 3)) & 1) == 1) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < SimHashBits) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  })

  /** SimHash values per doc: (doc_id, simhash long). */
  def simhash(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id").agg(collect_list("shingle").as("shs"))
      .withColumn("simhash", simhashUdf(col("shs")))
      .select("doc_id", "simhash")

  /** SimHash near-dup pairs with hamming distance <= maxHamming. Blocked
    * by chunk equality over a partition of the 64 bits into maxHamming+1
    * chunks: a pair differing in <= maxHamming bits cannot differ in ALL
    * chunks (pigeonhole), so recall is exact for ANY maxHamming — the
    * chunk count is derived from the parameter, never assumed. At the
    * default h=3 this is the classic 4 x 16-bit scheme. Candidate volume
    * grows as chunks narrow (h=16 -> 17 x ~3-bit keys), which is the
    * honest cost of a loose radius; exact hamming verification follows.
    */
  def simhashPairs(sh: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < SimHashBits,
      s"maxHamming must be in [0, $SimHashBits)")
    val s = simhash(sh)
    val nChunks = maxHamming + 1
    val w = SimHashBits / nChunks // last chunk absorbs the remainder bits
    val lastMask = -1L >>> ((nChunks - 1) * w) // unsigned: top chunk keyed whole
    val chunked = s.withColumn("chunk", explode(sequence(lit(0), lit(nChunks - 1))))
      .withColumn("ckey", expr(
        s"if(chunk < ${nChunks - 1}, (simhash >> (chunk * $w)) & ${(1L << w) - 1}," +
          s" shiftrightunsigned(simhash, ${(nChunks - 1) * w}) & $lastMask)"))
    val cands = chunked.select(col("chunk"), col("ckey"),
        col("doc_id").as("a"), col("simhash").as("ha"))
      .join(chunked.select(col("chunk"), col("ckey"),
        col("doc_id").as("b"), col("simhash").as("hb")), Seq("chunk", "ckey"))
      .filter(col("a") < col("b"))
      .select("a", "b", "ha", "hb").distinct()
    cands
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  /** Canonical representative per near-duplicate cluster — the step a
    * training-data pipeline actually runs AFTER pair generation: near-dup
    * pairs chain (a~b, b~c with a,c not directly paired), so keep/drop
    * must be decided per connected COMPONENT of the pair graph, not per
    * pair (dropping one side of every pair over-deletes chains and can
    * drop every member of a triangle). Canonical = min doc id in the
    * component (deterministic, partitioning-independent). Output:
    * (doc_id, canonical_id) for every doc in at least one pair; the
    * keep/drop policy downstream is `keep where doc_id = canonical_id`
    * (docs with no pairs never enter the frame and are implicitly kept).
    * Scale: iterated min-label propagation over the PAIR set — cost is
    * bounded by pair volume and component diameter, never corpus^2.
    */
  def canonicalize(spark: SparkSession, pairs: DataFrame): DataFrame =
    graft.cluster.ConnectedComponents.run(spark,
      pairs.select(col("a").as("id")).union(pairs.select(col("b").as("id"))),
      pairs.select(col("a").as("src"), col("b").as("dst")))
      .select(col("id").as("doc_id"), col("comp").as("canonical_id"))

  /** Quality-based representative per near-dup cluster: instead of
    * keeping the min-id member ([[canonicalize]]'s default policy), keep
    * the BEST one — the member maximizing `quality` (ties → smallest
    * doc_id), the keep-the-longest/cleanest-copy rule production corpus
    * dedup actually wants (a near-dup cluster usually mixes a full
    * article with truncated or boilerplate-wrapped copies).
    *
    * `canon` is [[canonicalize]]'s output; `quality(doc_id, <qualityCol>)`
    * any per-doc score frame. One equi-join + one window partitioned by
    * cluster (group size = cluster size, already bounded by the pair
    * graph's components). Output one row per cluster:
    * (canonical_id, rep_doc_id, rep_quality, n_members).
    */
  def bestRepresentatives(canon: DataFrame, quality: DataFrame,
                          qualityCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("canonical_id"))
    val members = canon.join(quality, "doc_id")
    members
      .withColumn("rn", row_number().over(
        w.orderBy(col(qualityCol).desc, col("doc_id").asc)))
      .withColumn("n_members", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("canonical_id"), col("doc_id").as("rep_doc_id"),
        col(qualityCol).as("rep_quality"), col("n_members"))
  }

  /** Embedding-cosine near-dup pairs, EXACT variant: block-nested join.
    * O(n^2) — test-oracle scope only (below ~10^4 vectors); the shipping
    * path is [[signLshPairs]].
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    import graft.functions.Similarity
    val a = emb.select(col(idCol).as("a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("b"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .filter(col("a") < col("b"))
      .withColumn("cos", Similarity.cosineCol(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
  }

  /** Embedding-cosine near-dup pairs, SCALE variant: banded sign-LSH.
    * Each band hashes `dimsPerBand` coordinate signs into a bucket;
    * candidates share a bucket in ANY band (union over bands), then get
    * exact cosine verification. Shuffle volume is bands x n plus the
    * within-bucket pairs — never n^2. Recall rises with more bands
    * (collision prob per band for vectors at angle θ ~ prod of sign
    * agreements); axis-aligned planes keep the bucket SQL-expressible
    * for the oracle.
    */
  def signLshPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, bands: Int = 4,
                   dimsPerBand: Int = 4): DataFrame = {
    import graft.functions.Similarity
    val bandCols = (0 until bands).map { bnd =>
      val bucket = (0 until dimsPerBand).map { j =>
        when(element_at(col("vec"), bnd * dimsPerBand + j + 1) >= 0f,
          lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(bnd).as("band"), bucket.as("bucket"))
    }
    val banded = emb
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bb", explode(array(bandCols: _*)))
      .select(col("id"), col("vec"), col("bb.band"), col("bb.bucket"))
    // carry the vectors THROUGH the self-join and dedup multi-band
    // collisions with first() per (a, b) — the values are functions of
    // the ids, so first() is deterministic, the grouping keys stay
    // scalar (no distinct over float arrays), and the old two hydrate
    // joins (each a full corpus re-scan + shuffle) disappear: one scan
    // total, with the self-join sides sharing one exchange.
    cands(banded)
      .withColumn("cos", Similarity.cosineCol(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
  }

  /** Within-bucket candidate pairs of `banded` (id, vec, band, bucket),
    * vectors carried through, deduped across bands.
    */
  private def cands(banded: DataFrame): DataFrame =
    banded.select(col("band"), col("bucket"),
        col("id").as("a"), col("vec").as("va"))
      .join(banded.select(col("band"), col("bucket"),
        col("id").as("b"), col("vec").as("vb")), Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(first(col("va")).as("va"), first(col("vb")).as("vb"))
}
