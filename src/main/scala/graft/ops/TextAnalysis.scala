package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure column expressions (whole-stage codegen) —
  * no UDF in the per-row hot path except the rolling-hash fingerprint.
  */
object TextAnalysis {

  /** Whitespace token count (fast path) — `size(split(...))`. */
  def tokenCount(text: Column): Column =
    size(split(text, "\\s+"))

  /** BPE-ish subword count: word-piece heuristic counting runs of
    * letters/digits plus standalone punctuation marks, approximating a
    * tokenizer's token count without a vocab.
    */
  def subwordCount(text: Column): Column =
    size(split(text, "(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})|\\s+|(?=[^\\p{L}\\p{N}\\s])"))

  /** Quality features per document: length, token stats, duplication,
    * stopword ratio, punctuation ratio.
    */
  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    val toks = split(text, "\\s+")
    df.withColumn("n_chars_q", length(text))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)))
      .withColumn("dup_token_ratio",
        lit(1.0) - col("n_distinct_tokens").cast("double") /
          greatest(col("n_tokens"), lit(1)).cast("double"))
      .withColumn("stopword_ratio",
        size(filter(toks, t => t.isin("the", "a", "of", "and"))).cast("double") /
          greatest(col("n_tokens"), lit(1)).cast("double"))
      .withColumn("punct_ratio",
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
          greatest(length(text), lit(1)).cast("double"))
  }

  /** Language-ID heuristic: stopword-hit scoring against tiny per-lang
    * dictionaries (n-gram/stopword heuristic; deterministic, vocab-based).
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "et", "les"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = split(lower(text), "\\s+")
    langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> (size(filter(toks, t => t.isin(words: _*))).cast("double") /
        greatest(size(toks), lit(1)).cast("double"))
    }
  }

  /** Predicted language: argmax score, tie-break lang asc, 'und' if all
    * scores are zero.
    */
  def langId(text: Column): Column = {
    val scored = langScores(text)
    val best = scored.reduceLeft[(String, Column)] { case ((la, ca), (lb, cb)) =>
      // strict > keeps the lexicographically-first lang on ties
      (la, when(cb > ca, cb).otherwise(ca))
    }
    val bestLang = scored.foldLeft(lit("und")) { case (acc, (lang, c)) =>
      when(c === best._2 && c > 0.0 && acc === "und", lit(lang)).otherwise(acc)
    }
    bestLang
  }

  /** Word n-grams as an array column (single-space tokenization to stay
    * byte-identical with SQL engines' string_split). Empty array — not a
    * descending `sequence` — when the doc has fewer than n words.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val ws = split(text, " ")
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-style n-gram repetition stats: per-doc total vs distinct
    * bigram/trigram counts plus a duplication flag
    * (`dup bigram fraction > num/den`, compared in exact integer math so
    * SQL oracles agree bit-for-bit). Unigram duplication is already covered
    * by [[qualityFeatures]]; repeated n-grams catch boilerplate/spam docs
    * whose vocabulary looks diverse. Pure column expressions — the whole
    * filter runs inside one codegen stage, no shuffle.
    */
  def ngramRepetition(df: DataFrame, text: Column,
                      flagNum: Long = 1L, flagDen: Long = 10L): DataFrame = {
    val bi = wordNgrams(text, 2)
    val tri = wordNgrams(text, 3)
    df.withColumn("n_bigrams", size(bi).cast("long"))
      .withColumn("n_distinct_bigrams", size(array_distinct(bi)).cast("long"))
      .withColumn("n_trigrams", size(tri).cast("long"))
      .withColumn("n_distinct_trigrams", size(array_distinct(tri)).cast("long"))
      .withColumn("rep_flagged",
        (col("n_bigrams") - col("n_distinct_bigrams")) * lit(flagDen) >
          col("n_bigrams") * lit(flagNum))
  }

  /** Bigram language-model estimation over a corpus: maximum-likelihood
    * conditional probabilities P(w2 | w1) = c(w1 w2) / c(w1 ·) — the
    * count stage of a KenLM-style n-gram LM used for perplexity-based
    * quality filtering of training data (public technique: CCNet,
    * Wenzek et al. 2020).
    *
    * Plan shape at 100 TB: bigrams come from one narrow
    * split+transform+explode projection (codegen), then ONE hash
    * aggregate on (w1, w2) with map-side partial combine — the only
    * corpus-size shuffle. The prefix counts c(w1 ·) are re-aggregated
    * from the (much smaller) bigram-count frame, never from a second
    * corpus scan, and the prefix join keys on w1 where both sides are
    * already aggregates. Global top-k is orderBy(...).limit(k) —
    * TakeOrderedAndProject, never a global sort.
    *
    * Determinism: counts are exact longs; p is one double division
    * quantized to a scaled long (same IEEE op in the SQL oracle).
    */
  def bigramLm(df: DataFrame, textCol: String, topK: Int = 20): DataFrame = {
    val pairs = df
      .select(split(lower(col(textCol)), "\\s+").as("t"))
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val c1 = c2.groupBy("w1").agg(sum(col("n")).as("n1"))
    c2.join(c1, Seq("w1"))
      .withColumn("p_scaled",
        round(col("n").cast("double") / col("n1").cast("double") * lit(1e6))
          .cast("long"))
      .select("w1", "w2", "n", "p_scaled")
      .orderBy(col("n").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Rolling polynomial fingerprint over tokens (64-bit, deterministic):
    * document-level content hash robust to whitespace layout.
    */
  val fingerprintUdf = udf((text: String) => {
    var h = 1469598103934665603L // FNV offset
    text.split("\\s+").foreach { tok =>
      var i = 0
      while (i < tok.length) { h = (h ^ tok.charAt(i)) * 1099511628211L; i += 1 }
      h = (h ^ ' ') * 1099511628211L
    }
    h
  })
}
