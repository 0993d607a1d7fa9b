package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 ranked keyword retrieval over a tokenized corpus — the
  * search/ranking leg of a training-data curation stack (e.g. scoring
  * documents against a topic term list before sampling). Public
  * algorithm (Robertson & Walker, SIGIR'94; the +1 idf variant used by
  * Lucene keeps idf positive for terms present in most documents).
  *
  * Plan shape at 100 TB: ONE explode+hash-agg pass over the corpus
  * computes doc length AND the per-query-term tf together (conditional
  * sums — the query terms are a static list, so tf pivots into k agg
  * columns and unpivots back via explode-of-structs). Deriving dl and
  * tf as two
  * separate aggregates of the token stream (the round-3 first cut)
  * scanned and exploded the corpus twice — and a third time for the
  * scalar params — because the join's pushed-down isnotnull filters
  * break exchange-reuse canonicalization across branches (verified on
  * the executed AQE plan). The one-row-per-doc aggregate is persisted
  * (narrow: id + k+1 longs), so the params scalar and the stacked tf
  * rows both read the cache, never the corpus. df and (N, sum_dl)
  * broadcast. The final top-k is an orderBy(...).limit(k) — Spark
  * plans TakeOrderedAndProject, a per-partition heap, never a global
  * sort.
  *
  * Determinism across engines: every input to the formula (tf, df, dl,
  * N, sum_dl) is an exact integer; the double formula is written with
  * one fixed parenthesization mirrored verbatim in the DuckDB oracle
  * (IEEE ops are bit-deterministic given identical association), and
  * per-(doc, term) scores are quantized to scaled longs BEFORE the
  * per-doc sum, so the aggregation is associative long addition —
  * bit-identical under any shuffle order.
  */
object Bm25 {

  /** Top-k docs for a bag of query terms.
    * Output: (doc_id, n_terms, score_scaled) — score_scaled is the sum
    * over matched terms of round(bm25_term * 1e6) as a long.
    */
  def topDocs(docs: DataFrame, idCol: String, textCol: String,
              terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
              topK: Int = 10): DataFrame =
    scores(docs, idCol, textCol, terms, k1, b)
      .orderBy(col("score_scaled").desc, col("doc_id").asc)
      .limit(topK)

  /** Every matched doc's BM25 score, unlimited — the ranker leg for
    * fusion ([[Fusion.rrf]]); callers cut it with their own heap limit.
    */
  def scores(docs: DataFrame, idCol: String, textCol: String,
             terms: Seq[String], k1: Double = 1.2,
             b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    // distinct: duplicate terms would double-count; index-named agg
    // columns + an expression-built unpivot keep ARBITRARY term strings
    // legal (punctuation, quotes, non-ASCII) — a stack() assembled from
    // strings would both restrict content and collide on duplicates
    val ts = terms.distinct
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), "\\s+")).as("tok"))
    // ONE corpus pass: doc length + per-term tf as conditional sums.
    // Persisted (1 narrow row per doc) so every downstream branch reads
    // the cache instead of re-exploding the corpus.
    val perDoc = toks.groupBy("doc_id").agg(
      count(lit(1)).as("dl"),
      ts.zipWithIndex.map { case (t, i) =>
        sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"tf_$i") }: _*)
      .persist()
    val params = perDoc.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = perDoc.select(col("doc_id"), col("dl"),
      explode(array(ts.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("tok"), col(s"tf_$i").as("tf")) }: _*)).as("e"))
      .select(col("doc_id"), col("dl"), col("e.tok").as("tok"),
        col("e.tf").as("tf"))
      .filter(col("tf") > 0)
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)))
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)
    val s = idf * (col("tf").cast("double") * (lit(k1) + lit(1.0))) / denom

    tf.join(broadcast(dft), Seq("tok"))
      .crossJoin(broadcast(params))
      .withColumn("s_scaled", round(s * lit(1000000.0)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("s_scaled")).as("score_scaled"))
  }
}
