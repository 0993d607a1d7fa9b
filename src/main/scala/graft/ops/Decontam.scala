package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag corpus documents
  * that share any word n-gram with a benchmark/eval set (the standard
  * 13-gram-overlap protocol used for pretraining-data hygiene).
  *
  * Scale shape: the benchmark side is distinct-ed, hashed to a fixed-width
  * digest, and broadcast — at 100 TB the corpus side streams through one
  * codegen stage (split -> n-gram transform -> explode -> hash) straight
  * into the BroadcastHashJoin, so the join filters BEFORE any corpus
  * shuffle: only contaminated n-grams (rare by construction) reach the
  * count-distinct exchange. A doc repeating one contaminated n-gram
  * 1000x still counts it once — dedup happens in the aggregate, after
  * the broadcast filter, not in a full-corpus distinct before it.
  */
object Decontam {

  /** Per-document count of distinct n-grams shared with `benchmark`.
    * Docs with no overlap are absent (semi-join semantics — the common
    * case at scale where overlap is rare).
    */
  def hits(corpus: DataFrame, benchmark: DataFrame,
           textCol: String, idCol: String, n: Int): DataFrame = {
    val bench = benchmark
      .select(explode(TextAnalysis.wordNgrams(col(textCol), n)).as("ng"))
      .select(md5(col("ng")).as("ngh"))
      .distinct()
    corpus
      .select(col(idCol), explode(TextAnalysis.wordNgrams(col(textCol), n)).as("ng"))
      .select(col(idCol), md5(col("ng")).as("ngh"))
      .join(broadcast(bench), "ngh")
      .groupBy(idCol)
      .agg(countDistinct(col("ngh")).as("n_contaminated_ngrams"))
  }
}
