package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) of two
  * independently ranked candidate lists — the standard way a curation /
  * retrieval stack combines a lexical ranker (BM25) with a dense
  * embedding ranker without score calibration, since RRF consumes only
  * RANKS: rrf(d) = Σ_lists 1/(k + rank_list(d)).
  *
  * Plan shape at 100 TB: each input list is cut to `perList` rows FIRST
  * via orderBy(...).limit(n) — Spark plans TakeOrderedAndProject, a
  * per-partition heap + driver merge, never a global sort. Only the two
  * bounded lists (≤ perList rows each) ever enter the unpartitioned
  * row_number window and the full-outer join, so the single-partition
  * window is O(perList), not O(corpus) — the same bounded-candidate
  * contract a production fusion layer has.
  *
  * Determinism across engines: ranks are integers; the double formula
  * 1/(rank + k) is one division per list and one addition, mirrored
  * with identical association in the DuckDB oracle, then quantized to a
  * scaled long.
  */
object Fusion {

  /** Fuse two score frames on `idCol`. Each side is ranked by
    * (score desc, id asc) within its top-`perList` cut; a doc missing
    * from one list contributes nothing for that list (its rank column
    * reports 0). Output: (id, rank_a, rank_b, rrf_scaled), the global
    * top-`topK` by fused score.
    */
  def rrf(a: DataFrame, aScore: Column, b: DataFrame, bScore: Column,
          idCol: String, perList: Int = 100, k: Int = 60,
          topK: Int = 50): DataFrame = {
    def ranked(df: DataFrame, score: Column, rankCol: String): DataFrame =
      df.orderBy(score.desc, col(idCol).asc).limit(perList)
        .withColumn(rankCol,
          row_number().over(Window.orderBy(score.desc, col(idCol).asc)))
        .select(col(idCol), col(rankCol))

    def contrib(rank: String): Column = when(col(rank).isNotNull,
      lit(1.0) / (col(rank).cast("double") + lit(k.toDouble))).otherwise(lit(0.0))

    ranked(a, aScore, "rank_a")
      .join(ranked(b, bScore, "rank_b"), Seq(idCol), "full_outer")
      .withColumn("rrf_scaled",
        round((contrib("rank_a") + contrib("rank_b")) * lit(1e9)).cast("long"))
      .select(col(idCol), coalesce(col("rank_a"), lit(0)).as("rank_a"),
        coalesce(col("rank_b"), lit(0)).as("rank_b"), col("rrf_scaled"))
      .orderBy(col("rrf_scaled").desc, col(idCol).asc)
      .limit(topK)
  }
}
