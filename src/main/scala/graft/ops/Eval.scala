package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation metrics (test-harness scope, like the reference's
  * ClusteringHelper): B-cubed precision/recall for clusterings
  * (nilcluster/Packages/ClusteringHelper.py:250-267) and mention-level
  * P/R with the reference's match-predicate taxonomy
  * (tintner/entity.py:78-136).
  */
object Eval {

  /** B³ precision/recall: input (item, cluster, gold). For each item,
    * p = |cluster ∩ gold-class| / |cluster|, r = same / |gold-class|;
    * scores are means over items. Pure DataFrame — scales to any corpus.
    */
  /** Optimal cluster-to-gold alignment score (A10 — the reference's
    * Hungarian `linear_sum_assignment`, ClusteringHelper.py:218-247).
    * Driver-side on a collected small matrix, like the reference:
    * input cost(i)(j); returns the minimum-total-cost assignment as
    * (row -> col) pairs. O(n^3) Hungarian (Jonker-style potentials).
    */
  def hungarian(cost: Array[Array[Double]]): Seq[(Int, Int)] = {
    val n = cost.length
    if (n == 0) return Seq.empty
    val m = cost(0).length
    require(m >= n, "cost matrix needs cols >= rows; pad if necessary")
    // potentials + matching over columns (1-indexed internal arrays)
    val u = new Array[Double](n + 1)
    val v = new Array[Double](m + 1)
    val p = new Array[Int](m + 1)   // p(j) = row matched to column j
    val way = new Array[Int](m + 1)
    for (i <- 1 to n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(m + 1)(Double.MaxValue)
      val used = new Array[Boolean](m + 1)
      var break = false
      while (!break) {
        used(j0) = true
        val i0 = p(j0)
        var delta = Double.MaxValue
        var j1 = 0
        for (j <- 1 to m if !used(j)) {
          val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
          if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
          if (minv(j) < delta) { delta = minv(j); j1 = j }
        }
        for (j <- 0 to m) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
        }
        j0 = j1
        if (p(j0) == 0) break = true
      }
      while (j0 != 0) {
        val j1 = way(j0)
        p(j0) = p(j1)
        j0 = j1
      }
    }
    (1 to m).collect { case j if p(j) != 0 => (p(j) - 1, j - 1) }.sorted.toSeq
  }

  def bCubed(assign: DataFrame): (Double, Double) = {
    val withSizes = assign
      .join(assign.groupBy("cluster").agg(count(lit(1)).as("csize")), Seq("cluster"))
      .join(assign.groupBy("gold").agg(count(lit(1)).as("gsize")), Seq("gold"))
    val inter = assign.groupBy("cluster", "gold").agg(count(lit(1)).as("both"))
    val scored = withSizes.join(inter, Seq("cluster", "gold"))
      .withColumn("p", col("both").cast("double") / col("csize"))
      .withColumn("r", col("both").cast("double") / col("gsize"))
    val row = scored.agg(avg("p").as("p"), avg("r").as("r")).collect()(0)
    (row.getDouble(0), row.getDouble(1))
  }

  /** Mention-match taxonomy (reference entity.py:78-136): given predicted
    * and gold mention spans per doc, classify each predicted span as
    * strong (exact start+end), left (same start), right (same end),
    * approximate (overlap), or none. Typed variants add type equality.
    */
  def matchClasses(pred: DataFrame, gold: DataFrame): DataFrame = {
    val p = pred.select(col("doc_id"), col("start").as("ps"),
      col("end").as("pe"), col("mention_type").as("pt"))
    val g = gold.select(col("doc_id"), col("start").as("gs"),
      col("end").as("ge"), col("mention_type").as("gt"))
    p.join(g, Seq("doc_id"), "left")
      .withColumn("klass",
        when(col("gs").isNull, "none")
          .when(col("ps") === col("gs") && col("pe") === col("ge"), "strong")
          .when(col("ps") === col("gs"), "left")
          .when(col("pe") === col("ge"), "right")
          .when(col("ps") < col("ge") && col("gs") < col("pe"), "approximate")
          .otherwise("none"))
      .withColumn("typed", col("klass") =!= "none" && col("pt") === col("gt"))
      // best match per predicted span: strong > left > right > approximate
      .withColumn("rank_", when(col("klass") === "strong", 0)
        .when(col("klass") === "left", 1)
        .when(col("klass") === "right", 2)
        .when(col("klass") === "approximate", 3).otherwise(4))
      .groupBy(col("doc_id"), col("ps"), col("pe"))
      // tie-break inside a rank class prefers the TYPE-MATCHING gold
      // (typed sorts ascending in a struct min, so invert it to 0/1)
      .agg(min(struct(col("rank_"),
        when(col("typed"), 0).otherwise(1).as("untyped"),
        col("klass"))).as("best"))
      .select(col("doc_id"), col("ps").as("start"), col("pe").as("end"),
        col("best.klass").as("klass"),
        (col("best.untyped") === 0).as("typed"))
  }

  /** Exact ROC-AUC (Mann–Whitney with midrank tie handling) as a
    * distributed rank-free computation: AUC = P(score_pos > score_neg)
    * + 0.5 * P(tie). A global `row_number` over all rows would be a
    * single-task sort; instead (1) collapse to per-DISTINCT-score
    * (n_pos, n_neg) counts — one hash-agg, frame size = |distinct
    * scores|, not rows; (2) two-level prefix sum for "negatives below":
    * per-bucket totals (bucket = floor(score), monotone in score) get a
    * window over the tiny distinct-bucket frame, then the within-bucket
    * running sum runs partitioned BY bucket — no unpartitioned
    * row-level window anywhere. The numerator is kept as the integer
    * 2*U = sum(n_pos_s * (2*cum_neg_below + n_neg_s)) so every engine
    * computes it exactly; the only float op is the final division.
    * Counts must stay below 2^63 per score (BIGINT sums).
    *
    * Input: any frame; `score` numeric, `isPos` boolean. Output: one row
    * (auc, n_pos, n_neg).
    */
  def auc(df: DataFrame, score: org.apache.spark.sql.Column,
          isPos: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // checkpoint the distinct-score aggregate: two branches (bucket
    // totals + the main cum-sum) consume it, and uncached the bucket
    // branch would re-execute the whole corpus scan (exchange-reuse
    // does not survive the differing downstream aggregations)
    val g = graft.Ckpt(df.select(score.cast("double").as("s"),
        when(isPos, 1L).otherwise(0L).as("p"))
      .groupBy(col("s"))
      .agg(sum(col("p")).as("np"), sum(lit(1L) - col("p")).as("nn"))
      .withColumn("bkt", floor(col("s")).cast("long")))
    val bktBelow = g.groupBy(col("bkt")).agg(sum(col("nn")).as("bn"))
      .withColumn("below", coalesce(
        sum(col("bn")).over(Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("below"))
    val inBkt = Window.partitionBy(col("bkt")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.join(broadcast(bktBelow), Seq("bkt"))
      .withColumn("cum_neg",
        col("below") + coalesce(sum(col("nn")).over(inBkt), lit(0L)))
      .agg(
        sum(col("np") * (lit(2L) * col("cum_neg") + col("nn"))).as("num2"),
        sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      .select(
        (col("num2").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double")).as("auc"),
        col("n_pos"), col("n_neg"))
  }
}
