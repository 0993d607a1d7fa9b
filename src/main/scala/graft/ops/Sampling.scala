package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment.
  *
  * Training pipelines need REPRODUCIBLE sampling: the same document must
  * land in the same train/eval split on every run, at every scale, on
  * any engine, under any partitioning — which rules out `rand()` (RNG
  * state per partition), `TABLESAMPLE` (physical-layout dependent) and
  * `hash()` (engine-specific). The bucket here is a pure function of the
  * row's own content: the first 4 hex characters of `md5(value)` compared
  * lexicographically against cumulative-weight thresholds. Lowercase hex
  * compares identically to its numeric value, md5 is bit-identical across
  * engines, and the whole thing is a narrow per-row expression — no
  * shuffle, no RNG, trivially expressible in ANSI SQL for audit queries.
  * Granularity is 1/65536; at a billion rows each split lands within
  * ~0.01% of its weight (binomial concentration).
  */
object Sampling {

  /** Upper-threshold hex keys (4 lowercase hex chars) for all splits but
    * the last — the SQL-visible contract (`substr(md5(x),1,4) < 'cccc'`).
    */
  def hexThresholds(weights: Seq[Double]): Seq[String] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    weights.scanLeft(0.0)(_ + _).tail.init
      .map(w => f"${math.floor(w / total * 65536).toInt}%04x")
  }

  /** Split index in [0, weights.size) for `c`, deterministic in its value. */
  def splitIndex(c: Column, weights: Seq[Double]): Column = {
    val h = substring(md5(c), 1, 4)
    hexThresholds(weights).zipWithIndex.reverse
      .foldLeft(lit(weights.size - 1): Column) { case (acc, (t, i)) =>
        when(h < lit(t), lit(i)).otherwise(acc)
      }
  }

  /** Keep-predicate for a deterministic `rate` sample of rows by `c`. */
  def sampled(c: Column, rate: Double): Column = {
    require(rate > 0 && rate <= 1, "rate must be in (0, 1]")
    val t = math.floor(rate * 65536).toInt
    if (t >= 65536) lit(true)
    else substring(md5(c), 1, 4) < lit(f"$t%04x")
  }

  /** Stratified keep-predicate: per-stratum rates (e.g. downsample the
    * dominant language, keep rare ones whole). Same md5-prefix contract
    * as [[sampled]], so membership stays a pure function of the row —
    * rebalancing strata never reshuffles which rows survive within one.
    */
  def stratifiedSampled(c: Column, stratum: Column,
                        rates: Seq[(String, Double)],
                        defaultRate: Double): Column =
    rates.foldRight(sampled(c, defaultRate)) { case ((k, r), acc) =>
      when(stratum === lit(k), sampled(c, r)).otherwise(acc)
    }

  /** Token-budget corpus mixing: within each stratum keep documents in
    * the deterministic md5 order until the stratum's cumulative token
    * count reaches its budget ("give me 2B English tokens, 500M of each
    * other language"). A doc is kept iff the running sum INCLUDING itself
    * stays within budget, so the output never exceeds the budget and is a
    * prefix of the stratified order — raising a budget only ADDS docs.
    *
    * Plan: one shuffle (window partitioned by stratum). The running sum
    * is sequential per stratum by nature, so at 100 TB first cut the
    * stratum near its budget with [[stratifiedSampled]] (rate ≈
    * budget/stratum_tokens from table stats) and run this exact pass on
    * the surviving ~budget-sized slice; the window then sums millions of
    * rows, not billions.
    */
  /** Weighted-sampling priority (Efraimidis–Spirakis "A-ES"): sampling k
    * rows WITHOUT replacement with probability proportional to `weight`
    * reduces to taking the top-k rows by `u^(1/w)` where u ~ U(0,1) —
    * equivalently (monotone transform) by `ln(u)/w`, which avoids `pow`'s
    * cross-engine rounding. u derives from the row's own md5 (same
    * engine-portability contract as [[sampled]]): the first 8 hex chars
    * as a 32-bit integer, +0.5 so u is never 0, over 2^32. Pair with
    * `TopK.topKPerKey` for the scale path: the top-k is a map-side
    * combining aggregate — no global sort, shuffle volume = keys x k —
    * exactly the distributed weighted reservoir of Efraimidis & Spirakis
    * (IPL 97(5), 2006) with deterministic, partitioning-independent
    * output.
    */
  def weightedPriority(c: Column, weight: Column): Column = {
    val u = (conv(substring(md5(c), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    log(u) / weight.cast("double")
  }

  def tokenBudget(df: DataFrame, idCol: String, stratumCol: String,
                  tokensCol: Column, budgets: Seq[(String, Long)],
                  defaultBudget: Long): DataFrame = {
    val budget = budgets.foldRight(lit(defaultBudget): Column) {
      case ((k, b), acc) => when(col(stratumCol) === lit(k), lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }
}
