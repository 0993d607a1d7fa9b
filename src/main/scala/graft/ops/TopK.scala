package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Two-stage top-k per key (T5 scale note in SURVEY.md §2.6).
  *
  * `row_number().over(Window.partitionBy(key).orderBy(...))` shuffles and
  * sorts EVERY candidate row. This aggregator keeps only the current
  * top-k per key inside the aggregation buffer, so the map side combines
  * before the shuffle — shuffle volume drops from all candidates to
  * (keys x k). Ordering: score desc, then id asc (the W1 deterministic
  * tie-break).
  *
  * Buffer bound: k is small (reference top_k default 10,
  * indexer/main.py:138-143), so the buffer is a k-element sorted list —
  * insertion is O(k), exactly like the partial top-k a native engine
  * would run.
  */
object TopK {

  final case class ScoredId(score: Double, id: Long)

  private def insert(buf: List[ScoredId], v: ScoredId, k: Int): List[ScoredId] = {
    // descending score, ascending id
    val (before, after) = buf.span(b =>
      b.score > v.score || (b.score == v.score && b.id < v.id))
    val merged = before ::: (v :: after)
    if (merged.length > k) merged.take(k) else merged
  }

  final class TopKAgg(k: Int) extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
    def zero: List[ScoredId] = Nil
    def reduce(b: List[ScoredId], v: ScoredId): List[ScoredId] = insert(b, v, k)
    def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
      b.foldLeft(a)((acc, v) => insert(acc, v, k))
    def finish(b: List[ScoredId]): Seq[ScoredId] = b
    def bufferEncoder: Encoder[List[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** topK(df, keys, scoreCol, idCol, k) -> one row per (keys..., id,
    * score, rnk) with rnk 1..k per key — same contract as the window
    * formulation, one partial-aggregating shuffle instead of a sort.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], scoreCol: String,
                 idCol: String, k: Int): DataFrame = {
    // the case-class input encoder flattens to two scalar arguments
    val agg = udaf(new TopKAgg(k), Encoders.product[ScoredId])
    df.groupBy(keys.map(col): _*)
      .agg(agg(col(scoreCol), col(idCol).cast("long")).as("top"))
      .select(keys.map(col) :+ posexplode(col("top")).as(Seq("pos", "t")): _*)
      .select(keys.map(col) ++ Seq(
        col("t.id").as(idCol),
        col("t.score").as(scoreCol),
        (col("pos") + 1).as("rnk")): _*)
  }
}
