package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join — the scale encoding of
  * `point BETWEEN lo AND hi`.
  *
  * Catalyst plans a bare range predicate with no equi-key as a
  * BroadcastNestedLoopJoin: O(|points| · |intervals|) comparisons, the
  * first thing that dies at scale. The standard fix is to quantize the
  * value domain into buckets of a fixed width: each point lands in
  * exactly one bucket, each interval is replicated across the buckets it
  * overlaps, and the join becomes an EQUI-join on the bucket id plus a
  * residual range filter. Every true (point, interval) pair meets in
  * exactly one bucket — the point's — so no dedup is needed, and pairs
  * that share no bucket are never formed.
  *
  * Cost model: one hash shuffle each side; interval replication factor =
  * span/bucketWidth + 1, so pick bucketWidth near the median interval
  * span (replication ~2x) — much smaller and replication explodes, much
  * larger and each bucket degrades toward the cross product. Hot buckets
  * (burst seconds, batch-dated rows) are ordinary join skew: AQE's
  * skew-join split handles them, or compose with [[SkewJoin.saltedJoin]]
  * on the bucket column.
  *
  * Numeric domain: bucket ids come from `floor(value / bucketWidth)` in
  * double arithmetic — exact for |value| < 2^53, which covers epoch
  * micros (~2^50) and every epoch-seconds/days domain.
  */
object RangeJoin {

  /** Join each `points` row to every `intervals` row whose closed range
    * [`lo`, `hi`] contains `pt`. All three columns must be numeric (same
    * domain); output carries both sides' columns (names must not
    * collide). Intervals with `hi < lo` match nothing.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pt: String, lo: String, hi: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty, s"column collision: ${collisions.mkString(",")}")
    val p = points.filter(col(pt).isNotNull)
      .withColumn("__b", floor(col(pt) / bucketWidth))
    val i = intervals.filter(col(lo).isNotNull && col(hi).isNotNull &&
        col(lo) <= col(hi))
      .withColumn("__b", explode(sequence(
        floor(col(lo) / bucketWidth), floor(col(hi) / bucketWidth))))
    p.join(i, Seq("__b"))
      .filter(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop("__b")
  }

  /** Join each `left` row to every `right` row whose closed interval
    * overlaps it: [lLo,lHi] ∩ [rLo,rHi] ≠ ∅. Both sides replicate across
    * the buckets they span; an overlapping pair meets in every bucket
    * both cover, so exactly-once output needs a dedup rule — and there is
    * a shuffle-free one: `max(lLo, rLo)` lies inside BOTH intervals
    * whenever they overlap, so the pair is emitted only from the single
    * bucket containing that point. No `distinct` (which would be a second
    * full shuffle of the output) is ever needed. Same cost model and
    * bucketWidth guidance as [[pointInInterval]].
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions = left.columns.toSet.intersect(right.columns.toSet)
    require(collisions.isEmpty, s"column collision: ${collisions.mkString(",")}")
    def spans(df: DataFrame, lo: String, hi: String) =
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
        .withColumn("__b", explode(sequence(
          floor(col(lo) / bucketWidth), floor(col(hi) / bucketWidth))))
    spans(left, lLo, lHi).join(spans(right, rLo, rHi), Seq("__b"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__b") === floor(greatest(col(lLo), col(rLo)) / bucketWidth))
      .drop("__b")
  }
}
