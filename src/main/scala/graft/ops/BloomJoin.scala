package graft.ops

import org.apache.spark.sql.{DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-shuffle row pruning for joins — the explicit form of
  * Spark's runtime row-level filter injection, usable where the optimizer
  * won't inject one (filter side too large to estimate, join buried behind
  * a checkpoint, or the caller wants a guaranteed prune).
  *
  * Shape at 10^12-row scale: the build side is aggregated into ONE bloom
  * sketch (map-side partial merge, bytes proportional to `numBits`, not to
  * rows); the probe is a codegen'd `might_contain` on the big side BEFORE
  * its shuffle, so rows that cannot match never leave the scan stage. The
  * trailing exact semi-join only sees survivors (true matches + the fpp
  * tail), which keeps the final shuffle proportional to the match set.
  *
  * Exactness: bloom false positives are removed by the trailing semi-join,
  * so results equal the plain semi-join bit-for-bit.
  */
object BloomJoin {

  /** Serialized bloom sketch over `df(key)` — one aggregation job with
    * partial (map-side) sketch merging; the result is a few MB on the
    * driver regardless of build-side row count.
    */
  def buildBloom(df: DataFrame, key: String,
                 expectedKeys: Long, numBits: Long): Array[Byte] = {
    val hashed = new XxHash64(Seq(GraftShim.expression(df(key))))
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    df.select(GraftShim.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** might_contain(bloom, xxhash64(key)) as a codegen'd filter Column. */
  private def mightContain(df: DataFrame, key: String, bloom: Array[Byte]) =
    GraftShim.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftShim.expression(df(key))))))

  /** Exact left-semi join of `large` against `small(key)`, with a bloom
    * pre-filter pruning `large` before any shuffle. ~8 bits/key, capped at
    * 64 Mbit (8 MiB broadcast payload).
    */
  def semiJoin(large: DataFrame, small: DataFrame, key: String,
               expectedKeys: Long = 4000000L): DataFrame = {
    val numBits = math.min(expectedKeys * 8L, 1L << 26)
    val bloom = buildBloom(small, key, expectedKeys, numBits)
    large.filter(mightContain(large, key, bloom))
      .join(small.select(col(key)).distinct(), Seq(key), "left_semi")
  }
}
