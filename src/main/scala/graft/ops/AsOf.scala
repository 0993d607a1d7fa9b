package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (most-recent-prior) join — the temporal-join primitive a
  * training-data pipeline needs for point-in-time-correct feature
  * attribution (e.g. "the ad click that preceded this purchase", "the
  * registry snapshot in force when this document arrived").
  *
  * Spark has no ASOF JOIN operator; the naive encodings are a range
  * join (`l.key = r.key AND r.ts <= l.ts` + a max-per-left reduction),
  * which Catalyst executes as an O(|L|·|R|)-per-key BroadcastNestedLoop
  * or a row-exploding sort-merge, or a windowed self-join that still
  * materializes every (left, earlier-right) pair. Both collapse at
  * scale. This implementation is the single-sweep encoding: union the
  * two sides into one keyed stream, sort each key's rows by time within
  * ONE hash shuffle, and carry the latest right-side payload forward
  * with `last(..., ignoreNulls)` over a running window. Cost is one
  * shuffle + one per-partition sort — the same shape as any groupBy on
  * the key — and never materializes a pair that isn't emitted.
  *
  * Semantics (matching DuckDB/standard ASOF JOIN with `l.ts >= r.ts`):
  * each left row joins the single right row with the greatest
  * `rightTs <= leftTs` on the same key; ties at equal timestamp match
  * (the right side sorts before the left at the same instant); left
  * rows with no prior right row are dropped (inner). Among multiple
  * right rows sharing (key, ts) the greatest payload struct wins —
  * deterministic under any partitioning; pre-dedup the right side if
  * that tiebreak is not the intended one. Rows with a null key or null
  * timestamp never match and are excluded.
  *
  * Scale shape at 100 TB: parallelism = hash partitions of the key
  * space; per-task memory is bounded by the densest single key (a
  * sort-based window, so it spills rather than OOMs). Salting does not
  * apply — the window's order dependency needs each key resident in one
  * partition — so a pathologically hot key is bounded by that key's own
  * row count, not the table size.
  */
object AsOf {

  /** Join each `left` row to the most recent `right` row at-or-before
    * its timestamp on `key`. Output columns: all of `left`'s, then all
    * of `right`'s except `key` (callers alias timestamp columns apart
    * beforehand).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rPay = right.columns.toSeq.filterNot(_ == key)
    require(lCols.intersect(rPay).isEmpty,
      s"left/right column collision: ${lCols.intersect(rPay).mkString(",")}")
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields.filterNot(_.name == key))

    val rSide = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(rPay.map(col): _*).as("__r"), lit(null).cast(lType).as("__l"))
    val lSide = left
      .filter(col(key).isNotNull && col(leftTs).isNotNull)
      .select(col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rType).as("__r"), struct(lCols.map(col): _*).as("__l"))

    // One shuffle on the key; running frame ordered (ts, side, payload):
    // right rows precede left rows at the same instant (inclusive match)
    // and equal-ts right rows resolve to the greatest payload.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rSide.unionByName(lSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(lCols.map(c => col("__l")(c).as(c)) ++
        rPay.map(c => col("__m")(c).as(c)): _*)
  }
}
