package graft.kb

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core.EntityRecord
import graft.fixtures.Gazetteer
import graft.link.Embed

/** Entity registry — the engine's KB side table (reference:
  * postgres/init.sql:1-11 + the FAISS index collapsed into an `emb`
  * column; entity id = registry row id, reference indexer/main.py:408-411).
  *
  * Seed rows derive deterministically from the gazetteer; new entities
  * (NIL clusters) are appended by the incremental loop via MERGE INTO
  * (see graft.tables.IceLite + graft.Incremental).
  */
object Registry {

  /** Read-only seed indexer id (reference tags indexes ro/rw,
    * indexer/main.py:439-476); new entities go to the rw indexer.
    */
  val RoIndexer = 0
  val RwIndexer = 1

  def seedRecords: Seq[EntityRecord] =
    Gazetteer.entities.map { e =>
      EntityRecord(
        id = e.id,
        indexer = RoIndexer,
        wikipedia_id = 100000L + e.id,
        wikidata_qid = 200000L + e.id,
        redirects_to = -1L,
        title = e.name.take(100), // varchar(100) truncation, init.sql:7
        descr = s"${e.etype} entity ${e.name}",
        type_ = e.etype,
        emb = Embed.embed(e.name))
    }

  def seed(spark: SparkSession): Dataset[EntityRecord] = {
    import spark.implicits._
    spark.createDataset(seedRecords)
  }

  /** S14: federated registry — N indexer tables (read-only snapshots +
    * the read-write head) unioned into one searchable frame; candidate
    * search then spans every indexer in one plan, entity identity being
    * (id, indexer) (reference searches all loaded FAISS indexes and
    * merges the result lists, indexer/main.py:439-476). Later tables win
    * duplicate (id, indexer) keys — the rw head shadows stale snapshots.
    */
  def federate(registries: Seq[DataFrame]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val tagged = registries.zipWithIndex
      .map { case (df, i) => df.withColumn("_fed_pos", lit(i)) }
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("id"), col("indexer"))
      .orderBy(col("_fed_pos").desc)
    tagged.withColumn("_fed_rn", row_number().over(w))
      .filter(col("_fed_rn") === 1)
      .drop("_fed_pos", "_fed_rn")
  }
}
