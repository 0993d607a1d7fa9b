package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Mention
import graft.fixtures.{Corpus, Gazetteer}
import graft.ner.TrieNer

/** End-to-end KB-population pipeline (north rule): interleaved spans ->
  * mention detection -> linking -> triples. Round-1 slice: gazetteer NER +
  * dictionary linking; embedding rerank / NIL clustering / KB merge are
  * layered on in later stages (see SURVEY.md §7).
  */
object Pipeline {

  /** Detected mentions over the sf-derived interleaved corpus. */
  def mentions(spark: SparkSession, dir: String): Dataset[Mention] =
    TrieNer.mentions(spark, Corpus.inputDocs(spark, dir))

  /** Dictionary linking for the round-1 slice: single-candidate mentions
    * link directly (reference skip rule, trie-ner/TrieNER.py:79-81);
    * ambiguous mentions resolve to the smallest candidate id
    * (deterministic placeholder until embedding rerank lands).
    * URL synthesis follows P9 (`TRIE{id}`, reference TrieNER.py:82-83).
    */
  def linked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bcPat = spark.sparkContext.broadcast(Gazetteer.patterns)
    val bcById = spark.sparkContext.broadcast(Gazetteer.byId)
    mentions(spark, dir).map { m =>
      val eid =
        if (m.gazetteer_id >= 0) m.gazetteer_id
        else {
          val pat = TrieNer.clean(m.mention).split(" +").mkString(" ")
          bcPat.value.get(pat).map(_.min).getOrElse(-1L)
        }
      val ent = bcById.value.get(eid)
      (m.doc_id, m.ann_id, m.start, m.end, m.mention, eid,
        ent.map(_.name).getOrElse(""), ent.map(_.etype).getOrElse(""),
        s"TRIE$eid")
    }.toDF("doc_id", "ann_id", "start", "end", "mention",
      "entity_id", "title", "entity_type", "url")
  }

  /** Emitted (subj, pred, obj) triples — deterministic rule extraction:
    *  - (doc:<id>, :mentions, ent:<title>) per linked mention (distinct)
    *  - (ent:<title>, :typedAs, <type>) per linked mention (distinct)
    *  - (ent:<a>, :coOccursWith, ent:<b>) for adjacent linked mentions of
    *    distinct entities within a doc, a < b canonical order.
    */
  def triples(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = linked(spark, dir).filter(col("entity_id") >= 0).cache()

    val mentionsT = l.select(
      col("doc_id"),
      concat(lit("doc:"), col("doc_id")).as("subj"),
      lit(":mentions").as("pred"),
      concat(lit("ent:"), col("title")).as("obj")).distinct()

    val typedT = l.select(
      col("doc_id"),
      concat(lit("ent:"), col("title")).as("subj"),
      lit(":typedAs").as("pred"),
      col("entity_type").as("obj")).distinct()

    val w = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val coT = l
      .withColumn("next_title", lead(col("title"), 1).over(w))
      .filter(col("next_title").isNotNull && col("next_title") =!= col("title"))
      .select(
        col("doc_id"),
        concat(lit("ent:"), least(col("title"), col("next_title"))).as("subj"),
        lit(":coOccursWith").as("pred"),
        concat(lit("ent:"), greatest(col("title"), col("next_title"))).as("obj"))
      .distinct()

    mentionsT.unionByName(typedT).unionByName(coT)
  }
}
