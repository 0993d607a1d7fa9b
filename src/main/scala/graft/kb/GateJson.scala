package graft.kb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GateNLP-document JSON IO (F20) — the reference's interchange format
  * at every service hop (`Document.from_dict/to_dict`,
  * pipelinehelper/main.py:25-26,39-40; model shape
  * documents/src/models/document.js, annotationSet.js, annotation.js):
  *
  * {"text": ..., "offset_type": "p", "features": {...},
  *  "annotation_sets": {name: {"name":..., "next_annid":N,
  *    "annotations":[{"id":N,"type":...,"start":N,"end":N,
  *                    "features":{...}}]}}}
  *
  * The engine speaks this shape only at ingest/egress; internally
  * everything is the nested-column document-store schema. Unknown feature
  * keys survive round trips inside string maps.
  */
object GateJson {

  val annotationSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("type", StringType),
    StructField("start", IntegerType),
    StructField("end", IntegerType),
    StructField("features", MapType(StringType, StringType))))

  val annsetSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("next_annid", IntegerType),
    StructField("annotations", ArrayType(annotationSchema))))

  val docSchema: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("offset_type", StringType),
    StructField("features", MapType(StringType, StringType)),
    StructField("annotation_sets", MapType(StringType, annsetSchema))))

  /** Parse GateNLP JSON strings: (doc_id, json) -> nested columns. */
  def ingest(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        from_json(col(jsonCol), docSchema).as("doc"))
      .select(col("doc_id"),
        col("doc.text").as("text"),
        coalesce(col("doc.offset_type"), lit("p")).as("offset_type"),
        col("doc.features").as("features"),
        map_values(col("doc.annotation_sets")).as("annsets"))

  /** Emit GateNLP JSON from the nested shape (offset_type always "p" —
    * end-exclusive offsets are an engine invariant).
    */
  def egress(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      to_json(struct(
        col("text"),
        coalesce(col("offset_type"), lit("p")).as("offset_type"),
        col("features"),
        map_from_arrays(
          transform(col("annsets"), a => a.getField("name")),
          col("annsets")).as("annotation_sets"))).as("json"))
}
