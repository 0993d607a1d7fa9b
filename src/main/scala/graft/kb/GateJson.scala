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

  /** NIL-cluster records in the reference's egress shape
    * (nilcluster/Packages/TimeEvolving.py:119-124): each cluster row
    * gains a `mentions` array of {id, mention} structs listing its
    * member mentions (id = annotation id), ordered by (doc_id, ann_id)
    * for a deterministic payload. `clusters` is Pipeline.Result.clusters
    * (cluster_key, title, cluster_type, nelements, ..., nil_id);
    * `assignments` must carry (doc_id, annset, ann_id, cluster_key);
    * `mentions` supplies the surface text per (doc_id, annset, ann_id).
    * One shuffle on cluster_key; the per-cluster list is bounded by the
    * oversize-cluster breakup (A8), so no group outgrows an executor.
    */
  def clusterRecords(clusters: DataFrame, assignments: DataFrame,
                     mentions: DataFrame, key: String = "cluster_key"): DataFrame = {
    val members = assignments
      .join(mentions.select(col("doc_id"), col("annset"), col("ann_id"),
        col("mention")), Seq("doc_id", "annset", "ann_id"))
      .groupBy(col(key))
      .agg(sort_array(collect_list(struct(
        col("doc_id"), col("ann_id"), col("mention")))).as("ordered"))
      .withColumn("mentions", transform(col("ordered"), m =>
        struct(m.getField("ann_id").as("id"), m.getField("mention").as("mention"))))
      .drop("ordered")
    clusters.join(members, Seq(key), "left")
      .withColumn("mentions",
        coalesce(col("mentions"), array().cast(
          "array<struct<id:int,mention:string>>")))
  }

  /** Cluster records as JSON lines (title/type/nelements/mentions —
    * the fields the reference's cluster consumer reads).
    *
    * `includeCenters`: the reference strips each cluster's `center`
    * from the default document egress but returns it from the
    * /clusters/:id variant (documents/src/api/document.js:127-133,
    * 162-168); the center travels base64-encoded like every vector at
    * a JSON edge (TimeEvolving.py:124 `vector_encode`, the F10 codec).
    * Default false = the strip path, matching the default GET.
    */
  def clusterEgress(records: DataFrame,
                    includeCenters: Boolean = false): DataFrame = {
    val base = Seq(col("title"), col("cluster_type").as("type"),
      col("nelements"), col("mentions"))
    val fields =
      if (includeCenters && records.columns.contains("center"))
        base :+ graft.functions.Codec.encodeVec(col("center")).as("center")
      else base
    records.select(col("cluster_key"),
      to_json(struct(fields: _*)).as("json"))
  }
}
