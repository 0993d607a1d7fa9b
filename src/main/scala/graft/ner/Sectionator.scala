package graft.ner

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Document sectioning — the reference's line-oriented regex state
  * machine (sectionator/main.py:8-54: a marker line opens a section that
  * runs until the next marker; end offsets fixed up from the next
  * section's start, main.py:56-78) re-expressed as the classic Spark
  * sweep: posexplode units -> running `last(marker, ignoreNulls)` window
  * -> group. One shuffle per doc partition.
  *
  * Two unit granularities:
  *  - `lineSections`: newline units with regex markers (the reference's
  *    exact shape, used on documents that have lines);
  *  - `tokenSections`: whitespace-token units with marker tokens (used on
  *    the single-line synthetic corpus).
  */
object Sectionator {

  /** Reference-shaped line markers (sectionator/main.py:27-45). */
  val lineMarkers: Seq[(String, String)] = Seq(
    ("CONCLUSIONI", "^CONCLUSIONI"),
    ("FATTO", "^FATTO( E DIRITTO)?$|^SENTENZA$"),
    ("MOTIVI", "^P\\.? ?Q\\.? ?M\\.?|^MOTIV(AZION)?[EI]"))

  def markerFor(line: Column): Column =
    lineMarkers.foldLeft(lit(null).cast("string")) { case (acc, (name, re)) =>
      when(acc.isNotNull, acc).otherwise(when(line.rlike(re), lit(name)))
    }

  /** (doc_id, line_no, line, section) with PREAMBLE before any marker. */
  def lineSections(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("marker", markerFor(col("line")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("line_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exploded.withColumn("section",
      coalesce(last(col("marker"), ignoreNulls = true).over(w), lit("PREAMBLE")))
  }

  /** Token-unit sweep with marker tokens (same algorithm). */
  def tokenSections(docs: DataFrame, idCol: String, textCol: String,
                    markers: Seq[String]): DataFrame = {
    val exploded = docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("ord", "tok")))
      .withColumn("marker",
        when(col("tok").isin(markers: _*), col("tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exploded.withColumn("section",
      coalesce(last(col("marker"), ignoreNulls = true).over(w), lit("PREAMBLE")))
  }
}
