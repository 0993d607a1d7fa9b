package graft.ner

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.util.regex.Pattern

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

  // ---------------------------------------------------------------------
  // Reference-faithful section spans (sectionator/main.py:8-78)
  // ---------------------------------------------------------------------

  /** Engine-owned court-seat fixture, CSV-shaped like the reference's
    * distribuzione_territoriale_uffici.csv (sectionator/main.py:99-107).
    * Loaded THROUGH spark.read.csv (S10) so a real deployment swaps the
    * path for the actual config file; content is deterministic.
    */
  val courtCsv: String =
    """N,Tribunale
      |1,Tribunale di Milano
      |2,Tribunale di Roma
      |3,Tribunale di Napoli
      |4,Tribunale di Torino
      |5,Tribunale di Bologna
      |""".stripMargin

  // Cache keyed by nothing — sound ONLY because `courtCsv` is a
  // compile-time constant (every session reads identical content). If
  // the court table ever becomes configurable, key this by its source.
  @volatile private var courtCache: Option[Seq[String]] = None

  /** Court names via a real spark.read.csv round-trip (S10). */
  def courtNames(spark: SparkSession): Seq[String] = courtCache.getOrElse {
    val dir = java.nio.file.Files.createTempDirectory("graft-courts")
    val f = dir.resolve("distribuzione_territoriale_uffici.csv")
    java.nio.file.Files.writeString(f, courtCsv)
    val names = spark.read.option("header", "true").csv(f.toString)
      .select("Tribunale").collect().map(_.getString(0)).toSeq
    courtCache = Some(names)
    names
  }

  // reference regexes, byte-for-byte (sectionator/main.py:27-45)
  private val ConclusioniRe = Pattern.compile("^CONCLUSIONI")
  private val FattoRe = Pattern.compile("^FATTO (E DIRITTO)?$|^SENTENZA$")
  private val DispositivoRe = Pattern.compile(
    "P( )?(.)?( )?Q( )?(.)?( )?M|^MOTIV(AZION)?[EI]|PTM", Pattern.CASE_INSENSITIVE)
  // NOTE on the class: the reference's Python `[ \.-/]` parses `\.-/` as
  // the RANGE '.'(0x2E)..'/'(0x2F) — a literal hyphen is NOT matched. The
  // Java equivalent is therefore `[ ./]`, not `[ .\-/]` (which would also
  // open firma_e_data on hyphen-separated dates where the reference
  // would not).
  private val YearRe = Pattern.compile("[ \\./](\\d){2}(\\d){2}?")
  private val JudgeRe = Pattern.compile(
    "presidente|giudice|GOT", Pattern.CASE_INSENSITIVE)
  private val RemotoRe = Pattern.compile("remoto", Pattern.CASE_INSENSITIVE)

  /** Split keeping line terminators (Python splitlines(keepends=True)):
    * handles \n, \r\n and bare \r. Python additionally splits on exotic
    * terminators (\v, \f, \x1c-\x1e, \x85, U+2028/2029) that never occur
    * in the corpus — deliberately out of scope.
    */
  def splitKeepEnds(text: String): Array[String] = {
    val out = Array.newBuilder[String]
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\n') { out += text.substring(s, i + 1); s = i + 1 }
      else if (c == '\r') {
        val end = if (i + 1 < text.length && text.charAt(i + 1) == '\n') i + 2 else i + 1
        out += text.substring(s, end); s = end; i = end - 1
      }
      i += 1
    }
    if (s < text.length) out += text.substring(s)
    out.result()
  }

  /** The reference state machine (identify_sections, main.py:8-54) plus
    * the end-offset fixup (add_sections_to_gatenlp, main.py:63-69):
    *  - the first line opens `preambolo`; CONCLUSIONI / FATTO E DIRITTO /
    *    SENTENZA / P.Q.M.-MOTIVI-PTM open their sections once each;
    *  - `firma_e_data` opens on a line naming a court seat (or "remoto")
    *    together with a year-like pattern when the NEXT line names the
    *    judge (presidente|giudice|GOT) — the reference's lookahead
    *    heuristic (main.py:37-46), including its quirk that the
    *    lookahead on the LAST line aborts that line's bookkeeping
    *    (IndexError -> continue);
    *  - fixup: sections sorted by start DESC get end = the previous
    *    (higher) section's start, the last extends to len-1 — "start is
    *    more accurate than end".
    * Returns (section, start, end) in document order.
    */
  def identifySections(text: String, courts: Seq[String]): Seq[(String, Int, Int)] = {
    val lines = splitKeepEnds(text)
    val lowerCourts = courts.map(_.toLowerCase)
    val order = scala.collection.mutable.LinkedHashMap.empty[String, Array[Int]]
    var offset = 0
    var current = ""
    var endPre = false; var endConc = false; var endFatto = false
    var endDisp = false; var endFirma = false
    var i = 0
    var skipLine = false
    lines.foreach { line =>
      skipLine = false
      if (!endPre) { endPre = true; current = "preambolo" }
      else if (ConclusioniRe.matcher(line).find() && !endConc) {
        endConc = true; current = "conclusioni"
      } else if (FattoRe.matcher(line.trim).find() && !endFatto) {
        endFatto = true; current = "fatto_e_diritto"
      } else if (DispositivoRe.matcher(line).find() && !endDisp) {
        endDisp = true; current = "dispositivo"
      } else {
        val lower = line.toLowerCase
        val seatOrRemoto = lowerCourts.exists(lower.contains) ||
          RemotoRe.matcher(line).find()
        if (seatOrRemoto && YearRe.matcher(line).find()) {
          if (i + 1 >= lines.length) skipLine = true // reference IndexError path
          else if (JudgeRe.matcher(lines(i + 1)).find() && !endFirma) {
            endFirma = true; current = "firma_e_data"
          }
        }
      }
      if (!skipLine) {
        i += 1
        val finalOffset = offset + line.length
        order.getOrElseUpdate(current, Array(offset, offset))(1) = finalOffset
        offset = finalOffset
      }
    }
    // end-offset fixup (main.py:63-69)
    var prevStart = text.length - 1
    order.toSeq.sortBy(-_._2(0)).foreach { case (_, v) =>
      v(1) = prevStart
      prevStart = v(0)
    }
    order.toSeq.map { case (k, v) => (k, v(0), v(1)) }
  }

  /** Distributed span stage: (doc_id, section, start, end) — a narrow
    * per-doc kernel, embarrassingly parallel over document partitions.
    */
  def sectionSpans(spark: SparkSession, docs: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    import spark.implicits._
    val courts = spark.sparkContext.broadcast(courtNames(spark))
    docs.select(col(idCol).cast("string").as("doc_id"), col(textCol).as("t"))
      .as[(String, String)]
      .flatMap { case (id, t) =>
        identifySections(t, courts.value).map { case (sec, s, e) => (id, sec, s, e) }
      }
      .toDF("doc_id", "section", "start", "end")
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
