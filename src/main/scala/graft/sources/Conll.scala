package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CoNLL/AIDA-YAGO-style corpus reader (S12, test/fixture scope — the
  * reference parses token/BIO/entity columns into a mention frame and
  * reconstructs text, nilcluster/Packages/ClusteringHelper.py:13-114).
  *
  * Format per line: `token<TAB>bio<TAB>entity` with blank lines between
  * documents and `-DOCSTART- (<id>)` headers. Output: one row per
  * B-I mention group with reconstructed offsets into the
  * space-joined document text.
  */
object Conll {

  final case class ConllMention(doc_id: String, start: Int, end: Int,
                                mention: String, entity: String)

  /** Pure parser (driver/test scope — corpora of this format are small
    * gold sets, not web-scale inputs).
    */
  def parse(lines: Seq[String]): (Map[String, String], Seq[ConllMention]) = {
    val texts = Map.newBuilder[String, String]
    val mentions = Seq.newBuilder[ConllMention]
    var doc: String = null
    var toks = List.empty[String]
    var cur: (Int, List[String], String) = null // (startTok, tokens, entity)

    def tokStartOffset(tokIdx: Int, ts: List[String]): Int =
      ts.take(tokIdx).map(_.length + 1).sum

    def flushMention(): Unit = if (cur != null) {
      val ts = toks.reverse
      val start = tokStartOffset(cur._1, ts)
      val m = cur._2.reverse.mkString(" ")
      mentions += ConllMention(doc, start, start + m.length, m, cur._3)
      cur = null
    }
    def flushDoc(): Unit = if (doc != null) {
      flushMention()
      texts += doc -> toks.reverse.mkString(" ")
      toks = Nil
    }

    lines.foreach { line =>
      if (line.startsWith("-DOCSTART-")) {
        flushDoc()
        doc = line.dropWhile(_ != '(').drop(1).takeWhile(_ != ')')
      } else if (line.trim.isEmpty) {
        flushMention()
      } else {
        val parts = line.split("\t")
        val tok = parts(0)
        val bio = if (parts.length > 1) parts(1) else "O"
        val ent = if (parts.length > 2) parts(2) else ""
        bio match {
          case "B" =>
            flushMention()
            cur = (toks.length, List(tok), ent)
          case "I" if cur != null =>
            cur = (cur._1, tok :: cur._2, cur._3)
          case _ =>
            flushMention()
        }
        toks = tok :: toks
      }
    }
    flushDoc()
    (texts.result(), mentions.result())
  }

  /** DataFrame form over a text file of CoNLL lines. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path).collect().toSeq // gold sets are small
    val (_, mentions) = parse(lines)
    spark.createDataset(mentions).toDF()
  }
}
