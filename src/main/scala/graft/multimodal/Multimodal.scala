package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.InputDoc

/** Multimodal-column plumbing: media spans are opaque references/binary
  * payloads with typed metadata; decode / feature-extract stages are real
  * Spark plumbing (schema, partitioning, batch iteration) with the codec
  * itself STUBBED deterministically (no image/audio libs in this
  * container — clearly marked below).
  *
  * Shape mirrors a production pipeline: `mapPartitions` with per-batch
  * iteration (the Pandas-UDF/`mapInPandas` batch pattern on the JVM
  * side), binary column in, struct-of-features out.
  */
object Multimodal {

  final case class MediaRow(doc_id: String, media_ref: String, offset: Int)
  final case class MediaFeatures(
      doc_id: String, media_ref: String, media_kind: String,
      width: Int, height: Int, n_frames: Int, bytes_len: Long,
      phash: Long)

  def mediaRows(spark: SparkSession, docs: Dataset[InputDoc]): Dataset[MediaRow] = {
    import spark.implicits._
    docs.flatMap(d => d.spans.filter(_.kind == "media")
      .map(s => MediaRow(d.doc_id, s.media_ref, s.offset)))
  }

  /** STUB DECODER — deterministic fake in place of a real image/video
    * codec (none available in this container). Produces stable metadata
    * as a pure function of the media_ref so tests and oracles are exact.
    * A real deployment swaps `decode` for the actual codec; everything
    * around it (batching, schema, partitioning) is unchanged.
    */
  def decode(ref: String): (String, Int, Int, Int, Long, Long) = {
    val kind = if (ref.contains("/img/")) "image"
               else if (ref.contains("/vid/")) "video" else "unknown"
    val idPart = ref.reverse.takeWhile(_ != '/').reverse
    val n = idPart.foldLeft(0L)((a, c) => a * 31 + c)
    val w = (640 + math.floorMod(n * 37, 1280)).toInt
    val h = (360 + math.floorMod(n * 73, 720)).toInt
    val frames = if (kind == "video") (24 + math.floorMod(n, 1000)).toInt else 1
    val bytes = w.toLong * h * 3 * frames
    val phash = n * 0x9e3779b97f4a7c15L
    (kind, w, h, frames, bytes, phash)
  }

  /** Decode/feature-extract stage: batched iteration inside
    * mapPartitions — the Spark-side plumbing a Pandas UDF would use,
    * minus Python. Narrow, no shuffle; scales linearly with media count.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real codec would vectorize (GPU/SIMD)
        batch.map { m =>
          val (kind, w, h, frames, bytes, phash) = decode(m.media_ref)
          MediaFeatures(m.doc_id, m.media_ref, kind, w, h, frames, bytes, phash)
        }
      }
    }
  }

  /** Aspect-preserving resize plan to fit (targetW, targetH): the
    * binding dimension becomes the target, the other scales by the same
    * ratio in EXACT integer math (`div` — a float scale factor rounds
    * differently across engines and would break the oracle). Pure column
    * transform over the features frame (codegen, no shuffle); a real
    * deployment hands (media_ref, out_width, out_height) to the codec's
    * resize kernel inside the same batched decode stage.
    */
  def resizePlan(features: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    // width is the binding constraint iff aspect w/h >= targetW/targetH
    val widthLimited: Column = col("width") * targetH >= col("height") * targetW
    features
      .withColumn("out_width",
        when(widthLimited, lit(targetW))
          .otherwise(expr(s"(width * $targetH) div height").cast("int")))
      .withColumn("out_height",
        when(widthLimited, expr(s"(height * $targetW) div width").cast("int"))
          .otherwise(lit(targetH)))
      .withColumn("out_bytes",
        col("out_width").cast("long") * col("out_height") * 3 * col("n_frames"))
  }

  /** Frame-sampling stage: every `everyN`-th frame index of each medium
    * (images have n_frames = 1 and emit frame 0). A pure generator over
    * the decoded frame count — narrow, no shuffle; the per-frame decode
    * that would follow batches exactly like [[extractFeatures]].
    */
  def sampleFrames(features: DataFrame, everyN: Int): DataFrame = {
    require(everyN >= 1, "everyN must be >= 1")
    features.select(col("doc_id"), col("media_ref"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"))
  }
}
