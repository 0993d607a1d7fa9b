package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence assembly operators: pack documents into fixed token
  * budgets and split long texts into overlapping chunks. Both are the
  * narrow/one-shuffle shapes a 100 TB pretraining pipeline needs —
  * packing is a single window aggregation (no driver-side bin state),
  * chunking a generate-and-explode projection (no shuffle at all).
  */
object Pack {

  /** Greedy LINEAR sequence packing: rows ordered by `order` within each
    * `group` accumulate `tokens`; a row's bin is the bin its cumulative
    * interval STARTS in — `floor(cum_before / binSize)`. One window
    * shuffle on the group key; bin ids are deterministic functions of
    * the data (stable under partitioning/replays). Rows larger than
    * `binSize` occupy their starting bin and push later rows over —
    * linear packing semantics (the streaming-friendly packer used in
    * practice), not bin-perfect knapsack.
    *
    * Output adds `bin_id` (long, 0-based per group) and `bin_offset`
    * (the row's starting token offset within its cumulative stream).
    * At the 100 TB scale the `group` key (e.g. (shard, lang)) bounds
    * each window partition; grouping by a constant funnels everything
    * through one partition — same rule as any global window.
    */
  def linearPack(df: DataFrame, group: Seq[String], order: String,
                 tokens: String, binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val w = Window.partitionBy(group.map(col): _*).orderBy(col(order))
    df.withColumn("__cum", sum(col(tokens)).over(w))
      .withColumn("bin_offset", col("__cum") - col(tokens))
      .withColumn("bin_id", floor(col("bin_offset") / binSize))
      .drop("__cum")
  }

  /** Split `text` into chunks of `chunkSize` characters advancing by
    * `chunkSize - overlap` (RAG-style sliding window). Pure projection:
    * generate start offsets with `sequence`, explode, substring — no
    * shuffle, fully codegen'd, parallel in the scan. Emits (chunk_idx,
    * chunk_start 0-based, chunk text); empty texts yield one empty
    * chunk (chunk_idx 0), mirroring how tokenizer pipelines keep the
    * document row alive.
    */
  def chunk(df: DataFrame, text: String, chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val starts = sequence(lit(0), greatest(length(col(text)) - 1, lit(0)), lit(step))
    df.withColumn("chunk_start", explode(starts))
      .withColumn("chunk_idx", (col("chunk_start") / step).cast("long"))
      .withColumn("chunk", col(text).substr(col("chunk_start") + 1, lit(chunkSize)))
  }
}
