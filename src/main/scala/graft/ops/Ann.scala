package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Similarity

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact, the FAISS-flat analog —
  * reference indexer/main.py:300-304 exact scan). Scale path: sign-LSH
  * bucketing (random-hyperplane sketch) with multi-probe — candidates
  * share a bucket, then exact rescoring inside buckets, mirroring the
  * reference's hnsw-then-exact-rescore pattern (indexer/main.py:304-317).
  */
object Ann {

  /** Exact top-k neighbors for each query vector. queries/corpus:
    * (id, vec). Deterministic tie-break (cos desc, corpus id asc).
    * Broadcast the smaller side (queries) — one pass over the corpus.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.cosineCol(col("qv"), col("cv")))
    // two-stage top-k: map-side combine keeps only k rows per query per
    // partition; shuffle volume = queries x k, not queries x corpus
    TopK.topKPerKey(scored, Seq("query_id"), "cos", "neighbor_id", k)
      .select("query_id", "neighbor_id", "cos", "rnk")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * murmur-based in [-1, 1).
    */
  private def planeComponent(plane: Int, dim: Int): Float = {
    val h = scala.util.hashing.MurmurHash3.productHash((plane, dim), 0x2545f491)
    (h.toDouble / Int.MaxValue).toFloat
  }

  private val bucketUdf = udf((v: Seq[Float], planes: Int) => {
    var b = 0
    var p = 0
    while (p < planes) {
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * planeComponent(p, i); i += 1 }
      b = (b << 1) | (if (s >= 0) 1 else 0)
      p += 1
    }
    b
  })

  /** Sign-LSH bucketed ANN: exact rescoring within shared buckets. With
    * `planes` hyperplanes, two vectors at angle θ share a bucket with
    * prob (1-θ/π)^planes — recall tuned by fewer planes / multi-probe.
    */
  /** Axis-aligned sign-LSH top-k: bucket = sign pattern of the leading
    * `dims` coordinates (the degenerate random-hyperplane case where the
    * planes are coordinate axes). Same bucketed shape as [[lshTopK]] but
    * the bucket function is a pure column expression — SQL-expressible
    * for the correctness oracle AND whole-stage-codegen'd (no UDF).
    */
  def signLshTopK(vectors: DataFrame, k: Int, dims: Int = 8): DataFrame = {
    val bucket = (0 until dims).map { j =>
      when(element_at(col("vec"), j + 1) >= 0f, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val b = vectors.select(col("id"), col("vec")).withColumn("bucket", bucket)
    val l = b.select(col("bucket"), col("id").as("query_id"), col("vec").as("qv"))
    val r = b.select(col("bucket"), col("id").as("neighbor_id"), col("vec").as("cv"))
    val scored = l.join(r, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.cosineCol(col("qv"), col("cv")))
    TopK.topKPerKey(scored, Seq("query_id"), "cos", "neighbor_id", k)
      .select("query_id", "neighbor_id", "cos", "rnk")
  }

  def lshTopK(vectors: DataFrame, k: Int, planes: Int = 6): DataFrame = {
    val b = vectors.select(col("id"), col("vec"))
      .withColumn("bucket", bucketUdf(col("vec"), lit(planes)))
    val l = b.select(col("bucket"), col("id").as("query_id"), col("vec").as("qv"))
    val r = b.select(col("bucket"), col("id").as("neighbor_id"), col("vec").as("cv"))
    val scored = l.join(r, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.cosineCol(col("qv"), col("cv")))
    TopK.topKPerKey(scored, Seq("query_id"), "cos", "neighbor_id", k)
      .select("query_id", "neighbor_id", "cos", "rnk")
  }
}
