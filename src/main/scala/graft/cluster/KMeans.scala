package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** One Lloyd refinement step over an embedding corpus — the training
  * kernel behind an IVF index (graft.ops.Ann.ivfTopK) or an embedding-
  * space clustering pass: assign every vector to its nearest current
  * centroid, then recompute each centroid as the element-wise mean of
  * its members. Iterating this to a fixed point is k-means; one
  * deterministic step is the operator (callers loop with
  * localCheckpoint between iterations, per the CLAUDE.md rule for
  * iterative DataFrame algorithms).
  *
  * Scale shape: centroids broadcast (k rows); assignment is one
  * map-side-combining argmax keyed by vector id (max_by over a struct —
  * no window over the corpus); the mean recompute explodes assigned
  * vectors to (cid, dim) and hash-aggregates — one corpus-sized shuffle
  * each, both partial-aggregated map-side.
  *
  * Determinism: nearest-centroid ties break on (cos desc, cid asc) —
  * the same contract the e4 IVF oracle proves matches SQL row_number;
  * the mean sums per-element QUANTIZED longs (round(v·1e6)) so the
  * aggregation is exact integer arithmetic under any shuffle order,
  * then divides once (e3 pattern).
  */
object KMeans {

  /** Seed centroids: the k smallest-id vectors (deterministic, SQL-
    * reproducible — no RNG; FAISS-style sampled-training-point init).
    */
  def seed(emb: DataFrame, k: Int): DataFrame =
    emb.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("vec").as("cv"))

  /** Nearest-centroid assignment — THE shared kernel between k-means
    * refinement and IVF index construction (graft.ops.Ann.ivfTopK):
    * broadcast centroids, map-side-combining argmax per vector, ties on
    * (cos desc, cid asc) — one copy so the tie-break / cosine contract
    * cannot silently diverge between the index and its training step.
    * emb: (id, vec); cents: (cid, cv). Output: (id, cid, vec).
    */
  def assign(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .withColumn("cos", Similarity.cosineCol(col("vec"), col("cv")))
      .groupBy("id")
      .agg(max_by(struct(col("cid"), col("vec")),
        struct(col("cos"), (-col("cid")).cast("long"))).as("a"))
      .select(col("id"), col("a.cid").as("cid"), col("a.vec").as("vec"))

  /** One assignment + recompute step. emb: (id, vec array<float>);
    * cents: (cid, cv array<float>). Output: (cid, dim, n, c_v) — the
    * refined centroid exploded per dimension (n = member count), the
    * cross-engine-comparable form for array-valued results.
    */
  def step(emb: DataFrame, cents: DataFrame): DataFrame = {
    assign(emb, cents)
      .select(col("cid"), posexplode(col("vec")).as(Seq("dim", "v")))
      .withColumn("vq", round(col("v").cast("double") * 1000000).cast("long"))
      .groupBy("cid", "dim")
      .agg(count(lit(1)).as("n"),
        (sum(col("vq")).cast("double") /
          (count(lit(1)) * lit(1000000.0))).as("c_v"))
  }
}
