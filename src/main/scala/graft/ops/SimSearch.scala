package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Similarity search over an embedding column.
  *
  * [[exactTopK]] is the batch form of the reference's `query_vectors`
  * (reference: src/database/core.rs:290-313) — but where the reference loops
  * per query on a rayon pool, this emits ONE logical plan for the whole query
  * batch: broadcast the (small) query side, score every (query, vector) pair,
  * then per-query top-k via a ranking window. Catalyst compiles the scoring
  * into a single whole-stage-codegen span over the vectors scan, so the big
  * side streams: no shuffle of the 100 TB table, only of the k·|queries|
  * survivors.
  *
  * [[ivfTopK]] is the scale path: partition vectors into `nlist` Voronoi
  * cells around data-sampled centroids (one pass), then probe only the
  * `nprobe` nearest cells per query — the classic IVF-Flat layout. The cell
  * assignment is computed once and reusable (write it partitioned by
  * `cell_id` and the probe become a partition-pruned scan).
  */
object SimSearch {

  /** Brute-force exact top-k: every query row against every vector row.
    * `queries(queryIdCol, embCol)`, `vectors(idCol, embCol)` — both embedding
    * columns must be ARRAY<FLOAT|DOUBLE>. Output: (query_id, id, dist)
    * with dist rounded to `roundTo` decimals for cross-engine determinism;
    * ties broken by id. */
  def exactTopK(
      queries: DataFrame, vectors: DataFrame, k: Int,
      metric: Distances.Metric = Distances.L2Squared,
      queryId: String = "query_id", vecId: String = "vec_id",
      roundTo: Int = 4): DataFrame = {
    val q = queries.select(
      col(queryId),
      Distances.asDouble(queries("embedding")).as("q_emb"))
    val v = vectors.select(
      col(vecId),
      Distances.asDouble(vectors("embedding")).as("v_emb"))
    val scored = v.crossJoin(broadcast(q))
      .withColumn("dist", round(metric(col("q_emb"), col("v_emb")), roundTo))
    val w = Window.partitionBy(col(queryId)).orderBy(col("dist"), col(vecId))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(queryId), col(vecId), col("dist"))
  }

  /** IVF cell assignment: pick `nlist` centroids deterministically from the
    * data (seeded hash order — cheap, one pass, no k-means iterations needed
    * for a recall baseline), assign every vector to its nearest centroid.
    * Returns (cell assignment DF with cell_id, centroids DF). */
  def ivfAssign(
      vectors: DataFrame, nlist: Int, seed: Long = 42L,
      vecId: String = "vec_id"): (DataFrame, DataFrame) = {
    val v = vectors.select(col(vecId), col("embedding"))
    // Deterministic sample: the nlist smallest xxhash64(vec_id, seed).
    val centroids = v
      .withColumn("h", xxhash64(col(vecId), lit(seed)))
      .orderBy("h").limit(nlist)
      .select(
        row_number().over(Window.orderBy("h")).cast("int").as("cell_id"),
        Distances.asDouble(col("embedding")).as("centroid"))
    val assigned = v.crossJoin(broadcast(centroids))
      .withColumn("cdist", Distances.l2sq(Distances.asDouble(col("embedding")), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(vecId)).orderBy(col("cdist"), col("cell_id"))))
      .filter(col("rn") === 1)
      .select(col(vecId), col("cell_id"), col("embedding"))
    (assigned, centroids)
  }

  /** IVF-Flat approximate top-k: score queries against centroids, keep the
    * `nprobe` nearest cells per query, then exact-rerank only vectors in the
    * probed cells. The vectors→cells join is an equi-join on cell_id; with
    * the assignment table written `partitionBy("cell_id")` it becomes a
    * partition-pruned scan at scale. */
  def ivfTopK(
      queries: DataFrame, assigned: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int,
      metric: Distances.Metric = Distances.L2Squared,
      queryId: String = "query_id", vecId: String = "vec_id",
      roundTo: Int = 4): DataFrame = {
    val q = queries.select(
      col(queryId), Distances.asDouble(col("embedding")).as("q_emb"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", Distances.l2sq(col("q_emb"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(queryId)).orderBy(col("cdist"), col("cell_id"))))
      .filter(col("rn") <= nprobe)
      .select(col(queryId), col("q_emb"), col("cell_id"))
    val scored = assigned
      .join(broadcast(probes), Seq("cell_id"))
      .withColumn("dist",
        round(metric(col("q_emb"), Distances.asDouble(col("embedding"))), roundTo))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(queryId)).orderBy(col("dist"), col(vecId))))
      .filter(col("rn") <= k)
      .select(col(queryId), col(vecId), col("dist"))
  }

  /** Recall@k of `approx` against `exact` (both (query_id, vec_id, ...)). */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val hit = approx.select("query_id", "vec_id")
      .join(exact.select("query_id", "vec_id"), Seq("query_id", "vec_id"))
      .count()
    val total = exact.count()
    if (total == 0) 1.0 else hit.toDouble / total
  }
}
