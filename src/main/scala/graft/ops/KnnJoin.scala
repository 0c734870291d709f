package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.index.LshForest

/** Cross-table batch kNN for LARGE query sides — the regime
  * [[SimSearch.exactTopK]]'s broadcast-the-queries plan cannot reach.
  * The reference answers query batches one vector at a time on a rayon
  * pool (core.rs:290-313); exactTopK batches that into one broadcast
  * plan, which holds to ~10⁵ queries. But a training pipeline's "queries"
  * are often a second corpus (dataset-vs-dataset retrieval, hard-negative
  * mining, cross-dedup between two snapshots) — a table as unbroadcastable
  * as the corpus itself. This is the third regime, shaped like a join:
  *
  *  - both sides route through the SAME forest executor-side (one narrow
  *    projection per side, no driver involvement, nothing broadcast but
  *    the ~MB model): the corpus to its primary leaf per tree
  *    ([[LshForest.bucketTable]] — the persisted index shape), the
  *    queries to their margin-priority PROBE SET per tree
  *    ([[LshForest.routeQueries]] with the `searchK` top-up budget —
  *    primary-leaf-only query routing measured recall@3 = 0.64 on the
  *    fixture; the default budget lifts it to ~0.94);
  *  - candidates = DISTINCT (query, vector) pairs co-located in a
  *    (tree, leaf) bucket. The equi-join's per-key fan-out is bounded by
  *    the leaf capacity, so candidate volume grows LINEARLY in query
  *    count (≤ numTrees · searchK per query) — never all-pairs;
  *  - embeddings are fetched by hash joins on the two id keys (a
  *    bucketBy(id) layout makes those shuffle-free — tools/BucketProbe),
  *    scored in one codegen span, and reduced by the bounded
  *    [[TopK.topk]] aggregate. Only candidate pairs ever shuffle.
  *
  * Recall follows the CORPUS side's primary-leaf geometry (the stored
  * index holds one leaf per tree per vector; only the query side
  * multi-probes): gate it like every other approximate path
  * (`knn_join_bucketed` carries a poison-row recall floor, and
  * `knn_join_recall_at3` surfaces the value per round).
  */
object KnnJoin {

  /** Top-k nearest `corpus` rows per `queries` row, both sides arbitrary
    * size. `corpusRoutes` reuses a persisted bucket table (the engine's
    * index directory has exactly this shape) instead of re-routing the
    * corpus per call. Output: (queryId, vecId, dist), ties broken by id;
    * queries whose buckets yield fewer than k candidates return fewer
    * rows (the gate accounts for it). */
  def knnJoin(
      queries: DataFrame, corpus: DataFrame, model: LshForest.ForestModel,
      k: Int, metric: Distances.Metric = Distances.L2Squared,
      queryId: String = "query_id", vecId: String = "vec_id",
      searchKOpt: Option[Int] = None,
      corpusRoutes: Option[DataFrame] = None): DataFrame = {
    // Default budget: 4·k sample units per tree like LshForest.topK, but
    // floored at 128 — at small k the 4·k probe set is too few leaves for
    // join-shaped recall (k=3 on the 2000-vector uniform fixture measured
    // recall@3 = 0.69 at 12 units, 0.85 at 32, 0.94 at 64, 0.986 at 128;
    // cost stays linear in the budget, and at 128 the warm bucketed-join
    // entry holds ~0.8 s at the bench SF).
    val searchK = searchKOpt.getOrElse(math.max(4 * k, 128))
    // routeQueries' q_emb payload is pruned by Catalyst — this projection
    // keeps the route table at 3 narrow columns however wide the probes fan
    val qRoutes = LshForest
      .routeQueries(queries.select(col(queryId), col("embedding")),
        model, searchK, queryId = queryId)
      .select(col(queryId), col("tree_id"), col("leaf_id"))
    val cRoutes = corpusRoutes
      .getOrElse(LshForest.bucketTable(
        corpus.select(col(vecId), col("embedding")), model, vecId = vecId))
      .select(col(vecId), col("tree_id"), col("leaf_id"))
    val cand = qRoutes.join(cRoutes, Seq("tree_id", "leaf_id"))
      .select(col(queryId), col(vecId)).distinct()
    val scored = cand
      .join(corpus.select(
        col(vecId), Distances.asDouble(corpus("embedding")).as("v_emb")), Seq(vecId))
      .join(queries.select(
        col(queryId), Distances.asDouble(queries("embedding")).as("q_emb")), Seq(queryId))
      .withColumn("dist",
        SimSearch.quantize(metric, metric(col("q_emb"), col("v_emb")), 4))
    SimSearch.takeTopK(scored, k, queryId, vecId)
  }
}
