package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
  * k-means-cluster the embedding space, then search for near-duplicate
  * pairs ONLY within each cluster — the all-pairs O(n²) cosine scan
  * becomes O(Σ|cluster|²) ≈ n²/k, and each cluster's pair scan is an
  * independent shuffle partition. The reference engine has no semantic
  * dedup (zebra stops at exact hashes, src/database.rs); this is a
  * beyond-reference training-pipeline operator.
  *
  * Exactness contract: with integer-valued embeddings
  * ([[graft.embed.Md5CountEmbedder]] counts) the whole decision is
  * integer-only — the clustering is [[KMeansInt]]'s bit-identical
  * fixpoint, the pair dot product is derived from the codegen ‖a−b‖²
  * kernel as (‖a‖²+‖b‖²−d²)/2 (exact: d² has the parity of ‖a‖²+‖b‖²),
  * and cos(a,b) ≥ τnum/τden is evaluated cross-multiplied as
  * dot>0 ∧ dot²·τden² ≥ τnum²·‖a‖²·‖b‖², so the DuckDB oracle can replay
  * every step from the md5 digests with zero float drift.
  *
  * Scale shape: the cluster assignment is [[KMeansInt]]'s broadcast-map
  * pass; the pair scan shuffles each vector once on its cluster id and
  * never materializes cross-cluster pairs. k must scale with n (bounded
  * mean cluster size — the paper uses n/k ≈ 1k–10k); with that invariant
  * the per-partition pair work is constant and the operator is linear in
  * n at fixed cluster size. Worst-case skew (one giant cluster) is the
  * classic k-means failure mode, not a join-plan flaw — callers pick k.
  */
object SemDedup {

  /** Within-cluster near-duplicate pairs: (doc_a < doc_b, same cluster,
    * cos ≥ tauNum/tauDen). Returns
    * (doc_a, doc_b, cluster, dot, n2_a, n2_b) — all BIGINT. */
  def dupPairs(
      vectors: DataFrame, k: Int, iters: Int,
      tauNum: Long, tauDen: Long,
      idCol: String = "doc_id"): DataFrame =
    dupPairsAssigned(vectors, KMeansInt.fitAssign(vectors, k, iters, idCol),
      tauNum, tauDen, idCol)

  /** [[dupPairs]] over a precomputed `(idCol, cluster)` assignment —
    * lets callers reuse one k-means fit across pairs/keep/cartography. */
  def dupPairsAssigned(
      vectors: DataFrame, assignment: DataFrame,
      tauNum: Long, tauDen: Long,
      idCol: String = "doc_id"): DataFrame = {
    val assigned = assignment.select(col(idCol), col("cluster"))
    val v = vectors
      .select(col(idCol), Distances.asDouble(col("embedding")).as("emb"))
      .join(assigned, idCol)
      .withColumn("n2", Distances.dot(col("emb"), col("emb")).cast("long"))
    val a = v.select(col(idCol).as("doc_a"), col("cluster"),
      col("emb").as("ea"), col("n2").as("n2_a"))
    val b = v.select(col(idCol).as("doc_b"), col("cluster"),
      col("emb").as("eb"), col("n2").as("n2_b"))
    a.join(b, Seq("cluster"))
      .filter(col("doc_a") < col("doc_b"))
      // The numerator 2·(a·b) is always even, so shiftright-by-1 is exact
      // (also for negative dots) and keeps the pipeline Long end-to-end —
      // Spark's `/` on integer columns is DOUBLE division, exact only while
      // the numerator ≤ 2^53. The dot² comparison below stays within Long
      // while |dot|·tauDen < ~3e9 (n2 ≲ 3e9 per vector at tauDen ≤ 100);
      // our integer embeddings (|dim|≤64, |coord|≤~1e3) sit far below it.
      .withColumn("dot",
        shiftright(col("n2_a") + col("n2_b")
          - Distances.l2sq(col("ea"), col("eb")).cast("long"), 1))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(tauDen * tauDen) >=
          lit(tauNum * tauNum) * col("n2_a") * col("n2_b"))
      .select(col("doc_a"), col("doc_b"), col("cluster"),
        col("dot"), col("n2_a"), col("n2_b"))
  }

  /** Survivors: drop every doc that has ANY smaller-id semantic duplicate
    * in its cluster (the same min-id-canonical convention as the MinHash
    * and n-gram keep operators). */
  def keep(
      vectors: DataFrame, k: Int, iters: Int,
      tauNum: Long, tauDen: Long,
      idCol: String = "doc_id"): DataFrame = {
    val pruned = dupPairs(vectors, k, iters, tauNum, tauDen, idCol)
      .select(col("doc_b").as(idCol)).distinct()
    vectors.join(pruned, Seq(idCol), "left_anti").select(col(idCol))
  }

  /** Oracle fragment: given the [[KMeansInt.oracleSql]] chain ending in
    * `fin(doc_id, cluster, dist2)` and the md5-twin sparse relation
    * `sp(doc_id, bucket, w)`, emits `sem_pairs(doc_a, doc_b, cluster,
    * dot, n2_a, n2_b)` replaying [[dupPairs]]. Callers append a SELECT. */
  def pairsOracleSql(tauNum: Long, tauDen: Long): String = s"""
      sn2 AS MATERIALIZED (SELECT doc_id, sum(w*w) AS n2 FROM sp GROUP BY doc_id),
      sdots AS MATERIALIZED (SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
                       sum(sa.w * sb.w) AS dot
                FROM sp sa JOIN sp sb ON sa.bucket = sb.bucket
                WHERE sa.doc_id < sb.doc_id
                GROUP BY sa.doc_id, sb.doc_id),
      sem_pairs AS MATERIALIZED (
        SELECT d.doc_a, d.doc_b, fa.cluster, d.dot, na.n2 AS n2_a,
               nb.n2 AS n2_b
        FROM sdots d
        JOIN fin fa ON fa.doc_id = d.doc_a
        JOIN fin fb ON fb.doc_id = d.doc_b AND fb.cluster = fa.cluster
        JOIN sn2 na ON na.doc_id = d.doc_a
        JOIN sn2 nb ON nb.doc_id = d.doc_b
        WHERE d.dot > 0
          AND d.dot * d.dot * ${tauDen * tauDen} >=
              ${tauNum * tauNum} * na.n2 * nb.n2)"""
}
