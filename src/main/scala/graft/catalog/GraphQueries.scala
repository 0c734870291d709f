package graft.catalog

import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.Tables
import graft.ops.Graph

/** Catalog twin for the exact-integer PageRank (`ops/Graph.scala`). The
  * graph is a deterministic synthetic topology over the documents table
  * (three affine out-edges per doc id modulo the corpus size — a dense
  * functional digraph with genuine in-degree skew), so both engines build
  * the identical edge set from the same scan; the oracle replays the
  * fixed-point recurrence as 10 unrolled CTEs and must hash-match
  * bit-for-bit. Same gate family as `dedup_cluster_cc` (the other
  * iterative-graph entry).
  */
object GraphQueries {

  private val Iters = 10

  /** The shared synthetic topology (three affine out-edges per doc id mod
    * corpus size) — ONE definition for every graph entry's Spark side and
    * ONE for every oracle, so the four copies that must stay bit-identical
    * for the hash gates cannot drift. */
  private def syntheticEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    docs.select(col("doc_id").as("src"),
      explode(array(
        (col("doc_id") * 31 + 7) % n,
        (col("doc_id") * 17 + 3) % n,
        (col("doc_id") * 13 + 11) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  private val syntheticEdgesSql = """
      e0 AS MATERIALIZED (
        SELECT doc_id AS src,
               (doc_id * 31 + 7) % (SELECT count(*) FROM documents) AS dst
        FROM documents
        UNION ALL
        SELECT doc_id,
               (doc_id * 17 + 3) % (SELECT count(*) FROM documents)
        FROM documents
        UNION ALL
        SELECT doc_id,
               (doc_id * 13 + 11) % (SELECT count(*) FROM documents)
        FROM documents)"""

  val pagerank = Q(
    "graph_pagerank",
    (s, dir) => {
      Graph.pagerankInt(syntheticEdges(s, dir), iters = Iters).orderBy("id")
    },
    Some(s"""
      WITH $syntheticEdgesSql,
      edges AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
      ${Graph.pagerankOracleSql(Iters)}
      SELECT id, pr FROM it$Iters ORDER BY id"""))

  /** Triangle counting ([[Graph.triangleCounts]]) over the SAME synthetic
    * topology as `graph_pagerank` (symmetrized) — per-node triangle
    * participation is the clustering-coefficient numerator and the
    * standard graph-health metric for near-dup pair graphs. The oracle
    * replays the identical degree-ordered orientation + wedge-closure
    * joins, so the hash pins both the total and the per-node split. */
  val triangles = Q(
    "graph_triangles",
    (s, dir) => {
      Graph.triangleCounts(syntheticEdges(s, dir))
    },
    Some(s"""
      WITH $syntheticEdgesSql,
      ${Graph.triangleOracleSql}
      SELECT id, count(*)::BIGINT AS n_tri FROM (
        SELECT ta AS id FROM tri
        UNION ALL SELECT tb FROM tri
        UNION ALL SELECT tc FROM tri)
      GROUP BY id ORDER BY id"""))

  /** Clustering coefficients over the same topology
    * ([[Graph.clusteringCoefficients]]): triangles normalized by wedge
    * capacity in integer basis points — the local-density profile next to
    * the raw counts; every node emitted (deg-1 nodes at cc 0). */
  val clusterCoeff = Q(
    "graph_cluster_coeff",
    (s, dir) => {
      Graph.clusteringCoefficients(syntheticEdges(s, dir))
    },
    Some(s"""
      WITH $syntheticEdgesSql,
      ${Graph.triangleOracleSql},
      tc AS (SELECT id, count(*)::BIGINT AS n_tri FROM (
               SELECT ta AS id FROM tri
               UNION ALL SELECT tb FROM tri
               UNION ALL SELECT tc FROM tri)
             GROUP BY id)
      SELECT d.id, d.deg, coalesce(tc.n_tri, 0)::BIGINT AS n_tri,
             (CASE WHEN d.deg >= 2
                   THEN (2 * coalesce(tc.n_tri, 0) * 10000)
                        // (d.deg * (d.deg - 1))
                   ELSE 0 END)::BIGINT AS cc_bp
      FROM deg d LEFT JOIN tc ON tc.id = d.id
      ORDER BY d.id"""))

  def qs: Seq[Q] = Seq(pagerank, triangles, clusterCoeff)
}
