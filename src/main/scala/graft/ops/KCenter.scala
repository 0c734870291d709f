package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Greedy k-center selection (Gonzalez '85 farthest-point traversal) — the
  * diversity-MAXIMIZING core-set pass of a data-mixing pipeline, the dual
  * of SemDeDup's redundancy removal: pick k documents so that every
  * document is close to some pick (greedy is a 2-approximation of the
  * optimal covering radius), then inspect or stratify sampling by covered
  * cell. Where k-means picks DENSE region centers, farthest-point picks
  * the corpus's EXTREMES — outlier domains a temperature mix would never
  * surface get a guaranteed seat.
  *
  * Same exactness contract as [[KMeansInt]]: integer components, integer
  * squared-L2 distances, smallest-id seed and smallest-id argmax
  * tie-breaks, ties on assignment keep the EARLIEST-selected center — the
  * whole traversal is bit-identical on any engine and any aggregation
  * order, so the oracle replays every selection as unrolled CTEs generated
  * by the same constant ([[oracleSql]]).
  *
  * Scale shape per selection: ONE corpus-wide map against the broadcast
  * center vector (no join, no shuffle) + one TakeOrdered(1) argmax reduce;
  * driver state is k·dim. `md` is checkpointed per round so round t never
  * re-executes rounds 1..t-1 (the fixpoint-loop persist rule — production
  * would persist to storage between rounds instead).
  */
object KCenter {

  /** Select k centers by farthest-point traversal over integer-valued
    * `vectors(idCol, embedding)`, assign every vector to its nearest
    * center (earliest-selected wins distance ties), and return
    * (idCol, center_id, center_order, dist2) where center_order is the
    * 1-based selection rank of the assigned center and dist2 the exact
    * integer squared L2 to it. */
  def selectAssign(
      vectors: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    val sc = vectors.sparkSession.sparkContext
    val base = vectors
      .select(col(idCol), Distances.asDouble(col("embedding")).as("emb"))
      .localCheckpoint(eager = true)
    def distTo(center: Array[Long]) = {
      val bc = sc.broadcast(center)
      udf { (emb: Seq[Double]) =>
        val cc = bc.value
        var d = 0L; var i = 0
        while (i < cc.length) {
          val diff = emb(i).toLong - cc(i); d += diff * diff; i += 1
        }
        d
      }
    }
    val seed = base.orderBy(idCol).limit(1).collect()(0)
    var order = List(seed.getLong(0))
    var md = base
      .withColumn("dist2",
        distTo(seed.getSeq[Double](1).map(_.toLong).toArray)(col("emb")))
      .withColumn("center_id", lit(seed.getLong(0)))
      .localCheckpoint(eager = true)
    for (_ <- 2 to k) {
      val far = md.orderBy(desc("dist2"), col(idCol)).limit(1).collect()(0)
      val fid = far.getLong(0)
      val femb = far.getSeq[Double](1).map(_.toLong).toArray
      order = fid :: order
      val d2 = distTo(femb)(col("emb"))
      // strict <: distance ties keep the earlier-selected center; the new
      // center itself re-assigns (its d2 = 0 beats its old positive md)
      md = md.select(col(idCol), col("emb"),
          when(d2 < col("dist2"), d2).otherwise(col("dist2")).as("dist2"),
          when(d2 < col("dist2"), lit(fid)).otherwise(col("center_id"))
            .as("center_id"))
        .localCheckpoint(eager = true)
    }
    val ord = typedLit(
      order.reverse.zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }
        .toMap)
    md.select(col(idCol), col("center_id"),
      element_at(ord, col("center_id")).as("center_order"), col("dist2"))
  }

  /** Unrolled-CTE oracle replaying [[selectAssign]] over a sparse relation
    * `sp(doc_id, bucket, w)` of integer vectors (absent buckets are zero).
    * Callers prepend the WITH chain defining `sp` and append a SELECT over
    * `fin(doc_id, center_id, center_order, dist2)`. Every CTE is
    * MATERIALIZED for the same reason as [[KMeansInt.oracleSql]]: each
    * round's `md_t` is referenced by every later round — inlined, the
    * replay re-evaluates earlier rounds exponentially often. */
  def oracleSql(k: Int): String = {
    // the center's vector is materialized FIRST (≤ dim rows) so the dot
    // stage is a corpus-×-dim probe — a scalar-subquery doc_id filter
    // inside the sp⋈sp bucket join defeats pushdown and goes quadratic
    def cdStep(t: Int) = s"""
      cvec_$t AS MATERIALIZED (SELECT p.bucket, p.w
                               FROM sp p JOIN s_$t ON p.doc_id = s_$t.cid),
      cn2_$t AS MATERIALIZED (SELECT coalesce(sum(w*w), 0) AS n2 FROM cvec_$t),
      dot_$t AS MATERIALIZED (SELECT s.doc_id, sum(s.w*c.w) AS dot
                              FROM sp s JOIN cvec_$t c ON c.bucket = s.bucket
                              GROUP BY s.doc_id),
      cd_$t AS MATERIALIZED (
        SELECT u.doc_id,
               n.n2 + (SELECT n2 FROM cn2_$t) - 2*coalesce(d.dot, 0) AS d2
        FROM univ u JOIN dn2 n USING (doc_id)
        LEFT JOIN dot_$t d USING (doc_id))"""
    val init = s"""
      univ AS MATERIALIZED (SELECT DISTINCT doc_id FROM sp),
      dn2 AS MATERIALIZED (SELECT doc_id, sum(w*w) AS n2 FROM sp GROUP BY doc_id),
      s_1 AS MATERIALIZED (SELECT min(doc_id) AS cid FROM univ),
      ${cdStep(1)},
      md_1 AS MATERIALIZED (SELECT doc_id, d2 AS md,
                              (SELECT cid FROM s_1) AS center_id
                            FROM cd_1)"""
    val steps = (2 to k).map { t =>
      s"""
      s_$t AS MATERIALIZED (SELECT doc_id AS cid FROM md_${t - 1}
                            ORDER BY md DESC, doc_id LIMIT 1),
      ${cdStep(t)},
      md_$t AS MATERIALIZED (
        SELECT m.doc_id,
               CASE WHEN c.d2 < m.md THEN c.d2 ELSE m.md END AS md,
               CASE WHEN c.d2 < m.md THEN (SELECT cid FROM s_$t)
                    ELSE m.center_id END AS center_id
        FROM md_${t - 1} m JOIN cd_$t c USING (doc_id))"""
    }.mkString(",\n")
    val ord = (1 to k)
      .map(t => s"SELECT cid, $t AS sel_order FROM s_$t")
      .mkString(" UNION ALL ")
    s"""$init,
      $steps,
      ord AS MATERIALIZED ($ord),
      fin AS MATERIALIZED (
        SELECT m.doc_id, m.center_id, o.sel_order AS center_order,
               m.md AS dist2
        FROM md_$k m JOIN ord o ON o.cid = m.center_id)"""
  }
}
