package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Distributed k-means over INTEGER-valued feature vectors (count/quantized
  * embeddings) — the data-mixing clustering pass of a training pipeline
  * (cluster the corpus, then sample per cluster), exact enough to
  * hash-gate: with integer components, integer distances, floor-division
  * centroid updates and smallest-id tie-breaks, the whole fixpoint is
  * bit-identical on any engine and any aggregation order, so a fixed
  * iteration count can be replayed as unrolled SQL CTEs in DuckDB
  * ([[oracleSql]] generates them from the same constants — the
  * Graph.pagerankInt pattern applied to clustering). Contrast `Ivf.lloyd`:
  * that trains float centroids on a bounded DRIVER sample (a quantizer);
  * this assigns the ENTIRE corpus distributively.
  *
  * Scale shape per iteration: assignment is a narrow map against the
  * broadcast k·dim centroid table (no join, no shuffle of the corpus);
  * the update is posexplode → partial-aggregated (cluster, dim) sums —
  * k·dim rows cross the wire; the driver holds only the k·dim centroid
  * grid. Iterations are a fixed constant.
  */
object KMeansInt {

  /** Fit + final assignment. `vectors(idCol, embedding)` must carry
    * integer-valued components (e.g. Md5CountEmbedder counts). Init =
    * the vectors of the k smallest ids; update = per-component
    * truncating sum/count (JVM Long division = DuckDB `//`, which
    * truncates toward zero on negatives — NOT floor); empty
    * clusters keep their previous centroid; assignment ties break toward
    * the smaller cluster id. Returns (idCol, cluster, dist2) under the
    * FINAL centroids. */
  def fitAssign(
      vectors: DataFrame, k: Int, iters: Int,
      idCol: String = "doc_id"): DataFrame = {
    val sc = vectors.sparkSession.sparkContext
    val base = vectors.select(col(idCol),
      Distances.asDouble(col("embedding")).as("emb"))
      .localCheckpoint(eager = true)
    var centroids: Array[Array[Long]] = base.orderBy(idCol).limit(k)
      .collect().map(_.getSeq[Double](1).map(_.toLong).toArray)
    val dim = centroids.head.length

    def assignCol(cents: Array[Array[Long]]) = {
      val bc = sc.broadcast(cents)
      udf { (emb: Seq[Double]) =>
        val cs = bc.value
        var best = 0; var bestD = Long.MaxValue
        var c = 0
        while (c < cs.length) {
          var d = 0L; var i = 0
          val cc = cs(c)
          while (i < cc.length) {
            val diff = emb(i).toLong - cc(i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c } // strict: ties keep smaller c
          c += 1
        }
        best
      }
    }
    def distCol(cents: Array[Array[Long]]) = {
      val bc = sc.broadcast(cents)
      udf { (emb: Seq[Double], cl: Int) =>
        val cc = bc.value(cl)
        var d = 0L; var i = 0
        while (i < cc.length) {
          val diff = emb(i).toLong - cc(i); d += diff * diff; i += 1
        }
        d
      }
    }

    for (_ <- 1 to iters) {
      val assigned = base.withColumn("cl", assignCol(centroids)(col("emb")))
      val stats = assigned
        .select(col("cl"), posexplode(col("emb")).as(Seq("i", "x")))
        .groupBy("cl", "i")
        .agg(sum(col("x").cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        val (cl, i, s, n) =
          (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))
        // plain Long division TRUNCATES toward zero — exactly DuckDB's
        // `//` on negatives (-7 // 2 = -3 there, NOT floor's -4; verified)
        next(cl)(i) = s / n
      }
      centroids = next
    }
    base
      .withColumn("cluster", assignCol(centroids)(col("emb")).cast("long"))
      .withColumn("dist2", distCol(centroids)(col("emb"), col("cluster").cast("int")))
      .select(col(idCol), col("cluster"), col("dist2"))
  }

  /** Unrolled-CTE oracle fragments replaying [[fitAssign]] over a sparse
    * relation `sp(doc_id, bucket, w)` of `dim`-bucket integer vectors
    * (absent buckets are zero). Callers prepend the WITH chain defining
    * `sp` and append a SELECT over `fin(doc_id, cluster, dist2)`.
    *
    * Every CTE is MATERIALIZED: DuckDB's default inlines a CTE at each
    * reference, and this chain references each round's `c_t` and `a_t`
    * several times — inlined, the replay re-evaluates earlier rounds
    * exponentially often (measured 53 s for k=4/iters=3 at sf0.01;
    * 0.5 s materialized, identical rows). Materialization is the same
    * evaluate-once semantics [[fitAssign]] has on the Spark side. */
  def oracleSql(k: Int, iters: Int, dim: Int): String = {
    def assign(t: Int, cSrc: String) =
      s"""cn2_$t AS MATERIALIZED (SELECT cl, sum(v*v) AS n2 FROM $cSrc GROUP BY cl),
         dots_$t AS MATERIALIZED (SELECT s.doc_id, c.cl, sum(s.w * c.v) AS dot
                     FROM sp s JOIN $cSrc c ON c.bucket = s.bucket
                     GROUP BY s.doc_id, c.cl),
         a_$t AS MATERIALIZED (
           SELECT doc_id, cl, dist FROM (
             SELECT d.doc_id, c.cl,
                    dn2.n2 + c.n2 - 2 * coalesce(t.dot, 0) AS dist,
                    row_number() OVER (PARTITION BY d.doc_id
                                       ORDER BY dn2.n2 + c.n2
                                             - 2 * coalesce(t.dot, 0), c.cl)
                      AS rn
             FROM (SELECT DISTINCT doc_id FROM sp) d
             CROSS JOIN cn2_$t c
             JOIN dn2 ON dn2.doc_id = d.doc_id
             LEFT JOIN dots_$t t ON t.doc_id = d.doc_id AND t.cl = c.cl)
           WHERE rn = 1)"""
    val init = s"""
      dn2 AS MATERIALIZED (SELECT doc_id, sum(w*w) AS n2 FROM sp GROUP BY doc_id),
      ids AS MATERIALIZED (SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS cl
              FROM (SELECT DISTINCT doc_id FROM sp)
              QUALIFY row_number() OVER (ORDER BY doc_id) <= $k),
      grid AS MATERIALIZED (SELECT unnest(range(0, $dim)) AS bucket),
      c_0 AS MATERIALIZED (SELECT i.cl, g.bucket, coalesce(s.w, 0) AS v
              FROM ids i CROSS JOIN grid g
              LEFT JOIN sp s ON s.doc_id = i.doc_id AND s.bucket = g.bucket)"""
    val rounds = (1 to iters).map { t =>
      s"""${assign(t - 1, s"c_${t - 1}")},
         upd_$t AS MATERIALIZED (SELECT a.cl, s.bucket, sum(s.w) AS sw
                    FROM a_${t - 1} a JOIN sp s ON s.doc_id = a.doc_id
                    GROUP BY a.cl, s.bucket),
         siz_$t AS MATERIALIZED (SELECT cl, count(*) AS n FROM a_${t - 1} GROUP BY cl),
         c_$t AS MATERIALIZED (SELECT c.cl, c.bucket,
                         CASE WHEN z.n IS NULL THEN c.v
                              ELSE coalesce(u.sw, 0) // z.n END AS v
                  FROM c_${t - 1} c
                  LEFT JOIN siz_$t z ON z.cl = c.cl
                  LEFT JOIN upd_$t u ON u.cl = c.cl AND u.bucket = c.bucket)"""
    }.mkString(",\n")
    val fin = s"""${assign(iters, s"c_$iters")},
      fin AS MATERIALIZED (SELECT doc_id, cl AS cluster, dist AS dist2 FROM a_$iters)"""
    s"$init,\n$rounds,\n$fin"
  }
}
