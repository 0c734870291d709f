package graft.catalog

import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.Tables
import graft.functions.Distances
import graft.ops.TopK

/** Full-text retrieval and hybrid (lexical + vector) search — the query
  * surface a training-data / RAG pipeline runs next to the reference's pure
  * ANN search (reference query path: src/database/core.rs:267-313): BM25
  * scoring over an inverted-index shape, and reciprocal-rank fusion of the
  * lexical ranking with the exact-cosine vector ranking.
  *
  * Scale shape: the term filter lands below the tf aggregation (only
  * query-term postings are ever shuffled — the classic posting-list cut),
  * document-frequency and corpus stats ride along as broadcasts, and every
  * ranking is produced by the bounded TopKAgg (map-side partial top-k, ≤ k
  * rows per partition shuffled) — never a global ranking window over the
  * scored corpus. Fusion then touches ≤ 2k rows, a bounded set by
  * construction.
  *
  * Cross-engine determinism: BM25's tf side is kept fully rational —
  * tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) with k1=1.2, b=0.75 and avgdl=S/N
  * multiplies out to 22·tf·S / (10·tf·S + 3·S + 9·dl·N), every product an
  * exact integer in double range — and the idf is the rational surrogate
  * (N+1)/(df+1) (monotone in df like Robertson's ln((N−df+0.5)/(df+0.5)),
  * but transcendental-free; deviation documented here). Per-term scores are
  * quantized by truncation BEFORE the per-doc sum, so the sum is an integer
  * aggregation immune to cross-engine accumulation order. RRF is
  * integer-only end to end: 1e6 div (60 + rank).
  */
object RetrievalQueries {

  /** Fixed lexical query — mid-frequency fixture terms so df varies. */
  private val terms = Seq("spark", "join", "window")
  private def termsSql = terms.map(t => s"'$t'").mkString(", ")

  /** Per-doc BM25 score, quantized per (doc, term) then integer-summed. */
  private def bm25Scores(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir)
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").isInCollection(terms))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("word").agg(count(lit(1)).as("df"))
    // Identical double op tree as the DuckDB oracle: left-assoc products of
    // exactly-represented integers, one rounding per division, truncation
    // last — floor, multiply and divide are exactly specified IEEE ops.
    tf.join(broadcast(df_), "word").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor((col("n_docs") + 1).cast("double") / (col("df") + 1)
          * (lit(22.0) * col("tf") * col("sum_dl"))
          / (lit(10.0) * col("tf") * col("sum_dl") + lit(3.0) * col("sum_dl")
            + lit(9.0) * col("dl") * col("n_docs"))
          * lit(1e4)).cast("long").as("t4"))
      .groupBy("doc_id").agg(sum("t4").as("bm25_1e4"))
  }

  private val bm25ScoresSql = s"""
      dl AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl
             FROM documents),
      stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl
                FROM dl),
      tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf
             FROM (SELECT doc_id,
                          unnest(string_split(lower(text), ' ')) AS word
                   FROM documents)
             WHERE word IN ($termsSql) GROUP BY doc_id, word),
      df AS (SELECT word, count(*)::BIGINT AS df FROM tf GROUP BY word),
      term AS (SELECT tf.doc_id,
                      floor((s.n_docs + 1)::DOUBLE / (df.df + 1)
                            * (22.0 * tf.tf * s.sum_dl)
                            / (10.0 * tf.tf * s.sum_dl + 3.0 * s.sum_dl
                               + 9.0 * dl.dl * s.n_docs)
                            * 1e4)::BIGINT AS t4
               FROM tf JOIN df USING (word) JOIN dl USING (doc_id), stats s),
      sc AS (SELECT doc_id, sum(t4)::BIGINT AS bm25_1e4
             FROM term GROUP BY doc_id)"""

  /** Bounded top-k of (score desc, id asc) via TopKAgg: negate the integer
    * score into the aggregator's ascending (dist, id) order. Integers of
    * this size are exact doubles, so no rounding enters the ordering key.
    * Returns (doc_id, <scoreName>, rank) with rank 1-based. */
  private def topKByScore(
      scored: org.apache.spark.sql.DataFrame, k: Int, scoreName: String)
      : org.apache.spark.sql.DataFrame =
    scored
      .groupBy()
      .agg(TopK.topk[Long](k, -col(scoreName).cast("double"), col("doc_id"))
        .as("t"))
      .select(posexplode(col("t")))
      .select(col("col.id").as("doc_id"),
        (-col("col.dist")).cast("long").as(scoreName),
        (col("pos") + 1).cast("long").as("rk"))

  /** BM25 top-10: the "search the corpus for a phrase" primitive. */
  val bm25 = Q(
    "text_bm25_topk",
    (s, dir) => topKByScore(bm25Scores(s, dir), 10, "bm25_1e4").orderBy("rk"),
    Some(s"""
      WITH $bm25ScoresSql
      SELECT doc_id, bm25_1e4, rk
      FROM (SELECT doc_id, bm25_1e4,
                   row_number() OVER (ORDER BY bm25_1e4 DESC, doc_id)::BIGINT
                     AS rk
            FROM sc)
      WHERE rk <= 10 ORDER BY rk"""))

  /** Hybrid search: RRF over the top-100 of each leg — the BM25 ranking and
    * the exact-cosine vector ranking for query vec_id=0 (documents and
    * embeddings share ids in the fixture). rrf = Σ 1e6 div (60 + rank) over
    * the legs that retrieved the doc (rank 0 displayed when absent) — the
    * standard k=60 fusion, fusing bounded retrieved sets exactly as a
    * production hybrid retriever does. */
  val hybridRrf = Q(
    "hybrid_rrf_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      // Same trunc-4 cosine as dist_cosine / knn_exact_cosine (hash-green);
      // ties in the quantized distance break on id inside TopKAgg.
      val dist = e.crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          Distances.trunc4NonNeg(
            Distances.Cosine(Distances.asDouble(col("embedding")),
              Distances.asDouble(col("qe")))).as("dist"))
      val vecRank = dist.groupBy()
        .agg(TopK.topk[Long](100, col("dist"), col("doc_id")).as("t"))
        .select(posexplode(col("t")))
        .select(col("col.id").as("doc_id"),
          (col("pos") + 1).cast("long").as("r_vec"))
      val lexRank = topKByScore(bm25Scores(s, dir), 100, "bm25_1e4")
        .select(col("doc_id"), col("rk").as("r_bm25"))
      val fused = vecRank.join(lexRank, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("r_bm25"), lit(0L)).as("r_bm25"),
          coalesce(col("r_vec"), lit(0L)).as("r_vec"))
        .withColumn("rrf_1e6",
          when(col("r_vec") === 0, lit(0L))
            .otherwise(expr("1000000 div (60 + r_vec)"))
            + when(col("r_bm25") === 0, lit(0L))
              .otherwise(expr("1000000 div (60 + r_bm25)")))
      // ≤ 200 fused rows by construction — a window here is bounded.
      val wf = org.apache.spark.sql.expressions.Window
        .orderBy(col("rrf_1e6").desc, col("doc_id"))
      fused.withColumn("rk", row_number().over(wf).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("doc_id"), col("r_bm25"), col("r_vec"),
          col("rrf_1e6"), col("rk"))
        .orderBy("rk")
    },
    Some(s"""
      WITH $bm25ScoresSql,
      lex AS (SELECT doc_id, r_bm25
              FROM (SELECT doc_id,
                           row_number() OVER (ORDER BY bm25_1e4 DESC, doc_id)::BIGINT
                             AS r_bm25
                    FROM sc)
              WHERE r_bm25 <= 100),
      d AS (SELECT a.vec_id,
                   floor(greatest(0, 1 - sum(a.embedding[t.i]::DOUBLE * q.qe[t.i]::DOUBLE ORDER BY t.i)
                         / (sqrt(sum(a.embedding[t.i]::DOUBLE * a.embedding[t.i]::DOUBLE ORDER BY t.i))
                            * sqrt(sum(q.qe[t.i]::DOUBLE * q.qe[t.i]::DOUBLE ORDER BY t.i)))) * 1e4) / 1e4
                     AS dist
            FROM embeddings a,
                 (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q,
                 generate_series(1, 64) t(i)
            GROUP BY a.vec_id),
      vec AS (SELECT doc_id, r_vec
              FROM (SELECT vec_id AS doc_id,
                           row_number() OVER (ORDER BY dist, vec_id)::BIGINT
                             AS r_vec
                    FROM d)
              WHERE r_vec <= 100),
      fused AS (SELECT coalesce(v.doc_id, l.doc_id) AS doc_id,
                       coalesce(l.r_bm25, 0)::BIGINT AS r_bm25,
                       coalesce(v.r_vec, 0)::BIGINT AS r_vec,
                       (CASE WHEN v.r_vec IS NULL THEN 0
                             ELSE 1000000 // (60 + v.r_vec) END
                        + CASE WHEN l.r_bm25 IS NULL THEN 0
                               ELSE 1000000 // (60 + l.r_bm25) END)::BIGINT
                         AS rrf_1e6
                FROM vec v FULL OUTER JOIN lex l ON l.doc_id = v.doc_id)
      SELECT doc_id, r_bm25, r_vec, rrf_1e6, rk
      FROM (SELECT *, row_number() OVER (ORDER BY rrf_1e6 DESC, doc_id)::BIGINT
                        AS rk
            FROM fused)
      WHERE rk <= 10 ORDER BY rk"""))

  def qs: Seq[Q] = Seq(bm25, hybridRrf)
}
