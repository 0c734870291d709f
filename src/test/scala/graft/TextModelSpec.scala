package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog.TextQueries
import graft.core.Tables

/** Semantic gates on the model-based quality operators (bigram-LM
  * perplexity scoring and the hashed-linear classifier) — the DuckDB
  * hash gates prove cross-engine equality; these prove the scores MEAN
  * something: internal consistency of the derived columns, token-count
  * conservation against the raw corpus, the in-distribution gap (the
  * LM's own training split must score lower than held-out docs — the
  * property CCNet-style filtering relies on), and determinism. */
class TextModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sf0001

  test("lm score: columns cohere, counts conserve, flag matches the integer rule") {
    val rows = TextQueries.lmScore.run(spark, dir).collect()
    val nTok = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == nTok.size)
    rows.foreach { r =>
      val (n, nll) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("nll_micro"))
      assert(n == nTok(r.getAs[Long]("doc_id")), "one scored position per token")
      assert(nll > 0, "add-one smoothing keeps every p < 1")
      assert(r.getAs[Double]("avg_nll") ==
        BigDecimal(nll.toDouble / (n * 10000)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Boolean]("keep") == (nll <= n * 34200L))
    }
  }

  test("lm score: the training split is in-distribution (lower mean nll)") {
    val rows = TextQueries.lmScore.run(spark, dir).collect()
    val (train, heldOut) = rows.partition(_.getAs[Long]("doc_id") % 4 == 0)
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getAs[Long]("nll_micro").toDouble /
        r.getAs[Long]("n_tokens")).sum / rs.length
    assert(train.nonEmpty && heldOut.nonEmpty)
    assert(mean(train) < mean(heldOut),
      "docs the LM was trained on must score better than held-out docs")
  }

  test("classifier: feature count is 2n-1, derived columns cohere, deterministic") {
    val rows = TextQueries.qualityClassifier.run(spark, dir).collect()
    val nTok = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == nTok.size)
    rows.foreach { r =>
      val n = nTok(r.getAs[Long]("doc_id"))
      val expected = if (n >= 2) 2 * n - 1 else n // unigrams + adjacent bigrams
      assert(r.getAs[Long]("n_feat") == expected)
      val (s, f) = (r.getAs[Long]("score_sum"), r.getAs[Long]("n_feat"))
      assert(r.getAs[Long]("avg_bp") == (s * 10000) / f) // JVM / == Spark div
      assert(r.getAs[Boolean]("label") == (s > 0))
    }
    val again = TextQueries.qualityClassifier.run(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
