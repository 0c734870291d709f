package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality scoring — the two classic shapes of a
  * training-data quality filter, as reusable library operators over any
  * (doc_id, text) frame (the catalog gates run them on the fixture; the
  * scale probe runs them on synthetic million-doc corpora).
  *
  * - [[lmScore]]: CCNet-style (Wenzek et al. 2020) — score a crawl by
  *   the negative log-likelihood of an n-gram LM trained on a TRUSTED
  *   corpus, keep the low-perplexity head. The LM here is an add-one-
  *   smoothed bigram model; per-position NLL is quantized to integer
  *   micro-nats BEFORE the per-doc sum, so the aggregate is an
  *   order-independent integer sum (cross-engine deterministic).
  * - [[hashedLinearScore]]: fastText-style — hash word unigrams +
  *   adjacent bigrams into a fixed weight table and sum the weights.
  *   Weights are a closed-form integer function of the bucket (a
  *   deterministic stand-in for trained parameters — no model downloads
  *   under no-egress; a real model would broadcast its 4096-row weight
  *   table in the same position). All-integer, no float surface.
  *
  * 100 TB shape (both): map-side explode → partial-aggregated count
  * tables bounded by the distinct-feature set (corpus-sublinear), one
  * corpus-sized equi-join against them, then a doc-sized rollup — no
  * windows, no all-pairs, nothing collected to the driver.
  */
object QualityModels {

  /** Bigram-LM quality scoring. `docs` and `train` both carry
    * (doc_id, text); `train` is the trusted corpus the LM fits on
    * (pass a filtered view of `docs` for self-scoring). Returns
    * (doc_id, n_tokens, nll_micro, avg_nll, keep) where keep is the
    * exact integer compare nll_micro ≤ n_tokens·tauMicro. */
  def lmScore(docs: DataFrame, train: DataFrame, tauMicro: Long): DataFrame = {
    val big = bigrams(docs)
    val trainBig = bigrams(train)
    val c2 = trainBig.groupBy("ctx", "word").agg(count(lit(1)).as("c2"))
    val c1 = trainBig.groupBy("ctx").agg(count(lit(1)).as("c1"))
    val v = trainBig.agg((countDistinct(col("word")) + 1L).as("v"))
    big
      .join(c2, Seq("ctx", "word"), "left")
      .join(c1, Seq("ctx"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        round(-log((coalesce(col("c2"), lit(0L)) + 1L).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v"))) * 10000)
          .cast("long").as("q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("q").as("nll_micro"))
      .select(col("doc_id"), col("n_tokens"), col("nll_micro"),
        round(col("nll_micro").cast("double") / (col("n_tokens") * 10000), 4)
          .as("avg_nll"),
        (col("nll_micro") <= col("n_tokens") * tauMicro).as("keep"))
  }

  /** (doc_id, ctx, word) bigram positions with a BOS context for the
    * first token. posexplode's ordinal is 0-based: pos ≥ 1 has 1-based
    * predecessor element_at(w, pos); pos == 0 gets the BOS marker. */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(col("w")).as(Seq("pos", "word")))
      .select(col("doc_id"),
        when(col("pos") === 0, lit("<s>"))
          .otherwise(element_at(col("w"), col("pos"))).as("ctx"),
        col("word"))

  /** Hashed-linear classifier score. Buckets are the md5 60-bit fold
    * (first 15 hex chars) mod `dim`; weights w(b) = (b·48271) mod 1001
    * − 500. Features aggregate per (doc, feature) FIRST — map-side
    * partials, and the md5 runs once per distinct feature per doc.
    * Returns (doc_id, n_feat, score_sum, avg_bp, label). */
  def hashedLinearScore(docs: DataFrame, dim: Long = 4096L): DataFrame = {
    val tok = docs.select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val uni = tok.select(col("doc_id"), explode(col("w")).as("f"))
    val bi = tok.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1)," +
          " i -> concat(element_at(w, i), '_', element_at(w, i + 1)))")).as("f"))
    uni.unionAll(bi)
      .groupBy("doc_id", "f").agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"),
        (conv(substring(md5(col("f").cast("binary")), 1, 15), 16, 10)
          .cast("long") % dim).as("b"))
      .select(col("doc_id"), col("cnt"),
        ((col("b") * 48271L) % 1001L - 500L).as("wgt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_feat"), sum(col("cnt") * col("wgt")).as("score_sum"))
      .select(col("doc_id"), col("n_feat"), col("score_sum"),
        expr("(score_sum * 10000) div n_feat").as("avg_bp"),
        (col("score_sum") > 0L).as("label"))
  }
}
