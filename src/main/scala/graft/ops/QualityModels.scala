package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Model-based document quality scoring and selection — the classic
  * shapes of a training-data quality filter, as reusable library
  * operators over any (doc_id, text) frame (the catalog gates run them
  * on the fixture; the scale probe runs them on synthetic million-doc
  * corpora).
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
  * - [[dsirScore]]: DSIR-style importance weighting (Xie et al. 2023,
  *   "Data Selection for Language Models via Importance Resampling") —
  *   contrast a TARGET domain sample against the raw corpus in a hashed
  *   n-gram feature space and score each doc by its average
  *   log-importance ratio. The log is [[qlog2]], an all-integer
  *   fixed-point base-2 log (exact at powers of two, monotone, pure
  *   shift/multiply arithmetic), so the whole score — like everything
  *   else here — is cross-engine exact with no transcendental surface.
  *
  * 100 TB shape (all): map-side explode → partial-aggregated count
  * tables bounded by the distinct-feature set (corpus-sublinear), one
  * corpus-sized equi-join against them (the model table always
  * broadcasts), then a doc-sized rollup — no windows, no all-pairs,
  * nothing corpus-sized collected to the driver.
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
  def hashedLinearScore(docs: DataFrame, dim: Long = 4096L): DataFrame =
    features(docs)
      .groupBy("doc_id", "f").agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"), bucketOf(col("f"), dim).as("b"))
      .select(col("doc_id"), col("cnt"),
        ((col("b") * 48271L) % 1001L - 500L).as("wgt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_feat"), sum(col("cnt") * col("wgt")).as("score_sum"))
      .select(col("doc_id"), col("n_feat"), col("score_sum"),
        expr("(score_sum * 10000) div n_feat").as("avg_bp"),
        (col("score_sum") > 0L).as("label"))

  /** (doc_id, f) feature rows — word unigrams + adjacent '_'-joined
    * bigrams over split(lower(text), " ") — the fastText/DSIR hashed
    * feature space shared by [[hashedLinearScore]] and [[dsirScore]].
    * One row per OCCURRENCE (multiplicity preserved). */
  private def features(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val uni = tok.select(col("doc_id"), explode(col("w")).as("f"))
    val bi = tok.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1)," +
          " i -> concat(element_at(w, i), '_', element_at(w, i + 1)))")).as("f"))
    uni.unionAll(bi)
  }

  /** Feature → bucket: the md5 60-bit fold (first 15 hex chars) mod
    * `dim` — the same cross-engine-exact hash family as the MinHash
    * affine kernel; for dim a power of two ≤ 2⁶⁰ the fold's LOW bits
    * survive, i.e. the bucket equals the value of the last hex chars. */
  private def bucketOf(f: Column, dim: Long): Column =
    conv(substring(md5(f.cast("binary")), 1, 15), 16, 10).cast("long") % dim

  /** Per-document token Shannon entropy in [[qlog2]] fixed point —
    * the information-density quality signal (low entropy = repetitive
    * junk: keyword stuffing, boilerplate loops, degenerate generations;
    * the repetition-stats cousin that catches UNORDERED repetition
    * n-gram run-lengths miss). Identity used:
    *
    *   H = log2(n) − (1/n)·Σ_w c_w·log2(c_w)
    *
    * so every log argument is an integer COUNT and the whole score is
    * shift/multiply arithmetic — exactly replayable in SQL, like
    * [[dsirScore]]. Returns (docId, n_tok, entropy_q10) with entropy in
    * 1/1024-bit units. Plan: one (doc, word)-keyed count (map-side
    * partial — the only corpus-scale exchange) + one doc-sized rollup;
    * no joins, no window. */
  def tokenEntropy(
      docs: DataFrame,
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    val wc = docs
      .select(col(docId), explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy(docId, "w").agg(count(lit(1)).as("c"))
    wc.groupBy(docId)
      .agg(sum("c").as("n_tok"),
        sum(col("c") * qlog2(col("c"))).as("s"))
      .select(col(docId), col("n_tok"),
        (qlog2(col("n_tok")) - expr("s div n_tok")).as("entropy_q10"))
  }

  /** Integer fixed-point base-2 log, 10 fractional bits:
    *
    *   qlog2(n) = fl·1024 + ((n·1024) >> fl) − 1024,  fl = ⌊log2 n⌋
    *
    * fl comes from the binary-string length (exact — no float log), the
    * fraction is the linear mantissa term (max error 0.086·1024,
    * monotone, exact at powers of two). Pure integer shift/multiply on
    * both engines — the DuckDB oracle replays it with `>>` and a
    * max-over-series fl — so scores built on it hash-match exactly.
    * Requires n ≥ 1; n·1024 must stay in BIGINT (n < 2⁵³ — any count). */
  private[graft] def qlog2(n: Column): Column = {
    val fl = (length(bin(n)) - 1L).cast("long")
    fl * 1024L + call_function("shiftright", n * 1024L, fl.cast("int")) - 1024L
  }

  /** DSIR importance weights: per hashed-feature bucket,
    *
    *   delta_b = qlog2(tgt_b + 1) − qlog2(raw_b + 1)
    *
    * ≈ 1024·log2 of the add-one-smoothed target/raw count ratio. The
    * corpus-size normalizer log2(N_raw/N_tgt) is an additive constant
    * across buckets of a fixed training pair and [[dsirScore]] averages
    * per doc, so dropping it shifts every doc score equally —
    * rank-invariant, kept out to stay integer-exact. `raw` should cover
    * the scoring corpus's features (weights join inner on raw-observed
    * buckets). Returns the ≤ dim-row (b, delta) model table. */
  def dsirWeights(raw: DataFrame, target: DataFrame, dim: Long = 4096L): DataFrame =
    bucketCounts(raw, dim)
      .join(bucketCounts(target, dim).withColumnRenamed("c", "tc"),
        Seq("b"), "left")
      .select(col("b"),
        (qlog2(coalesce(col("tc"), lit(0L)) + 1L)
          - qlog2(col("c") + 1L)).as("delta"))

  /** Per-bucket feature-occurrence counts. Features aggregate by
    * DISTINCT string first so the md5 runs once per distinct feature,
    * then fold to buckets — both aggs partial map-side, output ≤ dim. */
  private def bucketCounts(docs: DataFrame, dim: Long): DataFrame =
    features(docs).groupBy("f").agg(count(lit(1)).as("cnt"))
      .select(bucketOf(col("f"), dim).as("b"), col("cnt"))
      .groupBy("b").agg(sum("cnt").as("c"))

  /** DSIR-style importance score: each doc's AVERAGE per-feature
    * log-importance ratio under [[dsirWeights]] (averaging removes
    * length bias — a long doc is not more "target-like" than a short
    * one with the same gram mix), shifted by +65536 (> max |qlog2| for
    * any BIGINT count) so the score is strictly positive and the
    * offset-then-divide is engine-agnostic integer arithmetic. Returns
    * (doc_id, n_feat, dsir_score); select the high scores — e.g. via
    * [[Curation.tokenBudgetSelect]] — to resample toward the target.
    * Scale shape: the ≤ dim-row model table BROADCASTS; corpus features
    * never shuffle raw — only (doc_id, bucket) partials do. */
  def dsirScore(docs: DataFrame, target: DataFrame, dim: Long = 4096L): DataFrame = {
    val wt = dsirWeights(docs, target, dim)
    features(docs)
      .groupBy("doc_id", "f").agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"), bucketOf(col("f"), dim).as("b"))
      // LEFT join + delta-0 default so buckets absent from the weight
      // table (possible only when `docs` isn't the training raw — the
      // frozen-weights serving deployment) score exactly like the
      // kernel's getOrElse(0); with docs == raw every bucket is present
      // and this is the inner join the oracle replays.
      .join(broadcast(wt), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_feat"),
        sum(col("cnt") * (coalesce(col("delta"), lit(0L)) + 65536L)).as("ssum"))
      .select(col("doc_id"), col("n_feat"),
        expr("ssum div n_feat").as("dsir_score"))
  }

  /** The per-row DSIR kernel: score one doc against a FROZEN weight map
    * in a single JVM pass — the zero-shuffle form a 100 TB stream (or a
    * weights-trained-offline batch) runs; [[dsirScore]]'s declarative
    * plan is its parity twin (same tokenization, same md5 fold, same
    * integer arithmetic — the stream_dsir_exec gate hash-proves it).
    * Buckets absent from the map score delta = 0 (tgt = raw = unseen).
    * Returns struct(n_feat, dsir_score). */
  def dsirScoreKernel(weights: Map[Long, Long], dim: Long = 4096L): UserDefinedFunction =
    udf { text: String =>
      val w = Option(text).getOrElse("").toLowerCase.split(" ", -1)
      val md = java.security.MessageDigest.getInstance("MD5")
      var ssum = 0L
      var n = 0L
      def add(f: String): Unit = {
        val d = md.digest(f.getBytes("UTF-8"))
        var v = 0L
        var i = 0
        while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
        v = (v << 4) | ((d(7) >> 4) & 0xfL) // first 15 hex chars = 60 bits
        ssum += weights.getOrElse(v % dim, 0L) + 65536L
        n += 1L
      }
      var i = 0
      while (i < w.length) {
        add(w(i))
        if (i + 1 < w.length) add(w(i) + "_" + w(i + 1))
        i += 1
      }
      (n, if (n == 0L) 65536L else ssum / n)
    }
}
