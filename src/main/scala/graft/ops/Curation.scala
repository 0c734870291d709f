package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Bounded

/** Library surface for corpus curation: repetition/quality signals,
  * decontamination, PII scrubbing, quota sampling and sequence packing —
  * the passes a training-data pipeline composes between dedup and
  * tokenization. All outputs are integer-exact (div-quantized ratios,
  * counts, digests); see the catalog twins for the DuckDB hash gates.
  */
object Curation {

  /** Run-length pass over a SORTED array: returns struct(mx, d) = max
    * multiplicity and distinct count — one `aggregate` HOF, entirely
    * map-side. The zero-shuffle replacement for
    * explode → groupBy(doc, gram) → groupBy(doc). */
  def runStats(sortedArr: Column): Column =
    aggregate(
      sortedArr,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("mx"), lit(0L).as("d")),
      (a, x) => when(a.getField("prev").isNotNull && x === a.getField("prev"),
        struct(x.as("prev"), (a.getField("run") + 1).as("run"),
          a.getField("mx").as("mx"), a.getField("d").as("d")))
        .otherwise(struct(x.as("prev"), lit(1L).as("run"),
          greatest(a.getField("mx"), a.getField("run")).as("mx"),
          (a.getField("d") + 1).as("d"))),
      a => struct(greatest(a.getField("mx"), a.getField("run")).as("mx"),
        a.getField("d").as("d")))

  /** Word n-gram array of a text column (n >= 1), lowercased. */
  def wordGrams(textCol: Column, n: Int): Column = {
    val w = split(lower(textCol), " ")
    if (n == 1) w
    else transform(sequence(lit(1), size(w) - (n - 1)),
      i => array_join(slice(w, i, lit(n)), " "))
  }

  /** Gopher-style per-doc repetition stats: duplicate-2-gram, top-2-gram
    * and top-word fractions, 1e-4 integer-quantized. Zero shuffles. */
  def repetitionStats(
      docs: DataFrame, docId: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = split(lower(col(textCol)), " ")
    docs
      .select(col(docId),
        size(w).cast("long").as("n1"),
        (size(w) - 1).cast("long").as("n2"),
        runStats(array_sort(wordGrams(col(textCol), 2))).as("s2"),
        runStats(array_sort(w)).as("s1"))
      .select(col(docId), col("n2"),
        expr("(n2 - s2.d) * 10000 div n2").as("dup2_frac_1e4"),
        expr("s2.mx * 10000 div n2").as("top2_frac_1e4"),
        expr("s1.mx * 10000 div n1").as("top1_frac_1e4"))
  }

  /** Docs sharing any word n-gram with `benchmark` (both (docId, textCol)):
    * returns (docId, n_shared) over the non-benchmark side. The benchmark
    * gram set is distinct-ed and broadcast; corpus grams stream map-side
    * and only matches shuffle (GPT-3-style eval-set decontamination). */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Exploded-gram rows via posexplode + n plain element_at calls — NOT
    // `explode(wordGrams(...))`: the transform/slice HOF evaluates
    // interpreted (the fuzzy_join/span-dedup lesson, SURVEY §8.2), and
    // this per-token projection is decontamination's corpus-scale hot
    // path. posexplode enumerates gram start positions; the gram itself
    // is a fixed chain of element_at/concat_ws, all inside codegen.
    def grams(df: DataFrame) = {
      val w = split(lower(col(textCol)), " ")
      df.filter(size(w) >= n)
        .select(col(docId), w.as("w_arr"))
        .select(col(docId), col("w_arr"),
          posexplode(slice(col("w_arr"), lit(1), size(col("w_arr")) - (n - 1))))
        .select(col(docId),
          concat_ws(" ", (0 until n).map(j =>
            element_at(col("w_arr"), col("pos") + j + 1)): _*).as("g"))
    }
    val bench = grams(benchmark).select("g").distinct()
    grams(corpus).join(broadcast(bench), "g")
      .groupBy(docId).agg(count_distinct(col("g")).as("n_shared"))
  }

  /** Email/phone scrub: counts + redacted text. Regexes must stay in the
    * Java∩RE2 dialect (character classes, bounded quantifiers) so catalog
    * twins can replay them in DuckDB. */
  def piiScrub(
      docs: DataFrame, docId: String = "doc_id",
      textCol: String = "text",
      emailRe: String = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+",
      phoneRe: String = "555-[0-9]{4}"): DataFrame =
    docs.select(col(docId),
      size(regexp_extract_all(col(textCol), lit(emailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(phoneRe), lit(0)))
        .cast("long").as("n_phones"),
      regexp_replace(regexp_replace(col(textCol), emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>").as("redacted"))

  /** Deterministic quota sample: at most `cap` rows per `strata`, chosen by
    * md5(docId) order — reproducible stratified downsampling. The window
    * partitions by the stratum key; pre-salt a mega-stratum if skewed. */
  def quotaSample(
      docs: DataFrame, strata: String, cap: Int,
      docId: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(strata).orderBy(col("h"), col(docId))
    docs
      .withColumn("h", md5(concat(lit("q"), col(docId).cast("string"))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
      .drop("h")
  }

  /** Temperature-based source mixing: downsample each stratum at rate
    * (n_min / n_s)^(1−τ) — the pretraining data-mix pass that flattens
    * source imbalance (τ=1 keeps natural proportions, τ→0 equalizes).
    * Membership is deterministic: a doc is kept iff the first 6 hex chars
    * of md5('m' || docId) fall below the stratum's rate threshold, so the
    * sample is reproducible, stable under reruns, and identical across
    * engines (the threshold is a hex STRING compare; for τ = 0.5 the rate
    * is sqrt(n_min/n_s), which is IEEE-correctly-rounded — bit-identical
    * everywhere — where a general pow() would not be). Two passes over the
    * strata counts (tiny, broadcast) and one map-side filter over the
    * corpus: no shuffle of the data itself. */
  def temperatureSample(
      docs: DataFrame, strata: String, tau: Double,
      docId: String = "doc_id"): DataFrame = {
    require(tau >= 0.0 && tau <= 1.0, s"tau in [0,1], got $tau")
    val counts = docs.groupBy(strata).agg(count(lit(1)).as("n_s"))
    val nMin = counts.agg(min("n_s").as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_s")
    val rate =
      if (tau == 1.0) lit(1.0)
      else if (tau == 0.5) sqrt(ratio)
      else pow(ratio, 1.0 - tau)
    // rate >= 1 strata keep EVERYTHING: 'g' sorts above every hex digit,
    // so the strict < never drops a doc (capping at 'ffffff' would shave
    // the 2^-24 tail off the keep-all strata).
    val thr = counts.crossJoin(broadcast(nMin))
      .select(col(strata),
        when(rate >= 1.0, lit("g"))
          .otherwise(lpad(lower(hex(
            floor(rate * (1 << 24)).cast("long"))), 6, "0")).as("thr"))
    docs.join(broadcast(thr), strata)
      .filter(
        substring(md5(concat(lit("m"), col(docId).cast("string"))), 1, 6)
          < col("thr"))
      .drop("thr")
  }

  /** Sliding-window document chunking: split each doc's token stream into
    * `chunkSize`-token windows advancing by `stride` (overlap =
    * chunkSize − stride) — the retrieval-pipeline pass between curation
    * and embedding (chunk → embed → index). Pure map + generate: ZERO
    * shuffles at any corpus size; chunk counts and offsets are integer
    * arithmetic, the chunk digest is md5 of the joined tokens, so the
    * whole output is cross-engine exact. Output: (docId, chunk_id,
    * start_tok, n_tok, chunk_md5). */
  def chunkDocs(
      docs: DataFrame, chunkSize: Int, stride: Int,
      docId: String = "doc_id", textCol: String = "text",
      keepText: Boolean = false): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got $stride / $chunkSize")
    val base = docs
      .select(col(docId),
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))
          .as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        expr(s"if(n <= $chunkSize, 1L, 1L + ((n - $chunkSize + ${stride - 1}) div $stride))"))
      .select(col(docId), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col(docId), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)).as("chunk"))
    val out = base.select(col(docId), col("chunk_id"), col("start_tok"),
      size(col("chunk")).cast("long").as("n_tok"),
      md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_md5"),
      array_join(col("chunk"), " ").as("chunk_text"))
    if (keepText) out else out.drop("chunk_text")
  }

  /** EXACT token-budget selection without a global window: keep the
    * greedy-optimal prefix of the (score, docId) order — ascending when
    * `bestLow` (e.g. LM nll: lower is better), descending otherwise —
    * whose running `tokensCol` sum stays within `budget` (inclusive, no
    * partial docs). Scale shape: docs histogram into coarse score
    * buckets (`scoreCol div bucketDiv`; the only unpartitioned window is
    * the bucket table), buckets that fit whole keep via semi-join, and
    * only the single boundary bucket — 1/buckets of the corpus in
    * expectation — pays a per-doc running sum. Requires scoreCol ≥ 0
    * (integer `div` bucketing). Returns the kept rows with input
    * columns. */
  def tokenBudgetSelect(
      docs: DataFrame, scoreCol: String, tokensCol: String,
      budget: Long, bucketDiv: Long, bestLow: Boolean,
      docId: String = "doc_id"): DataFrame = {
    val scored = docs.withColumn("qb", expr(s"$scoreCol div $bucketDiv"))
    val hist = Bounded.frame(
      scored.groupBy("qb").agg(sum(tokensCol).as("bt")),
      1L << 16, "tokenBudgetSelect score-bucket histogram")
    val wh = Window.orderBy(if (bestLow) col("qb").asc else col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cum_pre", coalesce(sum("bt").over(wh), lit(0L)))
    val fullB = cum.filter(col("cum_pre") + col("bt") <= budget).select("qb")
    val boundary = cum
      .filter(col("cum_pre") < budget && col("cum_pre") + col("bt") > budget)
      .select("qb", "cum_pre") // at most one row
    val keptFull = scored.join(fullB, Seq("qb"), "left_semi")
    val wb = Window
      .orderBy(if (bestLow) col(scoreCol).asc else col(scoreCol).desc,
        col(docId))
      .rowsBetween(Window.unboundedPreceding, 0)
    val keptBoundary = scored.join(broadcast(boundary), Seq("qb"))
      .withColumn("run", sum(tokensCol).over(wb))
      .filter(col("cum_pre") + col("run") <= budget)
      .drop("cum_pre", "run")
    keptFull.unionAll(keptBoundary).drop("qb")
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): spread a total token `budget` as UNIFORMLY as
    * possible across strata, capping each stratum at `epochs` passes
    * over its available tokens — the principled alternative to
    * temperature mixing (no temperature to tune; low-resource languages
    * are never oversampled past their epoch cap, high-resource never
    * dominate). Exact integer waterfill, closed form: sort strata by
    * cap ascending; stratum i is capped iff cap_i·(L−i+1) + P_{i−1} ≤ B
    * (P = prefix cap sum — the standard prefix property makes the
    * condition self-consistent); capped strata take their cap, the rest
    * share (B − P_k) by integer division with the remainder going to
    * the first r uncapped strata in name order — deterministic,
    * documented, and sum(alloc) == B exactly whenever the budget fits
    * under the total capacity. All windows run over the STRATA table
    * (bounded — languages, not docs; the proven bucket-table shape).
    * Returns (strata, n_docs, avail_tokens, alloc_tokens, rate_bp)
    * with rate_bp = alloc·10000 div (epochs·avail) — 10000 exactly for
    * capped strata. */
  def unimaxAlloc(
      docs: DataFrame, strata: String, tokensCol: String,
      budget: Long, epochs: Int = 1): DataFrame = {
    require(epochs >= 1, s"epochs >= 1, got $epochs")
    val caps = Bounded.frame(
      docs.groupBy(strata)
        .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("avail"))
        .withColumn("cap", col("avail") * epochs),
      1L << 16, "unimaxAlloc strata table")
    val wOrd = Window.orderBy(col("cap").asc, col(strata))
    val idx = caps
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("p_pre", coalesce(
        sum("cap").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val tot = caps.agg(count(lit(1)).as("l_tot"), lit(budget).as("b"))
    val cp = idx.crossJoin(broadcast(tot))
      .withColumn("capped",
        col("cap") * (col("l_tot") - col("i") + 1L) + col("p_pre") <= col("b"))
    val ks = cp.agg(
      sum(when(col("capped"), 1L).otherwise(0L)).as("k"),
      coalesce(sum(when(col("capped"), col("cap"))), lit(0L)).as("p_k"))
    cp.crossJoin(broadcast(ks))
      .withColumn("q", expr("(b - p_k) div greatest(l_tot - k, 1L)"))
      .withColumn("r", expr("(b - p_k) % greatest(l_tot - k, 1L)"))
      .withColumn("j", row_number()
        .over(Window.partitionBy("capped").orderBy(strata)).cast("long"))
      .withColumn("alloc_tokens", when(col("capped"), col("cap"))
        .otherwise(col("q") + when(col("j") <= col("r"), 1L).otherwise(0L)))
      .select(col(strata), col("n_docs"), col("avail").as("avail_tokens"),
        col("alloc_tokens"),
        expr("alloc_tokens * 10000 div cap").as("rate_bp"))
  }

  /** Deterministic CURRICULUM ordering — shortest-sequences-first with an
    * md5 shuffle inside each difficulty band (the classic length-based
    * warmup schedule, reproducible run to run): every doc gets a dense
    * 0-based training `position`, ordered by (length bucket asc, md5,
    * docId). The 100 TB shape is the distributed two-phase ordering (the
    * "zipWithIndex done right" pattern): docs land in (bucket,
    * 2-hex-md5-prefix) MICRO-buckets, the micro-bucket histogram —
    * buckets×256 rows, tiny at any scale — takes the ONLY unpartitioned
    * window for its prefix-sum offsets and broadcasts, and each doc's
    * position is its broadcast offset plus a rank windowed WITHIN its
    * micro-bucket (corpus/(buckets·256)-sized partitions). The catalog
    * oracle computes the same ordering as ONE global sort, so the hash
    * gate proves two-phase ≡ global. */
  def curriculumOrder(
      docs: DataFrame, bucketWidth: Int = 16,
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(docId),
      size(split(lower(col(textCol)), " ")).cast("long").as("n_tok"))
      .withColumn("bucket", expr(s"n_tok div $bucketWidth"))
      .withColumn("h", md5(concat(lit("c"), col(docId).cast("string"))))
      .withColumn("hex", substring(col("h"), 1, 2))
    val counts = Bounded.frame(
      base.groupBy("bucket", "hex").agg(count(lit(1)).as("n")),
      1L << 20, "curriculumOrder micro-bucket histogram")
    val wOff = Window.orderBy("bucket", "hex")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum("n").over(wOff), lit(0L)))
      .select("bucket", "hex", "off")
    val wIn = Window.partitionBy("bucket", "hex").orderBy(col("h"), col(docId))
    base.join(broadcast(offsets), Seq("bucket", "hex"))
      .withColumn("position", col("off") + row_number().over(wIn) - 1)
      .select(col(docId), col("n_tok"), col("bucket"), col("position"))
  }

  /** Concat-and-chunk sequence packing: assign docs (in docId order within
    * each `strata`) to fixed-budget training sequences by running token
    * cumsum div `budget`. Returns the input plus (seq_id, cum). */
  def packSequences(
      docs: DataFrame, strata: String, tokensCol: String, budget: Int,
      docId: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(strata).orderBy(docId)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum", sum(tokensCol).over(w))
      .withColumn("seq_id", expr(s"(cum - $tokensCol) div $budget"))
  }
}
