package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level text operators: repeated-span detection (the
  * Lee-et-al.-style "dedup at the substring level, not the document level"
  * pass), paragraph/line-level global dedup (the RefinedWeb/C4 pass), and
  * positional phrase search over an inverted-index shape. The reference
  * engine has no text surface (its documents are opaque embedded blobs,
  * src/database/core.rs:267-313) — these are training-data-pipeline
  * extensions, and every output is integer/digest-exact so the DuckDB
  * catalog twins hash-match.
  *
  * Scale shapes: span and paragraph dedup shuffle HASH-SIZED rows keyed on
  * gram/line content — the one unavoidable exchange of any global dedup —
  * and count-filter duplicated keys before joining back, so the join-back
  * traffic is proportional to the corpus's duplication, not its size.
  * Phrase search filters to the query terms' postings BELOW the joins, so
  * only those postings ever shuffle (the inverted-index access path, not a
  * corpus scan per term).
  */
object TextMatch {

  /** Per-document repeated-span coverage: a doc's k-token windows that also
    * appear in ANOTHER doc, and the distinct token positions those windows
    * cover. `dup_frac_1e4` is the integer-quantized fraction of the doc's
    * tokens sitting inside some cross-doc duplicated span — the signal a
    * substring-level dedup pass thresholds on (boilerplate headers, licence
    * blocks, templated spam score high even when the whole doc is unique).
    * Only docs with at least one duplicated window are returned.
    *
    * Plan: windows explode map-side; the duplicated-gram set is a
    * count-filtered aggregate on the gram hash (never the corpus); the
    * join-back fans out only on duplicated grams; coverage is one lag
    * window over the hit rows (interval-union arithmetic — no per-hit
    * explode). */
  def spanDedupStats(
      docs: DataFrame, k: Int = 8,
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    // Explode window START positions and build each gram with plain
    // slice/array_join expressions — one codegen projection. (Exploding a
    // `transform`-built gram ARRAY evaluates the lambda interpreted: the
    // HOF form cost ~4 s of fixed overhead at 5k docs.)
    val wins = docs
      .filter(size(toks) >= k)
      .select(col(docId), size(toks).cast("long").as("n_tok"), toks.as("toks"))
      .select(col(docId), col("n_tok"), col("toks"),
        posexplode(sequence(lit(1), col("n_tok").cast("int") - (k - 1)))
          .as(Seq("pos", "start")))
    // md5 the gram before the exchange: a 16-byte digest shuffles instead
    // of the k-token string (the gram text never leaves the map side).
    val hashed = wins.select(col(docId), col("n_tok"), col("pos"),
      // unhex: shuffle the digest as 16 RAW bytes, not 32 hex chars — h
      // is internal (grouped/joined, never output) and hex is a 1:1
      // recoding, so this halves the dominant exchange's key column
      // (r15, guide §2.3 narrower types)
      unhex(md5(array_join(slice(col("toks"), col("start"), lit(k)), " ")
        .cast("binary"))).as("h"))
    val dup = hashed.groupBy("h")
      .agg(count_distinct(col(docId)).as("nd"))
      .filter(col("nd") > 1)
      .select("h")
    // Covered-token count WITHOUT the k× explode (r15 optimization round,
    // guide §2.3 "shuffle fewer bytes"): the original exploded every hit
    // into its k covered positions and ran TWO count_distincts (an
    // Expand that doubled the exploded volume again — hits × k × 2 rows
    // through the doc-keyed exchange, measured 16.9 MB shuffled at sf0.1
    // vs rare_span's 7.8 on the same window set). (docId, pos) is UNIQUE
    // in `hashed` (one hash per window start), so n_dup_wins is a plain
    // count, and the union size of the duplicated [pos, pos+k-1]
    // intervals is exactly k for the first sorted hit plus
    // min(gap, k) per successor — one lag window over the hit rows
    // themselves (codegen, no Expand), identical by interval arithmetic
    // (TextMatchSpec pins the overlapping-window case; the DuckDB oracle
    // still computes count(DISTINCT ti) its own way).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(docId).orderBy("pos")
    hashed.join(dup, "h")
      .select(col(docId), col("n_tok"), col("pos"))
      .withColumn("cov_inc",
        coalesce(least(col("pos") - lag("pos", 1).over(w), lit(k)), lit(k))
          .cast("long"))
      .groupBy(docId)
      .agg(count(lit(1)).as("n_dup_wins"),
        sum("cov_inc").as("n_cov_tok"),
        first("n_tok").as("n_tok"))
      .select(col(docId), col("n_dup_wins"), col("n_cov_tok"),
        expr("n_cov_tok * 10000 div n_tok").as("dup_frac_1e4"))
  }

  /** Per-document RARE-span audit — the inverse observable of
    * [[spanDedupStats]] and the memorization/canary-risk signal a
    * training-privacy pass thresholds on (Carlini-style canary
    * extraction targets sequences the model saw in exactly one
    * document): for each doc, how many of its k-token windows are
    * corpus-UNIQUE (document frequency 1), the integer-quantized
    * unique fraction, and the minimum df over its windows (min_df = 1
    * ⟹ the doc carries at least one span no other doc has; a doc full
    * of PII or keys with uniq_frac ≈ 10000 is the canary profile,
    * while boilerplate scores near 0). Same plan family as the span
    * ops: windows explode map-side, only 16-byte md5 digests shuffle
    * (gram text never leaves the map side), df is a gram-sized
    * aggregate, and the join-back is the one corpus-sized exchange.
    * Returns (docId, n_tok, n_wins, n_unique_wins, uniq_frac_1e4,
    * min_df) for docs with ≥ k tokens. */
  def rareSpanAudit(
      docs: DataFrame, k: Int = 8,
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val wins = docs
      .filter(size(toks) >= k)
      .select(col(docId), size(toks).cast("long").as("n_tok"), toks.as("toks"))
      .select(col(docId), col("n_tok"), col("toks"),
        posexplode(sequence(lit(1), col("n_tok").cast("int") - (k - 1)))
          .as(Seq("pos", "start")))
    val hashed = wins.select(col(docId), col("n_tok"), col("pos"),
      // raw 16-byte digest for the internal key (see spanDedupStats)
      unhex(md5(array_join(slice(col("toks"), col("start"), lit(k)), " ")
        .cast("binary"))).as("h"))
    val df = hashed.groupBy("h")
      .agg(count_distinct(col(docId)).as("df"))
    hashed.join(df, "h")
      .groupBy(docId)
      .agg(first("n_tok").as("n_tok"),
        count(lit(1)).as("n_wins"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique_wins"),
        min("df").as("min_df"))
      .select(col(docId), col("n_tok"), col("n_wins"), col("n_unique_wins"),
        expr("n_unique_wins * 10000 div n_wins").as("uniq_frac_1e4"),
        col("min_df"))
  }

  /** Substring-level SCRUB — the removal pass [[spanDedupStats]] only
    * measures (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better": drop the repeated substring, keep one copy): a token
    * is removed iff it is covered by a cross-doc-duplicated k-token
    * window occurrence that is NOT that gram's globally-first occurrence
    * (minimum (docId, pos) — first-crawled wins, matching I10 and the
    * paragraph pass). Tokens covered only by first occurrences survive,
    * so exactly one copy of every duplicated span remains in the corpus.
    * Returns (docId, n_tok, n_dropped, kept_md5) for EVERY doc — the
    * digest gates the reassembled cleaned text, not just counts.
    *
    * Plan: the duplicated-gram set and the per-gram first occurrence are
    * gram-hash-keyed aggregates (16-byte keys, corpus-duplication-sized);
    * drop positions explode bounded by k per non-first hit; reassembly is
    * one left join of the (bounded) per-doc drop set back to the token
    * arrays with an index-aware `filter` — map-side, no further
    * shuffle. */
  def spanScrub(
      docs: DataFrame, k: Int = 8,
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val base = docs.select(col(docId), toks.as("toks"),
      size(toks).cast("long").as("n_tok"))
    // posexplode yields (0-based ordinal, value); the VALUE `start` is the
    // 1-based window position everything downstream keys on — using the
    // ordinal here shifted every drop interval by one token (counts were
    // unchanged, so only the digest gate caught it).
    val wins = base
      .filter(col("n_tok") >= k)
      .select(col(docId), col("toks"),
        posexplode(sequence(lit(1), col("n_tok").cast("int") - (k - 1)))
          .as(Seq("ord", "start")))
    val hashed = wins.select(col(docId), col("start").as("pos"),
      // raw 16-byte digest for the internal key (see spanDedupStats)
      unhex(md5(array_join(slice(col("toks"), col("start"), lit(k)), " ")
        .cast("binary"))).as("h"))
    val dup = hashed.groupBy("h")
      .agg(count_distinct(col(docId)).as("nd"))
      .filter(col("nd") > 1).select("h")
    val occ = hashed.join(dup, "h")
    val firsts = occ.groupBy("h")
      .agg(min(struct(col(docId), col("pos"))).as("f"))
      .select(col("h"), col(s"f.$docId").as("f_doc"), col("f.pos").as("f_pos"))
    val drops = occ.join(firsts, "h")
      .filter(!(col(docId) === col("f_doc") && col("pos") === col("f_pos")))
      .select(col(docId),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("ti"))
      .groupBy(docId).agg(collect_set("ti").as("drop_ti"))
    base.join(drops, Seq(docId), "left")
      .withColumn("drop_ti", coalesce(col("drop_ti"), array().cast("array<int>")))
      .select(col(docId), col("n_tok"),
        size(col("drop_ti")).cast("long").as("n_dropped"),
        md5(array_join(
          filter(col("toks"), (t, i) =>
            !array_contains(col("drop_ti"), i + 1)), " ")
          .cast("binary")).as("kept_md5"))
  }

  /** Global line-level dedup with first-wins semantics (RefinedWeb's
    * "remove any line already seen anywhere in the corpus", C4's boilerplate
    * pass): documents are segmented into `lineTokens`-token lines, every
    * line occurrence after the globally first (lowest (docId, line_no)) is
    * dropped, and each doc is reassembled from its surviving lines.
    * Returns (docId, n_lines, n_kept, kept_md5) for every input doc —
    * kept_md5 digests the reassembled text, so the gate checks CONTENT.
    *
    * The fixture's planted near-dups are prefix-aligned, so fixed
    * segmentation yields genuine cross-doc duplicate lines without any
    * synthetic planting. One exchange keyed on line content (the global
    * dedup shuffle), one on docId for reassembly. */
  def paragraphDedup(
      docs: DataFrame, lineTokens: Int = 10,
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (base, lines) = segmentLines(docs, lineTokens, docId, textCol)
    val firstWins = Window.partitionBy("line").orderBy(docId, "line_no")
    val kept = lines
      .withColumn("rk", row_number().over(firstWins))
      .filter(col("rk") === 1)
    reassembleKept(base, kept, docId)
  }

  /** Corpus-level BOILERPLATE removal — the drop-ALL-occurrences
    * complement of [[paragraphDedup]]'s first-wins pass (C4's "discard any
    * line appearing in ≥ N pages": navigation bars, cookie notices,
    * licence footers repeat across the crawl and first-wins dedup would
    * still train on one copy of each). A line whose cross-doc document
    * frequency reaches `minDf` is stripped from EVERY document; docs are
    * reassembled from their surviving lines. Same (docId, n_lines, n_kept,
    * kept_md5) contract as [[paragraphDedup]] — kept_md5 digests content,
    * so the gate checks the reassembled text, not just counts.
    *
    * Plan: two corpus passes — the standard count-then-strip shape (the
    * df aggregate is pass 1's line-keyed exchange; pass 2 re-segments and
    * strips). The boilerplate set is by construction TINY (distinct lines
    * with df ≥ minDf — at crawl scale a few thousand hot lines), so the
    * strip is a broadcast anti-join against the corpus-sized lines frame
    * — pass 2's only exchange is the per-doc reassembly. */
  def boilerplateStrip(
      docs: DataFrame, lineTokens: Int = 10, minDf: Int = 3,
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (base, lines) = segmentLines(docs, lineTokens, docId, textCol)
    val hot = lines.groupBy("line")
      .agg(count_distinct(col(docId)).as("df"))
      .filter(col("df") >= minDf)
      .select("line")
    val kept = lines.join(broadcast(hot), Seq("line"), "left_anti")
    reassembleKept(base, kept, docId)
  }

  /** Shared segmentation for the line-level passes: fixed
    * `lineTokens`-token lines per document. Returns (base with n_lines,
    * exploded lines with 0-based line_no). Explodes line ordinals, then
    * slices/joins per row — same codegen-over-HOF rationale as
    * [[spanDedupStats]]. */
  private def segmentLines(
      docs: DataFrame, lineTokens: Int,
      docId: String, textCol: String): (DataFrame, DataFrame) = {
    val toks = split(lower(col(textCol)), " ")
    val base = docs.select(col(docId), toks.as("toks"))
      .withColumn("n_lines",
        expr(s"((size(toks) + ${lineTokens - 1}) div $lineTokens)").cast("long"))
    val lines = base
      .select(col(docId), col("n_lines"), col("toks"),
        explode(sequence(lit(0L), col("n_lines") - 1)).as("line_no"))
      .select(col(docId), col("n_lines"), col("line_no"),
        array_join(slice(col("toks"),
          (col("line_no") * lineTokens + 1).cast("int"), lit(lineTokens)),
          " ").as("line"))
    (base, lines)
  }

  /** Shared reassembly for the line-level passes: per-doc surviving-line
    * count and a digest of the line_no-ordered reassembled text; docs with
    * nothing kept emit (0, md5("")). */
  private def reassembleKept(
      base: DataFrame, kept: DataFrame, docId: String): DataFrame = {
    val reassembled = kept.groupBy(docId)
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws("\n",
          transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
            s => s.getField("line"))).cast("binary")).as("kept_md5"))
    base.select(col(docId), col("n_lines"))
      .join(reassembled, Seq(docId), "left")
      .select(col(docId), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_md5"), md5(lit("").cast("binary"))).as("kept_md5"))
  }

  /** Exact phrase search over a positional inverted index: docs containing
    * `phrase` as consecutive tokens, with occurrence count and first match
    * position (0-based). The postings list is term-filtered BEFORE any
    * join — only the phrase's terms shuffle — and each adjacency is an
    * equi-join on (docId, pos + i), the standard positional-index
    * intersection. Returns (docId, n_occ, first_pos). */
  def phraseSearch(
      docs: DataFrame, phrase: Seq[String],
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs at least one term")
    // postings are lowercased, so normalize the query terms the same way —
    // an uppercase query term would otherwise silently match nothing
    val terms = phrase.map(_.toLowerCase)
    val post = docs
      .select(col(docId),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "w")))
      .filter(col("w").isInCollection(terms.distinct))
    val start = post.filter(col("w") === terms.head)
      .select(col(docId), col("pos"))
    val matched = terms.zipWithIndex.tail.foldLeft(start) {
      case (acc, (term, i)) =>
        acc.join(
          post.filter(col("w") === term)
            .select(col(docId).as("d_i"), (col("pos") - i).as("p_i")),
          acc(docId) === col("d_i") && acc("pos") === col("p_i"))
          .select(acc(docId), acc("pos"))
    }
    matched.groupBy(docId)
      .agg(count(lit(1)).as("n_occ"), min("pos").cast("long").as("first_pos"))
  }
}
