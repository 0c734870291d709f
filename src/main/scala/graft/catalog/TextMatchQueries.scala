package graft.catalog

import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.Tables
import graft.ops.{FuzzyJoin, TextMatch}

/** Catalog twins for the exact substring/line-level text operators
  * (`ops/TextMatch.scala`) and the edit-distance similarity join
  * (`ops/FuzzyJoin.scala`) — the remaining dedup/matching passes of a
  * training-data pipeline beyond document-level near-dup: substring-span
  * dedup (Lee et al.-style), line-level global dedup (RefinedWeb/C4),
  * positional phrase search, and fuzzy entity matching. Every entry is
  * integer/digest-exact; every oracle derives the answer a DIFFERENT way
  * than the Spark plan (array indexing vs posting joins, brute-force
  * product vs PassJoin) so the hash gate checks semantics, not a shared
  * implementation.
  */
object TextMatchQueries {

  /** Cross-doc repeated 8-token spans: per-doc duplicated-window count and
    * covered-token fraction. The Spark side shuffles 16-byte raw md5 gram
    * digests (unhex'd — the r15 shuffle diet) and count-filters before
    * the join-back; the oracle recomputes from raw arrays. */
  val spanDedup = Q(
    "dedup_span_exact",
    (s, dir) =>
      TextMatch.spanDedupStats(Tables.documents(s, dir), k = 8)
        .orderBy("doc_id"),
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                 FROM documents),
      wins AS (SELECT doc_id, len(toks)::BIGINT AS n_tok, i AS pos,
                      md5(array_to_string(toks[i:i+7], ' ')) AS h
               FROM w, unnest(range(1, len(toks) - 6)) t(i)),
      dupg AS (SELECT h FROM wins GROUP BY h
               HAVING count(DISTINCT doc_id) > 1),
      hit AS (SELECT doc_id, n_tok, pos FROM wins JOIN dupg USING (h)),
      cov AS (SELECT doc_id, any_value(n_tok) AS n_tok,
                     count(DISTINCT pos)::BIGINT AS n_dup_wins,
                     count(DISTINCT ti)::BIGINT AS n_cov_tok
              FROM hit, unnest(range(pos, pos + 8)) u(ti)
              GROUP BY doc_id)
      SELECT doc_id, n_dup_wins, n_cov_tok,
             n_cov_tok * 10000 // n_tok AS dup_frac_1e4
      FROM cov ORDER BY doc_id"""))

  /** Memorization/canary-risk audit ([[graft.ops.TextMatch.rareSpanAudit]]):
    * per-doc corpus-unique 8-token-window fraction and minimum window
    * document frequency — the training-privacy observable next to
    * `dedup_span_exact`'s duplication coverage (same window/hash
    * machinery, inverse threshold direction). */
  val rareSpan = Q(
    "text_rare_span_audit",
    (s, dir) =>
      TextMatch.rareSpanAudit(Tables.documents(s, dir), k = 8)
        .orderBy("doc_id"),
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                 FROM documents),
      wins AS (SELECT doc_id, len(toks)::BIGINT AS n_tok, i AS pos,
                      md5(array_to_string(toks[i:i+7], ' ')) AS h
               FROM w, unnest(range(1, len(toks) - 6)) t(i)),
      dfg AS (SELECT h, count(DISTINCT doc_id)::BIGINT AS df
              FROM wins GROUP BY h)
      SELECT doc_id, any_value(n_tok) AS n_tok,
             count(*)::BIGINT AS n_wins,
             coalesce(sum(CASE WHEN df = 1 THEN 1 END), 0)::BIGINT
               AS n_unique_wins,
             coalesce(sum(CASE WHEN df = 1 THEN 1 END), 0)::BIGINT
               * 10000 // count(*)::BIGINT AS uniq_frac_1e4,
             min(df) AS min_df
      FROM wins JOIN dfg USING (h)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Substring-level REMOVAL ([[graft.ops.TextMatch.spanScrub]] — the
    * Lee-et-al. pass dedup_span_exact only measures): every token covered
    * by a non-first occurrence of a cross-doc duplicated 8-token window
    * is dropped, first occurrence kept, and each doc's cleaned text is
    * reassembled and digest-gated. The oracle replays the rank-1
    * first-occurrence decision and the positional reassembly in SQL. */
  val spanScrub = Q(
    "dedup_span_scrub",
    (s, dir) =>
      TextMatch.spanScrub(Tables.documents(s, dir), k = 8)
        .orderBy("doc_id"),
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                 FROM documents),
      wins AS (SELECT doc_id, i AS pos,
                      md5(array_to_string(toks[i:i+7], ' ')) AS h
               FROM w, unnest(range(1, len(toks) - 6)) t(i)),
      dupg AS (SELECT h FROM wins GROUP BY h
               HAVING count(DISTINCT doc_id) > 1),
      occ AS (SELECT doc_id, pos, h,
                     row_number() OVER (PARTITION BY h
                                        ORDER BY doc_id, pos) AS rk
              FROM wins JOIN dupg USING (h)),
      drops AS (SELECT DISTINCT doc_id, ti
                FROM occ, unnest(range(pos, pos + 8)) u(ti)
                WHERE rk > 1),
      toks2 AS (SELECT doc_id, i AS ti, toks[i] AS tok
                FROM w, unnest(range(1, len(toks) + 1)) t(i)),
      keptt AS (SELECT t.doc_id, t.ti, t.tok
                FROM toks2 t LEFT JOIN drops d
                  ON d.doc_id = t.doc_id AND d.ti = t.ti
                WHERE d.ti IS NULL),
      agg AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
                     md5(string_agg(tok, ' ' ORDER BY ti)) AS kept_md5
              FROM keptt GROUP BY doc_id)
      SELECT w.doc_id, len(w.toks)::BIGINT AS n_tok,
             (len(w.toks) - coalesce(agg.n_kept, 0))::BIGINT AS n_dropped,
             coalesce(agg.kept_md5, md5('')) AS kept_md5
      FROM w LEFT JOIN agg USING (doc_id)
      ORDER BY doc_id"""))

  /** Line-level global first-wins dedup over 10-token lines, docs
    * reassembled and digest-gated. The fixture's prefix-aligned near-dups
    * make 127 of 2,949 lines genuine cross-doc duplicates at sf0.01 — no
    * planting needed. */
  val paragraphs = Q(
    "dedup_paragraphs",
    (s, dir) =>
      TextMatch.paragraphDedup(Tables.documents(s, dir), lineTokens = 10)
        .orderBy("doc_id"),
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                 FROM documents),
      b AS (SELECT doc_id, toks, ((len(toks) + 9) // 10)::BIGINT AS n_lines
            FROM w),
      lines AS (SELECT doc_id, j AS line_no,
                       array_to_string(toks[(j*10+1):(j*10+10)], ' ') AS line
                FROM b, unnest(range(0, n_lines)) t(j)),
      keep AS (SELECT doc_id, line_no, line,
                      row_number() OVER (PARTITION BY line
                                         ORDER BY doc_id, line_no) AS rk
               FROM lines),
      agg AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
                     md5(string_agg(line, chr(10) ORDER BY line_no))
                       AS kept_md5
              FROM keep WHERE rk = 1 GROUP BY doc_id)
      SELECT b.doc_id, b.n_lines, coalesce(agg.n_kept, 0) AS n_kept,
             coalesce(agg.kept_md5, md5('')) AS kept_md5
      FROM b LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""))

  /** Corpus-level boilerplate strip — the drop-ALL-occurrences complement
    * of `dedup_paragraphs`' first-wins pass (C4's "discard any line seen
    * on ≥ 3 pages"): every occurrence of a line with cross-doc document
    * frequency ≥ 3 is removed, docs reassembled and digest-gated. The
    * fixture's prefix-aligned near-dups put 15 lines at df ≥ 3 at sf0.01
    * — real boilerplate, no planting. Same content-digest contract as the
    * paragraph entry; the two entries differ exactly on the hot lines'
    * FIRST occurrences, which first-wins keeps and this pass drops. */
  val boilerplate = Q(
    "text_boilerplate_strip",
    (s, dir) =>
      TextMatch.boilerplateStrip(Tables.documents(s, dir),
        lineTokens = 10, minDf = 3)
        .orderBy("doc_id"),
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                 FROM documents),
      b AS (SELECT doc_id, toks, ((len(toks) + 9) // 10)::BIGINT AS n_lines
            FROM w),
      lines AS (SELECT doc_id, j AS line_no,
                       array_to_string(toks[(j*10+1):(j*10+10)], ' ') AS line
                FROM b, unnest(range(0, n_lines)) t(j)),
      hot AS (SELECT line FROM (
                SELECT line, count(DISTINCT doc_id) AS df
                FROM lines GROUP BY line) WHERE df >= 3),
      keep AS (SELECT l.doc_id, l.line_no, l.line
               FROM lines l LEFT JOIN hot h ON h.line = l.line
               WHERE h.line IS NULL),
      agg AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
                     md5(string_agg(line, chr(10) ORDER BY line_no))
                       AS kept_md5
              FROM keep GROUP BY doc_id)
      SELECT b.doc_id, b.n_lines, coalesce(agg.n_kept, 0) AS n_kept,
             coalesce(agg.kept_md5, md5('')) AS kept_md5
      FROM b LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""))

  /** Exact phrase search for "table value": positional-index adjacency
    * joins on the Spark side (only the two terms' postings shuffle); the
    * oracle checks token arrays by direct indexing. first_pos is 0-based
    * on both sides. */
  val phrase = Q(
    "phrase_search",
    (s, dir) =>
      TextMatch.phraseSearch(Tables.documents(s, dir),
        phrase = Seq("table", "value"))
        .orderBy("doc_id"),
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                 FROM documents),
      pos AS (SELECT doc_id, i - 1 AS pos
              FROM w, unnest(range(1, len(toks))) t(i)
              WHERE toks[i] = 'table' AND toks[i+1] = 'value')
      SELECT doc_id, count(*)::BIGINT AS n_occ, min(pos)::BIGINT AS first_pos
      FROM pos GROUP BY doc_id ORDER BY doc_id"""))

  /** Edit-distance <= 2 self-join over 24-char document title prefixes with
    * planted typo copies (substitution at a doc_id-derived position; every
    * 10th also drops a char — ed 2). Spark runs PassJoin (constant-fanout
    * segment index, never all-pairs); the oracle brute-forces the full
    * product with DuckDB's levenshtein — the hash gate proves the filtered
    * join LOSSLESS, the falsifiable property that matters at 100 TB where
    * brute force is impossible. The 25 ed-0 pairs are the corpus's natural
    * prefix-aligned near-dups. */
  /** The fuzzy-join input: 24-char title prefixes plus planted typo copies
    * (substitution at a doc_id-derived position; every 10th also drops a
    * char). Shared with `tools/FuzzyProbe` so the probe times EXACTLY the
    * catalog entry's workload — a drifted copy would silently measure a
    * different query. */
  private[graft] def fuzzyCorpus(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir)
    val orig = docs.select(col("doc_id").as("id"),
      substring(col("text"), 1, 24).as("s"))
    val mut = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("s0"),
        (col("doc_id") % 20 + 2).cast("int").as("p"))
      .select(col("doc_id"), col("p"),
        expr("concat(substr(s0, 1, p-1), 'z', substr(s0, p+1, 100))").as("m"))
      .select((col("doc_id") + 100000).as("id"),
        when(col("doc_id") % 10 === 0,
          expr("concat(substr(m, 1, p+2), substr(m, p+4, 100))"))
          .otherwise(col("m")).as("s"))
    orig.unionAll(mut)
  }

  val fuzzyJoin = Q(
    "fuzzy_join_edit",
    (s, dir) =>
      FuzzyJoin.selfJoin(fuzzyCorpus(s, dir), d = 2)
        .orderBy("id_a", "id_b"),
    Some("""
      WITH t AS (
        SELECT doc_id AS id, substr(text, 1, 24) AS s FROM documents
        UNION ALL
        SELECT doc_id + 100000,
               CASE WHEN doc_id % 10 = 0
                    THEN concat(substr(concat(substr(s0,1,p-1),'z',substr(s0,p+1,100)),1,p+2),
                                substr(concat(substr(s0,1,p-1),'z',substr(s0,p+1,100)),p+4,100))
                    ELSE concat(substr(s0,1,p-1),'z',substr(s0,p+1,100)) END
        FROM (SELECT doc_id, substr(text,1,24) AS s0, doc_id % 20 + 2 AS p
              FROM documents WHERE doc_id % 5 = 0))
      SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.s, b.s)::BIGINT AS ed
      FROM t a JOIN t b ON a.id < b.id
      WHERE levenshtein(a.s, b.s) <= 2
      ORDER BY id_a, id_b"""))

  def qs: Seq[Q] =
    Seq(spanDedup, rareSpan, spanScrub, paragraphs, boilerplate, phrase,
      fuzzyJoin)
}
