package graft.catalog

import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.Tables

/** Text-analysis operators over `documents.parquet` (builder brief:
  * token counting, quality scoring, language-ID, TF-IDF, fingerprinting).
  * Every entry is SQL-expressible and carries a DuckDB oracle; scoring
  * formulas avoid transcendentals where a rational form suffices so the
  * cross-engine hash cannot flake on libm differences. */
object TextQueries {

  /** Identical stopword lists on both sides — built from one constant.
    * Shared with PipelineQueries so the curation pipeline's lang-ID stage is
    * the same operator, not a near-copy. */
  private[catalog] val stopwords: Seq[(String, String)] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "pour", "que"),
    "es" -> Seq("el", "los", "las", "y", "es", "uno", "una", "de", "para", "por"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "ni", "ta", "men", "zai", "you")
  ).flatMap { case (lang, ws) => ws.map(lang -> _) }

  private[catalog] def stopValues: String =
    stopwords.map { case (l, w) => s"('$l','$w')" }.mkString(", ")

  /** Token counting: whitespace tokens + regex word tokens ([a-z0-9]+ — the
    * BPE-ish pre-tokenization pass of an LLM pipeline). */
  val tokenCount = Q(
    "text_token_count",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("word_tokens"),
        length(col("text")).as("n_chars_obs"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS ws_tokens,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word_tokens,
             length(text) AS n_chars_obs
      FROM documents ORDER BY doc_id"""))

  /** Quality scoring: alpha ratio, mean token length, and a rational
    * composite (alpha_ratio · min(tokens,100)/100) — the length/punctuation
    * heuristics of a training-data quality filter. */
  val quality = Q(
    "text_quality_score",
    (s, dir) => {
      val nChars = length(col("text"))
      val nTokens = size(split(col("text"), " "))
      val alphaChars = length(regexp_replace(lower(col("text")), "[^a-z]", ""))
      val alphaRatio = alphaChars.cast("double") / nChars
      Tables.documents(s, dir).select(
        col("doc_id"),
        round(alphaRatio, 4).as("alpha_ratio"),
        round((nChars - (nTokens - 1)).cast("double") / nTokens, 4).as("mean_tok_len"),
        round(alphaRatio * least(nTokens, lit(100)).cast("double") / 100.0, 4)
          .as("quality"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             round(len(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
                   / length(text), 4) AS alpha_ratio,
             round((length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
                   / len(string_split(text, ' ')), 4) AS mean_tok_len,
             round(len(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
                   / length(text)
                   * least(len(string_split(text, ' ')), 100)::DOUBLE / 100.0,
                   4) AS quality
      FROM documents ORDER BY doc_id"""))

  /** Language-ID: highest stopword-hit ratio across per-language lists
    * (n-gram/stopword heuristic — no model). Ties break on language code. */
  val langId = Q(
    "text_lang_id",
    (s, dir) => {
      import s.implicits._
      val stopDf = stopwords.toDF("lang", "word")
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      // Per-doc token totals are size(split(...)) — a map-side expression,
      // not a second explode+shuffle (same plan fix as doc_pipeline_curate).
      val cnt = Tables.documents(s, dir).select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("n"))
      val hits = tok.join(broadcast(stopDf), Seq("word"))
        .groupBy("doc_id", "lang").agg(count(lit(1)).as("h"))
      val scored = hits.join(cnt, "doc_id")
        .withColumn("score", col("h").cast("double") / col("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("lang"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("lang").as("pred_lang"),
          round(col("score"), 4).as("score"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH stop(lang, word) AS (VALUES $stopValues),
      tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
              FROM documents),
      cnt AS (SELECT doc_id, len(string_split(lower(text), ' '))::BIGINT AS n
              FROM documents),
      hits AS (SELECT t.doc_id, s.lang, count(*) AS h
               FROM tok t JOIN stop s ON s.word = t.word
               GROUP BY t.doc_id, s.lang),
      scored AS (SELECT h.doc_id, h.lang, h.h::DOUBLE / c.n AS score
                 FROM hits h JOIN cnt c ON c.doc_id = h.doc_id)
      SELECT doc_id, lang AS pred_lang, round(score, 4) AS score
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, lang) AS rn
            FROM scored)
      WHERE rn = 1 ORDER BY doc_id"""))

  /** TF-IDF: top-3 terms per document by tf·ln(N/df), ties on term. The
    * classic two-aggregation shape — tf per (doc, term), df per term, both
    * partial-aggregated map-side. */
  val tfidf = Q(
    "text_tfidf_top3",
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      val tf = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val df = tok.select("doc_id", "word").distinct()
        .groupBy("word").agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "word").crossJoin(broadcast(n))
        .withColumn("tfidf",
          col("tf") * log(col("n_docs").cast("double") / col("df")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("tfidf").desc, col("word"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("doc_id"), col("word"), round(col("tfidf"), 4).as("tfidf"))
        .orderBy("doc_id", "word")
    },
    Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                   FROM documents),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
      df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY word),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (SELECT tf.doc_id, tf.word,
                        tf.tf * ln(n.n_docs::DOUBLE / df.df) AS tfidf
                 FROM tf JOIN df ON df.word = tf.word, n)
      SELECT doc_id, word, round(tfidf, 4) AS tfidf
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, word) AS rn
            FROM scored)
      WHERE rn <= 3 ORDER BY doc_id, word"""))

  /** Document fingerprint: min-sampled rolling hash over char 8-grams
    * (md5-based winnowing lite) — near-identical docs collide, edits far
    * apart do not. */
  val fingerprint = Q(
    "text_fingerprint",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        array_min(transform(
          sequence(lit(1), greatest(length(col("text")) - 7, lit(1))),
          i => md5(lower(col("text")).substr(i, lit(8)).cast("binary"))))
          .as("fingerprint"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id, min(md5(substr(lower(text), i, 8))) AS fingerprint
      FROM (SELECT doc_id, text,
                   unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i
            FROM documents)
      GROUP BY doc_id ORDER BY doc_id"""))

  def qs: Seq[Q] = Seq(tokenCount, quality, langId, tfidf, fingerprint)
}
