package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer — the subword pass a real
  * training pipeline runs where the rest of this library counted
  * whitespace words. Training is the classic iterative greedy loop
  * (Sennrich et al. 2016): count adjacent symbol pairs over the
  * word-frequency table, merge the most frequent pair everywhere,
  * repeat. Every step is deterministic integer arithmetic with a total
  * tie-break (count DESC, left ASC, right ASC), so the learned merge
  * list — and therefore every downstream token count — is replayable
  * verbatim by a DuckDB oracle built from the same stage generator
  * (`oracleStages`, the `Graph.pagerankOracleSql` pattern).
  *
  * Scale shape: the ONLY corpus-sized job is the one-shuffle
  * word-frequency aggregation; the training loop itself runs over the
  * DISTINCT-WORD table (vocabulary-sized, orders of magnitude smaller
  * than the corpus — the standard BPE trick). Each iteration is one
  * small pair-count aggregation plus a single-row argmax collect;
  * lineage is cut with `localCheckpoint` every 8 merges (the
  * ConnectedComponents policy). Tokenizing the corpus afterwards is one
  * equi-join of exploded words against the vocabulary-sized final-state
  * table (auto-broadcast when it fits) — no per-merge work at corpus
  * scale.
  *
  * Symbol-state representation (identical on both engines): a word's
  * current tokenization is a string `" s1  s2  ...  sN  </w> "` —
  * single outer spaces, DOUBLE-space separators, symbols never contain
  * spaces. Applying merge (l, r) is then the plain string replace of
  * `" l  r "` with `" lr "`: the single-space pattern borders consume
  * one space of each neighboring double separator and the replacement
  * restores them, so matches can never straddle a symbol boundary, and
  * left-to-right non-overlapping replace (identical semantics in Spark's
  * `replace` and DuckDB's) is exactly BPE's greedy leftmost merge order
  * — `" l  l  l "` becomes `" ll  l "`, not `" l  ll "`.
  */
object Bpe {

  /** One learned merge: `left + right -> left||right` at `rank`. */
  final case class Merge(rank: Int, left: String, right: String, cnt: Long)

  /** Pre-tokenization word pattern — shared with `text_token_count`'s
    * word_tokens so BPE counts re-base the same word stream. */
  val WordPattern = "[a-z0-9]+"

  /** Word-frequency table (word, freq) — the single corpus-scale job. */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(
        regexp_extract_all(lower(col(textCol)), lit(WordPattern), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol state for one word: characters double-space-joined +
    * `</w>`, wrapped in single outer spaces (see object doc). */
  private def stateExpr(word: Column): Column =
    concat(lit(" "),
      array_join(regexp_extract_all(word, lit("."), lit(0)), "  "),
      lit("  </w> "))

  /** Initial symbol states for a word-frequency table. */
  def initStates(wf: DataFrame): DataFrame =
    wf.withColumn("state", stateExpr(col("word")))

  /** Replay a learned merge list over an arbitrary DISTINCT word table
    * (column `word`) — the BPE "apply" step. Works for any corpus, not just
    * the training one: a word the training corpus never saw simply matches
    * fewer (possibly zero) merges and stays closer to character-tokenized,
    * which is exactly greedy BPE's behavior on unseen text. Lineage is cut
    * every 8 replaces (the `train` policy). */
  def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    var st = words.withColumn("state", stateExpr(col("word")))
    merges.foreach { m =>
      st = st.withColumn("state",
        replaceLit(col("state"), s" ${m.left}  ${m.right} ", s" ${m.left}${m.right} "))
      if (m.rank % 8 == 0) st = st.localCheckpoint()
    }
    st
  }

  /** Adjacent-pair counts weighted by word frequency: one explode of the
    * zipped neighbor slices, one aggregation — vocabulary-sized. */
  def pairCounts(states: DataFrame): DataFrame = {
    val t = split(trim(col("state")), "  ")
    states
      .select(col("freq"),
        explode(zip_with(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("pr"))
      .select(col("pr")("l").as("l"), col("pr")("r").as("r"), col("freq"))
      .groupBy("l", "r").agg(sum("freq").as("cnt"))
  }

  /** Train `nMerges` merges; returns the ranked merge list and the final
    * per-word symbol states (the word → tokens map). Fails loudly if the
    * vocabulary saturates before `nMerges` pairs exist — callers size
    * `nMerges` far below the corpus's merge capacity. */
  def train(wf: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    var states = initStates(wf).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var i = 1
    while (i <= nMerges) {
      val best = pairCounts(states)
        .orderBy(col("cnt").desc, col("l"), col("r")).head(1)
      require(best.nonEmpty,
        s"BPE vocabulary saturated after ${i - 1} merges; lower nMerges")
      val (l, r, c) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += Merge(i, l, r, c)
      states = states.withColumn("state",
        replaceLit(col("state"), s" $l  $r ", s" $l$r "))
      if (i % 8 == 0) states = states.localCheckpoint()
      i += 1
    }
    (merges.result(), states.localCheckpoint())
  }

  private def replaceLit(src: Column, search: String, repl: String): Column =
    call_function("replace", src, lit(search), lit(repl))

  /** Per-word BPE token count from a final-state table. */
  def tokenCounts(finalStates: DataFrame): DataFrame =
    finalStates.select(col("word"),
      size(split(trim(col("state")), "  ")).cast("long").as("n_tok"))

  /** Per-doc BPE token counts: explode words, replay the merge list over
    * the corpus's OWN distinct-word table (vocabulary-sized, so the
    * word → n_tok map auto-broadcasts when it fits), sum per doc. Because
    * the map is derived from this corpus's words — not the training
    * corpus's — the equi-join is lossless by construction (no OOV drops),
    * and unseen words get true greedy-BPE tokenizations. Wordless docs are
    * kept at 0 via the final left join. */
  def tokenizeCounts(
      docs: DataFrame, merges: Seq[Merge],
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dw = docs.select(col(docId), explode(
      regexp_extract_all(lower(col(textCol)), lit(WordPattern), lit(0)))
      .as("word"))
    val wt = tokenCounts(applyMerges(dw.select("word").distinct(), merges))
    val agg = dw.join(wt, Seq("word"))
      .groupBy(docId)
      .agg(count(lit(1)).as("n_words"), sum("n_tok").as("n_bpe_tokens"))
    docs.select(col(docId)).join(agg, Seq(docId), "left")
      .select(col(docId),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle generation — the same unrolled-stage trick as
  // Graph.pagerankOracleSql: the oracle replays the exact greedy loop as
  // a chain of CTEs generated by this code, so a Spark/oracle hash match
  // proves every merge decision AND every resulting token count.
  // ---------------------------------------------------------------------

  /** CTE chain `wf, s0, b1, s1, ..., b<n>, s<n>` over `documents`. Every
    * stage is MATERIALIZED: each `s(i-1)` is referenced twice (by `b i`
    * and `s i`), so DuckDB's default inlining would expand the chain into
    * 2^n scans of `documents` — at 24 merges that exhausts file handles
    * long before it exhausts time. Materialization makes the oracle replay
    * linear, exactly like the Spark loop it mirrors.
    *
    * PRECONDITION (the asymmetric failure shape): if the vocabulary
    * saturates before `nMerges` — some `b_i` has no pair rows — the
    * `s_i` cross join silently EMPTIES the rest of the chain, while the
    * Spark side's [[train]] throws `require(best.nonEmpty)`. Both end
    * red at the gate (empty oracle vs failed query), but for different
    * reported reasons; callers size nMerges far below corpus merge
    * capacity so neither trips (BpeQueries uses 24 on a corpus with
    * hundreds of distinct pairs). */
  def oracleStages(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""
      wf AS MATERIALIZED (SELECT w AS word, count(*)::BIGINT AS freq
             FROM (SELECT unnest(regexp_extract_all(lower(text),
                     '$WordPattern')) AS w FROM documents)
             GROUP BY 1),
      s0 AS MATERIALIZED (SELECT word, freq,
                    ' ' || array_to_string(regexp_extract_all(word, '.'),
                      '  ') || '  </w> ' AS state
             FROM wf)"""
    for (i <- 1 to nMerges) {
      sb ++= s""",
      b$i AS MATERIALIZED (SELECT pr[1] AS l, pr[2] AS r, sum(freq)::BIGINT AS cnt
             FROM (SELECT freq,
                     unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS pr
                   FROM (SELECT freq, string_split(trim(state), '  ') AS t
                         FROM s${i - 1}))
             GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1),
      s$i AS MATERIALIZED (SELECT word, freq,
                    replace(state, ' ' || b$i.l || '  ' || b$i.r || ' ',
                            ' ' || b$i.l || b$i.r || ' ') AS state
             FROM s${i - 1}, b$i)"""
    }
    sb.toString
  }

  /** Full oracle for the ranked merge list. */
  def trainOracleSql(nMerges: Int): String = {
    val union = (1 to nMerges)
      .map(i => s"SELECT $i AS rank, l, r, l || r AS merged, cnt FROM b$i")
      .mkString("\n      UNION ALL ")
    s"WITH ${oracleStages(nMerges)}\n      $union ORDER BY rank"
  }

  /** CTEs for per-doc BPE token counts over the final states `s<n>`.
    * `bpe_doc` is the consumable result — it left-joins back to
    * `documents` so wordless docs appear at 0, matching `tokenizeCounts`
    * (`bpe_agg` alone omits them). */
  def tokenizeOracleCtes(nMerges: Int): String = s"""${oracleStages(nMerges)},
      dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
               '$WordPattern')) AS word FROM documents),
      wt AS (SELECT word, len(string_split(trim(state), '  '))::BIGINT
               AS n_tok FROM s$nMerges),
      bpe_agg AS (SELECT doc_id, count(*)::BIGINT AS n_words,
                         sum(n_tok)::BIGINT AS n_bpe_tokens
                  FROM dw JOIN wt USING (word) GROUP BY doc_id),
      bpe_doc AS (SELECT d.doc_id,
                         coalesce(a.n_words, 0)::BIGINT AS n_words,
                         coalesce(a.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens
                  FROM documents d LEFT JOIN bpe_agg a USING (doc_id))"""
}
