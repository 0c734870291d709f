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
    * `nMerges` far below the corpus's merge capacity.
    *
    * TWO TIERS, one semantics (the `ConnectedComponents.updateIncremental`
    * / LSH small-batch idiom): the greedy loop runs over the DISTINCT-WORD
    * table, which at most corpus scales fits on the driver — and each
    * distributed round is a fixed-size two-stage Spark job whose cost is
    * pure scheduling (measured 116 ms/merge at any corpus size, the
    * bpedeep probe's floor). When the vocabulary is within
    * `driverTierMax`, the identical loop — same pair counting, same
    * (count DESC, l, r) argmax, same leftmost non-overlapping replace
    * (Java `String.replace` ≡ Spark/DuckDB `replace` for literal
    * patterns) — runs as driver arithmetic at ~µs/merge, and BpeSpec
    * asserts tier equality merge-for-merge and state-for-state. A
    * 100 TB corpus with a >1M-word vocabulary takes the distributed
    * tier; everything else stops paying the scheduler. */
  def train(wf: DataFrame, nMerges: Int,
      driverTierMax: Long = 1L << 20): (Seq[Merge], DataFrame) = {
    // clamp BEFORE the +1: a driverTierMax near Long.MaxValue must not
    // overflow to a negative limit (which would count 0 rows and silently
    // collect any vocabulary to the driver)
    val probe = math.min(driverTierMax, Int.MaxValue.toLong - 1) + 1
    val vocab = wf.limit(probe.toInt).count()
    if (vocab <= driverTierMax) trainDriver(wf, nMerges)
    else trainDistributed(wf, nMerges)
  }

  private[graft] def trainDriver(
      wf: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    val spark = wf.sparkSession
    import spark.implicits._
    val rows = wf.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)].collect()
    val words = rows.map(_._1)
    val freqs = rows.map(_._2)
    val states = words.map(w =>
      " " + w.toCharArray.mkString("  ") + "  </w> ")
    val merges = Seq.newBuilder[Merge]
    var i = 1
    while (i <= nMerges) {
      // adjacent-pair counts weighted by word frequency — the driver
      // replay of [[pairCounts]] (split on the double-space separator)
      val cnt = scala.collection.mutable.HashMap[(String, String), Long]()
      var w = 0
      while (w < states.length) {
        val t = states(w).trim.split("  ")
        var j = 0
        while (j + 1 < t.length) {
          val k = (t(j), t(j + 1))
          cnt(k) = cnt.getOrElse(k, 0L) + freqs(w)
          j += 1
        }
        w += 1
      }
      require(cnt.nonEmpty,
        s"BPE vocabulary saturated after ${i - 1} merges; lower nMerges")
      // argmax with Spark's exact tie-break: count DESC, then l, r in
      // UTF8String BINARY order (unsigned UTF-8 bytes — identical to
      // Java ordering on the ASCII symbols the word pattern admits, but
      // matched exactly rather than assumed)
      var best: ((String, String), Long) = null
      cnt.foreach { e =>
        if (best == null || e._2 > best._2 ||
          (e._2 == best._2 && (utf8Lt(e._1._1, best._1._1) ||
            (e._1._1 == best._1._1 && utf8Lt(e._1._2, best._1._2)))))
          best = e
      }
      val ((l, r), c) = best
      merges += Merge(i, l, r, c)
      val search = s" $l  $r "
      val repl = s" $l$r "
      w = 0
      while (w < states.length) {
        // leftmost non-overlapping literal replace — identical semantics
        // in Java, Spark and DuckDB (the object doc's separator argument)
        states(w) = states(w).replace(search, repl)
        w += 1
      }
      i += 1
    }
    val out = words.indices
      .map(w => (words(w), freqs(w), states(w)))
      .toDF("word", "freq", "state")
    (merges.result(), out.localCheckpoint())
  }

  private[graft] def trainDistributed(
      wf: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
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

  /** Unsigned-UTF-8-byte lexicographic `<` — UTF8String's binary order. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

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
  // Per-row ENCODE kernel — the trainer-feed step at production merge
  // count. `tokenizeCounts` replays the merge list as nMerges chained
  // `replace` expressions over the distinct-word table: exactly right for
  // the 24-merge DuckDB oracle window, but at 8,192 merges that is 8,192
  // chained column stages (1k+ checkpointed plan segments). The kernel
  // below applies the WHOLE table to one word in O(applies · |word|) —
  // rank-map lookups instead of plan stages — so corpus tokenization at
  // production merge count is one narrow map pass.
  // ---------------------------------------------------------------------

  /** Greedy BPE encode of ONE word — provably the same semantics as
    * [[applyMerges]]'s sequential replay (BpeSpec gates token-for-token
    * equality on the oracle-anchored 24-merge path and on adversarial
    * random corpora):
    *
    *  - a rank CURSOR walks the merge list: each step finds the
    *    minimum-rank pair PRESENT with rank > cursor, applies one full
    *    leftmost non-overlapping pass (identical to the literal-replace
    *    semantics), and advances the cursor. This is sequential replay
    *    with the absent ranks skipped — NOT the HF-style global
    *    min-rank-first loop, which can diverge when the same token
    *    string is reachable by two merge paths (applying a later rank
    *    can create an occurrence of an EARLIER-rank pair, which a
    *    sequential replay would never revisit);
    *  - cost is O(applied merges · |word|) with O(|word|) rank-map
    *    lookups per step — independent of the merge-table size, which
    *    is the whole point at 8,192+ merges. */
  def encodeWord(
      word: String, rank: java.util.HashMap[String, Integer]): Array[String] = {
    var toks = new Array[String](word.length + 1)
    var i = 0
    while (i < word.length) { toks(i) = String.valueOf(word.charAt(i)); i += 1 }
    toks(word.length) = "</w>"
    var cursor = 0
    var done = false
    while (!done && toks.length > 1) {
      // min present rank > cursor
      var best = Int.MaxValue
      var j = 0
      while (j + 1 < toks.length) {
        val r = rank.get(toks(j) + " " + toks(j + 1))
        if (r != null && r > cursor && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // one leftmost non-overlapping pass of the rank-`best` merge
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var k = 0
        while (k < toks.length) {
          if (k + 1 < toks.length && {
            val r = rank.get(toks(k) + " " + toks(k + 1))
            r != null && r.intValue() == best
          }) {
            out += toks(k) + toks(k + 1)
            k += 2
          } else {
            out += toks(k)
            k += 1
          }
        }
        toks = out.toArray
        cursor = best
      }
    }
    toks
  }

  /** Rank map for [[encodeWord]]: `"left right"` → rank (symbols never
    * contain spaces, so the space join is unambiguous). */
  def rankMap(merges: Seq[Merge]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.foreach(mg => m.put(mg.left + " " + mg.right, mg.rank))
    m
  }

  /** Per-JVM word → token-string cache, keyed by merge-table identity:
    * real corpora repeat words heavily (Zipf), so the kernel pays the
    * encode loop once per DISTINCT word per executor — the same economy
    * `tokenizeCounts` gets from its distinct-word table, without the
    * per-merge plan stages. Bounded (entries are dropped, not evicted,
    * past the cap) so a pathological open vocabulary cannot grow it
    * without bound. */
  private object EncodeCache {
    private val MaxEntries = 1 << 20
    private val MaxTables = 4
    private val maps = new java.util.concurrent.ConcurrentHashMap[
      Long, java.util.concurrent.ConcurrentHashMap[String, String]]()
    def get(tableId: Long): java.util.concurrent.ConcurrentHashMap[String, String] = {
      // MaxEntries caps ONE table's cache; this caps the map of tables —
      // a long-lived executor retraining daily would otherwise pin every
      // historical vocabulary forever. Evict ONE arbitrary table rather
      // than clearing wholesale: with > MaxTables tables active
      // concurrently in a JVM, a full clear on every miss would thrash
      // every other table's warm entries (pure memo either way — the only
      // cost of losing entries is re-encoding distinct words).
      if (maps.size() >= MaxTables && !maps.containsKey(tableId)) {
        val it = maps.keys()
        if (it.hasMoreElements) maps.remove(it.nextElement())
      }
      maps.computeIfAbsent(tableId,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
    }
    def put(cache: java.util.concurrent.ConcurrentHashMap[String, String],
        word: String, enc: String): Unit =
      if (cache.size() < MaxEntries) cache.put(word, enc)
  }

  /** Per-doc tokenization by the per-row kernel: (doc_id, n_words,
    * n_bpe_tokens, tok_md5) where `tok_md5` digests the doc's full token
    * SEQUENCE (tokens space-joined in word order) — the determinism
    * observable the scale gates pin. One narrow map pass, no shuffle, no
    * join: the production trainer-feed shape at 8,192+ merges (the
    * replay-based [[tokenizeCounts]] stays as the 24-merge cross-engine
    * oracle anchor). The merge table ships once per executor via
    * broadcast; `tableId` keys the per-JVM distinct-word cache. */
  def tokenizeKernel(
      docs: DataFrame, merges: Seq[Merge],
      docId: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sc = docs.sparkSession.sparkContext
    val bcMerges = sc.broadcast(merges.toArray)
    // collision-proof cache key (a JVM mixing two merge tables through a
    // colliding weak hash would cross-tokenize): 64 md5 bits of the table
    val tableId = java.lang.Long.parseUnsignedLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        merges.map(m => s"${m.rank}|${m.left}|${m.right}").mkString("\n"))
        .substring(0, 16), 16)
    val wordRe = java.util.regex.Pattern.compile(WordPattern)
    val encodeUdf = udf { (text: String) =>
      val rank = KernelRanks.get(tableId, bcMerges.value)
      val cache = EncodeCache.get(tableId)
      val m = wordRe.matcher(
        if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT))
      var nWords = 0L
      var nToks = 0L
      val sb = new java.lang.StringBuilder()
      while (m.find()) {
        val w = m.group()
        var enc = cache.get(w)
        if (enc == null) {
          enc = encodeWord(w, rank).mkString(" ")
          EncodeCache.put(cache, w, enc)
        }
        nWords += 1
        var sp = 1L // token count = spaces + 1
        var i = 0
        while (i < enc.length) { if (enc.charAt(i) == ' ') sp += 1; i += 1 }
        nToks += sp
        if (sb.length() > 0) sb.append(' ')
        sb.append(enc)
      }
      (nWords, nToks, org.apache.commons.codec.digest.DigestUtils
        .md5Hex(sb.toString))
    }
    docs.select(col(docId), encodeUdf(col(textCol)).as("r"))
      .select(col(docId), col("r._1").as("n_words"),
        col("r._2").as("n_bpe_tokens"), col("r._3").as("tok_md5"))
  }

  /** Per-JVM rank-map cache (built once per executor per merge table). */
  private object KernelRanks {
    private val MaxTables = 4
    private val maps = new java.util.concurrent.ConcurrentHashMap[
      Long, java.util.HashMap[String, Integer]]()
    def get(tableId: Long, merges: Array[Merge])
        : java.util.HashMap[String, Integer] = {
      // same table-count bound as EncodeCache (retrain-loop leak guard)
      if (maps.size() >= MaxTables && !maps.containsKey(tableId)) maps.clear()
      maps.computeIfAbsent(tableId, _ => rankMap(merges.toSeq))
    }
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
