package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.Tables
import graft.ops.{Bpe, Curation}

/** BPE tokenizer surface (builder brief: token counting beyond whitespace
  * words; Sennrich et al. 2016): distributed training over `documents`,
  * corpus tokenization, and sequence packing re-based on BPE counts. The
  * oracles replay the exact greedy loop as unrolled DuckDB CTEs
  * ([[Bpe.oracleStages]]), so a hash match proves every merge decision and
  * every downstream token count. */
object BpeQueries {

  /** Merge-list size. Sized so the unrolled oracle CTE chain stays cheap in
    * DuckDB at sf0.01 while still exercising multi-round merge chaining
    * (symbols of length 4+ form well before 24 merges on the fixture
    * corpus). A production vocab is thousands of merges — same loop, the
    * per-iteration cost is vocabulary-sized either way. */
  val NMerges = 24

  /** Per-JVM trained-merge cache, one train per sfDir (the LshCache
    * policy: index/model builds are one-time jobs, catalog entries measure
    * serving). Sound because training is deterministic — the total
    * (cnt DESC, l, r) tie-break makes the merge list a pure function of
    * the corpus. The cached value is plain driver-side data, so it is
    * session-independent. */
  object BpeCache {
    private val cache =
      scala.collection.concurrent.TrieMap[String, Seq[Bpe.Merge]]()
    def merges(s: SparkSession, dir: String): Seq[Bpe.Merge] =
      cache.getOrElseUpdate(dir,
        Bpe.train(Bpe.wordFreq(Tables.documents(s, dir)), NMerges)._1)
  }

  /** The learned merge list itself — rank, pair, merged symbol, count. */
  val train = Q(
    "text_bpe_train",
    (s, dir) => {
      import s.implicits._
      BpeCache.merges(s, dir)
        .map(m => (m.rank, m.left, m.right, m.left + m.right, m.cnt))
        .toDF("rank", "l", "r", "merged", "cnt")
        .orderBy("rank")
    },
    Some(Bpe.trainOracleSql(NMerges)))

  /** Per-doc BPE token counts next to the word counts they refine. */
  val tokenize = Q(
    "text_bpe_tokenize",
    (s, dir) =>
      Bpe.tokenizeCounts(Tables.documents(s, dir), BpeCache.merges(s, dir))
        .orderBy("doc_id"),
    Some(s"""
      WITH ${Bpe.tokenizeOracleCtes(NMerges)}
      SELECT doc_id, n_words, n_bpe_tokens FROM bpe_doc ORDER BY doc_id"""))

  /** `pack_sequences` re-based on BPE token counts — the budget a real
    * pipeline packs by is subword tokens, not whitespace words. Same
    * one-partitioning shape: packing window and rollup both key on
    * source. */
  val packBpe = Q(
    "pack_sequences_bpe",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val dl = docs.select(col("doc_id"), col("source"))
        .join(
          Bpe.tokenizeCounts(docs, BpeCache.merges(s, dir))
            .select(col("doc_id"), col("n_bpe_tokens").as("n_tok")),
          "doc_id")
      Curation.packSequences(dl, strata = "source", tokensCol = "n_tok",
        budget = 2048)
        .groupBy("source", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"))
        .orderBy("source", "seq_id")
    },
    Some(s"""
      WITH ${Bpe.tokenizeOracleCtes(NMerges)},
      dl AS (SELECT d.doc_id, d.source, b.n_bpe_tokens AS n_tok
             FROM documents d JOIN bpe_doc b USING (doc_id)),
      packed AS (SELECT source, n_tok,
                        ((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING)
                          - n_tok) // 2048)::BIGINT AS seq_id
                 FROM dl)
      SELECT source, seq_id, count(*)::BIGINT AS n_docs,
             sum(n_tok)::BIGINT AS sum_tokens
      FROM packed GROUP BY source, seq_id ORDER BY source, seq_id"""))

  def qs: Seq[Q] = Seq(train, tokenize, packBpe)
}
