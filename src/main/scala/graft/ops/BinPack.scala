package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-fit-decreasing SEQUENCE PACKING — the padding-minimizing
  * alternative to `Curation.packSequences`' concat-and-chunk: documents
  * are bin-packed whole into fixed-capacity training sequences (no doc
  * ever spans a boundary), so the attention mask never needs cross-doc
  * separators and the padding waste is the FFD guarantee PER SALT GROUP
  * (≤ 11/9·OPT + 1 bins within each group — Johnson '73; globally the
  * salted scheme can leave up to one extra partial bin per group, i.e.
  * ≤ 11/9·OPT + g with g = ceil(n / groupTarget)) instead of the
  * arbitrary overflow of start-offset chunking. This is the packing used
  * by T5/LLaMA-style pipelines when sequence integrity matters.
  *
  * FFD is inherently sequential (each placement depends on every earlier
  * one), so the distributed form salts docs into bounded groups (md5 of
  * the doc id — deterministic, growth-stable, the `split_train_val`
  * idiom) and runs the exact greedy INSIDE each group: sort by
  * (n_tok DESC, doc_id), place each doc in the first bin that still fits,
  * open a new bin otherwise. Groups are independent, so the whole pass is
  * one shuffle on the group key and the per-group work is bounded by the
  * salt target — at 100 TB the group count scales with the corpus while
  * no task ever sees more than ~2× the target docs. Oversized docs
  * (n_tok > capacity) are excluded by contract: they belong to the
  * chunking path (`chunk_documents`), not the packer.
  *
  * Exactness: lengths are integers, the greedy is deterministic, and the
  * salt/order tiebreaks are total — the DuckDB oracle replays the
  * identical traversal as a RECURSIVE CTE that advances every group one
  * document per step, carrying the bin-load list ([[oracleSql]]), and the
  * hash gate pins every doc's bin assignment.
  */
object BinPack {

  /** Pack `docs(doc_id, n_tok)` into capacity-`capacity` bins by
    * salted-group FFD. Returns (grp, doc_id, n_tok, bin) with 1-based bin
    * indices per group; docs with n_tok > capacity are dropped (chunk
    * them first). `groupTarget` sets the expected docs per salt group. */
  def packFirstFitDecreasing(
      docs: DataFrame, capacity: Long,
      groupTarget: Long = 1024L): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val s = docs.sparkSession
    import s.implicits._
    // checkpointed: the group-count action below and the pack pass share
    // one materialization — without it the caller's upstream plan (e.g.
    // pack_sequences_ffd's per-doc regexp tokenization) executes twice
    val eligible = docs
      .select(col("doc_id").cast("long"), col("n_tok").cast("long"))
      .filter(col("n_tok") <= capacity)
      .localCheckpoint(true)
    val n = eligible.count()
    val g = math.max(1L, (n + groupTarget - 1L) / groupTarget)
    val grouped = eligible.withColumn("grp",
      conv(substring(md5(concat(lit("b"), col("doc_id").cast("string"))),
        1, 6), 16, 10).cast("long") % g)
    grouped.select("grp", "doc_id", "n_tok").as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (grp, it) =>
        val ds = it.map(t => (t._2, t._3)).toArray
        // FFD order: longest first, doc_id as the total tiebreak
        java.util.Arrays.sort(ds, Ordering.by[(Long, Long), (Long, Long)] {
          case (id, len) => (-len, id)
        })
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        ds.foreach { case (id, len) =>
          var i = 0
          while (i < loads.length && loads(i) + len > capacity) i += 1
          if (i == loads.length) loads += len else loads(i) += len
          out += ((grp, id, len, i + 1L))
        }
        out.iterator
      }
      .toDF("grp", "doc_id", "n_tok", "bin")
  }

  /** The recursive-CTE DuckDB replay of [[packFirstFitDecreasing]] over a
    * relation `ordd(grp, doc_id, n_tok, rn)` (rn = the per-group
    * (n_tok DESC, doc_id) rank — callers prepend its definition and must
    * open the chain with WITH RECURSIVE). Each recursion step advances
    * every group by one document, carrying that group's bin-load list;
    * `list_position` finds the first fitting bin exactly like the JVM
    * linear probe. */
  def oracleSql(capacity: Long): String = s"""
      steps AS (
        SELECT grp, 0::BIGINT AS rn, NULL::BIGINT AS doc_id,
               NULL::BIGINT AS n_tok, NULL::BIGINT AS bin,
               []::BIGINT[] AS loads
        FROM (SELECT DISTINCT grp FROM ordd)
        UNION ALL
        SELECT o.grp, o.rn, o.doc_id, o.n_tok,
               (CASE WHEN p.pos = 0 THEN len(s.loads) + 1
                     ELSE p.pos END)::BIGINT AS bin,
               CASE WHEN p.pos = 0 THEN list_append(s.loads, o.n_tok)
                    ELSE s.loads[1:p.pos - 1]
                         || [s.loads[p.pos] + o.n_tok]
                         || s.loads[p.pos + 1:]
               END AS loads
        FROM steps s
        JOIN ordd o ON o.grp = s.grp AND o.rn = s.rn + 1
        CROSS JOIN LATERAL (
          -- list_position returns 0/NULL when nothing fits; coalesce makes
          -- 0 the single "open a new bin" sentinel on every DuckDB version
          SELECT coalesce(list_position(
            list_transform(s.loads, x -> x + o.n_tok <= $capacity),
            true), 0) AS pos) p)"""
}
