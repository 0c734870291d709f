package graft.catalog

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.{Bounded, Tables}

/** Data-profiling operators — the ANALYZE-style statistics pass a pipeline
  * runs over a freshly landed table before planning anything else. Shapes
  * are pure hash-aggregations (partial map-side, one shuffle of per-group
  * scalars); no ordering-sensitive float accumulation is emitted: sums are
  * over integers, extremes (min/max) are exact single values, quantiles are
  * the deterministic linear-interpolation kind over integer inputs.
  */
object ProfileQueries {

  /** Per-source token-count distribution: exact p50/p90/p99 (linear
    * interpolation — Spark `percentile` and DuckDB `quantile_cont` both
    * implement the type-7 estimator; inputs are integers so the
    * interpolation arithmetic is the same IEEE op tree on both engines),
    * plus min/max/count. The exact-percentile aggregate buffers each
    * group's values — right for per-group distribution profiling where
    * groups are bounded; corpus-wide single-group quantiles at 100 TB
    * would switch to approx_percentile. */
  val tokenQuantiles = Q(
    "profile_token_quantiles",
    (s, dir) => {
      val dl = Tables.documents(s, dir).select(col("source"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_tok"))
      dl.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        min("n_tok").as("min_tok"),
        max("n_tok").as("max_tok"),
        round(expr("percentile(n_tok, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_tok, 0.9)"), 4).as("p90"),
        round(expr("percentile(n_tok, 0.99)"), 4).as("p99"))
        .orderBy("source")
    },
    Some("""
      WITH dl AS (SELECT source,
                         len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
                           AS n_tok
                  FROM documents)
      SELECT source, count(*)::BIGINT AS n_docs,
             min(n_tok) AS min_tok, max(n_tok) AS max_tok,
             round(quantile_cont(n_tok, 0.5), 4) AS p50,
             round(quantile_cont(n_tok, 0.9), 4) AS p90,
             round(quantile_cont(n_tok, 0.99), 4) AS p99
      FROM dl GROUP BY source ORDER BY source"""))

  /** Column-level profile of `lineitem`: null counts, distinct counts and
    * exact extremes for a representative column set — one aggregation over
    * the scan (count_distinct rewrites to expand + two-phase agg; at 100 TB
    * swap HLL in via approx_count_distinct, same plan shape, see
    * q_sketch_distinct for the gated sketch). Only exact single values
    * (min/max) and integer counts cross the shuffle — nothing
    * accumulation-ordered. */
  val profileLineitem = Q(
    "profile_lineitem",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("l_orderkey")).as("n_orders"),
        count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_suppkey")).as("n_supps"),
        sum(when(col("l_tax").isNull, 1L).otherwise(0L)).as("null_tax"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        min("l_shipdate").cast("date").cast("string").as("min_shipdate"),
        max("l_shipdate").cast("date").cast("string").as("max_shipdate"),
        count_distinct(col("l_returnflag")).as("n_flags"))
    },
    Some("""
      SELECT count(*)::BIGINT AS n_rows,
             count(DISTINCT l_orderkey)::BIGINT AS n_orders,
             count(DISTINCT l_partkey)::BIGINT AS n_parts,
             count(DISTINCT l_suppkey)::BIGINT AS n_supps,
             sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS null_tax,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             min(l_extendedprice) AS min_price,
             max(l_extendedprice) AS max_price,
             min(l_shipdate)::DATE::VARCHAR AS min_shipdate,
             max(l_shipdate)::DATE::VARCHAR AS max_shipdate,
             count(DISTINCT l_returnflag)::BIGINT AS n_flags
      FROM lineitem"""))

  /** Vocabulary heavy hitters via the mergeable Misra-Gries sketch
    * ([[graft.ops.Sketches.MisraGries]]), gated with the same falsifiable
    * pattern as `q_sketch_distinct`: the OUTPUT is the exact heavy-hitter
    * set (every token above 1/64 of the stream — deterministic, DuckDB-
    * reproducible), and `in_sketch` asserts the sketch's theoretical
    * guarantee (capacity 512 ⇒ undercount ≤ N/513 ≪ N/64, so a FALSE
    * anywhere is a sketch bug, not noise). Plan: the sketch aggregates
    * map-side — 512 counters per partition cross the shuffle, never the
    * token stream; the exact side exists only as the gate. */
  val heavyHitters = Q(
    "q_sketch_heavy_hitters",
    (s, dir) => {
      val tok = Tables.documents(s, dir).select(
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("token"))
      val skKeys = tok
        .agg(graft.ops.Sketches.heavyHitters(512, col("token")).as("sk"))
        .select(explode(map_keys(col("sk"))).as("token"))
        .withColumn("in_sketch", lit(true))
      // stream total derives from the (tiny) grouped counts — the corpus
      // is scanned twice (sketch + exact gate), not three times
      val exact = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      val total = exact.agg(sum("cnt").as("n"))
      exact
        .crossJoin(broadcast(total))
        .filter(col("cnt") * 64 > col("n"))
        .join(broadcast(skKeys), Seq("token"), "left")
        .select(col("token"), col("cnt"),
          coalesce(col("in_sketch"), lit(false)).as("in_sketch"))
        .orderBy("token")
    },
    Some("""
      WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                     AS token
                   FROM documents),
           tot AS (SELECT count(*) AS n FROM tok),
           c AS (SELECT token, count(*)::BIGINT AS cnt FROM tok GROUP BY token)
      SELECT token, cnt, TRUE AS in_sketch
      FROM c, tot WHERE cnt * 64 > n ORDER BY token"""))

  /** Quantile SKETCH gate — the third sketch family beside distinct-count
    * (`q_sketch_distinct`) and heavy hitters (`q_sketch_heavy_hitters`).
    * `approx_percentile` (Spark's mergeable QuantileSummaries / GK sketch)
    * promises a RANK guarantee, not a value guarantee, so the gate brackets
    * the returned value's rank with tie-safe integer counts:
    * count(x < ap) <= 55% of n AND count(x <= ap) >= 45% of n for p=0.5
    * (resp. 85/95 for p=0.9). The oracle emits exact quantiles and TRUE
    * flags — a FALSE is a sketch-contract violation, not noise. */
  val sketchQuantiles = Q(
    "q_sketch_quantiles",
    (s, dir) => {
      val dl = Tables.documents(s, dir).select(col("source"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_tok"))
      val appx = dl.groupBy("source").agg(
        count(lit(1)).as("n"),
        round(expr("percentile(n_tok, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_tok, 0.9)"), 4).as("p90"),
        expr("approx_percentile(n_tok, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(n_tok, 0.9, 10000)").as("ap90"))
      dl.join(broadcast(appx), "source")
        .groupBy("source")
        .agg(
          first("n").as("n"), first("p50").as("p50"), first("p90").as("p90"),
          sum(when(col("n_tok") < col("ap50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("n_tok") <= col("ap50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("n_tok") < col("ap90"), 1L).otherwise(0L)).as("lt90"),
          sum(when(col("n_tok") <= col("ap90"), 1L).otherwise(0L)).as("le90"))
        .select(col("source"), col("p50"), col("p90"),
          (col("lt50") * 20 <= col("n") * 11 &&
            col("le50") * 20 >= col("n") * 9).as("rank50_ok"),
          (col("lt90") * 20 <= col("n") * 19 &&
            col("le90") * 20 >= col("n") * 17).as("rank90_ok"))
        .orderBy("source")
    },
    Some("""
      WITH dl AS (SELECT source,
                         len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
                           AS n_tok
                  FROM documents)
      SELECT source,
             round(quantile_cont(n_tok, 0.5), 4) AS p50,
             round(quantile_cont(n_tok, 0.9), 4) AS p90,
             TRUE AS rank50_ok, TRUE AS rank90_ok
      FROM dl GROUP BY source ORDER BY source"""))

  /** VOCABULARY GROWTH (Heaps' law) profile — the corpus diagnostic
    * behind tokenizer-vocabulary and dedup-policy sizing: how many NEW
    * word types each ingestion decile contributes, and the cumulative
    * type count, next to per-decile doc/occurrence volume. A flattening
    * curve means the vocabulary is saturating (more data re-uses known
    * words); a linear one means open vocabulary (names, ids, noise).
    *
    * Decile = (doc_id·10) div (max_id + 1) — doc_id is the ingestion
    * order, so the curve is the prefix-growth curve, and the bucket is a
    * PURE MAP against one broadcast scalar (no ranking window anywhere).
    * Each type's contribution decile is its MINIMUM decile — one
    * type-keyed aggregate over the exploded tokens (gram-sized shuffle,
    * the span-dedup bound); the cumulative sum runs over the 10-row
    * decile table. All counts exact integers. */
  val vocabGrowth = Q(
    "profile_vocab_growth",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val toks = docs.select(
        expr(s"(doc_id * 10) div ${maxId + 1}L").as("decile"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("tok"))
      val perDecile = docs
        .groupBy(expr(s"(doc_id * 10) div ${maxId + 1}L").as("decile"))
        .agg(count(lit(1)).as("n_docs"))
      val occ = toks.groupBy("decile").agg(count(lit(1)).as("n_occurrences"))
      val newTypes = toks.groupBy("tok").agg(min("decile").as("decile"))
        .groupBy("decile").agg(count(lit(1)).as("new_types"))
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Bounded.frame(
        perDecile.join(occ, Seq("decile"), "left")
          .join(newTypes, Seq("decile"), "left")
          .select(col("decile"), col("n_docs"),
            coalesce(col("n_occurrences"), lit(0L)).as("n_occurrences"),
            coalesce(col("new_types"), lit(0L)).as("new_types")),
        16, "profile_vocab_growth decile grid")
        .withColumn("types_cum", sum("new_types").over(w))
        .orderBy("decile")
    },
    Some("""
      WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
      t AS (SELECT (doc_id * 10) // (SELECT m FROM mx) AS decile,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
            FROM documents),
      pd AS (SELECT (doc_id * 10) // (SELECT m FROM mx) AS decile,
                    count(*)::BIGINT AS n_docs
             FROM documents GROUP BY 1),
      occ AS (SELECT decile, count(*)::BIGINT AS n_occurrences
              FROM t GROUP BY decile),
      nt AS (SELECT decile, count(*)::BIGINT AS new_types FROM (
               SELECT tok, min(decile) AS decile FROM t GROUP BY tok)
             GROUP BY decile)
      SELECT pd.decile, pd.n_docs,
             coalesce(occ.n_occurrences, 0)::BIGINT AS n_occurrences,
             coalesce(nt.new_types, 0)::BIGINT AS new_types,
             sum(coalesce(nt.new_types, 0)) OVER (ORDER BY pd.decile
               ROWS UNBOUNDED PRECEDING)::BIGINT AS types_cum
      FROM pd LEFT JOIN occ USING (decile) LEFT JOIN nt USING (decile)
      ORDER BY pd.decile"""))

  /** COUNT-MIN sketch gate — the frequency-ESTIMATION member of the
    * sketch family (distinct = HLL `q_sketch_distinct`, set algebra =
    * theta, heavy set = Misra-Gries, ranks = GK quantiles): a depth×width
    * grid of bucket counts answering "how often does token t occur",
    * over-estimating by at most the collision mass and NEVER under
    * (Cormode & Muthukrishnan 2005). The sketch is LINEAR — cells add —
    * so shards/days merge by element-wise sum, and the build exploits
    * that linearity: the token stream aggregates ONCE (vocab-sized,
    * map-side partial — the only corpus shuffle), then each DISTINCT
    * token's count lands in its depth=4 cells, so the 4× hash explosion
    * runs over the vocabulary, never the corpus. Row hashes are
    * md5-derived (15-hex-char 60-bit fold mod width=1024 — the affine-
    * MinHash parity idiom), so the oracle replays the ENTIRE sketch:
    * estimates are hash-checked VALUES, and `one_sided_ok` asserts the
    * CM guarantee est >= exact on both sides (a FALSE anywhere is a
    * sketch bug, not noise). Output: every >1/64-of-stream token (the
    * heavy-hitter threshold, keeping the family consistent) with exact
    * count, estimate, and the guarantee flag. */
  val countMin = Q(
    "q_sketch_countmin",
    (s, dir) => {
      val depth = 4
      val width = 1024
      val tok = Tables.documents(s, dir).select(
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("token"))
      // vocab-sized frame feeds FOUR consumers (hashes, cells, total,
      // heavy) — materialize it so the corpus token agg runs once, not
      // once per consumer (same localCheckpoint-not-cache rationale as
      // doc_pipeline_curate)
      val exact = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val hashed = graft.ops.Sketches.countMinHashed(exact, depth, width)
      val cells = graft.ops.Sketches.countMinCells(hashed)
      val total = exact.agg(sum("cnt").as("n"))
      val heavy = exact.crossJoin(broadcast(total))
        .filter(col("cnt") * 64 > col("n"))
        .select("token", "cnt")
      hashed.select("token", "j", "bucket")
        .join(broadcast(heavy), "token")
        .join(broadcast(cells), Seq("j", "bucket"))
        .groupBy("token", "cnt")
        .agg(min("cell").as("est"))
        .select(col("token"), col("cnt"), col("est"),
          (col("est") >= col("cnt")).as("one_sided_ok"))
        .orderBy("token")
    },
    Some("""
      WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                     AS token
                   FROM documents),
      c AS (SELECT token, count(*)::BIGINT AS cnt FROM tok GROUP BY token),
      tot AS (SELECT sum(cnt) AS n FROM c),
      h AS (SELECT token, cnt, j.j AS j,
              CAST(sum((strpos('0123456789abcdef',
                               substr(md5(j.j::VARCHAR || ':' || token), k.k, 1)) - 1)
                       * (1::BIGINT << (4 * (15 - k.k)))) % 1024 AS BIGINT)
                AS bucket
            FROM c, generate_series(0, 3) j(j), generate_series(1, 15) k(k)
            GROUP BY token, cnt, j.j),
      cells AS (SELECT j, bucket, sum(cnt)::BIGINT AS cell
                FROM h GROUP BY j, bucket),
      heavy AS (SELECT token, cnt FROM c, tot WHERE cnt * 64 > n),
      est AS (SELECT hv.token, hv.cnt, min(cl.cell) AS est
              FROM heavy hv
              JOIN h ON h.token = hv.token
              JOIN cells cl ON cl.j = h.j AND cl.bucket = h.bucket
              GROUP BY hv.token, hv.cnt)
      SELECT token, cnt, est, (est >= cnt) AS one_sided_ok
      FROM est ORDER BY token"""))

  /** DATA-QUALITY EXPECTATIONS gate — the assertion pass a pipeline runs
    * against every freshly landed table before anything downstream reads
    * it (the Great-Expectations / dbt-test shape, engine-native): one
    * corpus aggregation evaluates every check's violation count, and the
    * verdict is pure integer arithmetic so the WHOLE gate — counts and
    * pass/fail booleans — sits inside the hash gate. Hard checks pass at
    * zero violations; the one soft check (empty text) passes at ≤ 1% via
    * cross-multiplication (100·bad ≤ n — no float rate). Two corpus
    * reads total (the conditional-sum pass + the exact distinct-id
    * count), both map-side partial aggregations; the check table itself
    * is a 7-row literal expansion, nothing per-row leaves the agg. */
  val expectations = Q(
    "profile_expectations",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val a = d.agg(
        count(lit(1)).as("n"),
        sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("id_null"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("text_null"),
        sum(when(col("text").isNotNull &&
          length(trim(col("text"))) === 0, 1L).otherwise(0L)).as("text_empty"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("lang_null"),
        sum(when(col("source").isNull, 1L).otherwise(0L)).as("src_null"),
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
          .as("chars_bad"),
        count_distinct(col("doc_id")).as("id_distinct"))
      a.select(col("n"), explode(array(
        struct(lit("doc_id_not_null").as("check"),
          col("id_null").as("n_bad"), lit(true).as("hard")),
        struct(lit("doc_id_unique").as("check"),
          (col("n") - col("id_distinct")).as("n_bad"), lit(true).as("hard")),
        struct(lit("lang_not_null").as("check"),
          col("lang_null").as("n_bad"), lit(true).as("hard")),
        struct(lit("n_chars_consistent").as("check"),
          col("chars_bad").as("n_bad"), lit(true).as("hard")),
        struct(lit("source_not_null").as("check"),
          col("src_null").as("n_bad"), lit(true).as("hard")),
        struct(lit("text_nonempty_99pct").as("check"),
          col("text_empty").as("n_bad"), lit(false).as("hard")),
        struct(lit("text_not_null").as("check"),
          col("text_null").as("n_bad"), lit(true).as("hard")))).as("c"))
        .select(col("c.check").as("check"), col("n").as("n_rows"),
          col("c.n_bad").as("n_bad"),
          when(col("c.hard"), col("c.n_bad") === 0)
            .otherwise(col("c.n_bad") * 100 <= col("n")).as("pass"))
        .orderBy("check")
    },
    Some("""
      WITH a AS (SELECT
          count(*)::BIGINT AS n,
          sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS id_null,
          sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS text_null,
          sum(CASE WHEN text IS NOT NULL AND length(trim(text)) = 0
                   THEN 1 ELSE 0 END)::BIGINT AS text_empty,
          sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS lang_null,
          sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT AS src_null,
          sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END)::BIGINT
            AS chars_bad,
          count(DISTINCT doc_id)::BIGINT AS id_distinct
        FROM documents),
      c AS (
        SELECT 'doc_id_not_null' AS check, id_null AS n_bad, TRUE AS hard FROM a
        UNION ALL SELECT 'doc_id_unique', n - id_distinct, TRUE FROM a
        UNION ALL SELECT 'lang_not_null', lang_null, TRUE FROM a
        UNION ALL SELECT 'n_chars_consistent', chars_bad, TRUE FROM a
        UNION ALL SELECT 'source_not_null', src_null, TRUE FROM a
        UNION ALL SELECT 'text_nonempty_99pct', text_empty, FALSE FROM a
        UNION ALL SELECT 'text_not_null', text_null, TRUE FROM a)
      SELECT c.check, a.n AS n_rows, c.n_bad,
             CASE WHEN c.hard THEN c.n_bad = 0
                  ELSE c.n_bad * 100 <= a.n END AS pass
      FROM c, a ORDER BY c.check"""))

  def qs: Seq[Q] =
    Seq(tokenQuantiles, profileLineitem, heavyHitters, sketchQuantiles,
      vocabGrowth, countMin, expectations)
}
