package graft.catalog

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.Tables

/** Corpus-curation operators a large-scale training-data pipeline runs
  * beyond dedup and lang-ID: repetition-based quality filters (the Gopher
  * rules), benchmark decontamination, PII scrubbing, deterministic quota
  * sampling, and sequence packing. Every entry is integer-exact (counts,
  * integer-quantized ratios, md5 digests) so the DuckDB hash gate cannot
  * flake on float accumulation, and every shape is the one that survives
  * 100 TB: explode → hash-aggregate (partial map-side), broadcast joins
  * against tiny derived sets, and windows only where partitioned by a
  * grouping key or over provably bounded inputs.
  */
object CurationQueries {

  /** Gopher-style repetition stats per document: duplicate-2-gram fraction,
    * top-2-gram fraction, top-word fraction — the "document is k lines of
    * the same boilerplate" signals. Ratios are integer-quantized at 1e-4 by
    * `div`, never floats. Two explode→agg branches (words, 2-grams) joined
    * on doc_id; both aggregations partial-aggregate map-side, and the join
    * keys are the same doc_id partitioning so AQE plans a single exchange. */
  val repetition = Q(
    "text_repetition_stats",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val w = split(lower(col("text")), " ")
      val grams2 = transform(sequence(lit(1), size(w) - 1),
        i => concat(element_at(w, i), lit(" "), element_at(w, i + 1)))
      val g2 = docs.select(col("doc_id"), explode(grams2).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum("c").as("n2"), count(lit(1)).as("d2"), max("c").as("m2"))
      val g1 = docs.select(col("doc_id"), explode(w).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(sum("c").as("n1"), max("c").as("m1"))
      g2.join(g1, "doc_id")
        .select(col("doc_id"), col("n2"),
          expr("(n2 - d2) * 10000 div n2").as("dup2_frac_1e4"),
          expr("m2 * 10000 div n2").as("top2_frac_1e4"),
          expr("m1 * 10000 div n1").as("top1_frac_1e4"))
        .orderBy("doc_id")
    },
    Some("""
      WITH g2 AS (SELECT doc_id, sum(c)::BIGINT AS n2, count(*)::BIGINT AS d2,
                         max(c)::BIGINT AS m2
                  FROM (SELECT doc_id, g, count(*) AS c
                        FROM (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
                              FROM (SELECT doc_id,
                                           string_split(lower(text), ' ') AS w
                                    FROM documents),
                                   unnest(range(1, len(w))) t(i))
                        GROUP BY doc_id, g)
                  GROUP BY doc_id),
      g1 AS (SELECT doc_id, sum(c)::BIGINT AS n1, max(c)::BIGINT AS m1
             FROM (SELECT doc_id, t, count(*) AS c
                   FROM (SELECT doc_id,
                                unnest(string_split(lower(text), ' ')) AS t
                         FROM documents)
                   GROUP BY doc_id, t)
             GROUP BY doc_id)
      SELECT g2.doc_id, g2.n2,
             (g2.n2 - g2.d2) * 10000 // g2.n2 AS dup2_frac_1e4,
             g2.m2 * 10000 // g2.n2 AS top2_frac_1e4,
             g1.m1 * 10000 // g1.n1 AS top1_frac_1e4
      FROM g2 JOIN g1 USING (doc_id) ORDER BY doc_id"""))

  /** Benchmark decontamination: flag every corpus document sharing a word
    * 5-gram with the "benchmark" subset (doc_id ≡ 0 mod 97 — a stand-in for
    * an eval set). The benchmark gram set is tiny and broadcast; the corpus
    * side is one explode → broadcast-hash-join → count-distinct — at 100 TB
    * the corpus grams stream through map tasks and only matches shuffle
    * (GPT-3-style 13-gram decontamination, scaled to the fixture's short
    * docs). */
  val decontaminate = Q(
    "text_decontaminate",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val w = split(lower(col("text")), " ")
      val grams5 = transform(sequence(lit(1), size(w) - 4),
        i => array_join(slice(w, i, lit(5)), " "))
      val g5 = docs.filter(size(w) >= 5)
        .select(col("doc_id"), explode(grams5).as("g"))
      val bench = g5.filter(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
      g5.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy("doc_id").agg(count_distinct(col("g")).as("n_shared"))
        .orderBy("doc_id")
    },
    Some("""
      WITH g5 AS (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g
                  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                        FROM documents WHERE len(string_split(lower(text), ' ')) >= 5),
                       unnest(range(1, len(w) - 3)) t(i)),
      bench AS (SELECT DISTINCT g FROM g5 WHERE doc_id % 97 = 0)
      SELECT doc_id, count(DISTINCT g)::BIGINT AS n_shared
      FROM g5 JOIN bench USING (g)
      WHERE doc_id % 97 <> 0
      GROUP BY doc_id ORDER BY doc_id"""))

  /** PII scrubbing: plant deterministic emails/phones into the crawl text,
    * then count and redact them by regex. Pure map-side work (no shuffle at
    * all before the final order), with the redacted text gated through its
    * md5 digest. The regexes stay in the dialect intersection of Java and
    * RE2 (character classes + bounded quantifiers only). */
  val piiScrub = Q(
    "text_pii_scrub",
    (s, dir) => {
      val planted = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 3,
          concat(lit(" call 555-"),
            (lit(1000) + col("doc_id") % 9000).cast("string")))
          .otherwise(lit("")))
      val emailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
      val phoneRe = "555-[0-9]{4}"
      Tables.documents(s, dir)
        .select(col("doc_id"), planted.as("crawl"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("crawl"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("crawl"), lit(phoneRe), lit(0)))
            .cast("long").as("n_phones"),
          md5(regexp_replace(regexp_replace(col("crawl"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").cast("binary")).as("redacted_md5"))
        .orderBy("doc_id")
    },
    Some("""
      WITH crawl AS (SELECT doc_id,
                            text
                            || CASE WHEN doc_id % 7 = 0
                                    THEN ' contact user' || doc_id || '@example.com now'
                                    ELSE '' END
                            || CASE WHEN doc_id % 11 = 3
                                    THEN ' call 555-' || (1000 + doc_id % 9000)
                                    ELSE '' END AS crawl
                     FROM documents)
      SELECT doc_id,
             len(regexp_extract_all(crawl, '[a-z0-9]+@[a-z0-9]+\.[a-z]+'))::BIGINT
               AS n_emails,
             len(regexp_extract_all(crawl, '555-[0-9]{4}'))::BIGINT AS n_phones,
             md5(regexp_replace(regexp_replace(crawl,
                   '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
                 '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
      FROM crawl ORDER BY doc_id"""))

  /** Deterministic quota sampling: at most 30 docs per source, chosen by
    * md5 order — the reproducible stratified downsample of a per-domain
    * cap pass. The window partitions by source (the grouping key), so at
    * scale each domain ranks independently; a skewed mega-domain is the
    * one case to pre-salt, exactly as README's skew levers describe. */
  val quotaSample = Q(
    "sample_quota_per_source",
    (s, dir) => {
      val w = Window.partitionBy("source")
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          md5(concat(lit("q"), col("doc_id").cast("string"))).as("h"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 30)
        .select(col("doc_id"), col("source"), col("rk"))
        .orderBy("source", "rk")
    },
    Some("""
      SELECT doc_id, source, rk
      FROM (SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY md5('q' || doc_id), doc_id)::BIGINT
                     AS rk
            FROM documents)
      WHERE rk <= 30 ORDER BY source, rk"""))

  /** Sequence packing: the concat-and-chunk pass that turns curated docs
    * into fixed-budget training sequences (2048 "tokens" here). Docs are
    * packed in doc_id order within each source; a doc starts the sequence
    * its running-token offset falls into. One partitioned window (running
    * sum) + one aggregation — both keyed on source, so the plan reuses a
    * single hash partitioning and no global ordering exists anywhere. */
  val packSequences = Q(
    "pack_sequences",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val dl = docs.select(col("doc_id"), col("source"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_tok"))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dl.withColumn("cum", sum("n_tok").over(w))
        .withColumn("seq_id", expr("(cum - n_tok) div 2048"))
        .groupBy("source", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"))
        .orderBy("source", "seq_id")
    },
    Some("""
      WITH dl AS (SELECT doc_id, source,
                         len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
                           AS n_tok
                  FROM documents),
      packed AS (SELECT source, n_tok,
                        (sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING)
                         - n_tok) // 2048 AS seq_id
                 FROM dl)
      SELECT source, seq_id, count(*)::BIGINT AS n_docs,
             sum(n_tok)::BIGINT AS sum_tokens
      FROM packed GROUP BY source, seq_id ORDER BY source, seq_id"""))

  def qs: Seq[Q] =
    Seq(repetition, decontaminate, piiScrub, quotaSample, packSequences)
}
