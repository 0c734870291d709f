package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.sources.{TextSources, Warc}

/** Format round-trip gates (`sources/TextSources.scala`): the documents
  * corpus is written to JSONL / CSV once per JVM, read back through the
  * schema-declared reader, and a per-source content-fidelity aggregate
  * (row counts, char totals, and text md5 extremes/distincts) must
  * hash-match DuckDB computing the SAME aggregate over the ORIGINAL
  * parquet — any row lost or field mangled in either direction of the
  * format conversion flips the gate. */
object SourceQueries {

  private def fidelity(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("text"),
        md5(col("text").cast("binary")).as("text_md5"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(length(col("text"))).as("sum_chars"),
        count_distinct(col("text_md5")).as("n_md5"),
        min("text_md5").as("min_md5"), max("text_md5").as("max_md5"))
      .orderBy("source")

  private val fidelityOracle = """
      SELECT source, count(*)::BIGINT AS n,
             sum(length(text))::BIGINT AS sum_chars,
             count(DISTINCT md5(text))::BIGINT AS n_md5,
             min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
      FROM documents GROUP BY source ORDER BY source"""

  val jsonlRoundtrip = Q(
    "q_source_jsonl",
    (s: SparkSession, dir: String) =>
      fidelity(TextSources.readJsonl(s, TextSources.jsonlFixture(s, dir))),
    Some(fidelityOracle))

  val csvRoundtrip = Q(
    "q_source_csv",
    (s: SparkSession, dir: String) =>
      fidelity(TextSources.readCsv(s, TextSources.csvFixture(s, dir))),
    Some(fidelityOracle))

  /** ORC is Spark-native (predicate pushdown, column pruning, the same
    * vectorized reader contract as parquet) — the columnar alternative a
    * lakehouse migration meets. Same fidelity gate. */
  val orcRoundtrip = Q(
    "q_source_orc",
    (s: SparkSession, dir: String) =>
      fidelity(TextSources.readOrc(s, TextSources.orcFixture(s, dir))),
    Some(fidelityOracle))

  /** Record-framed crawl-archive ingest ([[graft.sources.Warc]]) — the
    * "raw archive bytes → page rows" stage upstream of the whole crawl
    * cascade. The fixture archive is GENERATIVE (url/date/payload all
    * deterministic functions of the documents table — see
    * [[graft.sources.Warc.warcFixture]]), so the DuckDB oracle
    * reconstructs every record field from the original parquet: the url
    * by concatenation, the fetch time from the doc_id-derived epoch, and
    * the payload by replaying [[graft.ops.Html.wrapDocument]]'s page
    * synthesis in SQL (chunking, entity escape, fixed chrome strings) —
    * any byte lost or reframed anywhere in write → concatenate → scan →
    * Content-Length parse → UTF-8 decode flips the md5. */
  private def warcFidelity(parsed: DataFrame): DataFrame =
    parsed
      .select(
        Warc.docIdFromUrl(col("url")).as("doc_id"),
        col("url"),
        unix_seconds(col("fetch_ts")).as("fetch_unix"),
        octet_length(col("html")).cast("long").as("n_bytes"),
        md5(col("html").cast("binary")).as("html_md5"))
      .orderBy("doc_id")

  val warcRoundtrip = Q(
    "q_source_warc",
    (s: SparkSession, dir: String) =>
      warcFidelity(Warc.readWarc(s, Warc.warcFixture(s, dir))),
    Some(s"""
      WITH w AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
                 FROM documents),
      b AS (SELECT doc_id, toks, ((len(toks) + 9) // 10)::BIGINT AS n_chunks
            FROM w),
      chunks AS (SELECT doc_id, j AS chunk_no,
                        array_to_string(toks[(j*10+1):(j*10+10)], ' ') AS chunk
                 FROM b, unnest(range(0, n_chunks)) t(j)),
      paras AS (SELECT doc_id,
                       string_agg('<p>' || replace(replace(replace(chunk,
                           '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
                         || '</p>', '' ORDER BY chunk_no) AS paras
                FROM chunks GROUP BY doc_id),
      page AS (SELECT w.doc_id,
                      '${graft.ops.Html.PageHead}' || coalesce(p.paras, '')
                        || '${graft.ops.Html.PageTail}' AS page
               FROM w LEFT JOIN paras p USING (doc_id))
      SELECT doc_id,
             'https://www.example.com/doc/' || doc_id AS url,
             (1000000 + doc_id)::BIGINT AS fetch_unix,
             strlen(page)::BIGINT AS n_bytes,
             md5(page) AS html_md5
      FROM page ORDER BY doc_id"""))

  /** REAL-LAYOUT archive ingest (`.warc.gz`, VERDICT r13 ask 5): the same
    * corpus in the Common Crawl shape — gzip-per-member compression, HTTP
    * response envelopes around every payload, interleaved `WARC-Type:
    * request` records ([[graft.sources.Warc.warcGzFixture]]). The parser
    * must decompress concatenated members, strip the HTTP headers, and
    * skip the non-response records EXACTLY, because the oracle is
    * `q_source_warc`'s generative SQL verbatim — any leaked header byte,
    * lost member, or resurrected request record flips a row's md5. */
  val warcGzRoundtrip = Q(
    "q_source_warc_gz",
    (s: SparkSession, dir: String) =>
      warcFidelity(Warc.readWarc(s, Warc.warcGzFixture(s, dir))),
    warcRoundtrip.oracle)

  def qs: Seq[Q] =
    Seq(jsonlRoundtrip, csvRoundtrip, orcRoundtrip, warcRoundtrip,
      warcGzRoundtrip)
}
