package graft.catalog

import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.{Fixtures, Tables}
import graft.ops.{Html, HtmlFixtures}

/** HTML main-content extraction surface ([[graft.ops.Html]]) — the crawl
  * front-end upstream of `text_boilerplate_strip`. Two complementary
  * gates:
  *
  *  - `text_html_extract` is SF-COUPLED with a pure-SQL oracle and no
  *    frozen fixture: every document is wrapped in a deterministic page
  *    ([[Html.wrapDocument]] — chrome engineered so each chrome block is
  *    dropped by length or link density, paragraphs = the doc's 10-token
  *    chunks), and the DuckDB oracle replays the GENERATIVE contract
  *    (chunking + ≥ 25-char filter) rather than the parser — so the
  *    extraction pipeline (tag scan, script skip, entity decode,
  *    density/length verdicts) must land exactly on what the contract
  *    promises, cross-engine, at every SF.
  *  - `text_html_extract_soup` runs the parser over 24 adversarial
  *    tag-soup pages ([[HtmlFixtures]]) whose expected extraction is
  *    frozen by GenOracleFixtures and staleness-gated in
  *    FixtureOracleSpec — the multimodal frozen-fixture pattern, covering
  *    the pathologies no clean generative contract can express.
  */
object HtmlQueries {

  /** Shared result shape: (n_blocks, n_kept, n_chars, main_text) — also
    * used by GenOracleFixtures (fixture rows bit-identical to the catalog
    * entry by construction) and HtmlSpec. */
  def extractStats(html: String): (Int, Int, Int, String) = {
    val bs = Html.blocks(html)
    val kept = bs.filter(_.keep)
    val main = kept.map(_.text).mkString("\n")
    (bs.size, kept.size, main.length, main)
  }

  val extract = Q(
    "text_html_extract",
    (s, dir) => {
      val exUdf = udf((t: String) => extractStats(Html.wrapDocument(t)))
      Tables.documents(s, dir)
        .select(col("doc_id"), exUdf(col("text")).as("r"))
        .select(col("doc_id"),
          col("r._1").cast("long").as("n_blocks"),
          col("r._2").cast("long").as("n_kept"),
          col("r._3").cast("long").as("n_chars"),
          md5(col("r._4")).as("main_md5"))
        .orderBy("doc_id")
    },
    // The generative contract in SQL: chunks of 10 space-split tokens;
    // expected main text = the ≥25-char chunks newline-joined; block
    // count = 6 chrome blocks (title, nav, 3 aside <li>, footer) +
    // nonempty chunks. See Html.wrapDocument for the census.
    Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      b AS (SELECT doc_id, toks, ((len(toks) + 9) // 10)::BIGINT AS n_chunks
            FROM w),
      chunks AS (SELECT doc_id, j AS chunk_no,
                        array_to_string(toks[(j*10+1):(j*10+10)], ' ') AS chunk
                 FROM b, unnest(range(0, n_chunks)) t(j)),
      keep AS (SELECT doc_id, chunk_no, chunk
               FROM chunks WHERE len(chunk) >= 25),
      agg AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
                     (sum(len(chunk)) + count(*) - 1)::BIGINT AS n_chars,
                     md5(string_agg(chunk, chr(10) ORDER BY chunk_no))
                       AS main_md5
              FROM keep GROUP BY doc_id),
      nb AS (SELECT doc_id,
                    (6 + count(CASE WHEN len(chunk) > 0 THEN 1 END))::BIGINT
                      AS n_blocks
             FROM chunks GROUP BY doc_id)
      SELECT b.doc_id, nb.n_blocks,
             coalesce(agg.n_kept, 0) AS n_kept,
             coalesce(agg.n_chars, 0) AS n_chars,
             coalesce(agg.main_md5, md5('')) AS main_md5
      FROM b JOIN nb USING (doc_id) LEFT JOIN agg USING (doc_id)
      ORDER BY doc_id"""))

  val soup = Q(
    "text_html_extract_soup",
    (s, dir) => {
      import s.implicits._
      val exUdf = udf((h: String) => extractStats(h))
      HtmlFixtures.corpus.toDF("page_id", "html")
        .select(col("page_id"), exUdf(col("html")).as("r"))
        .select(col("page_id"),
          col("r._1").cast("long").as("n_blocks"),
          col("r._2").cast("long").as("n_kept"),
          md5(col("r._4")).as("main_md5"))
        .orderBy("page_id")
    },
    Some(s"""
      SELECT page_id, n_blocks::BIGINT AS n_blocks, n_kept::BIGINT AS n_kept,
             md5(main_text) AS main_md5
      FROM read_parquet('${Fixtures.path("html_extract_expected.parquet")}')
      ORDER BY page_id"""))

  def qs: Seq[Q] = Seq(extract, soup)
}
