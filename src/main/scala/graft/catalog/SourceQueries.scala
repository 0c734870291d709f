package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.sources.TextSources

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

  def qs: Seq[Q] = Seq(jsonlRoundtrip, csvRoundtrip, orcRoundtrip)
}
