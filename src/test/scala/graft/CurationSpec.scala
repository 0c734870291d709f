package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog.CurationQueries
import graft.core.Tables

/** Semantic gates on the curation operators: planted-PII exactness,
  * decontamination set algebra, quota caps, and packing conservation. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sf0001

  test("repetition fractions live in [0, 1e4] and dup2 < 1 on real text") {
    val rows = CurationQueries.repetition.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("dup2_frac_1e4", "top2_frac_1e4", "top1_frac_1e4").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 10000, s"$c=$v out of range")
      }
      // top 2-gram can't be rarer than 1/n2, i.e. strictly positive share
      assert(r.getAs[Long]("top2_frac_1e4") > 0)
    }
  }

  test("decontamination never reports a benchmark doc and n_shared >= 1") {
    val rows = CurationQueries.decontaminate.run(spark, dir).collect()
    assert(rows.nonEmpty, "fixture vocabulary should produce 5-gram overlap")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 97 != 0)
      assert(r.getAs[Long]("n_shared") >= 1)
    }
  }

  test("pii scrub finds exactly the planted identifiers") {
    val rows = CurationQueries.piiScrub.run(spark, dir).collect()
    val n = Tables.documents(spark, dir).count()
    assert(rows.length == n)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") == (if (id % 7 == 0) 1L else 0L))
      assert(r.getAs[Long]("n_phones") == (if (id % 11 == 3) 1L else 0L))
    }
  }

  test("quota sample caps every source and is deterministic") {
    val rows = CurationQueries.quotaSample.run(spark, dir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.foreach { case (_, rs) =>
      assert(rs.length <= 30)
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to rs.length).toSeq)
    }
    val again = CurationQueries.quotaSample.run(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("packing conserves tokens and numbers sequences contiguously") {
    val rows = CurationQueries.packSequences.run(spark, dir).collect()
    val totals = Tables.documents(spark, dir)
      .select(col("source"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_tok"))
      .groupBy("source").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet == totals.keySet)
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("sum_tokens")).sum == totals(src),
        s"token mass not conserved for $src")
      val seqs = rs.map(_.getAs[Long]("seq_id")).sorted.toSeq
      assert(seqs == (0L until rs.length).toSeq, s"holes in seq ids for $src")
    }
  }

  test("token budget: kept set IS the greedy prefix of the global quality order") {
    // the bucketed algorithm (full buckets via semi-join + one boundary
    // window) must equal the straightforward greedy it replaces: take
    // docs in (quality desc, doc_id) order while the running token sum
    // stays within budget
    val got = CurationQueries.tokenBudgetSample.run(spark, dir).collect()
    val all = got.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("q_1e6"), r.getAs[Long]("n_tokens")))
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("t"), col("text"))
      .collect().map { r =>
        val text = r.getAs[String]("text")
        val toks = text.split(" ", -1).length.toLong
        val alpha = text.toLowerCase.count(c => c >= 'a' && c <= 'z').toLong
        val q = math.floor(alpha.toDouble / text.length *
          math.min(toks, 100L).toDouble / 100.0 * 1e6).toLong
        (r.getAs[Long]("doc_id"), q, toks)
      }
    val greedy = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var budget = 15000L
    var stopped = false
    scored.sortBy { case (id, q, _) => (-q, id) }.foreach { case (id, q, n) =>
      if (!stopped && n <= budget) { greedy += ((id, q, n)); budget -= n }
      else stopped = true // maximal PREFIX, not a best-fit repack
    }
    assert(all.sortBy(_._1).toSeq == greedy.sortBy(_._1).toSeq)
    assert(all.map(_._3).sum <= 15000L)
  }
}
