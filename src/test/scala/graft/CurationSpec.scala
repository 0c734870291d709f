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
}
