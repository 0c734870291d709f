package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog.PipelineQueries
import graft.core.Tables

/** Gates on the end-to-end curation pipeline (doc_pipeline_curate): the
  * dedup stage must provably collapse the doubled crawl, every stage's
  * invariant must hold in the rollup, and the composed plan must stay
  * deterministic across executions. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sf0001

  private lazy val rollup = PipelineQueries.curate.run(spark, dir).collect()
  private lazy val nDocs = Tables.documents(spark, dir).count()

  test("dedup collapses the doubled crawl: survivors never exceed the corpus") {
    val survivors = rollup.map(_.getLong(2)).sum
    assert(survivors > 0, "pipeline filtered everything out")
    assert(survivors <= nDocs,
      s"$survivors survivors from a corpus of $nDocs — duplicates kept")
  }

  test("rollup invariants: agreement bounded by group size, positive sums") {
    assert(rollup.nonEmpty)
    rollup.foreach { r =>
      val (n, matched, tokens, quality) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(matched >= 0 && matched <= n)
      // the filter floor (quality >= 0.25, word_tokens >= 10) must show in
      // the per-group sums
      assert(tokens >= 10 * n)
      assert(quality >= 2500 * n)
    }
  }

  test("quality gate is a real filter: some docs are rejected") {
    val survivors = rollup.map(_.getLong(2)).sum
    assert(survivors < nDocs,
      "no doc fell below the quality/length/lang gates — thresholds vacuous")
  }

  test("composed plan is deterministic across executions") {
    val again = PipelineQueries.curate.run(spark, dir).collect()
    assert(rollup.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("stopword table rides as a broadcast, not a shuffle") {
    val plan = PipelineQueries.curate.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join for the stopword table:\n$plan")
  }
}
