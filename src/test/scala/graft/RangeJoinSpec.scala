package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.RelationalQueries
import graft.core.Tables
import graft.ops.RangeJoin

/** Range-join gates: the binned equi-join must be EXACT (equal to the raw
  * inequality join it replaces), inclusive at both window boundaries, and
  * must never plan a nested loop — the property it exists for. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sf0001

  test("binned join equals the brute-force inequality join on fixture events") {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("us").as("win_start"), (col("us") + 3600000000L).as("win_end"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("us"))

    val got = RangeJoin.pointInInterval(
      purchases, signups, Seq("user_id"), "us", "win_start", "win_end",
      binWidth = 3600000000L)
      .select("signup_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val want = purchases.as("p").join(signups.as("i"),
      col("p.user_id") === col("i.user_id") &&
        col("p.us").between(col("win_start"), col("win_end")))
      .select("signup_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got.nonEmpty && got == want)
  }

  test("boundaries are inclusive and bins never double-count") {
    import spark.implicits._
    // window [100, 200] with binWidth 50 spans bins 2..4; points at the
    // exact ends must match, one inside must match ONCE, outside must not
    val intervals = Seq((1L, 7L, 100L, 200L))
      .toDF("k", "interval_id", "lo", "hi")
    val points = Seq((1L, 10L, 100L), (1L, 11L, 150L), (1L, 12L, 200L),
      (1L, 13L, 99L), (1L, 14L, 201L))
      .toDF("k", "point_id", "us")
    val out = RangeJoin.pointInInterval(
      points, intervals, Seq("k"), "us", "lo", "hi", binWidth = 50L)
      .select("point_id").collect().map(_.getLong(0)).toSeq
    assert(out.sorted == Seq(10L, 11L, 12L))
  }

  test("plan: equi hash join, never a nested loop or cartesian product") {
    val p = RelationalQueries.eventsRangeJoin.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must not plan a nested loop:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi join on (key, bin):\n$p")
  }
}
