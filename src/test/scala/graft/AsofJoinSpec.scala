package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.RelationalQueries
import graft.core.Tables
import graft.ops.AsofJoin

/** As-of join semantics gates: equivalence to a brute-force per-key scan
  * on real fixture data, the inclusive-tie and no-match boundaries on
  * planted rows, and the plan shape the operator exists for (one shuffle,
  * zero join operators). */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sf0001

  test("asof equals the brute-force most-recent-prior scan on fixture events") {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("us").as("click_us"))
      .agg(max("event_id").as("click_id"))
      .withColumn("us", col("click_us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("us"))

    val got = AsofJoin.asof(views, clicks, Seq("user_id"), "us")
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    val clickRows = clicks.select("user_id", "us", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = views.collect().map { r =>
      val (id, u, us) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val prior = clickRows.filter(c => c._1 == u && c._2 <= us)
      id -> (if (prior.isEmpty) -1L else prior.maxBy(_._2)._3)
    }.toMap

    assert(got.nonEmpty && got == want)
  }

  test("tie is inclusive and no-prior-match yields null payload") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 10L, "p3"))
      .toDF("k", "us", "tag")
    val right = Seq((1L, 100L, "r_at_100"), (1L, 60L, "r_at_60"), (2L, 20L, "r_at_20"))
      .toDF("k", "us", "payload")
    val out = AsofJoin.asof(left, right, Seq("k"), "us")
      .select("tag", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("p1").contains("r_at_100")) // equal ts matches (inclusive >=)
    assert(out("p2").isEmpty)              // only later right rows exist
    assert(out("p3").isEmpty)              // right row is after the left row
  }

  test("multi-column payload is carried ATOMICALLY: a NULL field in the " +
    "matching right row stays NULL (never stitched from an older row)") {
    import spark.implicits._
    val left = Seq((1L, 20L, "p")).toDF("k", "us", "tag")
    val right = Seq(
      (1L, 5L, Some("old_a"), Some("old_b")),
      (1L, 10L, Some("new_a"), Option.empty[String]))
      .toDF("k", "us", "pa", "pb")
    def check(out: org.apache.spark.sql.DataFrame): Unit = {
      val r = out.select("pa", "pb").collect().head
      assert(r.getString(0) == "new_a")
      assert(r.isNullAt(1), "NULL field of the matching row was shadowed " +
        "by an older right row — payload columns mixed across rows")
    }
    check(AsofJoin.asof(left, right, Seq("k"), "us"))
    for (w <- Seq(1L, 7L, 100L))
      check(AsofJoin.asofBucketed(left, right, Seq("k"), "us", w))
  }

  test("plan: one shuffle on the key, no join operator") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a")).toDF("k", "us", "tag")
    val right = Seq((1L, 5L, "x")).toDF("k", "us", "payload")
    val p = AsofJoin.asof(left, right, Seq("k"), "us")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"asof must not plan a join:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1, s"expected exactly one shuffle, got $shuffles:\n$p")
  }

  test("catalog q_events_asof: lag is non-negative and clicks precede purchases") {
    val rows = RelationalQueries.eventsAsof.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("lag_us")))
        assert(r.getLong(r.fieldIndex("lag_us")) >= 0L)
    }
  }
}
