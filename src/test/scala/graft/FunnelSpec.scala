package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Funnel

/** Boundary gates for the window funnel ([[graft.ops.Funnel]]): the three
  * documented semantics — strict step order, inclusive window bound, min
  * anchor — each flipped by a single planted event, plus a partial-funnel
  * case that would have caught the original completed-users-only join bug
  * (intermediate step counts must include users who drop later). */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Steps = Seq("view", "click", "purchase")
  private val W = 1000L // window in µs for these planted logs

  private def counts(rows: Seq[(Long, Long, String)]): (Long, Long, Long) = {
    import spark.implicits._
    val df = spark.createDataset(rows).toDF("user_id", "us", "event_type")
    val r = Funnel.funnelCounts(df, Steps, W).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("completed and partial funnels count per step reached") {
    // u1 completes; u2 reaches click only; u3 views only; u4 never views
    // (its click/purchase must not create a funnel without step 1).
    val rows = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 100L, "view"), (2L, 200L, "click"),
      (3L, 100L, "view"),
      (4L, 100L, "click"), (4L, 200L, "purchase"))
    assert(counts(rows) == ((3L, 2L, 1L)))
  }

  test("strict order: a step at exactly the previous step's ts does not advance") {
    val tied = Seq(
      (1L, 100L, "view"), (1L, 100L, "click"), (1L, 300L, "purchase"))
    assert(counts(tied) == ((1L, 0L, 0L)))
    // one µs later and the click (then purchase) qualifies
    val after = Seq(
      (1L, 100L, "view"), (1L, 101L, "click"), (1L, 300L, "purchase"))
    assert(counts(after) == ((1L, 1L, 1L)))
  }

  test("window is inclusive at anchor + W and anchored at the FIRST view") {
    // click exactly at anchor+W counts; purchase at anchor+W+1 does not
    val edge = Seq(
      (1L, 100L, "view"), (1L, 100L + W, "click"),
      (1L, 101L + W, "purchase"))
    assert(counts(edge) == ((1L, 1L, 0L)))
    // a second, later view would put the purchase in window, but the
    // anchor stays at the FIRST view — documented min-anchor semantics
    val reanchor = Seq(
      (1L, 100L, "view"), (1L, 2000L, "view"),
      (1L, 2100L, "click"), (1L, 2200L, "purchase"))
    assert(counts(reanchor) == ((1L, 0L, 0L)))
  }

  test("earliest QUALIFYING step is the next anchor, not the globally earliest") {
    // u1's earliest click is BEFORE its first view (non-qualifying); the
    // later click must carry the funnel and the purchase follows it.
    val rows = Seq(
      (1L, 100L, "view"), (1L, 50L, "click"),
      (1L, 400L, "click"), (1L, 500L, "purchase"))
    assert(counts(rows) == ((1L, 1L, 1L)))
  }

  /** Driver-side reference: the documented semantics implemented
    * independently (sort-free min-scans over the raw event list). */
  private def refCounts(
      rows: Seq[(Long, Long, String)]): (Long, Long, Long) = {
    val byUser = rows.groupBy(_._1)
    var (n1, n2, n3) = (0L, 0L, 0L)
    byUser.foreach { case (_, evs) =>
      val views = evs.filter(_._3 == Steps(0)).map(_._2)
      if (views.nonEmpty) {
        n1 += 1
        val a = views.min
        val clicks = evs.filter(_._3 == Steps(1)).map(_._2)
          .filter(us => us > a && us <= a + W)
        if (clicks.nonEmpty) {
          n2 += 1
          val c = clicks.min
          val buys = evs.filter(_._3 == Steps(2)).map(_._2)
            .filter(us => us > c && us <= a + W)
          if (buys.nonEmpty) n3 += 1
        }
      }
    }
    (n1, n2, n3)
  }

  test("random event logs agree with an independent driver-side reference") {
    val rnd = new scala.util.Random(99)
    (1 to 3).foreach { trial =>
      // dense logs over few users and a tight time range so window edges,
      // pre-anchor events and ties all occur organically
      val types = Seq("view", "click", "purchase", "other")
      val rows = Seq.fill(300)((rnd.nextInt(12).toLong,
        rnd.nextInt(3000).toLong, types(rnd.nextInt(types.size))))
      assert(counts(rows) == refCounts(rows), s"trial $trial diverged")
    }
  }

  test("attribution conserves credit: every model pays exactly 10000 bp " +
      "per converting user with touches") {
    val rows = graft.catalog.RelationalQueries.eventsAttribution
      .run(spark, SparkTestBase.sf0001).collect()
    assert(rows.nonEmpty)
    val byModel = rows.groupBy(_.getString(0))
    assert(byModel.keySet == Set("first_touch", "last_touch", "linear"))
    val totals = byModel.view.mapValues(_.map(_.getLong(3)).sum).toMap
    // all three models split the same pot — same converting users
    assert(totals.values.toSet.size == 1,
      s"models disagree on total credit: $totals")
    assert(totals("linear") % 10000 == 0,
      "total must be 10000 bp x number of credited conversions")
    // every model counts the same touch rows
    val touches = byModel.view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(touches.values.toSet.size == 1)
  }

  test("time-decay attribution pays the same pot as the base models and " +
      "weights newer touches strictly more per touch") {
    val decay = graft.catalog.RelationalQueries.eventsAttributionDecay
      .run(spark, SparkTestBase.sf0001).collect()
    assert(decay.nonEmpty)
    val decayTotal = decay.map(_.getLong(3)).sum
    val base = graft.catalog.RelationalQueries.eventsAttribution
      .run(spark, SparkTestBase.sf0001).collect()
    val linearTotal = base.filter(_.getString(0) == "linear")
      .map(_.getLong(3)).sum
    // identical conversions and lookback => identical credit pot
    assert(decayTotal == linearTotal,
      s"decay pot $decayTotal != linear pot $linearTotal")
    // per-touch credit must fall with age: day-0 touches out-earn day-6+
    val perTouch = decay.groupBy(_.getLong(1))
      .view.mapValues(rs =>
        rs.map(_.getLong(3)).sum.toDouble / rs.map(_.getLong(2)).sum).toMap
    val ages = perTouch.keys.toSeq.sorted
    assert(ages.size >= 2)
    assert(perTouch(ages.head) > perTouch(ages.last),
      s"per-touch credit not decaying: $perTouch")
  }

  test("funnelSteps keeps one row per step-1 user with null tails") {
    import spark.implicits._
    val rows = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 100L, "view"), (2L, 200L, "click"),
      (3L, 100L, "view"))
    val df = spark.createDataset(rows).toDF("user_id", "us", "event_type")
    val wide = Funnel.funnelSteps(df, Steps, W)
      .orderBy("user").collect()
    assert(wide.length == 3)
    assert(wide.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(!wide(0).isNullAt(3) && wide(1).isNullAt(3) && wide(2).isNullAt(2))
  }
}
