package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MarkovAttribution

/** Gates for Markov removal-effect attribution
  * ([[graft.ops.MarkovAttribution]]): hand-solvable chains pin the exact
  * basis-point fixed point, the lookback and the no-touch-converter
  * `start → conv` edge are exercised by construction, and the algebraic
  * invariants the Scaladoc claims (nonnegative removal effects, shares
  * summing to exactly 10000, determinism) are asserted on a random log. */
class MarkovAttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    MarkovAttribution
      .removalEffects(rows.toDF("user_id", "us", "event_id", "event_type"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("single channel, half the journeys convert: p = 5000, full credit") {
    // u1: view -> purchase; u2: view only. start->view ×2, view->conv,
    // view->null. p(view) = 10000/2 = 5000 = p(start); removing view
    // zeroes conversion, so the one channel takes all 10000 shares.
    val res = run(Seq(
      (1L, 100L, 1L, "view"), (1L, 200L, 2L, "purchase"),
      (2L, 100L, 3L, "view")))
    assert(res == Map("view" -> ((5000L, 0L, 5000L, 10000L))))
  }

  test("converting and non-converting channels split credit all-or-nothing") {
    // A-journeys always convert, B-journeys never: removal(B) must be 0.
    val res = run(Seq(
      (1L, 100L, 1L, "view"), (1L, 200L, 2L, "purchase"),
      (2L, 100L, 3L, "click")))
    assert(res("view") == ((5000L, 0L, 5000L, 10000L)))
    assert(res("click") == ((5000L, 5000L, 0L, 0L)))
  }

  test("lookback exclusion turns a stale-touch converter into start->conv") {
    // u1's view is 8 days before its purchase — outside the 7-day
    // lookback, so u1 contributes start->conv and 'view' never becomes a
    // state. u2: click -> purchase. p(click) = 10000,
    // p(start) = (1·10000 + 1·10000) div 2 = 10000; removing click
    // leaves only the start->conv half: 5000.
    val DayUs = 86400000000L
    val res = run(Seq(
      (1L, 0L, 1L, "view"), (1L, 8L * DayUs, 2L, "purchase"),
      (2L, 100L, 3L, "click"), (2L, 200L, 4L, "purchase")))
    assert(res == Map("click" -> ((10000L, 5000L, 5000L, 10000L))))
  }

  test("random log: removal effects nonnegative, shares sum to 10000, " +
    "deterministic") {
    val rng = new scala.util.Random(13)
    val types = Array("view", "view", "click", "purchase")
    val rows = (0 until 2000).map { i =>
      (rng.nextInt(60).toLong, rng.nextInt(100000).toLong * 1000L, i.toLong,
        types(rng.nextInt(types.length)))
    }
    val a = run(rows)
    assert(a.keySet == Set("view", "click"))
    a.foreach { case (c, (full, removed, eff, _)) =>
      assert(removed <= full, s"$c: p_removed > p_full")
      assert(eff == full - removed && eff >= 0L, s"$c: bad removal effect")
    }
    assert(a.values.map(_._4).sum == 10000L, "shares must sum to 10000")
    assert(run(rows) == a, "must be bit-identical across executions")
  }
}
