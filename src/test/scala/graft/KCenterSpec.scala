package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KCenter

/** Gates for the greedy k-center traversal: a hand-computed selection
  * sequence (seed, argmax order, tie rules) must come out exactly — the
  * bit-identical determinism the unrolled DuckDB oracle replays. */
class KCenterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("farthest-point traversal: hand-computed selection and assignment") {
    // 2-D integer points. Seed = min id (1). Round 2 argmax: id 5 at
    // dist2 10000. Round 3: md = {2:1, 3:100, 4:101} -> id 4.
    val rows = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(10f, 0f)),
      (4L, Seq(10f, 1f)), (5L, Seq(100f, 0f)))
    val out = KCenter.selectAssign(rows.toDF("doc_id", "embedding"), k = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == (1L, 1L, 0L))
    assert(out(2L) == (1L, 1L, 1L))
    assert(out(3L) == (4L, 3L, 1L)) // closer to center 4 (1) than 1 (100)
    assert(out(4L) == (4L, 3L, 0L))
    assert(out(5L) == (5L, 2L, 0L))
  }

  test("assignment distance ties keep the earliest-selected center") {
    // 1-D: seed A=0; B=4 selected second. C=2 is equidistant (dist2 4)
    // from both -> must stay with the earlier-selected center A.
    val rows = Seq((10L, Seq(0f)), (11L, Seq(4f)), (12L, Seq(2f)))
    val out = KCenter.selectAssign(rows.toDF("doc_id", "embedding"), k = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(10L) == (10L, 1L, 0L))
    assert(out(11L) == (11L, 2L, 0L))
    assert(out(12L) == (10L, 1L, 4L), s"tie must keep center 10: ${out(12L)}")
  }

  test("argmax ties pick the smallest id and reruns are bit-identical") {
    // two points at the same distance from the seed: the smaller id wins
    val rows = Seq((1L, Seq(0f, 0f)), (2L, Seq(3f, 4f)), (3L, Seq(5f, 0f)))
    val a = KCenter.selectAssign(rows.toDF("doc_id", "embedding"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(a.find(_._1 == 2L).get._2 == 2L, "doc 2 (smaller id at dist2 25) is the second center")
    val b = KCenter.selectAssign(rows.toDF("doc_id", "embedding"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(a == b)
  }
}
