package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SemDedup

/** Gates for SemDeDup semantic dedup: planted near-identical vectors must
  * pair up, pairs never cross clusters, the derived dot product must equal
  * the brute-force integer dot, and keep must drop exactly the docs with a
  * smaller-id duplicate. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // Two well-separated blobs; in blob 0, docs 0/1/2 are near-identical
  // (cos > 0.999) and doc 3 is orthogonal-ish noise within the blob region.
  private def corpus = {
    val base = Array(50f, 50f, 50f, 50f, 0f, 0f, 0f, 0f)
    val far = Array(0f, 0f, 0f, 0f, 50f, 50f, 50f, 50f)
    Seq(
      0L -> base,
      1L -> base.map(_ + 1f),
      2L -> base.clone(),
      3L -> Array(50f, 0f, 0f, 50f, 0f, 50f, 50f, 0f),
      10L -> far,
      11L -> far.map(_ + 1f),
      12L -> Array(0f, 50f, 50f, 0f, 50f, 0f, 0f, 50f)
    ).toDF("doc_id", "embedding")
  }

  test("planted near-identical vectors pair; pairs stay within clusters") {
    val pairs = SemDedup.dupPairs(corpus, k = 2, iters = 3,
      tauNum = 99L, tauDen = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)) &&
      pairs.contains((1L, 2L)), s"planted dups missed: $pairs")
    assert(pairs.contains((10L, 11L)), s"far-blob dup missed: $pairs")
    // doc 3 and 12 share no high-cosine partner; no cross-blob pair
    assert(!pairs.exists { case (a, b) =>
      (a < 10L) != (b < 10L) || a == 3L || b == 3L || b == 12L })
  }

  test("derived dot equals brute-force integer dot") {
    val rows = SemDedup.dupPairs(corpus, k = 2, iters = 3,
      tauNum = 99L, tauDen = 100L).collect()
    val all = corpus.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toLong)).toMap
    rows.foreach { r =>
      val (a, b, dot) = (r.getLong(0), r.getLong(1), r.getLong(3))
      val expect = all(a).zip(all(b)).map { case (x, y) => x * y }.sum
      assert(dot == expect, s"pair ($a,$b): dot $dot != $expect")
    }
  }

  test("keep drops exactly docs with a smaller-id duplicate") {
    val kept = SemDedup.keep(corpus, k = 2, iters = 3,
      tauNum = 99L, tauDen = 100L)
      .collect().map(_.getLong(0)).toSet
    // 0 survives (canonical), 1/2 drop (dup of 0), 11 drops (dup of 10)
    assert(kept == Set(0L, 3L, 10L, 12L), s"kept = $kept")
  }
}
