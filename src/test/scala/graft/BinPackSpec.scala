package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BinPack

/** Gates for salted-group FFD packing ([[graft.ops.BinPack]]): a
  * hand-packable instance pins the exact greedy, the capacity/coverage
  * invariants hold on random lengths at any salt granularity, oversized
  * docs are excluded by contract, and the traversal is deterministic. */
class BinPackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def pack(lens: Seq[Long], cap: Long, target: Long = 1L << 40) = {
    import spark.implicits._
    BinPack.packFirstFitDecreasing(
      lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }
        .toDF("doc_id", "n_tok"),
      capacity = cap, groupTarget = target)
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toMap // doc_id -> (grp, n_tok, bin)
  }

  test("hand-packed instance: [7,6,5,4,3,2,1] at capacity 10 → 3 full-ish bins") {
    // single group (huge target): FFD places 7|3, 6|4, 5|2|1
    val r = pack(Seq(7L, 6L, 5L, 4L, 3L, 2L, 1L), cap = 10L)
    val bins = r.toSeq.groupBy(_._2._3)
      .view.mapValues(_.map(_._2._2).sorted).toMap
    assert(bins == Map(1L -> Seq(3L, 7L), 2L -> Seq(4L, 6L),
      3L -> Seq(1L, 2L, 5L)))
  }

  test("random lengths: every doc placed once, no bin over capacity, " +
    "oversize excluded — at coarse and fine salt") {
    val rng = new scala.util.Random(17)
    val lens = (0 until 800).map(_ => rng.nextInt(700).toLong + 1)
    for (target <- Seq(1L << 40, 64L)) {
      val r = pack(lens, cap = 512L, target = target)
      val eligible = lens.zipWithIndex.filter(_._1 <= 512L)
      assert(r.size == eligible.size, "every eligible doc exactly once")
      assert(eligible.forall { case (_, i) => r.contains(i.toLong) })
      val overCap = r.toSeq.groupBy(v => (v._2._1, v._2._3))
        .filter(_._2.map(_._2._2).sum > 512L)
      assert(overCap.isEmpty, s"bins over capacity: ${overCap.keys}")
      // bins are 1..k dense per group
      r.toSeq.groupBy(_._2._1).foreach { case (g, docs) =>
        val bs = docs.map(_._2._3).distinct.sorted
        assert(bs == (1L to bs.length), s"group $g bins not dense: $bs")
      }
    }
  }

  test("FFD never uses more bins than next-fit on the same order") {
    val rng = new scala.util.Random(23)
    val lens = (0 until 300).map(_ => rng.nextInt(500).toLong + 1)
    val r = pack(lens, cap = 512L)
    val ffdBins = r.values.map(_._3).max
    // next-fit reference on the same (len desc, id) order
    val sorted = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .sortBy { case (id, l) => (-l, id) }
    var bins = 1; var load = 0L
    sorted.foreach { case (_, l) =>
      if (load + l > 512L) { bins += 1; load = l } else load += l
    }
    assert(ffdBins <= bins, s"FFD used $ffdBins bins vs next-fit $bins")
  }

  test("deterministic across executions") {
    val lens = (0 until 200).map(i => (i * 37 % 500).toLong + 1)
    assert(pack(lens, 512L, 64L) == pack(lens, 512L, 64L))
  }
}
