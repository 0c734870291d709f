package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pca

/** Gates for the integer power iteration ([[graft.ops.Pca]]): a planted
  * dominant axis must be recovered with the max-norm pin, the Rayleigh
  * share must reflect the planted anisotropy, and the iterate must be
  * bit-identical across executions (the property the hash oracle rests
  * on). */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def embed(rows: Seq[Array[Float]]) = {
    import spark.implicits._
    rows.map(_.toSeq).toDF("embedding")
  }

  test("planted dominant axis is recovered at full scale with high share") {
    val rng = new scala.util.Random(5)
    val rows = (0 until 400).map { _ =>
      val a = Array.fill(64)((rng.nextFloat() - 0.5f) * 0.02f)
      a(7) = (rng.nextFloat() - 0.5f) * 1.8f // planted variance axis
      a
    }
    val r = Pca.topComponent(embed(rows)).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val vAbs = r.view.mapValues(_._1.abs).toMap
    assert(vAbs.maxBy(_._2)._1 == 7L, s"dominant axis not recovered: $vAbs")
    assert(vAbs(7L) == 10000L, "max-norm pin must put the top axis at scale")
    assert(r(0L)._2 > 9000L && r(0L)._2 <= 10000L,
      s"share_bp should reflect the planted anisotropy, got ${r(0L)._2}")
  }

  test("projection histogram: counts partition the corpus; a planted " +
    "bimodal axis yields two separated mass lobes") {
    val rng = new scala.util.Random(31)
    val rows = (0 until 400).map { k =>
      val a = Array.fill(64)((rng.nextFloat() - 0.5f) * 0.02f)
      a(3) = (if (k % 2 == 0) 0.8f else -0.8f) + (rng.nextFloat() - 0.5f) * 0.1f
      a
    }
    // lobes sit at ±0.8·scale² ≈ ±8e7 — bucket finer than the default 1e8
    val h = Pca.projectHistogram(embed(rows), bucket = 20000000L).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(h.map(_._2).sum == 400L, "histogram must partition the corpus")
    val buckets = h.filter(_._2 > 50L).map(_._1)
    assert(buckets.length >= 2 && buckets.max - buckets.min >= 2,
      s"two separated mass lobes expected, got ${h.toSeq}")
  }

  test("isotropic-ish corpus: share far below 1; deterministic repeat") {
    val rng = new scala.util.Random(9)
    val rows = (0 until 300).map(_ =>
      Array.fill(64)((rng.nextFloat() - 0.5f) * 0.6f))
    val a = Pca.topComponent(embed(rows)).collect().toSeq
    val share = a.head.getLong(2)
    assert(share > 0L && share < 2000L,
      s"64 comparable axes cannot concentrate, got $share bp")
    val b = Pca.topComponent(embed(rows)).collect().toSeq
    assert(a == b, "must be bit-identical across executions")
  }
}
