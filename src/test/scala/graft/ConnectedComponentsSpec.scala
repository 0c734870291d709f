package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ConnectedComponents

/** Gates on the duplicate-cluster operator: known topologies, a randomized
  * union-find cross-check, and the catalog entry's fixture behavior. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side union-find reference. */
  private def ufRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // normalize to min-of-component
    val groups = nodes.groupBy(find)
    groups.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  test("chain, clique and singleton-pair topologies") {
    // chain 1-2-3-4-5 forces multiple propagation rounds
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(cc(chain) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // two components + reversed edge direction
    val two = Seq((10L, 7L), (7L, 8L), (20L, 21L))
    assert(cc(two) == Map(7L -> 7L, 8L -> 7L, 10L -> 7L, 20L -> 20L, 21L -> 20L))
  }

  test("random graphs agree with driver-side union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      assert(cc(edges) == ufRef(edges))
    }
  }

  private def ccStar(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.componentsLargeSmallStar(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("large/small-star equals min-label and union-find on random graphs") {
    val rnd = new scala.util.Random(1234)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val ref = ufRef(edges)
      assert(ccStar(edges) == ref)
      assert(cc(edges) == ref)
    }
  }

  test("large/small-star contracts a 64-node path past min-label's round budget") {
    // A 64-long chain has diameter 63: min-label at its default maxIter=20
    // MUST fail (that is the documented weakness), while the star
    // alternation converges logarithmically and labels the whole path 0.
    val path = (0L until 63L).map(i => (i, i + 1))
    assert(ccStar(path) == (0L to 63L).map(_ -> 0L).toMap)
    val e = intercept[IllegalArgumentException](cc(path))
    assert(e.getMessage.contains("did not converge"))
  }

  private def ccIncr(
      base: Seq[(Long, Long)], delta: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.updateIncremental(
      ConnectedComponents.components(base.toDF("src", "dst")),
      delta.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("incremental update equals full recompute on the union graph") {
    val rnd = new scala.util.Random(77)
    (1 to 3).foreach { _ =>
      // base over nodes 0..39; delta mixes: old-old merges, old-new
      // attachments, new-new pairs, and intra-component no-ops
      val base = Seq.fill(50)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val delta = Seq.fill(20)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      assert(ccIncr(base, delta) == ufRef(base ++ delta))
    }
  }

  test("incremental update: driver union-find tier equals distributed star") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val base = Seq.fill(50)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val delta = Seq.fill(20)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val labels = ConnectedComponents.components(base.toDF("src", "dst"))
    def run(tierMax: Long) = ConnectedComponents
      .updateIncremental(labels, delta.toDF("src", "dst"),
        driverTierMax = tierMax)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = run(1L << 20)
    val viaStar = run(0L) // forces the distributed star path
    assert(viaDriver == viaStar)
    assert(viaDriver == ufRef(base ++ delta))
  }

  test("incremental update: targeted merge, attach, no-op, new-only cases") {
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    // merge two components + attach a new node + brand-new pair + no-op
    val delta = Seq((3L, 10L), (21L, 50L), (60L, 61L), (1L, 2L))
    val got = ccIncr(base, delta)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 21L -> 20L, 50L -> 20L, 60L -> 60L, 61L -> 60L))
    // all-no-op delta leaves the labeling untouched
    assert(ccIncr(base, Seq((1L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
        20L -> 20L, 21L -> 20L))
  }

  test("incremental update: a new node can become the canonical minimum") {
    // new node 0 joins component {5,6} — the merged min is the NEW id
    val got = ccIncr(Seq((5L, 6L)), Seq((0L, 6L)))
    assert(got == Map(0L -> 0L, 5L -> 0L, 6L -> 0L))
  }

  test("catalog clusters: every cluster id is a member and the minimum") {
    val rows = graft.catalog.DedupQueries.clusterCc
      .run(spark, SparkTestBase.sf0001).collect()
    assert(rows.nonEmpty, "fixture n-gram pairs should produce clusters")
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      val ids = members.map(_.getAs[Long]("doc_id"))
      assert(ids.min == cid, s"cluster $cid: min member is ${ids.min}")
    }
  }
}
