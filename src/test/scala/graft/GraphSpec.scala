package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Gates for exact-integer PageRank: structural correctness on a
  * hand-analyzable topology, mass accounting under integer-division
  * leakage, and run-to-run determinism (the property the hash oracle
  * depends on). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("star graph: the hub out-ranks every spoke") {
    // 5 spokes -> hub; hub -> spoke 1. Hub collects 5 contributions. The
    // hub <-> spoke-1 2-cycle oscillates with amplitude 0.85^k, and the
    // fixpoint gap (hub 0.473 vs spoke-1 0.427) only dominates once that
    // decays — hence 40 rounds, not the catalog's 10.
    val edges = (1L to 5L).map(i => (i, 0L)) :+ (0L, 1L)
    val pr = Graph.pagerankInt(edges.toDF("src", "dst"), iters = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(0L) > pr(1L), "hub must out-rank the spoke it feeds")
    assert((2L to 5L).forall(i => pr(0L) > pr(i)))
    // spoke 1 receives the hub's whole rank: above the unfed spokes
    assert((2L to 5L).forall(i => pr(1L) > pr(i)))
  }

  test("two-node cycle converges to equal ranks") {
    val pr = Graph.pagerankInt(Seq((0L, 1L), (1L, 0L)).toDF("src", "dst"),
      iters = 12).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(0L) == pr(1L))
  }

  test("mass is conserved up to integer-division leakage") {
    val scale = 1000000000L
    val rng = new scala.util.Random(7)
    val edges = (0 until 400)
      .map(_ => (rng.nextInt(100).toLong, rng.nextInt(100).toLong))
      .filter(e => e._1 != e._2).distinct
    val pr = Graph.pagerankInt(edges.toDF("src", "dst"), iters = 10,
      scale = scale)
    val total = pr.agg(sum("pr")).head().getLong(0)
    // dangling nodes (no out-edges) and div remainders leak mass DOWN;
    // nothing can create mass above scale.
    assert(total <= scale, s"total $total exceeds scale")
    assert(total > scale / 10, s"total $total collapsed — leakage too large")
  }

  test("bit-identical across independent executions") {
    val edges = (0L until 50L).flatMap(i =>
      Seq((i, (i * 31 + 7) % 50), (i, (i * 17 + 3) % 50)))
      .filter(e => e._1 != e._2).distinct
    val df = edges.toDF("src", "dst")
    val a = Graph.pagerankInt(df, iters = 8).orderBy("id").collect().toSeq
    val b = Graph.pagerankInt(df, iters = 8).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("triangles: K4 has four, each node in three") {
    val k4 = (for { i <- 0L to 3L; j <- 0L to 3L if i != j } yield (i, j))
      .toDF("src", "dst")
    val t = Graph.triangleCounts(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == (0L to 3L).map(_ -> 3L).toMap)
  }

  test("triangles: a square has none; adding one diagonal makes two") {
    val square = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(Graph.triangleCounts(square.toDF("src", "dst")).count() == 0)
    val t = Graph.triangleCounts((square :+ (0L, 2L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // diagonal endpoints sit in both triangles; the square's other two
    // corners in one each
    assert(t == Map(0L -> 2L, 2L -> 2L, 1L -> 1L, 3L -> 1L))
  }

  test("clustering coefficients: K4 all 10000 bp; a path all 0; " +
    "degree-1 nodes emitted at 0") {
    val k4 = (for { i <- 0L to 3L; j <- 0L to 3L if i != j } yield (i, j))
      .toDF("src", "dst")
    val cc = Graph.clusteringCoefficients(k4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(cc == (0L to 3L).map(_ -> ((3L, 10000L))).toMap)
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pc = Graph.clusteringCoefficients(path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pc.length == 4 && pc.forall(t => t._3 == 0L && t._4 == 0L))
    // diamond: diagonal endpoints see 2 triangles over deg 3 -> 6666 bp
    val diamond = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
      .toDF("src", "dst")
    val dc = Graph.clusteringCoefficients(diamond).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(dc == Map(0L -> 6666L, 2L -> 6666L, 1L -> 10000L, 3L -> 10000L))
  }

  test("triangles match a brute-force reference on a random graph, " +
    "and direction/duplication of the input edges is irrelevant") {
    val rng = new scala.util.Random(11)
    val edges = (0 until 300)
      .map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val adj = edges.flatMap(e => Seq(e, e.swap)).toSet
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    for { a <- 0L until 40L; b <- a + 1 until 40L if adj((a, b))
          c <- b + 1 until 40L if adj((a, c)) && adj((b, c)) } {
      Seq(a, b, c).foreach(v => ref(v) = ref.getOrElse(v, 0L) + 1L)
    }
    // feed duplicated, arbitrarily-directed edges: canonicalization owns it
    val got = Graph.triangleCounts((edges ++ edges.map(_.swap))
      .toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref.toMap)
  }
}
