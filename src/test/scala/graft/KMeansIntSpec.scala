package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KMeansInt

/** Gates for the distributed exact-integer k-means: planted well-separated
  * clusters must be recovered exactly, and the fixpoint must be
  * bit-identical across independent executions (the property the unrolled
  * oracle depends on). */
class KMeansIntSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("recovers three planted well-separated integer clusters") {
    // blobs around (0,...), (100,...), (-100,...) with ±2 jitter
    val rng = new scala.util.Random(3)
    val rows = for {
      b <- 0 until 3
      i <- 0 until 40
    } yield {
      val center = Array.fill(8)(Seq(0, 100, -100)(b))
      val emb = center.map(c => (c + rng.nextInt(5) - 2).toFloat)
      ((b * 40 + i).toLong, emb)
    }
    val df = rows.toDF("doc_id", "embedding")
    val out = KMeansInt.fitAssign(df, k = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same blob -> same cluster; different blobs -> different clusters
    for (b <- 0 until 3; i <- 1 until 40)
      assert(out((b * 40 + i).toLong) == out((b * 40).toLong),
        s"blob $b split")
    assert(Set(out(0L), out(40L), out(80L)).size == 3, "blobs merged")
  }

  test("bit-identical across independent executions") {
    val rows = (0L until 90L).map(i =>
      i -> Array.tabulate(8)(j => ((i * 7 + j * 3) % 11 - 5).toFloat))
    val df = rows.toDF("doc_id", "embedding")
    val a = KMeansInt.fitAssign(df, k = 4, iters = 3)
      .orderBy("doc_id").collect().toSeq
    val b = KMeansInt.fitAssign(df, k = 4, iters = 3)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
