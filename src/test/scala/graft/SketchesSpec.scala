package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

/** Misra-Gries guarantee gates: over any stream of N tokens with capacity
  * m, (a) at most m counters survive, (b) every token with true frequency
  * > N/(m+1) is present, (c) stored counts undercount by at most N/(m+1).
  * Exercised through the real Spark aggregation path (partial map-side +
  * merge), not just the driver-side reduce. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mgOverSpark(tokens: Seq[String], m: Int): Map[String, Long] = {
    import spark.implicits._
    // many small partitions force real partial/merge traffic
    spark.sparkContext.parallelize(tokens, 8).toDF("token")
      .agg(Sketches.heavyHitters(m, col("token")).as("sk"))
      .head().getMap[String, Long](0).toMap
  }

  test("count-min entry: independent Scala replay matches cell-for-cell") {
    // Re-derive the q_sketch_countmin output from first principles —
    // MessageDigest + Long.parseLong(hex, 16) instead of Spark's
    // md5/conv expression tree — and compare exactly. Catches a fold or
    // bucketing slip the DuckDB oracle (a third derivation) would also
    // catch, but locally and per-token.
    val dir = SparkTestBase.sf0001
    val texts = graft.core.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val tokRe = "[a-z0-9]+".r
    val cnt = scala.collection.mutable.HashMap.empty[String, Long]
    texts.foreach(t => tokRe.findAllIn(t.toLowerCase).foreach(w =>
      cnt.update(w, cnt.getOrElse(w, 0L) + 1L)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(j: Int, tok: String): Long =
      java.lang.Long.parseLong(md5hex(s"$j:$tok").substring(0, 15), 16) % 1024L
    val cells = scala.collection.mutable.HashMap.empty[(Int, Long), Long]
    cnt.foreach { case (tok, c) =>
      (0 until 4).foreach { j =>
        val k = (j, bucket(j, tok))
        cells.update(k, cells.getOrElse(k, 0L) + c)
      }
    }
    val n = cnt.values.sum
    val want = cnt.filter { case (_, c) => c * 64 > n }
      .map { case (tok, c) =>
        tok -> ((c, (0 until 4).map(j => cells((j, bucket(j, tok)))).min))
      }.toMap
    assert(want.nonEmpty, "fixture has no heavy tokens — test is vacuous")
    val got = Catalog.queries("q_sketch_countmin")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (tok, (c, est)) =>
      assert(got(tok) == ((c, est, true)),
        s"$tok: got ${got(tok)}, want ($c, $est, true)")
      assert(est >= c, s"$tok: CM one-sided guarantee violated")
    }
  }

  test("count-min mergeability: shard cells SUM to the whole-corpus cells") {
    // The 100 TB re-aggregation property: sketch(A ⊎ B) must equal
    // sketch(A) ⊕ sketch(B) cell-wise — run the REAL Spark build three
    // times (two disjoint shards + the union) and compare. Catches any
    // non-linear step (a distinct, a cap) creeping into the build.
    import spark.implicits._
    val rng = new Random(11)
    def stream(n: Int, salt: Int): Seq[String] =
      Seq.fill(n)(s"w${salt}_${rng.nextInt(300)}")
    val a = stream(5000, 0)
    val b = stream(3000, 1) ++ a.take(1000) // overlap: shared tokens too
    def cells(tokens: Seq[String]): Map[(Int, Long), Long] = {
      val counts = spark.sparkContext.parallelize(tokens, 6).toDF("token")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      Sketches.countMinCells(Sketches.countMinHashed(counts)).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val (ca, cb, cu) = (cells(a), cells(b), cells(a ++ b))
    val summed = (ca.keySet ++ cb.keySet).map(k =>
      k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))).toMap
    assert(cu == summed, "shard-cell sum differs from the union's cells")
  }

  test("guarantees hold on skewed random streams (Spark partial + merge)") {
    val rng = new Random(7)
    for (trial <- 1 to 3) {
      val m = 8 + trial * 4
      // zipf-ish: token i drawn with weight 1/(i+1)
      val vocab = (0 until 200).map(i => s"t$i")
      val weights = vocab.indices.map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val n = 20000
      val stream = Seq.fill(n) {
        val x = rng.nextDouble() * total
        vocab(cum.indexWhere(x <= _))
      }
      val sk = mgOverSpark(stream, m)
      assert(sk.size <= m, s"trial $trial: ${sk.size} counters > m=$m")
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = n.toDouble / (m + 1)
      exact.foreach { case (tok, cnt) =>
        if (cnt > bound)
          assert(sk.contains(tok),
            s"trial $trial: heavy hitter $tok (cnt=$cnt > $bound) missing")
        sk.get(tok).foreach { stored =>
          assert(stored <= cnt, s"$tok overcounted: $stored > $cnt")
          assert(cnt - stored <= bound + 1e-9,
            s"$tok undercounted past the bound: $cnt - $stored > $bound")
        }
      }
    }
  }
}
