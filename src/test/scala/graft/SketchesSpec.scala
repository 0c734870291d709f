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
