package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Merge

/** MERGE/CDC-apply gate: random change logs applied by the Spark operator
  * must equal a driver-side fold of the same log (apply changes in seq
  * order per key; upsert replaces, delete removes). */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("same-seq tie resolves to the upsert (documented contract)") {
    import spark.implicits._
    val base = Seq((1L, "old", 0)).toDF("k", "payload", "v")
    val log = Seq(
      (1L, 5L, "delete", "x", 0),
      (1L, 5L, "upsert", "tie", 7)).toDF("k", "seq", "op", "payload", "v")
    val got = graft.ops.Merge.applyChanges(base, log, key = "k")
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "tie", 7)))
  }

  test("random change logs match the sequential fold") {
    import spark.implicits._
    val rng = new Random(11)
    for (trial <- 1 to 3) {
      val keys = 0 until 50
      val base = keys.map(k => (k.toLong, s"p$k", rng.nextInt(1000)))
      // up to 4 changes per key, strictly increasing seq within a key;
      // keys 50-59 are NOT in base (inserts / no-op deletes)
      val log = (0 until 60).flatMap { k =>
        (1 to rng.nextInt(5)).map { seq =>
          val op = if (rng.nextBoolean()) "upsert" else "delete"
          (k.toLong, seq.toLong, op, s"u$k-$seq", rng.nextInt(1000))
        }
      }
      val expected = base.map { case (k, p, v) =>
        k -> Option((p, v))
      }.toMap ++ log.groupBy(_._1).view.mapValues { chs =>
        chs.maxBy(_._2) match {
          case (_, _, "upsert", p, v) => Option((p, v))
          case _ => Option.empty[(String, Int)]
        }
      }.toMap
      val want = expected.collect { case (k, Some((p, v))) => (k, p, v) }.toSet

      val baseDf = base.toDF("k", "payload", "v")
      val logDf = log.toDF("k", "seq", "op", "payload", "v")
      val got = Merge.applyChanges(baseDf, logDf, key = "k")
        .as[(Long, String, Int)].collect().toSet
      assert(got == want, s"trial $trial mismatch")
    }
  }
}
