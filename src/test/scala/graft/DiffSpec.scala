package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Diff

/** Snapshot-diff gate: random old/new snapshots (overlapping keys, nulls
  * in payloads) classified by the Spark operator must match a driver-side
  * classification. */
class DiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("random snapshots classify added/removed/changed/unchanged") {
    import spark.implicits._
    val rng = new Random(13)
    for (trial <- 1 to 3) {
      def snap(keys: Seq[Int]) = keys.map { k =>
        (k.toLong,
          if (rng.nextInt(10) == 0) null else s"s${rng.nextInt(3)}",
          rng.nextInt(4))
      }
      val oldS = snap(0 until 80)
      val newS = snap(20 until 100)
      val oldM = oldS.map(r => r._1 -> (r._2, r._3)).toMap
      val newM = newS.map(r => r._1 -> (r._2, r._3)).toMap
      val want = (oldM.keySet ++ newM.keySet).map { k =>
        k -> ((oldM.get(k), newM.get(k)) match {
          case (None, _) => "added"
          case (_, None) => "removed"
          case (Some(a), Some(b)) => if (a == b) "unchanged" else "changed"
        })
      }.toMap
      val got = Diff.snapshotDiff(
        oldS.toDF("k", "s", "v"), newS.toDF("k", "s", "v"), key = Seq("k"))
        .as[(Long, String)].collect().toMap
      assert(got == want, s"trial $trial mismatch")
    }
  }
}
