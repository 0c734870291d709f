package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

/** Z-order kernel gates: the Column mask-cascade must equal a bit-by-bit
  * reference interleave, and the curve must preserve quad locality. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def refMorton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue equals the bit-by-bit reference interleave") {
    import spark.implicits._
    val rng = new Random(23)
    val pts = Seq.fill(500)((rng.nextInt(1 << 16).toLong, rng.nextInt(1 << 16).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refMorton(x, y, 16), s"($x, $y): got $z")
    }
  }

  test("quad locality: points sharing a 2^k-aligned quad share a z-prefix") {
    import spark.implicits._
    // all points inside the 256-aligned quad [512,768)x[1280,1536) must
    // land in one contiguous 2^16-sized z-range
    val rng = new Random(29)
    val pts = Seq.fill(200)((512L + rng.nextInt(256), 1280L + rng.nextInt(256)))
    val zs = pts.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z")).as[Long].collect()
    assert(zs.max - zs.min < (1L << 16),
      s"quad spread ${zs.max - zs.min} exceeds one quad's z-span")
  }
}
