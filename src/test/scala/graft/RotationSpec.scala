package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Rotation

/** Gates for the Walsh–Hadamard rotation: the O(d log d) butterfly must
  * equal the defining d×d sign-sum (the form the DuckDB oracle replays),
  * and the algebra the ANN composition relies on must hold exactly. */
class RotationSpec extends AnyFunSuite {

  private def brute(x: Array[Double]): Array[Double] =
    Array.tabulate(x.length) { i =>
      x.indices.map(j =>
        (if (java.lang.Integer.bitCount(i & j) % 2 == 1) -1.0 else 1.0)
          * x(j)).sum
    }

  test("butterfly equals the (-1)^popcount(i AND j) definition") {
    val rng = new scala.util.Random(7)
    for (n <- Seq(2, 8, 32, 64)) {
      val x = Array.fill(n)((rng.nextInt(401) - 200).toDouble)
      assert(Rotation.fwht(x).toSeq == brute(x).toSeq, s"mismatch at n=$n")
    }
  }

  test("involution and norm scaling: H(Hx) = n·x, ‖Hx‖² = n·‖x‖²") {
    val rng = new scala.util.Random(11)
    val x = Array.fill(64)((rng.nextInt(2001) - 1000).toDouble)
    val y = Rotation.fwht(x)
    assert(Rotation.fwht(y).toSeq == x.map(_ * 64).toSeq)
    assert(y.map(v => v * v).sum == 64.0 * x.map(v => v * v).sum)
  }

  test("pairwise L2 distances scale uniformly by n (ranking preserved)") {
    val rng = new scala.util.Random(13)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum
    val vs = Array.fill(5)(Array.fill(32)((rng.nextInt(101) - 50).toDouble))
    val rs = vs.map(Rotation.fwht)
    for (i <- vs.indices; j <- vs.indices)
      assert(d2(rs(i), rs(j)) == 32.0 * d2(vs(i), vs(j)))
  }

  test("power-of-two length is required") {
    intercept[IllegalArgumentException] {
      Rotation.fwht(Array(1.0, 2.0, 3.0))
    }
  }
}
