package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Distances

/** Metric axioms (SURVEY.md §5.3): identity, symmetry, non-negativity, and
  * the Minkowski-family consistency relations — evaluated through the actual
  * Catalyst expressions, not a Scala reimplementation. */
class DistancesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // Deterministic pseudo-random vector pairs (includes zero and equal pairs).
  private val rnd = new scala.util.Random(42)
  private def vec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 4 - 2)
  private val pairs: Seq[(Array[Float], Array[Float])] = {
    val base = Seq.fill(20)((vec(16), vec(16)))
    val v = vec(16)
    base ++ Seq((v, v), (Array.fill(16)(0f), vec(16)))
  }

  private lazy val df = pairs.toDF("a", "b")
    .select(Distances.asDouble($"a").as("a"), Distances.asDouble($"b").as("b"))
    .cache()

  private val metrics = Distances.all.filterNot(_ == Distances.Hamming)

  test("identity: d(a, a) == 0") {
    metrics.filterNot(_ == Distances.Cosine).foreach { m =>
      val d = df.select(m($"a", $"a").as("d")).as[Double].collect()
      assert(d.forall(x => math.abs(x) < 1e-9), s"${m.name}: d(a,a) != 0")
    }
    // cosine(a,a) ≈ 0 for every non-zero vector; exactly 1.0 for the zero
    // vector (the engine's defined value — Distances.cosine doc).
    val c = df.select(
      Distances.cosine($"a", $"a").as("d"),
      aggregate(transform($"a", x => abs(x)), lit(0.0), _ + _).as("mass"))
      .as[(Double, Double)].collect()
    c.foreach { case (d, mass) =>
      if (mass == 0.0) assert(d == 1.0) else assert(math.abs(d) < 1e-9)
    }
  }

  test("symmetry: d(a, b) == d(b, a)") {
    metrics.foreach { m =>
      val d = df.select(m($"a", $"b").as("x"), m($"b", $"a").as("y"))
        .as[(Double, Double)].collect()
      assert(d.forall { case (x, y) => math.abs(x - y) < 1e-9 }, s"${m.name} not symmetric")
    }
  }

  test("non-negativity") {
    (metrics :+ Distances.Hamming).foreach { m =>
      val d = df.select(m($"a", $"b").cast("double").as("d")).as[Double].collect()
      assert(d.forall(_ >= -1e-12), s"${m.name} negative distance")
    }
  }

  test("family consistency: minkowski(1)=manhattan, minkowski(2)=l2, l2^2=l2sq") {
    val d = df.select(
      Distances.minkowski($"a", $"b", 1.0).as("m1"),
      Distances.manhattan($"a", $"b").as("man"),
      Distances.minkowski($"a", $"b", 2.0).as("m2"),
      Distances.l2($"a", $"b").as("l2"),
      Distances.l2sq($"a", $"b").as("l2sq"))
      .as[(Double, Double, Double, Double, Double)].collect()
    d.foreach { case (m1, man, m2, l2, l2sq) =>
      assert(math.abs(m1 - man) < 1e-6)
      assert(math.abs(m2 - l2) < 1e-6)
      assert(math.abs(l2 * l2 - l2sq) < 1e-6)
    }
  }

  test("hamming: d(a,a)=0, full 32-bit patterns") {
    val fd = pairs.toDF("a", "b").cache()
    val zero = fd.select(Distances.hamming(col("a"), col("a")).as("d")).as[Long].collect()
    assert(zero.forall(_ == 0L))
    // single-component sign flip = exactly 1 bit
    val one = Seq((Array(1.0f, 2.0f), Array(-1.0f, 2.0f))).toDF("a", "b")
      .select(Distances.hamming(col("a"), col("b")).as("d")).as[Long].head()
    assert(one == 1L)
  }

  test("chebyshev <= manhattan; braycurtis in [0,1] for positive vectors") {
    val d = df.select(
      Distances.chebyshev($"a", $"b").as("c"),
      Distances.manhattan($"a", $"b").as("m"))
      .as[(Double, Double)].collect()
    d.foreach { case (c, m) => assert(c <= m + 1e-9) }
    val pos = Seq((Array(1f, 2f, 3f), Array(3f, 1f, 2f))).toDF("a", "b")
      .select(Distances.brayCurtis(
        Distances.asDouble($"a"), Distances.asDouble($"b")).as("d"))
      .as[Double].head()
    assert(pos >= 0 && pos <= 1)
  }
}
