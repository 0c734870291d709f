package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.ProfileQueries

/** Distribution-shape gates on the profiling operators. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sf0001

  test("token quantiles are ordered min <= p50 <= p90 <= p99 <= max") {
    val rows = ProfileQueries.tokenQuantiles.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mn = r.getAs[Long]("min_tok").toDouble
      val mx = r.getAs[Long]("max_tok").toDouble
      val (p50, p90, p99) = (r.getAs[Double]("p50"),
        r.getAs[Double]("p90"), r.getAs[Double]("p99"))
      assert(mn <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx,
        s"quantiles out of order: $mn $p50 $p90 $p99 $mx")
    }
  }

  test("lineitem profile extremes bound each other and counts are sane") {
    val r = ProfileQueries.profileLineitem.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_rows") > 0)
    assert(r.getAs[Long]("n_orders") <= r.getAs[Long]("n_rows"))
    assert(r.getAs[Double]("min_qty") <= r.getAs[Double]("max_qty"))
    assert(r.getAs[Double]("min_price") <= r.getAs[Double]("max_price"))
    assert(r.getAs[String]("min_shipdate") <= r.getAs[String]("max_shipdate"))
    assert(r.getAs[Long]("null_tax") == 0)
  }
}
