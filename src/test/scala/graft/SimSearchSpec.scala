package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.{Ivf, SimSearch}

class SimSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val emb = Tables.embeddings(spark, SparkTestBase.sf0001).cache()

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding"))

  test("exactTopK: a stored vector's nearest neighbour is itself at distance 0") {
    val top1 = SimSearch.exactTopK(queries, emb, k = 1).collect()
    assert(top1.length == 5)
    top1.foreach { r =>
      assert(r.getAs[Long]("query_id") == r.getAs[Long]("vec_id"))
      assert(r.getAs[Double]("dist") == 0.0)
    }
  }

  test("exactTopK: k rows per query, distances non-decreasing") {
    val rows = SimSearch.exactTopK(queries, emb, k = 10)
      .orderBy("query_id", "dist").collect()
    assert(rows.length == 50)
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val d = g.map(_.getAs[Double]("dist"))
      assert(d.zip(d.tail).forall { case (x, y) => x <= y })
    }
  }

  test("Ivf.topK: recall@10 >= 0.9 vs exact oracle, exact at full probe") {
    val exact = SimSearch.exactTopK(queries, emb, k = 10)
    val model = Ivf.chooseCentroids(emb, nlist = 16)
    val assigned = Ivf.assign(emb, model)
    assert(assigned.count() == emb.count()) // every vector in exactly one cell
    val approx = Ivf.topK(queries, assigned, model, k = 10, nprobe = 12)
    val r = SimSearch.recallAtK(approx, exact)
    assert(r >= 0.9, s"recall@10 = $r with nprobe=12/16")
    // probing every cell makes IVF exhaustive → exact
    val full = Ivf.topK(queries, assigned, model, k = 10, nprobe = 16)
    assert(SimSearch.recallAtK(full, exact) == 1.0)
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
