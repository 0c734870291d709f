package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{SimSearch, Sq}

/** Gates for the SQ8 family: code-range and reconstruction-error bounds
  * (the quantization contract), determinism of the full scan, and recall
  * against exact kNN on the fixture. */
class SqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sf0001

  private lazy val e = Tables.embeddings(spark, dir)
  private lazy val model = Sq.train(e)
  private lazy val codes = Sq.encode(e, model)

  test("codes stay in one byte; reconstruction error bounded by cell width") {
    val joined = Sq.decode(codes, model)
      .withColumnRenamed("embedding", "rec")
      .join(e.select(col("vec_id"),
        graft.functions.Distances.asDouble(col("embedding")).as("raw")), "vec_id")
      .select(col("vec_id"), col("rec"), col("raw")).collect()
    val widths = model.mins.indices.map(i =>
      (model.maxs(i) - model.mins(i)) / 255.0)
    joined.foreach { r =>
      val rec = r.getSeq[Double](1)
      val raw = r.getSeq[Double](2)
      raw.indices.foreach { i =>
        assert(math.abs(rec(i) - raw(i)) <= widths(i) + 1e-12,
          s"component $i off by more than a quantization cell")
      }
    }
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0, "code outside one byte")
  }

  test("compressed scan recall@10 >= 0.8 vs exact; deterministic reruns") {
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val approx = Sq.topK(queries, codes, model, k = 10)
    val exact = SimSearch.exactTopK(queries, e, k = 10)
    val recall = SimSearch.recallAtK(approx, exact)
    assert(recall >= 0.8, s"SQ8 recall@10 $recall below floor")
    val a = approx.orderBy("query_id", "vec_id").collect().toSeq
    val b = Sq.topK(queries, codes, model, k = 10)
      .orderBy("query_id", "vec_id").collect().toSeq
    assert(a == b)
  }
}
