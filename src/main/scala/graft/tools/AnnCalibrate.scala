package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.{IndexQueries, VectorQueries}
import graft.core.Tables
import graft.ops.{Ivf, IvfPq, SimSearch}

/** Dev tool (LshTune sibling): recall@10 vs probe/rerank budget for the
  * IVF and IVF-PQ serving paths — the measurements behind the catalog's
  * recall-gate floors. Usage: tools/run.sh graft.tools.AnnCalibrate <sfDir>
  */
object AnnCalibrate {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, dir)
    val n = e.count()
    for (nq <- Seq(5, 20)) {
      val queries = e.filter(col("vec_id") < nq)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val truth = IndexQueries.GroundTruthCache.topK10(spark, dir)
        .filter(col("query_id") < nq)
      val (ivfIdx, ivfModel) = VectorQueries.IvfCache.ensure(spark, dir, 16)
      for (np <- Seq(10, 12, 14)) {
        val r = SimSearch.recallAtK(
          Ivf.topK(queries, ivfIdx, ivfModel, k = 10, nprobe = np), truth)
        println(f"ivf    nq=$nq%2d nprobe=$np%2d recall@10=$r%.4f")
      }
      val (pqIdx, pqModel) = VectorQueries.IvfPqCache.ensure(spark, dir)
      for (np <- Seq(12, 14); mult <- Seq(1, 2, 4)) {
        val rr = IvfPq.defaultRerank(10, n, nprobe = np, nlist = 16) * mult
        val r = SimSearch.recallAtK(
          IvfPq.topK(queries, pqIdx, e, pqModel, k = 10, nprobe = np,
            rerank = rr), truth)
        println(f"ivfpq  nq=$nq%2d nprobe=$np%2d rerank=$rr%6d (x$mult) recall@10=$r%.4f")
      }
    }
    spark.stop()
  }
}
