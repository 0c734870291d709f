package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.index.LshForest
import graft.ops.SimSearch

/** LSH forest gates (SURVEY.md §5, BASELINE.md): recall@10 >= 0.9 vs the
  * brute-force oracle at reference defaults (15 trees), leaf-size bound,
  * build determinism, candidate sanity. */
class LshForestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val emb = Tables.embeddings(spark, SparkTestBase.sf0001).cache()

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding"))

  private lazy val model = LshForest.build(emb)
  private lazy val buckets = LshForest.bucketTable(emb, model).cache()

  test("build: every vector lands in exactly one leaf per tree") {
    val n = emb.count()
    val counts = buckets.groupBy("tree_id").count().collect()
    assert(counts.length == model.numTrees)
    counts.foreach(r => assert(r.getAs[Long]("count") == n))
  }

  test("build: leaf sizes bounded by max_node_size (reference default 5)") {
    val maxLeaf = buckets.groupBy("tree_id", "leaf_id").count()
      .agg(max("count")).head().getLong(0)
    assert(maxLeaf < model.opts.maxNodeSize,
      s"largest leaf $maxLeaf !< ${model.opts.maxNodeSize}")
  }

  test("build: deterministic — same seed, same bucket table") {
    val model2 = LshForest.build(emb)
    val b2 = LshForest.bucketTable(emb, model2)
    assert(buckets.exceptAll(b2).isEmpty && b2.exceptAll(buckets).isEmpty)
  }

  test("search: recall@10 >= 0.9 vs exact oracle at 15 trees") {
    val exact = SimSearch.exactTopK(queries, emb, k = 10)
    val approx = LshForest.topK(queries, buckets, emb, model, k = 10)
    val r = SimSearch.recallAtK(approx, exact)
    assert(r >= 0.9, s"recall@10 = $r at numTrees=${model.numTrees}")
  }

  test("search: self-retrieval — each query's top hit is itself at dist 0") {
    val top = LshForest.topK(queries, buckets, emb, model, k = 1).collect()
    assert(top.length == 5)
    top.foreach { r =>
      assert(r.getAs[Long]("query_id") == r.getAs[Long]("vec_id"))
      assert(r.getAs[Double]("dist") == 0.0)
    }
  }

  test("search: driver-routed small batches equal the distributed path") {
    // 150 queries forces the distributed probe pipeline; the same batch
    // split into <=128-query chunks takes the driver-routing latency path.
    // Identical model + buckets must give identical results either way.
    val batch = emb.filter(col("vec_id") < 150)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val big = LshForest.topK(batch, buckets, emb, model, k = 5)
    val lo = batch.filter(col("query_id") < 75)
    val hi = batch.filter(col("query_id") >= 75)
    val small = LshForest.topK(lo, buckets, emb, model, k = 5)
      .unionAll(LshForest.topK(hi, buckets, emb, model, k = 5))
    assert(big.exceptAll(small).isEmpty && small.exceptAll(big).isEmpty)
  }

  test("scaledBudget: 1/selectivity growth, exhaustive and degenerate clamps") {
    assert(LshForest.scaledBudget(100, 1000, 3000) == 300) // sel 1/3 -> 3x
    assert(LshForest.scaledBudget(100, 3000, 3000) == 100) // unfiltered
    assert(LshForest.scaledBudget(Int.MaxValue, 1, 1000) == Int.MaxValue)
    assert(LshForest.scaledBudget(100, 0, 1000) == 100)    // empty filter
    // sub-1e-4 selectivity saturates to EXHAUSTIVE: the expected
    // post-filter survivors at a capped budget would drop below k, and
    // scanning the few survivors exactly is the cheap plan there.
    assert(LshForest.scaledBudget(100, 1, 10000000) == Int.MaxValue)
    // exactly at the 1e-4 boundary the 1/selectivity scaling still applies
    assert(LshForest.scaledBudget(100, 1, 10000) == 100 * 10000)
  }

  test("topKFiltered: auto-scaled budget matches exact filtered kNN here") {
    // 1/3-selectivity predicate at default budget: the internal
    // 1/selectivity scaling must hold recall vs the exact filtered twin
    // without any caller-picked searchK (the pre-fix failure mode was
    // ~k/3 survivors per query).
    val pred = col("vec_id") % 3 === 0
    val approx = LshForest.topKFiltered(queries, buckets, emb, pred,
      model, k = 10)
    approx.select("vec_id").collect()
      .foreach(r => assert(r.getLong(0) % 3 == 0, "filter leaked"))
    val exact = SimSearch.exactTopK(queries, emb.filter(pred), k = 10)
    val r = SimSearch.recallAtK(approx, exact)
    assert(r >= 0.9, s"filtered recall@10 = $r with auto-scaled budget")
  }

  test("candidates: at least min(searchK, n) per query, all stored ids") {
    val cand = LshForest.candidates(queries, buckets, model, searchK = 10)
    val perQuery = cand.groupBy("query_id").count().collect()
    assert(perQuery.length == 5)
    perQuery.foreach(r => assert(r.getAs[Long]("count") >= 10))
    // results ⊆ stored ids
    val stray = cand.join(emb.select("vec_id"), Seq("vec_id"), "left_anti").count()
    assert(stray == 0)
  }
}
