package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.engine.{EngineConfig, ZebraEngine}

/** Engine lifecycle round-trip (SURVEY.md §2.2 D1–D10): create → insert →
  * query → dedup → remove → incremental index add → clear → reopen. */
class ZebraEngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val enginePath = "/tmp/graft_test_engine"

  private lazy val emb = Tables.embeddings(spark, SparkTestBase.sf0001)
    .select(format_string("v%06d", col("vec_id")).as("id"), col("embedding"))
    .cache()

  private def freshEngine(): ZebraEngine = {
    ZebraEngine.destroy(enginePath)
    ZebraEngine.create(spark, enginePath, EngineConfig(dim = 64))
  }

  test("lifecycle round-trip: create, insert, query, dedup, remove, clear") {
    val eng = freshEngine()
    assert(eng.isEmpty)

    eng.insertRecords(emb)
    assert(eng.count() == 500)

    // exact query: each stored vector's top-1 is itself at distance 0
    val queries = emb.limit(3)
      .select(col("id").as("query_id"), col("embedding"))
    val top1 = eng.queryVectors(queries, k = 1).collect()
    assert(top1.length == 3)
    top1.foreach { r =>
      assert(r.getAs[String]("query_id") == r.getAs[String]("id"))
      assert(r.getAs[Double]("dist") == 0.0)
    }

    // dedup: re-insert the same 500 embeddings under new ids; first wins
    eng.insertRecords(emb.select(concat(lit("dup_"), col("id")).as("id"), col("embedding")))
    assert(eng.count() == 1000)
    eng.deduplicate()
    assert(eng.count() == 500)
    assert(eng.vectors.filter(col("id").startsWith("dup_")).count() == 0,
      "first-inserted must win")

    // remove
    eng.remove(emb.limit(10).select("id"))
    assert(eng.count() == 490)

    // clear
    eng.clear()
    assert(eng.isEmpty)
  }

  test("metadata round-trip: open reads back the created config") {
    freshEngine()
    val reopened = ZebraEngine.open(spark, enginePath)
    assert(reopened.config == EngineConfig(dim = 64))
    // openOrCreate on an existing engine opens it
    val viaOpenOrCreate = ZebraEngine.openOrCreate(
      spark, enginePath, EngineConfig(dim = 1))
    assert(viaOpenOrCreate.config.dim == 64)
    // create on an existing engine refuses
    intercept[IllegalStateException] {
      ZebraEngine.create(spark, enginePath, EngineConfig(dim = 64))
    }
  }

  test("indexed query + incremental add (I7): new batch routed through existing trees") {
    val eng = freshEngine()
    eng.insertRecords(emb.limit(400))
    eng.refreshIndex()

    // indexed self-retrieval
    val queries = emb.limit(3).select(col("id").as("query_id"), col("embedding"))
    val top1 = eng.queryVectors(queries, k = 1).collect()
    top1.foreach(r => assert(r.getAs[String]("query_id") == r.getAs[String]("id")))

    // incremental insert appends to the EXISTING index (no rebuild) and the
    // new vectors are immediately retrievable through the indexed path
    val rest = emb.exceptAll(emb.limit(400))
    eng.insertRecords(rest)
    assert(eng.count() == 500)
    val newQ = rest.limit(2).select(col("id").as("query_id"), col("embedding"))
    val hits = eng.queryVectors(newQ, k = 1).collect()
    assert(hits.nonEmpty)
    hits.foreach { r =>
      assert(r.getAs[String]("query_id") == r.getAs[String]("id"))
      assert(r.getAs[Double]("dist") == 0.0)
    }

    // remove keeps the index consistent: removed ids never surface
    val victim = emb.limit(1)
    eng.remove(victim.select("id"))
    val vQ = victim.select(col("id").as("query_id"), col("embedding"))
    val after = eng.queryVectors(vQ, k = 5).collect()
    val victimId = victim.head().getString(0)
    assert(after.forall(_.getAs[String]("id") != victimId))
  }

  test("I8 compaction: overflowing leaves re-split in place, no global rebuild") {
    val eng = freshEngine()
    eng.insertRecords(emb.limit(100))
    eng.refreshIndex()
    assert(!eng.compactIndexIfNeeded(), "fresh index must not need compaction")
    val rowsBefore = spark.read.parquet(s"$enginePath/index").count()
    // route 400 more vectors through the existing 100-vector trees: leaves
    // overflow far past max_node_size
    eng.insertRecords(emb.exceptAll(emb.limit(100)))
    val rowsAfterInsert = spark.read.parquet(s"$enginePath/index").count()
    assert(rowsAfterInsert > rowsBefore)
    assert(eng.compactIndexIfNeeded(factor = 4.0), "overflowed index must compact")
    // leaf-local proof #1: the bound holds again on every REACHABLE leaf
    val maxLeaf = eng.liveIndex
      .groupBy("tree_id", "leaf_id").count().agg(max("count")).head().getLong(0)
    assert(maxLeaf <= 4 * eng.config.maxNodeSize,
      s"post-compaction max leaf $maxLeaf")
    // leaf-local proof #2: compaction APPENDED re-routed members instead of
    // rewriting the table — a global rebuild would leave exactly
    // count·numTrees rows; leaf-local leaves the stale rows in place.
    val rowsAfterCompact = spark.read.parquet(s"$enginePath/index").count()
    assert(rowsAfterCompact > rowsAfterInsert, "expected appended split rows")
    assert(rowsAfterCompact > eng.count() * eng.config.numTrees)
    assert(!eng.compactIndexIfNeeded(), "leaf bound must hold after one pass")
    // recall through the compacted index: every query's top-1 is itself
    val queries = emb.limit(5).select(col("id").as("query_id"), col("embedding"))
    val top1 = eng.queryVectors(queries, k = 1).collect()
    assert(top1.length == 5)
    top1.foreach { r =>
      assert(r.getAs[String]("query_id") == r.getAs[String]("id"))
      assert(r.getAs[Double]("dist") == 0.0)
    }
  }

  test("vacuumIndex reclaims split dead weight; results identical, no retrain") {
    val eng = freshEngine()
    eng.insertRecords(emb.limit(100))
    eng.refreshIndex()
    eng.insertRecords(emb.exceptAll(emb.limit(100)))
    assert(eng.compactIndexIfNeeded(factor = 4.0), "setup: must compact")
    val stale = spark.read.parquet(s"$enginePath/index").count() -
      eng.liveIndex.count()
    assert(stale > 0, "setup: compaction must strand stale rows")
    val queries = emb.limit(8).select(col("id").as("query_id"), col("embedding"))
    val before = eng.queryVectors(queries, k = 5).collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[String]("id"),
        r.getAs[Double]("dist"))).toSet
    val modelStampBefore =
      new java.io.File(s"$enginePath/index_model.bin").lastModified()
    assert(eng.vacuumIndex() == stale, "vacuum must reclaim exactly the dead rows")
    // stale/live back to 0; model untouched; routing (results) identical
    val total = spark.read.parquet(s"$enginePath/index").count()
    assert(total == eng.liveIndex.count(), "post-vacuum index must be all-live")
    assert(new java.io.File(s"$enginePath/index_model.bin").lastModified() ==
      modelStampBefore, "vacuum must not retrain or rewrite the model")
    val after = eng.queryVectors(queries, k = 5).collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[String]("id"),
        r.getAs[Double]("dist"))).toSet
    assert(after == before, "vacuum changed query results")
    assert(eng.vacuumIndex() == 0L, "second vacuum must be a no-op")
  }

  test("filtered query: predicate + kNN equals exact kNN of the filtered set") {
    val eng = freshEngine()
    eng.insertRecords(emb)
    eng.refreshIndex()
    val queries = emb.limit(4)
      .select(col("id").as("query_id"), col("embedding"))
    val pred = col("id") > "v000250" // string ids sort lexicographically
    // exhaustive budget: the indexed filtered path must equal exact
    // filtered kNN under ANY predicate
    val got = eng.queryVectors(queries, k = 5,
      searchK = Some(Int.MaxValue), where = Some(pred))
      .orderBy("query_id", "id").collect().toSeq
    val want = graft.ops.SimSearch.exactTopK(
      queries, emb.filter(pred), k = 5, vecId = "id")
      .orderBy("query_id", "id").collect().toSeq
    assert(got == want)
    // every hit satisfies the predicate
    got.foreach(r => assert(r.getAs[String]("id") > "v000250"))
  }
}
