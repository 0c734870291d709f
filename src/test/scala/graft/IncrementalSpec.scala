package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Incremental, SemiFilter}

/** Gates for the incremental-maintenance operators: the rollup refresh
  * must equal a from-scratch recompute for ANY base/delta partition of the
  * input (the mergeable-state algebra), scd2 must collapse no-op versions
  * and close intervals correctly, and the Bloom pre-filter must be
  * invisible in the join result. */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private val dir = SparkTestBase.sf0001

  test("refreshRollup == full recompute on every tested split") {
    val li = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
      col("l_orderkey"),
      expr("cast(round(l_quantity * 100) as bigint)").as("qty_c"))
    val full = li.groupBy("rf", "ls")
      .agg(count(lit(1)).as("n"), sum("qty_c").as("sum_qty_c"))
      .orderBy("rf", "ls").collect().toSeq
    for (m <- Seq(2, 37)) {
      val baseAgg = li.filter(col("l_orderkey") % m =!= 0)
        .groupBy("rf", "ls")
        .agg(count(lit(1)).as("n"), sum("qty_c").as("sum_qty_c"))
      val delta = li.filter(col("l_orderkey") % m === 0)
      val got = Incremental.refreshRollup(baseAgg, delta,
        keys = Seq("rf", "ls"), sumCols = Seq("qty_c"))
        .orderBy("rf", "ls").collect().toSeq
      assert(got == full, s"split mod $m diverged from full recompute")
    }
  }

  test("refreshRollup: delta introducing a NEW group appears in the result") {
    val baseAgg = Seq(("a", 2L, 10L)).toDF("k", "n", "sum_v")
    val delta = Seq(("a", 5L), ("b", 7L)).toDF("k", "v")
    val got = Incremental.refreshRollup(baseAgg, delta, Seq("k"), Seq("v"))
      .orderBy("k").collect().toSeq
    assert(got == Seq(Row("a", 3L, 15L), Row("b", 1L, 7L)))
  }

  test("scd2: collapses no-op versions, closes intervals, flags current") {
    val log = Seq(
      // key 1: A -> A (no-op, collapses) -> B
      (1L, 0, "A", 10.0), (1L, 1, "A", 10.0), (1L, 2, "B", 20.0),
      // key 2: single version
      (2L, 0, "X", 1.0),
      // key 3: change then revert — the revert IS a change (A,B,A = 3 vers)
      (3L, 0, "A", 1.0), (3L, 1, "B", 1.0), (3L, 2, "A", 1.0))
      .toDF("k", "seq", "st", "price")
    val got = Incremental.scd2(log, "k", "seq", Seq("st", "price"))
      .orderBy("k", "ver").collect().toSeq
    assert(got == Seq(
      Row(1L, 1L, 0, 2, false, "A", 10.0),
      Row(1L, 2L, 2, null, true, "B", 20.0),
      Row(2L, 1L, 0, null, true, "X", 1.0),
      Row(3L, 1L, 0, 1, false, "A", 1.0),
      Row(3L, 2L, 1, 2, false, "B", 1.0),
      Row(3L, 3L, 2, null, true, "A", 1.0)))
  }

  test("bloom prefilter join == plain join (filter is lossless)") {
    val fact = Tables.lineitem(spark, dir).select(col("l_suppkey"),
      expr("cast(round(l_extendedprice * 100) as bigint)").as("price_c"))
    val dim = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") > 0).select(col("s_suppkey"), col("s_name"))
    val got = SemiFilter.bloomPrefilterJoin(fact, dim,
      "l_suppkey", "s_suppkey", expectedKeys = math.max(1L, dim.count()))
      .groupBy("s_name").agg(count(lit(1)).as("n"), sum("price_c").as("s"))
      .orderBy("s_name").collect().toSeq
    val want = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"), sum("price_c").as("s"))
      .orderBy("s_name").collect().toSeq
    assert(got == want)
  }
}
