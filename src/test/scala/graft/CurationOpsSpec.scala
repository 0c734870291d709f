package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation

/** Structural gates for the round-4 curation operators: chunking must
  * tile the token stream exactly (coverage, overlap, ordering), and
  * temperature mixing must obey its rate/determinism contract. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("chunkDocs tiles the token stream: coverage, stride, bounded size") {
    import spark.implicits._
    val rng = new Random(17)
    val docs = (0 until 40).map { i =>
      val n = rng.nextInt(120) // includes 0-token and sub-chunk docs
      (i.toLong, Seq.fill(n)(s"w${rng.nextInt(50)}").mkString(" "))
    }.toDF("doc_id", "text")
    val chunkSize = 32
    val stride = 24
    val out = Curation.chunkDocs(docs, chunkSize, stride)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val n = r.getString(1).split(" ").count(_.nonEmpty)
      val chunks = out(id).sortBy(_._2)
      // chunk ids are 0..k-1; starts advance by stride
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong))
      chunks.foreach { case (_, cid, start, nTok) =>
        assert(start == cid * stride)
        assert(nTok <= chunkSize)
        assert(nTok == math.min(chunkSize, math.max(0L, n - start)))
      }
      // the last chunk reaches the end of the stream; no chunk past it
      val (_, _, lastStart, lastN) = chunks.last
      assert(lastStart + lastN == math.max(n, 0))
      if (chunks.length > 1)
        assert(lastStart < n, "empty trailing chunk")
    }
  }

  test("temperatureSample: smallest stratum intact, rates honored, deterministic") {
    import spark.implicits._
    val docs = ((0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 450).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val kept = Curation.temperatureSample(docs, "source", tau = 0.5)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest stratum rate = 1 - <=1/16M of docs dropped; here: none
    assert(bySrc("small") == 50)
    // big stratum rate = sqrt(50/400) ~ 0.354; binomial(400, .354) is
    // within +-5 sigma of the mean for any seed — md5 is effectively uniform
    val exp = 400 * math.sqrt(50.0 / 400)
    val sigma = math.sqrt(400 * 0.354 * (1 - 0.354))
    assert(math.abs(bySrc("big") - exp) < 5 * sigma,
      s"kept ${bySrc("big")} vs expected ~$exp")
    // deterministic: second run keeps the identical set
    val again = Curation.temperatureSample(docs, "source", tau = 0.5)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
    // tau = 1 keeps everything
    assert(Curation.temperatureSample(docs, "source", tau = 1.0).count() == 450)
  }

  test("unimaxAlloc: waterfill invariants on a known case and the fixture") {
    import spark.implicits._
    // known case: caps 10/20/70, budget 60 -> a capped at 10, b capped at
    // 20 (20*2+10=50<=60), c takes the rest (30)
    val docs = (Seq.fill(1)(("a", 10L)) ++ Seq.fill(2)(("b", 10L)) ++
      Seq.fill(7)(("c", 10L))).toDF("lang", "n_tok")
    val out = Curation.unimaxAlloc(docs, "lang", "n_tok", budget = 60L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("alloc_tokens"), r.getAs[Long]("rate_bp"))).toMap
    assert(out("a") == (10L, 10000L) && out("b") == (20L, 10000L)
      && out("c") == (30L, 4285L), s"waterfill wrong: $out")
    // epoch cap 2 doubles capacity: a caps at 20, b/c share the rest
    val out2 = Curation.unimaxAlloc(docs, "lang", "n_tok",
      budget = 60L, epochs = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc_tokens")).toMap
    assert(out2("a") == 20L && out2("b") == 20L && out2("c") == 20L, s"$out2")
    // fixture: sum(alloc) == budget exactly; alloc never exceeds cap;
    // uncapped allocations uniform within 1
    val fx = core.Tables.documents(spark, SparkTestBase.sf0001)
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.expr(
          "cast(size(split(lower(text), ' ')) as long)").as("n_tok"))
    val total = fx.agg(org.apache.spark.sql.functions.sum("n_tok"))
      .collect()(0).getLong(0)
    val b = total * 2 / 3
    val rows = Curation.unimaxAlloc(fx, "lang", "n_tok", budget = b).collect()
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum == b,
      "allocation must spend the budget exactly when it fits under capacity")
    rows.foreach(r => assert(
      r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("avail_tokens")))
    val un = rows.filter(_.getAs[Long]("rate_bp") < 10000L)
      .map(_.getAs[Long]("alloc_tokens"))
    if (un.nonEmpty)
      assert(un.max - un.min <= 1L, s"uncapped allocs not uniform: ${un.toSeq}")
  }

  test("curriculumOrder: dense permutation, shortest buckets first, deterministic") {
    val docs = core.Tables.documents(spark, SparkTestBase.sf0001)
    val a = Curation.curriculumOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // positions are a dense 0..n-1 permutation
    assert(a.map(_._4).sorted.toSeq == (0L until a.length.toLong))
    // positions respect bucket order: sorting by position sorts buckets
    val byPos = a.sortBy(_._4)
    assert(byPos.map(_._3).toSeq == byPos.map(_._3).sorted.toSeq,
      "a longer-bucket doc ordered before a shorter-bucket one")
    // bit-identical across executions (what a resumable run relies on)
    val b = Curation.curriculumOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }

  test("StreamFeed.collectCapped enforces the gate-feed cap loudly") {
    import spark.implicits._
    val small = (0 until 10).map(_.toLong).toDS()
    assert(graft.catalog.StreamFeed
      .collectCapped(small, "test feed", max = 10).length == 10)
    val e = intercept[IllegalArgumentException] {
      graft.catalog.StreamFeed.collectCapped(small, "test feed", max = 9)
    }
    assert(e.getMessage.contains("exec-gate feed exceeds 9 rows"))
  }

  test("Bounded.frame enforces the bounded-window contract loudly") {
    import spark.implicits._
    val small = (0 until 8).map(i => (i.toLong, i.toLong)).toDF("k", "v")
    // within bound: passes through with identical rows
    val ok = graft.core.Bounded.frame(small, 8, "test frame")
    assert(ok.collect().length == 8)
    // over bound: a corpus-sized frame reaching an unpartitioned window
    // must fail loudly, never silently single-partition-sort
    val e = intercept[IllegalArgumentException] {
      graft.core.Bounded.frame(small, 7, "test frame")
    }
    assert(e.getMessage.contains("bounded-frame contract violated"))
  }
}
