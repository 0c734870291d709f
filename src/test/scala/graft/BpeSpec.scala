package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** Gates for the distributed BPE tokenizer against an independent
  * driver-side reference implementation (list-of-symbols states, explicit
  * greedy-leftmost merge passes): merge-order determinism with the total
  * (cnt DESC, l, r) tie-break, replace-semantics equivalence (the
  * double-space encoding must behave exactly like symbol-vector merging),
  * unseen-word tokenization via merge replay, wordless-doc zeroes, the
  * saturation `require`, and bounded plan depth after training. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- independent reference ------------------------------------------

  private def refWords(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq

  private def refMergePass(
      st: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < st.size) {
      if (i + 1 < st.size && st(i) == l && st(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += st(i); i += 1 }
    }
    out.result()
  }

  /** Greedy BPE trainer over symbol vectors — shares no code with the op. */
  private def refTrain(corpus: Seq[String], nMerges: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    val wf = corpus.flatMap(refWords).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    var states: Map[String, Vector[String]] =
      wf.keys.map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, st) <- states; i <- 0 until st.size - 1)
        counts((st(i), st(i + 1))) =
          counts.getOrElse((st(i), st(i + 1)), 0L) + wf(w)
      val ((l, r), c) = counts.toSeq
        .minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
      merges += ((l, r, c))
      states = states.map { case (w, st) => w -> refMergePass(st, l, r) }
    }
    (merges.result(), states)
  }

  private def refApply(
      merges: Seq[(String, String, Long)], word: String): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector :+ "</w>") {
      case (st, (l, r, _)) => refMergePass(st, l, r)
    }

  // The classic Sennrich demo corpus plus repeats so counts separate, a
  // wordless doc, and an empty doc.
  private val corpus = Seq(
    0L -> ("low low low low low lower lower newest newest newest " +
      "newest newest newest widest widest widest"),
    1L -> "the newest lower low is the widest low",
    2L -> "!!! ??? ---",
    3L -> "")
  private def docsDf = corpus.toDF("doc_id", "text")

  test("train matches the reference merge list, counts and ranks included") {
    val (merges, _) = Bpe.train(Bpe.wordFreq(docsDf), nMerges = 8)
    val expected = refTrain(corpus.map(_._2), 8)._1
    assert(merges.map(m => (m.left, m.right, m.cnt)) == expected)
    assert(merges.map(_.rank) == (1 to 8))
  }

  test("driver tier equals the distributed tier, merges and states both") {
    val wf = Bpe.wordFreq(docsDf)
    val (md, sd) = Bpe.trainDriver(wf, 8)
    val (mx, sx) = Bpe.trainDistributed(wf, 8)
    assert(md == mx, "tiers learned different merge lists")
    def states(df: org.apache.spark.sql.DataFrame) = df
      .select(col("word"), col("freq").cast("long"), col("state"))
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    assert(states(sd) == states(sx), "tiers produced different states")
    // dispatch: a tiny vocabulary takes the driver tier; forcing
    // driverTierMax = 0 takes the distributed tier — same result
    assert(Bpe.train(wf, 8)._1 == Bpe.train(wf, 8, driverTierMax = 0)._1)
  }

  test("final states equal reference symbol vectors (replace semantics)") {
    val (_, states) = Bpe.train(Bpe.wordFreq(docsDf), nMerges = 8)
    val got = states.select(col("word"), split(trim(col("state")), "  "))
      .as[(String, Seq[String])].collect().toMap
    val want = refTrain(corpus.map(_._2), 8)._2
    assert(got.keySet == want.keySet)
    for ((w, st) <- want) assert(got(w) == st, s"word '$w'")
  }

  test("greedy-leftmost on runs: 'aaa' merges to [aa, a], never [a, aa]") {
    val docs = Seq(0L -> "aaa aaa aa").toDF("doc_id", "text")
    val (merges, states) = Bpe.train(Bpe.wordFreq(docs), nMerges = 1)
    assert(merges.head.left == "a" && merges.head.right == "a")
    val st = states.filter(col("word") === "aaa")
      .select(split(trim(col("state")), "  ")).as[Seq[String]].head()
    assert(st == Seq("aa", "a", "</w>"))
  }

  test("tokenizeCounts matches reference counts; wordless docs kept at 0") {
    val (merges, _) = Bpe.train(Bpe.wordFreq(docsDf), nMerges = 8)
    val got = Bpe.tokenizeCounts(docsDf, merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val refM = refTrain(corpus.map(_._2), 8)._1
    val want = corpus.map { case (id, text) =>
      val ws = refWords(text)
      id -> (ws.size.toLong, ws.map(w => refApply(refM, w).size.toLong).sum)
    }.toMap
    assert(got == want)
    assert(got(2L) == ((0L, 0L)) && got(3L) == ((0L, 0L)))
  }

  test("unseen words tokenize by merge replay, not by vocabulary lookup") {
    val (merges, _) = Bpe.train(Bpe.wordFreq(docsDf), nMerges = 8)
    // 'lowest' and 'qqq' never occur in the training corpus.
    val other = Seq(10L -> "lowest qqq low").toDF("doc_id", "text")
    val got = Bpe.tokenizeCounts(other, merges)
      .as[(Long, Long, Long)].collect().head
    val refM = refTrain(corpus.map(_._2), 8)._1
    val wantTok = Seq("lowest", "qqq", "low")
      .map(w => refApply(refM, w).size.toLong).sum
    assert(got == ((10L, 3L, wantTok)))
  }

  test("saturation fails loudly when nMerges exceeds merge capacity") {
    val tiny = Seq(0L -> "ab ab").toDF("doc_id", "text")
    // 'ab</w>' saturates after 2 merges; the 3rd must throw, not loop.
    val e = intercept[IllegalArgumentException] {
      Bpe.train(Bpe.wordFreq(tiny), nMerges = 5)
    }
    assert(e.getMessage.contains("saturated"))
  }

  test("encode kernel equals replay states word for word — fixture corpus " +
      "and adversarial dense-alphabet corpora") {
    // the cursor-encode kernel (Bpe.encodeWord) must be SEQUENTIAL-REPLAY
    // equivalent, not merely HF-style min-rank-first: dense tiny alphabets
    // maximize the multi-path-token shapes (the same token string reachable
    // via two merge orders) where a global min-rank loop can diverge
    val (merges, states) = Bpe.train(Bpe.wordFreq(docsDf), nMerges = 8)
    val rank = Bpe.rankMap(merges)
    states.select(col("word"), split(trim(col("state")), "  "))
      .as[(String, Seq[String])].collect().foreach { case (w, st) =>
        assert(Bpe.encodeWord(w, rank).toSeq == st, s"word '$w'")
      }
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 6) {
      val alpha = if (trial % 2 == 0) "ab" else "abc"
      val words = (0 until 200)
        .map(_ => (0 to rng.nextInt(7))
          .map(_ => alpha(rng.nextInt(alpha.length))).mkString)
        .filter(_.nonEmpty)
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, (w + " ") * (1 + i % 3)) }
        .toDF("doc_id", "text")
      val (m2, s2) = Bpe.trainDriver(Bpe.wordFreq(docs), nMerges = 10)
      val r2 = Bpe.rankMap(m2)
      s2.select(col("word"), split(trim(col("state")), "  "))
        .as[(String, Seq[String])].collect().foreach { case (w, st) =>
          assert(Bpe.encodeWord(w, r2).toSeq == st,
            s"trial $trial word '$w': kernel ${Bpe.encodeWord(w, r2).toSeq} " +
              s"vs replay $st")
        }
    }
  }

  test("tokenizeKernel equals tokenizeCounts per doc; tok_md5 digests the " +
      "token sequence") {
    val (merges, _) = Bpe.train(Bpe.wordFreq(docsDf), nMerges = 8)
    val replay = Bpe.tokenizeCounts(docsDf, merges)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val kernel = Bpe.tokenizeKernel(docsDf, merges)
    val counts = kernel.select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(counts == replay,
      "per-row kernel diverged from the oracle-anchored replay path")
    val digests = kernel.select(col("doc_id"), col("tok_md5"))
      .as[(Long, String)].collect().toMap
    // wordless and empty docs digest the empty token stream identically
    assert(digests(2L) == digests(3L))
    // docs with different token sequences must not collide
    assert(digests(0L) != digests(1L))
    // the digest is the md5 of the space-joined token stream: recompute
    // doc 1's from encodeWord directly
    val rank = Bpe.rankMap(merges)
    val want = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      refWords(corpus(1)._2)
        .map(w => Bpe.encodeWord(w, rank).mkString(" ")).mkString(" "))
    assert(digests(1L) == want)
  }

  test("trained states plan depth is bounded by checkpointing") {
    val (_, states) = Bpe.train(Bpe.wordFreq(docsDf), nMerges = 8)
    // train returns a localCheckpoint, so lineage must not grow with
    // nMerges — the analyzed plan is a handful of nodes, not 8 chained
    // replaces over the full aggregation tree.
    val nNodes = states.queryExecution.analyzed.collectWithSubqueries {
      case p => p
    }.size
    assert(nNodes <= 4, s"plan has $nNodes nodes — lineage not cut")
  }
}
