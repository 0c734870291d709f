package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.embed.{
  BatchEmbedBackend, BatchingEmbedder, HashingTextEmbedder,
  OnnxEmbedder, OnnxSessionBackend, WordPiece}

/** [[graft.embed.OnnxEmbedder]] — the learned-model local-file path. The
  * ORT call itself is dormant here (no runtime jar, zero egress); every
  * Spark-side piece is exercised: WordPiece tokenization, CLS/mean
  * pooling + L2 normalization, partition-batched inference plumbing,
  * null handling, and the fallback decision. */
class OnnxEmbedderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val vocab = WordPiece.fromLines(Iterator(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",            // 0-3
    "un", "##aff", "##able", "hello", "world",     // 4-8
    "!", "##ld", "wor"))                           // 9-11

  test("WordPiece: greedy longest-match, ## continuations, UNK fallback, " +
      "punctuation isolation, case folding") {
    assert(vocab.preSplit("Hello, world!") ==
      Seq("hello", ",", "world", "!"))
    // longest-match-first: "world" wins over "wor"+"##ld"
    assert(vocab.wordPieces("world") == Seq(8))
    assert(vocab.wordPieces("unaffable") == Seq(4, 5, 6))
    // no decomposition at any suffix → the WHOLE word is UNK
    assert(vocab.wordPieces("xyz") == Seq(1))
    assert(vocab.wordPieces("unxyz") == Seq(1))
    // BERT's max_input_chars_per_word: an unbroken 500 KB run (base64
    // data-URI in a crawl page) is [UNK] outright, not an O(len²) probe
    val t0 = System.nanoTime()
    assert(vocab.wordPieces("un" * 250000) == Seq(1))
    assert((System.nanoTime() - t0) / 1e9 < 1.0,
      "oversized word took quadratic time")
  }

  test("WordPiece encode: [CLS] body [SEP], attention mask, pad, truncate") {
    val (ids, mask) = vocab.encode("hello world", 8)
    assert(ids.toSeq == Seq(2L, 7L, 8L, 3L, 0L, 0L, 0L, 0L))
    assert(mask.toSeq == Seq(1L, 1L, 1L, 1L, 0L, 0L, 0L, 0L))
    // truncation keeps maxLen-2 body pieces
    val (ids2, mask2) = vocab.encode("hello world hello world hello", 4)
    assert(ids2.toSeq == Seq(2L, 7L, 8L, 3L) && mask2.forall(_ == 1L))
  }

  /** Fake session: hidden state of token t = (ids(t), t, 1, 0, …) so
    * pooling is checkable by hand; dim 4. */
  private class FakeSession(pooling: String)
      extends OnnxSessionBackend("/nonexistent.onnx", "/nonexistent.txt",
        dim = 4, maxLen = 6, pooling = pooling) {
    @transient private lazy val tok = vocab
    override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      // re-tokenize with the in-memory vocab (the file-based tokenizer
      // would try to read /nonexistent.txt)
      val encoded = texts.map(t => tok.encode(t, 6))
      val hidden = encoded.map { case (ids, _) =>
        ids.flatMap(id => Array(id.toFloat, 2f, 1f, 0f))
      }.toArray
      hidden.toIndexedSeq.zip(encoded.map(_._2))
        .map { case (h, m) => poolAndNormalize(h, m) }
    }
  }

  test("pooling + normalization: CLS takes position 0, mean respects the " +
      "attention mask, both unit-norm") {
    val cls = new FakeSession("cls")
    val out = cls.embedBatch(Seq("hello world")).head
    // CLS hidden = (clsId=2, 2, 1, 0) → normalized
    val n = math.sqrt(2.0 * 2 + 2 * 2 + 1).toFloat
    assert(out.toSeq == Seq(2f / n, 2f / n, 1f / n, 0f))
    val mean = new FakeSession("mean")
    val m = mean.embedBatch(Seq("hello world")).head
    // masked tokens: ids 2,7,8,3 → mean id = 5.0; dims (5, 2, 1, 0)
    val nm = math.sqrt(5.0 * 5 + 2 * 2 + 1)
    assert(math.abs(m(0) - 5.0 / nm) < 1e-6 &&
      math.abs(m(1) - 2.0 / nm) < 1e-6 && m(3) == 0f)
    // unit norm both ways
    def norm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm(out) - 1) < 1e-6 && math.abs(norm(m) - 1) < 1e-6)
  }

  test("BatchingEmbedder: batch cap respected, nulls become zero vectors " +
      "without occupying batch slots, schema/values preserved") {
    import spark.implicits._
    val rows = (0 until 70).map(i =>
      (i.toLong, if (i % 7 == 3) null else "x" * (i % 5 + 1)))
    val df = rows.toDF("id", "text").repartition(2)
    RecordingBackend.batches.clear()
    val out = BatchingEmbedder(new RecordingBackend, batchSize = 16)
      .embed(df, "text", "emb")
    val got = out.select("id", "text", "emb").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2))).sortBy(_._1)
    assert(got.length == 70 && out.columns.toSeq == Seq("id", "text", "emb"))
    got.foreach { case (id, text, emb) =>
      assert(emb.length == 4)
      if (text == null) assert(emb.forall(_ == 0f), s"null row $id not zero")
      else assert(emb.head == text.length.toFloat, s"row $id wrong value")
    }
    // no backend call saw more than batchSize inputs, and null slots
    // were excluded from the counts
    val sizes = RecordingBackend.batches
      .toArray(Array.empty[Integer]).map(_.toInt)
    assert(sizes.forall(_ <= 16), s"oversized batch: ${sizes.toSeq}")
    assert(sizes.sum == rows.count(_._2 != null), s"null occupied a slot")
  }

  test("determinism: two runs produce identical vectors") {
    import spark.implicits._
    val df = (0 until 20).map(i => (i.toLong, s"text number $i")).toDF("id", "text")
    def run() = BatchingEmbedder(new RecordingBackend, 8)
      .embed(df, "text", "emb")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](2))).sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("orFallback: no runtime/model/vocab on this box → the hashing " +
      "fallback is returned (and logged), not a broken ONNX path") {
    val fb = HashingTextEmbedder()
    val got = OnnxEmbedder.orFallback(
      "/nonexistent/model.onnx", "/nonexistent/vocab.txt", 384, fb)
    assert(got eq fb)
    assert(!OnnxEmbedder.runtimePresent,
      "this environment unexpectedly has onnxruntime — orFallback's " +
        "negative path is no longer what this test exercises")
  }
}

/** Top-level (no outer-class capture — the closure must serialize) fake
  * backend: embeds text t as (len(t), 1, 0, 0) and records every batch
  * size in the JVM-global companion (executor-side copies of the instance
  * would lose instance state; local-mode tasks share the JVM, so the
  * static queue sees them). */
private class RecordingBackend extends BatchEmbedBackend {
  val dim = 4
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    RecordingBackend.batches.add(texts.length)
    texts.map(t => Array(t.length.toFloat, 1f, 0f, 0f))
  }
}

private object RecordingBackend {
  val batches = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
}
