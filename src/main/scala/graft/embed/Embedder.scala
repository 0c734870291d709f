package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch embedding transform — the engine-facing analogue of the reference's
  * `DatabaseEmbeddingModel` trait (reference: src/model/core.rs:12-37):
  * `embed_documents: &[Bytes] → Vec<Embedding<N>>`. Users plug their own
  * model by implementing one method (the reference's stated extension point
  * — README "external implementations can be supplied"). */
trait Embedder extends Serializable {
  def dim: Int
  /** Add `outCol: ARRAY<FLOAT>` (length `dim`, unit-norm) computed from
    * `inCol` (BINARY document bytes or STRING text). */
  def embed(df: DataFrame, inCol: String, outCol: String): DataFrame
}

/** E2 stand-in for BGE-small-en-v1.5 (reference: src/model/text.rs:13-31):
  * a deterministic hashing n-gram embedder — 384-d like the reference's
  * text model (model/core.rs:6), unit-norm, seeded, zero model weights to
  * download (the JVM has no fastembed; documented deviation, SURVEY.md §2.4).
  *
  * Features: lowercased word unigrams + intra-word char trigrams, each
  * feature-hashed (MurmurHash3) to a signed bucket; the accumulated vector
  * is L2-normalized. Identical bytes → identical vector (the property the
  * engine contract needs: self-retrieval at distance 0); shared vocabulary
  * → nearby vectors. Invalid UTF-8 decodes lossily rather than dropping the
  * document (reference silently drops, text.rs:22 — deviation noted).
  *
  * Runs as one codegen-breaking but shuffle-free UDF projection; the model
  * "load" is free, so there is no per-partition init cost to amortize. */
final case class HashingTextEmbedder(dim: Int = 384, seed: Int = 42)
    extends Embedder {

  def embedText(text: String): Array[Float] = {
    val acc = new Array[Double](dim)
    val tokens = text.toLowerCase.split("[^\\p{L}\\p{Nd}]+").filter(_.nonEmpty)
    def add(feature: String): Unit = {
      val h = scala.util.hashing.MurmurHash3.stringHash(feature, seed)
      val bucket = math.floorMod(h >>> 1, dim)
      val sign = if ((h & 1) == 0) 1.0 else -1.0
      acc(bucket) += sign
    }
    tokens.foreach { t =>
      add(t)
      var i = 0
      while (i + 3 <= t.length) { add("#" + t.substring(i, i + 3)); i += 1 }
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) { out(i) = (acc(i) * inv).toFloat; i += 1 }
    out
  }

  override def embed(df: DataFrame, inCol: String, outCol: String): DataFrame = {
    val embedUdf = udf { (text: String) =>
      if (text == null) new Array[Float](dim) else embedText(text)
    }
    df.withColumn(outCol, embedUdf(col(inCol).cast("string")))
  }
}

/** Oracle-twin hashing embedder: INTEGER token-count vectors whose buckets
  * and signs derive from md5 (bucket = first 16 digest bits mod `dim`,
  * sign = lowest bit of the 5th hex nibble), with space-split lowercase
  * tokens — every quantity is reproducible in ANSI SQL from the hex
  * digest, and L2² between count vectors is integer-exact in IEEE
  * doubles. Exists so the embed → kNN path has a DuckDB-hash-checkable
  * twin (`text_knn_exact`) alongside the rows-only 384-d production
  * embedder above (MurmurHash is not SQL-expressible). Not unit-norm by
  * design: normalization would reintroduce float quotients. */
final case class Md5CountEmbedder(dim: Int = 32) extends Embedder {

  def embedText(text: String): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](dim)
    text.toLowerCase.split(" ").filter(_.nonEmpty).foreach { t =>
      val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val v16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff) // first 4 hex chars
      val sign = if (((d(2) >> 4) & 1) == 1) -1 else 1 // 5th nibble's low bit
      acc(v16 % dim) += sign
    }
    acc.map(_.toFloat) // counts are far below 2^24: exact as Float
  }

  override def embed(df: DataFrame, inCol: String, outCol: String): DataFrame = {
    val embedUdf = udf { (text: String) =>
      if (text == null) new Array[Float](dim) else embedText(text)
    }
    df.withColumn(outCol, embedUdf(col(inCol).cast("string")))
  }
}
