package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.DedupQueries
import graft.core.Tables

/** Near-dup dedup quality gates: the banded MinHash pipeline must find the
  * fixture's planted near-duplicates (high recall on strong dups) without
  * inventing weak ones (perfect precision at the Jaccard threshold, since
  * every candidate is re-verified with the true n-gram Jaccard). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sf0001

  /** Ground truth: all-pairs 3-gram Jaccard, computed locally (test only —
    * the pipeline under test never does all-pairs). */
  private lazy val truth: Map[(Long, Long), Double] = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val w = t.toLowerCase.split(" ")
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    (for {
      i <- sh.indices.iterator
      j <- (i + 1) until sh.length
      a = sh(i); b = sh(j)
      inter = (a._2 & b._2).size
      if inter > 0
      jac = inter.toDouble / (a._2.size + b._2.size - inter)
    } yield (math.min(a._1, b._1), math.max(a._1, b._1)) -> jac).toMap
  }

  test("minhash pairs: perfect precision (every reported pair >= threshold truly)") {
    val found = DedupQueries.minhashPairs.run(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(found.nonEmpty, "fixture has planted near-dups; none found")
    found.foreach { case ((a, b), jac) =>
      val t = truth.getOrElse((a, b), 0.0)
      assert(math.abs(t - jac) < 1e-3, s"pair ($a,$b): reported $jac, truth $t")
      assert(t >= 0.8)
    }
  }

  test("minhash pairs: high recall on strong near-dups (truth jaccard >= 0.9)") {
    val found = DedupQueries.minhashPairs.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = truth.filter(_._2 >= 0.9).keySet
    assert(strong.nonEmpty, "fixture should contain strong near-dups")
    val recall = strong.count(found).toDouble / strong.size
    assert(recall >= 0.9, s"recall on strong dups = $recall (${strong.size} strong)")
  }

  test("fast (affine) minhash pairs: perfect precision and strong recall") {
    val found = DedupQueries.minhashPairsFast.run(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(found.nonEmpty, "fixture has planted near-dups; none found")
    found.foreach { case ((a, b), jac) =>
      val t = truth.getOrElse((a, b), 0.0)
      assert(math.abs(t - jac) < 1e-3, s"pair ($a,$b): reported $jac, truth $t")
      assert(t >= 0.8)
    }
    val pairs = found.map(_._1).toSet
    val strong = truth.filter(_._2 >= 0.9).keySet
    val recall = strong.count(pairs).toDouble / strong.size
    assert(recall >= 0.9, s"affine-family recall on strong dups = $recall")
  }

  test("containment prefix filter is EXACT: equals brute-force ordered pairs") {
    import spark.implicits._
    // dense tiny corpus: shared prefixes force real containment relations
    val docs = (0 until 40).map { i =>
      val words = (0 to 6 + i % 5).map(j => s"w${(i * 7 + j * 3) % 11}")
      (i.toLong, words.mkString(" "))
    } ++ Seq(
      (100L, "w0 w3 w6 w9 w1"), // a strict prefix of nothing — organic checks
      (101L, "w0 w3 w6"))       // contained in 100 (its 1 shingle ∈ 100's)
    val df = docs.toDF("doc_id", "text")
    val got = graft.catalog.DedupQueries.containmentPairs(df)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // brute force over distinct 3-gram shingle sets
    def sh(t: String): Set[String] = {
      val w = t.toLowerCase.split(" ", -1)
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }
    val sets = docs.map { case (id, t) => id -> sh(t) }.toMap
    val want = (for {
      (a, sa) <- sets.iterator
      (b, sb) <- sets
      if a != b
      inter = (sa & sb).size
      if 10 * inter >= 9 * sa.size
    } yield (a, b) -> math.rint(inter.toDouble / sa.size * 10000) / 10000).toMap
    assert(got == want)
    assert(want.contains((101L, 100L)), "sanity: the planted containment exists")
  }

  test("containment keep: every planted truncated twin drops") {
    val kept = DedupQueries.containmentKeep.run(spark, dir).collect()
      .map(_.getLong(0))
    assert(kept.nonEmpty)
    // a truncated twin is contained in its original by construction; under
    // mutual containment (degenerate equal shingle sets) the smaller id —
    // the original — survives. Either way no twin may survive.
    assert(kept.forall(_ < 100000), "a planted contained twin survived")
  }

  test("affine signature: content-functional, order-sensitive, in range") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"), // case-folds equal
      (3L, "dog lazy the over jumps fox brown quick the"), // same words, reordered
      (4L, "an entirely different document about ducks today")
    ).toDF("doc_id", "text")
    val sigs = docs
      .withColumn("sig", graft.ops.Minhash.signatureAffineUdf(16)(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(sigs(1) == sigs(2), "case-folded duplicates must share the signature")
    assert(sigs(1) != sigs(3), "3-gram shingles are order-sensitive")
    assert(sigs(1) != sigs(4))
    sigs.values.foreach(_.foreach(v =>
      assert(v >= 0 && v < graft.ops.Minhash.AffineP, s"entry $v out of field")))
  }

  test("md5 signature kernel: byte-identical to the reference form") {
    // The r15-optimized kernel (shared prefix bytes, duplicate-shingle
    // skip, unsigned-byte minima) pinned against a direct transcription
    // of the original definition: sig[j-1] = min over ALL shingles of
    // hex(md5((j + "|" + shingle).utf8)) compared as hex STRINGS.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def reference(text: String, nPerms: Int): Seq[String] = {
      val w = Option(text).getOrElse("").toLowerCase.split(" ", -1)
      val shingles: Iterator[String] =
        if (w.length >= 3) w.sliding(3).map(_.mkString(" "))
        else Iterator(w.mkString(" "))
      val mins = new Array[String](nPerms)
      val md = java.security.MessageDigest.getInstance("MD5")
      shingles.foreach { sh =>
        (1 to nPerms).foreach { j =>
          md.reset()
          val hex = md.digest((j.toString + "|" + sh).getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          if (mins(j - 1) == null || hex < mins(j - 1)) mins(j - 1) = hex
        }
      }
      mins.toSeq
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "dup dup dup dup dup dup dup dup", // duplicate shingles exercised
      "two words", // under 3 words: one whole-text shingle
      "one", "", "a  b   c", // empty + repeated-separator empties
      "Mixed CASE Tokens repeat repeat repeat Mixed CASE Tokens")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = docs
      .withColumn("sig", graft.ops.Minhash.signatureUdf(16)(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == reference(t, 16), s"signature drift for '$t'")
    }
  }

  test("binary signature wire format: injective re-encoding of the string kernels") {
    // The r16 streaming wire/state format (flat binary cell) pinned
    // against the string kernels it re-encodes: md5 entries must unpack
    // to the exact hex signature, affine entries to the exact BIGINT
    // signature, and the binary bucket keys must induce the SAME
    // partition of (doc, band) as the string-family keys — the property
    // the streaming candidate structure (and the gates' oracle hashes)
    // rides on.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog zzztwin",
      "dup dup dup dup dup dup dup dup",
      "two words", "one", "", "a  b   c",
      "Mixed CASE Tokens repeat repeat repeat Mixed CASE Tokens")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = graft.ops.Minhash
    val both = docs
      .withColumn("hexsig", m.signatureUdf(16)(col("text")))
      .withColumn("binsig", m.signatureBinaryUdf(16)(col("text")))
      .withColumn("affsig", m.signatureAffineUdf(16)(col("text")))
      .withColumn("affbin", m.signatureAffineBinaryUdf(16)(col("text")))
      .withColumn("hexbands", m.bandHashes(col("hexsig"), 16, 4))
      .withColumn("binbuckets", m.bucketKeysBinary(col("binsig"), 16, 4, 16))
      .withColumn("affbands", m.bandKeysAffine(col("affsig"), 16, 4))
      .withColumn("affbuckets", m.bucketKeysBinary(col("affbin"), 16, 4, 4))
      .collect()
    both.foreach { r =>
      val hexsig = r.getSeq[String](r.fieldIndex("hexsig"))
      val binsig = r.getAs[Array[Byte]]("binsig")
      assert(binsig.length == 16 * 16)
      val unpacked = binsig.grouped(16)
        .map(_.map(b => f"$b%02x").mkString).toSeq
      assert(unpacked == hexsig, s"md5 binary drift for doc ${r.getLong(0)}")
      val affsig = r.getSeq[Long](r.fieldIndex("affsig"))
      val affbin = r.getAs[Array[Byte]]("affbin")
      assert(affbin.length == 16 * 4)
      val affUnpacked = affbin.grouped(4).map(g =>
        g.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))).toSeq
      assert(affUnpacked == affsig, s"affine binary drift for doc ${r.getLong(0)}")
    }
    // bucket-key partition equivalence: for every pair of docs and every
    // band, string keys collide iff binary keys collide
    def keyPairs(rows: Array[org.apache.spark.sql.Row],
        strCol: String, binCol: String): Unit =
      for {
        a <- rows; b <- rows if a.getLong(0) < b.getLong(0)
        band <- 0 until 4
      } {
        val sEq = a.getSeq[String](a.fieldIndex(strCol))(band) ==
          b.getSeq[String](b.fieldIndex(strCol))(band)
        val bEq = a.getSeq[String](a.fieldIndex(binCol))(band) ==
          b.getSeq[String](b.fieldIndex(binCol))(band)
        assert(sEq == bEq,
          s"bucket collision drift: docs ${a.getLong(0)}/${b.getLong(0)} band $band")
      }
    keyPairs(both, "hexbands", "binbuckets")
    keyPairs(both, "affbands", "affbuckets")
  }

  test("keep-list drops exactly the dominated docs") {
    val pairs = DedupQueries.minhashPairs.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dropped = pairs.map(_._2).toSet
    val kept = DedupQueries.minhashKeep.run(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val all = Tables.documents(spark, dir).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == all -- dropped)
  }

  test("ngram jaccard prefix filter is EXACT: equals brute-force all-pairs") {
    val found = DedupQueries.ngramJaccard.run(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // Integer-threshold gate: J >= 0.8 <=> 9*inter >= 4*(na+nb); rebuild the
    // same predicate on the truth side to avoid float-boundary ambiguity.
    val expected = truth.filter(_._2 >= 0.8 - 1e-12).keySet
    assert(expected.nonEmpty, "fixture should contain pairs above threshold")
    assert(found.keySet == expected,
      s"prefix filtering must find EXACTLY the qualifying pairs; " +
        s"missing=${(expected -- found.keySet).take(5)} " +
        s"extra=${(found.keySet -- expected).take(5)}")
    found.foreach { case (p, jac) =>
      assert(math.abs(truth(p) - jac) < 1e-3, s"pair $p: reported $jac, truth ${truth(p)}")
    }
  }

  test("ngram keep-list drops exactly the dominated docs") {
    val pairs = DedupQueries.ngramJaccard.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val kept = DedupQueries.ngramKeep.run(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val dropped = pairs.map(_._2).toSet
    val all = Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- dropped)
  }

  test("simhash pairs: found pairs are genuinely similar") {
    val found = DedupQueries.simhashPairs.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(found.nonEmpty)
    val jacs = found.map { case (a, b) => truth.getOrElse((a, b), 0.0) }
    assert(jacs.count(_ >= 0.5).toDouble / jacs.length >= 0.8,
      s"simhash precision@J0.5 = ${jacs.count(_ >= 0.5)}/${jacs.length}")
  }

  /** The delta-increment contract: pairs found by joining ONLY the
    * delta's bands against the full band table equal the full self-join's
    * verified pairs restricted to delta-involving endpoints — an
    * independent Spark-side derivation of the same filter the catalog
    * oracle applies in SQL. */
  test("minhash delta-increment equals the full pair set filtered to delta") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val split = (docs.agg(max("doc_id")).head().getLong(0) + 1) / 2
    val deltaBands = DedupQueries.bandsOf(docs.filter(col("doc_id") >= split))
    val allBands = DedupQueries.bandsOf(docs.filter(col("doc_id") < split))
      .unionAll(deltaBands)
    val delta = DedupQueries.minhashPairsDelta(docs, allBands, deltaBands)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = DedupQueries.minhashPairs.run(spark, dir)
      .filter(col("doc_b") >= split)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(delta == full)
    assert(delta.nonEmpty, "fixture should contain delta-involving near-dups")
  }

  test("simhash is deterministic and order-insensitive to tokens' hash") {
    assert(DedupQueries.simhash64("a b c") == DedupQueries.simhash64("a b c"))
    assert(DedupQueries.simhash64("x") != DedupQueries.simhash64("y"))
  }

  /** Occupancy-cap refinement (refineBuckets): the scale guard behind
    * dedup_embedding_cosine. A hand-built bucket table with one over-full
    * leaf (266 vectors, cap 16 -> 5 extra sign bits / 32 sub-buckets) and
    * one under-cap leaf proves the three contracts: under-cap leaves are
    * untouched (sub_key 0, so behavior identical to pre-refinement),
    * identical vectors always share sub_keys (the planted-pair oracle's
    * precondition), and the over-full leaf actually splits. */
  test("refineBuckets: caps over-full leaves, keeps exact dups co-bucketed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def randVec(): Array[Float] = Array.fill(16)(rng.nextFloat() * 2 - 1)
    // 246 distinct vectors + 10 planted duplicates of ids 0..9 -> leaf 0
    val dense = (0 until 246).map(i => (i, randVec())) ++
      (0 until 10).map(i => (1000 + i, randVec()))
    val vecs = dense.map { case (id, v) => (id, v.toSeq) } ++
      (0 until 10).map(i => (2000 + i, dense(i)._2.toSeq)) ++ // dups of 0..9
      (0 until 8).map(i => (3000 + i, randVec().toSeq)) // leaf 1, under cap
    val vectors = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val buckets = vecs.map { case (id, _) =>
      (id, 0, if (id >= 3000) 1 else 0)
    }.toDF("vec_id", "tree_id", "leaf_id")

    val refined = DedupQueries.refineBuckets(buckets, vectors, cap = 16)
      .collect().map(r => (r.getInt(0), r.getInt(2), r.getInt(3))).toSeq

    val leaf1 = refined.filter(_._2 == 1)
    assert(leaf1.size == 8 && leaf1.forall(_._3 == 0),
      "under-cap leaf must keep sub_key 0")

    val leaf0 = refined.filter(_._2 == 0)
    val byId = leaf0.map(t => t._1 -> t._3).toMap
    for (i <- 0 until 10)
      assert(byId(i) == byId(2000 + i),
        s"identical vectors $i / ${2000 + i} must share sub_key")
    // 266 vectors, cap 16 -> extra_bits = ceil(log2(266/16)) = 5
    assert(leaf0.forall(t => t._3 >= 0 && t._3 < 32))
    val occ = leaf0.groupBy(_._3).map(_._2.size)
    assert(occ.size > 1, "over-full leaf must actually split")
    assert(occ.max < 266, "refinement must reduce the max bucket")
  }

  /** The design claim behind the median offset: a TIGHT CLUSTER (all
    * members inside a narrow cone far from the origin — exactly what a
    * forest leaf holds) still splits, because the cut sits at the
    * bucket's own median projection. An origin-through hyperplane leaves
    * such a cone entirely on one side and the bucket never splits. */
  test("refineBuckets: median cut splits a tight off-origin cluster") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val center = Array.fill(16)(5f + rng.nextFloat())
    val vecs = (0 until 200).map { i =>
      (i, center.map(c => c + (rng.nextFloat() - 0.5f) * 0.01f).toSeq)
    }
    val vectors = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val buckets = vecs.map { case (id, _) => (id, 0, 0) }
      .toDF("vec_id", "tree_id", "leaf_id")
    val refined = DedupQueries.refineBuckets(buckets, vectors, cap = 16)
      .collect().map(_.getInt(3))
    val occ = refined.groupBy(identity).map(_._2.size)
    // 200 members, cap 16 -> 4 bits / 16 sub-buckets; median cuts must
    // keep the largest sub-bucket far below the unsplit 200.
    assert(occ.size >= 8, s"cone did not split: ${occ.size} sub-buckets")
    assert(occ.max <= 64, s"max sub-bucket ${occ.max} — cuts missed the cone")
  }

  test("dedup_soft_weights: each cluster carries one document's worth of mass") {
    val rows = DedupQueries.softWeights.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == Tables.documents(spark, dir).count())
    // cluster_size is the true member count; weight_bp = 10000 div size
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val size = members.head._3
      assert(members.length == size, s"cluster $cid size mismatch")
      assert(members.forall(m => m._3 == size && m._4 == 10000L / size))
    }
    // the fixture has both singletons (full weight) and real dup clusters
    assert(rows.exists(_._3 == 1L) && rows.exists(_._3 > 1L))
    assert(rows.filter(_._3 == 1L).forall(_._4 == 10000L))
    // labels agree with the standalone components entry on clustered docs
    val cc = DedupQueries.clusterCc.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_._3 > 1L).foreach { case (d, cid, _, _) =>
      assert(cc(d) == cid, s"doc $d label drift: $cid vs ${cc(d)}")
    }
  }

  test("dedup_embedding_cosine returns exactly the planted pairs") {
    val rows = DedupQueries.embeddingNearDup.run(spark, dir).collect()
    val ids = Tables.embeddings(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      ids.map(id => (id, id + 100000)).toSeq)
  }
}
