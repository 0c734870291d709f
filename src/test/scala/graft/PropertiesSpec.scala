package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Distances

/** Property-based metric axioms (SURVEY.md §5.3) evaluated through the
  * actual Catalyst expressions over generated vectors — including the
  * codegen-vs-HOF parity obligation for the native VectorDistance kernels
  * (they must be bit-identical, since the DuckDB oracle hashes depend on
  * the exact fold) — plus operator laws for the set-based rewrites (dedup
  * idempotence, prefix-filter completeness, as-of and range join equality
  * with their brute-force definitions). */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dim = 16
  private val genVec: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](dim, Gen.chooseNum(-8f, 8f))
  private val genPair: Gen[(Array[Float], Array[Float])] =
    for { a <- genVec; b <- genVec } yield (a, b)

  /** Deterministic ScalaCheck draws (no scalatestplus bridge on the
    * offline classpath): `trials` seeded samples per property, each
    * evaluated as one Spark job over the whole generated batch. */
  private def forAllSeeded[A](gen: Gen[A], trials: Int = 4)(body: A => Unit): Unit =
    (0 until trials).foreach { t =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + t)))
    }

  // HOF formulations retained verbatim for the parity obligation.
  private def hofSum(arr: org.apache.spark.sql.Column) =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    hofSum(zip_with(a, b, _ * _))
  private def hofL2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    hofSum(zip_with(a, b, (x, y) => (x - y) * (x - y)))
  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val denom = sqrt(hofDot(a, a)) * sqrt(hofDot(b, b))
    when(denom === 0.0, lit(1.0)).otherwise(lit(1.0) - hofDot(a, b) / denom)
  }

  test("codegen VectorDistance == HOF formulation, bit for bit") {
    forAllSeeded(Gen.listOfN(24, genPair)) { pairs =>
      {
        val df = pairs.toDF("a", "b")
          .select(Distances.asDouble($"a").as("a"), Distances.asDouble($"b").as("b"))
        val rows = df.select(
          Distances.dot($"a", $"b").as("n_dot"), hofDot($"a", $"b").as("h_dot"),
          Distances.l2sq($"a", $"b").as("n_l2"), hofL2sq($"a", $"b").as("h_l2"),
          Distances.cosine($"a", $"b").as("n_cos"), hofCosine($"a", $"b").as("h_cos"))
          .collect()
        rows.foreach { r =>
          assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot mismatch")
          assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(3)), "l2sq mismatch")
          assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(5)), "cosine mismatch")
        }
      }
    }
  }

  test("triangle inequality holds for the true metrics") {
    forAllSeeded(Gen.listOfN(16, for { a <- genVec; b <- genVec; c <- genVec } yield (a, b, c))) {
      triples =>
        {
          val df = triples.toDF("a", "b", "c").select(
            Distances.asDouble($"a").as("a"),
            Distances.asDouble($"b").as("b"),
            Distances.asDouble($"c").as("c"))
          Seq[Distances.Metric](
            Distances.L2, Distances.Manhattan, Distances.Chebyshev,
            Distances.Minkowski(2.5)).foreach { m =>
            val bad = df.filter(
              m($"a", $"c") > m($"a", $"b") + m($"b", $"c") + lit(1e-9)).count()
            assert(bad == 0, s"${m.name} violates triangle inequality")
          }
        }
    }
  }

  test("minkowski family: p=1 is manhattan, p=2 is l2, pnorm(2) is l2sq") {
    forAllSeeded(Gen.listOfN(24, genPair)) { pairs =>
      {
        val df = pairs.toDF("a", "b")
          .select(Distances.asDouble($"a").as("a"), Distances.asDouble($"b").as("b"))
        val bad = df.filter(
          (abs(Distances.minkowski($"a", $"b", 1.0) - Distances.manhattan($"a", $"b")) > 1e-6) ||
            (abs(Distances.minkowski($"a", $"b", 2.0) - Distances.l2($"a", $"b")) > 1e-6) ||
            (abs(Distances.pnorm($"a", $"b", 2.0) - Distances.l2sq($"a", $"b")) > 1e-6))
          .count()
        assert(bad == 0)
      }
    }
  }

  test("hyperplane side predicate flips under hyperplane negation (off the boundary)") {
    import graft.functions.VectorOps
    forAllSeeded(Gen.listOfN(24, genPair)) { pairs =>
      {
        val df = pairs.toDF("c", "p")
          .select(Distances.asDouble($"c").as("c"), Distances.asDouble($"p").as("p"))
        val negC = transform($"c", x => -x)
        val margin = Distances.dot($"c", $"p")
        val bad = df
          .filter(abs(margin) > 1e-9) // boundary: >= 0 makes 0 side-stable
          .filter(VectorOps.pointIsAbove($"c", lit(0.0), $"p") ===
            VectorOps.pointIsAbove(negC, lit(0.0), $"p"))
          .count()
        assert(bad == 0)
      }
    }
  }

  test("dedup is idempotent on generated duplicate batches") {
    forAllSeeded(Gen.zip(Gen.listOfN(12, genVec), Gen.chooseNum(1, 4))) { case (vecs, dupFactor) =>
      {
        val rows = (0 until dupFactor).flatMap(r =>
          vecs.zipWithIndex.map { case (v, i) => (r * 1000 + i.toLong, v) })
        val df = rows.toDF("vec_id", "embedding")
        def dedup(d: org.apache.spark.sql.DataFrame) =
          d.groupBy(xxhash64(col("embedding")).as("h"))
            .agg(min("vec_id").as("vec_id"))
        val once = dedup(df)
        assert(once.count() == vecs.distinct.length)
        // idempotence: applying first-wins again changes nothing
        val again = once.select(col("vec_id"))
        assert(again.exceptAll(once.select("vec_id")).isEmpty)
      }
    }
  }

  test("ngram prefix filter == brute force on random corpora (completeness theorem)") {
    // The prefix-filter claim is a theorem (a pair with J >= t cannot avoid
    // the rarest n - ceil(t*n) + 1 shingles of either side); exercise it on
    // generated corpora over a tiny vocabulary so shingle collisions and
    // genuine near-dups both occur, comparing against all-pairs brute force
    // with the SAME integer threshold (9*inter >= 4*(na+nb)).
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val genDoc: Gen[String] = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val genCorpus: Gen[List[String]] =
      Gen.chooseNum(6, 16).flatMap(n => Gen.listOfN(n, genDoc))
    forAllSeeded(genCorpus, trials = 6) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val found = graft.catalog.DedupQueries.ngramJaccardPairs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def sh(t: String): Set[String] = {
        val w = t.split(" ")
        if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
        else Set(w.mkString(" "))
      }
      val ss = texts.map(sh)
      val expected = (for {
        i <- ss.indices
        j <- (i + 1) until ss.length
        inter = (ss(i) & ss(j)).size
        if 9L * inter >= 4L * (ss(i).size + ss(j).size)
      } yield (i.toLong, j.toLong)).toSet
      assert(found == expected,
        s"missing=${expected -- found} extra=${found -- expected} corpus=$texts")
    }
  }

  test("GVID container: encode/decode round-trips arbitrary frame bytes") {
    import graft.embed.VideoFrames
    val genFrame: Gen[Array[Byte]] =
      Gen.chooseNum(0, 64).flatMap(n =>
        Gen.containerOfN[Array, Byte](n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    val genFrames: Gen[List[Array[Byte]]] =
      Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, genFrame))
    forAllSeeded(genFrames, trials = 8) { frames =>
      val enc = VideoFrames.encode(frames)
      val dec = VideoFrames.decodeFrames(enc)
      assert(dec.length == frames.length)
      dec.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
      // every strict prefix that cuts into the payload fails cleanly
      if (enc.length > 8)
        assert(VideoFrames.decodeFrames(enc.dropRight(1)) == null)
      // stride sampling covers index 0 and respects the stride
      val sampled = VideoFrames.sampleFrames(enc, 2)
      if (frames.nonEmpty) {
        assert(sampled.head._1 == 0)
        assert(sampled.map(_._1).forall(_ % 2 == 0))
      }
    }
  }

  private val genEventRow: Gen[(Long, Long, Long)] = for {
    k <- Gen.chooseNum(1L, 4L)
    t <- Gen.chooseNum(0L, 80L)
    id <- Gen.chooseNum(0L, 100000L)
  } yield (k, t, id)

  test("asof join == brute-force latest-prior scan on random event sets") {
    val gen = for {
      ls <- Gen.listOfN(40, genEventRow)
      rs <- Gen.listOfN(40, genEventRow)
    } yield (ls, rs)
    forAllSeeded(gen, trials = 3) { case (ls, rs) =>
      // rights unique per (key, ts) — the operator's documented contract
      val rsU = rs.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toList
      val left = ls.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val got = graft.ops.AsofJoin.asof(
        left.toDF("k", "us", "lid"), rsU.toDF("k", "us", "rid"), Seq("k"), "us")
        .collect()
        .map(r => r.getLong(2) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toMap
      val want = left.map { case (k, t, lid) =>
        val prior = rsU.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (prior.isEmpty) -1L else prior.maxBy(_._2)._3)
      }.toMap
      assert(got == want)
    }
  }

  test("bucketed (skew-proof) asof == plain asof for every bucket width") {
    val gen = for {
      ls <- Gen.listOfN(30, genEventRow)
      rs <- Gen.listOfN(30, genEventRow)
    } yield (ls, rs)
    forAllSeeded(gen, trials = 2) { case (ls, rs) =>
      val rsU = rs.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toList
      val left = ls.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      def run(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(2) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toMap
      val l = left.toDF("k", "us", "lid")
      val r = rsU.toDF("k", "us", "rid")
      val plain = run(graft.ops.AsofJoin.asof(l, r, Seq("k"), "us"))
      for (width <- Seq(1L, 5L, 17L, 1000L)) {
        val bucketed = run(
          graft.ops.AsofJoin.asofBucketed(l, r, Seq("k"), "us", width))
        assert(bucketed == plain, s"bucketWidth=$width diverged")
      }
    }
  }

  test("binned range join == brute-force inequality join on random intervals") {
    val genInterval = for {
      k <- Gen.chooseNum(1L, 4L)
      lo <- Gen.chooseNum(0L, 80L)
      len <- Gen.chooseNum(0L, 30L)
      id <- Gen.chooseNum(0L, 100000L)
    } yield (k, lo, lo + len, id)
    val gen = for {
      ps <- Gen.listOfN(40, genEventRow)
      is <- Gen.listOfN(15, genInterval)
    } yield (ps, is)
    forAllSeeded(gen, trials = 3) { case (ps, is) =>
      val points = ps.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val ivals = is.zipWithIndex.map { case ((k, lo, hi, _), i) => (k, lo, hi, i.toLong) }
      // binWidth 17 deliberately misaligned with the interval lengths
      val got = graft.ops.RangeJoin.pointInInterval(
        points.toDF("k", "us", "pid"), ivals.toDF("k", "lo", "hi", "iid"),
        Seq("k"), "us", "lo", "hi", binWidth = 17L)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val want = for {
        (k, t, pid) <- points
        (ik, lo, hi, iid) <- ivals
        if ik == k && lo <= t && t <= hi
      } yield (pid, iid)
      assert(got.length == want.length && got.toSet == want.toSet)
    }
  }

  test("property: incremental components == full recompute for ANY base/delta split") {
    // union-find reference (min-normalized), duplicated from
    // ConnectedComponentsSpec's targeted cases — here the SPLIT point is
    // drawn too, so the algebra update(cc(B), D) = cc(B ∪ D) is exercised
    // over arbitrary partitions of a random edge list, not a fixed one.
    def ufRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
    }
    val genEdge = for {
      a <- Gen.chooseNum(0L, 49L); b <- Gen.chooseNum(0L, 49L) if a != b
    } yield (a, b)
    val gen = for {
      edges <- Gen.listOfN(60, genEdge)
      split <- Gen.chooseNum(0, 60)
    } yield (edges, split)
    forAllSeeded(gen, trials = 3) { case (edges, split) =>
      val (base, delta) = edges.splitAt(split)
      val labels =
        if (base.isEmpty) Seq.empty[(Long, Long)].toDF("node", "component")
        else graft.ops.ConnectedComponents.components(base.toDF("src", "dst"))
      val got = graft.ops.ConnectedComponents
        .updateIncremental(labels, delta.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ufRef(edges), s"split at $split diverged")
    }
  }

  test("property: cross-multiplied 2-sigma test == float mean/var test") {
    // the anomaly entry's integer inequality (24c−S)² > 4(24Q−S²) must
    // agree with the definition it replaces, (c−μ)² > 4σ², for any
    // 24-count history (strict inequality both sides; ties are
    // measure-zero for the float form and identical for the integer one)
    val gen = Gen.listOfN(25, Gen.chooseNum(0L, 500L))
    forAllSeeded(gen, trials = 50) { counts =>
      val hist = counts.take(24)
      val c = counts.last
      val s = hist.sum
      val q = hist.map(x => x * x).sum
      val integerFlag = (24 * c - s) * (24 * c - s) > 4 * (24 * q - s * s)
      val mu = s.toDouble / 24
      val varr = q.toDouble / 24 - mu * mu
      val floatFlag = (c - mu) * (c - mu) > 4 * varr
      assert(integerFlag == floatFlag, s"c=$c hist=$hist")
    }
  }

  test("property: BPE driver tier == distributed tier on random corpora") {
    // the round-11 driver tier must land on the distributed loop's exact
    // merge list and final states for ANY word-frequency table, not just
    // the fixture — adversarial shapes: shared prefixes/suffixes, runs of
    // one character (greedy-leftmost), heavy count ties (the (cnt DESC,
    // l, r) tie-break is what a subtly different argmax breaks on)
    val genWord = for {
      len <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', '0'))
    } yield cs.mkString
    val genCorpus = for {
      n <- Gen.chooseNum(5, 30)
      ws <- Gen.listOfN(n, genWord)
    } yield ws
    forAllSeeded(genCorpus, trials = 6) { ws =>
      val docs = ws.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val wf = graft.ops.Bpe.wordFreq(docs).localCheckpoint(true)
      // stay under the corpus's merge capacity: distinct chars are few,
      // so cap merges well below total symbol count
      val nMerges = 4
      val (md, sd) = graft.ops.Bpe.trainDriver(wf, nMerges)
      val (mx, sx) = graft.ops.Bpe.trainDistributed(wf, nMerges)
      assert(md == mx, s"merge lists differ for corpus $ws")
      def states(df: org.apache.spark.sql.DataFrame) = df
        .select(col("word"), col("state"))
        .as[(String, String)].collect().sortBy(_._1).toSeq
      assert(states(sd) == states(sx), s"states differ for corpus $ws")
    }
  }

  test("property: cross-multiplied chi-square threshold == float chi-square") {
    val genCell = Gen.chooseNum(1L, 2000L)
    val gen = for { a <- genCell; b <- genCell; c <- genCell; d <- genCell }
      yield (a, b, c, d)
    forAllSeeded(gen, trials = 100) { case (a, b, c, d) =>
      val n = a + b + c + d
      val det = a * d - b * c
      val integerFlag = BigInt(1000) * BigInt(n) * BigInt(det) * BigInt(det) >
        BigInt(3841) * BigInt(a + b) * BigInt(c + d) * BigInt(a + c) * BigInt(b + d)
      val chi2 = n.toDouble * det * det /
        ((a + b).toDouble * (c + d) * (a + c) * (b + d))
      val floatFlag = chi2 > 3.841
      assert(integerFlag == floatFlag, s"cells=($a,$b,$c,$d) chi2=$chi2")
    }
  }
}
