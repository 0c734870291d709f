package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{FuzzyJoin, TextMatch}

/** Gates for the substring/line-level text operators and the PassJoin
  * edit-distance join. The load-bearing test is PassJoin exactness: the
  * segment-index candidate scheme must equal the brute-force all-pairs
  * join on every input (that is the property that lets it replace brute
  * force at scale).
  */
class TextMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // --- spanDedupStats -----------------------------------------------------

  test("spanDedupStats: hand-computed coverage on a planted repeated span") {
    // docs 1 and 2 share the 8-token run "a b c d e f g h"; doc 3 is clean.
    val docs = Seq(
      (1L, "a b c d e f g h x1 y1 z1 w1 v1 u1 t1 s1"),
      (2L, "p2 q2 a b c d e f g h r2 s2 t2 u2 v2 w2"),
      (3L, "m3 n3 o3 p3 q3 r3 s3 t3 u3 v3 w3 x3 y3 z3 k3 l3"))
      .toDF("doc_id", "text")
    val out = TextMatch.spanDedupStats(docs, k = 8).orderBy("doc_id").collect()
    // exactly one shared window per doc, covering 8 of 16 tokens = 5000/1e4
    assert(out.toSeq == Seq(Row(1L, 1L, 8L, 5000L), Row(2L, 1L, 8L, 5000L)))
  }

  test("rareSpanAudit: planted shared block lowers min_df; clean doc is all-unique") {
    val docs = Seq(
      (1L, "a b c d e f g h x1 y1 z1 w1 v1 u1 t1 s1"),
      (2L, "p2 q2 a b c d e f g h r2 s2 t2 u2 v2 w2"),
      (3L, "m3 n3 o3 p3 q3 r3 s3 t3 u3 v3 w3 x3 y3 z3 k3 l3"))
      .toDF("doc_id", "text")
    val out = TextMatch.rareSpanAudit(docs, k = 8).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // 16 tokens -> 9 windows each; docs 1/2 share exactly ONE window
    // (the identical "a b c d e f g h" run), the other 8 are unique
    assert(out(1L) == (9L, 8L, 8888L, 1L), s"doc1: ${out(1L)}")
    assert(out(2L) == (9L, 8L, 8888L, 1L), s"doc2: ${out(2L)}")
    // the clean doc is the canary profile: every window unique, min_df 1
    assert(out(3L) == (9L, 9L, 10000L, 1L), s"doc3: ${out(3L)}")
    // a pure duplicate pair has min_df 2 and zero unique windows
    val dup = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val d = TextMatch.rareSpanAudit(dup, k = 8).orderBy("doc_id").collect()
    d.foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L && r.getLong(5) == 2L)
    }
  }

  test("spanDedupStats: overlapping windows count tokens once") {
    // a 10-token shared run yields 3 overlapping 8-windows but covers
    // exactly 10 distinct tokens.
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared x1 x2 x3 x4 x5 x6"),
      (2L, s"y1 y2 y3 y4 y5 y6 $shared"))
      .toDF("doc_id", "text")
    val out = TextMatch.spanDedupStats(docs, k = 8).orderBy("doc_id").collect()
    assert(out.toSeq == Seq(Row(1L, 3L, 10L, 6250L), Row(2L, 3L, 10L, 6250L)))
  }

  // --- spanScrub ----------------------------------------------------------

  test("spanScrub: the first occurrence keeps the span, later ones lose it") {
    val docs = Seq(
      (1L, "a b c d e f g h x1 y1 z1 w1 v1 u1 t1 s1"),
      (2L, "p2 q2 a b c d e f g h r2 s2 t2 u2 v2 w2"),
      (3L, "m3 n3 o3 p3 q3 r3 s3 t3 u3 v3 w3 x3 y3 z3 k3 l3"))
      .toDF("doc_id", "text")
    val out = TextMatch.spanScrub(docs, k = 8).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1 (first occurrence) keeps everything; doc 2 loses exactly the
    // 8 shared tokens; doc 3 untouched.
    assert(out.toSeq == Seq(
      (1L, 16L, 0L, md5Of("a b c d e f g h x1 y1 z1 w1 v1 u1 t1 s1")),
      (2L, 16L, 8L, md5Of("p2 q2 r2 s2 t2 u2 v2 w2")),
      (3L, 16L, 0L,
        md5Of("m3 n3 o3 p3 q3 r3 s3 t3 u3 v3 w3 x3 y3 z3 k3 l3"))))
  }

  test("spanScrub: three-way copies keep exactly one instance corpus-wide") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (5L, s"a5 b5 $shared"), (6L, s"$shared a6 b6"), (7L, s"a7 $shared b7"))
      .toDF("doc_id", "text")
    val out = TextMatch.spanScrub(docs, k = 8).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // doc 5 is the first (doc_id order) occurrence of every shared window
    // and keeps all 14 tokens; 6 and 7 lose the full 12-token run.
    assert(out.toSeq == Seq((5L, 0L), (6L, 12L), (7L, 12L)))
  }

  test("spanScrub: random corpora agree with a driver-side reference") {
    // Independent implementation of the documented rule: token dropped iff
    // covered by a non-first (global min (doc_id, pos)) occurrence of a
    // cross-doc duplicated 8-window. Small vocab + short docs force heavy
    // organic duplication and overlapping windows.
    def ref(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, String)] = {
      val toks = docs.map { case (id, t) => id -> t.toLowerCase.split(" ", -1) }
      val wins = toks.flatMap { case (id, w) =>
        if (w.length >= k) (1 to (w.length - k + 1)).map(p =>
          (w.slice(p - 1, p - 1 + k).mkString(" "), id, p))
        else Nil
      }
      val dupGrams = wins.groupBy(_._1)
        .filter(_._2.map(_._2).distinct.size > 1).keySet
      val firsts = wins.filter(w => dupGrams(w._1)).groupBy(_._1)
        .map { case (g, os) => g -> os.map(o => (o._2, o._3)).min }
      val drops = wins
        .filter(w => dupGrams(w._1) && (w._2, w._3) != firsts(w._1))
        .flatMap { case (_, id, p) => (p until p + k).map(id -> _) }
        .toSet
      toks.map { case (id, w) =>
        val kept = w.zipWithIndex.collect {
          case (t, i) if !drops(id -> (i + 1)) => t
        }
        id -> ((w.length - kept.length).toLong, kept.mkString(" "))
      }.toMap
    }
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rnd = new scala.util.Random(2024)
    (1 to 3).foreach { trial =>
      val docs = (0L until 25L).map { id =>
        val n = 6 + rnd.nextInt(20)
        id -> Seq.fill(n)(s"t${rnd.nextInt(6)}").mkString(" ")
      }
      val out = TextMatch.spanScrub(docs.toDF("doc_id", "text"), k = 8)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
      val want = ref(docs, 8)
      docs.foreach { case (id, _) =>
        val (wd, wt) = want(id)
        assert(out(id) == ((wd, md5Of(wt))),
          s"trial $trial doc $id: got ${out(id)}, want ($wd, md5('$wt'))")
      }
    }
  }

  // --- paragraphDedup -----------------------------------------------------

  test("paragraphDedup: first occurrence survives, later copies drop") {
    val lineA = (1 to 10).map(i => s"a$i").mkString(" ")
    val lineB = (1 to 10).map(i => s"b$i").mkString(" ")
    val lineC = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$lineA $lineB"), // keeps both
      (2L, s"$lineA $lineC"), // loses lineA (doc 1 owns it), keeps lineC
      (3L, s"$lineA $lineB")) // exact dup doc: loses everything
      .toDF("doc_id", "text")
    val out = TextMatch.paragraphDedup(docs, lineTokens = 10)
      .orderBy("doc_id").collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.toSeq == Seq(
      Row(1L, 2L, 2L, md5hex(s"$lineA\n$lineB")),
      Row(2L, 2L, 1L, md5hex(lineC)),
      Row(3L, 2L, 0L, md5hex(""))))
  }

  test("paragraphDedup: kept lines across the corpus = distinct lines") {
    val docs = graft.core.Tables.documents(spark, SparkTestBase.sf0001)
    val out = TextMatch.paragraphDedup(docs, lineTokens = 10)
    val kept = out.agg(sum("n_kept")).head().getLong(0)
    val distinctLines = docs
      .selectExpr("""explode(transform(
        sequence(0, (size(split(lower(text), ' ')) + 9) div 10 - 1),
        j -> array_join(slice(split(lower(text), ' '), j*10+1, 10), ' '))) AS l""")
      .select("l").distinct().count()
    assert(kept == distinctLines)
  }

  // --- boilerplateStrip -----------------------------------------------------

  test("boilerplateStrip: df >= minDf lines vanish EVERYWHERE, rarer survive") {
    val hot = (1 to 10).map(i => s"h$i").mkString(" ")  // df = 4 → stripped
    val duo = (1 to 10).map(i => s"d$i").mkString(" ")  // df = 2 → kept
    val uniq = (1 to 10).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, s"$hot $duo"),
      (2L, s"$duo $hot"),
      (3L, s"$hot $uniq"),
      (4L, hot)) // fully boilerplate: nothing survives
      .toDF("doc_id", "text")
    val out = TextMatch.boilerplateStrip(docs, lineTokens = 10, minDf = 3)
      .orderBy("doc_id").collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // unlike paragraphDedup, even the FIRST occurrence of the hot line drops
    assert(out.toSeq == Seq(
      Row(1L, 2L, 1L, md5hex(duo)),
      Row(2L, 2L, 1L, md5hex(duo)),
      Row(3L, 2L, 1L, md5hex(uniq)),
      Row(4L, 1L, 0L, md5hex(""))))
  }

  test("boilerplateStrip: kept occurrences = occurrences of df<minDf lines") {
    val docs = graft.core.Tables.documents(spark, SparkTestBase.sf0001)
    val out = TextMatch.boilerplateStrip(docs, lineTokens = 10, minDf = 2)
    val kept = out.agg(sum("n_kept")).head().getLong(0)
    val lines = docs
      .selectExpr("doc_id", """explode(transform(
        sequence(0, (size(split(lower(text), ' ')) + 9) div 10 - 1),
        j -> array_join(slice(split(lower(text), ' '), j*10+1, 10), ' '))) AS l""")
    val want = lines.groupBy("l")
      .agg(count(lit(1)).as("occ"), count_distinct(col("doc_id")).as("df"))
      .filter(col("df") < 2).agg(sum("occ")).head().getLong(0)
    assert(kept == want)
  }

  // --- phraseSearch -------------------------------------------------------

  test("phraseSearch: counts overlapping occurrences and 0-based positions") {
    val docs = Seq(
      (1L, "w a a a x"),   // "a a" at pos 1 and 2 (overlap counts twice)
      (2L, "a b a a c"),   // at pos 2
      (3L, "b c d e f"))   // no match
      .toDF("doc_id", "text")
    val out = TextMatch.phraseSearch(docs, Seq("a", "a"))
      .orderBy("doc_id").collect()
    assert(out.toSeq == Seq(Row(1L, 2L, 1L), Row(2L, 1L, 2L)))
  }

  test("phraseSearch: three-term phrase") {
    val docs = Seq(
      (1L, "x table value fast y"),
      (2L, "table value slow fast"))
      .toDF("doc_id", "text")
    val out = TextMatch.phraseSearch(docs, Seq("table", "value", "fast"))
      .orderBy("doc_id").collect()
    assert(out.toSeq == Seq(Row(1L, 1L, 1L)))
  }

  // --- FuzzyJoin ----------------------------------------------------------

  /** Brute-force Levenshtein (unit costs, the same metric Spark's
    * `levenshtein` implements) for the exactness oracle. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("PassJoin is EXACT: equals brute force on randomized strings (d=1,2)") {
    // Deterministic pseudo-random corpus of short strings over a tiny
    // alphabet (dense edit-distance neighborhoods — the adversarial case
    // for a lossy filter).
    // Lengths start at 1 so the tiny-string pool (len <= d, below the
    // segment scheme's reach) is exercised against brute force too — the
    // original 6..13 range let a short-string hole ship unseen.
    val rng = new scala.util.Random(42)
    val strs = (0 until 120).map { i =>
      val len = 1 + rng.nextInt(13)
      i.toLong -> (0 until len).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    }
    val df = strs.toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.selfJoin(df, d = d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        i <- strs.indices.iterator
        j <- (i + 1) until strs.length
        e = lev(strs(i)._2, strs(j)._2)
        if e <= d
      } yield (strs(i)._1, strs(j)._1, e.toLong)).toSet
      assert(got == want, s"PassJoin(d=$d) diverged from brute force")
    }
  }

  test("tiny strings (shorter than d+1) pair exhaustively") {
    // both-tiny pairs bypass the segment index entirely; every such pair
    // is within distance d by length alone and must be reported.
    val df = Seq(1L -> "a", 2L -> "b", 3L -> "xy", 4L -> "ab",
      5L -> "abcdefgh").toDF("id", "s")
    val got = FuzzyJoin.selfJoin(df, d = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set((1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 1L),
      (2L, 3L, 2L), (2L, 4L, 1L), (3L, 4L, 2L))
    assert(got == want)
  }

  test("PassJoin finds planted edits at varying lengths") {
    val base = Seq(
      10L -> "the quick brown fox jumps",
      20L -> "pack my box with five dozen",
      30L -> "sphinx of black quartz")
    val edited = Seq(
      11L -> "the quick browm fox jumps",   // substitution, ed 1
      21L -> "pack my bx with five dozen",  // deletion, ed 1
      31L -> "sphinx of bllack quartz")     // insertion, ed 1
    val df = (base ++ edited).toDF("id", "s")
    val got = FuzzyJoin.selfJoin(df, d = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((10L, 11L), (20L, 21L), (30L, 31L)).subsetOf(got))
  }
}
