package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (entity resolution / fuzzy key
  * matching) via the PassJoin segment scheme (Li, Deng, Feng — VLDB 2011,
  * public literature): to find every pair within Levenshtein distance d
  * WITHOUT the all-pairs product, partition each indexed string into d+1
  * contiguous segments. Any string b with ed(a, b) <= d must contain at
  * least one of a's segments EXACTLY (pigeonhole: d edits can touch at most
  * d segments), and that occurrence's start can shift from the segment's
  * indexed position by at most d (the net indel offset before any position
  * is bounded by the total edit budget). So probing b's substrings of the
  * right lengths at positions within +/-d of each segment's home — a
  * constant (2d+1)x(d+1)x(2d+1) key enumeration per string — against the
  * segment index finds every qualifying pair; Levenshtein verifies the
  * candidates.
  *
  * Scale: the exchange is keyed on (indexed length, segment id, segment
  * text) — constant fan-out per row, never all-pairs; candidate volume
  * tracks true similarity density (the same property the n-gram
  * prefix-filter join has, DedupQueries.ngramCandidates). Verification is
  * one codegen'd `levenshtein` per DISTINCT candidate pair. Exactness is
  * spec-gated against the brute-force join (FuzzyJoinSpec).
  */
object FuzzyJoin {

  /** 1-based start of segment `j` (0-based) when a length-`len` string is
    * split into `parts` near-even contiguous segments (first len%parts
    * segments take the extra char). Emitted as SQL text so index and probe
    * sides derive the IDENTICAL partition with pure integer arithmetic
    * inside one codegen'd projection. */
  private def segStartSql(len: String, parts: Int, j: String): String =
    s"(($j) * (($len) div $parts) + least(($j), ($len) % $parts) + 1)"
  private def segLenSql(len: String, parts: Int, j: String): String =
    s"((($len) div $parts) + if (($j) < ($len) % $parts, 1, 0))"

  /** All pairs (id_a < id_b) from `strs(id, s)` with
    * levenshtein(s_a, s_b) <= d. Returns (id_a, id_b, ed). */
  def selfJoin(
      strs: DataFrame, d: Int,
      idCol: String = "id", strCol: String = "s"): DataFrame = {
    require(d >= 1, s"edit-distance bound must be >= 1, got $d")
    val parts = d + 1
    val base = strs.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).cast("int").as("len"))

    // Index side: each string's d+1 segments, keyed (len, seg_j, seg_text).
    // Explode a tiny literal j-array, then derive (start, len) with ONE
    // parametric integer expression — everything stays in whole-stage
    // codegen (a per-j CASE/union form, or any higher-order `filter`/
    // `transform` lambda, drops the projection to interpreted evaluation:
    // measured 4-6 s of pure fixed overhead per stage at 6,000 rows).
    val segs = base
      .select(col("id"), col("s"), col("len"),
        explode(array((0 until parts).map(lit): _*)).as("seg_j"))
      .select(col("id"), col("s"), col("len"), col("seg_j"),
        expr(s"substr(s, ${segStartSql("len", parts, "seg_j")}, " +
          s"${segLenSql("len", parts, "seg_j")})").as("seg"))

    // Probe side: for each string b, each candidate indexed length
    // la = len + dl (dl in [-d, d]), each segment j of la, each shift in
    // [-d, d]: b's substring at (start_j(la) + shift, len_j(la)). The
    // (dl, j, sh) triple space is a (2d+1)(d+1)(2d+1) literal array —
    // explode it and compute the key arithmetic per row (codegen), then
    // drop out-of-range probes with a plain filter.
    val trips = for {
      dl <- -d to d
      j <- 0 until parts
      sh <- -d to d
    } yield struct(lit(dl).as("dl"), lit(j).as("seg_j"), lit(sh).as("sh"))
    val la = "(len + t.dl)"
    val st = s"(${segStartSql(la, parts, "t.seg_j")} + t.sh)"
    val ln = segLenSql(la, parts, "t.seg_j")
    val probes = base
      .select(col("id"), col("s"), col("len"),
        explode(array(trips: _*)).as("t"))
      .filter(expr(s"$la >= $parts AND $st >= 1 AND $ln >= 1" +
        s" AND $st + $ln - 1 <= len"))
      .select(col("id"), col("s"), expr(la).as("la"),
        col("t.seg_j").as("seg_j"), expr(s"substr(s, $st, $ln)").as("seg"))

    // Tiny-string pool: a string shorter than d+1 cannot be cut into d+1
    // non-empty segments, so the pigeonhole argument (and the la >= parts
    // probe guard) never fires with it as the INDEX side. Pairs with the
    // LONGER side >= d+1 are still caught (the long side indexes, the tiny
    // side probes), which leaves exactly the both-tiny pairs — and any two
    // strings of length <= d are automatically within distance d
    // (ed <= max(len)), so the pool join is both exact and total. The pool
    // is bounded by the alphabet (|Σ|^d strings exist at all), so the
    // quadratic join is a constant at any corpus size.
    val tiny = base.filter(col("len") < parts)
    val tinyPairs = tiny.as("x")
      .join(tiny.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.s").as("s_a"), col("y.s").as("s_b"))

    val cand = segs.as("a")
      .join(probes.as("b"),
        col("a.len") === col("b.la") && col("a.seg_j") === col("b.seg_j") &&
          col("a.seg") === col("b.seg") && col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        when(col("a.id") < col("b.id"), col("a.s")).otherwise(col("b.s")).as("s_a"),
        when(col("a.id") < col("b.id"), col("b.s")).otherwise(col("a.s")).as("s_b"))
      .unionByName(tinyPairs)
      .distinct()

    cand
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long").as("ed"))
      .filter(col("ed") <= d)
  }
}
