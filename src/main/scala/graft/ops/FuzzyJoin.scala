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
  private def segStartSql(len: String, parts: Int, j: Int): String =
    s"($j * (($len) div $parts) + least($j, ($len) % $parts) + 1)"
  private def segLenSql(len: String, parts: Int, j: Int): String =
    s"((($len) div $parts) + if ($j < ($len) % $parts, 1, 0))"

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
    val segs = (0 until parts).map { j =>
      base.select(col("id"), col("s"), col("len"), lit(j).as("seg_j"),
        expr(s"substr(s, ${segStartSql("len", parts, j)}, ${segLenSql("len", parts, j)})")
          .as("seg"))
    }.reduce(_ unionAll _)

    // Probe side: for each string b, each candidate indexed length
    // la = len + dl (dl in [-d, d]), each segment j of la, each shift in
    // [-d, d]: b's substring at (start_j(la) + shift, len_j(la)). One
    // array literal of CASE-guarded structs, null-filtered and exploded —
    // constant blow-up, no join to a lengths table.
    val keySql = (for {
      dl <- -d to d
      j <- 0 until parts
      sh <- -d to d
    } yield {
      val la = s"(len + ($dl))"
      val st = s"(${segStartSql(la, parts, j)} + ($sh))"
      val ln = segLenSql(la, parts, j)
      s"""CASE WHEN $la >= $parts AND $st >= 1 AND $ln >= 1
              AND $st + $ln - 1 <= len
         THEN named_struct('la', $la, 'seg_j', $j, 'seg', substr(s, $st, $ln))
         END"""
    }).mkString("filter(array(", ", ", "), x -> x IS NOT NULL)")
    val probes = base
      .select(col("id"), col("s"), explode(expr(keySql)).as("p"))
      .select(col("id"), col("s"),
        col("p.la").as("la"), col("p.seg_j").as("seg_j"), col("p.seg").as("seg"))

    val cand = segs.as("a")
      .join(probes.as("b"),
        col("a.len") === col("b.la") && col("a.seg_j") === col("b.seg_j") &&
          col("a.seg") === col("b.seg") && col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        when(col("a.id") < col("b.id"), col("a.s")).otherwise(col("b.s")).as("s_a"),
        when(col("a.id") < col("b.id"), col("b.s")).otherwise(col("a.s")).as("s_b"))
      .distinct()

    cand
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long").as("ed"))
      .filter(col("ed") <= d)
  }
}
