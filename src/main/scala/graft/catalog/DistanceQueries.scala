package graft.catalog

import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.Tables
import graft.functions.Distances

/** One query per distance metric (SURVEY.md §2.3, M1–M12): the distance of
  * every stored vector to the query vector `vec_id = 0`, rounded to 4
  * decimals for cross-engine float determinism. The DuckDB oracle computes
  * the same fold with `generate_series` over the 64 components (fixture dim,
  * TESTDATA.md), accumulating in DOUBLE exactly as the Spark side does.
  * Hamming (M10) operates on float bit patterns — its oracle replays the
  * f32→bits reinterpretation LIVE in pure DuckDB SQL at the current SF via
  * exact IEEE-754 decomposition ([[hammingOracle]]); the frozen bit-array
  * fixture `fixtures/embedding_bits.parquet` survives only as
  * FixtureOracleSpec's independent cross-check of that decomposition.
  */
object DistanceQueries {

  private val dim = 64 // fixture embedding dimensionality (FIXTURES.md §1)

  // a = stored vector component, q = query vector component (both DOUBLE).
  private val ax = "a.embedding[t.i]::DOUBLE"
  private val qx = "q.qe[t.i]::DOUBLE"

  /** DuckDB aggregate term per metric, over grouped (a, q) component pairs.
    * Every sum is an ordered aggregate (`ORDER BY t.i`) so DuckDB folds in
    * ascending component order — exactly the order Spark's `aggregate` HOF
    * folds the array — keeping the non-associative FP accumulation
    * bit-identical on both engines (the round-1 cosine hash mismatch). */
  private val oracleTerm: Map[String, String] = Map(
    "l2sq" -> s"sum(power($ax - $qx, 2) ORDER BY t.i)",
    "l2" -> s"sqrt(sum(power($ax - $qx, 2) ORDER BY t.i))",
    "cosine" -> (s"1 - sum($ax * $qx ORDER BY t.i) / " +
      s"(sqrt(sum($ax * $ax ORDER BY t.i)) * sqrt(sum($qx * $qx ORDER BY t.i)))"),
    "manhattan" -> s"sum(abs($ax - $qx) ORDER BY t.i)",
    "chebyshev" -> s"max(abs($ax - $qx))",
    "canberra" -> (s"sum(CASE WHEN abs($ax) + abs($qx) = 0 THEN 0 " +
      s"ELSE abs($ax - $qx) / (abs($ax) + abs($qx)) END ORDER BY t.i)"),
    "braycurtis" -> (s"CASE WHEN sum(abs($ax + $qx) ORDER BY t.i) = 0 THEN 0 " +
      s"ELSE sum(abs($ax - $qx) ORDER BY t.i) / sum(abs($ax + $qx) ORDER BY t.i) END"),
    "l3" -> s"power(sum(power(abs($ax - $qx), 3) ORDER BY t.i), 1.0/3)",
    "l4" -> s"power(sum(power(abs($ax - $qx), 4) ORDER BY t.i), 1.0/4)",
    "minkowski_2.5" -> s"power(sum(power(abs($ax - $qx), 2.5) ORDER BY t.i), 1.0/2.5)",
    "pnorm_2.5" -> s"sum(power(abs($ax - $qx), 2.5) ORDER BY t.i)")

  /** Cosine is a quotient of three accumulations and lands close enough to
    * round() half-boundaries that Spark's and DuckDB's round implementations
    * disagree on a handful of rows (the round-1/round-2 red). Quantize it by
    * truncation instead — floor/multiply/divide are exactly specified IEEE
    * ops, so bit-identical doubles quantize identically on both engines. */
  private def quantize(metricName: String, term: String): String =
    if (metricName == "cosine") s"floor(greatest(0, $term) * 1e4) / 1e4"
    else s"round($term, 4)"

  /** M10 oracle, live at the current SF: the f32 → bit-pattern
    * reinterpretation is replayed in pure SQL with exact IEEE-754
    * arithmetic — sign via `signbit` (catches -0.0), exponent via
    * floor(log2) with a ±1 correction step (log2's double rounding can
    * only be off by one, and the 2^e comparisons are exact), mantissa via
    * `af / 2^e - 1` scaled by 2^23 (power-of-two division and the scale
    * are exact double ops, so the result IS the stored 23-bit integer;
    * the subnormal branch scales by 2^149 instead). Validated
    * component-for-component against numpy's `.view(uint32)` on the
    * fixture corpus. The sum of 64 popcounts is order-free integer
    * arithmetic; the cast to DOUBLE matches the Spark side.
    *
    * PRECONDITION: finite components only. log2/floor on NaN/Inf would
    * produce garbage bits that silently diverge from Spark's
    * floatToRawIntBits, so the first CTE raises a loud `error()` on any
    * non-finite value instead — if the generated corpus ever grows one,
    * the entry fails red rather than hash-mismatching mysteriously
    * (Spark's side handles every bit pattern; only the oracle is
    * restricted). */
  private def hammingOracle: String = s"""
      WITH comp AS MATERIALIZED (
        SELECT a.vec_id, t.i,
               CASE WHEN isfinite(a.embedding[t.i]::FLOAT)
                    THEN a.embedding[t.i]::FLOAT
                    ELSE error('hamming oracle: non-finite f32 component')
               END AS f
        FROM embeddings a, generate_series(1, $dim) t(i)),
      ex AS MATERIALIZED (
        SELECT vec_id, i, f, abs(f::DOUBLE) AS af,
               CASE WHEN f = 0 THEN 0
                    ELSE floor(log2(abs(f::DOUBLE)))::BIGINT END AS e0
        FROM comp),
      ex2 AS MATERIALIZED (
        SELECT vec_id, i, f, af,
               CASE WHEN af >= pow(2.0, (e0+1)::DOUBLE) THEN e0+1
                    WHEN af < pow(2.0, e0::DOUBLE) THEN e0-1
                    ELSE e0 END AS e
        FROM ex),
      bits AS MATERIALIZED (
        SELECT vec_id, i,
          CASE WHEN af = 0
               THEN CASE WHEN signbit(f) THEN 2147483648 ELSE 0 END
               ELSE (CASE WHEN signbit(f) THEN 2147483648 ELSE 0 END)
                 + (CASE WHEN af >= pow(2.0, -126.0)
                      THEN (e + 127) * 8388608
                           + CAST(round((af / pow(2.0, e::DOUBLE) - 1)
                                        * 8388608) AS BIGINT)
                      ELSE CAST(round(af * pow(2.0, 149.0)) AS BIGINT) END)
          END AS b
        FROM ex2)
      SELECT a.vec_id AS vec_id,
             CAST(sum(bit_count(xor(a.b, q.b))) AS DOUBLE) AS dist
      FROM bits a JOIN (SELECT i, b FROM bits WHERE vec_id = 0) q USING (i)
      GROUP BY a.vec_id
      ORDER BY vec_id"""

  private def oracleFor(metricName: String): Option[String] =
    if (metricName == "hamming") Some(hammingOracle)
    else oracleTerm.get(metricName).map { term =>
      s"""
      SELECT a.vec_id AS vec_id, ${quantize(metricName, term)} AS dist
      FROM embeddings a,
           (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q,
           generate_series(1, $dim) t(i)
      GROUP BY a.vec_id
      ORDER BY vec_id"""
    }

  private def distQuery(m: Distances.Metric): Q = Q(
    s"dist_${m.name}",
    (s, dir) => {
      // Hamming runs over the LIVE embeddings like every other metric —
      // its oracle replays the f32→bits reinterpretation in SQL (above),
      // so the entry is SF-scaled, not pinned to a frozen fixture. The
      // frozen bit fixture remains as FixtureOracleSpec's independent
      // cross-check of the same reinterpretation.
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val (a, b) =
        if (m == Distances.Hamming) (col("embedding"), col("qe")) // raw bits
        else (Distances.asDouble(col("embedding")), Distances.asDouble(col("qe")))
      e.crossJoin(broadcast(q))
        .select(col("vec_id"),
          (m match {
            case Distances.Hamming => m(a, b).cast("double")
            case Distances.Cosine => Distances.trunc4NonNeg(m(a, b))
            case _ => round(m(a, b), 4)
          }).as("dist"))
        .orderBy("vec_id")
    },
    oracleFor(m.name))

  /** The native kernels exposed as SQL functions (GraftFunctions /
    * spark.sql.extensions=graft.GraftExtensions): the same query a SQL-only
    * user would write, hash-checked against the same oracle as the Column
    * API — proving API parity across every registered kernel. */
  val sqlFunctions = Q(
    "dist_sql_functions",
    (s, dir) => {
      graft.GraftFunctions.register(s)
      Tables.embeddings(s, dir).createOrReplaceTempView("graft_embeddings")
      s.sql("""
        SELECT a.vec_id AS vec_id,
               round(vector_l2sq(CAST(a.embedding AS ARRAY<DOUBLE>),
                                 CAST(q.qe AS ARRAY<DOUBLE>)), 4) AS l2sq,
               floor(greatest(0D, vector_cosine(CAST(a.embedding AS ARRAY<DOUBLE>),
                                   CAST(q.qe AS ARRAY<DOUBLE>))) * 1e4) / 1e4 AS cos_dist,
               round(vector_manhattan(CAST(a.embedding AS ARRAY<DOUBLE>),
                                      CAST(q.qe AS ARRAY<DOUBLE>)), 4) AS manhattan,
               round(vector_chebyshev(CAST(a.embedding AS ARRAY<DOUBLE>),
                                      CAST(q.qe AS ARRAY<DOUBLE>)), 4) AS chebyshev,
               round(vector_canberra(CAST(a.embedding AS ARRAY<DOUBLE>),
                                     CAST(q.qe AS ARRAY<DOUBLE>)), 4) AS canberra,
               round(vector_braycurtis(CAST(a.embedding AS ARRAY<DOUBLE>),
                                       CAST(q.qe AS ARRAY<DOUBLE>)), 4) AS braycurtis,
               round(vector_pnorm(CAST(a.embedding AS ARRAY<DOUBLE>),
                                  CAST(q.qe AS ARRAY<DOUBLE>), 2.5), 4) AS pnorm
        FROM graft_embeddings a,
             (SELECT embedding AS qe FROM graft_embeddings WHERE vec_id = 0) q
        ORDER BY vec_id""")
    },
    Some(s"""
      SELECT a.vec_id AS vec_id,
             round(${oracleTerm("l2sq")}, 4) AS l2sq,
             floor(greatest(0, ${oracleTerm("cosine")}) * 1e4) / 1e4 AS cos_dist,
             round(${oracleTerm("manhattan")}, 4) AS manhattan,
             round(${oracleTerm("chebyshev")}, 4) AS chebyshev,
             round(${oracleTerm("canberra")}, 4) AS canberra,
             round(${oracleTerm("braycurtis")}, 4) AS braycurtis,
             round(${oracleTerm("pnorm_2.5")}, 4) AS pnorm
      FROM embeddings a,
           (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q,
           generate_series(1, $dim) t(i)
      GROUP BY a.vec_id
      ORDER BY vec_id"""))

  /** The I1–I3 vector-algebra functions through the SQL registry — same
    * API-parity contract as `dist_sql_functions`, gated with elementwise
    * sums (and the unit-norm invariant for vector_normalize). */
  val vecSqlFunctions = Q(
    "vec_sql_functions",
    (s, dir) => {
      graft.GraftFunctions.register(s)
      Tables.embeddings(s, dir).createOrReplaceTempView("graft_embeddings")
      s.sql("""
        SELECT a.vec_id AS vec_id,
               round(aggregate(vector_subtract(CAST(a.embedding AS ARRAY<DOUBLE>),
                                               CAST(q.qe AS ARRAY<DOUBLE>)),
                               0D, (acc, x) -> acc + x), 4) AS sub_sum,
               round(aggregate(vector_average(CAST(a.embedding AS ARRAY<DOUBLE>),
                                              CAST(q.qe AS ARRAY<DOUBLE>)),
                               0D, (acc, x) -> acc + x), 4) AS avg_sum,
               round(aggregate(vector_scale(CAST(a.embedding AS ARRAY<DOUBLE>), 2.5D),
                               0D, (acc, x) -> acc + x), 4) AS scale_sum,
               round(sqrt(aggregate(vector_normalize(CAST(a.embedding AS ARRAY<DOUBLE>)),
                                    0D, (acc, x) -> acc + x * x)), 4) AS unit_norm
        FROM graft_embeddings a,
             (SELECT embedding AS qe FROM graft_embeddings WHERE vec_id = 0) q
        ORDER BY vec_id""")
    },
    Some(s"""
      SELECT a.vec_id AS vec_id,
             round(sum(a.embedding[t.i]::DOUBLE - q.qe[t.i]::DOUBLE), 4) AS sub_sum,
             round(sum((a.embedding[t.i]::DOUBLE + q.qe[t.i]::DOUBLE) / 2), 4)
               AS avg_sum,
             round(sum(a.embedding[t.i]::DOUBLE * 2.5), 4) AS scale_sum,
             round(CASE WHEN sum(a.embedding[t.i]::DOUBLE * a.embedding[t.i]::DOUBLE) = 0
                        THEN 0 ELSE 1 END, 4) AS unit_norm
      FROM embeddings a,
           (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q,
           generate_series(1, $dim) t(i)
      GROUP BY a.vec_id
      ORDER BY vec_id"""))

  def qs: Seq[Q] = Distances.all.map(distQuery) :+ sqlFunctions :+ vecSqlFunctions
}
