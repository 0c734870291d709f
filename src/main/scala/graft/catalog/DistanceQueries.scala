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
  * Hamming (M10) operates on float bit patterns — not SQL-expressible, so it
  * is a rows-only check (driver records a weaker gate).
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

  private def oracleFor(metricName: String): Option[String] =
    oracleTerm.get(metricName).map { term =>
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
