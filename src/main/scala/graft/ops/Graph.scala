package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the second member of
  * the graph family next to `ops/ConnectedComponents.scala` (min-label
  * propagation). PageRank here is EXACT-INTEGER: ranks are scaled fixed-
  * point BIGINTs and every step is integer division, so the fixpoint
  * after N rounds is bit-identical on any engine and any summation order —
  * the catalog oracle replays the identical recurrence as N unrolled SQL
  * CTEs in DuckDB and the hash gate must agree. (Floating-point PageRank
  * cannot be hash-gated: Spark's aggregation order is nondeterministic and
  * double addition does not associate.)
  *
  * Scale shape: each round is one shuffle keyed on dst (the contribution
  * aggregation) plus a broadcast-sized join with the out-degree table;
  * lineage is cut with localCheckpoint every round (the ConnectedComponents
  * policy — without it the plan doubles per iteration and the optimizer
  * dies at round ~15). Rounds are a fixed constant: the operator is
  * O(rounds) full-graph passes, embarrassingly partition-parallel within a
  * round.
  */
object Graph {

  /** `iters` rounds of damping-0.85 PageRank over `edges(src, dst)`
    * (parallel edges should be pre-deduplicated; self-loops allowed but
    * conventionally removed by the caller). Ranks are fixed-point integers
    * scaled by `scale`; the recurrence, with n = |nodes| and
    * S(v) = Σ_{(u,v) ∈ E} pr(u) div outdeg(u):
    *
    *   pr_0(v)   = scale div n
    *   pr_t+1(v) = (15·scale) div (100·n) + (85·S(v)) div 100
    *
    * Dangling mass and division remainders are deliberately dropped (the
    * usual renormalization is float-valued); ranking ORDER matches float
    * PageRank to within the fixed-point quantum. Returns (id, pr). */
  def pagerankInt(
      edges: DataFrame, iters: Int,
      scale: Long = 1000000000L, ckptEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"need >= 1 iteration, got $iters")
    require(ckptEvery >= 1, s"ckptEvery must be >= 1, got $ckptEvery")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // Static per-round inputs, partitioned ONCE on their join keys and
    // checkpointed (LogicalRDD keeps the partitioning): the per-round
    // e2 ⋈ pr and nodes ⋈ contrib joins then co-partition with their
    // aggregate-shaped other side, leaving the dst-keyed contribution
    // aggregation as the round's ONLY exchange (3 exchanges/round in the
    // naive form — at fixed-overhead-dominated sizes that is the round's
    // whole cost).
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .repartition(col("id"))
      .localCheckpoint(eager = true)
    val e2 = e.join(e.groupBy("src").agg(count(lit(1)).as("od")), "src")
      .repartition(col("src"))
      .localCheckpoint(eager = true)
    val n = nodes.count()
    var pr = nodes.select(col("id"), lit(scale / n).as("pr"))
    val base = (15L * scale) / (100L * n)
    for (t <- 1 to iters) {
      val contrib = e2
        .join(pr.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("pr div od").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      pr = nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
      // Lineage is LINEAR in rounds (each round reads the previous pr
      // exactly once), so the cut is about plan SIZE and scheduler sync,
      // not exponential blow-up — every `ckptEvery` rounds amortizes the
      // per-round eager-checkpoint job (measured 3.7 s/round of fixed
      // overhead at 100k nodes with a cut every round) while still
      // bounding optimizer time on long runs.
      if (t % ckptEvery == 0 && t < iters) pr = pr.localCheckpoint(eager = true)
    }
    pr
  }

  /** EXACT triangle counting by degree-ordered orientation (the
    * "compact-forward" scheme, Latapy 2008 — the standard distributed
    * triangle algorithm): canonicalize to undirected edges, orient every
    * edge from its lower-(degree, id) endpoint to the higher, enumerate
    * wedges from each oriented source, and close them against the oriented
    * edge set. Each triangle {a,b,c} has exactly ONE orientation-ordered
    * form u→v, u→w, v→w, so no triangle is double-counted and no
    * symmetric blow-up exists.
    *
    * Scale shape: orientation caps every out-list at O(√m) on any degree
    * distribution (a hub of degree d contributes wedges only through its
    * ≤√m HIGHER-ordered neighbors), so the wedge self-join — the only
    * super-linear stage — is Σ d_out² ≤ O(m^1.5) worst-case instead of the
    * unoriented Σ d² which a single hub makes quadratic. Both stages are
    * plain equi-joins (wedges shuffle on the source node, closure on the
    * (v, w) pair key), which is exactly the shape AQE's skew splitting
    * handles at runtime — contrast PageRank's window-free aggregation
    * rounds. Returns (id, n_tri) for every node in ≥1 triangle. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val (und, deg) = canonicalize(edges)
    triangleCountsFrom(und, deg).orderBy("id")
  }

  /** Canonical undirected edge set + degree table — shared by
    * [[triangleCounts]] and [[clusteringCoefficients]] so composing them
    * never pays the distinct/degree shuffles twice. */
  private def canonicalize(edges: DataFrame): (DataFrame, DataFrame) = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    (und, deg)
  }

  /** [[triangleCounts]] body without the output ordering (internal
    * consumers re-join on id immediately — a global sort there is pure
    * waste). */
  private def triangleCountsFrom(und: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
    val w1 = oriented.select(col("u"), col("v"), col("dv"))
    val w2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = w1.join(w2, "u")
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val tri = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .select(col("u").as("ta"), col("v").as("tb"), col("w").as("tc"))
    tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** Per-node CLUSTERING COEFFICIENT — triangles normalized by wedge
    * capacity: cc_bp = 2·tri·10000 div (deg·(deg−1)) for deg ≥ 2 (integer
    * basis points, truncation; deg-1 nodes have no defined coefficient
    * and are emitted with cc_bp = 0 alongside their degree so the output
    * still covers every node). Composes [[triangleCounts]] with the
    * degree table — same join shapes, plus one broadcast-able left join
    * of the node-sized triangle counts. */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val (und, deg) = canonicalize(edges)
    deg.join(triangleCountsFrom(und, deg), Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          expr("(2 * coalesce(n_tri, 0L) * 10000) div (deg * (deg - 1))"))
          .otherwise(0L).as("cc_bp"))
      .orderBy("id")
  }

  /** The DuckDB replay of [[triangleCounts]] over an edge relation named
    * `e0(src, dst)` (callers prepend the WITH chain defining it). */
  val triangleOracleSql: String = """
      und AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM e0 WHERE src <> dst),
      deg AS MATERIALIZED (
        SELECT id, count(*)::BIGINT AS deg FROM (
          SELECT a AS id FROM und UNION ALL SELECT b FROM und)
        GROUP BY id),
      o AS MATERIALIZED (
        SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
                    THEN a ELSE b END AS u,
               CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
                    THEN b ELSE a END AS v,
               CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
                    THEN db.deg ELSE da.deg END AS dv
        FROM und
        JOIN deg da ON da.id = und.a
        JOIN deg db ON db.id = und.b),
      tri AS (
        SELECT w1.u AS ta, w1.v AS tb, w2.v AS tc
        FROM o w1 JOIN o w2 ON w1.u = w2.u
        JOIN o e ON e.u = w1.v AND e.v = w2.v
        WHERE w1.dv < w2.dv OR (w1.dv = w2.dv AND w1.v < w2.v))"""

  /** The unrolled-CTE DuckDB oracle for [[pagerankInt]] over an edge
    * relation named `edges(src, dst)` (callers prepend the WITH chain that
    * defines it). Kept next to the operator so the two recurrences can be
    * reviewed side by side. */
  def pagerankOracleSql(iters: Int, scale: Long = 1000000000L): String = {
    val rounds = (1 to iters).map { t =>
      s"""it$t AS (
           SELECT nd.id,
                  (${15L * scale} // (100 * (SELECT nn FROM cnt))
                    + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS pr
           FROM nodes nd LEFT JOIN (
             SELECT e.dst AS id, sum(p.pr // o.od) AS s
             FROM edges e
             JOIN it${t - 1} p ON p.id = e.src
             JOIN outdeg o ON o.src = e.src
             GROUP BY e.dst) s ON s.id = nd.id)"""
    }.mkString(",\n")
    s"""
      nodes AS (SELECT DISTINCT id FROM (
                  SELECT src AS id FROM edges
                  UNION SELECT dst FROM edges)),
      outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
      cnt AS (SELECT count(*) AS nn FROM nodes),
      it0 AS (SELECT id, ($scale // (SELECT nn FROM cnt))::BIGINT AS pr
              FROM nodes),
      $rounds"""
  }
}
