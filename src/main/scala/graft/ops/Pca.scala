package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Integer-exact TOP PRINCIPAL COMPONENT by power iteration — the
  * variance-direction diagnostic of an embedding corpus (is the energy
  * concentrated? what does the PQ pre-rotation have to undo? — the
  * companion analysis to `vec_rot_hadamard`). Components are quantized to
  * integer 1e-4 units with floor (floor, not round or cast: DuckDB's
  * double→int cast ROUNDS while the JVM's truncates, and round() itself
  * disagrees across engines on half-boundaries — floor is the one
  * float→int bridge both engines compute identically), and from there
  * everything is exact integer arithmetic:
  *
  *   C        = n·Σ q qᵀ − (Σq)(Σq)ᵀ   (the scaled covariance — exact,
  *                                      no rational means anywhere)
  *   v_0      = scale·e_0
  *   w        = C v_k                   (exact big-integer products)
  *   v_k+1    = trunc(w·scale / max|w|) (max-norm rescale; division
  *                                      truncates toward zero = DuckDB's
  *                                      HUGEINT `//` = BigInt `/`)
  *
  * so the K-step iterate is bit-identical on any engine and the DuckDB
  * oracle replays it as K unrolled CTEs over the 64-cell vector
  * ([[oracleSql]]). Sign is pinned by the deterministic start vector.
  *
  * Scale shape: the ONLY corpus-scale work is the moment aggregation —
  * a typed Aggregator accumulating (n, Σq, upper-triangular Σ q_i q_j) in
  * ONE pass with map-side partials and array-add merges (dim·(dim+3)/2
  * Longs of state; the 64²-explode the SQL oracle uses would be a 4096×
  * row blow-up on Spark). The dim×dim solve runs on the driver in
  * microseconds at any corpus size. Long partials overflow only past
  * ~9·10¹⁰ rows per partition (products are ≤ scale² each) — shard the
  * aggregation or widen to DECIMAL beyond. */
object Pca {

  /** One-pass moment accumulator: buffer = [n, m_0..m_{d-1},
    * s_00, s_01, .., s_0(d-1), s_11, ..] (upper triangle, row-major). */
  private final class MomentAgg(dim: Int)
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    private val len = 1 + dim + dim * (dim + 1) / 2
    def zero: Array[Long] = new Array[Long](len)
    def reduce(b: Array[Long], q: Seq[Long]): Array[Long] = {
      val qa = q.toArray
      b(0) += 1L
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        b(1 + i) += qa(i)
        var j = i
        while (j < dim) { b(t) += qa(i) * qa(j); t += 1; j += 1 }
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder = ExpressionEncoder[Array[Long]]()
    def outputEncoder = ExpressionEncoder[Array[Long]]()
  }

  /** Truncating division toward zero — DuckDB's `//` semantics (on the
    * pinned 1.0.0, integer `//` truncates toward zero on BIGINT and
    * HUGEINT alike — verified empirically: (-7)::BIGINT // 2 = -3, same
    * as the projectHistogram/KMeansInt note; every division in this
    * recurrence is HUGEINT on the oracle side, and Scala BigInt `/`
    * truncates identically). */
  private def fd(a: BigInt, b: BigInt): BigInt = a / b

  /** The quantized component arrays `q` of `vectors(embedding)`. */
  private def quantized(vectors: DataFrame, scale: Long) =
    vectors.select(expr(
      s"transform(embedding, x -> cast(floor(cast(x as double) * $scale) as bigint))")
      .as("q"))

  /** One corpus pass + the driver solve: (direction, share_bp). */
  private def solve(
      vectors: DataFrame, dim: Int, iters: Int,
      scale: Long): (Array[BigInt], Long) = {
    val s = vectors.sparkSession
    import s.implicits._
    val buf = quantized(vectors, scale).as[Seq[Long]]
      .select(new MomentAgg(dim).toColumn).head()
    val n = BigInt(buf(0))
    require(n > 0, "empty corpus")
    val m = Array.tabulate(dim)(i => BigInt(buf(1 + i)))
    val c = Array.ofDim[BigInt](dim, dim)
    var t = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      val v = n * BigInt(buf(t)) - m(i) * m(j)
      t += 1
      c(i)(j) = v
      c(j)(i) = v
    }
    var v = Array.tabulate(dim)(i => if (i == 0) BigInt(scale) else BigInt(0))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c(i)(j) * v(j)).sum)
      val smax = w.map(_.abs).max
      require(smax > 0, "degenerate moment matrix (zero variance)")
      v = w.map(x => fd(x * scale, smax))
    }
    val vtcv = (for { i <- 0 until dim; j <- 0 until dim }
      yield c(i)(j) * v(i) * v(j)).sum
    val vtv = v.map(x => x * x).sum
    val tr = (0 until dim).map(i => c(i)(i)).sum
    (v, fd(fd(vtcv * 10000, vtv), tr).toLong)
  }

  /** Top component of `vectors(embedding: array<float>)` after `iters`
    * max-norm power steps. Returns (dim_idx, v_bp, share_bp): the scaled
    * direction and the Rayleigh-quotient share of total variance in basis
    * points (repeated per row so one hash pins both). */
  def topComponent(
      vectors: DataFrame, dim: Int = 64, iters: Int = 24,
      scale: Long = 10000L): DataFrame = {
    val s = vectors.sparkSession
    val (v, share) = solve(vectors, dim, iters, scale)
    val rows = (0 until dim).map(i => Row(i.toLong, v(i).toLong, share))
    val schema = StructType(Seq(
      StructField("dim_idx", LongType, nullable = false),
      StructField("v_bp", LongType, nullable = false),
      StructField("share_bp", LongType, nullable = false)))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
      .orderBy("dim_idx")
  }

  /** Corpus DISTRIBUTION along the top component: every vector's exact
    * integer projection Σ q_i·v_i, bucketed at `bucket` units — the
    * "is the corpus bimodal along its main axis?" diagnostic (a bimodal
    * histogram argues for cluster-then-compress over one global
    * codebook). The solve runs once on the driver; the projection is a
    * zero-shuffle map against the broadcast 64-long direction (array
    * literal folded into codegen), and the histogram partial-aggregates
    * map-side. Buckets are TRUNCATING division on both engines (Spark
    * `div` ≡ DuckDB `//` — DuckDB's integer division truncates toward
    * zero on BIGINT and HUGEINT alike, the KMeansInt finding), so bucket
    * 0 spans (−B, B) and every other bucket is B wide — valid for any
    * positive width with no hidden offset contract. */
  def projectHistogram(
      vectors: DataFrame, dim: Int = 64, iters: Int = 24,
      scale: Long = 10000L, bucket: Long = 100000000L): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    val (v, _) = solve(vectors, dim, iters, scale)
    val vLit = v.map(_.toLong).mkString("array(", "L, ", "L)")
    quantized(vectors, scale)
      .select(expr(
        s"aggregate(zip_with(q, $vLit, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
        .as("pr"))
      .select(expr(s"pr div ${bucket}L").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
      .orderBy("bucket")
  }

  /** The unrolled-CTE DuckDB replay of [[topComponent]] over a relation
    * `q(vec_id, i, q)` (callers prepend its definition). The oracle pays
    * the 64²-explode pair join Spark's one-pass Aggregator avoids — at
    * fixture scale that is the cheap, obviously-correct form. */
  def oracleSql(dim: Int, iters: Int, scale: Long = 10000L): String = {
    val rounds = (1 to iters).map { k =>
      s"""it$k AS MATERIALIZED (
           SELECT t.i, (t.w * $scale) // (max(abs(t.w)) OVER ()) AS v
           FROM (SELECT c.i, sum(c.v * p.v) AS w
                 FROM c JOIN it${k - 1} p ON p.i = c.j
                 GROUP BY c.i) t)"""
    }.mkString(",\n")
    s"""
      sm AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j, sum(a.q::HUGEINT * b.q)::HUGEINT AS s
        FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2),
      mv AS MATERIALIZED (
        SELECT i, sum(q)::HUGEINT AS m FROM q GROUP BY i),
      nn AS MATERIALIZED (
        SELECT count(DISTINCT vec_id)::HUGEINT AS n FROM q),
      c AS MATERIALIZED (
        SELECT s.i, s.j, (SELECT n FROM nn) * s.s - ma.m * mb.m AS v
        FROM sm s JOIN mv ma ON ma.i = s.i JOIN mv mb ON mb.i = s.j),
      it0 AS MATERIALIZED (
        SELECT i, (CASE WHEN i = 0 THEN $scale ELSE 0 END)::HUGEINT AS v
        FROM range(0, $dim) t(i)),
      $rounds,
      ray AS MATERIALIZED (
        SELECT (SELECT sum(c.v * pa.v * pb.v) FROM c
                JOIN it$iters pa ON pa.i = c.i
                JOIN it$iters pb ON pb.i = c.j) AS vtcv,
               (SELECT sum(v * v) FROM it$iters) AS vtv,
               (SELECT sum(v) FROM c WHERE i = j) AS tr)"""
  }
}
