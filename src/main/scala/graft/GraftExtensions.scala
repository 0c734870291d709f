package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.VectorDistance

/** SparkSessionExtensions entry point: makes the engine's native vector
  * kernels first-class SQL functions —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT vector_cosine(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * (the preferred route for whole-cluster installs; for an existing session
  * use [[GraftFunctions.register]]). This is the engine's analogue of the
  * reference's pluggable `Metric` trait being usable everywhere a distance
  * is needed (space::Metric, reference src/distance.rs:19). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  private def mk(name: String, op: VectorDistance.Op)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(classOf[VectorDistance].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name expects exactly 2 array arguments")
        VectorDistance(children(0), children(1), op)
      })

  /** `vector_pnorm(a, b, p)` — p must be a foldable literal (it selects the
    * codegen kernel at plan time, like the reference's compile-time
    * `PNormDistance{p}` parameter, distance.rs:176-190). */
  private def mkPNorm(name: String)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(classOf[VectorDistance].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 3, s"$name expects (array, array, p)")
        require(children(2).foldable, s"$name: p must be a literal")
        val p = children(2).eval() match {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue
          case other => throw new IllegalArgumentException(
            s"$name: p must be numeric, got $other")
        }
        VectorDistance(children(0), children(1), VectorDistance.PNorm(p))
      })

  val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    mk("vector_dot", VectorDistance.Dot),
    mk("vector_l2sq", VectorDistance.L2Sq),
    mk("vector_manhattan", VectorDistance.Manhattan),
    mk("vector_cosine", VectorDistance.Cosine),
    mk("vector_cosine_sim", VectorDistance.CosineSim),
    mk("vector_chebyshev", VectorDistance.Chebyshev),
    mk("vector_canberra", VectorDistance.Canberra),
    mk("vector_braycurtis", VectorDistance.BrayCurtis),
    mkPNorm("vector_pnorm"))

  /** Register into an already-running session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, info, builder) =>
      ColumnBridge.registerFunction(spark, name, info, builder)
    }
}
