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

  val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    mk("vector_dot", VectorDistance.Dot),
    mk("vector_l2sq", VectorDistance.L2Sq),
    mk("vector_manhattan", VectorDistance.Manhattan),
    mk("vector_cosine", VectorDistance.Cosine),
    mk("vector_cosine_sim", VectorDistance.CosineSim))

  /** Register into an already-running session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, info, builder) =>
      ColumnBridge.registerFunction(spark, name, info, builder)
    }
}
