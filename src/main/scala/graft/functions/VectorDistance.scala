package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the hot distance kernels (SURVEY.md §2.3
  * "engine design": codegen Expressions for the hot metrics, HOF fallbacks
  * for the rest; the reference reaches the same point with simsimd SIMD
  * kernels, src/distance.rs:23-47).
  *
  * Against the `zip_with`/`aggregate` higher-order-function formulation this
  * removes two intermediate ArrayData allocations per row and keeps the fold
  * in a tight primitive loop inside whole-stage codegen — the JIT
  * auto-vectorizes it. The accumulation order and arithmetic are IDENTICAL
  * to the HOF version (ascending component index, double precision), so
  * results — and the DuckDB oracle hashes — are bit-for-bit unchanged.
  *
  * Element types FLOAT and DOUBLE are read natively (no upfront array
  * cast); each element is widened to double exactly as `asDouble` did.
  * Mismatched lengths fold over the common prefix; null elements read as 0
  * (fixture arrays are containsNull=false).
  */
final case class VectorDistance(
    left: Expression, right: Expression, op: VectorDistance.Op)
    extends BinaryExpression with Serializable {

  override def dataType: DataType =
    if (op == VectorDistance.Hamming) LongType else DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_${op.name} expects ARRAY<FLOAT|DOUBLE> inputs, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left)
    val yf = elemIsFloat(right)
    var acc = 0.0
    var accB = 0.0
    var accC = 0.0
    var accL = 0L
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      op match {
        case VectorDistance.Hamming =>
          accL += java.lang.Integer.bitCount(
            java.lang.Float.floatToRawIntBits(xi.toFloat) ^
              java.lang.Float.floatToRawIntBits(yi.toFloat))
        case VectorDistance.Dot => acc += xi * yi
        case VectorDistance.L2Sq => val d = xi - yi; acc += d * d
        case VectorDistance.Manhattan => acc += math.abs(xi - yi)
        case VectorDistance.Cosine | VectorDistance.CosineSim =>
          acc += xi * yi; accB += xi * xi; accC += yi * yi
        case VectorDistance.Chebyshev =>
          val d = math.abs(xi - yi); if (d > acc) acc = d
        case VectorDistance.Canberra =>
          val den = math.abs(xi) + math.abs(yi)
          acc += (if (den == 0.0) 0.0 else math.abs(xi - yi) / den)
        case VectorDistance.BrayCurtis =>
          acc += math.abs(xi - yi); accB += math.abs(xi + yi)
        case VectorDistance.PNorm(p) => acc += math.pow(math.abs(xi - yi), p)
      }
      i += 1
    }
    op match {
      case VectorDistance.Cosine =>
        val denom = math.sqrt(accB) * math.sqrt(accC)
        if (denom == 0.0) 1.0 else 1.0 - acc / denom
      case VectorDistance.CosineSim =>
        val denom = math.sqrt(accB) * math.sqrt(accC)
        if (denom == 0.0) 0.0 else acc / denom
      case VectorDistance.BrayCurtis =>
        if (accB == 0.0) 0.0 else acc / accB
      case VectorDistance.Hamming => accL
      case _ => acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val accB = ctx.freshName("accB")
      val accC = ctx.freshName("accC")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val d = ctx.freshName("d")
      val denom = ctx.freshName("denom")
      def get(arr: String, idx: String, isFloat: Boolean): String =
        if (isFloat) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      val gx = get(a, i, elemIsFloat(left))
      val gy = get(b, i, elemIsFloat(right))
      val accL = ctx.freshName("accL")
      val body = op match {
        case VectorDistance.Hamming =>
          s"""$accL += java.lang.Integer.bitCount(
             |  java.lang.Float.floatToRawIntBits((float) $xi) ^
             |  java.lang.Float.floatToRawIntBits((float) $yi));""".stripMargin
        case VectorDistance.Dot => s"$acc += $xi * $yi;"
        case VectorDistance.L2Sq => s"double $d = $xi - $yi; $acc += $d * $d;"
        case VectorDistance.Manhattan => s"$acc += java.lang.Math.abs($xi - $yi);"
        case VectorDistance.Cosine | VectorDistance.CosineSim =>
          s"$acc += $xi * $yi; $accB += $xi * $xi; $accC += $yi * $yi;"
        case VectorDistance.Chebyshev =>
          s"double $d = java.lang.Math.abs($xi - $yi); if ($d > $acc) $acc = $d;"
        case VectorDistance.Canberra =>
          s"""double $d = java.lang.Math.abs($xi) + java.lang.Math.abs($yi);
             |$acc += ($d == 0.0D) ? 0.0D : java.lang.Math.abs($xi - $yi) / $d;""".stripMargin
        case VectorDistance.BrayCurtis =>
          s"$acc += java.lang.Math.abs($xi - $yi); $accB += java.lang.Math.abs($xi + $yi);"
        case VectorDistance.PNorm(p) =>
          s"$acc += java.lang.Math.pow(java.lang.Math.abs($xi - $yi), ${p}D);"
      }
      val finish = op match {
        case VectorDistance.Cosine =>
          s"""double $denom = java.lang.Math.sqrt($accB) * java.lang.Math.sqrt($accC);
             |${ev.value} = ($denom == 0.0D) ? 1.0D : 1.0D - $acc / $denom;""".stripMargin
        case VectorDistance.CosineSim =>
          s"""double $denom = java.lang.Math.sqrt($accB) * java.lang.Math.sqrt($accC);
             |${ev.value} = ($denom == 0.0D) ? 0.0D : $acc / $denom;""".stripMargin
        case VectorDistance.BrayCurtis =>
          s"${ev.value} = ($accB == 0.0D) ? 0.0D : $acc / $accB;"
        case VectorDistance.Hamming => s"${ev.value} = $accL;"
        case _ => s"${ev.value} = $acc;"
      }
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0D;
         |double $accB = 0.0D;
         |double $accC = 0.0D;
         |long $accL = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $gx;
         |  double $yi = $gy;
         |  $body
         |}
         |$finish
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDistance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = s"vector_${op.name}"
}

object VectorDistance {
  sealed abstract class Op(val name: String) extends Serializable
  case object Dot extends Op("dot")
  case object L2Sq extends Op("l2sq")
  case object Manhattan extends Op("manhattan")
  case object Cosine extends Op("cosine")
  case object CosineSim extends Op("cosine_sim")
  case object Chebyshev extends Op("chebyshev")
  case object Canberra extends Op("canberra")
  case object BrayCurtis extends Op("braycurtis")
  /** M10: popcount of XOR over the components' FLOAT bit patterns (full
    * 32 bits; LongType output). Double inputs narrow to float first —
    * identical to the UDF it replaces. */
  case object Hamming extends Op("hamming")
  /** Σ|xᵢ−yᵢ|^p — Minkowski composes as pow(·, 1/p) outside. */
  final case class PNorm(p: Double) extends Op(s"pnorm_$p")

  def apply(a: Column, b: Column, op: Op): Column =
    ColumnBridge.column(VectorDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b), op))
}
