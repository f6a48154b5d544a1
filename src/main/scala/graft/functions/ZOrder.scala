package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native kernels for Z-order (Morton-curve) data layout.
  *
  * Multi-column clustering: each clustering column is binned to a bounded
  * integer rank, the ranks' bits are interleaved MSB-first, and rows
  * sorted by the resulting code land near rows that are close in EVERY
  * clustering dimension — so per-file min/max ranges become tight boxes
  * and a predicate on ANY subset of the columns skips most files. The
  * technique behind lakehouse OPTIMIZE ZORDER BY; at 100 TB this is the
  * difference between scanning a table and scanning a few percent of it
  * for multi-dimensional slices. See `operators.ZOrderLayout`.
  */
object ZOrderKernels {

  /** Number of cut points <= v over a sorted array (upper-bound binary
    * search): the equi-depth bin index in [0, cuts.length]. */
  def bin(v: Double, cuts: Array[Double]): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Interleave the low `bitsPer` bits of each rank MSB-first into one
    * long. ranks.length * bitsPer must be <= 63. */
  def interleave(ranks: ArrayData, bitsPer: Int): Long = {
    val n = ranks.numElements()
    var out = 0L
    var b = bitsPer - 1
    while (b >= 0) {
      var i = 0
      while (i < n) {
        out = (out << 1) | ((ranks.getInt(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    out
  }
}

/** Morton code: array<int> ranks + int bitsPer (literal) -> long,
  * interleaved MSB-first round-robin (codegen'd). */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, int), got $other")
  }

  override def nullSafeEval(ranks: Any, bits: Any): Any =
    ZOrderKernels.interleave(ranks.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, b) =>
      s"${ev.value} = graft.functions.ZOrderKernels.interleave($r, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): InterleaveBits =
    copy(left = l, right = r)

  override def prettyName: String = "interleave_bits"
}

/** value -> equi-depth rank via a sorted literal cut-point array
  * (codegen'd binary search). Cuts come from bounded driver-side approx
  * quantiles, so ranks stay equi-populated under skew — unlike uniform
  * width_bucket binning, which collapses a skewed column onto a few
  * bins and destroys the interleave. */
case class QuantileBinSearch(child: Expression, cuts: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double input, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ZOrderKernels.bin(v.asInstanceOf[Double], cuts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("zorderCuts", cuts, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ZOrderKernels.bin($c, $cutsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileBinSearch =
    copy(child = newChild)

  override def prettyName: String = "quantile_bin"
}
