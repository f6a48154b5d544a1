package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native kernels for product quantization (PQ).
  *
  * PQ splits a d-dim vector into `m` subvectors and replaces each with the
  * id of its nearest per-subspace centroid (`ksub` centroids per
  * subspace): d*4 float bytes become m code bytes (d=64, m=8 -> 32x). A
  * query never decodes the corpus; it precomputes a lookup table of
  * subspace dot products and scans codes with `m` table lookups per vector
  * (asymmetric distance computation) — the representation that makes a
  * 100 TB vector scan IO- and cache-bound instead of FLOP-bound. See
  * Jegou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search" (TPAMI 2011).
  *
  * Both expressions are primitive loops with `doGenCode` — no UDF, no
  * per-row allocation beyond the code array itself.
  */

/** argmin-per-subspace encoder: vector (array<float|double>) -> m code
  * bytes. The codebook ([m][ksub][d/m] doubles) is embedded as a
  * plan-literal reference object, not a child expression — it is
  * metadata-sized and identical for every row. */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression with VectorArrayHelpers {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, prettyName)

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], isFloat, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernels.encode($c, $isFloat, $cb);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** Asymmetric-distance score: Σ_j lut[j*ksub + codes[j]] over an
  * array<tinyint> code column and a per-query array<double> lookup table
  * of size m*ksub. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<tinyint>, array<double>), got $other")
  }

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqKernels.adc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.functions.PqKernels.adc($c, $l, $ksub);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)

  override def prettyName: String = "pq_adc_score"
}

object PqKernels {

  /** Nearest centroid per subspace by expanded L2: argmin_c(||s-c||^2) =
    * argmin_c(||c||^2 - 2<s,c>) — ||s||^2 is constant per subspace. */
  def encode(v: ArrayData, vFloat: Boolean, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val sub = cb(0)(0).length
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cents = cb(j)
      val off = j * sub
      var best = 0
      var bestScore = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val ctr = cents(c)
        var dot = 0.0
        var c2 = 0.0
        var i = 0
        while (i < sub) {
          val x = if (vFloat) v.getFloat(off + i).toDouble else v.getDouble(off + i)
          dot += x * ctr(i)
          c2 += ctr(i) * ctr(i)
          i += 1
        }
        val score = c2 - 2.0 * dot
        if (score < bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    new GenericArrayData(out)
  }

  def adc(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += lut.getDouble(j * ksub + (codes.getByte(j) & 0xff))
      j += 1
    }
    acc
  }
}
