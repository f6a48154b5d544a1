package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Blocked exact all-pairs cosine scoring — the kernel behind
  * `Dedup.embeddingCosinePairsExact`'s fast path. Each input is one
  * BLOCK of vectors, array<struct<id: bigint, v: array<float|double>,
  * nrm: double>>; the kernel scores every cross pair of the two blocks
  * (upper triangle only when `same` says both sides are the same block)
  * and returns the pairs at or above `minCosine` as
  * array<struct<vec_id_1, vec_id_2, cosine>> with vec_id_1 < vec_id_2.
  *
  * Why a kernel: the former formulation was a broadcast nested-loop
  * cross join whose every candidate pair materialized a joined row
  * CARRYING BOTH d-float vectors (a ~0.5 KB row copy per pair at d=64)
  * before the dot product ran — per-pair join machinery dominated the
  * arithmetic several times over. Here the join moves one row per BLOCK
  * PAIR and the inner loop touches the vectors in place, so the per-pair
  * cost is the dot product itself.
  *
  * Bit-exactness vs the join formulation: the dot accumulates in double
  * in index order over min-length (VectorKernels.dot — the same kernel
  * vec_dot compiles to), IEEE multiplication commutes so pair
  * orientation cannot change the value, and the threshold keeps
  * `cosine >= minCosine` semantics for every REAL cosine. Zero-norm
  * vectors score NaN and DROP here (Java `>=` is false on NaN) — note
  * this is NOT what a raw Spark `col >= lit` filter does (Spark's
  * nan-safe ordering sorts NaN above all values, so NaN >= x is TRUE);
  * `Dedup.embeddingCosinePairsExact` pre-filters `nrm > 0` on its join
  * fallback so both paths agree on the NaN-drop contract. Pairs of
  * EQUAL ids never emit — the strict `vec_id_1 < vec_id_2` contract.
  */
case class CosinePairsBlock(first: Expression, second: Expression,
    third: Expression, minCosine: Double)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id_1", LongType, nullable = false),
    StructField("vec_id_2", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)

  private def blockOk(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _),
      StructField(_, ArrayType(FloatType, _), _, _),
      StructField(_, DoubleType, _, _))), _) => true
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _),
      StructField(_, ArrayType(DoubleType, _), _, _),
      StructField(_, DoubleType, _, _))), _) => true
    case _ => false
  }

  private lazy val vecIsFloat = first.dataType match {
    case ArrayType(StructType(Array(_, StructField(_, ArrayType(FloatType, _), _, _), _)), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!blockOk(first.dataType) || first.dataType != second.dataType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two identical array<struct<bigint, " +
          s"array<float|double>, double>> blocks, got ${first.dataType} " +
          s"and ${second.dataType}")
    else if (third.dataType != BooleanType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a boolean same-block flag, got ${third.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any, same: Any): Any =
    CosinePairsBlock.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      same.asInstanceOf[Boolean], vecIsFloat, minCosine)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, s) =>
      s"${ev.value} = graft.functions.CosinePairsBlock.score($a, $b, $s, " +
        s"$vecIsFloat, $minCosine);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): CosinePairsBlock = copy(first = f, second = s, third = t)

  override def prettyName: String = "cosine_pairs_block"
}

/** Max cosine of one vector against a BLOCK of vectors — the kernel
  * behind the semantic-decontamination "max eval cosine" passes. Inputs:
  * the probe vector (array<float|double>), its precomputed L2 norm
  * (double), and the eval block as array<struct<v: array<float|double>,
  * nrm: double>>. Returns the UNROUNDED maximum of
  * dot(v, e.v) / (nrm * e.nrm) over the block, or NULL for an empty
  * block — exactly what `max(cos)` over the former broadcast
  * nested-loop cross join computed (max over zero rows is null).
  *
  * Bit-exactness vs the join formulation: each cosine is the same
  * index-ordered double accumulation ([[VectorKernels.dot]]) over the
  * same operands; max is order-independent; and NaN wins the max
  * exactly as Spark's nan-safe max aggregate orders NaN above every
  * value (a zero-norm vector on either side yields NaN, which then IS
  * the max). Callers that rounded each pair cosine BEFORE the max can
  * round the kernel's output instead: rounding is monotone
  * non-decreasing, so max(round(x)) == round(max(x)) — pinned by
  * FunctionsSpec. The block join moves one row per (probe, block)
  * instead of one joined row per (probe, eval) pair carrying both
  * vectors — the CosinePairsBlock rationale applied to the max shape. */
case class CosineMaxBlock(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def blockOk(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(Array(
      StructField(_, v, _, _),
      StructField(_, DoubleType, _, _))), _) => vecOk(v)
    case _ => false
  }

  private lazy val probeFloat = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private lazy val blockFloat = third.dataType match {
    case ArrayType(StructType(Array(StructField(_, ArrayType(FloatType, _), _, _), _)), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vecOk(first.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float|double> probe vector, got ${first.dataType}")
    else if (second.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double probe norm, got ${second.dataType}")
    else if (!blockOk(third.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<struct<array<float|double>, double>> " +
          s"block, got ${third.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any, n: Any, b: Any): Any =
    CosineMaxBlock.score(v.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], b.asInstanceOf[ArrayData],
      probeFloat, blockFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, b) => s"""
      |java.lang.Double ${ev.value}_r = graft.functions.CosineMaxBlock.score(
      |  $v, $n, $b, $probeFloat, $blockFloat);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
      |""".stripMargin)

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): CosineMaxBlock = copy(first = f, second = s, third = t)

  override def prettyName: String = "cosine_max_block"
}

object CosineMaxBlock {

  /** Max cosine of (v, nrm) against the block; null on an empty block;
    * NaN wins (Spark's nan-safe max ordering). */
  def score(v: ArrayData, nrm: Double, block: ArrayData,
      probeFloat: Boolean, blockFloat: Boolean): java.lang.Double = {
    val n = block.numElements()
    if (n == 0) return null
    var best = Double.NegativeInfinity
    var sawNaN = false
    var i = 0
    while (i < n && !sawNaN) {
      val e = block.getStruct(i, 2)
      val cos = VectorKernels.dot(v, e.getArray(0), probeFloat, blockFloat) /
        (nrm * e.getDouble(1))
      if (java.lang.Double.isNaN(cos)) sawNaN = true
      else if (cos > best) best = cos
      i += 1
    }
    if (sawNaN) Double.NaN else best
  }
}

object CosinePairsBlock {

  /** Score one block pair. `same = true` means both sides hold the SAME
    * logical block; each unordered pair then appears in the cross
    * product twice — once per orientation — and the strict `ida < idb`
    * guard keeps exactly one, BY ID, not by array position. The former
    * positional upper triangle (`j = i + 1`) silently assumed rows1 and
    * rows2 arrived in identical order, but the arrays come from a
    * non-deterministic `collect_list` evaluated independently on the
    * stream and broadcast sides of the block join: a shuffle-fetch-order
    * difference between the two evaluations would permute one side and
    * the triangle would miss and/or double-emit pairs (r20 advice).
    * ID-keyed orientation is order-independent by construction, and
    * CHEAP: the strict guard runs BEFORE the dot product, so the dot
    * count is unchanged (exactly n(n-1)/2 on a diagonal block, as the
    * positional triangle had) — the full cross product only doubles the
    * per-position struct/id decodes on diagonal blocks, which are
    * 1/(nBlocks+1) of all block pairs. */
  def score(a: ArrayData, b: ArrayData, same: Boolean, vFloat: Boolean,
      minCos: Double): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    var i = 0
    while (i < na) {
      val ra = a.getStruct(i, 3)
      val ida = ra.getLong(0)
      val va = ra.getArray(1)
      val nra = ra.getDouble(2)
      var j = 0
      while (j < nb) {
        val rb = b.getStruct(j, 3)
        val idb = rb.getLong(0)
        // same block: keep one orientation per unordered pair by ID;
        // cross block: every (ida, idb) pair appears exactly once, emit
        // it normalized (equal ids never emit — the strict contract)
        if (if (same) ida < idb else ida != idb) {
          val cos = VectorKernels.dot(va, rb.getArray(1), vFloat, vFloat) /
            (nra * rb.getDouble(2))
          if (cos >= minCos) {
            val (lo, hi) = if (ida < idb) (ida, idb) else (idb, ida)
            out += (new GenericInternalRow(Array[Any](lo, hi, cos)): InternalRow)
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
