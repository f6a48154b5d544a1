package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/** Generator (UDTF-tier extension): one output row per distinct word
  * k-gram shingle of a token array — `explode(word_shingles(w, k))` fused
  * into a single Generate, with no intermediate shingle ARRAY ever
  * materialized per input row.
  *
  * Distinct/order semantics are byte-identical to `word_shingles`
  * (first-occurrence order): both delegate to `WordShingles.compute`, so
  * the two formulations of the dedup pipeline agree row-for-row
  * (asserted in FunctionsSpec). Generators are the fourth Catalyst
  * extension tier the library exercises, alongside scalar expressions
  * (SimHash64/DotProduct/...), aggregates (WeightedMean, TopKBy) and
  * whole-operator plans (CosineTopK).
  */
case class ShingleGenerator(child: Expression, k: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    new StructType().add("s", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"shingle_rows requires k >= 1, got $k")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_rows requires array<string>, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Iterator.empty
    else {
      val sh = WordShingles.compute(arr.asInstanceOf[ArrayData], k)
      val n = sh.numElements()
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < n
        override def next(): InternalRow = {
          val r = InternalRow(sh.getUTF8String(i)); i += 1; r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)

  override def prettyName: String = "shingle_rows"
}
