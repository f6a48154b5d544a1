package graft.functions

import java.util.{LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-gram shingles of a token array, first-occurrence order.
  *
  * Equivalent to
  * `array_distinct(transform(sequence(1, size(w)-k+1), i -> concat_ws(' ', w[i-1..i+k-2])))`
  * but a single codegen'd pass: Spark's higher-order lambdas are
  * interpreted per element, which dominates the shingling stage of the
  * near-dup pipeline; this kernel is the difference between the shingle
  * scan being bound by CPU interpretation and by Parquet IO.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new JLinkedHashSet[UTF8String]((n - k + 1) * 2)
    var i = 0
    while (i <= n - k) {
      var len = k - 1 // separators
      var j = 0
      while (j < k) { len += arr.getUTF8String(i + j).numBytes(); j += 1 }
      val bytes = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < k) {
        if (j > 0) { bytes(off) = ' '; off += 1 }
        val s = arr.getUTF8String(i + j)
        s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += s.numBytes()
        j += 1
      }
      seen.add(UTF8String.fromBytes(bytes))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
