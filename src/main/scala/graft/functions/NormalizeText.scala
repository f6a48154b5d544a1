package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for corpus hygiene: NFC composition, or
  * accent stripping (NFD + combining-mark removal). Spark ships no
  * normalizer built-in, and a Scala UDF would box every row; this is a
  * codegen'd expression calling one static JVM method (the JDK's
  * `java.text.Normalizer`), so it composes with whole-stage codegen like
  * any built-in.
  *
  * Canonicalize BEFORE hashing/shingling: visually-identical strings with
  * different codepoint sequences (é as U+00E9 vs e+U+0301) otherwise
  * land in different dedup buckets.
  */
case class NormalizeText(child: Expression, stripAccents: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String], stripAccents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.compute($c, $stripAccents);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeText {

  private val Marks = "\\p{M}+".r

  def compute(s: UTF8String, stripAccents: Boolean): UTF8String = {
    val str = s.toString
    val out =
      if (stripAccents)
        // recompose after mark removal so composed non-Latin text (Hangul
        // syllables, kana) comes back in NFC rather than staying decomposed;
        // idempotent, and a no-op for the Latin/ASCII range
        Normalizer.normalize(
          Marks.replaceAllIn(Normalizer.normalize(str, Normalizer.Form.NFD), ""),
          Normalizer.Form.NFC)
      else if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) str
      else Normalizer.normalize(str, Normalizer.Form.NFC)
    if (out eq str) s else UTF8String.fromString(out)
  }
}
