package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native ordered-k-gram md5 kernel: the full 128-bit md5 (lowercase hex)
  * of every ordered token k-gram, one tight pass per document.
  *
  * Value-identical to the composable formulation
  * `transform(sequence(1, n-k+1), i -> md5(concat_ws(' ', slice(w, i, k))))`
  * — md5 over the UTF-8 bytes of the space-joined gram — but the HOF chain
  * evaluates an interpreted lambda with k string concatenations and a
  * UTF8String round-trip PER POSITION outside codegen; this kernel feeds
  * the token bytes straight into the digest (the WinnowSelect recipe,
  * keeping all 128 bits instead of the 60-bit prefix: at a 10^13-gram
  * corpus a 64-bit key expects thousands of collisions — each a false
  * duplicate mark — while 128 bits stay collision-free). ~6x on the sf0.1
  * substring-dedup queries; parity pinned in SubstringDedupSpec. */
case class GramMd5(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got $other")
  }

  override def nullSafeEval(tokens: Any): Any =
    GramKernels.md5Grams(tokens.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramKernels.md5Grams($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): GramMd5 =
    copy(child = newChild)

  override def prettyName: String = "gram_md5"
}

object GramKernels {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val space = " ".getBytes("UTF-8")
  private val hex = "0123456789abcdef".toCharArray

  /** md5 hex of each ordered k-gram of `tokens`, in position order
    * (m = n - k + 1 entries); empty for arrays shorter than k — total for
    * any input, like WinnowKernels.select. */
  def md5Grams(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    val md = mdLocal.get()
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(space)
        md.update(tokens.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      val chars = new Array[Char](32)
      var b = 0
      while (b < 16) {
        chars(2 * b) = hex((d(b) >> 4) & 0xf)
        chars(2 * b + 1) = hex(d(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(chars))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All n-character grams of the LOWERCASED text in position order
    * (m = numChars - n + 1 entries); empty for texts shorter than n.
    * Lowercases once, walks the UTF-8 code-point boundaries once, then
    * slices each gram by byte range — O(len·n) total where the HOF
    * formulation (an interpreted lambda re-lowercasing the whole text
    * per position) is O(len²). Boundary walk mirrors
    * UTF8String.numChars, so the gram count agrees with SQL `length`;
    * offsets are clamped so a malformed trailing multi-byte sequence
    * degrades to a short final gram instead of an out-of-range slice. */
  def charGrams(text: UTF8String, n: Int): ArrayData = {
    val lt = text.toLowerCase
    val len = lt.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val bytes = lt.getBytes
    val starts = new Array[Int](len + 1)
    var off = 0
    var c = 0
    while (c < len) {
      starts(c) = off
      off = math.min(
        off + UTF8String.numBytesForFirstByte(bytes(off)), bytes.length)
      c += 1
    }
    starts(len) = off
    val m = len - n + 1
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + n) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native char-n-gram extraction: the fastText-lid feature space
  * ([[graft.operators.TextAnalysis.charNgrams]] delegates here).
  * Value-identical to the composable
  * `transform(sequence(1, length(lower(t))-n+1), i -> substr(lower(t), i, n))`
  * — lowercase first, then every width-n code-point window over the
  * LOWERCASED text's length (lowercasing can change code-point counts,
  * e.g. U+0130) — but that
  * chain evaluates an interpreted lambda OUTSIDE codegen whose body
  * re-lowercases the entire text once per position (higher-order
  * lambdas inline their argument expression): O(len²) per document.
  * This kernel is one codegen'd call per row. Parity with the HOF
  * formulation and the DuckDB comprehension is pinned in
  * LangIdTrainedSpec. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string text, got $other")
  }

  override def nullSafeEval(text: Any): Any =
    GramKernels.charGrams(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramKernels.charGrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)

  override def prettyName: String = "char_ngrams"
}
