package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native winnowing kernel: ordered k-gram md5-prefix hashes + per-window
  * minima + distinct, in one primitive pass per document.
  *
  * Value-identical to the composable formulation
  * `array_distinct(transform(windows, j -> array_min(slice(grams, j, w))))`
  * with `grams = conv(substring(md5(gram), 1, 15), 16, 10)` — the 60-bit
  * hash is the big-endian first 8 digest bytes >>> 4, exactly the first 15
  * hex chars — but the HOF chain allocates a lambda evaluation, a string
  * hex round-trip and an array slice PER GRAM outside codegen; this kernel
  * hashes the UTF-8 bytes directly and slides the window in a tight loop
  * (~10x on the sf0.1 fingerprint queries). Sorted ascending output (the
  * selected SET is what matters; every consumer aggregates or joins). */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got $other")
  }

  override def nullSafeEval(tokens: Any): Any =
    WinnowKernels.select(tokens.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKernels.select($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)

  override def prettyName: String = "winnow_select"
}

object WinnowKernels {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val space = " ".getBytes("UTF-8")

  /** Selected fingerprints (sorted, distinct) of a token array. A token
    * array shorter than k has no k-grams and yields the EMPTY set (not a
    * NegativeArraySizeException) — callers like Dedup.winnowFingerprints
    * prefilter size >= k, but the kernel must stay total for any future
    * SQL-registered use. */
  def select(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val md = mdLocal.get()
    val grams = new Array[Long](m)
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
      // first 15 hex chars == big-endian first 8 bytes >>> 4 (60 bits)
      var acc = 0L
      var b = 0
      while (b < 8) { acc = (acc << 8) | (d(b) & 0xffL); b += 1 }
      grams(i) = acc >>> 4
      i += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    if (m < w) {
      var mn = java.lang.Long.MAX_VALUE
      var t = 0
      while (t < m) { if (grams(t) < mn) mn = grams(t); t += 1 }
      out.add(mn)
    } else {
      var j = 0
      while (j <= m - w) {
        var mn = java.lang.Long.MAX_VALUE
        var t = j
        while (t < j + w) { if (grams(t) < mn) mn = grams(t); t += 1 }
        out.add(mn)
        j += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }
}
