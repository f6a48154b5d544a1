package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Content-defined chunk cut points over a binary payload (Gear rolling
  * hash, the primitive behind FastCDC-style storage/corpus dedup).
  *
  * Rolling state: `h = ((h << 1) + gear(b)) mod 2^maskBits` per byte, with
  * `gear(b) = b * 2654435761` (Knuth's multiplicative constant; odd, so the
  * low bits stay a bijection of the byte). A cut is emitted AFTER byte `i`
  * (1-based) whenever `h == 0` — expected chunk length `2^maskBits`. Because
  * the shift ages a byte's contribution out of the modulus after `maskBits`
  * steps, the cut decision at `i` depends on the last `maskBits` bytes ONLY.
  * That windowed-sum identity
  * `h_i = Σ_{j<maskBits} gear(b_{i-j})·2^j mod 2^maskBits` is what makes the
  * boundary rule (a) oracle-expressible as a plain windowed SQL aggregate
  * and (b) shift-invariant: editing a prefix cannot move any cut that lies
  * more than `maskBits` bytes past the edit — the property that makes CDC
  * chunk hashes a stable dedup key where fixed-size chunking would
  * misalign everything downstream of a one-byte insertion.
  *
  * Two modes:
  *  - `minSize = 1, maxSize = 0` (default): the pure stateless rule above —
  *    every position where the window hash is zero cuts. This is the
  *    oracle-checked mode.
  *  - `minSize > 1` and/or `maxSize > 0`: FastCDC-style normalization — the
  *    first `minSize - 1` bytes of each chunk are skipped (not hashed, the
  *    hash restarts after each cut) and a cut is forced at `maxSize` bytes.
  *    Sequential semantics; pinned by CdcSpec against a Scala reference.
  *
  * Returns the 1-based cut positions as `array<int>`, EXCLUDING the final
  * end-of-payload position (so an empty array means "one chunk"). A native
  * codegen expression for the same reason as [[SimHash64]]: the per-byte
  * loop over the whole corpus is the hot path, and Spark's higher-order
  * lambdas would interpret it per element.
  */
case class GearChunkEnds(child: Expression, maskBits: Int,
    minSize: Int = 1, maxSize: Int = 0) extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 30, s"maskBits in [1,30], got $maskBits")
  require(minSize >= 1, s"minSize >= 1, got $minSize")
  require(maxSize == 0 || maxSize >= minSize,
    s"maxSize must be 0 (off) or >= minSize, got $maxSize")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gear_chunk_ends requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    GearChunkEnds.compute(input.asInstanceOf[Array[Byte]], maskBits, minSize, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GearChunkEnds.compute($c, $maskBits, $minSize, $maxSize);")

  override protected def withNewChildInternal(newChild: Expression): GearChunkEnds =
    copy(child = newChild)

  override def prettyName: String = "gear_chunk_ends"
}

object GearChunkEnds {

  /** Gear table entry: byte -> odd-multiplier product (mod is applied by
    * the caller's mask, so the full long product is fine here). */
  @inline def gear(b: Byte): Long = (b & 0xffL) * 2654435761L

  def compute(payload: Array[Byte], maskBits: Int, minSize: Int, maxSize: Int)
      : ArrayData = {
    val n = payload.length
    val mask = (1L << maskBits) - 1L
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var chunkLen = 0
    var i = 0
    while (i < n) {
      chunkLen += 1
      if (chunkLen < minSize) {
        // FastCDC min-size skip: byte joins the chunk but not the hash
      } else {
        h = ((h << 1) + gear(payload(i))) & mask
        val cut = h == 0L || (maxSize > 0 && chunkLen >= maxSize)
        if (cut && i + 1 < n) {
          cuts += (i + 1) // 1-based position of the chunk's last byte
          h = 0L
          chunkLen = 0
        }
      }
      i += 1
    }
    new GenericArrayData(cuts.toArray)
  }
}
