package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Buffer for KmvSketch: the k lexicographically-smallest DISTINCT hash
  * strings seen so far — a bottom-k sketch over a uniform hash space.
  * TreeSet keeps membership + max in O(log k); k is small (64-4096). */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[String]()

  def insert(h: String): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last && !set.contains(h)) {
      set.add(h)
      set.remove(set.last)
      ()
    }
  }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next())
  }
}

/** `kmv_sketch(hash, k)`: K-Minimum-Values distinct-count sketch
  * (Bar-Yossef et al., RANDOM'02) over a pre-hashed string column —
  * returns struct(kth_hash, n_kept, est_distinct).
  *
  * The input is expected to be a uniform hex hash (md5 of the value); the
  * sketch keeps the k smallest distinct hashes. If fewer than k distinct
  * values exist the count is exact (`n_kept`); otherwise the k-th minimum
  * estimates the density of the hash space: with hashes uniform in [0,1),
  * E[kth] = k/(D+1), so est = (k-1)/kth is the standard unbiased KMV
  * estimator (relative error ~1/sqrt(k-2)). The fraction is read off the
  * first 15 hex chars (60 bits — far below the 128-bit space, so ties in
  * the prefix don't bias the estimate).
  *
  * A `TypedImperativeAggregate`: partial sketches per input partition,
  * merged at the final aggregation — each group contributes O(k) state no
  * matter how many rows it holds, and only sketch bytes cross the shuffle.
  * The same shape DuckDB/Spark use for HLL, but — unlike HLL — the state
  * is exactly reproducible in plain SQL (the k smallest distinct hashes),
  * so the driver oracle can hash-match it bit-for-bit.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("kth_hash", StringType),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("est_distinct", DoubleType, nullable = false),
    // the kept hashes themselves, ascending — the sketch STATE, so two
    // sketches can be MERGED downstream with plain array expressions
    // (union/intersection/jaccard estimates; see kmv_user_overlap) and
    // the oracle can replay the state as "the k smallest distinct
    // hashes" in SQL. O(k) strings — sketch-sized, never corpus-sized.
    StructField("hashes", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"kmv_sketch requires k >= 2, got $k")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires a string hash input, got $other")
    }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: KmvBuffer, input: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(input)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val n = buffer.set.size
    if (n == 0) return null
    val kth = buffer.set.last
    val est =
      if (n < k) n.toDouble // saw fewer than k distinct values: exact
      else {
        // fraction of the hash space below the k-th minimum, from the
        // first 15 hex chars (60 bits). The input contract is a uniform
        // hex hash (md5(...)); fail loudly on anything else rather than
        // emitting a meaningless estimate
        val prefix = kth.substring(0, math.min(15, kth.length)).padTo(15, '0')
        val frac =
          try java.lang.Long.parseLong(prefix, 16).toDouble / KmvSketch.Space60
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"kmv_sketch input must be a hex hash (e.g. md5); got '$kth'")
          }
        // frac == 0 only for degenerate (all-zero-prefix) inputs; the
        // kept count is then the only defensible answer
        if (frac <= 0) n.toDouble else (k - 1).toDouble / frac
      }
    val hashes = new Array[Any](n)
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) { hashes(i) = UTF8String.fromString(it.next()); i += 1 }
    InternalRow(UTF8String.fromString(kth), n, est, new GenericArrayData(hashes))
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) out.writeUTF(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.set.add(in.readUTF()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0))

  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {
  import org.apache.spark.sql.graft.bridge

  /** 16^15 = 2^60, the size of the 15-hex-char prefix space. */
  val Space60: Double = 1152921504606846976.0d

  def kmv_sketch(hash: Column, k: Int): Column =
    bridge.column(KmvSketch(bridge.expression(hash), k).toAggregateExpression())
}
