package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Buffer for TopKBy: up to k (key, value) pairs kept sorted by
  * (value desc, key asc) — insertion into a tiny sorted array, the same
  * bounded structure the CosineTopK physical operator uses. */
final class TopKBuffer(val k: Int) {
  val keys = new Array[Long](k)
  val values = new Array[Double](k)
  var n: Int = 0

  private def better(v1: Double, k1: Long, v2: Double, k2: Long): Boolean =
    v1 > v2 || (v1 == v2 && k1 < k2)

  def insert(key: Long, value: Double): Unit = {
    if (n < k || better(value, key, values(n - 1), keys(n - 1))) {
      var pos = math.min(n, k - 1)
      while (pos > 0 && better(value, key, values(pos - 1), keys(pos - 1))) {
        values(pos) = values(pos - 1); keys(pos) = keys(pos - 1); pos -= 1
      }
      values(pos) = value; keys(pos) = key
      if (n < k) n += 1
    }
  }

  def mergeIn(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.keys(i), other.values(i)); i += 1 }
  }
}

/** `top_k_by(key, value, k)`: the k keys with the largest values per group,
  * ordered (value desc, key asc), as array<bigint>.
  *
  * A `TypedImperativeAggregate` — the expression tier for aggregates whose
  * state is an opaque mutable buffer (sketches, heaps) rather than a row of
  * Catalyst values. Spark plans it two-phase: partial buffers per input
  * partition, serialized with the compact codec below, merged at the final
  * aggregation — so a group's full value set never concentrates anywhere,
  * unlike the sort-based `collect_list` + slice formulation.
  */
case class TopKBy(
    keyExpr: Expression,
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(keyExpr, valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"top_k_by requires k >= 1, got $k")
    else (keyExpr.dataType, valueExpr.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_k_by requires (bigint, double), got $other")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val keyV = keyExpr.eval(input)
    val valV = valueExpr.eval(input)
    if (keyV != null && valV != null)
      buffer.insert(keyV.asInstanceOf[Long], valV.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TopKBuffer, input: TopKBuffer): TopKBuffer = {
    buffer.mergeIn(input)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.keys.take(buffer.n).map(Long.box))

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      out.writeLong(buffer.keys(i)); out.writeDouble(buffer.values(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.keys(i) = in.readLong(); buf.values(i) = in.readDouble(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKBy =
    copy(keyExpr = newChildren(0), valueExpr = newChildren(1))

  override def prettyName: String = "top_k_by"
}

object TopKBy {
  import org.apache.spark.sql.graft.bridge

  def top_k_by(key: Column, value: Column, k: Int): Column =
    bridge.column(TopKBy(bridge.expression(key), bridge.expression(value), k)
      .toAggregateExpression())
}
