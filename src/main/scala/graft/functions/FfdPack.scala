package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** First-fit-decreasing bin packing over one shard's document list — the
  * document-AWARE packing alternative to concat-and-chunk
  * (`Packing.packSequences`): every document stays whole (no cross-bin
  * split, no cross-document attention inside a bin beyond deliberate
  * concatenation), bins are filled greedily in decreasing length order.
  *
  * Input: array<struct<neg_len: bigint, doc_id: bigint>> ALREADY sorted
  * ascending (i.e. length DESCENDING, doc_id ascending within equal
  * lengths — the caller sorts via sort_array, which also makes the
  * placement deterministic for any input order). Output:
  * array<struct<doc_id, n_tokens, bin>> with 1-based bin indices in
  * placement order.
  *
  * First-fit: each doc goes to the LOWEST-indexed bin with room; a doc
  * longer than the budget opens its own (overfull, forever-singleton)
  * bin — plain FFD semantics, no special case. The per-shard loop is
  * O(docs x bins) over a BOUNDED array (the caller shards the corpus so
  * shards are bounded); this expression is the sequential core that
  * genuinely cannot be expressed relationally, scoped to exactly the
  * bounded piece — the corpus-wide work (sharding, sorting, exploding)
  * stays declarative.
  */
case class FfdPack(child: Expression, budget: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("bin", IntegerType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint,bigint>>, got $other")
  }

  override def nullSafeEval(items: Any): Any =
    FfdPack.pack(items.asInstanceOf[ArrayData], budget)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FfdPack.pack($c, ${budget}L);")

  override protected def withNewChildInternal(newChild: Expression): FfdPack =
    copy(child = newChild)

  override def prettyName: String = "ffd_pack"
}

object FfdPack {

  /** Greedy first-fit over the (neg_len, doc_id)-sorted item list. */
  def pack(items: ArrayData, budget: Long): ArrayData = {
    val n = items.numElements()
    val occ = new scala.collection.mutable.ArrayBuffer[Long](16)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val row = items.getStruct(i, 2)
      val len = -row.getLong(0)
      val id = row.getLong(1)
      var bin = -1
      var j = 0
      while (bin < 0 && j < occ.length) {
        if (occ(j) + len <= budget) bin = j
        j += 1
      }
      if (bin < 0) { occ += len; bin = occ.length - 1 }
      else occ(bin) += len
      out(i) = new GenericInternalRow(
        Array[Any](id, len, bin + 1)): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }
}
