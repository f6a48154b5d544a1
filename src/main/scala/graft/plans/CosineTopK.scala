package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.VectorKernels

/** Whole-operator cosine top-k: for a fixed (small) query set, find each
  * query's k nearest corpus vectors by cosine similarity.
  *
  * Why a custom operator instead of crossJoin + Window: the compositional
  * plan materializes |corpus| x |queries| scored rows, shuffles them by
  * query, and sorts each partition to rank. This operator keeps a bounded
  * k-element heap per query *inside each corpus partition* — the corpus is
  * scanned once, in place, with no scored-row materialization; only
  * |partitions| x |queries| x k candidate rows (a few KB) leave the scan,
  * merged in a final single-partition pass. At 100 TB of vectors the
  * compositional plan's shuffle is petabyte-scale; this one's is kilobytes.
  *
  * Full custom-operator stack: logical node (this) -> strategy
  * (CosineTopKStrategy, injected via spark.experimental.extraStrategies) ->
  * physical exec (CosineTopKExec).
  *
  * @param queries (query id, query vector) pairs, captured as plan literals
  *                (the query set is broadcast-sized by contract)
  */
final case class CosineTopKPlan(
    child: LogicalPlan,
    queries: Seq[(Long, Array[Float])],
    k: Int,
    idCol: String,
    vecCol: String,
    // constructor parameter (not a val body): plan copies during
    // analysis/optimization must preserve the expression ids
    override val output: Seq[Attribute]) extends UnaryNode {

  // the output attributes are minted by this operator, not derived from the
  // child — without this the analyzer reports them "missing from input"
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  // the id/vector columns are consumed via plain Scala state, not child
  // expressions — declare them or ColumnPruning projects the child to Nil
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(a => a.name == idCol || a.name == vecCol))

  override protected def withNewChildInternal(newChild: LogicalPlan): CosineTopKPlan =
    copy(child = newChild)
}

object CosineTopKPlan {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("q_id", LongType, nullable = false)(),
    AttributeReference("c_id", LongType, nullable = false)(),
    AttributeReference("rank", IntegerType, nullable = false)(),
    AttributeReference("cosine", DoubleType, nullable = false)())
}

object CosineTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ CosineTopKPlan(child, queries, k, idCol, vecCol, _) =>
      // reuse the logical node's attribute ids so downstream operators
      // referencing them still resolve
      CosineTopKExec(planLater(child), p.output, queries, k, idCol, vecCol) :: Nil
    case _ => Nil
  }
}

final case class CosineTopKExec(
    child: SparkPlan,
    override val output: Seq[Attribute],
    queries: Seq[(Long, Array[Float])],
    k: Int,
    idCol: String,
    vecCol: String) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def withNewChildInternal(newChild: SparkPlan): CosineTopKExec =
    copy(child = newChild)

  /** (cosine6 desc, c_id asc) — identical ordering to the compositional
    * Window/row_number formulation and the DuckDB oracle. */
  private def better(c1: Double, id1: Long, c2: Double, id2: Long): Boolean =
    c1 > c2 || (c1 == c2 && id1 < id2)

  override protected def doExecute(): RDD[InternalRow] = {
    val idOrd = child.output.indexWhere(_.name == idCol)
    val vecOrd = child.output.indexWhere(_.name == vecCol)
    require(idOrd >= 0 && vecOrd >= 0,
      s"child must expose $idCol and $vecCol; has ${child.output.map(_.name)}")
    val qs = queries.toArray
    val kk = k

    // pass 1: bounded per-query top-k inside each corpus partition
    val local = child.execute().mapPartitions { rows =>
      val qn = qs.map(q => VectorKernels.l2normFloats(q._2))
      // per query: parallel arrays of (cosine, id), kept sorted best-first
      val heapC = Array.fill(qs.length)(new Array[Double](kk))
      val heapI = Array.fill(qs.length)(new Array[Long](kk))
      val heapN = new Array[Int](qs.length)
      rows.foreach { row =>
        val cId = row.getLong(idOrd)
        val vec = row.getArray(vecOrd)
        val cn = VectorKernels.l2norm(vec, true)
        var qi = 0
        while (qi < qs.length) {
          val (qId, qv) = qs(qi)
          if (qId != cId) {
            val cos = TopKMath.round6(
              VectorKernels.dotFloatsArray(qv, vec) / (qn(qi) * cn))
            val n = heapN(qi)
            val cs = heapC(qi); val ids = heapI(qi)
            if (n < kk || better(cos, cId, cs(n - 1), ids(n - 1))) {
              // insertion into the sorted top-k buffer (k is tiny)
              var pos = math.min(n, kk - 1)
              while (pos > 0 && better(cos, cId, cs(pos - 1), ids(pos - 1))) {
                cs(pos) = cs(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
              }
              cs(pos) = cos; ids(pos) = cId
              if (n < kk) heapN(qi) = n + 1
            }
          }
          qi += 1
        }
      }
      (0 until qs.length).iterator.flatMap { qi =>
        (0 until heapN(qi)).iterator.map { r =>
          (qs(qi)._1, heapI(qi)(r), heapC(qi)(r))
        }
      }
    }

    // pass 2: merge the (tiny) per-partition candidates and emit final ranks
    local.coalesce(1).mapPartitions { it =>
      val all = it.toArray
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      all.groupBy(_._1).toSeq.sortBy(_._1).iterator.flatMap { case (qId, cands) =>
        val best = cands.sortWith { case ((_, i1, c1), (_, i2, c2)) =>
          better(c1, i1, c2, i2)
        }.take(kk)
        best.iterator.zipWithIndex.map { case ((_, cId, cos), r) =>
          proj.apply(InternalRow(qId, cId, r + 1, cos)).copy()
        }
      }
    }
  }
}

object TopKMath {
  /** DuckDB-compatible round to 6 decimals (scaled half-away-from-zero on
    * the exact scaled double) — matches the query-module round shadow. */
  def round6(x: Double): Double =
    new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6
}

object CosineTopK {

  /** Run the operator over `corpus` (columns idCol, vecCol: array<float>)
    * for the given queries. Injects the strategy into the session once. */
  def topK(spark: SparkSession, corpus: DataFrame,
      queries: Seq[(Long, Array[Float])], k: Int,
      idCol: String, vecCol: String): DataFrame = {
    require(k >= 1, s"topK requires k >= 1, got $k")
    import org.apache.spark.sql.graft.bridge
    GraftExtensions.install(spark)
    bridge.ofRows(spark,
      CosineTopKPlan(bridge.logicalPlan(corpus), queries, k, idCol, vecCol,
        CosineTopKPlan.freshOutput()))
  }
}
