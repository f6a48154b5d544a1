package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{BpeEncode, DotProduct, GearChunkEnds, InterleaveBits, L2Norm, NormalizeText, PqAdcScore, QuantileBinSearch, ShingleGenerator, SimHash64, WordShingles}

/** Optimizer rule: prune the CosineTopK query set when a literal q_id
  * equality filter sits on top of it.
  *
  * `df.topK(queries).filter($"q_id" === 3)` would otherwise score every
  * corpus row against every query and discard most of the output; after the
  * rewrite only the requested query is scored — the filter is pushed *into
  * the operator's driver-side state*, something generic predicate pushdown
  * cannot see.
  */
object PruneTopKQueries extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, topk: CosineTopKPlan) =>
      qIdEquality(cond, topk) match {
        case Some(qId) if topk.queries.exists(_._1 == qId) =>
          // keep the Filter (semantics unchanged); shrink the work under it
          f.copy(child = topk.copy(queries = topk.queries.filter(_._1 == qId)))
        case _ => f
      }
  }

  private def qIdEquality(cond: Expression, topk: CosineTopKPlan): Option[Long] = {
    val qIdAttr = topk.output.head
    cond match {
      case EqualTo(a, Literal(v: Long, _)) if a.semanticEquals(qIdAttr) => Some(v)
      case EqualTo(Literal(v: Long, _), a) if a.semanticEquals(qIdAttr) => Some(v)
      case EqualTo(a, Literal(v: Int, _)) if a.semanticEquals(qIdAttr) => Some(v.toLong)
      case EqualTo(Literal(v: Int, _), a) if a.semanticEquals(qIdAttr) => Some(v.toLong)
      case _ => None
    }
  }
}

/** Session extension wiring: planner strategy, optimizer rule, and SQL
  * registration of the native functions. Install with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or call
  * `GraftExtensions.install(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => CosineTopKStrategy)
    e.injectOptimizerRule(_ => PruneTopKQueries)
    e.injectOptimizerRule(_ => FuseCosineTopK)
  }
}

object GraftExtensions {

  /** Runtime installation on an existing session (the experimental hooks
    * are the sanctioned mutable entry points for this). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(CosineTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ CosineTopKStrategy
    if (!spark.experimental.extraOptimizations.contains(PruneTopKQueries))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneTopKQueries
    if (!spark.experimental.extraOptimizations.contains(FuseCosineTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseCosineTopK
    registerSqlFunctions(spark)
  }

  /** Expose the native expressions to SQL texts. */
  def registerSqlFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_l2norm",
      exprs => L2Norm(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("shingle_rows",
      exprs => ShingleGenerator(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize",
      exprs => NormalizeText(exprs.head, stripAccents = false), "built-in")
    reg.createOrReplaceTempFunction("strip_accents",
      exprs => NormalizeText(exprs.head, stripAccents = true), "built-in")
    // r7 kernels: constant arguments (ksub, bits, cuts, merge table) must
    // be literals — they are evaluated once at registration-shim time and
    // baked into the expression, same contract as word_shingles' k
    reg.createOrReplaceTempFunction("pq_adc_score",
      exprs => PqAdcScore(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("interleave_bits",
      exprs => InterleaveBits(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("quantile_bin",
      // cuts are sorted here exactly as ZOrderLayout.zcode sorts them —
      // the binary search's upper-bound invariant needs it
      exprs => QuantileBinSearch(exprs(0),
        exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray().sorted), "built-in")
    reg.createOrReplaceTempFunction("gear_chunk_ends",
      // (payload, maskBits[, minSize, maxSize]) — size args are literals,
      // baked in at shim time like word_shingles' k
      exprs => GearChunkEnds(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        if (exprs.length > 2) exprs(2).eval().asInstanceOf[Int] else 1,
        if (exprs.length > 3) exprs(3).eval().asInstanceOf[Int] else 0), "built-in")
    reg.createOrReplaceTempFunction("bpe_encode",
      exprs => {
        val raw = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val merges = raw.toObjectArray(
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
          .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toObjectArray(org.apache.spark.sql.types.StringType)
            .map(_.toString))
        BpeEncode(exprs(0), merges)
      }, "built-in")
  }
}
