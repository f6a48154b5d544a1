package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Ascending, Descending, Divide, EqualTo, Expression, Literal, Multiply, Not, NullsFirst, NullsLast, Round, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.expressions.RowNumber
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LocalRelation, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}

import graft.functions.{DotProduct, L2Norm, VectorKernels}

/** Optimizer rule: FUSE the compositional cosine top-k pattern into the
  * whole-operator `CosineTopKPlan`.
  *
  * A user who doesn't know about the custom operator writes the naive
  * formulation — score a literal query set against the corpus with a cross
  * join, rank per query with `row_number`, keep rank <= k:
  *
  * {{{
  *   corpus.crossJoin(broadcast(queriesDf))            // queries = literals
  *     .filter($"q_id" =!= $"c_id")
  *     .withColumn("cosine", round6(vec_dot(qv, cv) / (qn * cn)))
  *     .withColumn("rank", row_number over (partitionBy q_id, orderBy cosine desc, c_id))
  *     .filter($"rank" <= k)
  * }}}
  *
  * That plan materializes and sorts |corpus| x |queries| scored rows. When
  * the query side is a `LocalRelation` (literal rows — the "handful of
  * probe vectors" case), every piece of driver-side state the custom
  * operator needs is sitting in the plan, so this rule rewrites the whole
  * Filter-Window-Join region into `CosineTopKPlan`: one corpus scan,
  * bounded per-partition heaps, kilobytes shuffled. Same mechanism as
  * Spark's own `InsertWindowGroupLimit` rank pushdown, taken to the
  * operator level.
  *
  * The match is deliberately STRICT — it only fires when the rewrite is
  * provably semantics-preserving:
  *  - window function is `row_number()` partitioned by the query id,
  *    ordered (cosine DESC NULLS LAST, corpus id ASC NULLS FIRST) — the
  *    exact tie-break `CosineTopKExec` implements;
  *  - the scored expression is the canonical round-6 cosine
  *    `round(vec_dot(qv,cv)/(qn*cn) * 1e6, 0) / 1e6` (what the exec
  *    computes via `TopKMath.round6`);
  *  - the corpus-side norm is PROVEN to be `vec_l2norm` of the corpus
  *    vector (by inspecting its defining alias), and the query-side norm
  *    is verified numerically against each literal row;
  *  - a `q_id <> c_id` self-exclusion is present (the exec skips
  *    query==corpus ids);
  *  - query ids are distinct non-null longs (duplicate ids would merge
  *    two rank groups in the window formulation).
  * Anything else — different rounding, a missing exclusion, a non-literal
  * query side — leaves the plan untouched.
  */
object FuseCosineTopK extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(rankCond,
        Window(Seq(rankAlias @ Alias(we: WindowExpression, _)), Seq(part: Attribute), order, wchild, _)) =>
      fuse(rankCond, rankAlias, we, part, order, wchild).getOrElse(f)
  }

  private def fuse(rankCond: Expression, rankAlias: Alias, we: WindowExpression,
      part: Attribute, order: Seq[SortOrder], wchild: LogicalPlan): Option[LogicalPlan] = {
    // window function: plain row_number()
    we.windowFunction match {
      case _: RowNumber => ()
      case ae: AggregateExpression if ae.aggregateFunction.isInstanceOf[RowNumber] => ()
      case _ => return None
    }
    val rankAttr = rankAlias.toAttribute
    // rank bound -> k
    import org.apache.spark.sql.catalyst.expressions.{LessThan, LessThanOrEqual}
    val k = rankCond match {
      case LessThanOrEqual(a: Attribute, Literal(kk: Int, IntegerType)) if a.semanticEquals(rankAttr) => kk
      case LessThan(a: Attribute, Literal(kk: Int, IntegerType)) if a.semanticEquals(rankAttr) => kk - 1
      case _ => return None
    }
    if (k < 1) return None
    // optional rank-limit pushdown node Spark inserts below the window
    val below = wchild match {
      case wgl: WindowGroupLimit => wgl.child
      case other => other
    }
    val (projList, join) = below match {
      case Project(pl, j: Join) => (pl, j)
      case _ => return None
    }
    // sides: literal query set vs corpus
    val (corpus, local) = join match {
      case Join(l, r: LocalRelation, Cross | Inner, _, _) => (l, r)
      case Join(l: LocalRelation, r, Cross | Inner, _, _) => (r, l)
      case _ => return None
    }
    val localOut = local.outputSet
    val corpusOut = corpus.outputSet
    // the canonical round-6 cosine: round(dot/(n1*n2) * 1e6, 0) / 1e6
    val cosAlias = projList.collectFirst {
      case a @ Alias(CosinePattern(qv, cv, qn, cn), _)
          if localOut.contains(qv) && corpusOut.contains(cv) &&
            localOut.contains(qn) && corpusOut.contains(cn) => (a, qv, cv, qn, cn)
    } match {
      case Some(x) => x
      case None => return None
    }
    val (cosA, qvAttr, cvAttr, qnAttr, cnAttr) = cosAlias
    val cosAttr = cosA.toAttribute
    // ordering: (cosine DESC NULLS LAST, c_id ASC NULLS FIRST)
    val cId = order match {
      case Seq(SortOrder(c1: Attribute, Descending, NullsLast, _),
               SortOrder(c2: Attribute, Ascending, NullsFirst, _))
          if c1.semanticEquals(cosAttr) && corpusOut.contains(c2) && c2.dataType == LongType =>
        c2
      case _ => return None
    }
    if (part.dataType != LongType || !localOut.contains(part)) return None
    // projection below the window must carry ONLY (q_id, c_id, cosine) —
    // the fused node outputs exactly those plus rank, so any OTHER column
    // surviving to this point would become an unresolved attribute above
    val passThrough = projList.forall {
      case att: Attribute => att.semanticEquals(part) || att.semanticEquals(cId)
      case al: Alias => al.exprId == cosA.exprId
      case _ => false
    }
    if (!passThrough) return None
    // the exec binds the id/vector columns BY NAME on the corpus side —
    // refuse ambiguous (duplicate-name) corpus outputs
    if (corpus.output.count(_.name == cId.name) != 1 ||
      corpus.output.count(_.name == cvAttr.name) != 1) return None
    // self-exclusion q_id <> c_id must be in the join condition
    val excluded = join.condition.exists {
      case Not(EqualTo(x: Attribute, y: Attribute)) =>
        (x.semanticEquals(part) && y.semanticEquals(cId)) ||
          (y.semanticEquals(part) && x.semanticEquals(cId))
      case _ => false
    }
    if (!excluded) return None
    // corpus-side norm must provably be vec_l2norm(corpus vector)
    if (!normProven(corpus, cvAttr, cnAttr)) return None
    // vector types — BOTH sides must be array<float> (the exec's kernels
    // and the literal extraction below read 4-byte floats)
    def isFloatArray(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (!isFloatArray(cvAttr.dataType) || !isFloatArray(qvAttr.dataType)) return None
    // extract the literal query set; verify qn numerically
    val qIdOrd = local.output.indexWhere(_.exprId == part.exprId)
    val qvOrd = local.output.indexWhere(_.exprId == qvAttr.exprId)
    val qnOrd = local.output.indexWhere(_.exprId == qnAttr.exprId)
    if (qIdOrd < 0 || qvOrd < 0 || qnOrd < 0) return None
    if (qnAttr.dataType != DoubleType) return None
    val queries = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    local.data.foreach { row =>
      if (row.isNullAt(qIdOrd) || row.isNullAt(qvOrd) || row.isNullAt(qnOrd)) return None
      val vec = row.getArray(qvOrd).toFloatArray()
      val qn = row.getDouble(qnOrd)
      val trueNorm = VectorKernels.l2normFloats(vec)
      if (math.abs(qn - trueNorm) > 1e-9 * math.max(1.0, trueNorm)) return None
      queries += ((row.getLong(qIdOrd), vec))
    }
    if (queries.map(_._1).distinct.size != queries.size) return None
    // fuse: reuse the original attribute ids so parents still resolve. The
    // exec emits values in canonical (q_id, c_id, rank, cosine) order; the
    // region being replaced outputs projList order with rank appended, so
    // when those differ, a (free, collapsible) Project restores the
    // original schema order — otherwise a Filter-as-plan-root caller would
    // read misaligned columns.
    val fused = CosineTopKPlan(corpus, queries.toSeq.sortBy(_._1), k,
      cId.name, cvAttr.name, Seq(part, cId, rankAttr, cosAttr))
    val originalOrder: Seq[Attribute] = projList.map {
      case att: Attribute => att
      case al: Alias => al.toAttribute
    } :+ rankAttr
    Some(if (originalOrder == fused.output) fused
         else Project(originalOrder, fused))
  }

  /** `round(dot(a,b) / (n1*n2) * 1e6, 0) / 1e6` -> (a, b, n1, n2).
    * Field-based matching (not case-class unapply) so optional constructor
    * params (eval modes, ansi flags) can't break the pattern. */
  private object CosinePattern {
    private def lit(e: Expression, v: Double): Boolean = e match {
      case Literal(d: Double, DoubleType) => d == v
      case _ => false
    }
    private def litInt(e: Expression, v: Int): Boolean = e match {
      case Literal(i: Int, IntegerType) => i == v
      case _ => false
    }
    def unapply(e: Expression): Option[(Attribute, Attribute, Attribute, Attribute)] = e match {
      case outer: Divide if lit(outer.right, 1e6) =>
        outer.left match {
          case r: Round if litInt(r.scale, 0) =>
            r.child match {
              case m: Multiply if lit(m.right, 1e6) =>
                m.left match {
                  case inner: Divide =>
                    (inner.left, inner.right) match {
                      case (dot: DotProduct, norms: Multiply) =>
                        (dot.left, dot.right, norms.left, norms.right) match {
                          case (qv: Attribute, cv: Attribute, n1: Attribute, n2: Attribute) =>
                            Some((qv, cv, n1, n2))
                          case _ => None
                        }
                      case _ => None
                    }
                  case _ => None
                }
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** True iff `corpus` defines `cn` as `vec_l2norm` of the same expression
    * it exposes as `cv` (directly, or through one aliasing Project). */
  private def normProven(corpus: LogicalPlan, cv: Attribute, cn: Attribute): Boolean =
    corpus match {
      case Project(pl, _) =>
        val cvDef: Option[Expression] = pl.collectFirst {
          case a: Alias if a.exprId == cv.exprId => a.child
          case att: Attribute if att.exprId == cv.exprId => att
        }
        val cnDef: Option[Expression] = pl.collectFirst {
          case a: Alias if a.exprId == cn.exprId => a.child
        }
        (cvDef, cnDef) match {
          case (Some(v), Some(L2Norm(src))) => src.semanticEquals(v)
          case _ => false
        }
      case _ => false
    }
}
