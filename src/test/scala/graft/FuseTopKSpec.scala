package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.functions.{vec_dot, vec_l2norm}
import graft.plans.{CosineTopKPlan, GraftExtensions}

/** FuseCosineTopK: the naive crossJoin + row_number top-k over a LITERAL
  * query set must be rewritten into the whole-operator CosineTopKPlan —
  * and must NOT be rewritten when any semantics-bearing piece differs. */
class FuseTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 1e6

  private def corpus = {
    GraftExtensions.install(spark)
    Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
      .withColumn("cn", vec_l2norm(col("cv")))
  }

  private def literalQueries: DataFrame =
    Tables.load(spark, TestSpark.sfDir, "embeddings")
      .filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      .toDF("q_id", "qv").withColumn("qn", vec_l2norm(col("qv")))

  /** The naive formulation; `exclude`/`scale` knobs produce near-miss
    * variants that must not fuse. */
  private def naive(q: DataFrame, exclude: Boolean = true, scale: Double = P): DataFrame = {
    val joined0 = corpus.crossJoin(broadcast(q))
    val joined = if (exclude) joined0.filter(col("q_id") =!= col("c_id")) else joined0
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    joined
      .withColumn("cosine",
        round(vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn")) * scale, 0) / scale)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "c_id", "rank", "cosine")
  }

  private def fused(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[CosineTopKPlan])

  test("literal-query top-k fuses into CosineTopKPlan with identical results") {
    val df = naive(literalQueries)
    assert(fused(df), s"expected fuse; plan:\n${df.queryExecution.optimizedPlan}")
    // reference: the same formulation with a NON-literal query side (the
    // rule can't touch it — no driver-side literals to capture)
    val qFromCorpus = corpus.filter(col("c_id") < 3)
      .select(col("c_id").as("q_id"), col("cv").as("qv"), col("cn").as("qn"))
    val reference = naive(qFromCorpus)
    assert(!fused(reference))
    assert(df.orderBy("q_id", "rank").collect() ===
      reference.orderBy("q_id", "rank").collect())
  }

  test("fusion composes with query-set pruning (rule pipeline)") {
    // a literal q_id filter ABOVE the naive pattern: FuseCosineTopK first
    // rewrites the region into CosineTopKPlan, then PruneTopKQueries
    // shrinks the fused operator's query set to the one requested id —
    // two independent rules cooperating on the same custom node
    val df = naive(literalQueries).filter(col("q_id") === 1L)
    val fusedNode = df.queryExecution.optimizedPlan.collectFirst {
      case p: CosineTopKPlan => p
    }
    assert(fusedNode.isDefined, "expected the naive pattern to fuse")
    assert(fusedNode.get.queries.map(_._1) === Seq(1L),
      s"expected the pruned query set, got ${fusedNode.get.queries.map(_._1)}")
    assert(df.select("q_id").distinct().collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("missing self-exclusion does not fuse") {
    val df = naive(literalQueries, exclude = false)
    assert(!fused(df), "exec always skips q_id == c_id; fusing would change results")
    assert(df.count() > 0)
  }

  test("different rounding scale does not fuse") {
    val df = naive(literalQueries, scale = 1e5)
    assert(!fused(df), "exec rounds to 6 decimals; a 5-decimal plan must not fuse")
    assert(df.count() > 0)
  }

  test("an extra corpus column above the filter does not fuse (and still runs)") {
    val q = literalQueries
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    val df = corpus.crossJoin(broadcast(q)).filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        round(vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn")) * P, 0) / P)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "c_id", "rank", "cosine", "cn") // cn survives the filter
    assert(!fused(df), "fused plan cannot produce the extra column")
    assert(df.count() > 0) // and the un-fused plan must still execute
  }

  test("duplicate query ids do not fuse") {
    val vec = Array(1.0f, 2.0f, 3.0f)
    val q = Seq((7L, vec), (7L, vec)).toDF("q_id", "qv")
      .withColumn("qn", vec_l2norm(col("qv")))
    val df = naive(q)
    assert(!fused(df), "duplicate ids merge rank groups in the window formulation")
  }
}
