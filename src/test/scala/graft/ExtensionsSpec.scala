package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.{CosineTopK, CosineTopKPlan, GraftExtensions}

/** Optimizer rule + SQL function registration. */
class ExtensionsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private def embeddings = Tables.load(spark, TestSpark.sfDir, "embeddings")

  private def queryVecs = embeddings.filter(col("vec_id") < 5)
    .select("vec_id", "embedding").collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1).toSeq

  test("PruneTopKQueries pushes a q_id literal filter into the operator") {
    val df = CosineTopK.topK(spark, embeddings, queryVecs, 5, "vec_id", "embedding")
      .filter(col("q_id") === 2L)
    val pruned = df.queryExecution.optimizedPlan.collect {
      case p: CosineTopKPlan => p.queries.map(_._1)
    }.flatten
    assert(pruned == Seq(2L), s"expected only query 2 after pruning, got $pruned")

    // semantics unchanged: equals the unpruned result filtered afterwards
    val got = df.select("c_id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val expected = CosineTopK.topK(spark, embeddings, queryVecs, 5, "vec_id", "embedding")
      .collect().filter(_.getLong(0) == 2L).map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("native functions callable from SQL after registration") {
    GraftExtensions.registerSqlFunctions(spark)
    embeddings.createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT vec_id, vec_l2norm(embedding) AS nrm,
        |  vec_dot(embedding, embedding) AS selfdot,
        |  simhash64(array('a','b')) AS sh,
        |  size(word_shingles(array('a','b','c','d'), 3)) AS nshingles
        |FROM emb_sql ORDER BY vec_id LIMIT 3""".stripMargin).collect()
    viaSql.foreach { r =>
      assert(math.abs(r.getDouble(1) * r.getDouble(1) - r.getDouble(2)) < 1e-9)
      assert(r.getInt(4) == 2)
    }
  }

  test("r7 kernels callable from SQL with literal constant arguments") {
    GraftExtensions.registerSqlFunctions(spark)
    val r = spark.sql(
      """SELECT
        |  pq_adc_score(CAST(array(1, 0) AS ARRAY<TINYINT>),
        |               array(0.5D, 1.5D, 2.5D, 3.5D), 2) AS adc,
        |  interleave_bits(array(1, 2), 2) AS z,
        |  quantile_bin(3.5D, array(1.0D, 3.0D, 5.0D)) AS bin,
        |  bpe_encode('abc cab', array(array('a','b'), array('ab','c'))) AS toks
        |""".stripMargin).head()
    // j=0 code 1 -> lut(0*2+1)=1.5; j=1 code 0 -> lut(1*2+0)=2.5
    assert(r.getDouble(0) === 1.5 + 2.5)
    assert(r.getLong(1) === 6L)
    assert(r.getInt(2) === 2)
    assert(r.getSeq[String](3) === Seq("abc", "c", "ab"))
  }
}
