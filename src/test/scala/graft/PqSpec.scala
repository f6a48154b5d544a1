package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PqIndex
import graft.queries.SimilarityQueries

/** Product-quantization index: code/codebook invariants, ADC == decoded
  * dot product, and shortlist recall on the fixture. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val index = PqIndex.build(
    Tables.load(spark, TestSpark.sfDir, "embeddings"), "vec_id", "embedding",
    m = 8, ksub = 256)

  test("codes are m bytes and the codebook is m x ksub x d/m") {
    assert(index.codebook.length === 8)
    assert(index.codebook.forall(_.length === 256))
    assert(index.codebook.forall(_.forall(_.length === 8)))
    assert(index.codes.schema("code").dataType === ArrayType(ByteType, containsNull = false))
    val bad = index.codes.filter(size(col("code")) =!= 8).count()
    assert(bad === 0L)
  }

  test("a query of the wrong dimension fails loudly, not with a truncated LUT") {
    // 64-dim index: a 32-dim query must not silently compute a half-LUT,
    // and a 128-dim one must not overrun the codebook mid-loop
    val short = intercept[IllegalArgumentException](index.lutFor(new Array[Double](32)))
    assert(short.getMessage.contains("query dimension 32"))
    val long = intercept[IllegalArgumentException](index.lutFor(new Array[Double](128)))
    assert(long.getMessage.contains("query dimension 128"))
    assert(index.lutFor(new Array[Double](64)).length === 8 * 256)
  }

  test("ADC score equals the dot product against the decoded vector") {
    // decode(code) = concat_j codebook(j)(code_j); ADC must equal
    // <q, decode(code)> exactly (same double ops, same order)
    import graft.functions.functions.pq_adc_score
    val q = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .filter(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray
    val lut = index.lutFor(q)
    val rows = index.codes.limit(50)
      .withColumn("adc", pq_adc_score(col("code"),
        typedlit(lut.toSeq), 256))
      .select("code", "adc").collect()
    rows.foreach { r =>
      val code = r.getSeq[Byte](0)
      val expected = code.zipWithIndex.map { case (c, j) =>
        val ctr = index.codebook(j)(c & 0xff)
        ctr.indices.map(i => q(j * 8 + i) * ctr(i)).sum
      }.sum
      assert(math.abs(r.getDouble(1) - expected) < 1e-9)
    }
  }

  test("every centroid id is actually used somewhere (no dead codewords)") {
    // k-means++ with empty-cell reseeding over the fixture should populate
    // most codewords; an encoder bug (e.g. constant argmin) collapses this
    val used = index.codes
      .select(explode(col("code")).as("c")).distinct().count()
    assert(used >= 8, s"only $used distinct code values used across subspaces")
  }

  test("ADC shortlist keeps full recall@5 on the fixture (gate precondition)") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val pq = index.topK(q, k = 5, nCandidates = 256)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = SimilarityQueries.queries("ann_bruteforce_topk")(spark, TestSpark.sfDir)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    exact.foreach { case (qid, ex) =>
      val got = pq.getOrElse(qid, Set.empty)
      val recall = ex.intersect(got).size.toDouble / ex.size
      assert(recall === 1.0, s"q $qid recall $recall: pq=$got exact=$ex")
    }
  }
}
