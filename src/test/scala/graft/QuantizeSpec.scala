package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantize
import graft.queries.SimilarityQueries

/** Int8 embedding quantization: representation invariants, the analytic
  * reconstruction-error bound, and the ranking quality of the quantized
  * top-k against the float-exact top-k on the sf0.001 fixture.
  *
  * The engine-vs-engine exactness of the quantize -> dequantize -> rank
  * pipeline is covered by the DuckDB oracles of
  * `embedding_quantize_stats` / `ann_quantized_topk`; this spec covers
  * what an oracle that recomputes the same math cannot: that the codes
  * really are bytes, that saturation behaves, and how far the quantized
  * RANKING drifts from the float ranking (a property of the quantizer,
  * not of either engine).
  */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val quantized = {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
    Quantize.int8(emb, "v")
  }

  test("codes are array<tinyint> with |q| <= 127 and a positive scale") {
    val df = quantized
    assert(df.schema("qvec").dataType === ArrayType(ByteType))
    val bad = df.filter(
      exists(col("qvec"), x => abs(x.cast("int")) > 127) ||
        col("qscale") <= 0.0).count()
    assert(bad === 0L)
  }

  test("per-vector reconstruction error respects sqrt(d)*scale/2") {
    import graft.functions.functions.vec_l2norm
    val df = quantized
      .withColumn("dq", Quantize.dequantize(col("qvec"), col("qscale")))
      .withColumn("err", vec_l2norm(
        zip_with(col("v"), col("dq"), (a, b) => a.cast("double") - b)))
      .withColumn("bound",
        sqrt(size(col("v")).cast("double")) * col("qscale") / 2 + lit(1e-9))
    val violations = df.filter(col("err") > col("bound")).count()
    assert(violations === 0L)
    // and the error is non-trivial (the quantizer actually quantizes):
    // max element error should exceed scale/4 for at least one vector
    val loose = df.filter(col("err") > col("qscale") / 4).count()
    assert(loose > 0L, "reconstruction error suspiciously zero everywhere")
  }

  test("every vector saturates at least one code (scale = max|x|/127)") {
    // by construction the max-|x| element rounds to exactly +-127; a scale
    // computed over the wrong axis (global, or off-by-one dims) breaks this
    val df = quantized.withColumn("n_sat",
      size(filter(col("qvec"), x => abs(x.cast("int")) === 127)))
    assert(df.filter(col("n_sat") === 0 &&
      exists(col("v"), x => x =!= 0.0f)).count() === 0L)
  }

  test("quantized top-5 recall vs float-exact top-5 >= 0.8 on the fixture") {
    def pairs(name: String): Map[Long, Set[Long]] =
      SimilarityQueries.queries(name)(spark, TestSpark.sfDir)
        .select("q_id", "c_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = pairs("ann_bruteforce_topk")
    val quant = pairs("ann_quantized_topk")
    val recalls = exact.map { case (q, ex) =>
      val hit = quant.getOrElse(q, Set.empty)
      ex.intersect(hit).size.toDouble / ex.size
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, s"avg quantized recall@5 $avg < 0.8 (per-query $recalls)")
  }
}
