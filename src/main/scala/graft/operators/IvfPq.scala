package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.functions.{pq_adc_score, vec_dot}

/** IVF+PQ: the composed FAISS-style ANN architecture — coarse cells bound
  * WHICH vectors are scored (inverted-file probe), PQ codes bound WHAT a
  * score costs (m table lookups instead of d multiplies), and a final
  * exact re-rank on the shortlist restores full precision.
  *
  * Pure composition: reuses a built [[IvfIndex]] (cell assignments +
  * probe selection) and a built [[PqIndex]] (codebooks + code column)
  * unchanged; the only new state is the (cell, c_id, code) join of the
  * two, which stays lazy over their persisted/parquet residency. At
  * 100 TB this is the serving plan: probed cells prune the scan to
  * nprobe/nCells of the corpus, the ADC pass streams 8-byte codes, and
  * only |q| * nCandidates raw vectors are ever touched.
  */
final class IvfPq(val ivf: IvfIndex, val pq: PqIndex) {

  /** Exact-cosine top-k over the ADC shortlist of the probed cells.
    * Queries (q_id, qv array<float>) are bounded driver-side — same LUT
    * literal contract as [[PqIndex.topK]]. */
  def topK(queries: DataFrame, k: Int, nprobe: Int, nCandidates: Int,
      maxQueries: Int = 1024): DataFrame = {
    require(k >= 1 && nCandidates > k, "need nCandidates > k >= 1")
    val spark = ivf.cells.sparkSession
    import spark.implicits._
    val rows = queries.select(col("q_id"), col("qv")).limit(maxQueries + 1).collect()
    require(rows.length <= maxQueries,
      s"IVF+PQ query set exceeds $maxQueries rows — batch larger sets")
    val qSeq = rows.map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      (r.getLong(0), r.getSeq[Float](1), n, pq.lutFor(v).toSeq)
    }.toSeq.sortBy(_._1)
    val luts = qSeq.toDF("q_id", "qv", "qn", "lut")

    // probed (q_id, cell) pairs — metadata-sized (|q| x nprobe)
    val probed = ivf.probes(queries, nprobe).select("q_id", "cell")

    // ADC scan of ONLY the probed cells' codes; the (cell, c_id) -> code
    // join is c_id-keyed and lazy over both indexes' residency
    val cellCodes = ivf.cells.select("cell", "c_id")
      .join(pq.codes.select("c_id", "code"), "c_id")
    val slim = cellCodes
      .join(broadcast(probed), "cell")
      .join(broadcast(luts.select("q_id", "lut")), "q_id")
      .withColumn("adc", pq_adc_score(col("code"), col("lut"), pq.ksub))
      .select("q_id", "c_id", "adc")
      .withColumn("pid", spark_partition_id())
    val w1 = Window.partitionBy("q_id", "pid").orderBy(desc("adc"), col("c_id"))
    val w2 = Window.partitionBy("q_id").orderBy(desc("adc"), col("c_id"))
    val cand = slim
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= nCandidates)
      .withColumn("r2", row_number().over(w2)).filter(col("r2") <= nCandidates)
      .select("q_id", "c_id")

    // exact re-rank of the shortlist on the raw vectors from the IVF side
    val w3 = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    cand.join(ivf.cells.select("c_id", "cv", "cn"), "c_id")
      .join(broadcast(luts.select("q_id", "qv", "qn")), "q_id")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w3))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "rank", "cosine")
  }
}
