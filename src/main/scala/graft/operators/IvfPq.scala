package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    // LUT build, two-level ADC cut and exact re-rank are PqIndex's —
    // this operator contributes only the probed-cell prefilter, so the
    // two serving paths can never diverge in tie-break or cap semantics
    val luts = pq.queryLuts(queries, maxQueries)

    // probed (q_id, cell) pairs — metadata-sized (|q| x nprobe)
    val probed = ivf.probes(queries, nprobe).select("q_id", "cell")

    // ADC scan of ONLY the probed cells' codes; the (cell, c_id) -> code
    // join is c_id-keyed and lazy over both indexes' residency
    val withLut = ivf.cells.select("cell", "c_id")
      .join(pq.codes.select("c_id", "code"), "c_id")
      .join(broadcast(probed), "cell")
      .join(broadcast(luts.select("q_id", "lut")), "q_id")
    pq.rankShortlist(withLut, luts,
      ivf.cells.select("c_id", "cv", "cn"), k, nCandidates)
  }

  /** FILTERED top-k through the composed plan: `allowed` (single-column
    * c_id id-set, FAISS IDSelector-style) semi-joins the candidate stream
    * BEFORE the ADC scan, so the nCandidates shortlist fills with ALLOWED
    * candidates only — post-filtering the shortlist would under-fill it
    * by whatever the predicate rejects, silently degrading recall. The
    * semi join runs on the (cell-pruned) code stream, c_id-keyed, nothing
    * corpus-sized broadcast. With nCandidates >= |allowed| the shortlist
    * keeps every allowed candidate and the exact re-rank makes the result
    * provably equal to the filtered brute force (the driver gate's
    * operating point); serving uses smaller nCandidates and inherits PQ's
    * usual recall trade. */
  def topKFiltered(queries: DataFrame, k: Int, nprobe: Int, nCandidates: Int,
      allowed: DataFrame, maxQueries: Int = 1024): DataFrame = {
    require(k >= 1 && nCandidates > k, "need nCandidates > k >= 1")
    require(allowed.columns.toSeq == Seq("c_id"),
      s"allowed must have exactly one column c_id, got ${allowed.columns.toSeq}")
    val luts = pq.queryLuts(queries, maxQueries)
    val probed = ivf.probes(queries, nprobe).select("q_id", "cell")
    val withLut = ivf.cells.select("cell", "c_id")
      .join(allowed, Seq("c_id"), "left_semi")
      .join(pq.codes.select("c_id", "code"), "c_id")
      .join(broadcast(probed), "cell")
      .join(broadcast(luts.select("q_id", "lut")), "q_id")
    pq.rankShortlist(withLut, luts,
      ivf.cells.select("c_id", "cv", "cn"), k, nCandidates)
  }
}
