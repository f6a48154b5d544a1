package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.functions.{vec_dot, vec_l2norm}

/** IVF (inverted-file) ANN index with an explicit BUILD / QUERY lifecycle.
  *
  * The one-shot formulation (fit a coarse quantizer inside every query)
  * re-pays the KMeans fit — the expensive, corpus-scanning step — on each
  * call. A real engine builds the index once and amortizes it: `build`
  * fits the quantizer and PERSISTS the cell assignments (vec_id, vector,
  * norm, cell — the "inverted file"); `topK` is then a pure lazy plan over
  * the persisted assignments: rank the `nprobe` centroid-closest cells per
  * query (a |q| x nCells metadata cross), hash-join the corpus by its
  * single cell key, exact-score candidates, window top-k. Nothing
  * corpus-sized is ever broadcast or re-fit.
  *
  * At cluster scale the same lifecycle holds with the assignments written
  * to a bucketed table partitioned by `cell` (the scan then prunes probed
  * cells); `persist` is the single-session analogue.
  */
final class IvfIndex private (
    val cells: DataFrame,
    val centroids: Seq[(Int, Array[Float])],
    val nCells: Int) {

  /** Exact-scored cosine top-k over the probed cells for a query set
    * (columns: q_id, qv array<float>). Lazy — no job runs here. */
  def topK(queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    require(k >= 1 && nprobe >= 1, s"need k >= 1 and nprobe >= 1")
    val spark = cells.sparkSession
    import spark.implicits._
    val cent = centroids.toDF("cell", "centroid")
    val q = queries.select(col("q_id"), col("qv"))
      .withColumn("qn", vec_l2norm(col("qv")))
    // probe selection: |q| x nCells is metadata-sized by construction
    val cw = Window.partitionBy("q_id").orderBy(col("cdist"), col("cell"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cdist",
        col("qn") * col("qn") + vec_l2norm(col("centroid")) * vec_l2norm(col("centroid"))
          - lit(2.0) * vec_dot(col("qv"), col("centroid")))
      .withColumn("crk", row_number().over(cw))
      .filter(col("crk") <= nprobe)
      .select("q_id", "qv", "qn", "cell")
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", vec_dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "rank", "cosine")
  }

  /** Release the persisted inverted file. */
  def close(): Unit = { cells.unpersist(); () }
}

object IvfIndex {

  /** Fit the coarse quantizer and materialize the inverted file. The ONE
    * corpus-scanning step of the lifecycle — every subsequent `topK` call
    * reuses the persisted assignments. */
  def build(df: DataFrame, idCol: String, vecCol: String, nCells: Int,
      seed: Long = 42L, maxIter: Int = 10): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(nCells >= 2, s"need nCells >= 2, got $nCells")
    val base = df.select(col(idCol).as("c_id"), col(vecCol).as("cv"),
      array_to_vector(col(vecCol)).as("features"))
      .withColumn("cn", vec_l2norm(col("cv")))
    val km = new KMeans().setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(base)
    val cells = model.transform(base)
      .select("cell", "c_id", "cv", "cn")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (ctr, i) => (i, ctr.toArray.map(_.toFloat)) }.toSeq
    new IvfIndex(cells, centroids, nCells)
  }
}
