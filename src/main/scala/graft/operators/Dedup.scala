package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.functions.{simhash64, vec_dot, vec_l2norm, word_shingles}

/** Library-facing deduplication operators over an (idCol, textCol) corpus.
  *
  * Each returns a lazy DataFrame (no action run); the queries in
  * `graft.queries.DedupQueries` are thin wrappers over these. Scale
  * posture: every candidate generator is a bounded-key bucket join
  * (shingle, band, LSH bucket) — never a blind cross join; exact similarity
  * is computed only on candidates. AQE handles hot buckets; persisted
  * intermediates spill (MEMORY_AND_DISK).
  */
object Dedup {

  private def toks(c: Column): Column = split(lower(c), " ")

  /** Tokens + distinct word k-gram shingles via the native kernel. */
  def withShingles(df: DataFrame, textCol: String, k: Int = 3): DataFrame =
    df.withColumn("w", toks(col(textCol)))
      .filter(size(col("w")) >= k)
      .withColumn("shingles", word_shingles(col("w"), k))

  /** Exact dedup by content hash: (keep_doc_id, n_copies) per distinct
    * content. The 256-bit hash shuffles instead of the full text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("h"))
      .agg(min(idCol).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select("keep_doc_id", "n_copies")

  /** Exact n-gram Jaccard over candidate pairs sharing >= 1 shingle:
    * (doc_id_1, doc_id_2, jaccard) with jaccard unrounded. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val ex0 = withShingles(df, textCol, k)
      .select(col(idCol).as("doc_id"), explode(col("shingles")).as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ex0.count()
    val counts = ex0.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ex = ex0.join(broadcast(counts), Seq("doc_id"))
    val a = ex.select(col("doc_id").as("doc_id_1"), col("n").as("n1"), col("s"))
    val b = ex.select(col("doc_id").as("doc_id_2"), col("n").as("n2"), col("s"))
    a.join(b, Seq("s")).filter(col("doc_id_1") < col("doc_id_2"))
      .groupBy("doc_id_1", "doc_id_2")
      .agg(count(lit(1)).as("inter"), first("n1").as("n1"), first("n2").as("n2"))
      .withColumn("jaccard",
        col("inter") / (col("n1") + col("n2") - col("inter")))
      .select("doc_id_1", "doc_id_2", "jaccard")
  }

  /** MinHash LSH candidate pairs with exact Jaccard distance on candidates
    * (sub-quadratic; spark.ml banding; deterministic for a fixed seed). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxJaccardDistance: Double = 0.4, numHashTables: Int = 4,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val docs = withShingles(df, textCol).select(col(idCol).as("doc_id"), col("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(docs).persist(StorageLevel.MEMORY_AND_DISK)
    feat.count()
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    mh.fit(feat).approxSimilarityJoin(feat, feat, maxJaccardDistance, "jaccard_dist")
      .select(col("datasetA.doc_id").as("doc_id_1"),
        col("datasetB.doc_id").as("doc_id_2"), col("jaccard_dist"))
      .filter(col("doc_id_1") < col("doc_id_2"))
  }

  /** SimHash sketch pairs within a hamming radius, via 16-bit-band
    * self-join (4 bands over the 64-bit sketch -> radius <= 16 recall
    * guaranteed by pigeonhole for <= 3 differing bands). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8): DataFrame = {
    val sh = df.withColumn("w", toks(col(textCol)))
      .filter(size(col("w")) >= 3)
      .select(col(idCol).as("doc_id"), simhash64(col("w")).as("h"))
    val bands = sh.select(col("doc_id"), col("h"),
      explode(expr("transform(sequence(0, 3), b -> struct(b as band, shiftright(h, b*16) & 65535 as key))")).as("bk"))
      .select(col("doc_id"), col("h"), col("bk.band"), col("bk.key"))
    val a = bands.select(col("doc_id").as("doc_id_1"), col("h").as("h1"),
      col("band"), col("key"))
    val b = bands.select(col("doc_id").as("doc_id_2"), col("h").as("h2"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key")).filter(col("doc_id_1") < col("doc_id_2"))
      .select(col("doc_id_1"), col("doc_id_2"),
        expr("bit_count(h1 ^ h2)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact embedding-cosine pairs above a threshold (unrounded cosine).
    * Quadratic verification — for corpus-scale inputs use the LSH variant
    * in `Similarity` to generate candidates first. */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val emb = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", vec_l2norm(col("v")))
    val a = emb.select(col("vec_id").as("vec_id_1"), col("v").as("v1"), col("nrm").as("nrm1"))
    val b = emb.select(col("vec_id").as("vec_id_2"), col("v").as("v2"), col("nrm").as("nrm2"))
    a.crossJoin(broadcast(b)).filter(col("vec_id_1") < col("vec_id_2"))
      .withColumn("cosine", vec_dot(col("v1"), col("v2")) / (col("nrm1") * col("nrm2")))
      .filter(col("cosine") >= minCosine)
      .select("vec_id_1", "vec_id_2", "cosine")
  }
}
