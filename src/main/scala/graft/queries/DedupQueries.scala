package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.functions.simhash64

/** Deduplication family for a training-data pipeline:
  *
  *  - exact (content-hash groupBy)
  *  - n-gram Jaccard (shingle-bucket join — exact similarity, candidate
  *    pairs pruned to those sharing a shingle)
  *  - MinHash LSH (spark.ml banding — the sub-quadratic scale path)
  *  - SimHash (constant-size sketch + 16-bit-band self-join)
  *  - embedding cosine near-dup (exact; LSH variant in SimilarityQueries)
  *
  * Scale posture: nothing here is O(n^2) except the *verification* of
  * candidate pairs produced by a bucket join; every candidate generator is
  * a shuffle on a bounded key (shingle, band, LSH bucket). At 100 TB the
  * shingle join's hot keys (very common shingles) are handled by AQE skew
  * splitting; the MinHash/SimHash paths bound candidates regardless of skew.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB-compatible rounding (shadows functions.round): round the scaled
    * double half-away-from-zero, i.e. round(x*10^n)/10^n — the same
    * computation DuckDB's round() performs, so values landing exactly on a
    * scaled .5 boundary agree between engines. */
  private def round(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    org.apache.spark.sql.functions.round(c * p, 0) / p
  }

  private def toks(c: Column): Column = split(lower(c), " ")

  /** Distinct word 3-gram shingles of `text` (docs with <3 tokens get none),
    * via the native single-pass kernel. */
  private def shingled(df: DataFrame): DataFrame =
    df.withColumn("w", toks(col("text")))
      .filter(size(col("w")) >= 3)
      .withColumn("shingles", graft.functions.functions.word_shingles(col("w"), 3))

  val queries: ListMap[String, Q] = ListMap(
    // Exact dedup via content hash: one shuffle on a 256-bit key; at scale
    // the hash groupBy avoids shipping full texts through the exchange
    "dedup_exact" -> ((spark, dir) => {
      Tables.load(spark, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .select("keep_doc_id", "n_copies")
        .orderBy("keep_doc_id")
    }),
    // Exact n-gram Jaccard >= 0.8 over candidate pairs sharing a shingle
    "dedup_ngram_jaccard" -> ((spark, dir) => {
      // materialize the exploded shingles once — the self-join would
      // otherwise recompute the (expensive) shingle transform on both
      // sides, and putting size(shingles) in the same projection as
      // explode(shingles) re-evaluates the transform per exploded row.
      // Explode once, persist (MEMORY_AND_DISK: spill, don't OOM), and
      // derive each doc's shingle count by aggregation of the cached rows.
      val ex0 = shingled(Tables.load(spark, dir, "documents"))
        .select(col("doc_id"), explode(col("shingles")).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ex0.count()
      val counts = ex0.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val ex = ex0.join(broadcast(counts), Seq("doc_id"))
      val a = ex.select(col("doc_id").as("doc_id_1"), col("n").as("n1"), col("s"))
      val b = ex.select(col("doc_id").as("doc_id_2"), col("n").as("n2"), col("s"))
      a.join(b, Seq("s")).filter(col("doc_id_1") < col("doc_id_2"))
        .groupBy("doc_id_1", "doc_id_2")
        .agg(count(lit(1)).as("inter"), first("n1").as("n1"), first("n2").as("n2"))
        .withColumn("jaccard",
          round(col("inter") / (col("n1") + col("n2") - col("inter")), 6))
        .filter(col("jaccard") >= 0.8)
        .select("doc_id_1", "doc_id_2", "jaccard")
        .orderBy("doc_id_1", "doc_id_2")
    }),
    // MinHash LSH near-dup candidates (sub-quadratic; spark.ml banding).
    // Approximate by construction -> rows-only check, fixed seed.
    "dedup_minhash_lsh" -> ((spark, dir) => {
      import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
      val docs = shingled(Tables.load(spark, dir, "documents"))
        .select(col("doc_id"), col("shingles"))
      val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
        .setNumFeatures(1 << 18).setBinary(true)
      // persist: fit + both sides of the self-join otherwise re-evaluate
      // the shingle + hashing pipeline three times
      val feat = tf.transform(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      feat.count()
      val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(4).setSeed(42L)
      val model = mh.fit(feat)
      model.approxSimilarityJoin(feat, feat, 0.4, "jaccard_dist")
        .select(col("datasetA.doc_id").as("doc_id_1"),
          col("datasetB.doc_id").as("doc_id_2"),
          round(lit(1.0) - col("jaccard_dist"), 6).as("jaccard"))
        .filter(col("doc_id_1") < col("doc_id_2"))
        .orderBy("doc_id_1", "doc_id_2")
    }),
    // SimHash sketch + banded self-join, hamming <= 8
    "dedup_simhash" -> ((spark, dir) => {
      val sh = Tables.load(spark, dir, "documents")
        .withColumn("w", toks(col("text")))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), simhash64(col("w")).as("h"))
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
        .filter(col("hamming") <= 8)
        .orderBy("doc_id_1", "doc_id_2")
    }),
    // Exact embedding cosine near-dup (>= 0.5); norms precomputed per side,
    // dot product via the native codegen'd kernel (float arrays widened to
    // double inside the loop — bit-identical to cast-then-fold)
    "dedup_embedding_cosine" -> ((spark, dir) => {
      import graft.functions.functions.{vec_dot, vec_l2norm}
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", vec_l2norm(col("v")))
      val a = emb.select(col("vec_id").as("vec_id_1"), col("v").as("v1"), col("nrm").as("nrm1"))
      val b = emb.select(col("vec_id").as("vec_id_2"), col("v").as("v2"), col("nrm").as("nrm2"))
      a.crossJoin(broadcast(b)).filter(col("vec_id_1") < col("vec_id_2"))
        .withColumn("cosine", round(
          vec_dot(col("v1"), col("v2")) / (col("nrm1") * col("nrm2")), 6))
        .filter(col("cosine") >= 0.5)
        .select("vec_id_1", "vec_id_2", "cosine")
        .orderBy("vec_id_1", "vec_id_2")
    }))

  private val duckShingles =
    """WITH tok AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
      |  WHERE len(string_split(lower(text), ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                   for i in range(1, len(w) - 1)]) AS shingles
      |  FROM tok),
      |ex AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh)""".stripMargin

  val oracleSql: ListMap[String, String] = ListMap(
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      (duckShingles +
        """
          |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
          |  round(count(*) * 1.0 / (any_value(a.n) + any_value(b.n) - count(*)), 6) AS jaccard
          |FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          |GROUP BY 1, 2
          |HAVING round(count(*) * 1.0 / (any_value(a.n) + any_value(b.n) - count(*)), 6) >= 0.8
          |ORDER BY doc_id_1, doc_id_2""".stripMargin),
    "dedup_embedding_cosine" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
        |  round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
        |    / (a.nrm * b.nrm), 6) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
        |    / (a.nrm * b.nrm), 6) >= 0.5
        |ORDER BY vec_id_1, vec_id_2""".stripMargin)
}
