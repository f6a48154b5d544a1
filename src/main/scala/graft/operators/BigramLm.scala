package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bigram language model with the TRAIN / SERVE lifecycle split — the
  * CCNet-style usage where the model is fitted ONCE on a reference corpus
  * and then scores every crawl shard (Wenzek et al., "CCNet: Extracting
  * High Quality Monolingual Datasets from Web Crawl Data", LREC 2020
  * train a reference LM and filter the crawl by its perplexity; the
  * in-one-call corpus-internal variant lives in
  * [[TextAnalysis.bigramLm]]).
  *
  * A trained model is three aggregates over the training corpus, all in
  * RATIONAL arithmetic (no log/exp) so scores are engine-reproducible:
  *
  *   model: (bg, c12)  corpus count per bigram        — corpus-keyed table
  *   ctx:   (w1, c1)   corpus count per bigram-start  — corpus-keyed table
  *   v                 vocabulary size                — one scalar
  *
  * Scoring a document under a FIXED model is add-one smoothing over its
  * bigrams: p(bg) = (c12 + 1) / (c1 + v) with c12 = c1 = 0 for unseen
  * keys, pred_prob = Σ k·p / Σ k (k = the doc's bigram count), plus
  * oov_rate = the fraction of the doc's DISTINCT bigrams absent from the
  * model — the two standard quality/novelty signals.
  *
  * Scale shape: training is two key-partitioned aggregations plus one
  * bounded count; nothing corpus-sized is ever collected (the count tables
  * stay DataFrames). Scoring joins the document bigrams against the model
  * tables keyed by bigram/context — co-partitioned shuffle joins, AQE
  * handling hot-bigram skew ("of the"-style keys; SkewStressSpec pins the
  * shape). The durable form (`write`/`loadIfValid`) follows the
  * [[PqIndex]] manifest contract: build-once / serve-many-sessions, reopen
  * validated by metadata only, zero training jobs on a hit
  * (BigramLmPersistSpec asserts the skip).
  */
final class BigramLm private[operators] (
    /** (bg, c12) corpus bigram counts. */
    val model: DataFrame,
    /** (w1, c1) bigram-start context counts. */
    val ctx: DataFrame,
    /** Training-corpus vocabulary size. */
    val v: Long) {

  /** Durable form: model + ctx tables and a validation manifest. */
  def write(path: String, source: String = ""): Unit = {
    val spark = model.sparkSession
    model.write.mode("overwrite").parquet(s"$path/model")
    ctx.write.mode("overwrite").parquet(s"$path/ctx")
    // footer-stats counts of what was just written — metadata, not a scan
    val modelRows = spark.read.parquet(s"$path/model").count()
    val ctxRows = spark.read.parquet(s"$path/ctx").count()
    val props = new java.util.Properties()
    props.setProperty("version", BigramLm.ManifestVersion)
    props.setProperty("source", source)
    props.setProperty("v", v.toString)
    props.setProperty("modelRows", modelRows.toString)
    props.setProperty("ctxRows", ctxRows.toString)
    val mPath = BigramLm.manifestPath(path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(mPath, true)
    try props.store(out, "graft bigram-LM manifest")
    finally out.close()
  }

  /** Score `df` under THIS model: (idCol, n_bigrams, pred_prob, oov_rate)
    * per document with at least one bigram. Rounding is the DuckDB-
    * compatible scaled round (half-away-from-zero), so the driver oracle
    * reproduces the scores bit-for-bit. */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = split(lower(col(textCol)), " ")
    val occ = df.select(col(idCol),
      explode(zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val docBg = occ.groupBy(idCol, "bg").agg(count(lit(1)).as("k"))
    def round6(c: org.apache.spark.sql.Column) = round(c * 1e6, 0) / 1e6
    val p = (coalesce(col("c12"), lit(0L)).cast("double") + 1.0) /
      (coalesce(col("c1"), lit(0L)) + v)
    docBg.withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(model, Seq("bg"), "left")
      .join(ctx, Seq("w1"), "left")
      .groupBy(idCol)
      .agg(sum("k").as("n_bigrams"),
        round6(sum(col("k").cast("double") * p) / sum("k")).as("pred_prob"),
        round6(avg(when(col("c12").isNull, 1.0).otherwise(0.0))).as("oov_rate"))
  }
}

object BigramLm {
  private val trainsRun = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] def trainCount: Int = trainsRun.get

  private val ManifestVersion = "1"

  private def manifestPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_MANIFEST.properties")

  /** TRAIN: aggregate the model tables from `df`. The count tables stay
    * lazy DataFrames; the single action is the bounded vocabulary count
    * (one scalar — the analogue of PqIndex's bounded sample collect). */
  def train(df: DataFrame, textCol: String): BigramLm = {
    trainsRun.incrementAndGet()
    val t = split(lower(col(textCol)), " ")
    val occ = df.select(explode(zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b))).as("bg"))
    val model = occ.groupBy("bg").agg(count(lit(1)).as("c12"))
    val ctx = occ.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("c1"))
    val v = df.select(explode(t).as("w")).agg(countDistinct("w")).head().getLong(0)
    new BigramLm(model, ctx, v)
  }

  /** Reopen a written model ONLY if its manifest proves it complete,
    * current, and trained from the caller's `source` — metadata-sized
    * validation, never a data scan, zero training jobs on a hit. */
  def loadIfValid(spark: SparkSession, path: String,
      source: String): Option[BigramLm] = {
    val mPath = manifestPath(path)
    try {
      val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(mPath)) return None
      val props = new java.util.Properties()
      val in = fs.open(mPath)
      try props.load(in) finally in.close()
      def field(k: String) = Option(props.getProperty(k))
      if (!field("version").contains(ManifestVersion) ||
        !field("source").contains(source)) return None
      val lm = load(spark, path)
      val valid = field("v").contains(lm.v.toString) &&
        field("modelRows").exists(_.toLong == lm.model.count()) &&
        field("ctxRows").exists(_.toLong == lm.ctx.count())
      if (valid) Some(lm) else None
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Reopen a written model: lazy parquet scans + the manifest scalar. */
  def load(spark: SparkSession, path: String): BigramLm = {
    val props = new java.util.Properties()
    val mPath = manifestPath(path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(mPath)
    try props.load(in) finally in.close()
    new BigramLm(
      spark.read.parquet(s"$path/model"),
      spark.read.parquet(s"$path/ctx"),
      props.getProperty("v").toLong)
  }
}
