package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Term-partitioned inverted index with BM25 serving — the text-retrieval
  * member of the durable build-once / serve-many index family
  * ([[IvfIndex]], [[PqIndex]], [[ChunkIndex]], [[BigramLm]]).
  *
  * Building tokenizes the corpus ONCE into classic posting rows
  * (term, doc, tf, dl — document length denormalized onto the posting so
  * serving never joins a corpus-sized side), plus a per-term document-
  * frequency sidecar and two manifest scalars (document count, total
  * length). Both tables are written PARTITIONED BY a term hash bucket, so
  * a query's scan plans only the buckets its terms hash to — the static
  * partition pruning an IVF probe gets from cells, applied to text: at
  * corpus scale a 3-term query over a 4096-bucket index touches <= 3
  * buckets of posting files and none of the raw text.
  *
  * Serving computes the SAME BM25 formulation as the fused
  * [[TextAnalysis.bm25Rank]] (idf = (N - df + 0.5)/(df + 0.5), tf
  * normalized by k1/b against avgdl, round-6 sum per document), so the
  * served ranking is bit-identical to the one-call form and shares its
  * DuckDB oracle. avgdl divides two exact manifest longs — document
  * lengths are integers, so their double sum is exact in any order and
  * the division matches the fused path's avg() to the bit.
  *
  * Reopen across sessions is manifest-validated metadata only
  * ([[InvertedIndex.loadIfValid]]): zero tokenize/aggregate jobs on a
  * hit, the [[BigramLm]] contract.
  */
final class InvertedIndex private[operators] (
    private[operators] val spark: SparkSession,
    /** (idCol, term, tf, dl, bucket) posting rows. */
    val postings: DataFrame,
    /** (term, df, bucket) document frequencies. */
    val terms: DataFrame,
    /** Name of the document id column the index was built over. */
    val idCol: String,
    /** Corpus document count (all docs, matched or not). */
    val nDocs: Long,
    /** Sum of document lengths (tokens) over the corpus. */
    val sumDl: Long,
    /** Term hash-bucket count (the partition key space). */
    val nBuckets: Int) {

  /** BM25 score per document containing at least one query term:
    * (idCol, matched_terms, bm25). Bucket + term filters restrict the
    * posting scan; on a file-backed index the bucket predicate is a
    * static PARTITION filter — only the query terms' buckets are read. */
  def serve(queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(k1 > 0 && b >= 0 && b <= 1,
      s"need k1 > 0 and 0 <= b <= 1, got k1=$k1 b=$b")
    val buckets = queryTerms.map(InvertedIndex.bucketOf(_, nBuckets)).distinct
    val post = postings
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(queryTerms: _*))
    val df = terms
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(queryTerms: _*))
      .select("term", "df")
    val avgdl = sumDl.toDouble / nDocs
    def round6(c: Column) = round(c * 1e6, 0) / 1e6
    val idf = (lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5)
    val tfNorm = col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    post.join(df, "term")
      .groupBy(idCol)
      .agg(count(lit(1)).as("matched_terms"),
        round6(sum(idf * tfNorm)).as("bm25"))
  }

  /** Durable form: bucket-partitioned postings + terms and a validation
    * manifest carrying the corpus scalars. The terms sidecar is derived
    * from the postings JUST WRITTEN (df = posting rows per term — the
    * same aggregate, over the on-disk result), so the corpus-sized
    * tokenize+aggregate plan executes once here, not once per table. */
  def write(path: String, source: String = ""): Unit = {
    postings.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    val written = spark.read.parquet(s"$path/postings")
    written.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("bucket", InvertedIndex.bucketCol(col("term"), nBuckets))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/terms")
    val postRows = written.count()
    val termRows = spark.read.parquet(s"$path/terms").count()
    val props = new java.util.Properties()
    props.setProperty("version", InvertedIndex.ManifestVersion)
    props.setProperty("source", source)
    props.setProperty("idCol", idCol)
    props.setProperty("nDocs", nDocs.toString)
    props.setProperty("sumDl", sumDl.toString)
    props.setProperty("nBuckets", nBuckets.toString)
    props.setProperty("postRows", postRows.toString)
    props.setProperty("termRows", termRows.toString)
    val mPath = InvertedIndex.manifestPath(path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(mPath, true)
    try props.store(out, "graft inverted-index manifest")
    finally out.close()
  }
}

object InvertedIndex {
  private val buildsRun = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] def buildCount: Int = buildsRun.get

  private val ManifestVersion = "1"

  private def manifestPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_MANIFEST.properties")

  /** The engine-side bucket key; [[bucketOf]] is its driver-side twin. */
  private def bucketCol(term: Column, nBuckets: Int): Column =
    pmod(xxhash64(term), lit(nBuckets.toLong)).cast("int")

  /** Driver-side bucket of a term — evaluates the SAME Catalyst xxhash64
    * the build used, so the serve-time literals always land on the
    * partitions the writer created. */
  private[graft] def bucketOf(term: String, nBuckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    // seed 42 = the default the SQL-level xxhash64() builds with
    val h = XxHash64(Seq(Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType)), 42L).eval(null).asInstanceOf[Long]
    (((h % nBuckets) + nBuckets) % nBuckets).toInt
  }

  /** BUILD: tokenize via [[TextAnalysis.tokens]] — the repo's ONE
    * tokenization definition, the same one the fused bm25Rank derives
    * from, so the served==fused parity contract cannot drift — aggregate
    * postings + term frequencies, and count the two corpus scalars (the
    * single bounded action — the BigramLm vocabulary-count analogue).
    * `nDocs` counts documents WITH a token list (dl non-null), matching
    * the fused path's avg("dl") null semantics: a null-text row
    * contributes to neither numerator nor denominator in either
    * formulation. The posting/term tables stay lazy. */
  def build(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 64): InvertedIndex = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    buildsRun.incrementAndGet()
    val spark = df.sparkSession
    val t = TextAnalysis.tokens(col(textCol))
    val dl = df.select(col(idCol), size(t).cast("long").as("dl"))
    val Array(nDocs, sumDl) = dl
      .agg(count(col("dl")).cast("long"), sum("dl").cast("long"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val postings = df.select(col(idCol), explode(t).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .join(dl, idCol)
      .withColumn("bucket", bucketCol(col("term"), nBuckets))
    val terms = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("bucket", bucketCol(col("term"), nBuckets))
    new InvertedIndex(spark, postings, terms, idCol, nDocs, sumDl, nBuckets)
  }

  private val SourceSep = "\u0001"

  /** Incrementally index a batch of NEW documents into a written index —
    * the daily-crawl lifecycle ([[ChunkIndex.appendTo]] semantics, with
    * the ledger making a crashed job's retry a no-op):
    *
    *  - posting rows for new documents are disjoint from existing ones
    *    (the caller appends new doc ids, the family's append contract),
    *    so the posting table extends by a pure parquet append;
    *  - per-term document frequencies MERGE (df' = df + delta), so the
    *    vocab-sized terms sidecar is rebuilt into a staging dir and
    *    swapped by rename — never read-and-overwritten in place;
    *  - the corpus scalars add; the manifest (with the new-source ledger
    *    entry) commits LAST, so a crash at any earlier point leaves a
    *    table the recount checks refuse as torn instead of silently
    *    double-counting.
    *
    * Returns false (no-op) when `newSource` is already in the ledger. */
  def appendTo(spark: SparkSession, path: String, newDocs: DataFrame,
      textCol: String, newSource: String): Boolean = {
    val mPath = manifestPath(path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val prior = new java.util.Properties()
    val in = fs.open(mPath)
    try prior.load(in) finally in.close()
    val ledger = Option(prior.getProperty("appliedSources"))
      .map(_.split(SourceSep).toSet)
      .getOrElse(Set(prior.getProperty("source", "")))
    if (ledger.contains(newSource)) return false // already applied: no-op
    val priorPost = prior.getProperty("postRows").toLong
    val priorTerm = prior.getProperty("termRows").toLong
    require(spark.read.parquet(s"$path/postings").count() == priorPost &&
      spark.read.parquet(s"$path/terms").count() == priorTerm,
      s"inverted index at $path does not match its committed manifest — " +
        "a previous append crashed mid-write; rebuild instead of appending")
    val idCol = prior.getProperty("idCol")
    val nBuckets = prior.getProperty("nBuckets").toInt
    // same tokenization + null semantics as build (TextAnalysis.tokens;
    // dl-count denominators), so an appended index can never drift from a
    // fresh build over the union corpus
    val t = TextAnalysis.tokens(col(textCol))
    val dl = newDocs.select(col(idCol), size(t).cast("long").as("dl"))
    val Array(dDocs, dSumDl) = dl
      .agg(count(col("dl")).cast("long"), sum("dl").cast("long"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    // the delta is batch-sized; persist it so the postings append and the
    // df merge don't each re-run the tokenize+aggregate plan
    val deltaPostings = newDocs.select(col(idCol), explode(t).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .join(dl, idCol)
      .withColumn("bucket", bucketCol(col("term"), nBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      deltaPostings.write.mode("append").partitionBy("bucket")
        .parquet(s"$path/postings")
      // merge the vocab-sized df sidecar into a staging dir, then swap.
      // Hadoop delete/rename report failure by RETURNING false, not
      // throwing — check both, or a failed swap would leave the stale
      // sidecar in place under a freshly committed manifest (recounts
      // would then pass against the wrong table forever).
      val deltaDf = deltaPostings.groupBy("term").agg(count(lit(1)).as("df"))
      val merged = spark.read.parquet(s"$path/terms").select("term", "df")
        .unionByName(deltaDf)
        .groupBy("term").agg(sum("df").cast("long").as("df"))
        .withColumn("bucket", bucketCol(col("term"), nBuckets))
      merged.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/terms-next")
      require(fs.delete(new org.apache.hadoop.fs.Path(s"$path/terms"), true),
        s"could not delete $path/terms for the sidecar swap")
      require(fs.rename(new org.apache.hadoop.fs.Path(s"$path/terms-next"),
        new org.apache.hadoop.fs.Path(s"$path/terms")),
        s"could not rename $path/terms-next into place")
    } finally deltaPostings.unpersist()
    val postRows = spark.read.parquet(s"$path/postings").count()
    val termRows = spark.read.parquet(s"$path/terms").count()
    val props = new java.util.Properties()
    props.setProperty("version", ManifestVersion)
    props.setProperty("source", newSource)
    props.setProperty("appliedSources",
      (ledger + newSource).toSeq.sorted.mkString(SourceSep))
    props.setProperty("idCol", idCol)
    props.setProperty("nDocs",
      (prior.getProperty("nDocs").toLong + dDocs).toString)
    props.setProperty("sumDl",
      (prior.getProperty("sumDl").toLong + dSumDl).toString)
    props.setProperty("nBuckets", nBuckets.toString)
    props.setProperty("postRows", postRows.toString)
    props.setProperty("termRows", termRows.toString)
    val out = fs.create(mPath, true)
    try props.store(out, "graft inverted-index manifest")
    finally out.close()
    true
  }

  /** Reopen a written index ONLY if its manifest proves it complete,
    * current, and built from the caller's `source` — metadata-sized
    * validation, zero build jobs on a hit. */
  def loadIfValid(spark: SparkSession, path: String,
      source: String): Option[InvertedIndex] = {
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
      val idx = load(spark, path)
      val valid =
        field("postRows").exists(_.toLong == idx.postings.count()) &&
          field("termRows").exists(_.toLong == idx.terms.count())
      if (valid) Some(idx) else None
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Reopen a written index: lazy partitioned scans + manifest scalars. */
  def load(spark: SparkSession, path: String): InvertedIndex = {
    val props = new java.util.Properties()
    val mPath = manifestPath(path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(mPath)
    try props.load(in) finally in.close()
    new InvertedIndex(spark,
      spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/terms"),
      props.getProperty("idCol"),
      props.getProperty("nDocs").toLong,
      props.getProperty("sumDl").toLong,
      props.getProperty("nBuckets").toInt)
  }
}
