package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Term-partitioned inverted index with BM25 serving — the text-retrieval
  * member of the durable build-once / serve-many index family
  * ([[IvfIndex]], [[PqIndex]], [[ChunkIndex]], [[BigramLm]]).
  *
  * Building tokenizes the corpus through [[TextAnalysis.tokens]] (the
  * repo's ONE tokenization definition — the same one the fused
  * [[TextAnalysis.bm25Rank]] derives from) into classic posting rows
  * (term, doc, tf, dl — document length denormalized onto the posting so
  * serving never joins a corpus-sized side), plus a per-term document-
  * frequency sidecar and the corpus scalars. Both tables are written
  * PARTITIONED BY a term hash bucket, so a query's scan plans only the
  * buckets its terms hash to — the static partition pruning an IVF probe
  * gets from cells, applied to text: at corpus scale a 3-term query over
  * a 4096-bucket index touches <= 3 buckets of posting files and none of
  * the raw text.
  *
  * Serving scores through [[TextAnalysis.bm25TermScore]] — the SAME
  * expression tree as the fused path, so the served ranking is
  * bit-identical to the one-call form and shares its DuckDB oracle. Two
  * corpus scalars ride the manifest because the fused path's two
  * denominators have different null semantics: idf's N counts EVERY row
  * (`count(lit(1))`) while avgdl's mean skips null-text rows
  * (`avg("dl")`), so the index stores nDocs (all rows) and nDl + sumDl
  * (non-null lengths) separately.
  *
  * Reopen across sessions is manifest-validated metadata only
  * ([[InvertedIndex.loadIfValid]]): zero tokenize/aggregate jobs on a
  * hit, the [[BigramLm]] contract.
  *
  * Serving lifecycle note: an index that was built but never written
  * serves from the LAZY build plan — each serve re-derives postings and
  * df from the corpus (the parity-check path InvertedIndexSpec uses).
  * Production serving is write() + load(): scans then read the bucketed
  * parquet, and only the query buckets.
  *
  * DELETION lifecycle ([[InvertedIndex.excise]]): excised documents are
  * TOMBSTONED, not rewritten — the corpus-sized postings table stays
  * untouched on disk while the vocab-sized df sidecar and the manifest
  * scalars (the BM25 N/df/avgdl inputs) are corrected immediately from
  * the excised BATCH, so every serve after the excise scores exactly as
  * a fresh build over the surviving corpus would. Serving anti-joins the
  * (small, takedown-sized) tombstone list after bucket pruning; the next
  * [[InvertedIndex.compact]] physically drops the tombstoned posting
  * rows and clears the list.
  */
final class InvertedIndex private[operators] (
    private[operators] val spark: SparkSession,
    /** (idCol, term, tf, dl, bucket) posting rows. */
    val postings: DataFrame,
    /** (term, df, bucket) document frequencies. */
    val terms: DataFrame,
    /** Name of the document id column the index was built over. */
    val idCol: String,
    /** Corpus document count, ALL rows — the BM25 idf N. */
    val nDocs: Long,
    /** Documents with a non-null token list — avgdl's denominator. */
    val nDl: Long,
    /** Sum of document lengths (tokens) over the corpus. */
    val sumDl: Long,
    /** Term hash-bucket count (the partition key space). */
    val nBuckets: Int,
    /** Excised doc ids ([[InvertedIndex.excise]]) not yet physically
      * dropped by [[InvertedIndex.compact]] — None when the index has no
      * pending tombstones (the common case; serve plans are unchanged). */
    val tombstones: Option[DataFrame] = None) {

  /** BM25 score per document containing at least one query term:
    * (idCol, matched_terms, bm25). Query terms are lowercased to match
    * the lowercased token stream. Bucket + term filters restrict the
    * posting scan; on a file-backed index the bucket predicate is a
    * static PARTITION filter — only the query terms' buckets are read. */
  def serve(queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(k1 > 0 && b >= 0 && b <= 1,
      s"need k1 > 0 and 0 <= b <= 1, got k1=$k1 b=$b")
    val termList = queryTerms.map(_.toLowerCase)
    val buckets = termList.map(InvertedIndex.bucketOf(_, nBuckets)).distinct
    // tombstoned docs are excluded AFTER bucket+term pruning (the anti
    // join sees query-bucket posting rows only, never the corpus) and
    // BEFORE scoring — their df/N/avgdl contributions were already
    // removed at excise time, so the scores equal a fresh build over the
    // surviving corpus
    val prunedPost = postings
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(termList: _*))
    val post = tombstones
      .map(t => prunedPost.join(t, Seq(idCol), "left_anti"))
      .getOrElse(prunedPost)
    val df = terms
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(termList: _*))
      .select("term", "df")
    // nDl == 0 (every corpus text null) would make avgdl NaN and poison
    // the scores, where the fused bm25Rank's avg("dl") is null; the
    // fallback is inert — with no tokenized documents the posting table
    // is empty, so serve returns zero rows either way (the same verdict
    // as the fused path on the degenerate corpus) and avgdl never
    // touches an output value
    val avgdl = if (nDl > 0) sumDl.toDouble / nDl else 1.0
    post.join(df, "term")
      .groupBy(idCol)
      .agg(count(lit(1)).as("matched_terms"),
        TextAnalysis.bm25Round6(sum(TextAnalysis.bm25TermScore(
          lit(nDocs), col("df"), col("tf"), col("dl"), lit(avgdl), k1, b)))
          .as("bm25"))
  }

  /** Durable form: bucket-partitioned postings + terms and a validation
    * manifest carrying the corpus scalars. The terms sidecar is derived
    * from the postings JUST WRITTEN (df = posting rows per term — the
    * same aggregate, over the on-disk result), so the corpus-sized
    * tokenize+aggregate plan executes once here, not once per table.
    * Overwrite mode is pinned STATIC: under a session-wide dynamic
    * partition-overwrite setting, a rebuild over a changed corpus would
    * keep stale bucket directories and the recount would then certify
    * the mixed table. */
  def write(path: String, source: String = ""): Unit = {
    // rebuild IS the crash recovery: drop any lease a dead maintainer left
    WriterLease.clear(spark, path)
    postings.write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(s"$path/postings")
    val written = spark.read.parquet(s"$path/postings")
    written.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("bucket", InvertedIndex.bucketCol(col("term"), nBuckets))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(s"$path/terms")
    val postRows = written.count()
    val termRows = spark.read.parquet(s"$path/terms").count()
    val props = new java.util.Properties()
    props.setProperty("version", InvertedIndex.ManifestVersion)
    props.setProperty("source", source)
    props.setProperty("idCol", idCol)
    props.setProperty("nDocs", nDocs.toString)
    props.setProperty("nDl", nDl.toString)
    props.setProperty("sumDl", sumDl.toString)
    props.setProperty("nBuckets", nBuckets.toString)
    props.setProperty("postRows", postRows.toString)
    props.setProperty("termRows", termRows.toString)
    props.setProperty("tombRows", "0")
    val mPath = InvertedIndex.manifestPath(path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    // a rebuild at a path that previously carried pending excisions must
    // not leave the stale tombstone list beside the fresh tables
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones"), true)
    val out = fs.create(mPath, true)
    try props.store(out, "graft inverted-index manifest")
    finally out.close()
  }
}

object InvertedIndex {
  private val buildsRun = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] def buildCount: Int = buildsRun.get

  private val ManifestVersion = "1"

  /** Largest pending-tombstone count [[excise]] still snapshots by
    * collecting to a driver-side local relation; above it the snapshot
    * is a localCheckpoint (same listing-pinning guarantee, no driver
    * heap). 1M id rows ≈ tens of MB — comfortably driver-sized. */
  private[operators] val SnapshotCollectBound: Long = 1000000L

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

  /** BUILD: one tokenize pass aggregated into postings + term
    * frequencies, plus the bounded corpus-scalars action (the BigramLm
    * vocabulary-count analogue): nDocs counts EVERY row (the idf N of
    * the fused path's count(lit(1))), nDl/sumDl only rows with a token
    * list (the avg("dl") null semantics). The tables stay lazy. */
  def build(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 64): InvertedIndex = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    buildsRun.incrementAndGet()
    val spark = df.sparkSession
    val t = TextAnalysis.tokens(col(textCol))
    val dl = df.select(col(idCol), size(t).cast("long").as("dl"))
    val Array(nDocs, nDl, sumDl) = dl
      .agg(count(lit(1)).cast("long"), count(col("dl")).cast("long"),
        sum("dl").cast("long"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val postings = df.select(col(idCol), explode(t).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .join(dl, idCol)
      .withColumn("bucket", bucketCol(col("term"), nBuckets))
    val terms = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("bucket", bucketCol(col("term"), nBuckets))
    new InvertedIndex(spark, postings, terms, idCol, nDocs, nDl, sumDl,
      nBuckets)
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
    *    swapped by two renames — never read-and-overwritten in place;
    *  - the corpus scalars add; the manifest (with the new-source ledger
    *    entry) commits LAST, so a crash at any earlier point leaves a
    *    table the recount checks refuse as torn instead of silently
    *    double-counting.
    *
    * Writer contract (shared with the whole index family): ONE appender
    * at a time per path, and no live readers during the append — the
    * sidecar swap changes the file set under any open handle (reopen
    * after the append; the manifest is the publication point). Returns
    * false (no-op) when `newSource` is already in the ledger. */
  def appendTo(spark: SparkSession, path: String, newDocs: DataFrame,
      textCol: String, newSource: String): Boolean =
      WriterLease.withLease(spark, path) {
    val mPath = manifestPath(path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val prior = new java.util.Properties()
    val in = fs.open(mPath)
    try prior.load(in) finally in.close()
    def field(k: String) = Option(prior.getProperty(k))
    require(field("version").contains(ManifestVersion),
      s"inverted index at $path has manifest version " +
        s"${field("version").getOrElse("<none>")}; this appender " +
        s"understands only $ManifestVersion — rebuild instead of appending")
    val ledger = field("appliedSources")
      .map(_.split(SourceSep).toSet)
      .getOrElse(Set(prior.getProperty("source", "")))
    if (ledger.contains(newSource)) return false // already applied: no-op
    val priorPost = field("postRows").map(_.toLong).getOrElse(-1L)
    val priorTerm = field("termRows").map(_.toLong).getOrElse(-1L)
    val priorTomb = field("tombRows").map(_.toLong).getOrElse(0L)
    require(spark.read.parquet(s"$path/postings").count() == priorPost &&
      spark.read.parquet(s"$path/terms").count() == priorTerm &&
      tombstoneCount(spark, path) == priorTomb,
      s"inverted index at $path does not match its committed manifest — " +
        "a previous append or excise crashed mid-write; rebuild instead " +
        "of appending")
    val idCol = prior.getProperty("idCol")
    val nBuckets = prior.getProperty("nBuckets").toInt
    // an appended id matching a pending tombstone would be served DEAD
    // (the excision anti-join cannot tell a re-ingest from the excised
    // original until compaction clears the list) — refuse loudly; the
    // operator compacts first, then re-ingests
    if (priorTomb > 0) {
      val collisions = newDocs.select(col(idCol))
        .join(spark.read.parquet(s"$path/tombstones"), Seq(idCol), "left_semi")
        .count()
      require(collisions == 0,
        s"$collisions appended ids collide with pending tombstones at " +
          s"$path — compact the index (physically dropping the excised " +
          "rows) before re-ingesting those ids")
    }
    // same tokenization + null semantics as build, so an appended index
    // can never drift from a fresh build over the union corpus
    val t = TextAnalysis.tokens(col(textCol))
    val dl = newDocs.select(col(idCol), size(t).cast("long").as("dl"))
    val Array(dDocs, dNl, dSumDl) = dl
      .agg(count(lit(1)).cast("long"), count(col("dl")).cast("long"),
        sum("dl").cast("long"))
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
      // merge the vocab-sized df sidecar into a staging dir, then swap
      // with two RENAMES (old aside, next into place, drop old) — the
      // table is never half-deleted, and Hadoop delete/rename report
      // failure by RETURNING false, so both swap steps are checked (an
      // unchecked failed swap would leave the stale sidecar under a
      // freshly committed manifest that every later recount accepts)
      val deltaDf = deltaPostings.groupBy("term").agg(count(lit(1)).as("df"))
      val merged = spark.read.parquet(s"$path/terms").select("term", "df")
        .unionByName(deltaDf)
        .groupBy("term").agg(sum("df").cast("long").as("df"))
        .withColumn("bucket", bucketCol(col("term"), nBuckets))
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("bucket").parquet(s"$path/terms-next")
      val termsPath = new org.apache.hadoop.fs.Path(s"$path/terms")
      val nextPath = new org.apache.hadoop.fs.Path(s"$path/terms-next")
      val oldPath = new org.apache.hadoop.fs.Path(s"$path/terms-old")
      fs.delete(oldPath, true) // leftover from a crashed prior swap
      require(fs.rename(termsPath, oldPath),
        s"could not move $termsPath aside for the sidecar swap")
      require(fs.rename(nextPath, termsPath),
        s"could not rename $nextPath into place")
      fs.delete(oldPath, true)
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
    props.setProperty("nDl",
      (prior.getProperty("nDl").toLong + dNl).toString)
    props.setProperty("sumDl",
      (prior.getProperty("sumDl").toLong + dSumDl).toString)
    props.setProperty("nBuckets", nBuckets.toString)
    props.setProperty("postRows", postRows.toString)
    props.setProperty("termRows", termRows.toString)
    // pending excisions survive an append verbatim — dropping the field
    // would resurface every tombstoned document on the next load
    props.setProperty("tombRows", priorTomb.toString)
    val out = fs.create(mPath, true)
    try props.store(out, "graft inverted-index manifest")
    finally out.close()
    true
  }

  /** Row count of the tombstone list — 0 when the dir does not exist
    * (an index that never saw an excise). */
  private def tombstoneCount(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(s"$path/tombstones").count() else 0L
  }

  /** EXCISE: remove documents from a written index — the takedown /
    * opt-out / decontamination lifecycle, completing the maintenance
    * story (append → compact → DELETE). Tombstone-then-compact, never a
    * corpus-sized rewrite here:
    *
    *  - the excised ids land in a tombstone list the serve path
    *    anti-joins after bucket pruning (metadata-sized write);
    *  - the vocab-sized df sidecar is corrected IMMEDIATELY by
    *    subtracting the excised BATCH's per-term document counts — the
    *    same batch-sized tokenize [[appendTo]] pays, inverted — staged
    *    and swapped by two renames, terms reaching df 0 dropped;
    *  - the corpus scalars (the BM25 N and avgdl inputs) subtract the
    *    batch's stats under build's exact null semantics;
    *
    * so every serve between the excise and the next [[compact]] already
    * scores EXACTLY as a fresh build over the surviving corpus — stale
    * df/N/avgdl is the silent-corruption mode this design exists to
    * prevent. The postings table is untouched until [[compact]]
    * physically drops the tombstoned rows.
    *
    * `excisedDocs` must be the corpus rows being removed (id + the same
    * text column the index was built over) — the usual shape, since a
    * takedown list is resolved against the corpus to delete the rows
    * there too; the batch-derived df/scalar deltas are exact because
    * tokenization is deterministic. IDEMPOTENT via the applied-sources
    * ledger (a replayed excise tag no-ops, returns false), and SAFE
    * under OVERLAPPING batches: ids already tombstoned by an earlier
    * excise are anti-joined out before the deltas, so a second takedown
    * notice naming the same document subtracts nothing twice; a torn state
    * from a crash mid-excise is detected by recount and REFUSED
    * (recovery = rebuild over the surviving corpus). Writer contract as
    * for append: one maintainer at a time, no live readers across the
    * sidecar swap. */
  def excise(spark: SparkSession, path: String, excisedDocs: DataFrame,
      textCol: String, newSource: String): Boolean =
      WriterLease.withLease(spark, path) {
    val mPath = manifestPath(path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val prior = new java.util.Properties()
    val in = fs.open(mPath)
    try prior.load(in) finally in.close()
    def field(k: String) = Option(prior.getProperty(k))
    require(field("version").contains(ManifestVersion),
      s"inverted index at $path has manifest version " +
        s"${field("version").getOrElse("<none>")}; this excisor " +
        s"understands only $ManifestVersion — rebuild instead")
    val ledger = field("appliedSources")
      .map(_.split(SourceSep).toSet)
      .getOrElse(Set(prior.getProperty("source", "")))
    if (ledger.contains(newSource)) return false // already applied: no-op
    val priorTomb = field("tombRows").map(_.toLong).getOrElse(0L)
    require(
      spark.read.parquet(s"$path/postings").count() ==
        field("postRows").map(_.toLong).getOrElse(-1L) &&
        spark.read.parquet(s"$path/terms").count() ==
          field("termRows").map(_.toLong).getOrElse(-1L) &&
        tombstoneCount(spark, path) == priorTomb,
      s"inverted index at $path does not match its committed manifest — " +
        "a previous append or excise crashed mid-write; rebuild instead " +
        "of excising")
    val idCol = prior.getProperty("idCol")
    val nBuckets = prior.getProperty("nBuckets").toInt
    // OVERLAP GUARD: a second takedown batch under a NEW tag may overlap
    // an earlier one (two notices naming the same document) — ids already
    // tombstoned must NOT contribute to the df/scalar deltas again, or
    // nDocs/avgdl and per-term df double-subtract and BM25 silently
    // corrupts for every survivor until rebuild (and the df>0 filter can
    // drop terms surviving docs still contain). Anti-join the pending
    // tombstone list (metadata-sized) out of the batch — and dedupe
    // within the batch for the same reason — BEFORE computing deltas;
    // the ledger entry still commits so the tag replays as a no-op. Ids
    // never in the index at all remain the caller's contract
    // (`excisedDocs` is corpus rows being removed, and corpus ids are
    // the index's ids) — verifying membership would cost a corpus-sized
    // postings scan per takedown.
    val deduped = excisedDocs.dropDuplicates(idCol)
    // MATERIALIZED snapshot of the pending tombstones, not a lazy scan:
    // every action over `batch` (the dl aggregate, the tombstone append,
    // the df deltas) runs AFTER the append below, and a lazy plan's
    // captured file listing is only stable while nothing refreshes it
    // (spark.sql.metadataCacheTTLSeconds, a REFRESH TABLE, a future
    // listing-cache change). A refreshed listing would make this
    // anti-join exclude the batch's OWN just-appended ids — deltaDf
    // goes empty and a manifest with un-decremented df commits
    // silently. The list is takedown-sized (priorTomb id rows since the
    // last compact), so a local-relation collect is USUALLY bounded —
    // but "usually" is not a discipline: a bulk takedown followed by a
    // second excise before compaction makes priorTomb arbitrarily
    // large, so past SnapshotCollectBound the snapshot pins itself as a
    // localCheckpoint instead (eager — the blocks are materialized
    // before the append, so a refreshed listing cannot move the plan;
    // cost is one cluster-side write of the id list, no driver heap).
    val batch =
      if (priorTomb == 0L) deduped
      else {
        val snap = spark.read.parquet(s"$path/tombstones").select(idCol)
        val pending =
          if (priorTomb <= SnapshotCollectBound)
            spark.createDataFrame(
              java.util.Arrays.asList(snap.collect(): _*), snap.schema)
          else snap.localCheckpoint(true)
        deduped.join(pending, Seq(idCol), "left_anti")
      }
    // batch deltas under build's exact semantics: dDocs counts EVERY
    // excised row (the idf N), dNl/dSumDl only tokenized rows (avgdl)
    val t = TextAnalysis.tokens(col(textCol))
    val dl = batch.select(col(idCol), size(t).cast("long").as("dl"))
    val Array(dDocs, dNl, dSumDl) = dl
      .agg(count(lit(1)).cast("long"), count(col("dl")).cast("long"),
        sum("dl").cast("long"))
      .head().toSeq.map(x => Option(x).fold(0L)(_.asInstanceOf[Long])).toArray
    // tombstones FIRST: a crash after this append is caught by the
    // recount (tombRows off the committed manifest) and refused as torn
    batch.select(col(idCol)).write.mode("append")
      .parquet(s"$path/tombstones")
    // df correction is batch-sized (the excised docs' distinct terms),
    // merged into the vocab-sized sidecar and swapped like appendTo's
    val deltaDf = batch.select(col(idCol), explode(t).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).as("delta"))
    val merged = spark.read.parquet(s"$path/terms").select("term", "df")
      .join(deltaDf, Seq("term"), "left")
      .select(col("term"),
        (col("df") - coalesce(col("delta"), lit(0L))).cast("long").as("df"))
      .filter(col("df") > 0)
      .withColumn("bucket", bucketCol(col("term"), nBuckets))
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(s"$path/terms-next")
    val termsPath = new org.apache.hadoop.fs.Path(s"$path/terms")
    val nextPath = new org.apache.hadoop.fs.Path(s"$path/terms-next")
    val oldPath = new org.apache.hadoop.fs.Path(s"$path/terms-old")
    fs.delete(oldPath, true) // leftover from a crashed prior swap
    require(fs.rename(termsPath, oldPath),
      s"could not move $termsPath aside for the sidecar swap")
    require(fs.rename(nextPath, termsPath),
      s"could not rename $nextPath into place")
    fs.delete(oldPath, true)
    val termRows = spark.read.parquet(s"$path/terms").count()
    val tombRows = spark.read.parquet(s"$path/tombstones").count()
    val props = new java.util.Properties()
    props.setProperty("version", ManifestVersion)
    props.setProperty("source", newSource)
    props.setProperty("appliedSources",
      (ledger + newSource).toSeq.sorted.mkString(SourceSep))
    props.setProperty("idCol", idCol)
    props.setProperty("nDocs",
      (prior.getProperty("nDocs").toLong - dDocs).toString)
    props.setProperty("nDl",
      (prior.getProperty("nDl").toLong - dNl).toString)
    props.setProperty("sumDl",
      (prior.getProperty("sumDl").toLong - dSumDl).toString)
    props.setProperty("nBuckets", nBuckets.toString)
    props.setProperty("postRows", prior.getProperty("postRows"))
    props.setProperty("termRows", termRows.toString)
    props.setProperty("tombRows", tombRows.toString)
    val out = fs.create(mPath, true)
    try props.store(out, "graft inverted-index manifest")
    finally out.close()
    true
  }

  /** OPTIMIZE: rewrite the fragmented postings table of a written index
    * into one file per bucket — the [[ZOrderLayout.compact]] step for
    * this family — AND physically drop any posting rows tombstoned by
    * [[excise]] (the rewrite is happening anyway; folding the deletes in
    * means excision never pays a corpus-sized pass of its own). Every
    * [[appendTo]] batch appends one parquet file per touched bucket, so
    * after many daily batches a query bucket's scan opens one small file
    * per append; compaction repartitions the SURVIVING postings by
    * bucket into a STAGED directory (exactly one task — one file — per
    * bucket) and swaps it in by rename.
    *
    * Only the postings fragment: [[appendTo]]/[[excise]] rebuild the
    * terms sidecar wholesale each merge, so it is always one write's
    * worth of files.
    *
    * Crash safety (the appendTo discipline, inverted): with NO pending
    * tombstones the committed manifest needs no change — row counts,
    * scalars, and ledger are all layout-invariant — so there is no
    * commit step to order. With pending tombstones the manifest's
    * postRows/tombRows change and commit LAST; a crash after the swap
    * but before the commit (or before the tombstone-list clear) leaves
    * counts off the manifest, which every later recount ([[loadIfValid]],
    * the [[appendTo]]/[[excise]] pre-checks, this method's own
    * pre-check) refuses as torn instead of serving half an index. Either
    * way the staged table is RECOUNTED against its expected row count
    * before the swap, and a crash between the two renames leaves no
    * postings directory — refused everywhere. Writer contract as for
    * append: one maintainer at a time, no live readers across the swap. */
  def compact(spark: SparkSession, path: String): Unit =
      WriterLease.withLease(spark, path) {
    val mPath = manifestPath(path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val prior = new java.util.Properties()
    val in = fs.open(mPath)
    try prior.load(in) finally in.close()
    require(Option(prior.getProperty("version")).contains(ManifestVersion),
      s"inverted index at $path has manifest version " +
        s"${prior.getProperty("version")}; this compactor understands " +
        s"only $ManifestVersion — rebuild instead of compacting")
    val postRows = prior.getProperty("postRows").toLong
    val tombRows = Option(prior.getProperty("tombRows")).map(_.toLong).getOrElse(0L)
    require(spark.read.parquet(s"$path/postings").count() == postRows &&
      tombstoneCount(spark, path) == tombRows,
      s"inverted index at $path does not match its committed manifest — " +
        "a previous append, excise, or compact crashed mid-write; rebuild " +
        "instead of compacting")
    val live = spark.read.parquet(s"$path/postings")
    val idCol = prior.getProperty("idCol")
    // surviving rows + their expected count: with tombstones pending the
    // drop count is measured on the LIVE table first, so the staged
    // recount still proves the staging write lost nothing
    val (survivors, expectRows) =
      if (tombRows == 0) (live, postRows)
      else {
        val tomb = spark.read.parquet(s"$path/tombstones")
        val dropped = live.join(tomb, Seq(idCol), "left_semi").count()
        (live.join(tomb, Seq(idCol), "left_anti"), postRows - dropped)
      }
    val staging = s"$path/postings-next"
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    fs.delete(stagingPath, true) // leftover from a crashed prior compact
    // one shuffle task per bucket value -> exactly one file per bucket
    survivors
      .repartition(col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(staging)
    require(spark.read.parquet(staging).count() == expectRows,
      s"staged compaction at $staging lost rows — refusing the swap")
    val livePath = new org.apache.hadoop.fs.Path(s"$path/postings")
    val oldPath = new org.apache.hadoop.fs.Path(s"$path/postings-old")
    fs.delete(oldPath, true)
    require(fs.rename(livePath, oldPath),
      s"could not move $livePath aside for the compaction swap")
    require(fs.rename(stagingPath, livePath),
      s"could not rename $stagingPath into place")
    fs.delete(oldPath, true)
    if (tombRows > 0) {
      // the tombstoned rows are physically gone: clear the list, commit
      // the new physical count LAST (scalars/ledger are excise-time facts
      // and unchanged here)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones"), true)
      prior.setProperty("postRows", expectRows.toString)
      prior.setProperty("tombRows", "0")
      val out = fs.create(mPath, true)
      try prior.store(out, "graft inverted-index manifest")
      finally out.close()
    }
  }

  /** Data-file count of a written index's postings table — the
    * observable [[compact]] shrinks (one file per appended batch per
    * bucket before, one per bucket after). */
  def postingsFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$path/postings")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
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
          field("termRows").exists(_.toLong == idx.terms.count()) &&
          field("tombRows").map(_.toLong).getOrElse(0L) ==
            tombstoneCount(spark, path)
      if (valid) Some(idx) else None
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Reopen a written index: lazy partitioned scans + manifest scalars
    * (+ the pending-tombstone list when excisions await compaction). */
  def load(spark: SparkSession, path: String): InvertedIndex = {
    val props = new java.util.Properties()
    val mPath = manifestPath(path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(mPath)
    try props.load(in) finally in.close()
    val tombRows = Option(props.getProperty("tombRows")).map(_.toLong).getOrElse(0L)
    new InvertedIndex(spark,
      spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/terms"),
      props.getProperty("idCol"),
      props.getProperty("nDocs").toLong,
      props.getProperty("nDl").toLong,
      props.getProperty("sumDl").toLong,
      props.getProperty("nBuckets").toInt,
      if (tombRows > 0) Some(spark.read.parquet(s"$path/tombstones"))
      else None)
  }
}
