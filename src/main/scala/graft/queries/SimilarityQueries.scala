package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the embedding column (`array<float>`):
  *
  *  - brute-force cosine top-k: broadcast the (small) query set against the
  *    full corpus — one scan, no shuffle of the corpus, exact results. This
  *    is the correctness baseline and is the right plan whenever
  *    |queries| << |corpus| (the corpus side streams through codegen'd
  *    higher-order functions; 100 TB of vectors never leaves its partitions).
  *  - LSH-bucketed top-k (BucketedRandomProjectionLSH): sub-linear candidate
  *    generation for query sets too large to broadcast-scan.
  *  - IVF-style top-k: KMeans coarse quantizer; multi-probe (the nprobe
  *    centroid-closest cells per query — recall@5 >= 0.9 on the fixture,
  *    asserted by RecallSpec).
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB-compatible rounding (shadows functions.round): round the scaled
    * double half-away-from-zero, i.e. round(x*10^n)/10^n — the same
    * computation DuckDB's round() performs, so values landing exactly on a
    * scaled .5 boundary agree between engines. */
  private def round(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    org.apache.spark.sql.functions.round(c * p, 0) / p
  }

  import graft.functions.functions.{vec_dot, vec_l2norm}

  /** Embeddings (raw float arrays) + precomputed L2 norm via the native
    * codegen'd kernel. */
  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", vec_l2norm(col("v")))

  private val dot = vec_dot(col("qv"), col("cv"))

  /** One IVF index per (session, dir): the build step (sample collect +
    * persisted assignment scan) runs once and both ivf queries — and any
    * repeated bench pass — reuse the inverted file, matching the explicit
    * BUILD/QUERY lifecycle the operator documents. Assumes the driver
    * contract that a `dir`'s parquet is immutable. Released by
    * [[clearCaches]]. */
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.operators.IvfIndex]

  private[graft] def ivfIndex(spark: SparkSession, dir: String): graft.operators.IvfIndex =
    QueryArtifacts.runOnce(ivfCache, (spark, dir))(graft.operators.IvfIndex.build(
        Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", nCells = 8))

  /** Durable twin of [[ivfIndex]]: a cell-partitioned parquet table under
    * target/ reopened through [[graft.operators.IvfIndex.loadIfValid]] —
    * the cluster-scale lifecycle (build -> write -> load ->
    * statically-pruned probe) on the driver surface, not just in
    * IvfPersistSpec. Build-once / serve-many-sessions: when a manifest
    * written by an EARLIER session matches this dir's source fingerprint
    * (file names + lengths + mtimes of the embeddings table — if the data
    * was regenerated, the tag changes and the index rebuilds), the load
    * pays only metadata validation, zero build jobs (IvfPersistSpec
    * asserts this). The loaded index holds no persist; its residency is
    * the partitioned table. */
  private val ivfFileCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.operators.IvfIndex]

  /** Identity of the indexed data: dir plus a metadata fingerprint of its
    * embeddings files. Listing only — never reads data bytes. */
  private def ivfSourceTag(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val statuses =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).sortBy(_.getPath.toString)
      else Array(fs.getFileStatus(p))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    statuses.foreach { s =>
      md.update(s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime};"
        .getBytes("UTF-8"))
    }
    dir + "#" + md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Durable IVF location for a dir — (path, expected source tag), the
    * reopen coordinates [[RagQueries]]' fresh-load fence shares with
    * [[ivfPersisted]] and the cold-serve hooks. */
  private[queries] def ivfLocation(spark: SparkSession,
      dir: String): (String, String) =
    (QueryArtifacts.path("target/ivf-file-index", dir), ivfSourceTag(spark, dir))

  private[queries] def ivfPersisted(spark: SparkSession, dir: String): graft.operators.IvfIndex =
    // the synchronized block (not TrieMap.getOrElseUpdate, whose thunk may
    // run twice under contention) keeps two concurrent first calls from
    // racing overwrite-mode writes to the same path
    QueryArtifacts.runOnce(ivfFileCache, (spark, dir))({
      // path keyed by a digest of the RAW dir string besides the readable
      // sanitization: distinct dirs (/a/b vs /a_b) can never collide
      val path = QueryArtifacts.path("target/ivf-file-index", dir)
      val tag = ivfSourceTag(spark, dir)
      graft.operators.IvfIndex.loadIfValid(spark, path, tag).getOrElse {
        ivfIndex(spark, dir).write(path, tag)
        graft.operators.IvfIndex.load(spark, path)
      }
    })

  /** Cold-reopen hooks for the serve-everything capstone (see
    * [[ServeAllQueries]]): (artifact, ensure-the-durable-form-exists,
    * FRESH manifest reopen bypassing every session cache + one bounded
    * serve returning the served row count). The reopen lambdas call
    * `loadIfValid` directly so a build can only happen in the ensure
    * phase — the capstone pins the reopen phase train/build-free via the
    * operator counters. */
  private[queries] def coldServeHooks(spark: SparkSession, dir: String)
      : Seq[(String, () => Unit, () => Option[Long])] = {
    def q5 = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val ivfPath = QueryArtifacts.path("target/ivf-file-index", dir)
    val pqPath = QueryArtifacts.path("target/pq-file-index", dir)
    def tag = ivfSourceTag(spark, dir)
    Seq(
      ("ivf",
        () => { ivfPersisted(spark, dir); () },
        () => graft.operators.IvfIndex.loadIfValid(spark, ivfPath, tag)
          .map(_.topK(q5, k = 5, nprobe = 6).count())),
      ("pq",
        () => { pqPersisted(spark, dir); () },
        () => graft.operators.PqIndex.loadIfValid(spark, pqPath, tag)
          .map(_.topK(q5, k = 5, nCandidates = 64).count())),
      ("ivfpq",
        () => { ivfPersisted(spark, dir); pqPersisted(spark, dir); () },
        () => for {
          i <- graft.operators.IvfIndex.loadIfValid(spark, ivfPath, tag)
          p <- graft.operators.PqIndex.loadIfValid(spark, pqPath, tag)
        } yield new graft.operators.IvfPq(i, p)
          .topK(q5, k = 5, nprobe = 6, nCandidates = 64).count()),
      ("ivf_appended",
        () => { driftIndexPath(spark, dir); () },
        () => graft.operators.IvfIndex.loadIfValid(spark,
            QueryArtifacts.path("target/ivf-drift-index", dir),
            tag + "#drift-append")
          .map(_.topK(q5, k = 5, nprobe = 6).count())),
      ("ivf_excised",
        () => { excisedServeIndex(spark, dir); () },
        () => graft.operators.IvfIndex.loadIfValid(spark,
            QueryArtifacts.path("target/ivf-excised-index", dir),
            tag + "#excise-batch")
          .map(_.topK(q5, k = 5, nprobe = 6).count())),
      ("ivf_refitted",
        () => { refittedIndex(spark, dir); () },
        () => graft.operators.IvfIndex.loadIfValid(spark,
            QueryArtifacts.path("target/ivf-refit-index", dir),
            tag + "#refit-done")
          .map(_.topK(q5, k = 5, nprobe = 6).count())),
      ("pq_excised",
        () => { pqExcisedServeIndex(spark, dir); () },
        () => graft.operators.PqIndex.loadIfValid(spark,
            QueryArtifacts.path("target/pq-excised-index", dir),
            tag + "#excise-batch")
          .map(_.topK(q5, k = 5, nCandidates = 64).count())),
      ("pq_refitted",
        () => { pqRefittedIndex(spark, dir); () },
        () => graft.operators.PqIndex.loadIfValid(spark,
            QueryArtifacts.path("target/pq-refit-index", dir),
            tag + "#pq-refit-done")
          .map(_.topK(q5, k = 5, nCandidates = 64).count())))
  }

  /** One PQ index per (session, dir) — build/encode once, every query and
    * bench pass reuses the persisted code table (see operators.PqIndex). */
  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.operators.PqIndex]

  private def pqIndex(spark: SparkSession, dir: String): graft.operators.PqIndex =
    QueryArtifacts.runOnce(pqCache, (spark, dir))(graft.operators.PqIndex.build(
        Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
        m = 8, ksub = 256))

  /** Durable twin of [[pqIndex]]: codes + codebook + manifest under
    * target/, manifest-validated on reopen so a second session loads with
    * ZERO build/encode jobs (same build-once lifecycle as
    * [[ivfPersisted]]; PqPersistSpec asserts the skip). */
  private val pqFileCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.operators.PqIndex]

  private def pqPersisted(spark: SparkSession, dir: String): graft.operators.PqIndex =
    QueryArtifacts.runOnce(pqFileCache, (spark, dir))({
      val path = QueryArtifacts.path("target/pq-file-index", dir)
      val tag = ivfSourceTag(spark, dir)
      graft.operators.PqIndex.loadIfValid(spark, path, tag).getOrElse {
        pqIndex(spark, dir).write(path, tag)
        graft.operators.PqIndex.load(spark, path)
      }
    })

  /** One drift-PLANTED durable IVF index per (session, dir): the coarse
    * quantizer is built (and its cell-balance snapshot committed) over the
    * odd-vec_id half only, then the even half is appended under the frozen
    * centroids — a doubling of the table after the quantizer froze, the
    * index-maintenance situation [[graft.operators.IvfIndex.staleness]]
    * exists to flag. Build-once like [[ivfPersisted]]: a manifest whose
    * source tag matches the appended state reopens with zero build jobs. */
  private val driftCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def driftIndexPath(spark: SparkSession, dir: String): String =
    QueryArtifacts.runOnce(driftCache, (spark, dir))({
      val path = QueryArtifacts.path("target/ivf-drift-index", dir)
      val baseTag = ivfSourceTag(spark, dir) + "#drift-base"
      val appendTag = ivfSourceTag(spark, dir) + "#drift-append"
      // a completed build+append leaves source == appendTag in the
      // manifest; anything else (absent, torn, stale fixture) rebuilds
      if (graft.operators.IvfIndex.loadIfValid(spark, path, appendTag).isEmpty) {
        val emb = Tables.load(spark, dir, "embeddings")
        val idx = graft.operators.IvfIndex.build(
          emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", nCells = 8)
        try idx.write(path, baseTag) finally idx.close()
        graft.operators.IvfIndex.appendTo(spark, path,
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", appendTag)
        // OPTIMIZE after the append (r16): the served index is the
        // compacted one-file-per-cell layout, so ann_ivf_appended's
        // parity gate and the capstone's ivf_appended reopen exercise
        // compaction on the driver path, not just in IvfPersistSpec
        graft.operators.IvfIndex.compact(spark, path)
      }
      path
    })

  /** PQ twin of [[driftIndexPath]]: codebook frozen on the odd half, even
    * half encoded + appended under it. */
  private val pqDriftCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def pqDriftIndexPath(spark: SparkSession, dir: String): String =
    QueryArtifacts.runOnce(pqDriftCache, (spark, dir))({
      val path = QueryArtifacts.path("target/pq-drift-index", dir)
      val baseTag = ivfSourceTag(spark, dir) + "#drift-base"
      val appendTag = ivfSourceTag(spark, dir) + "#drift-append"
      if (graft.operators.PqIndex.loadIfValid(spark, path, appendTag).isEmpty) {
        val emb = Tables.load(spark, dir, "embeddings")
        // ksub = 16, not the serving index's 256: the half-corpus training
        // slice can be smaller than 256 points at small sf, and the
        // report's driver-checked fields are size-independent
        val idx = graft.operators.PqIndex.build(
          emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
          m = 8, ksub = 16)
        try idx.write(path, baseTag) finally idx.close()
        graft.operators.PqIndex.appendTo(spark, path,
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", appendTag)
        // OPTIMIZE after the append (r16, the driftIndexPath discipline)
        graft.operators.PqIndex.compact(spark, path)
      }
      path
    })

  /** Serving handle on [[driftIndexPath]]'s appended index (build at
    * %2==1, append %2==0 — the full incremental lifecycle), with the
    * REPLAYED-LEDGER no-op pinned: before first serve, the even batch's
    * appendTo is re-issued under its original tag and must REFUSE
    * (return false) — the crashed-job-retry protection a daily-append
    * corpus actually leans on. One load per (session, dir); the serve
    * plan is the usual statically-pruned partitioned scan. */
  private val appendServeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.operators.IvfIndex]

  private def appendedServeIndex(spark: SparkSession,
      dir: String): graft.operators.IvfIndex =
    QueryArtifacts.runOnce(appendServeCache, (spark, dir))({
      val path = driftIndexPath(spark, dir)
      val appendTag = ivfSourceTag(spark, dir) + "#drift-append"
      val emb = Tables.load(spark, dir, "embeddings")
      val replayed = graft.operators.IvfIndex.appendTo(spark, path,
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", appendTag)
      require(!replayed,
        "replaying an already-applied append batch must be a ledger no-op")
      graft.operators.IvfIndex.load(spark, path)
    })

  /** Streaming ingest → durable index FOLD replay body (r17; see
    * [[graft.streaming.StreamingOps.foldIntoIvf]]): a real Structured
    * Streaming run over three staged deliveries of the vec_id%5==0
    * slice — the second delivery padded with ALREADY-SERVED vectors the
    * admission anti-join must drop, the third a VERBATIM re-delivery of
    * the first that admission's index-side check (r18) empties before
    * the content-tag ledger would have swallowed it — each admitted
    * micro-batch folded into a session-salted copy of the base index
    * (built over the %5!=0 rest) via `foreachBatch` +
    * `Trigger.AvailableNow`. Returns the index path; the driver row
    * parity-checks the folded index against assign-everything under the
    * frozen centroids. Paths live under the session root (the runReplay
    * discipline): delete-and-rewrite artifacts are session-scoped, only
    * validated-and-reused ones live under stable paths. */
  private def buildIvfFoldReplay(spark: SparkSession, dir: String): String = {
    val emb = Tables.load(spark, dir, "embeddings")
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val slice = emb.filter(col("vec_id") % 5 === 0)
      .select("vec_id", "embedding")
    // re-crawled rows: already served by the base index, delivered again
    // inside a later batch — admission must drop them or the fold
    // duplicates serving rows (which the parity row would catch)
    val recrawled = emb.filter(col("vec_id") % 5 === 1 && col("vec_id") < 50)
      .select("vec_id", "embedding")
    val root = QueryArtifacts.sessionRoot(spark)
    val src = QueryArtifacts.path(s"$root/ivf-fold-src", dir)
    val ckpt = QueryArtifacts.path(s"$root/ivf-fold-ckpt", dir)
    val path = QueryArtifacts.path(s"$root/ivf-fold-index", dir)
    Seq(src, ckpt, path).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val idx = graft.operators.IvfIndex.build(
      base, "vec_id", "embedding", nCells = 8)
    try idx.write(path, ivfSourceTag(spark, dir) + "#fold-base")
    finally idx.close()
    val servedIds = base.select("vec_id")
    val half1 = slice.filter(col("vec_id") % 2 === 0)
    val half2 = slice.filter(col("vec_id") % 2 =!= 0).unionByName(recrawled)
    graft.streaming.StreamingOps.stageOrdered(src,
      Seq(half1, half2, half1 /* re-delivery */))
    val stream = spark.readStream.schema(slice.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.StreamingOps.foldIntoIvf(spark, path, servedIds,
          batch, "vec_id", "embedding")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    path
  }

  ReplayOrchestrator.register("ivf-fold")(buildIvfFoldReplay)

  /** Drift-REMEDIATED durable IVF index (r17) — the actuation half of
    * the drift story ([[driftIndexPath]] measures; this one acts): the
    * same half/half drift state (quantizer frozen on the odd vec_ids,
    * even half appended — fracAppended >= 0.5, provably stale) is CLONED
    * from [[driftIndexPath]]'s completed artifact (byte-identical by
    * construction; re-deriving it re-paid the quantizer fit and both
    * assignment scans every ensure phase),
    * then [[graft.operators.IvfIndex.refitIfStale]] runs the
    * measure → decide → retrain-and-swap loop: the staleness check must
    * FIRE (a refit runs, quantizer refitted over base+appended, ledger
    * carried), and the immediately repeated call on the refreshed index
    * must be a ZERO-BUILD no-op (the no-drift branch, fenced by the
    * build counter). Build-once via the manifest+ledger: a manifest
    * whose source is the refit tag proves the whole chain completed. */
  private val refitCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.operators.IvfIndex]

  private def refittedIndex(spark: SparkSession,
      dir: String): graft.operators.IvfIndex =
    QueryArtifacts.runOnce(refitCache, (spark, dir))({
      val path = QueryArtifacts.path("target/ivf-refit-index", dir)
      val refitTag = ivfSourceTag(spark, dir) + "#refit-done"
      if (graft.operators.IvfIndex.loadIfValid(spark, path, refitTag).isEmpty) {
        // the stale starting state (quantizer frozen on the odd half,
        // even half appended) is byte-identical to the drift chain's
        // completed build+append+compact artifact — CLONE it instead of
        // re-running the quantizer fit and both assignment scans (r18,
        // ensure-phase dedup); a production refit acts on an EXISTING
        // index, so starting from the sibling's files is the honest
        // shape, and staleness (ledger + build-time balance snapshot)
        // travels with the manifest
        QueryArtifacts.cloneArtifact(driftIndexPath(spark, dir), path)
        // MEASURE + DECIDE + ACT: the planted drift must trip the bound
        // and trigger exactly one refit
        require(graft.operators.IvfIndex.refitIfStale(spark, path,
          nCells = 8, refitTag),
          "the planted half/half drift must trigger a quantizer refit")
        // the refreshed quantizer is healthy: the same decision rule is
        // now a zero-build no-op (counter-fenced)
        val builds = graft.operators.IvfIndex.buildsRun.get()
        require(!graft.operators.IvfIndex.refitIfStale(spark, path,
          nCells = 8, refitTag + "#again"),
          "a just-refitted index must not be stale")
        require(graft.operators.IvfIndex.buildsRun.get() == builds,
          "the no-drift branch must run zero build jobs")
      }
      graft.operators.IvfIndex.load(spark, path)
    })

  /** Drift-REMEDIATED durable PQ index (r18) — [[refittedIndex]]'s
    * codebook twin, completing measure → decide → act for the code
    * table: the stale starting state is CLONED from [[pqDriftIndexPath]]
    * (codebook frozen on the odd half at the bootstrap ksub=16, even
    * half encoded+appended under it — fracAppended >= 0.5, provably
    * stale), then [[graft.operators.PqIndex.refitIfStale]] must FIRE
    * exactly once — retraining to the full serving operating point
    * (m=8, ksub=256: same params, corpus, and seed as the in-session
    * [[pqIndex]], so the refreshed codebook is the proven one) — and the
    * immediately repeated call must be a ZERO-build no-op (counter
    * fence). Build-once via the manifest+ledger. */
  private val pqRefitCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.operators.PqIndex]

  private def pqRefittedIndex(spark: SparkSession,
      dir: String): graft.operators.PqIndex =
    QueryArtifacts.runOnce(pqRefitCache, (spark, dir))({
      val path = QueryArtifacts.path("target/pq-refit-index", dir)
      val refitTag = ivfSourceTag(spark, dir) + "#pq-refit-done"
      if (graft.operators.PqIndex.loadIfValid(spark, path, refitTag).isEmpty) {
        QueryArtifacts.cloneArtifact(pqDriftIndexPath(spark, dir), path)
        require(graft.operators.PqIndex.refitIfStale(spark, path,
          m = 8, ksub = 256, refitTag),
          "the planted half/half drift must trigger a codebook refit")
        val builds = graft.operators.PqIndex.buildCount
        require(!graft.operators.PqIndex.refitIfStale(spark, path,
          m = 8, ksub = 256, refitTag + "#again"),
          "a just-refitted codebook must not be stale")
        require(graft.operators.PqIndex.buildCount == builds,
          "the no-drift branch must run zero build jobs")
      }
      graft.operators.PqIndex.load(spark, path)
    })

  // Pseudo-replay WARM-UP: build + append + retrain is the family's
  // heaviest cold chain — overlap it with the replay fan-out (the PQ
  // refit chain piggybacks: its clone source is pqDriftIndexPath).
  ReplayOrchestrator.register("warm-ivf-refit") { (spark, dir) =>
    refittedIndex(spark, dir)
    pqRefittedIndex(spark, dir)
    java.lang.Boolean.TRUE
  }

  /** Serving handle on [[pqDriftIndexPath]]'s appended PQ index — the
    * [[appendedServeIndex]] pattern for the code table. The
    * build/append/compact chain itself lives in (and is forced by the
    * call to) [[pqDriftIndexPath]]; this function only PINS the
    * replayed-ledger no-op before first serve — re-issuing the even
    * batch's append under its original tag must REFUSE — and loads the
    * completed artifact. One load per (session, dir); serving is the
    * usual code-column ADC scan. */
  private val pqAppendServeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.operators.PqIndex]

  private def pqAppendedServeIndex(spark: SparkSession,
      dir: String): graft.operators.PqIndex =
    QueryArtifacts.runOnce(pqAppendServeCache, (spark, dir))({
      val path = pqDriftIndexPath(spark, dir)
      val appendTag = ivfSourceTag(spark, dir) + "#drift-append"
      val emb = Tables.load(spark, dir, "embeddings")
      val replayed = graft.operators.PqIndex.appendTo(spark, path,
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", appendTag)
      require(!replayed,
        "replaying an already-applied append batch must be a ledger no-op")
      graft.operators.PqIndex.load(spark, path)
    })

  /** Excision-PLANTED durable IVF index (r17) — the DELETE chapter:
    * built over the full corpus, the vec_id%7==0 slice then excised as a
    * takedown batch ([[graft.operators.IvfIndex.excise]] — tombstone
    * list + ledger; the replayed-excise no-op pinned). Deliberately NOT
    * compacted: the served artifact keeps its pending tombstones, so the
    * driver row gates the tombstone-anti-join serving path and the
    * manifest's tombRows validation — the state a 100 TB index is in
    * between a takedown and its next scheduled OPTIMIZE. The physical
    * drop at compact is pinned in IvfPersistSpec. Build-once via the
    * manifest+ledger (the [[driftIndexPath]] discipline). */
  private val ivfExciseCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.operators.IvfIndex]

  private def excisedServeIndex(spark: SparkSession,
      dir: String): graft.operators.IvfIndex =
    QueryArtifacts.runOnce(ivfExciseCache, (spark, dir))({
      val path = QueryArtifacts.path("target/ivf-excised-index", dir)
      val exciseTag = ivfSourceTag(spark, dir) + "#excise-batch"
      if (graft.operators.IvfIndex.loadIfValid(spark, path, exciseTag).isEmpty) {
        val emb = Tables.load(spark, dir, "embeddings")
        val takedown = emb.filter(col("vec_id") % 7 === 0).select("vec_id")
        // the pre-takedown state IS the persisted full-corpus index
        // (same build params) — clone its completed artifact instead of
        // re-running the quantizer fit + assignment scan (r18,
        // ensure-phase dedup); a takedown acts on the live serving
        // index, so starting from its files is the production shape
        ivfPersisted(spark, dir)
        QueryArtifacts.cloneArtifact(
          QueryArtifacts.path("target/ivf-file-index", dir), path)
        graft.operators.IvfIndex.excise(spark, path, takedown, "vec_id",
          exciseTag)
        val replayed = graft.operators.IvfIndex.excise(spark, path,
          takedown, "vec_id", exciseTag)
        require(!replayed,
          "replaying an already-applied excise batch must be a ledger no-op")
      }
      graft.operators.IvfIndex.load(spark, path)
    })

  /** PQ twin of [[excisedServeIndex]]: codes built over the full corpus,
    * the vec_id%7==0 slice tombstoned (NOT compacted — the served
    * artifact keeps its pending tombstones, gating the anti-join ADC
    * path and the tombRows manifest validation); physical drop at
    * compact is pinned in PqPersistSpec. */
  private val pqExciseCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.operators.PqIndex]

  private def pqExcisedServeIndex(spark: SparkSession,
      dir: String): graft.operators.PqIndex =
    QueryArtifacts.runOnce(pqExciseCache, (spark, dir))({
      val path = QueryArtifacts.path("target/pq-excised-index", dir)
      val baseTag = ivfSourceTag(spark, dir) + "#excise-base"
      val exciseTag = ivfSourceTag(spark, dir) + "#excise-batch"
      if (graft.operators.PqIndex.loadIfValid(spark, path, exciseTag).isEmpty) {
        val emb = Tables.load(spark, dir, "embeddings")
        val takedown = emb.filter(col("vec_id") % 7 === 0).select("vec_id")
        val idx = graft.operators.PqIndex.build(
          emb, "vec_id", "embedding", m = 8, ksub = 16)
        try idx.write(path, baseTag) finally idx.close()
        graft.operators.PqIndex.excise(spark, path, takedown, "vec_id",
          exciseTag)
        val replayed = graft.operators.PqIndex.excise(spark, path,
          takedown, "vec_id", exciseTag)
        require(!replayed,
          "replaying an already-applied excise batch must be a ledger no-op")
      }
      graft.operators.PqIndex.load(spark, path)
    })

  // Pseudo-replay WARM-UP: the build+excise chains are multi-write cold
  // builds like the drift chain — overlap them with the replay fan-out.
  ReplayOrchestrator.register("warm-ivf-excise") { (spark, dir) =>
    excisedServeIndex(spark, dir)
    pqExcisedServeIndex(spark, dir)
    java.lang.Boolean.TRUE
  }

  /** Writer-fencing lifecycle verdicts (r18): the maintenance-op
    * concurrency contract driven at the driver surface, not just in
    * WriterLeaseSpec — a dedicated tiny durable IVF index (session-rooted
    * delete-and-rewrite, the runReplay discipline; it must never share a
    * lease slot with the served artifacts) exercises the three lease
    * states a production maintainer meets:
    *
    *  1. LIVE FOREIGN LEASE — another maintainer holds the slot,
    *     unexpired: appendTo must refuse FAST naming the holder, and the
    *     refusal must leave the artifact byte-untouched (manifest still
    *     validates at the pre-append tag);
    *  2. INITIALIZING LEASE — a holder caught between create and
    *     props.store (owner/expiry not yet readable): HELD, refused
    *     after bounded retries, the half-written lease NOT usurped (the
    *     two-live-holders bug the r18 acquire fix closed);
    *  3. EXPIRED LEASE — a crashed maintainer's leftover: taken over,
    *     the append applies, and completion releases the slot.
    *
    * All verdicts are deterministic booleans (lifecycle literals, the
    * classifier_persisted pattern) — hash-green at every SF. Computed
    * once per (session, dir); the work is one tiny build + one tiny
    * append on <=200 vectors. */
  private val fenceCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(String, Boolean)]]

  private def fencingVerdicts(spark: SparkSession,
      dir: String): Seq[(String, Boolean)] =
    QueryArtifacts.runOnce(fenceCache, (spark, dir))({
      val emb = Tables.load(spark, dir, "embeddings")
        .filter(col("vec_id") < 200)
      val path = QueryArtifacts.path(
        QueryArtifacts.sessionRoot(spark) + "/ivf-fence-index", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      val leasePath = new org.apache.hadoop.fs.Path(s"$path._LEASE.properties")
      val fs = leasePath.getFileSystem(spark.sessionState.newHadoopConf())
      def plant(owner: Option[String], expiresAtMs: Option[Long]): Unit = {
        val props = new java.util.Properties()
        owner.foreach(props.setProperty("owner", _))
        expiresAtMs.foreach(e => props.setProperty("expiresAtMs", e.toString))
        val out = fs.create(leasePath, true)
        try props.store(out, "planted by index_writer_fencing")
        finally out.close()
      }
      val idx = graft.operators.IvfIndex.build(
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", nCells = 2)
      try idx.write(path, "fence-base") finally idx.close()
      val batch = emb.filter(col("vec_id") % 2 === 0)
      // 1. live foreign lease: refuse naming the holder, artifact untouched
      plant(Some("maintainer-2@otherhost"),
        Some(System.currentTimeMillis() + 10L * 60 * 1000))
      val refusal = try {
        graft.operators.IvfIndex.appendTo(spark, path, batch,
          "vec_id", "embedding", "fence-day-1")
        None
      } catch { case e: IllegalStateException => Some(e.getMessage) }
      val refusedNamingHolder =
        refusal.exists(_.contains("maintainer-2@otherhost"))
      val untouchedAfterRefusal = graft.operators.IvfIndex
        .loadIfValid(spark, path, "fence-base").isDefined
      // 2. initializing lease (no readable owner/expiry yet): HELD —
      // refused after bounded retries and NOT usurped
      plant(None, None)
      val initRefused = try {
        graft.operators.IvfIndex.appendTo(spark, path, batch,
          "vec_id", "embedding", "fence-day-1")
        false
      } catch { case _: IllegalStateException => true }
      val initLeaseSurvived = fs.exists(leasePath)
      // 3. expired lease: crashed maintainer — taken over, append applies,
      // completion releases the slot
      plant(Some("maintainer-2@otherhost"),
        Some(System.currentTimeMillis() - 1000))
      val tookOver = graft.operators.IvfIndex.appendTo(spark, path, batch,
        "vec_id", "embedding", "fence-day-1")
      val releasedAfter = !fs.exists(leasePath)
      val appendedServes = graft.operators.IvfIndex
        .loadIfValid(spark, path, "fence-day-1").isDefined
      Seq(
        ("expired_lease_taken_over", tookOver && appendedServes),
        ("initializing_lease_held_not_usurped",
          initRefused && initLeaseSurvived),
        ("live_lease_refuses_naming_holder", refusedNamingHolder),
        ("refusal_leaves_artifact_untouched", untouchedAfterRefusal),
        ("takeover_releases_lease", releasedAfter))
    })

  /** Topic-cluster assignment under a FROZEN SEEDED quantizer (r12):
    * the K centroids are the K corpus vectors with the smallest
    * (md5(vec_id), vec_id) — a deterministic seeded selection, so unlike
    * the k-means-fitted IVF quantizer the whole assignment is
    * reproducible by the DuckDB oracle (centroids are corpus ROWS, not
    * fit artifacts). Assignment reuses the IVF spherical-distance
    * expression verbatim ([[graft.operators.IvfIndex.assignWithCentroids]]
    * — same geometry, same (distance, cell) tie-break). One bounded
    * K-row collect for the seeds; the assignment itself is a single lazy
    * scan through literal centroid dot products. Cached per (session,
    * dir): the report and the cluster-balanced sampler share it. */
  private val topicCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private val TopicK = 8

  /** The frozen seeded topic quantizer's centroids — md5-ordered first-K
    * corpus vectors, shared by the batch assignment scan ([[topicCells]])
    * and the streaming drift monitor (which must assign arrivals under
    * the IDENTICAL literals to land in the identical cells). Bounded:
    * K rows collected. */
  private val topicCentroidCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(Int, Array[Float])]]

  private def topicCentroids(spark: SparkSession,
      dir: String): Seq[(Int, Array[Float])] =
    QueryArtifacts.runOnce(topicCentroidCache, (spark, dir))({
      Tables.load(spark, dir, "embeddings")
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .select("embedding").limit(TopicK).collect()
        .zipWithIndex.map { case (r, i) =>
          (i, r.getSeq[Float](0).toArray)
        }.toSeq
    })

  private def topicCells(spark: SparkSession, dir: String): DataFrame =
    QueryArtifacts.runOnce(topicCache, (spark, dir))({
      val emb = Tables.load(spark, dir, "embeddings")
      val base = emb.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
        .withColumn("cn", vec_l2norm(col("cv")))
      graft.operators.IvfIndex.assignWithCentroids(base,
          topicCentroids(spark, dir))
        .select("cell", "cell_dist", "c_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Topic-drift streaming replay body (see [[ReplayOrchestrator]]): the
    * %5==0 "new crawl" vectors stream in three pinned-order micro-batches
    * through the embedding-space drift monitor against the reference
    * histogram frozen from the %5!=0 slice; the final emission (full
    * n_new — counts only grow) equals the batch `topic_drift_report`. */
  private def buildTopicDriftReplay(spark: SparkSession, dir: String)
      : Array[graft.streaming.StreamingOps.TopicDriftRow] = {
    import spark.implicits._
    val cents = topicCentroids(spark, dir)
    val ref = topicCells(spark, dir)
      .filter(col("c_id") % 5 =!= 0)
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val slice = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 5 === 0).select("vec_id", "embedding")
    // session-rooted delete-and-rewrite staging (see
    // QueryArtifacts.sessionTag / sessionRoot)
    val skey = dir + "#" + QueryArtifacts.sessionTag(spark)
    val src = QueryArtifacts.path(
      QueryArtifacts.sessionRoot(spark) + "/topic-drift-replay-src", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
    graft.streaming.StreamingOps.stageOrdered(src,
      (0 until 3).map(i => slice.filter(col("vec_id") % 3 === i)))
    val stream = spark.readStream.schema(slice.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val name = "topic_drift_replay_" + java.security.MessageDigest
      .getInstance("SHA-256").digest(skey.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val q = graft.streaming.StreamingOps
      .topicDriftMonitorStream(spark, stream, cents, ref)
      .writeStream.outputMode("update").format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val all = spark.table(name)
      .as[graft.streaming.StreamingOps.TopicDriftRow].collect()
    Array(all.maxBy(_.n_new))
  }

  // teardown = release the topic-assignment persist the body fills via
  // topicCells (eager fan-out can launch this from another family's
  // await — see ReplayOrchestrator ownership note)
  ReplayOrchestrator.register("topic-drift",
    () => releaseTopicCells())(buildTopicDriftReplay)

  /** Release the persisted topic-cell assignments (idempotent; the
    * replay teardown and the topic leg of [[clearCaches]]). */
  private[queries] def releaseTopicCells(): Unit = {
    topicCache.values.foreach(_.unpersist())
    topicCache.clear()
  }

  // Pseudo-replay WARM-UP: the in-session IVF (sample collect + k-means
  // multi-restart + assignment persist) and PQ (subspace codebook fits +
  // encode) builds are this family's biggest per-session cold costs, and
  // runOnce shares them across ~15 ANN rows anyway — force them under the
  // warm-up fan-out so the first ANN row reads artifacts instead of
  // paying the fits (see ReplayOrchestrator). Teardown mirrors
  // clearCaches' in-session legs (idempotent).
  ReplayOrchestrator.register("warm-ann", () => releaseSessionIndexes()) {
    (spark, dir) =>
      ivfIndex(spark, dir)
      pqIndex(spark, dir)
      // the composed serving result both IVF+PQ rows read (see ivfPqTop)
      ivfPqTop(spark, dir).count()
      java.lang.Boolean.TRUE
  }

  /** In-session IVF+PQ top-k at the family operating point (k=5,
    * nprobe=6, nCandidates=256), computed once per (session, dir) and
    * persisted (25 rows): `ann_ivfpq_topk` emits it and
    * `ann_ivfpq_persisted`'s in-memory parity side re-reads it — the two
    * rows ran the identical composed plan (probe join + ADC scan +
    * two-level cut + re-rank) twice per bench pass each. */
  private val ivfPqTopCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def ivfPqTop(spark: SparkSession, dir: String): DataFrame =
    QueryArtifacts.runOnce(ivfPqTopCache, (spark, dir))({
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      new graft.operators.IvfPq(ivfIndex(spark, dir), pqIndex(spark, dir))
        .topK(q, k = 5, nprobe = 6, nCandidates = 256)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Release the in-session index builds (idempotent; the warm-up
    * teardown and the first legs of [[clearCaches]]). */
  private[queries] def releaseSessionIndexes(): Unit = {
    ivfPqTopCache.values.foreach(_.unpersist())
    ivfPqTopCache.clear()
    ivfCache.values.foreach(_.close())
    ivfCache.clear()
    pqCache.values.foreach(_.close())
    pqCache.clear()
  }

  /** Release every cached inverted file (bench/verify teardown — a
    * long-lived session would otherwise accumulate one persisted
    * assignment set per (session, dir) key). */
  def clearCaches(): Unit = {
    ReplayOrchestrator.drainAndClear() // waits out in-flight replays,
    // runs launched teardowns (incl. other families')
    releaseSessionIndexes()
    ivfFileCache.clear() // no persist to release — file-backed
    pqFileCache.clear() // no persist to release — file-backed
    driftCache.clear() // no persist to release — file-backed
    pqDriftCache.clear() // no persist to release — file-backed
    appendServeCache.clear() // no persist to release — file-backed
    pqAppendServeCache.clear() // no persist to release — file-backed
    ivfExciseCache.clear() // no persist to release — file-backed
    pqExciseCache.clear() // no persist to release — file-backed
    refitCache.clear() // no persist to release — file-backed
    pqRefitCache.clear() // no persist to release — file-backed
    fenceCache.clear() // no persist to release — verdict literals
    releaseTopicCells()
  }

  /** Exact brute-force cosine top-5 neighbor pairs (q_id, c_id) for query
    * vectors vec_id < 5 — the baseline side of the recall-gate queries. */
  private def exactTop5(spark: SparkSession, dir: String): DataFrame = {
    val emb = withNorm(Tables.load(spark, dir, "embeddings"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = emb.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = c.crossJoin(broadcast(q)).filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(dot / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select("q_id", "c_id")
  }

  /** recall@5 of an approximate neighbor set vs a baseline (q_id, c_id)
    * top-5 set, per q_id. */
  private def recallVs(approx: DataFrame, baseline: DataFrame): DataFrame =
    baseline
      .join(approx.select("q_id", "c_id").withColumn("hit", lit(1)),
        Seq("q_id", "c_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum("hit"), lit(0L)).as("n_hit"))
      .withColumn("recall", round(col("n_hit") / col("n_exact"), 6))
      .orderBy("q_id")

  /** recall@5 of an approximate neighbor set vs the exact top-5, per q_id. */
  private def recallOf(approx: DataFrame, spark: SparkSession, dir: String): DataFrame =
    recallVs(approx, exactTop5(spark, dir))

  /** Filtered-exact baseline: brute-force cosine top-5 for queries
    * vec_id < 5 over ONLY the corpus rows with an even label — the
    * correctness side of the filtered-search queries. */
  private def exactTop5Filtered(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = withNorm(emb).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = withNorm(emb.filter(col("label") % 2 === 0))
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = c.crossJoin(broadcast(q)).filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(dot / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select("q_id", "c_id", "rank", "cosine")
  }

  /** Matryoshka-style prefix-dimension serving (the MRL pattern: nested
    * representations make the FIRST `prefixDims` coordinates a usable
    * coarse embedding): a cheap coarse cosine over the 16-dim prefix
    * ranks the corpus, the per-query top-`shortlist` survivors are
    * re-ranked by the exact full-dimension cosine. At scale the prefix is
    * its own (4x narrower) column: the coarse scan reads a quarter of the
    * vector bytes and carries only (q_id, c_id) forward — ids, never
    * vectors, move through the ranking; the re-rank joins the bounded
    * shortlist back to the corpus (AQE broadcasts it). Fully
    * deterministic — no seeds, no training — so unlike the LSH/IVF
    * families the END-TO-END result is hash-checked: the oracle replays
    * coarse ranking, shortlist cut, and re-rank bit-for-bit.
    *
    * No driver recall gate, deliberately: prefix pruning's premise is an
    * MRL-TRAINED embedding whose leading coordinates carry the signal.
    * The fixture's vectors are isotropic (no nesting structure), so full
    * recall@5 there needs a ~90% shortlist — a "gate" at that operating
    * point would certify nothing. RecallSpec instead pins recall = 1.0 at
    * shortlist 50/500 on a synthetic front-loaded fixture (the contract
    * the operator actually serves), and the parity row above keeps engine
    * drift visible independently. */
  private[graft] def matryoshkaTop5On(emb: DataFrame,
      prefixDims: Int = 16, shortlist: Int = 50): DataFrame = {
    val pref = emb.select(col("vec_id"),
        slice(col("embedding"), 1, prefixDims).as("pv"))
      .withColumn("pn", vec_l2norm(col("pv")))
    val qp = pref.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("pv").as("qpv"), col("pn").as("qpn"))
    val cp = pref.select(col("vec_id").as("c_id"), col("pv").as("cpv"),
      col("pn").as("cpn"))
    val coarse = cp.crossJoin(broadcast(qp))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("pcos",
        round(vec_dot(col("qpv"), col("cpv")) / (col("qpn") * col("cpn")), 6))
    val wc = Window.partitionBy("q_id").orderBy(desc("pcos"), col("c_id"))
    val short = coarse.withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= shortlist).select("q_id", "c_id")
    val full = withNorm(emb)
    val reranked = short
      .join(full.select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cn")), Seq("c_id"))
      .join(broadcast(full.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"))), Seq("q_id"))
      .withColumn("cosine", round(dot / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    reranked.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "c_id", "rank", "cosine")
  }

  private def matryoshkaTop5(spark: SparkSession, dir: String): DataFrame =
    matryoshkaTop5On(Tables.load(spark, dir, "embeddings"))

  /** SEMANTIC benchmark decontamination — the embedding-space member of
    * the decontamination family (n-gram membership and span excision are
    * the lexical two): a corpus vector is contaminated when its cosine
    * against ANY eval-set vector reaches `minCosine`, catching the
    * paraphrased/reworded eval leakage that token overlap misses.
    *
    * Scale contract: eval benchmarks are BOUNDED (thousands of rows)
    * however large the corpus, so the eval side broadcasts — as ONE
    * block row of (v, nrm) structs since r21 — and the corpus streams
    * through one scan with the [[graft.functions.CosineMaxBlock]] kernel
    * scoring each vector's max in place: no per-pair joined row, no
    * aggregate, NO shuffle at all. The rounded max is order-independent
    * (max commutes; rounding is monotone), keeping the row fully
    * hash-checkable. Output: (vec_id, max_eval_cosine, flagged). */
  private[graft] def semanticContaminationOn(emb: DataFrame,
      isEval: Column, minCosine: Double): DataFrame = {
    val base = emb.withColumn("__is_eval", isEval)
      .select(col("vec_id"), col("embedding").as("v"), col("__is_eval"))
      .withColumn("nrm", vec_l2norm(col("v")))
    // the whole eval side collapses to ONE block row (collect_list of
    // (v, nrm) structs): the former broadcast nested-loop cross join
    // materialized one joined row per (corpus, eval) PAIR carrying both
    // d-float vectors before the dot product ran — per-pair join
    // machinery over the arithmetic, the CosinePairsBlock finding (r20)
    // applied to the max shape. An EMPTY eval set still produces one
    // row holding an EMPTY array (ungrouped agg), so every corpus
    // vector reports a null max, unflagged — the same edge the former
    // left-join-on-true pinned (the streaming twin's left-anti against
    // an empty side keeps everything; the two verdicts must agree)
    // null embeddings must stay out of the block: the former join's
    // null cosine was skipped by max(), and the kernel (which never
    // sees a null struct field as "skip") must see the same eval set
    val evBlock = base.filter(col("__is_eval") &&
        col("v").isNotNull && col("nrm").isNotNull)
      .agg(collect_list(struct(col("v"), col("nrm"))).as("evs"))
    val co = base.filter(!col("__is_eval"))
      .select(col("vec_id"), col("v").as("cv"), col("nrm").as("cn"))
    // round6 AFTER the kernel max: rounding is monotone non-decreasing,
    // so round6(max(cos)) == max(round6(cos)) — the rounded value is the
    // same structural round6 the streaming gate applies per pair
    // (StreamingSpec pins the two >= minCosine verdicts equal), and the
    // kernel's NaN-wins max replays Spark's nan-safe max ordering
    import org.apache.spark.sql.graft.bridge
    val kernelMax = bridge.column(graft.functions.CosineMaxBlock(
      bridge.expression(col("cv")), bridge.expression(col("cn")),
      bridge.expression(col("evs"))))
    co.join(broadcast(evBlock), lit(true), "left")
      .withColumn("max_eval_cosine",
        graft.operators.TextAnalysis.round6(kernelMax))
      .select(col("vec_id"), col("max_eval_cosine"))
      .withColumn("flagged",
        coalesce(col("max_eval_cosine") >= minCosine, lit(false)))
  }

  val queries: ListMap[String, Q] = ListMap(
    // Exact brute-force cosine top-5 for query vectors vec_id < 5
    "ann_bruteforce_topk" -> ((spark, dir) => {
      val emb = withNorm(Tables.load(spark, dir, "embeddings"))
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = emb.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      val scored = c.crossJoin(broadcast(q)).filter(col("q_id") =!= col("c_id"))
        .withColumn("cosine", round(dot / (col("qn") * col("cn")), 6))
      val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "c_id", "rank", "cosine")
        .orderBy("q_id", "rank")
    }),
    // Same top-k through the custom whole-operator plan (logical node +
    // strategy + physical exec): one corpus scan, bounded per-partition
    // heaps, kilobytes shuffled instead of the scored cross join. Results
    // are identical to ann_bruteforce_topk (same oracle).
    "ann_topk_native" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      // the custom plan needs driver-side literals; cap the collect so a
      // miswired caller can't pull a corpus onto the driver (the operator
      // contract is |queries| << |corpus|)
      val maxQueries = 10000
      val rows = emb.filter(col("vec_id") < 5)
        .select("vec_id", "embedding").limit(maxQueries + 1).collect()
      require(rows.length <= maxQueries,
        s"ann_topk_native query set exceeds $maxQueries rows — broadcast-scan " +
          "contract violated; use the LSH/IVF path for large query sets")
      val queries = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1).toSeq
      graft.plans.CosineTopK.topK(spark, emb, queries, 5, "vec_id", "embedding")
        .orderBy("q_id", "rank")
    }),
    // LSH-bucketed approximate neighbors (scale path): NATIVE seeded
    // random-projection buckets over UNIT vectors (Euclidean bucket
    // geometry is monotone in cosine: ||â-b̂||^2 = 2(1-cos)); the corpus
    // shuffles by (table, bucket) key, queries multi-probe ±1, candidates
    // re-ranked by exact cosine on the raw vectors. No ml fit job, no
    // ml-vector conversion — hashing/join/scoring stay in whole-stage
    // codegen (see operators.AnnLsh). Rows-only driver check
    // (approximate); recall gated by RecallSpec AND the ann_lsh_recall
    // driver query below.
    "ann_lsh_topk" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      graft.operators.AnnLsh.topK(emb, "vec_id", "embedding",
          q, "q_id", "qv", k = 5)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("q_id", "rank")
    }),
    // Driver-visible recall gate for the approximate LSH path: recall@5 of
    // ann_lsh_topk's neighbor set against the exact brute-force top-5,
    // computed INSIDE Spark per query id. The oracle computes exact-vs-
    // exact (trivially 1.0 per query), so the row hash-matches iff the LSH
    // path achieves FULL recall on the fixture — any bucketing loss turns
    // the row red. (Deterministic: projections are seed-pinned.)
    "ann_lsh_recall" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      recallOf(graft.operators.AnnLsh.topK(emb, "vec_id", "embedding",
        q, "q_id", "qv", k = 5), spark, dir)
    }),
    // HARD-NEGATIVE mining (contrastive-training curation: "most similar
    // items that are NOT my class"): per-query top-5 cosine among corpus
    // rows with a DIFFERENT label. Unlike the global allowed-id filter,
    // the exclusion is PER QUERY — a row disallowed for one query is a
    // candidate for another — so it lives in the join condition, before
    // scoring and ranking, where it prunes instead of under-filling.
    // Brute-force shape (corpus scans once against the broadcast query
    // set), fully deterministic, hash-checked end-to-end.
    "ann_hard_negatives" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding").as("v"))
        .withColumn("nrm", graft.functions.functions.vec_l2norm(col("v")))
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("label").as("q_label"))
      val c = emb.select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cn"), col("label").as("c_label"))
      val scored = c.crossJoin(broadcast(q))
        .filter(col("q_id") =!= col("c_id") && col("c_label") =!= col("q_label"))
        .withColumn("cosine", round(dot / (col("qn") * col("cn")), 6))
      val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "c_id", "c_label", "rank", "cosine")
        .orderBy("q_id", "rank")
    }),
    // Filtered-LSH recall gate (completes the IDSelector family across
    // brute/LSH/IVF/IVF+PQ): the allowed-id semi join restricts the
    // corpus BEFORE hashing and bucketing — disallowed rows never hash,
    // never shuffle, never rank — versus the post-filter that under-fills
    // under any selective predicate. probes=2 (vs the unfiltered path's
    // 1) because the filtered neighbor set is farther out: the sparser
    // allowed corpus needs a wider probe window for full recall at
    // sf0.01, the gate's lossless operating point.
    "ann_lsh_filtered_recall" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val allowed = emb.filter(col("label") % 2 === 0)
        .select(col("vec_id").as("c_id"))
      recallVs(graft.operators.AnnLsh.topKFiltered(emb, "vec_id", "embedding",
          q, "q_id", "qv", k = 5, allowed, probes = 2),
        exactTop5Filtered(spark, dir).select("q_id", "c_id"))
    }),
    // Predicate-FILTERED exact top-5 (serving: "nearest neighbors among
    // rows matching a metadata filter", here label % 2 = 0). The
    // restriction lands on the corpus scan (a pushed-down parquet filter),
    // then the same broadcast-scan shape as ann_bruteforce_topk — the
    // corpus never shuffles. Fully deterministic, hash-checked end-to-end.
    "ann_filtered_topk" -> ((spark, dir) =>
      exactTop5Filtered(spark, dir).orderBy("q_id", "rank")),
    // Filtered-IVF EXACTNESS gate (FAISS IDSelector-style): the allowed-id
    // set semi-joins the candidate stream BEFORE scoring/ranking — a
    // post-filtered top-k under-fills whenever the predicate is selective,
    // the classic filtered-search bug; this gate turns red on it (5
    // filtered-out rows would crack the top-5). At nprobe == nCells every
    // cell is admitted, so the filtered IVF path must reproduce the
    // filtered brute force EXACTLY; oracle = filtered exact-vs-exact.
    "ann_ivf_filtered_recall" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val allowed = emb.filter(col("label") % 2 === 0)
        .select(col("vec_id").as("c_id"))
      recallVs(ivfIndex(spark, dir).topKFiltered(q, k = 5, nprobe = 8, allowed),
        exactTop5Filtered(spark, dir).select("q_id", "c_id"))
    }),
    // IVF EXACTNESS gate: at nprobe == nCells every cell is probed, so the
    // lifecycle (assignment scan -> probe selection -> cell join -> exact
    // scoring -> rank) must reproduce brute force EXACTLY — any bug in the
    // inverted-file join or scoring turns this row red. (The partial-probe
    // operating point, nprobe=6, is recall-gated in RecallSpec instead:
    // its measured recall is data-dependent, not provably full.)
    "ann_ivf_recall" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val index = ivfIndex(spark, dir)
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      recallOf(index.topK(q, k = 5, nprobe = 8), spark, dir)
    }),
    // IVF-style: spherical k-means coarse quantizer (trained on a bounded
    // driver-side sample — no corpus-scanning fit job); MULTI-PROBE — each
    // query scans the nprobe centroid-closest cells, not just its own, so
    // near-boundary neighbors aren't missed. Probe selection is a bounded
    // |q| x k cross (k = 8 centroid rows, metadata-sized); the corpus
    // still joins by its single cell assignment, so each candidate is
    // scored at most once per query. nprobe = 6 of 8 because the fixture's
    // embeddings are near-random in cosine (no tight neighborhoods), so
    // top-5 neighbors scatter across cells — measured recall@5: 0.84 at
    // nprobe 4, 1.0 at nprobe 6 on balanced cells. Clustered corpora probe
    // fewer cells; at scale raise nCells (~sqrt(n)) instead.
    "ann_ivf_topk" -> ((spark, dir) => {
      // explicit index lifecycle: build (one sample collect + a lazy
      // assignment scan, inverted file persisted) then a lazy
      // probe/score/rank query — see operators.IvfIndex; subsequent query
      // sets (and the recall gate above) reuse the cached index
      val emb = Tables.load(spark, dir, "embeddings")
      val index = ivfIndex(spark, dir)
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      index.topK(q, k = 5, nprobe = 6)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("q_id", "rank")
    }),
    // Durable-index PARITY gate: the cell-partitioned FILE index
    // (write -> load -> statically-pruned probe, see IvfIndex.topK) must
    // reproduce the in-session persisted index EXACTLY at ann_ivf_topk's
    // operating point (k=5, nprobe=6) — floats round-trip parquet
    // bit-exactly and tie-breaks are deterministic, so any divergence is
    // a real bug (a pruning filter dropping a probed cell, centroid
    // drift, a round-trip schema loss). The emitted row is the symmetric
    // difference of the (q_id, c_id, rank) sets, pinned to (0, 0, true)
    // by the oracle's literals. This also puts the 100 TB path — the
    // partition-pruned scan of the durable inverted file — on the bench
    // clock and the driver's correctness gate, not just in
    // IvfPersistSpec.
    "ann_ivf_persisted" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val mem = ivfIndex(spark, dir).topK(q, k = 5, nprobe = 6)
        .select("q_id", "c_id", "rank").withColumn("in_mem", lit(1))
      val file = ivfPersisted(spark, dir).topK(q, k = 5, nprobe = 6)
        .select("q_id", "c_id", "rank").withColumn("in_file", lit(1))
      mem.join(file, Seq("q_id", "c_id", "rank"), "full_outer")
        .agg(
          coalesce(sum(when(col("in_file").isNull, 1L)), lit(0L))
            .as("missing_from_file"),
          coalesce(sum(when(col("in_mem").isNull, 1L)), lit(0L))
            .as("extra_in_file"))
        .withColumn("parity",
          col("missing_from_file") === 0 && col("extra_in_file") === 0)
    }),
    // Incremental-APPEND parity gate (r15): the serve path of the
    // build-at-%2==1 / append-%2==0 lifecycle ([[appendedServeIndex]] —
    // crash-window refusal + batch-ledger idempotence, with the replayed
    // no-op pinned before first serve). The appended FILE index must
    // reproduce, at ann_ivf_topk's operating point, an in-session index
    // holding the FULL corpus assigned under the SAME frozen centroids
    // (IvfIndex.withCentroids — shared assignment expression and
    // tie-breaks), because append-then-serve and assign-everything are
    // definitionally the same rows. Any divergence — a lost appended
    // vector, a partition the pruner skips, ledger drift — breaks the
    // symmetric difference and turns the row red.
    "ann_ivf_appended" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val file = appendedServeIndex(spark, dir)
      val mem = graft.operators.IvfIndex
        .withCentroids(emb, "vec_id", "embedding", file.centroids)
        .topK(q, k = 5, nprobe = 6)
        .select("q_id", "c_id", "rank").withColumn("in_mem", lit(1))
      val served = file.topK(q, k = 5, nprobe = 6)
        .select("q_id", "c_id", "rank").withColumn("in_file", lit(1))
      mem.join(served, Seq("q_id", "c_id", "rank"), "full_outer")
        .agg(
          coalesce(sum(when(col("in_file").isNull, 1L)), lit(0L))
            .as("missing_from_file"),
          coalesce(sum(when(col("in_mem").isNull, 1L)), lit(0L))
            .as("extra_in_file"))
        .withColumn("parity",
          col("missing_from_file") === 0 && col("extra_in_file") === 0)
    }),
    // EXCISION parity gate (r17) — the takedown story for vectors: the
    // durable index with the vec_id%7==0 slice tombstoned (NOT yet
    // compacted — the anti-join serving path is what this row gates)
    // must reproduce, at ann_ivf_topk's operating point, an in-session
    // index holding ONLY the survivors assigned under the SAME frozen
    // centroids — because excise-then-serve and assign-only-survivors
    // are definitionally the same candidate set. An excised vector
    // resurfacing in any top-5 (a missed anti-join, a stale tombRows
    // manifest) breaks the symmetric difference and turns this row red.
    "ann_ivf_excised" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val file = excisedServeIndex(spark, dir)
      val mem = graft.operators.IvfIndex
        .withCentroids(emb.filter(col("vec_id") % 7 =!= 0), "vec_id",
          "embedding", file.centroids)
        .topK(q, k = 5, nprobe = 6)
        .select("q_id", "c_id", "rank").withColumn("in_mem", lit(1))
      val served = file.topK(q, k = 5, nprobe = 6)
        .select("q_id", "c_id", "rank").withColumn("in_file", lit(1))
      mem.join(served, Seq("q_id", "c_id", "rank"), "full_outer")
        .agg(
          coalesce(sum(when(col("in_file").isNull, 1L)), lit(0L))
            .as("missing_from_file"),
          coalesce(sum(when(col("in_mem").isNull, 1L)), lit(0L))
            .as("extra_in_file"))
        .withColumn("parity",
          col("missing_from_file") === 0 && col("extra_in_file") === 0)
    }),
    // Embedding hygiene: per-shard norm statistics + zero-vector counts —
    // the sanity pass before any embedding-based dedup/search (a zero or
    // wildly-scaled norm poisons cosine math downstream). Single scan,
    // codegen'd norm kernel, 8-row output.
    "embedding_norm_stats" -> ((spark, dir) => {
      val emb = withNorm(Tables.load(spark, dir, "embeddings"))
        .withColumn("shard", col("vec_id") % 8)
      emb.groupBy("shard")
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("n_zero_norm"),
          round(min("nrm"), 6).as("min_norm"),
          round(max("nrm"), 6).as("max_norm"),
          round(avg("nrm"), 6).as("avg_norm"))
        .orderBy("shard")
    }),
    // Product-quantization ANN: 32x-compressed m-byte codes scanned by
    // per-query lookup tables (ADC), exact re-rank of the top-256
    // shortlist — the FAISS-style representation for a 100 TB vector
    // corpus (see operators.PqIndex). Rows-only (codebooks are k-means
    // trained, not SQL-expressible); recall driver-gated by
    // ann_pq_recall below + RecallSpec.
    "ann_pq_topk" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      pqIndex(spark, dir).topK(q, k = 5, nCandidates = 256)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("q_id", "rank")
    }),
    // Driver-visible recall gate for the PQ path: recall@5 of ann_pq_topk
    // against the exact brute-force top-5, computed INSIDE Spark; the
    // oracle computes exact-vs-exact (1.0 per query), so the row
    // hash-matches iff the ADC shortlist keeps FULL recall on the fixture
    // (seed-pinned, deterministic) — any codebook/LUT/cut regression
    // turns the row red.
    "ann_pq_recall" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      recallOf(pqIndex(spark, dir).topK(q, k = 5, nCandidates = 256), spark, dir)
    }),
    // Durable-PQ PARITY gate (the ann_ivf_persisted pattern): the
    // written codes+codebook reopened through the manifest must
    // reproduce the in-session index EXACTLY at ann_pq_topk's operating
    // point — doubles round-trip parquet bit-exactly and tie-breaks are
    // deterministic, so any divergence (codebook drift, schema loss, a
    // truncated codes table the manifest failed to catch) is a real bug.
    // Puts the build-once/serve-many PQ lifecycle on the driver's
    // correctness gate and bench clock, not just in PqPersistSpec.
    "ann_pq_persisted" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val mem = pqIndex(spark, dir).topK(q, k = 5, nCandidates = 256)
        .select("q_id", "c_id", "rank").withColumn("in_mem", lit(1))
      val file = pqPersisted(spark, dir).topK(q, k = 5, nCandidates = 256)
        .select("q_id", "c_id", "rank").withColumn("in_file", lit(1))
      mem.join(file, Seq("q_id", "c_id", "rank"), "full_outer")
        .agg(
          coalesce(sum(when(col("in_file").isNull, 1L)), lit(0L))
            .as("missing_from_file"),
          coalesce(sum(when(col("in_mem").isNull, 1L)), lit(0L))
            .as("extra_in_file"))
        .withColumn("parity",
          col("missing_from_file") === 0 && col("extra_in_file") === 0)
    }),
    // Incremental-APPEND parity gate for the CODE table (r17, closing
    // the ann_ivf_appended pattern over the PQ lifecycle): the
    // build-at-%2==1 / encode-and-append-%2==0 / compact chain
    // (pqAppendedServeIndex — crash-window refusal + batch ledger, with
    // the replayed no-op pinned before first serve) must reproduce an
    // in-session index that encodes the FULL corpus under the SAME
    // frozen codebook (PqIndex.withCodebook — shared encode kernel),
    // because append-then-serve and encode-everything are definitionally
    // the same code rows, and the two-level ADC cut is
    // partition-independent (global top-C by (adc, c_id)). A lost or
    // double-encoded appended code, codebook drift, or a compaction that
    // dropped rows turns exactly this row red.
    "ann_pq_appended" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val file = pqAppendedServeIndex(spark, dir)
      val mem = graft.operators.PqIndex
        .withCodebook(emb, "vec_id", "embedding", file.codebook)
        .topK(q, k = 5, nCandidates = 64)
        .select("q_id", "c_id", "rank").withColumn("in_mem", lit(1))
      val served = file.topK(q, k = 5, nCandidates = 64)
        .select("q_id", "c_id", "rank").withColumn("in_file", lit(1))
      mem.join(served, Seq("q_id", "c_id", "rank"), "full_outer")
        .agg(
          coalesce(sum(when(col("in_file").isNull, 1L)), lit(0L))
            .as("missing_from_file"),
          coalesce(sum(when(col("in_mem").isNull, 1L)), lit(0L))
            .as("extra_in_file"))
        .withColumn("parity",
          col("missing_from_file") === 0 && col("extra_in_file") === 0)
    }),
    // EXCISION parity gate for the CODE table (r17, ann_ivf_excised's PQ
    // twin): the durable codes with the vec_id%7==0 slice tombstoned
    // (not yet compacted — the anti-join ADC path is what this row
    // gates) must reproduce an in-session index ENCODING ONLY THE
    // SURVIVORS under the same frozen codebook; an excised vector
    // resurfacing in any shortlist turns the row red.
    "ann_pq_excised" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val file = pqExcisedServeIndex(spark, dir)
      val mem = graft.operators.PqIndex
        .withCodebook(emb.filter(col("vec_id") % 7 =!= 0), "vec_id",
          "embedding", file.codebook)
        .topK(q, k = 5, nCandidates = 64)
        .select("q_id", "c_id", "rank").withColumn("in_mem", lit(1))
      val served = file.topK(q, k = 5, nCandidates = 64)
        .select("q_id", "c_id", "rank").withColumn("in_file", lit(1))
      mem.join(served, Seq("q_id", "c_id", "rank"), "full_outer")
        .agg(
          coalesce(sum(when(col("in_file").isNull, 1L)), lit(0L))
            .as("missing_from_file"),
          coalesce(sum(when(col("in_mem").isNull, 1L)), lit(0L))
            .as("extra_in_file"))
        .withColumn("parity",
          col("missing_from_file") === 0 && col("extra_in_file") === 0)
    }),
    // IVF+PQ composition (the full FAISS-style serving plan): probed
    // cells bound WHICH vectors are scored, PQ codes bound WHAT a score
    // costs, exact re-rank restores precision. Pure composition of the
    // two cached indexes — no extra build. Rows-only; gated by
    // ann_ivfpq_recall.
    "ann_ivfpq_topk" -> ((spark, dir) => {
      ivfPqTop(spark, dir)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("q_id", "rank")
    }),
    // EXACTNESS gate for the composed path (same philosophy as
    // ann_ivf_recall): at nprobe == nCells every cell is admitted, so any
    // loss must come from the ADC shortlist — the row hash-matches iff
    // the cell->code join, LUT scoring, two-level cut and re-rank jointly
    // reproduce brute force. The partial-probe operating point (nprobe=6)
    // stays recall-asserted in IvfPqSpec at sf0.001 (its sf0.01 recall is
    // data-dependent — the probe itself is lossy there, as ann_ivf_topk's
    // is).
    "ann_ivfpq_recall" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      recallOf(new graft.operators.IvfPq(ivfIndex(spark, dir), pqIndex(spark, dir))
        .topK(q, k = 5, nprobe = 8, nCandidates = 256), spark, dir)
    }),
    // Filtered IVF+PQ exactness gate: the allowed-id set semi-joins the
    // code stream BEFORE the ADC scan (shortlist fills with allowed
    // candidates only), full probe + nCandidates >= |allowed| makes the
    // composed result PROVABLY equal to the filtered brute force — so a
    // hash mismatch means a real filtered-serving bug, not approximation.
    "ann_ivfpq_filtered_recall" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val allowed = emb.filter(col("label") % 2 === 0)
        .select(col("vec_id").as("c_id"))
      recallVs(new graft.operators.IvfPq(ivfIndex(spark, dir), pqIndex(spark, dir))
          .topKFiltered(q, k = 5, nprobe = 8, nCandidates = 256, allowed),
        exactTop5Filtered(spark, dir).select("q_id", "c_id"))
    }),
    // Cross-session SERVING-STACK parity (r8): the composition of the
    // DURABLE IVF and the DURABLE PQ — both reopened through their
    // validated manifests, zero build jobs — must reproduce the
    // in-session composition EXACTLY at the composed operating point.
    // This is the plan a second session actually serves at 100 TB
    // (partition-pruned inverted file x code-only ADC scan), now on the
    // driver's correctness gate and bench clock, completing the coverage
    // that ann_ivf_persisted / ann_pq_persisted give each index alone
    // (the durable x durable pairing was previously pinned only in
    // IvfPqSpec). COST PROFILE (r18 audit, the r17 watch item): both
    // index handles are session-cached (runOnce — manifests validate
    // ONCE, never per pass); the ~1 s warm pass is the composed durable
    // serve plan itself executing per pass (probed-cells collect + ADC
    // scan + re-rank) — deliberately uncached, because putting the
    // 100 TB serving plan on the bench clock is this row's purpose.
    "ann_ivfpq_persisted" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val mem = ivfPqTop(spark, dir)
        .select("q_id", "c_id", "rank").withColumn("in_mem", lit(1))
      val file = new graft.operators.IvfPq(ivfPersisted(spark, dir), pqPersisted(spark, dir))
        .topK(q, k = 5, nprobe = 6, nCandidates = 256)
        .select("q_id", "c_id", "rank").withColumn("in_file", lit(1))
      mem.join(file, Seq("q_id", "c_id", "rank"), "full_outer")
        .agg(
          coalesce(sum(when(col("in_file").isNull, 1L)), lit(0L))
            .as("missing_from_file"),
          coalesce(sum(when(col("in_mem").isNull, 1L)), lit(0L))
            .as("extra_in_file"))
        .withColumn("parity",
          col("missing_from_file") === 0 && col("extra_in_file") === 0)
    }),
    // Int8 quantization profile: the write-path transform that cuts a
    // 100 TB embedding store 4x (64 floats -> 64 bytes + a scale). The
    // per-shard reconstruction-error stats, saturation counts, and the
    // analytic error bound (err <= sqrt(d)*scale/2) are all recomputed
    // independently by the DuckDB oracle, so the whole quantize ->
    // dequantize path is hash-checked — deterministic math, unlike the
    // banded approximate paths. See operators.Quantize.
    "embedding_quantize_stats" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
      val q = graft.operators.Quantize.int8(emb, "v")
        .withColumn("dq",
          graft.operators.Quantize.dequantize(col("qvec"), col("qscale")))
        .withColumn("nrm", vec_l2norm(col("v")))
        .withColumn("err", vec_l2norm(
          zip_with(col("v"), col("dq"), (a, b) => a.cast("double") - b)))
        .withColumn("rel_err",
          when(col("nrm") === 0.0, 0.0).otherwise(col("err") / col("nrm")))
        .withColumn("n_sat",
          size(filter(col("qvec"), x => abs(x.cast("int")) === 127)))
        .withColumn("bound_ok",
          col("err") <= sqrt(size(col("v")).cast("double")) * col("qscale") / 2
            + lit(1e-9))
        .withColumn("shard", col("vec_id") % 8)
      q.groupBy("shard")
        .agg(count(lit(1)).as("n_vectors"),
          sum(col("n_sat").cast("long")).as("n_saturated"),
          round(avg("rel_err"), 6).as("avg_rel_err"),
          round(max("rel_err"), 6).as("max_rel_err"),
          bool_and(col("bound_ok")).as("within_bound"))
        .orderBy("shard")
    }),
    // Index-health surfacing (r11): the staleness report over the
    // drift-PLANTED durable index (quantizer frozen on half the corpus,
    // other half appended) — the maintenance signal that tells an
    // operator the frozen quantizer no longer represents what the index
    // serves. The driver-checked fields are the exact-arithmetic ones:
    // the appended fraction from manifest row counts and the fraction
    // disjunct of the stale verdict (frac >= the 0.5 default). The FULL
    // verdict also ORs in the k-means-dependent skew/MSE growth terms,
    // which no SQL oracle can reproduce — emitting it would make the row
    // hash-stable only while the planted split forces frac >= 0.5, a
    // fixture-parity assumption a regeneration could silently break —
    // so those disjuncts stay pinned in DriftSpec instead.
    "ann_ivf_drift_report" -> ((spark, dir) => {
      val rep = graft.operators.IvfIndex.staleness(spark, driftIndexPath(spark, dir))
      import spark.implicits._
      Seq((rep.fracAppended, rep.fracAppended >= 0.5))
        .toDF("frac_appended", "stale_by_fraction")
        .withColumn("frac_appended", round(col("frac_appended"), 6))
    }),
    // Streaming ingest → durable index FOLD replay (r17) — ties the two
    // previously separate gates together: streaming_ingest_replay gates
    // corpus admission, ann_ivf_appended gates batch append; the
    // production loop is "the admitted micro-batch folds into the
    // serving index". A real streaming run (three deliveries: clean,
    // padded with already-served rows admission must drop, verbatim
    // re-delivery the ledger must swallow) folds into a base index via
    // foreachBatch; the folded index must reproduce, at ann_ivf_topk's
    // operating point, assign-EVERYTHING under the frozen centroids —
    // a dropped admitted row, a double-folded re-delivery, or a leaked
    // re-crawl all break the symmetric difference.
    "streaming_index_fold_replay" -> ((spark, dir) => {
      val path = ReplayOrchestrator.await[String](spark, dir, "ivf-fold")
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val file = graft.operators.IvfIndex.load(spark, path)
      val mem = graft.operators.IvfIndex
        .withCentroids(emb, "vec_id", "embedding", file.centroids)
        .topK(q, k = 5, nprobe = 6)
        .select("q_id", "c_id", "rank").withColumn("in_mem", lit(1))
      val served = file.topK(q, k = 5, nprobe = 6)
        .select("q_id", "c_id", "rank").withColumn("in_file", lit(1))
      mem.join(served, Seq("q_id", "c_id", "rank"), "full_outer")
        .agg(
          coalesce(sum(when(col("in_file").isNull, 1L)), lit(0L))
            .as("missing_from_file"),
          coalesce(sum(when(col("in_mem").isNull, 1L)), lit(0L))
            .as("extra_in_file"))
        .withColumn("parity",
          col("missing_from_file") === 0 && col("extra_in_file") === 0)
    }),
    // Drift REMEDIATION gate (r17) — measure → decide → re-fit → serve,
    // the actuation half the drift reports lacked: on the refit-planted
    // index (quantizer frozen on half, other half appended, provably
    // stale) refitIfStale must fire exactly once, the repeated call must
    // be a zero-build no-op (both pinned inside refittedIndex), and the
    // REFRESHED index at FULL probe must reproduce brute force over the
    // union exactly — recall@5 == 1.0 per query, the ann_ivf_recall gate
    // applied to the post-refit quantizer. The oracle computes
    // exact-vs-exact, so any refit that lost a vector, double-kept one,
    // or broke assignment turns this row red.
    "ann_ivf_drift_refit" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      recallOf(refittedIndex(spark, dir).topK(q, k = 5, nprobe = 8),
        spark, dir)
    }),
    // Codebook-drift REMEDIATION gate (r18) — ann_ivf_drift_refit's PQ
    // twin, closing measure -> decide -> act over the code table: on the
    // refit-planted index (codebook frozen on half at the bootstrap
    // ksub, other half encoded+appended, provably stale) refitIfStale
    // must fire exactly once, the repeated call must be a zero-build
    // no-op (both pinned inside pqRefittedIndex), and the REFRESHED
    // index at the serving operating point must achieve full recall@5
    // vs brute force — the ann_pq_recall gate applied to the post-refit
    // codebook (exact-vs-exact oracle; a refit that lost a vector,
    // kept a stale code, or broke the ADC ordering turns this row red).
    "ann_pq_drift_refit" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      recallOf(pqRefittedIndex(spark, dir).topK(q, k = 5, nCandidates = 256),
        spark, dir)
    }),
    // Writer-fencing gate (r18) — the one-maintainer-at-a-time contract
    // on the driver's correctness surface (see fencingVerdicts): a live
    // foreign lease refuses by name leaving the artifact untouched, an
    // initializing (half-written) lease is HELD rather than usurped, an
    // expired lease is taken over and released at completion. The engine
    // computes every verdict genuinely against a real written index; the
    // oracle states the required fixed point as lifecycle literals.
    "index_writer_fencing" -> ((spark, dir) => {
      import spark.implicits._
      fencingVerdicts(spark, dir).toDF("fence_check", "ok").orderBy("fence_check")
    }),
    // PQ twin of ann_ivf_drift_report: the frozen CODEBOOK's health under
    // post-freeze arrivals — same planted half/half drift, same
    // exact-arithmetic driver fields; the sample-MSE growth disjunct
    // stays pinned in DriftSpec.
    "ann_pq_drift_report" -> ((spark, dir) => {
      val rep = graft.operators.PqIndex.staleness(spark, pqDriftIndexPath(spark, dir))
      import spark.implicits._
      Seq((rep.fracAppended, rep.fracAppended >= 0.5))
        .toDF("frac_appended", "stale_by_fraction")
        .withColumn("frac_appended", round(col("frac_appended"), 6))
    }),
    // Corpus topic-cluster report (r12) — the data-mixing companion of
    // the DataComp/DoReMi recipes: every corpus vector assigned to one of
    // K frozen seeded clusters (see topicCells — centroids are corpus
    // ROWS picked by md5 order, assignment is the IVF spherical
    // expression verbatim), reported as cluster -> member count, token
    // mass (join to the documents table by id), and the most CENTRAL
    // member as exemplar (min (cell_dist, vec_id) — a per-cell aggregate,
    // never a per-cell sort). Fully hash-checkable because nothing is
    // fitted: the oracle replays seed selection, distances, tie-breaks,
    // and the exemplar rule exactly.
    "corpus_topic_report" -> ((spark, dir) => {
      val cells = topicCells(spark, dir)
      val toks = Tables.load(spark, dir, "documents")
        .select(col("doc_id").as("c_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val minDist = cells.groupBy("cell").agg(min("cell_dist").as("__mind"))
      val exemplar = cells.join(minDist, Seq("cell"))
        .filter(col("cell_dist") === col("__mind"))
        .groupBy("cell").agg(min("c_id").as("exemplar_id"))
      cells.join(toks, Seq("c_id"), "left")
        .groupBy("cell")
        .agg(count(lit(1)).as("n_members"), sum("n_tokens").as("token_mass"))
        .join(exemplar, Seq("cell"))
        .orderBy("cell")
    }),
    // Cluster-BALANCED sampling (r12): the topic clusters above become
    // strata of the existing waterfill allocator — equal weights, one
    // global token budget, so every cluster contributes the same token
    // mass unless it is too small to absorb its share (then it saturates
    // whole and the mass spills to the others, still equally). Budget
    // 26000 sits between the smallest and largest cell masses at
    // sf0.001/0.01, so both verdict kinds are exercised; membership is
    // the deterministic per-row md5 filter — bit-reproducible.
    "sample_cluster_balanced" -> ((spark, dir) => {
      val toks = Tables.load(spark, dir, "documents")
        .select(col("doc_id").as("c_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val base = topicCells(spark, dir).select("cell", "c_id")
        .join(toks, Seq("c_id"))
        .withColumn("cell_s", col("cell").cast("string"))
      val weights = (0 until TopicK).map(i => i.toString -> 1L).toMap
      val rates = graft.operators.Sampling.waterfillAllocation(base, "cell_s",
          "n_tokens", weights, budget = 26000L)
        .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
      graft.operators.Sampling.stratifiedSample(base, "c_id", "cell_s", rates,
          defaultRate = 0.0)
        .select(col("c_id").as("vec_id"), col("cell"), col("n_tokens"))
        .orderBy("vec_id")
    }),
    // Topic-mix drift report (r12): cluster-share shift between the
    // %5==0 "new crawl" vectors and the reference rest, over the SAME
    // frozen seeded quantizer as the topic report — the embedding-space
    // twin of corpus_drift_report (a crawl whose topic mix moved shows
    // up here before it skews a cluster-balanced sample). Same exact
    // integer cross-multiplied numerators (c_ref*n_new - c_new*n_ref)
    // summed/maxed exactly, ONE rounded division each — bit-identical in
    // the oracle. Shape: the shared assignment scan, one |K|-row
    // aggregate, a 1-row totals broadcast.
    "topic_drift_report" -> ((spark, dir) => {
      val perCell = topicCells(spark, dir).select("cell", "c_id")
        .withColumn("is_new", col("c_id") % 5 === 0)
        .groupBy("cell").agg(
          sum(when(col("is_new"), 1L).otherwise(0L)).as("c_new"),
          sum(when(!col("is_new"), 1L).otherwise(0L)).as("c_ref"))
      val totals = perCell.agg(sum("c_ref").as("n_ref"), sum("c_new").as("n_new"))
      val num = col("c_ref") * col("n_new") - col("c_new") * col("n_ref")
      perCell.crossJoin(broadcast(totals))
        .withColumn("anum", abs(num))
        .agg(count(lit(1)).as("n_cells"),
          min("n_ref").as("n_ref"), min("n_new").as("n_new"),
          org.apache.spark.sql.functions.round(sum("anum").cast("double")
            / (lit(2.0) * min("n_ref") * min("n_new")), 6).as("tv_dist"),
          org.apache.spark.sql.functions.round(max("anum").cast("double")
            / (lit(1.0) * min("n_ref") * min("n_new")), 6).as("max_gap"))
    }),
    // Streaming TOPIC-drift REPLAY (r13) — the embedding-space twin of
    // streaming_drift_replay on the driver ledger: the %5==0 vectors
    // stream in three pinned-order micro-batches through
    // StreamingOps.topicDriftMonitorStream (state = per-cell histogram
    // under the frozen seeded quantizer, bounded by K cells) against
    // reference counts frozen from the %5!=0 slice; the final emission
    // must equal the batch topic_drift_report, so the two rows share one
    // oracle derivation. Update-mode memory sink (a monitor has no
    // append semantics); the collected sink is <= 3 rows.
    "streaming_topic_drift_replay" -> ((spark, dir) => {
      import spark.implicits._
      val rows = ReplayOrchestrator
        .await[Array[graft.streaming.StreamingOps.TopicDriftRow]](
          spark, dir, "topic-drift")
      rows.toSeq.toDF()
        .select("n_cells", "n_ref", "n_new", "tv_dist", "max_gap")
    }),
    // Brute-force top-5 over the int8-quantized representation — the
    // ranking a serving tier computes after the 4x storage cut. Both
    // engines quantize then rank the SAME deterministic reconstruction,
    // so this is hash-checked end-to-end (ranking differences vs the
    // float path are the quantizer's business, measured in QuantizeSpec;
    // engine disagreement here is a bug). Same broadcast-scan shape as
    // ann_bruteforce_topk: the corpus never shuffles.
    "ann_quantized_topk" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
      val dq = graft.operators.Quantize.int8(emb, "v")
        .select(col("vec_id"),
          graft.operators.Quantize.dequantize(col("qvec"), col("qscale")).as("dv"))
        .withColumn("nrm", vec_l2norm(col("dv")))
      val q = dq.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("dv").as("qv"), col("nrm").as("qn"))
      val c = dq.select(col("vec_id").as("c_id"), col("dv").as("cv"),
        col("nrm").as("cn"))
      val scored = c.crossJoin(broadcast(q)).filter(col("q_id") =!= col("c_id"))
        .withColumn("cosine", round(dot / (col("qn") * col("cn")), 6))
      val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "c_id", "rank", "cosine")
        .orderBy("q_id", "rank")
    }),
    // Matryoshka prefix-dimension top-5 (see matryoshkaTop5On): coarse
    // rank on the 16-dim prefix, exact re-rank of the top-50 shortlist.
    // Deterministic end to end, so the full approximate pipeline is
    // hash-checked — the oracle replays coarse ranking, shortlist cut,
    // and re-rank, not just a gate. (Recall on a front-loaded fixture is
    // pinned in RecallSpec; see matryoshkaTop5On's note on why a recall
    // gate over the isotropic driver fixture would certify nothing.)
    "ann_matryoshka_topk" -> ((spark, dir) =>
      matryoshkaTop5(spark, dir).orderBy("q_id", "rank")),
    // MMR diversity re-rank (Carbonell & Goldstein SIGIR'98) of the
    // dense shortlist — the standard redundancy-removal pass after a
    // top-k: CosineTopK's exact top-20 for doc 0's embedding, then 5
    // greedy picks trading relevance (x0.7) against max similarity to
    // what is already picked (x0.3). The greedy runs driver-side over
    // the BOUNDED 20-row shortlist (Retrieval.mmrRerank — the
    // centroid-collect precedent); deterministic end to end (round-6
    // cosines, id tie-breaks), so the oracle replays all five picks as
    // unrolled argmax stages and the row is fully hash-checked.
    "retrieval_mmr_diverse" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      val q0 = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val short = graft.plans.CosineTopK
        .topK(spark, emb, Seq((0L, q0)), 20, "vec_id", "embedding")
        .select(col("c_id").as("doc_id"), col("cosine").as("rel"))
        .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
          "doc_id")
      graft.operators.Retrieval.mmrRerank(short, "doc_id", "rel",
        "embedding", k = 5, lambdaRel = 0.7, lambdaDiv = 0.3)
    }),
    // Semantic benchmark decontamination (see semanticContaminationOn):
    // the vec_id % 10 == 0 slice plays the bounded eval benchmark; corpus
    // vectors whose max eval cosine reaches 0.35 are flagged — the
    // operating point where the fixture yields a mixed verdict (61 of 450
    // flagged at sf0.01). Fully hash-checked: max of round-6 cosines is
    // order-independent, so the oracle reproduces every row bit-for-bit.
    "decontaminate_semantic" -> ((spark, dir) =>
      semanticContaminationOn(Tables.load(spark, dir, "embeddings"),
          col("vec_id") % 10 === 0, minCosine = 0.35)
        .orderBy("vec_id")))

  private val bruteForceOracle =
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    round(list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
        |      / (q.nrm * c.nrm), 6) AS cosine
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT q_id, c_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, c_id, rank, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  private val filteredBruteForceOracle =
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    round(list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
        |      / (q.nrm * c.nrm), 6) AS cosine
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
        |    AND c.label % 2 = 0),
        |ranked AS (
        |  SELECT q_id, c_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, c_id, rank, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** Filtered exact-vs-exact recall (trivially 1.0 per query) — the
    * filtered-search twin of [[fullRecallOracle]]: hash-matches iff the
    * filtered IVF path reproduces the filtered brute force exactly. */
  private val filteredFullRecallOracle =
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    round(list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
        |      / (q.nrm * c.nrm), 6) AS cosine
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
        |    AND c.label % 2 = 0),
        |ranked AS (
        |  SELECT q_id, c_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
        |  FROM scored),
        |top5 AS (SELECT q_id, c_id FROM ranked WHERE rank <= 5)
        |SELECT a.q_id, count(*) AS n_exact,
        |  CAST(coalesce(sum(CASE WHEN b.c_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
        |  round(coalesce(sum(CASE WHEN b.c_id IS NOT NULL THEN 1 END), 0) * 1.0
        |    / count(*), 6) AS recall
        |FROM top5 a LEFT JOIN top5 b ON a.q_id = b.q_id AND a.c_id = b.c_id
        |GROUP BY a.q_id ORDER BY a.q_id""".stripMargin

  /** Exact-vs-exact recall (trivially 1.0 per query): the oracle for every
    * approximate path's recall gate — the Spark side hash-matches iff the
    * approximate shortlist keeps FULL recall on the fixture. */
  private val fullRecallOracle =
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    round(list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
        |      / (q.nrm * c.nrm), 6) AS cosine
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT q_id, c_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
        |  FROM scored),
        |top5 AS (SELECT q_id, c_id FROM ranked WHERE rank <= 5)
        |SELECT a.q_id, count(*) AS n_exact,
        |  CAST(coalesce(sum(CASE WHEN b.c_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
        |  round(coalesce(sum(CASE WHEN b.c_id IS NOT NULL THEN 1 END), 0) * 1.0
        |    / count(*), 6) AS recall
        |FROM top5 a LEFT JOIN top5 b ON a.q_id = b.q_id AND a.c_id = b.c_id
        |GROUP BY a.q_id ORDER BY a.q_id""".stripMargin

  /** Shared oracle for both drift reports (the indexes differ, the
    * planted split does not): appended fraction = (total - odd-half) /
    * total from the embeddings table itself, plus the fraction disjunct
    * of the stale verdict. */
  private val driftFractionOracle =
    """WITH b AS (SELECT count(*) AS n FROM embeddings WHERE vec_id % 2 = 1),
      |t AS (SELECT count(*) AS n FROM embeddings)
      |SELECT round((t.n - b.n) * 1.0 / t.n, 6) AS frac_appended,
      |  (t.n - b.n) * 1.0 / t.n >= 0.5 AS stale_by_fraction
      |FROM b, t""".stripMargin

  /** End-to-end replay of the Matryoshka pipeline: coarse cosine over the
    * first 16 coordinates (same double-widened products in index order),
    * identical (pcos DESC, c_id) shortlist cut at 50, exact re-rank of
    * the survivors — the whole approximate path, not just its gate. */
  private val matryoshkaOracle =
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm,
        |    sqrt(list_sum(list_transform((CAST(embedding AS DOUBLE[]))[1:16], x -> x * x))) AS pn
        |  FROM embeddings),
        |coarse AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    round(list_sum([q.v[i] * c.v[i] for i in range(1, 17)])
        |      / (q.pn * c.pn), 6) AS pcos
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |short AS (
        |  SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY pcos DESC, c_id) AS crank
        |    FROM coarse) WHERE crank <= 50),
        |scored AS (
        |  SELECT s.q_id, s.c_id,
        |    round(list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
        |      / (q.nrm * c.nrm), 6) AS cosine
        |  FROM short s JOIN e q ON q.vec_id = s.q_id JOIN e c ON c.vec_id = s.c_id),
        |ranked AS (
        |  SELECT q_id, c_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, c_id, rank, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** Shared topic-cluster assignment CTEs (ends in `a(vec_id, cell, d)`)
    * — replays topicCells exactly: md5-ordered seed selection, the IVF
    * spherical distance with its precomputed 1 + ||c||^2 term, and the
    * (distance, cell) tie-break. */
  private val duckTopicAsgCtes: String =
    """e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
      |  FROM embeddings),
      |seeds AS (
      |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
      |      AS INTEGER) AS cell,
      |    v AS cv, 1.0 + list_sum(list_transform(v, x -> x * x)) AS c2
      |  FROM e QUALIFY cell < 8),
      |dist AS (
      |  SELECT e.vec_id, s.cell,
      |    s.c2 - 2.0 * list_sum([e.v[i] * s.cv[i] for i in range(1, len(e.v) + 1)])
      |      / (CASE WHEN e.nrm > 0 THEN e.nrm ELSE 1.0 END) AS d
      |  FROM e, seeds s),
      |a AS (
      |  SELECT vec_id, cell, d
      |  FROM dist
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1)""".stripMargin

  /** The ONE topic-drift derivation both `topic_drift_report` (batch)
    * and `streaming_topic_drift_replay` (monitor's final emission) hash
    * against. */
  private val topicDriftOracle: String =
    (s"WITH $duckTopicAsgCtes,\n" +
    """pc AS (
      |  SELECT cell,
      |    CAST(sum(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c_new,
      |    CAST(sum(CASE WHEN vec_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c_ref
      |  FROM a GROUP BY cell),
      |tt AS (SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
      |         CAST(sum(c_new) AS BIGINT) AS n_new FROM pc)
      |SELECT CAST(count(*) AS BIGINT) AS n_cells,
      |  min(tt.n_ref) AS n_ref, min(tt.n_new) AS n_new,
      |  round(CAST(sum(abs(c_ref * tt.n_new - c_new * tt.n_ref)) AS DOUBLE)
      |    / (2.0 * min(tt.n_ref) * min(tt.n_new)), 6) AS tv_dist,
      |  round(CAST(max(abs(c_ref * tt.n_new - c_new * tt.n_ref)) AS DOUBLE)
      |    / (1.0 * min(tt.n_ref) * min(tt.n_new)), 6) AS max_gap
      |FROM pc, tt""".stripMargin)

  val oracleSql: ListMap[String, String] = ListMap(
    "corpus_topic_report" ->
      (s"WITH $duckTopicAsgCtes,\n" +
      """tok AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
        |          AS n_tokens FROM documents),
        |md AS (SELECT cell, min(d) AS mind FROM a GROUP BY cell),
        |ex AS (SELECT a.cell, CAST(min(a.vec_id) AS BIGINT) AS exemplar_id
        |       FROM a JOIN md ON a.cell = md.cell AND a.d = md.mind
        |       GROUP BY a.cell),
        |rep AS (SELECT a.cell, CAST(count(*) AS BIGINT) AS n_members,
        |          CAST(sum(t.n_tokens) AS BIGINT) AS token_mass
        |        FROM a LEFT JOIN tok t ON a.vec_id = t.doc_id GROUP BY a.cell)
        |SELECT r.cell, r.n_members, r.token_mass, e.exemplar_id
        |FROM rep r JOIN ex e USING (cell) ORDER BY cell""".stripMargin),
    "sample_cluster_balanced" ->
      (s"WITH $duckTopicAsgCtes,\n" +
      """tok AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
        |          AS n_tokens FROM documents),
        |b AS (SELECT a.cell, CAST(a.cell AS VARCHAR) AS cell_s, a.vec_id,
        |        t.n_tokens
        |      FROM a JOIN tok t ON a.vec_id = t.doc_id),
        |tokc AS (SELECT cell_s, CAST(sum(n_tokens) AS BIGINT) AS n
        |         FROM b GROUP BY cell_s),
        |act AS (SELECT cell_s, n, CAST(1 AS BIGINT) AS w FROM tokc),
        |tw AS (SELECT sum(w) AS wtot FROM act),
        |ordw AS (
        |  SELECT cell_s, n, w, wtot,
        |    coalesce(sum(n) OVER win, 0) AS cumN,
        |    coalesce(sum(w) OVER win, 0) AS cumW
        |  FROM act, tw
        |  WINDOW win AS (ORDER BY n * 1.0 / w, cell_s
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |sat AS (
        |  SELECT *, n * (wtot - cumW) <= (26000 - cumN) * w AS satd FROM ordw),
        |lam AS (
        |  SELECT 26000 - coalesce(sum(CASE WHEN satd THEN n END), 0) AS lamN,
        |         min(wtot) - coalesce(sum(CASE WHEN satd THEN w END), 0) AS lamD
        |  FROM sat),
        |rates AS (
        |  SELECT s.cell_s,
        |    CASE WHEN s.satd THEN 1.0
        |         ELSE round(CAST(l.lamN * s.w AS DOUBLE) / (l.lamD * s.n), 6)
        |         END AS rate
        |  FROM sat s, lam l)
        |SELECT b.vec_id, b.cell, b.n_tokens
        |FROM b JOIN rates r USING (cell_s)
        |WHERE (('0x' || substring(md5(CAST(b.vec_id AS VARCHAR)), 1, 15))::BIGINT)
        |      / 1152921504606846976.0 < r.rate
        |ORDER BY vec_id""".stripMargin),
    "topic_drift_report" -> topicDriftOracle,
    // the replay's final emission must equal the batch report — ONE
    // shared oracle derivation for both rows, so the equality the
    // streaming monitor promises is exactly what the driver hashes
    "streaming_topic_drift_replay" -> topicDriftOracle,
    "ann_bruteforce_topk" -> bruteForceOracle,
    "ann_matryoshka_topk" -> matryoshkaOracle,
    // the five greedy picks unrolled as argmax stages over the same
    // round-6 shortlist/pairwise cosines; 0.7/0.3 are written literals
    // on both sides (the engine never computes 1-lambda — in doubles
    // that is NOT 0.3)
    "retrieval_mmr_diverse" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings),
        |sl AS (
        |  SELECT c.vec_id AS doc_id, c.v, c.nrm,
        |    round(list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
        |      / (q.nrm * c.nrm), 6) AS rel
        |  FROM e q JOIN e c ON q.vec_id = 0 AND c.vec_id <> 0
        |  ORDER BY rel DESC, doc_id LIMIT 20),
        |sim AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
        |      / (a.nrm * b.nrm), 6) AS s
        |  FROM sl a JOIN sl b ON a.doc_id <> b.doc_id),
        |p1 AS (SELECT doc_id, rel, round(0.7 * rel * 1e6) / 1e6 AS mmr6
        |       FROM sl ORDER BY mmr6 DESC, doc_id LIMIT 1),
        |k1 AS (SELECT doc_id FROM p1),
        |p2 AS (SELECT d.doc_id, d.rel,
        |         round((0.7 * d.rel - 0.3 * max(s.s)) * 1e6) / 1e6 AS mmr6
        |       FROM sl d JOIN sim s ON s.a_id = d.doc_id
        |         AND s.b_id IN (SELECT doc_id FROM k1)
        |       WHERE d.doc_id NOT IN (SELECT doc_id FROM k1)
        |       GROUP BY d.doc_id, d.rel ORDER BY mmr6 DESC, d.doc_id LIMIT 1),
        |k2 AS (SELECT doc_id FROM k1 UNION ALL SELECT doc_id FROM p2),
        |p3 AS (SELECT d.doc_id, d.rel,
        |         round((0.7 * d.rel - 0.3 * max(s.s)) * 1e6) / 1e6 AS mmr6
        |       FROM sl d JOIN sim s ON s.a_id = d.doc_id
        |         AND s.b_id IN (SELECT doc_id FROM k2)
        |       WHERE d.doc_id NOT IN (SELECT doc_id FROM k2)
        |       GROUP BY d.doc_id, d.rel ORDER BY mmr6 DESC, d.doc_id LIMIT 1),
        |k3 AS (SELECT doc_id FROM k2 UNION ALL SELECT doc_id FROM p3),
        |p4 AS (SELECT d.doc_id, d.rel,
        |         round((0.7 * d.rel - 0.3 * max(s.s)) * 1e6) / 1e6 AS mmr6
        |       FROM sl d JOIN sim s ON s.a_id = d.doc_id
        |         AND s.b_id IN (SELECT doc_id FROM k3)
        |       WHERE d.doc_id NOT IN (SELECT doc_id FROM k3)
        |       GROUP BY d.doc_id, d.rel ORDER BY mmr6 DESC, d.doc_id LIMIT 1),
        |k4 AS (SELECT doc_id FROM k3 UNION ALL SELECT doc_id FROM p4),
        |p5 AS (SELECT d.doc_id, d.rel,
        |         round((0.7 * d.rel - 0.3 * max(s.s)) * 1e6) / 1e6 AS mmr6
        |       FROM sl d JOIN sim s ON s.a_id = d.doc_id
        |         AND s.b_id IN (SELECT doc_id FROM k4)
        |       WHERE d.doc_id NOT IN (SELECT doc_id FROM k4)
        |       GROUP BY d.doc_id, d.rel ORDER BY mmr6 DESC, d.doc_id LIMIT 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS INTEGER) AS pick_rank, doc_id, rel, mmr6 FROM p1
        |  UNION ALL SELECT CAST(2 AS INTEGER), doc_id, rel, mmr6 FROM p2
        |  UNION ALL SELECT CAST(3 AS INTEGER), doc_id, rel, mmr6 FROM p3
        |  UNION ALL SELECT CAST(4 AS INTEGER), doc_id, rel, mmr6 FROM p4
        |  UNION ALL SELECT CAST(5 AS INTEGER), doc_id, rel, mmr6 FROM p5)
        |ORDER BY pick_rank""".stripMargin,
    "decontaminate_semantic" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings),
        |ev AS (SELECT * FROM e WHERE vec_id % 10 = 0),
        |co AS (SELECT * FROM e WHERE vec_id % 10 <> 0)
        |SELECT co.vec_id,
        |  max(round(list_sum([co.v[i] * ev.v[i] for i in range(1, len(co.v) + 1)])
        |    / (co.nrm * ev.nrm), 6)) AS max_eval_cosine,
        |  max(round(list_sum([co.v[i] * ev.v[i] for i in range(1, len(co.v) + 1)])
        |    / (co.nrm * ev.nrm), 6)) >= 0.35 AS flagged
        |FROM co JOIN ev ON true
        |GROUP BY co.vec_id ORDER BY co.vec_id""".stripMargin,
    "ann_ivf_drift_report" -> driftFractionOracle,
    "ann_pq_drift_report" -> driftFractionOracle,
    // lifecycle literals (the classifier_persisted pattern): the engine
    // derives each verdict from a real lease-fenced maintenance attempt;
    // the oracle pins the required concurrency fixed point
    "index_writer_fencing" ->
      """SELECT * FROM (VALUES
        |  ('expired_lease_taken_over', TRUE),
        |  ('initializing_lease_held_not_usurped', TRUE),
        |  ('live_lease_refuses_naming_holder', TRUE),
        |  ('refusal_leaves_artifact_untouched', TRUE),
        |  ('takeover_releases_lease', TRUE))
        |  AS t(fence_check, ok)
        |ORDER BY fence_check""".stripMargin,
    // the refreshed quantizer at full probe is brute force exactly
    "ann_ivf_drift_refit" -> fullRecallOracle,
    // the refreshed codebook at the serving operating point is brute
    // force exactly (ADC top-256 shortlist -> exact re-rank)
    "ann_pq_drift_refit" -> fullRecallOracle,
    "ann_pq_recall" -> fullRecallOracle,
    "ann_ivfpq_recall" -> fullRecallOracle,
    "ann_pq_persisted" ->
      """SELECT CAST(0 AS BIGINT) AS missing_from_file,
        |  CAST(0 AS BIGINT) AS extra_in_file, TRUE AS parity""".stripMargin,
    "ann_ivfpq_persisted" ->
      """SELECT CAST(0 AS BIGINT) AS missing_from_file,
        |  CAST(0 AS BIGINT) AS extra_in_file, TRUE AS parity""".stripMargin,
    // parity literals: the durable index must equal the in-session index
    // exactly (both engine-private), so the oracle is the pinned row
    "ann_ivf_persisted" ->
      """SELECT CAST(0 AS BIGINT) AS missing_from_file,
        |  CAST(0 AS BIGINT) AS extra_in_file, TRUE AS parity""".stripMargin,
    // append-then-serve must equal assign-everything under the frozen
    // centroids — the same pinned parity row
    "ann_ivf_appended" ->
      """SELECT CAST(0 AS BIGINT) AS missing_from_file,
        |  CAST(0 AS BIGINT) AS extra_in_file, TRUE AS parity""".stripMargin,
    // excise-then-serve must equal assign-only-survivors under the
    // frozen centroids — the same pinned parity row
    "ann_ivf_excised" ->
      """SELECT CAST(0 AS BIGINT) AS missing_from_file,
        |  CAST(0 AS BIGINT) AS extra_in_file, TRUE AS parity""".stripMargin,
    // append-then-serve must equal encode-everything under the frozen
    // codebook — the same pinned parity row
    "ann_pq_appended" ->
      """SELECT CAST(0 AS BIGINT) AS missing_from_file,
        |  CAST(0 AS BIGINT) AS extra_in_file, TRUE AS parity""".stripMargin,
    // excise-then-serve must equal encode-only-survivors under the
    // frozen codebook — the same pinned parity row
    "ann_pq_excised" ->
      """SELECT CAST(0 AS BIGINT) AS missing_from_file,
        |  CAST(0 AS BIGINT) AS extra_in_file, TRUE AS parity""".stripMargin,
    // streamed admit-and-fold must equal assign-everything under the
    // frozen centroids — the same pinned parity row
    "streaming_index_fold_replay" ->
      """SELECT CAST(0 AS BIGINT) AS missing_from_file,
        |  CAST(0 AS BIGINT) AS extra_in_file, TRUE AS parity""".stripMargin,
    "ann_topk_native" -> bruteForceOracle,
    "ann_filtered_topk" -> filteredBruteForceOracle,
    "ann_ivf_filtered_recall" -> filteredFullRecallOracle,
    "ann_ivfpq_filtered_recall" -> filteredFullRecallOracle,
    "ann_lsh_filtered_recall" -> filteredFullRecallOracle,
    // per-query label exclusion in the join condition, then the same
    // rank-and-cut as the brute-force oracle
    "ann_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label AS c_label,
        |    round(list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
        |      / (q.nrm * c.nrm), 6) AS cosine
        |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
        |    AND c.label <> q.label),
        |ranked AS (
        |  SELECT q_id, c_id, c_label, cosine,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, c_id, c_label, rank, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    // exact-vs-exact join: structurally the Spark query with the LSH side
    // replaced by the exact formulation — so the hash matches iff the LSH
    // path achieves FULL recall on this data (seed-pinned, deterministic)
    "ann_lsh_recall" -> fullRecallOracle,
    "ann_ivf_recall" -> fullRecallOracle,
    "embedding_norm_stats" ->
      """WITH e AS (
        |  SELECT vec_id, vec_id % 8 AS shard,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings)
        |SELECT shard, count(*) AS n_vectors,
        |  CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
        |  round(min(nrm), 6) AS min_norm,
        |  round(max(nrm), 6) AS max_norm,
        |  round(avg(nrm), 6) AS avg_norm
        |FROM e GROUP BY shard ORDER BY shard""".stripMargin,
    // independent re-derivation of the int8 quantizer: scale = max|x|/127
    // (1.0 for zero vectors), codes round(x/scale), reconstruction q*scale
    "embedding_quantize_stats" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
        |         ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END AS qscale
        |  FROM e),
        |qt AS (
        |  SELECT vec_id, v, qscale,
        |    list_transform(v, x -> round(x / qscale)) AS qv
        |  FROM s),
        |m AS (
        |  SELECT vec_id % 8 AS shard, qscale,
        |    sqrt(list_sum([(v[i] - qv[i] * qscale) * (v[i] - qv[i] * qscale)
        |      for i in range(1, len(v) + 1)])) AS err,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        |    len(list_filter(qv, x -> abs(x) = 127)) AS n_sat,
        |    sqrt(CAST(len(v) AS DOUBLE)) * qscale / 2 + 1e-9 AS bound
        |  FROM qt)
        |SELECT shard, count(*) AS n_vectors,
        |  CAST(sum(n_sat) AS BIGINT) AS n_saturated,
        |  round(avg(CASE WHEN nrm = 0 THEN 0.0 ELSE err / nrm END), 6) AS avg_rel_err,
        |  round(max(CASE WHEN nrm = 0 THEN 0.0 ELSE err / nrm END), 6) AS max_rel_err,
        |  bool_and(err <= bound) AS within_bound
        |FROM m GROUP BY shard ORDER BY shard""".stripMargin,
    // same quantize -> dequantize -> rank pipeline as the Spark side —
    // deterministic, so the quantized ranking is hash-checked exactly
    "ann_quantized_topk" ->
      """WITH e0 AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
        |         ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END AS qscale
        |  FROM e0),
        |e AS (
        |  SELECT vec_id,
        |    list_transform(v, x -> round(x / qscale) * qscale) AS dv
        |  FROM s),
        |n AS (
        |  SELECT vec_id, dv,
        |    sqrt(list_sum(list_transform(dv, x -> x * x))) AS nrm
        |  FROM e),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    round(list_sum([q.dv[i] * c.dv[i] for i in range(1, len(q.dv) + 1)])
        |      / (q.nrm * c.nrm), 6) AS cosine
        |  FROM n q JOIN n c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT q_id, c_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, c_id, rank, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)
}
