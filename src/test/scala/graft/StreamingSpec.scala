package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** Structured Streaming operators driven synchronously against the events
  * parquet via memory sinks. */
class StreamingSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("windowed counts with watermark match the batch equivalent") {
    val stream = StreamingOps.windowedCounts(StreamingOps.readEventsStream(spark, dir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("win_counts").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val got = spark.table("win_counts")
      .agg(sum("n")).collect()(0).getLong(0)
    // append mode only emits windows closed by the watermark; the final
    // (unclosed) windows stay in state, so emitted <= total
    val total = Tables.load(spark, dir, "events").count()
    assert(got > 0 && got <= total)

    val batch = Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val batchByKey = batch.select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    // every emitted streaming row agrees with the batch computation
    spark.table("win_counts").collect().foreach { r =>
      val key = (r.get(0).toString, r.getString(1))
      assert(batchByKey(key) == r.getLong(2), s"window $key")
    }
  }

  test("streaming session windows agree with batch session_window") {
    val stream = StreamingOps.sessionAgg(StreamingOps.readEventsStream(spark, dir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("sess").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val batch = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.get(1).toString) -> r.getLong(2)).toMap
    val emitted = spark.table("sess").collect()
    assert(emitted.nonEmpty)
    emitted.foreach { r =>
      val key = (r.getLong(0), r.get(1).toString)
      assert(batch(key) == r.getLong(2), s"session $key")
    }
  }

  test("streaming dedup drops nothing on already-unique ids; keeps all rows") {
    val stream = StreamingOps.dedupEvents(StreamingOps.readEventsStream(spark, dir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    try { q.processAllAvailable() } finally { q.stop() }
    assert(spark.table("dedup").count() ==
      Tables.load(spark, dir, "events").count())
    assert(spark.table("dedup").select("event_id").distinct().count() ==
      spark.table("dedup").count())
  }

  test("streaming ingest dedup emits exactly the content new to corpus+stream") {
    // corpus = docs with doc_id % 3 != 0; the stream delivers the rest in
    // two micro-batches, polluted with 5 re-sent corpus docs (already
    // known -> dropped) and 3 new docs delivered twice (emitted once)
    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val newDocs = docs.filter(col("doc_id") % 3 === 0)
    val src = java.nio.file.Paths.get("target/stream-src-ingest")
    org.apache.commons.io.FileUtils.deleteQuietly(src.toFile)
    newDocs.unionByName(corpus.orderBy("doc_id").limit(5))
      .coalesce(1).write.parquet(src.toString)
    newDocs.orderBy("doc_id").limit(3)
      .coalesce(1).write.mode("append").parquet(src.toString)

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val out = StreamingOps.ingestDedupStream(stream, corpus, "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ingest_dedup").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val got = spark.table("ingest_dedup")
    // exactly one row per distinct new text, and nothing from the corpus
    assert(got.count() === got.select("text").distinct().count())
    assert(got.count() === newDocs.select("text").distinct().count())
    assert(got.join(corpus.select("text"), Seq("text"), "left_semi").count() === 0L)
    // and the batch operator over the same polluted input agrees
    val batchPolluted = newDocs
      .unionByName(corpus.orderBy("doc_id").limit(5))
      .unionByName(newDocs.orderBy("doc_id").limit(3))
      .dropDuplicates("text")
    val batch = graft.operators.Dedup.incrementalNew(batchPolluted, corpus, "text")
    assert(got.select("text").except(batch.select("text")).count() === 0L)
    assert(batch.select("text").except(got.select("text")).count() === 0L)
  }

  test("streaming near-dup ingest drops corpus near-copies and equals the batch band formulation") {
    // corpus = docs %3 != 0; the stream delivers (a) the %3 == 0 docs and
    // (b) 5 corpus docs with their LAST TOKEN replaced — different text
    // (invisible to exact dedup) but jaccard >> 0.6 vs their originals,
    // so the minhash-band anti joins must drop exactly those plus any
    // %3==0 doc that is a genuine near-dup of a corpus doc
    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val fresh = docs.filter(col("doc_id") % 3 === 0)
    val nearCopies = corpus.orderBy("doc_id").limit(5)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(
        expr("array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ')"),
        lit(" zzzmutant")))
    val src = java.nio.file.Paths.get("target/stream-src-neardup")
    org.apache.commons.io.FileUtils.deleteQuietly(src.toFile)
    fresh.coalesce(1).write.parquet(src.toString)
    nearCopies.coalesce(1).write.mode("append").parquet(src.toString)

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val out = StreamingOps.ingestNearDupStream(stream, corpus, "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ingest_neardup").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("ingest_neardup")

    // every planted near-copy is gone, and nothing corpus-identical leaks
    assert(got.join(nearCopies.select("text"), Seq("text"), "left_semi").count() === 0L)
    assert(got.join(corpus.select("text"), Seq("text"), "left_semi").count() === 0L)
    assert(got.count() > 0L, "near-dup stage dropped everything")

    // batch twin through the INDEPENDENT explode/groupBy band path:
    // exact-new docs minus those with a cross-side (corpus x stream)
    // verified pair at the same banding (4 tables, seed 42, dist <= 0.4)
    val streamInput = fresh.unionByName(nearCopies)
    val exactNew = graft.operators.Dedup.incrementalNew(
      streamInput.dropDuplicates("text"), corpus, "text")
    val offset = 1000000L
    val u = corpus.select(col("doc_id"), col("text")).unionByName(
      exactNew.select((col("doc_id") + offset).as("doc_id"), col("text")))
    val cross = graft.operators.Dedup.minhashPairs(u, "doc_id", "text",
        maxJaccardDistance = 0.4)
      .filter((col("doc_id_1") < offset && col("doc_id_2") >= offset) ||
        (col("doc_id_1") >= offset && col("doc_id_2") < offset))
      .select((when(col("doc_id_1") >= offset, col("doc_id_1"))
        .otherwise(col("doc_id_2")) - offset).as("doc_id"))
    val expected = exactNew.join(cross, Seq("doc_id"), "left_anti")
    assert(got.select("text").except(expected.select("text")).count() === 0L)
    assert(expected.select("text").except(got.select("text")).count() === 0L)
  }

  test("near-dup ingest null-text parity: a null payload survives every anti join") {
    // a null text has no content to be a near-duplicate OF: shingling a
    // null token array yields null signatures, every band-join condition
    // evaluates to null, and the row passes all anti joins — the
    // documented semantics (StreamingOps.ingestNearDupStreamWith
    // scaladoc), matching the batch side where Dedup.incrementalNew
    // keeps null-text rows as new and minhash signatures exclude them.
    // Pinned so a refactor that silently drops (or NPEs on) a null
    // payload turns this red.
    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    import spark.implicits._
    val nullRow = Seq((999999L, Option.empty[String])).toDF("doc_id", "text")
    val src = java.nio.file.Paths.get("target/stream-src-nulltext")
    org.apache.commons.io.FileUtils.deleteQuietly(src.toFile)
    nullRow.coalesce(1).write.parquet(src.toString)
    val stream = spark.readStream.schema(nullRow.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val out = StreamingOps.ingestNearDupStream(stream, corpus, "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ingest_nulltext").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("ingest_nulltext")
    assert(got.count() === 1L, "the null-text arrival must survive ingest")
    assert(got.filter(col("text").isNull).count() === 1L)
    // batch twin: incrementalNew keeps the null-text row as new too
    val batch = graft.operators.Dedup.incrementalNew(nullRow, corpus, "text")
    assert(batch.count() === 1L && batch.head().isNullAt(1))
  }

  test("stream-static broadcast join enriches events with customer segment") {
    val events = StreamingOps.readEventsStream(spark, dir)
    val customer = Tables.load(spark, dir, "customer")
    val stream = StreamingOps.enrichWithCustomer(events, customer)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("enriched")
    assert(got.count() == Tables.load(spark, dir, "events").count())
    // matched rows carry a segment; the join is left so nothing is dropped
    assert(got.filter(col("c_mktsegment").isNotNull).count() > 0)
  }

  test("stream-stream interval join equals the batch join") {
    val stream = StreamingOps.purchasesAfterSignup(StreamingOps.readEventsStream(spark, dir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val ev = Tables.load(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val batch = purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 2 HOURS"))
      .select(col("user_id"), col("p_ts"), col("s_ts"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString)).toSet

    val got = spark.table("ssjoin")
      .select("user_id", "p_ts", "s_ts")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString)).toSet
    assert(got.nonEmpty && got == batch)
  }

  test("stream-stream LEFT OUTER interval join emits unmatched purchases with null signup") {
    val stream = StreamingOps.purchasesWithOptionalSignup(
      StreamingOps.readEventsStream(spark, dir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("ssleft").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("ssleft").collect()
      .map(r => (r.getLong(0), r.get(1).toString,
        Option(r.get(2)).map(_.toString), r.getDouble(3))).toSet

    // batch truth: purchases left-joined to preceding signups within 2h
    val ev = Tables.load(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val batch = p.join(s,
        col("user_id") === col("s_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 2 HOURS"), "left_outer")
      .select(col("user_id"), col("p_ts"), col("s_ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.get(1).toString,
        Option(r.get(2)).map(_.toString), r.getDouble(3))).toSet

    // the stream may hold back outer rows whose no-match proof needs a
    // watermark advance past end-of-data; everything EMITTED must agree,
    // matched rows must all be present, and some outer (null) row exists
    assert(got.subsetOf(batch))
    assert(batch.filter(_._3.isDefined).subsetOf(got), "matched rows missing")
    assert(got.exists(_._3.isEmpty), "no unmatched purchase emitted")
  }

  test("checkpointed windowed agg recovers across restart with no re-emission") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val events = Tables.load(spark, dir, "events")
    val cut = events.selectExpr("percentile(cast(ts as double), 0.5)").head().getDouble(0)
    val base = Paths.get("target/stream-restart")
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    val watch = base.resolve("src"); Files.createDirectories(watch)
    val ckpt = base.resolve("ckpt").toString

    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = base.resolve(s"tmp_$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.move(p, watch.resolve(name), StandardCopyOption.REPLACE_EXISTING)
          moved = true
        }
      }
      assert(moved, s"no parquet part written for $name")
    }

    // the memory sink can't recover from a checkpoint; the FILE sink is the
    // fault-tolerant one — each phase appends parquet, and the output dir
    // is the cross-restart record
    val out = base.resolve("out").toString
    def run(): Array[org.apache.spark.sql.Row] = {
      val stream = spark.readStream.schema(events.schema).parquet(watch.toString)
      val q = StreamingOps.windowedCounts(stream)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(out).collect()
    }

    // phase 1: the early half of the data; stop the query afterwards
    stage(events.filter(col("ts").cast("double") <= cut), "part1.parquet")
    val p1 = run()
    // phase 2: late half arrives while the query is DOWN; restart from the
    // checkpoint — the source log must skip part1, state must resume
    stage(events.filter(col("ts").cast("double") > cut), "part2.parquet")
    val all = run()

    assert(p1.nonEmpty && all.length > p1.length, "restart emitted nothing new")
    def keys(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.get(0).toString, r.getString(1)))
    // exactly-once across the restart: no window emitted twice in total
    assert(keys(all).distinct.length == all.length, "window re-emitted after restart")
    // every emitted row agrees with the batch computation over ALL data
    // (the time-ordered split means an emitted window saw its full input)
    val batch = events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    all.foreach { r =>
      val k = (r.get(0).toString, r.getString(1))
      assert(batch(k) == r.getLong(2), s"window $k disagrees with batch")
    }
  }

  test("ingest dedup recovers its fingerprint state across restart") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val newDocs = docs.filter(col("doc_id") % 3 === 0)
    val base = Paths.get("target/stream-restart-ingest")
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    val watch = base.resolve("src"); Files.createDirectories(watch)
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString

    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = base.resolve(s"tmp_$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.move(p, watch.resolve(name), StandardCopyOption.REPLACE_EXISTING)
          moved = true
        }
      }
      assert(moved, s"no parquet part written for $name")
    }

    def run(): Array[org.apache.spark.sql.Row] = {
      val stream = spark.readStream.schema(docs.schema).parquet(watch.toString)
      val q = StreamingOps.ingestDedupStream(stream, corpus, "text")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(out).collect()
    }

    // phase 1: half the new docs; stop the query
    stage(newDocs.filter(col("doc_id") % 2 === 0), "part1.parquet")
    val p1 = run()
    // phase 2 arrives while the query is DOWN and RE-DELIVERS all of
    // phase 1 plus the other half — the restored fingerprint state must
    // drop every re-delivery, emit only the genuinely new half
    stage(newDocs, "part2.parquet")
    val all = run()

    assert(p1.nonEmpty && all.length > p1.length, "restart emitted nothing new")
    // exactly-once across the restart: one row per distinct text overall
    val texts = all.map(_.getAs[String]("text"))
    assert(texts.distinct.length === texts.length,
      "a re-delivered document was emitted twice after restart")
    assert(texts.toSet === newDocs.select("text").collect().map(_.getString(0)).toSet)
  }

  test("flatMapGroupsWithState keeps running per-user totals") {
    val stream = StreamingOps.runningUserTotals(spark,
      StreamingOps.readEventsStream(spark, dir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("running").start()
    try { q.processAllAvailable() } finally { q.stop() }

    // last emitted row per user equals the batch total
    val lastPerUser = spark.table("running")
      .groupBy("user_id").agg(max(struct(col("n_events"), col("total_value"))).as("m"))
      .select(col("user_id"), col("m.n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchCounts = Tables.load(spark, dir, "events")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lastPerUser == batchCounts)
  }

  test("streaming drift monitor converges to the batch snapshot report") {
    // stream the %5==0 "new crawl" slice against the %5!=0 reference —
    // the exact slices of the batch corpus_drift_report — and the final
    // per-feature rows must EQUAL the batch report (same integer
    // numerators, same single division, same rounding)
    val docs = Tables.load(spark, dir, "documents")
    val ref = StreamingOps.driftReferenceCounts(
      docs.filter(col("doc_id") % 5 =!= 0))
    val stream = StreamingOps.readTableStream(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
    val out = StreamingOps.driftMonitorStream(spark, stream, ref)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("drift_mon").start()
    try { q.processAllAvailable() } finally { q.stop() }

    // single staged file -> one micro-batch -> exactly one row per feature
    val got = spark.table("drift_mon").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.size == 3, s"expected one row per feature, got $got")
    val want = graft.queries.TextQueries
      .queries("corpus_drift_report")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got == want, s"stream $got vs batch $want")
  }

  test("streaming topic-drift monitor converges to the batch topic report") {
    // the embedding-space twin of the lexical convergence pin: the
    // %5==0 vectors streamed through the monitor under the SAME frozen
    // seeded quantizer and %5!=0 reference histogram must end at the
    // batch topic_drift_report row exactly (same integer numerators,
    // one division, shared rounding) — the replay query's final
    // emission IS that comparison, so pin the two driver rows equal
    val batch = graft.queries.SimilarityQueries
      .queries("topic_drift_report")(spark, dir).collect()
    val replay = graft.queries.SimilarityQueries
      .queries("streaming_topic_drift_replay")(spark, dir).collect()
    assert(batch.length === 1 && replay.length === 1)
    val (b, s) = (batch(0), replay(0))
    Seq("n_cells", "n_ref", "n_new").foreach(c =>
      assert(b.getLong(b.fieldIndex(c)) === s.getLong(s.fieldIndex(c)), c))
    Seq("tv_dist", "max_gap").foreach(c =>
      assert(b.getDouble(b.fieldIndex(c)) === s.getDouble(s.fieldIndex(c)), c))
    // non-degenerate: the fixture's new slice actually moved the mix
    assert(s.getLong(s.fieldIndex("n_new")) > 0L)
  }

  test("drift monitor carries its histogram state across micro-batches") {
    // two files -> two triggers: the update stream must emit a row per
    // feature per trigger, n_new strictly growing, and the LAST rows must
    // equal the one-shot result over the union — i.e. the state really
    // accumulates instead of resetting per batch
    val docs = Tables.load(spark, dir, "documents")
    val ref = StreamingOps.driftReferenceCounts(
      docs.filter(col("doc_id") % 5 =!= 0))
    val staged = java.nio.file.Files.createTempDirectory("drift2").toString
    docs.filter(col("doc_id") % 10 === 0).coalesce(1)
      .write.parquet(s"$staged/a")
    docs.filter(col("doc_id") % 10 === 5).coalesce(1)
      .write.parquet(s"$staged/b")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(staged)
    val out = StreamingOps.driftMonitorStream(spark, stream, ref)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("drift_mon2").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val rows = spark.table("drift_mon2").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 6, s"expected 3 features x 2 triggers: ${rows.toSeq}")
    val lastPerFeature = rows.groupBy(_._1)
      .map { case (f, rs) => f -> rs.maxBy(_._2) }
    rows.groupBy(_._1).foreach { case (f, rs) =>
      val ns = rs.map(_._2).sorted
      assert(ns.distinct.length == 2 && ns(0) < ns(1),
        s"$f: n_new must strictly grow across triggers: ${ns.toSeq}")
    }
    // one-shot truth over the union slice (%5==0 == %10 in {0,5})
    val batchGot = graft.queries.TextQueries
      .queries("corpus_drift_report")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getDouble(4))).toMap
    lastPerFeature.foreach { case (f, (_, n, tv)) =>
      assert((n, tv) == batchGot(f),
        s"$f: final streamed row ($n, $tv) != batch ${batchGot(f)}")
    }
  }

  test("streaming KMV sketch equals the batch sketch (mergeable state)") {
    import graft.functions.KmvSketch.kmv_sketch
    // the sketch is a TypedImperativeAggregate, so it runs as streaming
    // state: partial buffers per micro-batch merged into the store — the
    // same merge path the batch shuffle uses, so results are identical
    val stream = StreamingOps.readEventsStream(spark, dir)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .groupBy("event_type").agg(kmv_sketch(col("h"), 64).as("s"))
      .select(col("event_type"), col("s.kth_hash"), col("s.n_kept"), col("s.est_distinct"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("kmv_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val got = spark.table("kmv_stream").collect()
      .map(r => (r.getString(0), (r.getString(1), r.getInt(2), r.getDouble(3)))).toMap
    val batch = Tables.load(spark, dir, "events")
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .groupBy("event_type").agg(kmv_sketch(col("h"), 64).as("s"))
      .select(col("event_type"), col("s.kth_hash"), col("s.n_kept"), col("s.est_distinct"))
      .collect().map(r => (r.getString(0), (r.getString(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got == batch)
  }

  test("streaming quality gate keeps exactly the batch chain's keep set") {
    val docs = Tables.load(spark, dir, "documents")
    val stream = StreamingOps.readTableStream(spark, dir, "documents")
    val gated = StreamingOps.qualityGateStream(stream, "text")
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("quality_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("quality_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // the driver's batch verdict is authoritative: identical keep set
    val batch = graft.queries.TextQueries.queries("corpus_quality_filter")(
      spark, dir).filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === batch, "stream verdict diverged from the batch chain")
    assert(got.nonEmpty && got.size < docs.count(),
      s"fixture degenerate: ${got.size} of ${docs.count()} kept")
  }

  test("streaming classifier gate keeps exactly the batch filter's keep set") {
    val docs = Tables.load(spark, dir, "documents")
    // same frozen model the batch corpus_filter_classifier serves:
    // trained on the %5==0 labeled seed slice
    val model = graft.operators.QualityClassifier.train(
      docs.filter(col("doc_id") % 5 === 0), "text", "lang")
    val stream = StreamingOps.readTableStream(spark, dir, "documents")
    val gated = StreamingOps.classifierGateStream(stream, model, "text")
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("clf_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("clf_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val batch = graft.queries.TextQueries.queries("corpus_filter_classifier")(
      spark, dir).filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === batch, "stream verdict diverged from the batch filter")
    assert(got.nonEmpty && got.size < docs.count(),
      s"fixture degenerate: ${got.size} of ${docs.count()} kept")
  }

  test("windowed streaming KMV distinct users equals the batch per-window sketch") {
    import graft.functions.KmvSketch.kmv_sketch
    // tumbling event-time windows x event_type with the custom
    // TypedImperativeAggregate as the windowed state: per-batch partial
    // buffers merge into each (window, type) group exactly as the batch
    // shuffle merges partials, so the daily distinct-user sketches are
    // identical row-for-row
    def sketched(df: org.apache.spark.sql.DataFrame) = df
      .select(window(col("ts"), "1 day").as("w"), col("event_type"),
        md5(col("user_id").cast("string")).as("h"))
      .groupBy("w", "event_type")
      .agg(kmv_sketch(col("h"), 64).as("s"))
      .select(col("w.start").as("day"), col("event_type"),
        col("s.kth_hash"), col("s.n_kept"), col("s.est_distinct"))
    val q = sketched(StreamingOps.readEventsStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("kmv_win_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getTimestamp(0), r.getString(1)) ->
        (r.getString(2), r.getInt(3), r.getDouble(4))).toMap
    val got = keyed(spark.table("kmv_win_stream").collect())
    val batch = keyed(sketched(Tables.load(spark, dir, "events")).collect())
    assert(got === batch, "windowed stream sketches diverged from batch")
    assert(got.size > 5, s"fixture degenerate: ${got.size} (day, type) groups")
  }

  test("streaming blocklist gate keeps exactly the batch filter's keep set") {
    val docs = Tables.load(spark, dir, "documents")
    val stream = StreamingOps.readTableStream(spark, dir, "documents")
    val gated = StreamingOps.blocklistGateStream(stream, "text",
      blockedTokens = Seq("dup"), blockedPhrases = Seq("slow scan"))
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("blocklist_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("blocklist_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val batch = graft.queries.TextQueries.queries("blocklist_filter")(
      spark, dir).filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === batch, "stream verdict diverged from the batch blocklist")
    assert(got.nonEmpty && got.size < docs.count(),
      s"fixture degenerate: ${got.size} of ${docs.count()} kept")
  }

  test("streaming semantic decontamination gate keeps the batch unflagged set") {
    val emb = Tables.load(spark, dir, "embeddings")
    val evalSet = emb.filter(col("vec_id") % 10 === 0)
    val stream = StreamingOps.readTableStream(spark, dir, "embeddings")
      .filter(col("vec_id") % 10 =!= 0)
    val gated = StreamingOps.semanticDecontaminationGateStream(
      stream, "embedding", evalSet, "embedding", minCosine = 0.35)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("decon_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("decon_stream").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val batch = graft.queries.SimilarityQueries.queries("decontaminate_semantic")(
      spark, dir).filter(!col("flagged")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === batch, "stream survivors diverged from the batch report")
    val corpus = emb.filter(col("vec_id") % 10 =!= 0).count()
    assert(got.nonEmpty && got.size < corpus,
      s"fixture degenerate: ${got.size} of $corpus kept")
  }

  test("streaming snapshot-diff classifies arrivals exactly like the batch diff") {
    import graft.streaming.StreamingOps
    // the driver row's derived versions: v1 = %7!=0 reference; v2 =
    // %5!=0 arrivals with the %3==0 slice revised — streamed against the
    // frozen v1, the arrival classes must equal the batch diff minus its
    // 'removed' rows (unobservable at ingest by construction)
    val docs = Tables.load(spark, dir, "documents")
    val v1 = docs.filter(col("doc_id") % 7 =!= 0)
    def revise(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
    val stream = revise(StreamingOps.readTableStream(spark, dir, "documents"))
    val classified = StreamingOps.snapshotDiffStream(stream, v1, "doc_id", "text")
    val q = classified.writeStream.outputMode("append")
      .format("memory").queryName("snapdiff_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("snapdiff_stream")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = graft.operators.Versioning
      .snapshotDiff(v1, revise(docs), "doc_id", "text")
      .filter(col("change") =!= "removed")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === batch, "stream arrival classes diverged from the batch diff")
    assert(Set("added", "modified", "unchanged").subsetOf(got.values.toSet),
      s"fixture degenerate: classes seen = ${got.values.toSet}")
  }

  test("streaming space_saving heavy hitters keep their guarantees across micro-batches") {
    import graft.functions.SpaceSaving.space_saving
    import spark.implicits._
    // zipf-ish stream delivered in TWO micro-batches — the aggregate's
    // merge path runs under incremental (complete-mode) execution, where
    // partial states from earlier batches merge with each trigger's. The
    // deterministic guarantees must survive that ordering: every item
    // above n/k tracked, no undercounts, overcount <= declared max_err
    // <= n/k. (Estimates themselves may differ from the one-pass batch
    // values — SpaceSaving is order-sensitive by design — which is why
    // the BOUNDS are the contract, as in SketchErrorSpec.)
    val rows = (0 until 60).flatMap(i => Seq.fill(3000 / (i + 1))(s"term_$i"))
    val (first, second) = rows.splitAt(rows.size / 2)
    val src = java.nio.file.Paths.get("target/stream-src-hh")
    org.apache.commons.io.FileUtils.deleteQuietly(src.toFile)
    first.toDF("term").coalesce(1).write.parquet(src.toString)
    second.toDF("term").coalesce(1).write.mode("append").parquet(src.toString)
    val k = 24
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
      .agg(space_saving(col("term"), k).as("hh"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("hh_stream")
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.count_est"), col("e.max_err"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val bound = n / k
    exact.filter(_._2 > bound).keys.foreach { item =>
      assert(got.contains(item), s"$item (freq ${exact(item)} > $bound) missing")
    }
    got.foreach { case (item, (est, err)) =>
      val t = exact.getOrElse(item, 0L)
      assert(est >= t, s"$item undercounted: $est < $t")
      assert(est - t <= err, s"$item overcount ${est - t} exceeds declared $err")
      assert(err <= bound, s"$item declared err $err exceeds n/k = $bound")
    }
  }

  test("streaming stratified sample equals the batch sample (stateless filter)") {
    import graft.operators.Sampling
    val sampled = Sampling.stratifiedSample(
      StreamingOps.readEventsStream(spark, dir).select("event_id", "event_type"),
      "event_id", "event_type", Map("view" -> 0.25), defaultRate = 0.75)
    val q = sampled.writeStream.outputMode("append")
      .format("memory").queryName("samp_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val got = spark.table("samp_stream").select("event_id")
      .collect().map(_.getLong(0)).toSet
    val batch = Sampling.stratifiedSample(
      Tables.load(spark, dir, "events").select("event_id", "event_type"),
      "event_id", "event_type", Map("view" -> 0.25), defaultRate = 0.75)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == batch && got.nonEmpty)
  }

  test("streaming chunk-overlap gate drops prefix-edited revisions and equals the batch report") {
    import graft.operators.{CdcChunking, Multimodal}
    // corpus = docs %5 != 0; the stream delivers (a) the fresh %5 == 0
    // docs and (b) 5 PREFIX-EDITED copies of the longest corpus docs —
    // different bytes end to end (invisible to exact dedup, and the edit
    // is at the FRONT, the worst case for fixed-offset chunking), but CDC
    // cuts re-synchronize within maskBits bytes, so the revisions share
    // their suffix chunk hashes with the corpus and must be dropped
    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val fresh = docs.filter(col("doc_id") % 5 === 0)
    val revisions = corpus.orderBy(desc("n_chars"), col("doc_id")).limit(5)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(lit("ENTIRELY NEW PREAMBLE BOLTED ON "), col("text")))
    val src = java.nio.file.Paths.get("target/stream-src-chunkoverlap")
    org.apache.commons.io.FileUtils.deleteQuietly(src.toFile)
    fresh.coalesce(1).write.parquet(src.toString)
    revisions.coalesce(1).write.mode("append").parquet(src.toString)

    val corpusChunks = CdcChunking.chunkTable(Multimodal.asMediaTable(corpus))
      .persist()
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val out = StreamingOps.ingestChunkOverlapStream(spark, stream, corpusChunks, "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ingest_chunk_overlap").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("ingest_chunk_overlap")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // batch twin: the dedup_ingest_chunk_overlap report over the same
    // arrivals vs the same corpus chunk table — keep sets must be EQUAL
    val streamInput = fresh.unionByName(revisions)
    val report = CdcChunking.corpusOverlapReport(
      CdcChunking.chunkTable(Multimodal.asMediaTable(streamInput)), corpusChunks)
    val expected = report.filter(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    corpusChunks.unpersist()
    assert(got == expected, "streamed keep set != batch report keep set")
    // the gate did real work: most planted revisions share >= 2 suffix
    // chunks with their originals and are gone; fresh docs survive
    val revIds = revisions.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((revIds -- got).size >= 3, s"revisions kept: ${revIds.intersect(got)}")
    assert(got.exists(_ < 100000), "gate dropped every fresh doc")
  }

  test("stageOrdered pins delivery order even when writes land in one mtime tick") {
    // Three deliveries of the SAME content under different doc_ids,
    // written back-to-back (well inside one second — the tie case that
    // made replay order depend on unspecified listing order). The staged
    // files must carry strictly increasing mtimes, and a first-wins
    // keyed dedup over the stream must keep delivery 0's id.
    import spark.implicits._
    val src = new java.io.File("target/test-stage-ordered/" +
      java.util.UUID.randomUUID().toString)
    val parts = Seq(10L, 20L, 30L).map(id =>
      Seq((id, "same payload")).toDF("doc_id", "text"))
    StreamingOps.stageOrdered(src.toString, parts)

    val files = src.listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(files.map(_.getName).toSeq ===
      Seq("delivery-00000.parquet", "delivery-00001.parquet",
        "delivery-00002.parquet"))
    val mtimes = files.map(_.lastModified())
    assert(mtimes.sliding(2).forall(w => w(0) < w(1)),
      s"mtimes not strictly increasing: ${mtimes.toSeq}")
    // and each delivery holds the expected id (naming matches content)
    assert(files.map(f => spark.read.parquet(f.toString)
      .select("doc_id").head().getLong(0)).toSeq === Seq(10L, 20L, 30L))

    val stream = spark.readStream.schema(parts.head.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = stream.dropDuplicates("text")
      .writeStream.outputMode("append")
      .format("memory").queryName("stage_ordered_first_wins").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val kept = spark.table("stage_ordered_first_wins")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(10L),
      s"first-wins dedup must keep delivery 0's id, got $kept")
  }

  test("streaming index fold: restart mid-stream resumes from the checkpoint, " +
      "re-delivery and replayed batches are ledger no-ops, admission drops " +
      "already-served rows") {
    import java.nio.file.{Files, Paths}
    val emb = Tables.load(spark, dir, "embeddings")
    val basePop = emb.filter(col("vec_id") % 5 =!= 0)
    val slice = emb.filter(col("vec_id") % 5 === 0).select("vec_id", "embedding")
    val root = Paths.get("target/stream-fold-restart")
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    Files.createDirectories(root)
    val src = root.resolve("src").toString
    val ckpt = root.resolve("ckpt").toString
    val idxPath = root.resolve("index").toString
    val built = graft.operators.IvfIndex.build(
      basePop, "vec_id", "embedding", nCells = 8)
    try built.write(idxPath, "fold-base") finally built.close()
    val servedIds = basePop.select("vec_id")
    def run(): Unit = {
      val stream = spark.readStream.schema(slice.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamingOps.foldIntoIvf(spark, idxPath, servedIds, batch,
            "vec_id", "embedding")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    val half1 = slice.filter(col("vec_id") % 2 === 0)
    val half2 = slice.filter(col("vec_id") % 2 =!= 0)
    // phase 1: first delivery only; the query STOPS afterwards (the crash)
    StreamingOps.stageOrdered(src, Seq(half1))
    run()
    val rowsAfter1 = spark.read.parquet(s"$idxPath/cells").count()
    assert(rowsAfter1 === basePop.count() + half1.count())
    // phase 2 arrives while the job is down: the second delivery, a
    // VERBATIM re-delivery of the first (new file, same rows — the
    // content tag must swallow it), and a delivery of ONLY already-served
    // rows (admission must empty it); restart resumes from the checkpoint
    // — the source log skips the already-processed file, and even if it
    // REPLAYED it, the ledger would refuse the duplicate fold
    StreamingOps.stageOrdered(root.resolve("stage2").toString,
      Seq(half2, half1, basePop.select("vec_id", "embedding").limit(7)))
    val stamp2 = System.currentTimeMillis() / 1000L * 1000L
    Option(new java.io.File(root.resolve("stage2").toString).listFiles())
      .getOrElse(Array.empty).sortBy(_.getName).zipWithIndex.foreach {
        case (f, i) =>
          val dst = new java.io.File(src, f"delivery-1$i%04d.parquet")
          Files.move(f.toPath, dst.toPath)
          // strictly after phase 1's stamps, one second apart (the
          // stageOrdered delivery-order contract), never in 1970 — the
          // file source age-filters ancient files
          assert(dst.setLastModified(stamp2 + i * 1000L))
      }
    run()
    // every admitted row folded EXACTLY once: base + the full slice
    val idx = graft.operators.IvfIndex.load(spark, idxPath)
    assert(spark.read.parquet(s"$idxPath/cells").count() ===
      basePop.count() + slice.count(),
      "a re-delivered or already-served row leaked into the fold")
    // and the folded index serves exactly assign-everything under the
    // frozen centroids
    val q5 = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val mem = graft.operators.IvfIndex.withCentroids(
      emb, "vec_id", "embedding", idx.centroids)
    assert(rs(idx.topK(q5, k = 5, nprobe = 8)) ===
      rs(mem.topK(q5, k = 5, nprobe = 8)))
    // direct-replay guard: folding an already-folded batch is a no-op
    assert(!StreamingOps.foldIntoIvf(spark, idxPath, servedIds,
      half1, "vec_id", "embedding"))
    // admission-empty guard: a batch of only served rows never touches
    // the ledger or the table
    assert(!StreamingOps.foldIntoIvf(spark, idxPath, servedIds,
      basePop.select("vec_id", "embedding").limit(3), "vec_id", "embedding"))
    // NON-VERBATIM duplicate guard (r18): a re-crawled id arriving in a
    // LATER batch mixed with genuinely new rows — it is in the index
    // (folded by an earlier batch of this run) but NOT in the caller's
    // static servedIds snapshot, and the mixed batch's content tag is
    // new, so neither the snapshot anti-join nor the ledger caught it
    // pre-r18; admission must drop it against the index's own ids while
    // folding the new rows exactly once
    val newRows = slice.limit(2)
      .withColumn("vec_id", col("vec_id") + 9000000L)
    val mixed = slice.limit(3).unionByName(newRows)
    val before = spark.read.parquet(s"$idxPath/cells").count()
    assert(StreamingOps.foldIntoIvf(spark, idxPath, servedIds, mixed,
      "vec_id", "embedding"), "the genuinely new rows must fold")
    assert(spark.read.parquet(s"$idxPath/cells").count() === before + 2,
      "a re-crawled already-folded id duplicated its serving row")
  }

  test("streaming transition monitor pairs across batch boundaries, " +
      "repairs intra-batch disorder, and orders equal-ts ties by event_id") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user 1: a->b inside batch 1, b->c carried ACROSS the boundary
    // (state), c->d inside batch 2 delivered OUT OF ORDER; user 2 appears
    // only in batch 2 with an equal-ts pair ordered by event_id and
    // delivered reversed
    val b1 = Seq((1L, "a", ts(10), 1L), (1L, "b", ts(20), 2L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val b2 = Seq((1L, "d", ts(40), 4L), (1L, "c", ts(30), 3L),
        (2L, "y", ts(35), 6L), (2L, "x", ts(35), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val src = "target/stream-src-trans"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
    StreamingOps.stageOrdered(src, Seq(b1, b2))
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamingOps.transitionMonitorStream(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("trans_stream")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sorted
    assert(got === Seq((1L, "a", "b"), (1L, "b", "c"), (1L, "c", "d"),
      (2L, "x", "y")))
  }

  test("streaming transition matrix over the events table equals the batch lead derivation") {
    // the driver row's shape end to end at spec scale: ts-range batches,
    // per-user carry, distributed count — must equal the batch window
    val got = graft.queries.AnalyticsQueries
      .queries("streaming_transitions_replay")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val batch = graft.queries.AnalyticsQueries
      .queries("event_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === batch,
      "streaming transition matrix diverged from the batch derivation")
    assert(got.size > 1, s"fixture degenerate: ${got.size} transition cells")
  }
}
