package graft.queries

import scala.collection.immutable.ListMap
import scala.concurrent.duration._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The end-to-end RAG SERVING capstone (r18) — the serving twin of
  * `corpus_materialize_full`: one request driven through every retrieval
  * stage a production RAG tier runs, with EVERY stage reading a
  * manifest-reopened durable artifact and ZERO build/train jobs under
  * the operator-counter fence:
  *
  *   1. lexical candidates — BM25 top-20 from the FRESH-reopened
  *      inverted index (term-bucket-pruned serve);
  *   2. dense candidates — exact cosine top-20 for doc 0's embedding
  *      over the FRESH-reopened IVF artifact's cell table, through the
  *      bounded-heap [[graft.plans.CosineTopK]] plan;
  *   3. hybrid fusion — [[graft.operators.Retrieval.rrfFuse]] (k = 60)
  *      to a top-10 shortlist;
  *   4. MMR diversity re-rank — [[graft.operators.Retrieval.mmrRerank]]
  *      (0.7 relevance / 0.3 redundancy, rel = round-6 dense cosine to
  *      the query) picks the final 5;
  *   5. passage provenance — each pick's CDC chunk count from the
  *      FRESH-reopened chunk index (the passage store a chunk-level
  *      server would fetch from; semi-join prunes BEFORE the count);
  *   6. snippets — [[graft.operators.Retrieval.bestWindow]] highlighting
  *      over the broadcast-joined-back picks.
  *
  * Deterministic end to end (round-6 scores, id tie-breaks), so the
  * DuckDB oracle replays the WHOLE chain — BM25 scoring, cosine ranking,
  * RRF, all five unrolled MMR picks, the Gear chunk recomputation, and
  * the window scan — and the row is fully hash-checked at every SF. The
  * `zero_build` column carries the counter fence: the serve path ran
  * zero index builds (ensure-phase builds happen BEFORE the fence, the
  * serve_everything_cold discipline).
  */
object RagQueries {

  type Q = (SparkSession, String) => DataFrame

  import graft.functions.functions.{vec_dot, vec_l2norm}

  /** DuckDB-compatible round-6 (see SimilarityQueries.round). */
  private def round6(c: Column): Column =
    org.apache.spark.sql.functions.round(c * 1e6, 0) / 1e6

  private val Terms = Seq("hash", "join", "vector")

  /** Build/train counters over the three artifact families this pipeline
    * serves from — the fence the reopen+serve phase must not move. */
  private def buildCounters(): Seq[Long] = Seq(
    graft.operators.InvertedIndex.buildCount.toLong,
    graft.operators.IvfIndex.buildsRun.get(),
    graft.operators.ChunkIndex.buildCount.toLong)

  /** The served pipeline result, computed ONCE per (session, dir) — the
    * replay-row discipline: the fence window (fresh reopens + the MMR
    * collect) is a per-session event; both bench passes read the result. */
  private val ragCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private def ragServed(spark: SparkSession, dir: String): DataFrame =
    QueryArtifacts.runOnce(ragCache, (spark, dir))({
      // ENSURE: the three durable forms exist (builds are LEGAL here —
      // this is the cross-session precondition, not the serve path)
      TextQueries.invertedIndexPersisted(spark, dir)
      SimilarityQueries.ivfPersisted(spark, dir)
      CdcQueries.chunkPersisted(spark, dir)
      // QUIESCE: the warm-up fan-out's bodies call the same build paths;
      // a concurrent build must not read as a serve-phase counter bump.
      // COMPLETE per-body barrier (not a fixed all-bodies bound, which
      // the grown fan-out can structurally overrun — the r17 bench
      // lesson); safe here because no fan-out body calls this function,
      // so there is no self-await to deadlock on.
      ReplayOrchestrator.awaitFanOut(spark, dir)
      // FENCE + FRESH manifest reopens past every session cache: from
      // here to the MMR collect, zero build/train jobs may run
      val before = buildCounters()
      val (invPath, invTag) = TextQueries.invIndexLocation(spark, dir)
      val inv = graft.operators.InvertedIndex
        .loadIfValid(spark, invPath, invTag)
        .getOrElse(throw new IllegalStateException(
          s"inverted-index manifest at $invPath failed validation after ensure"))
      val (ivfPath, ivfTag) = SimilarityQueries.ivfLocation(spark, dir)
      val ivf = graft.operators.IvfIndex.loadIfValid(spark, ivfPath, ivfTag)
        .getOrElse(throw new IllegalStateException(
          s"IVF manifest at $ivfPath failed validation after ensure"))
      val (chPath, chTag) = CdcQueries.chunkLocation(spark, dir)
      val chunkIdx = graft.operators.ChunkIndex.loadIfValid(spark, chPath, chTag)
        .getOrElse(throw new IllegalStateException(
          s"chunk-index manifest at $chPath failed validation after ensure"))
      // 1. lexical leg: term-bucket-pruned BM25 serve, source doc excluded
      val lex = graft.operators.Retrieval.rankBy(
        inv.serve(Terms).filter(col("doc_id") =!= 0)
          .orderBy(desc("bm25"), col("doc_id")).limit(20),
        "doc_id", "bm25", "lex_rank")
      // 2. dense leg: the request embedding (query-time input) against
      // the reopened IVF artifact's cell table — the exact bounded-heap
      // plan, so ranking is round-6 + id-tie-break deterministic
      val q0 = Tables.load(spark, dir, "embeddings")
        .filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val corpusVecs = ivf.cells
        .select(col("c_id").as("vec_id"), col("cv").as("embedding"))
      val dense = graft.plans.CosineTopK
        .topK(spark, corpusVecs, Seq((0L, q0)), 20, "vec_id", "embedding")
        .select(col("c_id").as("doc_id"), col("rank").as("dense_rank"))
      // 3. hybrid fusion to the top-10 shortlist (bounded join + window)
      val fused = graft.operators.Retrieval.rrfFuse(lex, dense, "doc_id")
      // 4. MMR re-rank: rel = round-6 dense cosine to the query, vectors
      // from the reopened artifact; the bounded collect happens here,
      // INSIDE the fence window
      val q0n = graft.functions.VectorKernels.l2normFloats(q0)
      val short = fused.select("doc_id")
        .join(corpusVecs.select(col("vec_id").as("doc_id"), col("embedding")),
          "doc_id")
        .withColumn("rel", round6(
          vec_dot(typedlit(q0.toSeq), col("embedding"))
            / (lit(q0n) * vec_l2norm(col("embedding")))))
      val picks = graft.operators.Retrieval.mmrRerank(short, "doc_id",
        "rel", "embedding", k = 5, lambdaRel = 0.7, lambdaDiv = 0.3)
      val zeroBuild = buildCounters() == before
      // 5. passage provenance: the picks' chunk counts from the reopened
      // chunk index — broadcast the 5 ids, prune, THEN count
      val nChunks = chunkIdx.chunks
        .join(broadcast(picks.select("doc_id")), Seq("doc_id"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      // 6. snippets: bounded join-back, stateless window scan on 5 rows
      val hits = Tables.load(spark, dir, "documents")
        .join(broadcast(picks.select("pick_rank", "doc_id")), "doc_id")
      val snip = graft.operators.Retrieval.bestWindow(hits, "doc_id",
        "text", Terms, windowTokens = 8, carryCols = Seq("pick_rank"))
      picks
        .join(snip.select("doc_id", "start_idx", "n_hits", "snippet"), "doc_id")
        .join(nChunks, "doc_id")
        .withColumn("zero_build", lit(zeroBuild))
        .select("pick_rank", "doc_id", "rel", "mmr6", "n_chunks",
          "start_idx", "n_hits", "snippet", "zero_build")
        .orderBy("pick_rank")
    })

  /** Drop the per-session pipeline result (bench/verify teardown; no
    * persists to release — the result is a bounded local-relation join). */
  def clearCaches(): Unit = ragCache.clear()

  val queries: ListMap[String, Q] = ListMap(
    "rag_serve_pipeline" -> ((spark, dir) => ragServed(spark, dir)))

  /** The full chain re-derived: BM25 CTEs -> lexical top-20, cosine CTE
    * -> dense top-20, RRF fusion -> top-10, five unrolled MMR argmax
    * stages, the Gear chunk recomputation for the picks' chunk counts,
    * and the snippet window comprehension. zero_build is the lifecycle
    * literal (the serve_everything_cold pattern). */
  val oracleSql: ListMap[String, String] = ListMap(
    "rag_serve_pipeline" -> (CdcQueries.chunksCte +
      """,
        |tok AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM tok),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, t.term, count(*) AS tf
        |  FROM tok, unnest(tok.w) AS t(term)
        |  WHERE t.term IN ('hash', 'join', 'vector')
        |  GROUP BY doc_id, t.term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id,
        |    round(sum((n_docs - df + 0.5) / (df + 0.5)
        |      * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))), 6) AS bm25
        |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
        |  WHERE tf.doc_id <> 0
        |  GROUP BY tf.doc_id, n_docs, avgdl),
        |lex AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
        |    AS INTEGER) AS lex_rank
        |  FROM scored),
        |e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings),
        |dsc AS (
        |  SELECT c.vec_id AS doc_id,
        |    round(list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
        |      / (q.nrm * c.nrm), 6) AS cosine
        |  FROM e q JOIN e c ON q.vec_id = 0 AND c.vec_id <> 0),
        |dense AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id)
        |    AS INTEGER) AS dense_rank
        |  FROM dsc),
        |fused AS (
        |  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
        |    round((coalesce(1.0 / (60 + l.lex_rank), 0)
        |         + coalesce(1.0 / (60 + d.dense_rank), 0)) * 1e6) / 1e6 AS rrf6
        |  FROM (SELECT * FROM lex WHERE lex_rank <= 20) l
        |  FULL OUTER JOIN (SELECT * FROM dense WHERE dense_rank <= 20) d
        |    ON l.doc_id = d.doc_id),
        |shortl AS (
        |  SELECT doc_id, rrf6,
        |    CAST(row_number() OVER (ORDER BY rrf6 DESC, doc_id) AS INTEGER)
        |      AS rank
        |  FROM fused QUALIFY rank <= 10),
        |sl AS (
        |  SELECT s.doc_id, d.cosine AS rel, e.v, e.nrm
        |  FROM shortl s JOIN dsc d USING (doc_id)
        |  JOIN e ON e.vec_id = s.doc_id),
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
        |       GROUP BY d.doc_id, d.rel ORDER BY mmr6 DESC, d.doc_id LIMIT 1),
        |picks AS (
        |  SELECT CAST(1 AS INTEGER) AS pick_rank, doc_id, rel, mmr6 FROM p1
        |  UNION ALL SELECT CAST(2 AS INTEGER), doc_id, rel, mmr6 FROM p2
        |  UNION ALL SELECT CAST(3 AS INTEGER), doc_id, rel, mmr6 FROM p3
        |  UNION ALL SELECT CAST(4 AS INTEGER), doc_id, rel, mmr6 FROM p4
        |  UNION ALL SELECT CAST(5 AS INTEGER), doc_id, rel, mmr6 FROM p5),
        |cc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        |  FROM chunks WHERE doc_id IN (SELECT doc_id FROM picks)
        |  GROUP BY doc_id),
        |win AS (
        |  SELECT picks.pick_rank, picks.doc_id, tok.w AS toks,
        |    [CAST(list_contains(tok.w[i+1:i+8], 'hash') AS INTEGER)
        |     + CAST(list_contains(tok.w[i+1:i+8], 'join') AS INTEGER)
        |     + CAST(list_contains(tok.w[i+1:i+8], 'vector') AS INTEGER)
        |     for i in range(0, greatest(len(tok.w) - 8, 0) + 1)] AS hits
        |  FROM picks JOIN tok USING (doc_id))
        |SELECT p.pick_rank, p.doc_id, p.rel, p.mmr6, cc.n_chunks,
        |  CAST(list_position(w.hits, list_max(w.hits)) - 1 AS INTEGER) AS start_idx,
        |  CAST(list_max(w.hits) AS INTEGER) AS n_hits,
        |  array_to_string(w.toks[list_position(w.hits, list_max(w.hits)):
        |    list_position(w.hits, list_max(w.hits)) + 7], ' ') AS snippet,
        |  TRUE AS zero_build
        |FROM picks p JOIN cc USING (doc_id) JOIN win w USING (doc_id)
        |ORDER BY p.pick_rank""".stripMargin))
}
