package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column queries: binary payload metadata + the stubbed decode
  * pipeline (real Spark plumbing, deterministic fake codec). The batch
  * `session_window` aggregation also lives here as the batch twin of the
  * streaming session operator. */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** One persisted aHash fingerprint table per (session, dir) — the
    * fingerprint-once / dedup-many residency split: decoding + hashing the
    * corpus is the expensive deterministic pass (at sf0.1 it dominated the
    * pair query ~10:1), the banded pair join over 64-bit fingerprints is
    * cheap. The table is tiny (one bits array + four band ints per doc).
    * Same (session, dir) lifecycle contract as DedupQueries' pair caches;
    * released by [[clearCaches]]. */
  private val ahashCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def ahashTable(spark: SparkSession, dir: String): DataFrame =
    QueryArtifacts.runOnce(ahashCache, (spark, dir))(Multimodal.aHash(spark,
          Multimodal.asMediaTable(Tables.load(spark, dir, "documents")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Release the fingerprint cache (bench/verify teardown). */
  def clearCaches(): Unit = {
    ahashCache.values.foreach(_.unpersist())
    ahashCache.clear()
  }

  // Pseudo-replay WARM-UP: the aHash fingerprint table (a synthetic-frame
  // decode + per-pixel fold over every payload) is this family's one
  // expensive cold build and runOnce-persists anyway — force it under the
  // warm-up fan-out (see ReplayOrchestrator); teardown = this family's
  // clearCaches leg (idempotent).
  ReplayOrchestrator.register("warm-multimodal", () => clearCaches()) {
    (spark, dir) =>
      ahashTable(spark, dir).count()
      java.lang.Boolean.TRUE
  }

  val queries: ListMap[String, Q] = ListMap(
    // Binary payload metadata: byte length + content digest
    "multimodal_bytes" -> ((spark, dir) => {
      Multimodal.asMediaTable(Tables.load(spark, dir, "documents"))
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          sha2(col("payload"), 256).as("digest"))
        .orderBy("doc_id")
    }),
    // Partition-streamed decode (stub codec) -> typed feature columns
    "multimodal_decode" -> ((spark, dir) => {
      val media = Multimodal.asMediaTable(Tables.load(spark, dir, "documents"))
      Multimodal.decodeFeatures(spark, media).toDF()
        .select("doc_id", "n_bytes", "width", "height", "channels", "n_pixels")
        .orderBy("doc_id")
    }),
    // Perceptual (average-hash) image near-dup pairs — the LAION-style
    // image-dedup step over the stub-thumbnail path (text/plain payloads:
    // the deterministic byte-sampled fake, so the 64-bit fingerprints and
    // the banded pair join are FULLY oracle-reproducible; the real-decode
    // path is pinned by PerceptualHashSpec's PNG fixtures). Banding is
    // exact at hamming <= 3 (four disjoint 16-bit bands), so the oracle's
    // brute-force all-pairs formulation must agree pair for pair.
    "multimodal_ahash_pairs" -> ((spark, dir) => {
      Multimodal.perceptualDupPairsFromHashes(ahashTable(spark, dir))
        .orderBy("doc_id_1", "doc_id_2")
    }),
    // Deterministic frame sampling over the binary payload (every 64th
    // byte, at most 8 frames): the array<struct> row shape of audio/video
    // frame extraction with the codec stubbed to a byte probe — the
    // plumbing (binary in, bounded frame array out, explode downstream)
    // is exactly what a real decoder slots into. Hex-string samples keep
    // the row DuckDB-comparable (corpus text is ASCII, so byte == char).
    "multimodal_frame_sample" -> ((spark, dir) => {
      val media = Multimodal.asMediaTable(Tables.load(spark, dir, "documents"))
      Multimodal.sampleFrames(media, stride = 64, maxFrames = 8)
        .select(col("doc_id"), explode(col("frames")).as("f"))
        .select(col("doc_id"), col("f.frame_no").as("frame_no"),
          hex(col("f.sample")).as("sample_hex"))
        .orderBy("doc_id", "frame_no")
    }),
    // REAL-codec decode parity gate (r12): multimodal_decode hash-checks
    // the stub path only; this row drives the actual JDK ImageIO branch
    // through a synthetic-PNG fixture whose pixel values are pure integer
    // functions of (doc_id, x, y) — PNG is lossless, so the decoded
    // pixels must equal the formula and the position-weighted checksum is
    // re-derivable by the oracle from the formula ALONE. A codec
    // regression (dimension swap, channel flip, row padding, silent
    // stub fallback) turns this row red in CORRECTNESS, not just in
    // MultimodalSpec. Fixture is 8 tiny driver-built images; the decode
    // itself runs partition-streamed like every media path.
    "multimodal_decode_digest" -> ((spark, dir) => {
      Multimodal.decodeDigest(spark, Multimodal.syntheticPngTable(spark))
        .toDF().orderBy("doc_id")
    }),
    // Native session_window batch aggregation (twin of the streaming op);
    // oracle reproduces it with the lag/running-sum formulation — a genuine
    // cross-check of Spark's session semantics
    "session_window_agg" -> ((spark, dir) => {
      Tables.load(spark, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start")
    }))

  val oracleSql: ListMap[String, String] = ListMap(
    "multimodal_bytes" ->
      """SELECT doc_id, 'text/plain' AS media_type,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_decode" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes FROM documents)
        |SELECT doc_id, n_bytes,
        |  CAST(64 + n_bytes % 576 AS INTEGER) AS width,
        |  CAST(64 + (n_bytes * 31) % 448 AS INTEGER) AS height,
        |  3 AS channels,
        |  CAST((64 + n_bytes % 576) * (64 + (n_bytes * 31) % 448) * 3 AS BIGINT) AS n_pixels
        |FROM m ORDER BY doc_id""".stripMargin,
    // brute-force all-pairs twin of the banded join (banding is exact at
    // hamming <= 3, so the pair sets must be identical); the stub
    // thumbnail samples byte ((i*31) mod n) per cell with r=g=b, so the
    // mean comparison reduces to 64*b_i >= sum(b) — ASCII corpus text
    // makes ord(char) == byte
    "multimodal_ahash_pairs" ->
      """WITH m AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |px AS (
        |  SELECT doc_id,
        |    [ord(substring(text, ((i * 31) % n) + 1, 1)) for i in range(0, 64)] AS g
        |  FROM m),
        |b AS (SELECT doc_id, g, list_sum(g) AS tot FROM px),
        |bits AS (
        |  SELECT doc_id,
        |    list_transform(g, x -> CASE WHEN 64 * x >= tot THEN 1 ELSE 0 END) AS bits
        |  FROM b),
        |p AS (
        |  SELECT a.doc_id AS doc_id_1, b2.doc_id AS doc_id_2,
        |    list_sum([CASE WHEN a.bits[i] != b2.bits[i] THEN 1 ELSE 0 END
        |              for i in range(1, 65)]) AS hamming
        |  FROM bits a JOIN bits b2 ON a.doc_id < b2.doc_id)
        |SELECT doc_id_1, doc_id_2, CAST(hamming AS BIGINT) AS hamming
        |FROM p WHERE hamming <= 3 ORDER BY doc_id_1, doc_id_2""".stripMargin,
    // byte probe at i*64+1 for i in 0..min(n div 64, 7); a probe landing
    // one past the end (n an exact multiple of 64) yields the empty
    // binary -> hex '' in both engines
    "multimodal_frame_sample" ->
      """WITH m AS (SELECT doc_id, text,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n FROM documents)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_no,
        |  hex(substring(text, CAST(i * 64 + 1 AS INTEGER), 1)) AS sample_hex
        |FROM (SELECT doc_id, text, unnest(range(0, least(n // 64, 7) + 1)) AS i FROM m)
        |ORDER BY doc_id, frame_no""".stripMargin,
    // the formula-side rederivation of the real decode: dims and rgb from
    // the (doc_id, x, y) integer functions, same position weighting
    "multimodal_decode_digest" ->
      """WITH ids AS (SELECT unnest(range(0, 8)) AS doc_id),
        |dims AS (
        |  SELECT doc_id,
        |    CAST(8 + (doc_id % 4) * 4 AS INTEGER) AS width,
        |    CAST(6 + (doc_id % 3) * 5 AS INTEGER) AS height
        |  FROM ids),
        |px AS (
        |  SELECT d.doc_id, d.width, d.height, x.x, y.y,
        |    ((7 * x.x + 3 * y.y + d.doc_id) % 256) * 65536
        |      + ((5 * x.x + 11 * y.y + 2 * d.doc_id) % 256) * 256
        |      + ((13 * x.x + y.y + 3 * d.doc_id) % 256) AS rgb
        |  FROM dims d
        |  JOIN (SELECT unnest(range(0, 20)) AS x) x ON x.x < d.width
        |  JOIN (SELECT unnest(range(0, 16)) AS y) y ON y.y < d.height)
        |SELECT doc_id, width, height, 3 AS channels,
        |  CAST(sum(rgb * (1 + (y * width + x) % 97)) AS BIGINT) AS pix_checksum
        |FROM px GROUP BY doc_id, width, height ORDER BY doc_id""".stripMargin,
    "session_window_agg" ->
      """WITH g AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu,
        |    epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP), 1) OVER
        |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))) AS gap_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, tsu,
        |    sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END) OVER
        |      (PARTITION BY user_id ORDER BY tsu
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, min(tsu) AS session_start,
        |  max(tsu) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin)
}
