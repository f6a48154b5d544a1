package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{functions => gfn}

/** Content-defined chunking over binary payloads + chunk-level dedup.
  *
  * Fixed-size chunking misaligns every block downstream of a single-byte
  * edit; content-defined cut points (Gear rolling hash, see
  * [[graft.functions.GearChunkEnds]]) re-synchronize within `maskBits`
  * bytes of the edit, so identical passages shared between revisions /
  * mirrors / boilerplate-heavy documents hash to identical chunks. Chunk
  * md5s are then an equi-joinable dedup key: the shuffle moves 16-byte
  * hashes, never payload bytes — the same "hashes shuffle, not text"
  * posture as exact document dedup, applied sub-document.
  *
  * Scale shape: one codegen'd pass over the payload column computes cut
  * points; chunk rows explode to ~n_bytes/2^maskBits rows per doc with
  * md5 + offsets only (payload substrings are hashed, not carried); the
  * dedup aggregation is a plain hash-shuffle on chunk_md5. No all-pairs
  * step exists anywhere — two documents share a group iff they share a
  * chunk hash.
  */
object CdcChunking {

  /** Cut positions (1-based, end-exclusive final cut omitted) for a binary
    * column — alias of [[graft.functions.functions.gear_chunk_ends]] (one
    * wrapper, re-exported here for operator-level discoverability). */
  def gearChunkEnds(payload: Column, maskBits: Int,
      minSize: Int = 1, maxSize: Int = 0): Column =
    gfn.gear_chunk_ends(payload, maskBits, minSize, maxSize)

  /** Explode a media table (doc_id, payload binary) into its CDC chunk
    * table: (doc_id, chunk_no, chunk_start, chunk_len, chunk_md5). An
    * empty payload yields ZERO chunk rows (not one empty chunk — two
    * content-free documents must not read as sharing content downstream
    * in [[dupChunkGroups]]). */
  def chunkTable(media: DataFrame, maskBits: Int = 6,
      minSize: Int = 1, maxSize: Int = 0): DataFrame = {
    val withCuts = media
      .withColumn("n", octet_length(col("payload")))
      .withColumn("cuts", gearChunkEnds(col("payload"), maskBits, minSize, maxSize))
      .withColumn("starts", concat(array(lit(1)), transform(col("cuts"), c => c + 1)))
      .withColumn("ends", concat(col("cuts"), array(col("n"))))
    withCuts
      .select(col("doc_id"), col("payload"),
        posexplode(zip_with(col("starts"), col("ends"),
          (s, e) => struct(s.as("s"), e.as("e")))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_no"),
        col("col.s").as("chunk_start"),
        (col("col.e") - col("col.s") + lit(1)).as("chunk_len"),
        md5(col("payload").substr(col("col.s"), col("col.e") - col("col.s") + lit(1)))
          .as("chunk_md5"))
      .filter(col("chunk_len") > 0)
  }

  /** Chunk-level duplicate groups: every chunk hash occurring more than
    * once, with its occurrence and distinct-document counts. The
    * sub-document analogue of exact dedup — shared boilerplate and copied
    * passages surface here even when no two whole documents are equal. */
  def dupChunkGroups(chunks: DataFrame): DataFrame =
    chunks.groupBy("chunk_md5")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("chunk_len")).as("chunk_len"))
      .filter(col("n_occurrences") > 1)

  /** Per-document overlap against a REFERENCE corpus's chunk table: how
    * many of each document's distinct substantial (>= `minLen` byte)
    * chunk hashes already exist in the corpus, plus the keep verdict
    * (`n_shared < minShared`). The admission rule a continuous ingest
    * applies: an arriving document that shares >= minShared substantial
    * chunks with the accepted corpus is a re-crawl / trivial revision and
    * is dropped — CDC's shift invariance makes the shared-suffix chunks
    * hash identically no matter how the wrapper text changed.
    *
    * Scale shape: docs' chunk rows LEFT SEMI against the corpus's DISTINCT
    * substantial hash set (16-byte keys both sides), one doc-keyed count.
    * `corpusChunks` is typically built once per corpus version
    * ([[chunkTable]]) and persisted — the build-once/serve-many contract
    * every ingest artifact here follows. */
  def corpusOverlapReport(docs: DataFrame, corpusChunks: DataFrame,
      minLen: Int = 16, minShared: Long = 2L): DataFrame = {
    val corpusSet = corpusChunks.filter(col("chunk_len") >= minLen)
      .select("chunk_md5").distinct()
    val docSub = docs.filter(col("chunk_len") >= minLen)
      .select("doc_id", "chunk_md5").distinct()
    val matched = docSub.join(corpusSet, Seq("chunk_md5"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    docs.select("doc_id").distinct()
      .join(matched, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("keep", col("n_shared") < minShared)
  }

  /** Document-pair near-dup by shared chunk content: ordered pairs sharing
    * at least `minShared` distinct substantial (>= `minLen` byte) chunk
    * hashes, with each side's substantial-chunk count for context — the
    * same decision artifact as the winnowing pair join, derived from the
    * CDC family instead of selected k-gram fingerprints. Edit-robust by
    * the cut rule's shift invariance: an insertion perturbs at most the
    * chunks within `maskBits` bytes of the edit, so revision pairs keep
    * most of their shared hashes.
    *
    * Scale shape: the candidate generator is an equi-join on chunk_md5 —
    * the bounded-key bucket-join posture (two docs pair iff they share a
    * chunk; nothing all-pairs). A corpus-universal boilerplate chunk is a
    * hot key exactly like a hot minhash band; AQE's skew split applies,
    * and [[dupChunkGroups]] is the audit that finds such chunks first.
    * All outputs are integers — no rounding coin flips to reconcile. */
  def chunkOverlapPairs(chunks: DataFrame, minLen: Int = 16,
      minShared: Long = 2L): DataFrame = {
    val sc = chunks.filter(col("chunk_len") >= minLen)
      .select("doc_id", "chunk_md5").distinct()
    val cnt = sc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sc.as("a").join(sc.as("b"),
        col("a.chunk_md5") === col("b.chunk_md5") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .agg(count(lit(1)).as("n_shared_chunks"))
      .filter(col("n_shared_chunks") >= minShared)
      .join(cnt.as("c1"), col("doc_id_1") === col("c1.doc_id"))
      .join(cnt.as("c2"), col("doc_id_2") === col("c2.doc_id"))
      .select(col("doc_id_1"), col("doc_id_2"), col("n_shared_chunks"),
        col("c1.n").as("n_chunks_1"), col("c2.n").as("n_chunks_2"))
  }
}
