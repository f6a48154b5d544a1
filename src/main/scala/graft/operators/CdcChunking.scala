package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GearChunkEnds
import org.apache.spark.sql.graft.bridge

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
    * column. Stateless mode by default (oracle-checkable); pass
    * `minSize`/`maxSize` for FastCDC-style normalized chunk sizes. */
  def gearChunkEnds(payload: Column, maskBits: Int,
      minSize: Int = 1, maxSize: Int = 0): Column =
    bridge.column(GearChunkEnds(bridge.expression(payload), maskBits, minSize, maxSize))

  /** Explode a media table (doc_id, payload binary) into its CDC chunk
    * table: (doc_id, chunk_no, chunk_start, chunk_len, chunk_md5). */
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
}
