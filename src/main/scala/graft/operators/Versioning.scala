package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset snapshot versioning: classify every document across two corpus
  * snapshots as added / removed / modified / unchanged — the diff a
  * curation pipeline publishes with each release so downstream training
  * runs know exactly what changed (and a re-train can be scoped to the
  * delta instead of the whole corpus).
  */
object Versioning {

  /** Diff two snapshots by content hash: one row per document id present
    * in either snapshot, with its change class.
    *
    * Scale shape: each side collapses to (id, md5) BEFORE the full-outer
    * join, so only ids and 32-char hashes shuffle — never document
    * payloads (the dedup-family "hashes move, text doesn't" discipline).
    * One shuffle keyed by id; the CASE chain is a stateless projection.
    * Presence is tracked with explicit flags, NOT hash nullity — a
    * document present with a NULL payload must classify by membership
    * (and two NULL payloads hash-compare null-safely as unchanged),
    * never as added/removed.
    *
    * Returns (`idCol`, change) with change in
    * {added, removed, modified, unchanged}. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      payloadCol: String): DataFrame =
    collapse(oldDf, idCol, payloadCol, "old_md5", "in_old")
      .join(collapse(newDf, idCol, payloadCol, "new_md5", "in_new"),
        Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .otherwise(arrivalClass("old_md5", "in_old")).as("change"))

  /** The (id, content-md5, presence-flag) collapse of one snapshot side —
    * ONE definition shared by the batch diff and the streaming twin
    * ([[graft.streaming.StreamingOps.snapshotDiffStream]]), so the hash
    * discipline and null-payload rule cannot drift between them. */
  private[graft] def collapse(df: DataFrame, idCol: String,
      payloadCol: String, hashCol: String, presenceCol: String): DataFrame =
    df.select(col(idCol), md5(col(payloadCol).cast("binary")).as(hashCol),
      lit(true).as(presenceCol))

  /** Classification of an ARRIVING row (whose own hash is `new_md5`)
    * against a reference side collapsed with [[collapse]]: added when the
    * id was absent, unchanged on a null-safe hash match, else modified.
    * The batch diff's non-removed branch and the streaming twin share
    * this expression verbatim. */
  private[graft] def arrivalClass(refHashCol: String,
      refPresenceCol: String): org.apache.spark.sql.Column =
    when(col(refPresenceCol).isNull, lit("added"))
      .when(col(refHashCol) <=> col("new_md5"), lit("unchanged"))
      .otherwise(lit("modified"))

  /** The bounded release-note view of [[snapshotDiff]]: per-class counts
    * (4 rows at most, however large the corpus). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      payloadCol: String): DataFrame =
    snapshotDiff(oldDf, newDf, idCol, payloadCol)
      .groupBy("change").agg(count(lit(1)).as("n_docs"))
      .orderBy("change")
}
