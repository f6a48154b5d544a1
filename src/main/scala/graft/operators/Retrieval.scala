package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval primitives: reciprocal-rank fusion of a lexical
  * (BM25) and a dense (embedding top-k) candidate list — the standard
  * first-stage ranker of a RAG / seed-retrieval pipeline (Cormack,
  * Clarke & Buettcher, "Reciprocal Rank Fusion outperforms Condorcet
  * and individual rank learning methods", SIGIR 2009: score =
  * Σ_lists 1/(k + rank), k = 60).
  *
  * Scale shape: fusion touches only the two BOUNDED ranked lists
  * (topN-sized — the corpus-sized work happens upstream in the
  * term-pruned inverted-index serve and the bounded-heap cosine top-k),
  * so the full-outer join and the global rank window run over at most
  * |lex| + |dense| rows. Nothing here scans a corpus.
  */
object Retrieval {

  /** RRF-fuse two bounded ranked lists into one top-`topN` ranking.
    *
    * `lex` and `dense` each carry (`idCol`, rank) where rank is that
    * list's own 1-based position column (named `lex_rank` / `dense_rank`
    * respectively). A document absent from one list contributes 0 for
    * it — the standard RRF convention — and keeps a NULL rank in the
    * output so the caller can see which signal surfaced it. The fused
    * score is rounded to 6 decimals (the DuckDB-compatible scaled form
    * every hash-checked score in this engine uses) BEFORE the final
    * ordering, so rank ties are broken deterministically by `idCol`.
    *
    * Output: (rank, `idCol`, lex_rank, dense_rank, rrf6) — rank 1..topN
    * by (rrf6 desc, `idCol` asc). The unpartitioned window is bounded by
    * |lex| + |dense| rows by construction.
    */
  def rrfFuse(lex: DataFrame, dense: DataFrame, idCol: String,
      k: Int = 60, topN: Int = 10): DataFrame = {
    require(k >= 1, s"RRF constant must be positive, got $k")
    require(topN >= 1, s"topN must be positive, got $topN")
    def contrib(r: org.apache.spark.sql.Column) =
      coalesce(lit(1.0) / (lit(k.toDouble) + r.cast("double")), lit(0.0))
    val fused = lex.select(col(idCol), col("lex_rank").cast("int").as("lex_rank"))
      .join(dense.select(col(idCol), col("dense_rank").cast("int").as("dense_rank")),
        Seq(idCol), "full_outer")
      .withColumn("rrf6", TextAnalysis.round6(
        contrib(col("lex_rank")) + contrib(col("dense_rank"))))
    val w = Window.orderBy(desc("rrf6"), col(idCol))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("rank"), col(idCol), col("lex_rank"), col("dense_rank"),
        col("rrf6"))
      .orderBy("rank")
  }

  /** 1-based rank column over a bounded, already-truncated candidate
    * list: position by (`scoreCol` desc, `idCol` asc). The caller
    * truncates FIRST (orderBy + limit — a distributed TakeOrdered), so
    * the unpartitioned row_number window only ever sees the truncated
    * rows. */
  def rankBy(df: DataFrame, idCol: String, scoreCol: String,
      rankName: String): DataFrame =
    df.withColumn(rankName,
      row_number().over(Window.orderBy(desc(scoreCol), col(idCol))))
}
