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

  /** Pseudo-relevance-feedback query expansion (Rocchio/RM3-lite): BM25
    * top-`nFeedback` documents for the `seed` query from the served
    * index, then the top-`nExpand` non-seed terms by TOTAL feedback term
    * frequency (mass = Σ tf over the feedback docs; ties by term asc — a
    * total order), optionally df-capped (`maxDfFrac = Some((num, den))`
    * keeps only terms with df·den <= nDocs·num — the integer-exact stand-
    * in for an idf floor that keeps boilerplate terms out of the
    * expansion). Returns seed ++ expansion, for a second serve.
    *
    * Scale shape: the feedback doc set is `nFeedback` ids (broadcast into
    * the corpus scan — at scale a doc-id-keyed point lookup), the term
    * mass aggregate is bounded by the feedback docs' vocabulary, the df
    * cap joins that bounded candidate set against the vocab-sized terms
    * sidecar, and the final collect is `nExpand` strings. The expanded
    * serve still prunes to the query terms' buckets. */
  def prfExpandedQuery(index: InvertedIndex, docs: DataFrame,
      idCol: String, textCol: String, seed: Seq[String],
      nFeedback: Int = 10, nExpand: Int = 3,
      maxDfFrac: Option[(Int, Int)] = None): Seq[String] = {
    require(seed.nonEmpty, "need a non-empty seed query")
    require(nFeedback >= 1 && nExpand >= 0,
      s"need nFeedback >= 1 and nExpand >= 0, got $nFeedback/$nExpand")
    val seedLower = seed.map(_.toLowerCase)
    val fb = index.serve(seedLower)
      .orderBy(desc("bm25"), col(idCol)).limit(nFeedback)
      .select(idCol)
    val mass = docs.join(broadcast(fb), idCol)
      .select(explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(!col("term").isin(seedLower: _*))
      .groupBy("term").agg(count(lit(1)).as("mass"))
    val capped = maxDfFrac match {
      case Some((num, den)) =>
        mass.join(index.terms.select("term", "df"), "term")
          .filter(col("df") * den <= lit(index.nDocs) * num)
      case None => mass
    }
    val expansion = capped
      .orderBy(desc("mass"), col("term")).limit(nExpand)
      .select("term").collect().map(_.getString(0)).toSeq
    seedLower ++ expansion
  }

  /** "Did-you-mean" query-term correction against the index's term
    * sidecar: each (lowercased, distinct) input term maps to the vocab
    * term minimizing (levenshtein distance asc, df desc, term asc)
    * among candidates within `maxDist` edits — an in-vocabulary term is
    * its own distance-0 argmin, so one uniform rule covers exact hits,
    * typo corrections, and (via the left join) terms with no candidate,
    * which pass through unchanged with NULL dist/df and simply match no
    * postings downstream.
    *
    * Scale shape: ONE scan of the vocab-sized term sidecar against a
    * broadcast of the bounded query-term set (the length pre-filter —
    * |len(q) − len(t)| ≤ maxDist, a lower bound on edit distance — is a
    * cheap codegen guard in front of the quadratic-per-pair levenshtein
    * kernel), then a per-qterm argmin whose window partitions hold at
    * most the candidate set within `maxDist` of one term. Nothing
    * corpus-sized moves: the sidecar is |vocab| rows however large the
    * corpus.
    *
    * Output: (qterm, corrected, dist, df) ordered by qterm. */
  def correctionReport(index: InvertedIndex, terms: Seq[String],
      maxDist: Int = 2): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    val spark = index.terms.sparkSession
    import spark.implicits._
    val q = terms.map(_.toLowerCase).distinct.toDF("qterm")
    val cand = index.terms.select(col("term"), col("df"))
      .join(broadcast(q),
        abs(length(col("qterm")) - length(col("term"))) <= maxDist &&
          levenshtein(col("qterm"), col("term")) <= maxDist)
      .withColumn("dist", levenshtein(col("qterm"), col("term")))
    val w = Window.partitionBy("qterm")
      .orderBy(col("dist"), desc("df"), col("term"))
    val best = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qterm"), col("term"), col("dist"), col("df"))
    q.join(best, Seq("qterm"), "left")
      .select(col("qterm"), coalesce(col("term"), col("qterm")).as("corrected"),
        col("dist"), col("df"))
      .orderBy("qterm")
  }

  /** The corrected query itself: [[correctionReport]] collapsed to the
    * distinct corrected term list (bounded collect — one row per distinct
    * input term), ready for a second `index.serve`. */
  def correctTerms(index: InvertedIndex, terms: Seq[String],
      maxDist: Int = 2): Seq[String] =
    correctionReport(index, terms, maxDist)
      .select("corrected").collect().map(_.getString(0)).toSeq.distinct

  /** MMR diversified re-rank (Carbonell & Goldstein, SIGIR 1998) of a
    * BOUNDED retrieval shortlist: greedily pick
    * argmax_{d not picked} (lambdaRel·rel(d) − lambdaDiv·max_{s picked}
    * cos(d, s)), ties by id asc — relevance traded against redundancy
    * with what is already selected, the standard diversity pass after a
    * dense top-k.
    *
    * The shortlist is bounded by contract (a top-k result, tens of
    * rows), so the greedy runs DRIVER-side over one bounded collect (the
    * centroid/codebook sidecar precedent; `maxShortlist` guards a
    * miswired corpus-sized caller) with k·n cosine evaluations, and the
    * result is a k-row local relation. All cosines go through the SAME
    * ascending-index double accumulation and scaled HALF_UP rounding as
    * [[graft.plans.CosineTopK]] ([[graft.functions.VectorKernels]] /
    * TopKMath.round6), and the two lambda weights are passed separately
    * — computing 1−λ in doubles would NOT equal the oracle's written
    * 0.3 literal (1−0.7 is 0.30000000000000004) — so every score is
    * bit-identical to the unrolled SQL derivation.
    *
    * Output: (pick_rank 1..k, `idCol`, rel, mmr6) in pick order, where
    * mmr6 is the rounded selection score at pick time (pick 1's is
    * lambdaRel·rel alone — nothing is selected yet). */
  def mmrRerank(shortlist: DataFrame, idCol: String, relCol: String,
      vecCol: String, k: Int, lambdaRel: Double, lambdaDiv: Double,
      maxShortlist: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = shortlist.sparkSession
    import spark.implicits._
    val rows = shortlist
      .select(col(idCol).cast("long"), col(relCol).cast("double"), col(vecCol))
      .limit(maxShortlist + 1).collect()
    require(rows.length <= maxShortlist,
      s"mmrRerank shortlist exceeds $maxShortlist rows — bounded-collect " +
        "contract violated; truncate the shortlist upstream")
    val ids = rows.map(_.getLong(0))
    val rel = rows.map(_.getDouble(1))
    val vecs = rows.map(_.getSeq[Float](2).toArray)
    // validated ONCE over the collected shortlist: a mismatched embedding
    // dimension must fail fast, not silently truncate the dot product and
    // skew every MMR pick (the oracle and VectorKernels assume equal dims)
    val dims = vecs.iterator.map(_.length).toSet
    require(dims.size <= 1,
      s"mmrRerank shortlist mixes embedding dimensions $dims — every " +
        s"'$vecCol' must have the same length")
    val norms = vecs.map(graft.functions.VectorKernels.l2normFloats)
    def sim6(i: Int, j: Int): Double = {
      val a = vecs(i); val b = vecs(j)
      var acc = 0.0
      var d = 0
      val n = a.length
      while (d < n) { acc += a(d).toDouble * b(d).toDouble; d += 1 }
      graft.plans.TopKMath.round6(acc / (norms(i) * norms(j)))
    }
    val n = ids.length
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    val used = new Array[Boolean](n)
    while (picked.length < math.min(k, n)) {
      var bestIdx = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!used(i)) {
          var maxSim = Double.NegativeInfinity
          var pi = 0
          while (pi < picked.length) {
            val s = sim6(i, picked(pi)._1)
            if (s > maxSim) maxSim = s
            pi += 1
          }
          val score = graft.plans.TopKMath.round6(
            if (picked.isEmpty) lambdaRel * rel(i)
            else lambdaRel * rel(i) - lambdaDiv * maxSim)
          if (bestIdx < 0 || score > bestScore ||
            (score == bestScore && ids(i) < ids(bestIdx))) {
            bestIdx = i; bestScore = score
          }
        }
        i += 1
      }
      used(bestIdx) = true
      picked += ((bestIdx, ids(bestIdx), rel(bestIdx), bestScore))
    }
    picked.zipWithIndex
      .map { case ((_, id, r, s), pos) => (pos + 1, id, r, s) }
      .toSeq.toDF("pick_rank", idCol, "rel", "mmr6")
  }

  /** Best-window snippet extraction — the result-page highlighting step
    * after a serve: for each document, the `windowTokens`-token window
    * maximizing the count of DISTINCT query terms present (ties broken by
    * the LEFTMOST start — encoded as max over (hits, −start) structs so
    * the whole selection is one codegen'd array expression).
    *
    * Scale shape: a stateless per-row projection — no shuffle, no UDF;
    * the caller joins the bounded top-k id list back to the corpus (a
    * broadcast semi-lookup) first, so the O(n·W·|terms|) window scan runs
    * on k rows, not the corpus. A document shorter than the window yields
    * the whole document as its only window.
    *
    * Output: `carryCols` ++ (`idCol`, start_idx, n_hits, snippet), one
    * row per input row. */
  def bestWindow(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], windowTokens: Int = 8,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(windowTokens >= 1,
      s"windowTokens must be positive, got $windowTokens")
    val lowered = terms.map(_.toLowerCase).distinct
    val toks = split(lower(col(textCol)), " ")
    def hitsAt(i: org.apache.spark.sql.Column) = lowered
      .map(t => array_contains(slice(toks, i + 1, lit(windowTokens)), t)
        .cast("int"))
      .reduce(_ + _)
    val starts = sequence(lit(0), greatest(size(toks) - windowTokens, lit(0)))
    val best = array_max(transform(starts,
      i => struct(hitsAt(i).as("h"), (-i).as("negi"))))
    val startIdx = -best.getField("negi")
    docs.select(carryCols.map(col) ++ Seq(col(idCol),
      startIdx.cast("int").as("start_idx"),
      best.getField("h").cast("int").as("n_hits"),
      concat_ws(" ", slice(toks, startIdx + 1, lit(windowTokens)))
        .as("snippet")): _*)
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
