package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-point HITS (Kleinberg's hubs & authorities,
  * JACM'99) — the [[PageRank]] tier's second authority signal, natural on
  * BIPARTITE curation graphs (curators → documents, customers →
  * suppliers, seed lists → pages): a good HUB points at good
  * authorities, a good AUTHORITY is pointed at by good hubs. Unlike
  * PageRank it is run on the DIRECTED edge list as-is — symmetrizing
  * would collapse the two roles into one score.
  *
  * Same integer discipline as PageRank: scores are scaled longs, every
  * half-round is ONE equi-join of the score table onto the edges plus
  * ONE keyed BIGINT sum — associative, order-free, map-side combined,
  * bit-reproducible with no ordered-fold machinery. Where the textbook
  * formulation L2-normalizes (irrational, not oracle-replayable), each
  * half-round MAX-normalizes: s'(v) = s(v)·scale DIV max_v s(v) — the
  * same fixed point up to scaling, exact in integers, and the per-round
  * max is a 1-row aggregate embedded as a literal (never a corpus-sized
  * collect). Truncation leaks ≤ 1/scale per node per half-round — noise
  * far below any ranking decision at the default scale.
  *
  * Scale shape: edges are localCheckpointed ONCE PER HALF-ROUND KEY
  * (src-partitioned and dst-partitioned copies — the preserved
  * outputPartitioning means each half-round shuffles only the \|V\|-row
  * score table, never the \|E\|-row edges); every round is two
  * (join + keyed sum) pairs over the cached edges plus two 1-row max
  * aggregates; raw half-rounds are materialized once each (feeding the
  * max aggregate — the PageRank eager-rounds rationale). Overflow bound:
  * after normalization every score is ≤ scale, so a node's in-sum is ≤
  * maxDeg·scale; the default scale keeps ~10^9-degree nodes inside
  * 2^63.
  *
  * Returns (node, hub_scaled, auth_scaled): one row per edge-endpoint
  * node; a node with no out-edges has hub 0, with no in-edges auth 0
  * (on a bipartite graph each side carries exactly one role).
  */
object Hits {

  /** Materialized graph artifacts shared by multiple HITS calls over the
    * SAME edge list (the PageRank.Graph discipline): src- and
    * dst-partitioned edge copies (one per half-round key) plus the node
    * set. Build via [[prepare]]; pass to [[runOn]]. */
  final case class Graph private[Hits] (
      eBySrc: DataFrame, eByDst: DataFrame, nodes: DataFrame) {
    /** Release persisted artifacts (no-op for checkpoint-backed graphs). */
    def unpersist(): Unit =
      Seq(eBySrc, eByDst, nodes).foreach(_.unpersist())
  }

  /** Materialize the shared artifacts — TWO pre-partitioned edge copies,
    * one per half-round key (preserved outputPartitioning: every
    * half-round's equi-join reuses the edge partitioning and shuffles
    * ONLY the \|V\|-row score table — the \|E\|-row edges never move
    * again; the r15 bench measured the naive re-shuffle-every-half-round
    * form at 4.7 s warm at sf0.1) — plus the node set. `persist = true`
    * uses eager MEMORY_AND_DISK persists (caller owns the release — the
    * session-cache shape); the default localCheckpoint is GC-released
    * with the Graph. */
  def prepare(edges: DataFrame, srcCol: String, dstCol: String,
      persist: Boolean = false): Graph = {
    val eRaw = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
    def mat(df: DataFrame): DataFrame =
      if (persist) {
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      } else df.localCheckpoint()
    val eBySrc = mat(eRaw.repartition(col("src")))
    val eByDst = mat(eBySrc.repartition(col("dst")))
    val nodes = mat(eBySrc.select(col("src").as("node"))
      .union(eBySrc.select(col("dst"))).distinct())
    Graph(eBySrc, eByDst, nodes)
  }

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = 1000000000L): DataFrame =
    runOn(prepare(edges, srcCol, dstCol), iterations, scale)

  /** [[run]] over a [[prepare]]d graph — amortizes the edge
    * materializations across calls/passes. */
  def runOn(g: Graph, iterations: Int,
      scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale > 0, s"scale must be positive, got $scale")
    val eBySrc = g.eBySrc
    val eByDst = g.eByDst
    val nodes = g.nodes
    // neighbor-sum half-round: for each node, the sum of `scores`'
    // score_scaled over its `key`-side neighbors (key = "src" pulls
    // IN-flows onto dst; key = "dst" pulls OUT-flows onto src), zeros
    // restored by the left join
    def halfRound(scores: DataFrame, key: String, other: String): DataFrame = {
      val e = if (key == "src") eBySrc else eByDst
      nodes.join(
        e.join(scores.select(col("node").as("nb"), col("score_scaled").as("sc")),
            col(key) === col("nb"))
          .groupBy(col(other).as("node")).agg(sum("sc").as("s")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0L)).as("raw"))
    }
    // h0 = scale on every node (a lazy projection of the checkpointed
    // node set — nothing to materialize)
    var hubs = nodes.withColumn("score_scaled", lit(scale))
    var auths: DataFrame = null
    var i = 0
    while (i < iterations) {
      // authority half-round: a(v) = sum of in-neighbors' hub scores
      auths = normalize(halfRound(hubs, "src", "dst"), scale)
      // hub half-round: h(u) = sum of out-neighbors' normalized auths
      hubs = normalize(halfRound(auths, "dst", "src"), scale)
      i += 1
    }
    hubs.withColumnRenamed("score_scaled", "hub_scaled")
      .join(auths.withColumnRenamed("score_scaled", "auth_scaled"),
        Seq("node"))
  }

  /** Max-normalize a materialized (node, raw) score table to `scale`:
    * s' = raw·scale DIV max(raw), the multiply widened to decimal(38,0)
    * (raw·scale reaches maxDeg·scale² ≈ deg·10^18 — past 2^63 at degree
    * 10; the TrigramLm decimal discipline, and the oracle widens to
    * HUGEINT identically). The max is ONE 1-row aggregate over the
    * (checkpointed) table, embedded as a literal; an all-zero round
    * (possible only on a degenerate edgeless input) passes through
    * unscaled rather than dividing by zero. */
  private def normalize(scored: DataFrame, scale: Long): DataFrame = {
    // ONE checkpoint per half-round: the raw table feeds the 1-row max
    // aggregate AND the scaled projection its consumers read — the
    // projection is a free recompute from the checkpoint, so
    // checkpointing it too (as the first cut did) only doubled the
    // materialization count
    val mat = scored.localCheckpoint()
    val mx = mat.agg(max("raw")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    if (mx <= 0L) mat.select(col("node"), col("raw").as("score_scaled"))
    else mat.select(col("node"),
      expr(s"CAST((CAST(raw AS DECIMAL(38,0)) * $scale) DIV $mx AS BIGINT)")
        .as("score_scaled"))
  }
}
