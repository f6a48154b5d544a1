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
  * Scale shape: edges are materialized ONCE PER HALF-ROUND KEY
  * (src-partitioned and dst-partitioned copies — the preserved
  * outputPartitioning means each half-round shuffles only the \|V\|-row
  * score table, never the \|E\|-row edges); every round is two
  * (join + keyed sum) pairs over the cached edges plus two 1-row max
  * aggregates riding as broadcast branches of the SAME lazy DAG
  * (ReuseExchange shares each raw table's shuffle with its max branch),
  * so a bounded-iteration run executes as ONE job; every 3rd iteration
  * checkpoints to bound the doubled-per-half-round plan tree on long
  * runs. Overflow bound:
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
      iterations: Int, scale: Long = 1000000000L,
      tolScaled: Option[Long] = None): DataFrame =
    runOn(prepare(edges, srcCol, dstCol), iterations, scale, tolScaled)

  /** INCREMENTALLY extend a [[prepare]]d graph with a new edge batch —
    * [[PageRank.append]]'s twin for the directed bipartite form: novel
    * edges found with one anti-join against the materialized src copy
    * (the full re-distinct never recurs), both partitioned edge copies
    * extended, the node set by the batch's endpoints only. Scores over
    * the appended graph equal a fresh build of the union exactly
    * (integer arithmetic, no accumulated state — HitsSpec pins it);
    * the caller owns releasing the previous graph's persists. */
  def append(g: Graph, edges: DataFrame, srcCol: String, dstCol: String,
      persist: Boolean = false): Graph = {
    val fresh = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
    def mat(df: DataFrame): DataFrame =
      if (persist) {
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      } else df.localCheckpoint()
    val novel = fresh.join(g.eBySrc, Seq("src", "dst"), "left_anti")
      .localCheckpoint() // read by BOTH extended copies and the node set
    val eBySrc = mat(g.eBySrc.unionByName(novel).repartition(col("src")))
    val eByDst = mat(g.eByDst.unionByName(novel).repartition(col("dst")))
    val nodes = mat(g.nodes.unionByName(
        novel.select(col("src").as("node"))
          .union(novel.select(col("dst")))).distinct())
    Graph(eBySrc, eByDst, nodes)
  }

  /** [[run]] over a [[prepare]]d graph — amortizes the edge
    * materializations across calls/passes. With `tolScaled` set, rounds
    * run EAGERLY (each materialized for its two 1-row maxΔ aggregates —
    * the PageRank tolerance-path rationale) and the loop stops once
    * neither the hub nor the authority table moved by ≥ tolScaled between
    * consecutive rounds (the standard maxΔ < ε fixed-point stop, exact in
    * the integer domain), under the `iterations` round cap. */
  def runOn(g: Graph, iterations: Int,
      scale: Long = 1000000000L,
      tolScaled: Option[Long] = None): DataFrame =
    runOnCounted(g, iterations, scale, tolScaled)._1

  /** [[runOn]] variant that ALSO returns the number of rounds actually
    * executed — the observable of the `tolScaled` fixed-point stop
    * (rounds == iterations at the cap, or when no tolerance was set).
    * Deterministic like [[PageRank.runOnCounted]]: every round is exact
    * integer arithmetic, so the first round where NEITHER score table
    * moved by ≥ tolScaled is a pure function of the graph — the
    * `graph_hits_converged` driver row emits the count as a column and
    * its oracle unrolls exactly that many rounds. */
  def runOnCounted(g: Graph, iterations: Int,
      scale: Long = 1000000000L,
      tolScaled: Option[Long] = None): (DataFrame, Int) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale > 0, s"scale must be positive, got $scale")
    require(tolScaled.forall(_ > 0),
      s"tolScaled must be positive when set, got $tolScaled")
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
    // h0 = scale on every node (a lazy projection of the materialized
    // node set — nothing new to materialize)
    val eager = tolScaled.isDefined
    var hubs = nodes.withColumn("score_scaled", lit(scale))
    if (eager) hubs = hubs.localCheckpoint()
    var auths: DataFrame = null
    // last plan-depth checkpoints of the LAZY path, tracked so each new
    // checkpoint can release the pair it just superseded (GC-based
    // cleanup can lag past a bench leak check)
    var lastCkptA: DataFrame = null
    var lastCkptH: DataFrame = null
    var i = 0
    var converged = false
    while (i < iterations && !converged) {
      // authority half-round: a(v) = sum of in-neighbors' hub scores
      val a = normalize(halfRound(hubs, "src", "dst"), scale)
      // hub half-round: h(u) = sum of out-neighbors' normalized auths
      val h = normalize(halfRound(a, "dst", "src"), scale)
      i += 1
      if (eager) {
        // tolerance path: each round materialized for its two 1-row
        // maxΔ aggregates — as LAZY localCheckpoints the aggregates
        // themselves prime (one job per table per round, and lineage
        // truncation keeps the doubled-per-half-round plan tree flat;
        // the PageRank tolerance-path discipline)
        val aMat = a.localCheckpoint(false)
        val hMat = h.localCheckpoint(false)
        // BOTH deltas run every round (no && short-circuit) and round
        // 1's missing-prev side gets a priming count: the new round must
        // be fully materialized and lineage-truncated BEFORE the
        // superseded previous round's blocks are released below —
        // unpersisting a block a lazy checkpoint still needs would make
        // it unrecomputable
        val dA = maxDelta(aMat, auths)
        val dH = maxDelta(hMat, hubs)
        if (auths == null) aMat.count()
        converged = tolScaled.exists(tol => dA < tol && dH < tol)
        // deterministic release of the superseded round (r20 bench
        // recorded a GC-lagged leak at exactly this site): nothing can
        // read the previous round's checkpoint blocks again
        if (auths != null)
          org.apache.spark.sql.graft.bridge.unpersistCheckpoints(auths)
        org.apache.spark.sql.graft.bridge.unpersistCheckpoints(hubs)
        auths = aMat
        hubs = hMat
      } else {
        auths = a
        hubs = h
        // the rounds stay LAZY (the PageRank composed-plan rationale:
        // one job at the end instead of a materialization per
        // half-round — measured 3.8 s -> well under 1 s warm at sf0.1);
        // every 3rd iteration checkpoints to bound plan depth for long
        // runs, since each half-round's plan embeds the previous one
        // TWICE (main + max branch — ReuseExchange collapses the
        // runtime cost, but the tree itself doubles per half-round)
        if (i % 3 == 0 && i < iterations) {
          val pa = lastCkptA
          val ph = lastCkptH
          auths = auths.localCheckpoint() // eager: materializes NOW
          hubs = hubs.localCheckpoint()
          // the new checkpoints just read (and so superseded) the
          // previous pair — release those blocks deterministically
          if (pa != null)
            org.apache.spark.sql.graft.bridge.unpersistCheckpoints(pa)
          if (ph != null)
            org.apache.spark.sql.graft.bridge.unpersistCheckpoints(ph)
          lastCkptA = auths
          lastCkptH = hubs
        }
      }
    }
    (hubs.withColumnRenamed("score_scaled", "hub_scaled")
      .join(auths.withColumnRenamed("score_scaled", "auth_scaled"),
        Seq("node")), i)
  }

  /** max |cur − prev| over the node-aligned score tables (Long.MaxValue
    * when there is no previous round yet). */
  private def maxDelta(cur: DataFrame, prev: DataFrame): Long =
    if (prev == null) Long.MaxValue
    else {
      val d = cur.select(col("node"), col("score_scaled").as("x"))
        .join(prev.select(col("node"), col("score_scaled").as("y")),
          Seq("node"))
        .agg(max(abs(col("x") - col("y")))).head()
      if (d.isNullAt(0)) 0L else d.getLong(0)
    }

  /** Max-normalize a (node, raw) score table to `scale`:
    * s' = raw·scale DIV max(raw), the multiply widened to decimal(38,0)
    * (raw·scale reaches maxDeg·scale² ≈ deg·10^18 — past 2^63 at degree
    * 10; the TrigramLm decimal discipline, and the oracle widens to
    * HUGEINT identically). The max rides as a BROADCAST 1-row aggregate
    * of the same subplan (never a collected literal — keeping the round
    * lazy is what lets a multi-round run execute as ONE job, with
    * ReuseExchange sharing the raw table's shuffle between the max
    * branch and the main branch); an all-zero round (possible only on a
    * degenerate edgeless input) passes through unscaled rather than
    * dividing by zero. */
  private def normalize(scored: DataFrame, scale: Long): DataFrame =
    scored.crossJoin(broadcast(scored.agg(max("raw").as("mx"))))
      .select(col("node"),
        when(col("mx").isNull || col("mx") <= 0L, col("raw"))
          .otherwise(expr(
            s"CAST((CAST(raw AS DECIMAL(38,0)) * $scale) DIV mx AS BIGINT)"))
          .as("score_scaled"))
}
