package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-point PageRank — the graph-authority signal web
  * curation pipelines use as a document-quality prior (Common-Crawl-style
  * domain ranking): rank flows along edges, damped toward a uniform
  * teleport.
  *
  * The whole computation is INTEGER arithmetic: ranks are scaled longs
  * (init = `scale` per node, i.e. rank 1.0), each out-contribution is a
  * truncating `DIV`, and the damping is `(s * dampNum) DIV dampDen`. That
  * makes every iteration's per-node in-sum a plain BIGINT aggregate —
  * associative, order-free, map-side combined — so the result is
  * bit-reproducible in any engine with NO ordered-fold machinery, unlike
  * a floating-point formulation whose Σ contrib order would have to be
  * pinned per node (unboundedly large for a popular node). The truncation
  * deterministically leaks ≤ 1/scale of mass per node per hop — noise
  * orders of magnitude below any ranking decision at the default scale.
  */
object PageRank {

  /** Materialized graph artifacts shared by multiple ranking calls over
    * the SAME edge list (uniform + personalized over one corpus graph —
    * the IVF build-once / serve-many discipline): `e` src-partitioned
    * distinct edges, `nodes` the endpoint set, `eDeg` edges pre-joined
    * with out-degree. Build via [[prepare]]; pass to [[runOn]] /
    * [[personalizedOn]]. */
  final case class Graph private[PageRank] (
      e: DataFrame, nodes: DataFrame, eDeg: DataFrame) {
    /** Release persisted artifacts (no-op for checkpoint-backed graphs). */
    def unpersist(): Unit = Seq(e, nodes, eDeg).foreach(_.unpersist())
  }

  /** Materialize the shared graph artifacts. `persist = true` uses
    * eager MEMORY_AND_DISK persists (caller owns the release — the shape
    * for a Graph held across queries in a session cache); the default
    * localCheckpoint truncates lineage and is released by GC with the
    * Graph (the shape for a single-call run). Both preserve the src
    * partitioning every round's contribution join reuses. */
  def prepare(edges: DataFrame, srcCol: String, dstCol: String,
      persist: Boolean = false): Graph = {
    val eDist = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
    def mat(df: DataFrame): DataFrame =
      if (persist) {
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      } else df.localCheckpoint()
    val e = mat(eDist.repartition(col("src")))
    val nodes = mat(e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct())
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = mat(e.join(outdeg, "src"))
    Graph(e, nodes, eDeg)
  }

  /** INCREMENTALLY extend a [[prepare]]d graph with a new edge batch —
    * the daily-growth lifecycle for a session-held Graph (the index
    * family's `appendTo`, for the in-memory artifact): novel edges are
    * found with one anti-join against the MATERIALIZED edge table (the
    * full re-distinct of prepare() never recurs), the node set extends
    * by the batch's endpoints only, and the degree-joined edge table is
    * re-derived over the union — degrees of existing sources change when
    * new edges attach to them, so eDeg is the one artifact that cannot
    * extend by pure append. Ranks over the appended graph are exactly
    * the ranks over a fresh build of the union (integer arithmetic, no
    * accumulated state — PageRankSpec pins the equality); the caller
    * owns releasing the PREVIOUS graph's persists after the swap. */
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
    val novel = fresh.join(g.e, Seq("src", "dst"), "left_anti")
    val e = mat(g.e.unionByName(novel).repartition(col("src")))
    val nodes = mat(g.nodes.unionByName(
        novel.select(col("src").as("node"))
          .union(novel.select(col("dst")))).distinct())
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = mat(e.join(outdeg, "src"))
    Graph(e, nodes, eDeg)
  }

  /** Run synchronous PageRank rounds over the directed edge list: at most
    * `iterations` rounds, stopping early when `tolScaled` is set and no
    * node's rank moved by ≥ tolScaled between consecutive rounds (the
    * standard maxΔ < ε fixed-point stop, exact in the integer domain).
    * Nodes are the edge-endpoint set.
    *
    * DANGLING NODES (no out-edges) get the standard redistribution: each
    * round their summed rank is split evenly over ALL nodes and damped
    * like any other in-flow — `(insum + danglingSum DIV |V|) * dampNum
    * DIV dampDen` — so total mass stays ≈ |V|·scale on any directed
    * graph, not just the symmetric-caller convention. The dangling set is
    * detected ONCE (one bounded job over the cached edges); on a graph
    * with NO dangling nodes — e.g. a symmetric graph where every
    * undirected edge is sent as two directed ones — the term is skipped
    * entirely and the plan (and every emitted rank) is byte-identical to
    * the redistribution-free formulation; a caller that GUARANTEES that
    * property by construction can assert `danglingFree = true` to skip
    * even the detection job. With dangling nodes present,
    * each round pays one extra 1-row aggregate (the dangling sum, embedded
    * as a literal) — never a corpus-sized collect.
    *
    * Scale shape: each iteration is ONE equi-join of the rank table onto
    * the edge list (only the rank side shuffles — the edges are
    * src-partitioned once) and ONE sum keyed by dst — the canonical
    * distributed PR round. The edge list is localCheckpointed
    * src-PARTITIONED (eager, lineage truncated — the connected-components
    * discipline, plus preserved outputPartitioning), the node set and the
    * degree-joined edge table each once more, so every round reads
    * materialized tables instead of re-evaluating the caller's upstream
    * join per reference. The rank rounds themselves stay LAZY over the
    * cached edges: at a bounded iteration count the composed plan beats
    * per-round checkpointing, whose forced materialization jobs cost
    * more than the cheap cached-edge re-scans they save (measured 2×
    * slower checkpointed at sf0.1). Plan depth is still bounded for ANY
    * iteration count: every 4th round checkpoints (a no-op below 5
    * rounds), so a 40-round run pays ~9 materializations instead of a
    * 40-deep nested-self-join plan that would stall Catalyst analysis.
    * (With a dangling set or a tolerance stop, rounds checkpoint EAGERLY
    * each iteration anyway — both need the round's table materialized for
    * their 1-row aggregate, and re-deriving an i-deep lazy plan once per
    * round for it would be quadratic.)
    *
    * Overflow bound: a node's in-sum is < totalMass = |V|·scale, and the
    * damping multiply needs |V|·scale·dampNum < 2^63 — at the default
    * scale that allows ~10^8 nodes; drop `scale` (or move the sums to
    * decimal(38,0), the TrigramLm discipline) beyond that. The bound is
    * ENFORCED whenever |V| is in hand from the dangling-detection job —
    * every call except `danglingFree = true`, where staying inside it is
    * part of the caller's assertion.
    *
    * Returns (node, rank_scaled): rank_scaled/scale is the PageRank with
    * total mass ≈ |V|. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = 1000000000L,
      dampNum: Int = 85, dampDen: Int = 100,
      tolScaled: Option[Long] = None,
      danglingFree: Boolean = false): DataFrame =
    core(prepare(edges, srcCol, dstCol), iterations, scale, dampNum,
      dampDen, None, tolScaled, danglingFree)._1

  /** [[run]] over a [[prepare]]d graph — amortizes the edge
    * materializations across several ranking calls. */
  def runOn(g: Graph, iterations: Int, scale: Long = 1000000000L,
      dampNum: Int = 85, dampDen: Int = 100,
      tolScaled: Option[Long] = None,
      danglingFree: Boolean = false): DataFrame =
    core(g, iterations, scale, dampNum, dampDen, None, tolScaled,
      danglingFree)._1

  /** [[runOn]] variant that ALSO returns the number of rounds actually
    * executed — the observable of the `tolScaled` fixed-point stop
    * (rounds == iterations when the cap bit first, or no tolerance was
    * set). With tolerance T, the count is deterministic: every round is
    * exact integer arithmetic, so the first round whose max |Δ| drops
    * below T is a pure function of the graph — which is what lets the
    * `graph_pagerank_converged` driver row emit the count as a column
    * and the oracle unroll exactly that many rounds. */
  def runOnCounted(g: Graph, iterations: Int, scale: Long = 1000000000L,
      dampNum: Int = 85, dampDen: Int = 100,
      tolScaled: Option[Long] = None,
      danglingFree: Boolean = false): (DataFrame, Int) =
    core(g, iterations, scale, dampNum, dampDen, None, tolScaled,
      danglingFree)

  /** PERSONALIZED PageRank: teleport mass concentrated on `seeds` instead
    * of uniform — rank becomes proximity to the seed set, the standard
    * seed-based corpus-mining signal (WebText-style "quality = linked
    * from curated seeds", phi-style seeded expansion). Identical
    * fixed-point integer machinery: init = `scale` on seeds / 0
    * elsewhere, teleport term `base` on seeds / 0 elsewhere; the seed
    * set is a bounded literal `isin` (a query set, never corpus-sized).
    * Dangling-node mass redistributes exactly as in [[run]] (uniformly —
    * the common PPR convention; a seed-directed redistribution is a
    * caller-side variant). When the graph is dangling-free (or no
    * dangling node is seed-reachable), a node unreachable from every
    * seed within the executed rounds stays exactly 0 — integer
    * arithmetic has no epsilon mass to leak. With seed-reachable
    * dangling nodes the uniform redistribution spreads mass to ALL
    * nodes, unreachable ones included, so the zero-mass guarantee does
    * not hold there. */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[String], iterations: Int, scale: Long = 1000000000L,
      dampNum: Int = 85, dampDen: Int = 100,
      tolScaled: Option[Long] = None,
      danglingFree: Boolean = false): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed node")
    core(prepare(edges, srcCol, dstCol), iterations, scale, dampNum,
      dampDen, Some(seeds), tolScaled, danglingFree)._1
  }

  /** [[personalized]] over a [[prepare]]d graph. */
  def personalizedOn(g: Graph, seeds: Seq[String], iterations: Int,
      scale: Long = 1000000000L, dampNum: Int = 85, dampDen: Int = 100,
      tolScaled: Option[Long] = None,
      danglingFree: Boolean = false): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed node")
    core(g, iterations, scale, dampNum, dampDen, Some(seeds), tolScaled,
      danglingFree)._1
  }

  private def core(g: Graph,
      iterations: Int, scale: Long, dampNum: Int, dampDen: Int,
      seeds: Option[Seq[String]], tolScaled: Option[Long],
      danglingFree: Boolean): (DataFrame, Int) = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(scale > 0, s"scale must be positive, got $scale")
    require(dampNum > 0 && dampNum < dampDen,
      s"need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    require(tolScaled.forall(_ > 0),
      s"tolScaled must be positive when set, got $tolScaled")
    // src-partitioned + materialized artifacts (see [[prepare]]): the
    // preserved outputPartitioning means every round's contribution join
    // shuffles ONLY the |V|-row rank table — the |E|-row edges never move
    // again (the Hits discipline; the r15 bench measured the
    // unpartitioned form re-shuffling e every round); the node set and
    // the degree-joined edges are materialized once, not per round
    val e = g.e
    val nodes = g.nodes
    val eDeg = g.eDeg
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // dangling detection: ONE bounded job over the cached edges — |V| and
    // the dangling count in one 2-column aggregate, with the overflow
    // bound enforced for free while |V| is in hand. A caller that
    // GUARANTEES every node has an out-edge (e.g. a symmetric graph,
    // each undirected edge sent as two directed ones) can assert
    // `danglingFree = true` and skip the job entirely — the plan is then
    // byte-identical to the redistribution-free formulation, and the
    // overflow bound is the caller's documented responsibility.
    val (nV, nDangling) =
      if (danglingFree) (0L, 0L)
      else {
        val r = nodes.join(outdeg, col("node") === col("src"), "left")
          .agg(count(lit(1)), sum(when(col("outdeg").isNull, 1L).otherwise(0L)))
          .head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
    if (nV > 0) {
      // |V|·scale·dampNum < 2^63, checked multiplication-free
      require(nV <= Long.MaxValue / scale / dampNum,
        s"|V|=$nV at scale=$scale, dampNum=$dampNum overflows the BIGINT " +
          "in-sum bound |V|*scale*dampNum < 2^63 — lower `scale` (or port " +
          "the sums to decimal(38,0))")
    }
    val hasDangling = nDangling > 0
    // dangling node set, materialized once (it is fixed across rounds);
    // |dangling| ≤ |V| rows of one string column
    val dangling =
      if (hasDangling)
        nodes.join(e.select(col("src").as("node")), Seq("node"), "left_anti")
          .localCheckpoint()
      else null
    // the teleport term, exact at the default parameters (1.5e8); any
    // truncation here is shared with the oracle via the same formula
    val base = scale * (dampDen - dampNum) / dampDen
    // uniform PR: every node starts at `scale` and receives `base`;
    // personalized: only seeds do
    def onSeeds(v: Long) = seeds match {
      case None => lit(v)
      case Some(s) =>
        when(col("node").isin(s: _*), lit(v)).otherwise(lit(0L))
    }
    // eager rounds (dangling or tolerance): each round's table feeds a
    // 1-row aggregate, so it is materialized per round — as a LAZY
    // localCheckpoint primed by that very aggregate, so the
    // materialization and the convergence/dangling scalar share ONE job
    // per round. (The r16 bench measured the eager
    // localCheckpoint-then-join form at ~0.85 s/round of job-scheduling
    // overhead — checkpoint job + Δ-join job per round; and a plain
    // persist() cannot replace it: each round's plan references the
    // previous round's TWICE (contribution join + Δ carry), so without
    // the checkpoint's lineage truncation the plan tree doubles per
    // round — the 2^rounds explain string OOMed the driver before any
    // task ran.) Checkpoint blocks are GC-released with the DataFrames;
    // nothing to unpersist. */
    val eagerRounds = hasDangling || tolScaled.isDefined
    var ranks = nodes.withColumn("rank_scaled", onSeeds(scale))
    if (eagerRounds) ranks = ranks.localCheckpoint()
    // superseded-round release bookkeeping: on the tolerance path each
    // round is materialized by its own maxΔ aggregate, so the PREVIOUS
    // round's checkpoint blocks can be unpersisted deterministically
    // instead of waiting for the ContextCleaner's GC sweep. The
    // dangling-only path stays GC-released: its rounds checkpoint
    // LAZILY (materialized by the NEXT round's dShare aggregate), so at
    // swap time the previous blocks may still be needed.
    var prevTolCkpt: DataFrame = if (tolScaled.isDefined) ranks else null
    var lastLazyCkpt: DataFrame = null
    var i = 0
    var converged = false
    while (i < iterations && !converged) {
      // per-round dangling in-flow share, embedded as a literal: the
      // 1-row sum over the (materialized) previous round's ranks
      val dShare =
        if (hasDangling) {
          val s = ranks.join(dangling, Seq("node"), "left_semi")
            .agg(sum("rank_scaled")).head()
          (if (s.isNullAt(0)) 0L else s.getLong(0)) / nV
        } else 0L
      val sums = eDeg.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"),
          expr("rank_scaled DIV outdeg").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("s"))
      val next = nodes.join(sums, Seq("node"), "left")
        .select(col("node"), (onSeeds(base) +
          expr(s"((coalesce(s, CAST(0 AS BIGINT)) + CAST($dShare AS BIGINT))" +
            s" * $dampNum) DIV $dampDen"))
          .as("rank_scaled"))
      i += 1
      if (eagerRounds) {
        tolScaled match {
          case Some(tol) =>
            // carry the previous rank on the row so the maxΔ aggregate
            // needs no second join — the one action both materializes
            // the lazily-checkpointed round and decides convergence
            val withPrev = next.join(
                ranks.select(col("node"),
                  col("rank_scaled").as("prev_scaled")), Seq("node"))
              .localCheckpoint(false)
            val d = withPrev
              .agg(max(abs(col("rank_scaled") - col("prev_scaled")))).head()
            converged = (if (d.isNullAt(0)) 0L else d.getLong(0)) < tol
            // the aggregate above materialized withPrev's checkpoint, so
            // the previous round's blocks can never be read again —
            // release them now rather than at the next GC sweep
            if (prevTolCkpt != null)
              org.apache.spark.sql.graft.bridge.unpersistCheckpoints(prevTolCkpt)
            prevTolCkpt = withPrev
            ranks = withPrev.select("node", "rank_scaled")
          case None =>
            // dangling-only: the NEXT round's dShare aggregate is the
            // first action and materializes this round's checkpoint; the
            // last round materializes under the caller's action
            ranks = next.localCheckpoint(false)
        }
      } else {
        ranks = next
        // bound plan depth for long loops without paying the per-round
        // materialization tax at the common small iteration counts
        if (i % 4 == 0 && i < iterations) {
          val prev = lastLazyCkpt
          ranks = ranks.localCheckpoint() // eager: materializes NOW
          if (prev != null)
            org.apache.spark.sql.graft.bridge.unpersistCheckpoints(prev)
          lastLazyCkpt = ranks
        }
      }
    }
    // the dangling node set is read only by the per-round dShare
    // aggregates — never by the returned plan (dShare rides as an
    // embedded literal) — so its checkpoint blocks release here
    if (hasDangling)
      org.apache.spark.sql.graft.bridge.unpersistCheckpoints(dangling)
    (ranks, i)
  }
}
