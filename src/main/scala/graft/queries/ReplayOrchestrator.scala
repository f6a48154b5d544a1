package graft.queries

import scala.collection.concurrent.TrieMap
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

/** Concurrent launcher for the driver-ledger streaming REPLAYS (ingest,
  * near-dup, drift). Each replay is an independent run-once Structured
  * Streaming job (own staging dir, checkpoint, sink) whose cold cost is
  * dominated by micro-batch orchestration, not CPU — run sequentially
  * they were the three largest cold-pass costs in the bench (~26 s
  * summed on a quiet box). The first `await` for a (session, dir)
  * launches EVERY registered replay on daemon threads — exactly once
  * per (session, dir, name), the double-checked runOnce discipline —
  * and blocks only on its own; the other rows then find a completed (or
  * in-flight) future. Overlapping independent streaming pipelines is
  * the production posture too: a real ingest tier runs its exact-dedup,
  * near-dup, and drift monitors as parallel queries over the same
  * arrivals, not as a serial chain.
  *
  * Failure semantics: a failed body stays failed for the lifetime of
  * the (session, dir) key — every await rethrows the original cause
  * (the bench's per-query catch records it), rather than retrying a
  * side-effecting replay whose staging dirs are in an unknown state.
  */
private[queries] object ReplayOrchestrator {

  private val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "replay-orchestrator")
      t.setDaemon(true)
      t
    })
  private implicit val ec: ExecutionContext =
    ExecutionContext.fromExecutor(pool)

  /** Replay bodies by name; populated from the owning query objects'
    * initializers (all forced by SparkEntry.queries construction). */
  private val registry =
    TrieMap.empty[String, (SparkSession, String) => AnyRef]

  private val started =
    TrieMap.empty[(SparkSession, String, String), Future[AnyRef]]

  def register(name: String)(body: (SparkSession, String) => AnyRef): Unit =
    registry.putIfAbsent(name, body)

  private def launch(spark: SparkSession, dir: String,
      name: String): Future[AnyRef] = {
    val key = (spark, dir, name)
    // runOnce discipline: a bare getOrElseUpdate could evaluate the
    // Future-spawning thunk twice under concurrent first calls, running
    // one replay's delete-and-rewrite staging twice concurrently
    started.getOrElse(key, started.synchronized {
      started.getOrElseUpdate(key, Future(registry(name)(spark, dir)))
    })
  }

  /** Block until `name`'s replay result for (spark, dir) is available,
    * launching all registered replays concurrently on first touch. */
  def await[T](spark: SparkSession, dir: String, name: String): T = {
    val mine = launch(spark, dir, name)
    registry.keys.foreach(n => if (n != name) launch(spark, dir, n))
    Await.result(mine, Duration.Inf).asInstanceOf[T]
  }

  /** Forget completed/failed replays (bench/verify teardown). Replay
    * results are sink paths and bounded local arrays — nothing persisted
    * to release here. */
  def clear(): Unit = started.clear()
}
