package graft.queries

/** Canonical on-disk location for a (query-family, source-dir) durable
  * artifact under target/: a readable sanitized dir name plus a SHA-256
  * digest of the RAW dir string, so distinct dirs (/a/b vs /a_b) can
  * never collide. ONE definition — every durable-artifact cache (file
  * indexes, drift indexes, z-order layouts) depends on the exact scheme,
  * and a drifted copy would silently fork artifact paths: stale index
  * reuse or duplicate on-disk layouts. */
private[graft] object QueryArtifacts {
  def path(prefix: String, dir: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    prefix + "/" + dir.replaceAll("[^A-Za-z0-9._-]", "_") + "-" + digest
  }

  /** Session-unique token for artifact paths that are DELETED AND
    * REWRITTEN on (re)build (streaming replay staging/sink/checkpoint
    * dirs): the in-memory runOnce caches are keyed by (session, dir), so
    * a second session over the same dir legally rebuilds — and without a
    * session component in the PATH it would delete directories the first
    * session's lazily-evaluated readers may still be scanning. A random
    * UUID, NOT identityHashCode: two JVMs sharing one working dir (or a
    * GC'd session whose address is reused) could collide on a hash-based
    * tag, re-enabling exactly the delete-while-scanning race the salt
    * exists to prevent. Durable build-once artifacts (LM/index/layout
    * files) deliberately do NOT use this: they are never deleted, only
    * validated-and-reused. */
  def sessionTag(spark: org.apache.spark.sql.SparkSession): String =
    tags.synchronized {
      Option(tags.get(spark)).getOrElse {
        val t = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
        tags.put(spark, t)
        // claim the root with a pid marker BEFORE cleanup can run in any
        // other JVM, so liveness is checkable (see cleanupStaleSessionDirs)
        try {
          val root = new java.io.File("target/replay-session-" + t)
          root.mkdirs()
          java.nio.file.Files.writeString(
            new java.io.File(root, "_pid").toPath,
            java.lang.ProcessHandle.current().pid().toString)
        } catch { case scala.util.control.NonFatal(_) => () }
        cleanupStaleSessionDirs()
        t
      }
    }

  // weak keys: a stopped-and-collected session drops its entry; the next
  // session mints a FRESH random tag, never a reused address
  private val tags =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]()

  /** One root directory per session for ALL salted delete-and-rewrite
    * replay dirs — grouping them makes stale-session cleanup a single
    * prefix listing instead of a hunt across per-prefix trees. */
  def sessionRoot(spark: org.apache.spark.sql.SparkSession): String =
    "target/replay-session-" + sessionTag(spark)

  /** Best-effort removal of replay-session roots left by PREVIOUS runs
    * (every session mints fresh salted dirs, so without this target/
    * grows without bound across rounds). Two independent guards, both
    * required before deletion: the root must be untouched for > 12 h
    * (dir mtime is set at replay build time, not refreshed by reads — so
    * age alone would delete a LIVE long-running session's sinks) AND its
    * `_pid` marker must name a process that is no longer alive (pid
    * reuse is why the age gate stays). A root with no readable marker is
    * treated as dead — pre-marker layouts from old rounds. Invoked once
    * per session, on first tag mint. */
  private def cleanupStaleSessionDirs(): Unit = try {
    val cutoff = System.currentTimeMillis() - 12L * 3600 * 1000
    def ownerAlive(root: java.io.File): Boolean = try {
      val pid = java.nio.file.Files
        .readString(new java.io.File(root, "_pid").toPath).trim.toLong
      val h = java.lang.ProcessHandle.of(pid)
      h.isPresent && h.get().isAlive
    } catch { case scala.util.control.NonFatal(_) => false }
    Option(new java.io.File("target").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("replay-session-") &&
        f.lastModified() < cutoff && !ownerAlive(f))
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Clone a COMPLETED durable-artifact directory to a sibling path —
    * the ensure-phase deduplication for maintenance-lifecycle chains
    * whose starting state is byte-identical to an artifact another chain
    * already built (r18: the IVF refit chain starts from the drift
    * chain's build+append state, the excise chains start from the
    * persisted full-corpus indexes). A byte copy costs file IO only,
    * where re-deriving the state re-runs the quantizer fit / tokenize /
    * assignment scan the sibling already paid; the cloned manifest
    * travels verbatim (source tag and ledger included), which is safe
    * because every downstream maintenance op revalidates by recount and
    * retags on commit. Destination is deleted first, so a torn clone is
    * re-cloned cleanly on retry, never served (loadIfValid refuses a
    * half-copied table by recount). Local-FS byte copy — the fixture
    * artifacts live under target/; at warehouse scale this is the same
    * pattern via a FileSystem/DistCp copy. */
  def cloneArtifact(src: String, dst: String): Unit = {
    val d = new java.io.File(dst)
    org.apache.commons.io.FileUtils.deleteDirectory(d)
    // a rebuild entry point must self-heal a crashed maintainer's leftover
    // lease at the DESTINATION, exactly as build().write() (which this
    // clone replaces in the lifecycle chains) does via WriterLease.clear —
    // the lease is a SIBLING of the artifact dir, so the deleteDirectory
    // above does not remove it, and without this a killed run would wedge
    // the chain's first maintenance op for a full TTL
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$dst._LEASE.properties"))
    org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(src), d)
  }

  /** AT-MOST-ONCE cache fill: `TrieMap.getOrElseUpdate(k, synchronized {
    * body })` only SERIALIZES duplicate evaluations — two concurrent
    * first calls both run `body`, and for a side-effecting body (a
    * streaming replay that deletes and rewrites its sink) the loser's
    * re-run deletes files the winner's caller may be mid-read on. Here
    * the double-checked form runs `body` exactly once per key: writers
    * race to the lock, and inside it the map is re-consulted before
    * evaluating. */
  def runOnce[K, V](cache: scala.collection.concurrent.TrieMap[K, V],
      key: K)(body: => V): V =
    cache.getOrElse(key, cache.synchronized {
      cache.getOrElseUpdate(key, body)
    })
}
