package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderKernels
import graft.operators.ZOrderLayout

/** Z-order layout: Morton/bin kernel units, skipping-read equality with
  * the full scan, and the actual file-skipping win on box predicates. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bin = upper-bound binary search over sorted cuts") {
    val cuts = Array(1.0, 3.0, 5.0)
    assert(ZOrderKernels.bin(0.0, cuts) === 0)
    assert(ZOrderKernels.bin(1.0, cuts) === 1)
    assert(ZOrderKernels.bin(3.5, cuts) === 2)
    assert(ZOrderKernels.bin(6.0, cuts) === 3)
  }

  test("interleave is MSB-first round-robin") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // ranks [0b01, 0b10] at 2 bits: msb 0,1 then lsb 1,0 -> 0b0110 = 6
    assert(ZOrderKernels.interleave(new GenericArrayData(Array(1, 2)), 2) === 6L)
    // identity at 1 column: code == rank
    assert(ZOrderKernels.interleave(new GenericArrayData(Array(11)), 4) === 11L)
  }

  private lazy val orders = Tables.load(spark, TestSpark.sfDir, "orders")
  private val zpath = "target/zorder-test/orders-z"
  private val nFiles = 32

  private lazy val writtenOnce: Unit =
    ZOrderLayout.write(orders, Seq("o_custkey", "o_totalprice"), zpath, nFiles)

  private def midBounds(c: String): (Double, Double) = {
    val Array(lo, hi) = orders.stat.approxQuantile(c, Array(0.45, 0.55), 0.0)
    (lo, hi)
  }

  test("append extends the layout; re-applying the same tag is a no-op") {
    val apath = "target/zorder-test/orders-z-append"
    val base = orders.filter(col("o_orderkey") % 3 =!= 0)
    val batch = orders.filter(col("o_orderkey") % 3 === 0)
    ZOrderLayout.write(base, Seq("o_custkey", "o_totalprice"), apath, 8)
    assert(ZOrderLayout.appendTo(batch, apath, 4, sourceTag = "day-1"))
    val bounds = Map("o_custkey" -> midBounds("o_custkey"))
    val got = ZOrderLayout.readBox(spark, apath, bounds)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val expected = orders
      .filter(col("o_custkey") >= bounds("o_custkey")._1 &&
        col("o_custkey") <= bounds("o_custkey")._2)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got === expected, "appended rows must be visible through the manifest")
    // appended files carry bounds: a manifest read plans over a file set
    // that includes at least one appended file only when its box overlaps
    val allFiles = ZOrderLayout.filesFor(spark, apath,
      Map("o_custkey" -> ((Double.MinValue, Double.MaxValue))))
    assert(allFiles.size === 12, s"8 base + 4 appended, got ${allFiles.size}")
    // retry with the SAME tag: no-op — no new files, same manifest rows
    assert(!ZOrderLayout.appendTo(batch, apath, 4, sourceTag = "day-1"))
    val afterRetry = ZOrderLayout.filesFor(spark, apath,
      Map("o_custkey" -> ((Double.MinValue, Double.MaxValue))))
    assert(afterRetry.size === 12, "an already-applied tag must change nothing")
    // and the data read is unchanged (no duplicated rows)
    val again = ZOrderLayout.readBox(spark, apath, bounds)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(again === expected)
    // a second batch under a new tag lands
    assert(ZOrderLayout.appendTo(
      batch.limit(50), apath, 2, sourceTag = "day-2"))
    // ledger-breaking characters are rejected up front: a ',' tag would be
    // written as one ledger entry but parsed back as two, so its retry
    // would NOT be recognized as applied and would duplicate the batch
    for (tag <- Seq("day-1,retry", "a\"b", "a]b", "a{b", "a}b", "")) {
      intercept[IllegalArgumentException] {
        ZOrderLayout.appendTo(batch.limit(5), apath, 1, sourceTag = tag)
      }
    }
  }

  test("compact rewrites a fragmented layout, preserves rows and the applied ledger") {
    val cpath = "target/zorder-test/orders-z-compact"
    val base = orders.filter(col("o_orderkey") % 3 === 1)
    val b2 = orders.filter(col("o_orderkey") % 3 === 2)
    val b3 = orders.filter(col("o_orderkey") % 3 === 0)
    ZOrderLayout.write(base, Seq("o_custkey", "o_totalprice"), cpath, 8)
    assert(ZOrderLayout.appendTo(b2, cpath, 4, sourceTag = "day-1"))
    assert(ZOrderLayout.appendTo(b3, cpath, 2, sourceTag = "day-2"))
    val everything = Map("o_custkey" -> ((Double.MinValue, Double.MaxValue)))
    assert(ZOrderLayout.filesFor(spark, cpath, everything).size === 14)
    ZOrderLayout.compact(spark, cpath, nFiles = 6)
    // one fresh layout: 6 files, identical data through the manifest path
    assert(ZOrderLayout.filesFor(spark, cpath, everything).size === 6)
    val bounds = Map("o_custkey" -> midBounds("o_custkey"))
    val got = ZOrderLayout.readBox(spark, cpath, bounds)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val expected = orders
      .filter(col("o_custkey") >= bounds("o_custkey")._1 &&
        col("o_custkey") <= bounds("o_custkey")._2)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got === expected, "compact changed the data visible through the manifest")
    // corpus-wide re-clustering restored skipping on the compacted files.
    // Off-center box on purpose: a MID box straddles the top-level Morton
    // median split in every dimension, so at 6 coarse files it touches all
    // quadrants by construction — a 10-20th percentile box sits inside
    // one quadrant and must skip
    def lowBounds(c: String): (Double, Double) = {
      val Array(lo, hi) = orders.stat.approxQuantile(c, Array(0.10, 0.20), 0.0)
      (lo, hi)
    }
    val box2d = Map("o_custkey" -> lowBounds("o_custkey"),
      "o_totalprice" -> lowBounds("o_totalprice"))
    assert(ZOrderLayout.filesFor(spark, cpath, box2d).size < 6,
      "low 2-d box skipped nothing after compact")
    // the ledger survived: pre-compact batches stay refused, new tags land
    assert(!ZOrderLayout.appendTo(b2, cpath, 2, sourceTag = "day-1"),
      "compact dropped the applied ledger")
    assert(ZOrderLayout.appendTo(b2.limit(10), cpath, 1, sourceTag = "day-3"))
  }

  test("readBox equals the full-scan filter exactly") {
    writtenOnce
    val bounds = Map("o_custkey" -> midBounds("o_custkey"),
      "o_totalprice" -> midBounds("o_totalprice"))
    val got = ZOrderLayout.readBox(spark, zpath, bounds)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val expected = bounds.foldLeft(orders) { case (df, (c, (lo, hi))) =>
      df.filter(col(c).cast("double") >= lo && col(c).cast("double") <= hi)
    }.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty, "degenerate test: empty box")
  }

  test("a 2-d box predicate skips most files; 1-d predicates still skip") {
    writtenOnce
    val all = ZOrderLayout.filesFor(spark, zpath, Map.empty)
    assert(all.size >= nFiles / 2, s"expected ~$nFiles files, got ${all.size}")
    val box2 = ZOrderLayout.filesFor(spark, zpath,
      Map("o_custkey" -> midBounds("o_custkey"),
        "o_totalprice" -> midBounds("o_totalprice")))
    assert(box2.size <= all.size * 2 / 5,
      s"2-d box read ${box2.size} of ${all.size} files — no z-locality")
    val box1a = ZOrderLayout.filesFor(spark, zpath,
      Map("o_custkey" -> midBounds("o_custkey")))
    val box1b = ZOrderLayout.filesFor(spark, zpath,
      Map("o_totalprice" -> midBounds("o_totalprice")))
    assert(box1a.size < all.size && box1b.size < all.size,
      s"1-d predicates skipped nothing (${box1a.size}, ${box1b.size} of ${all.size})")
  }

  test("readBox predicates reach the parquet scan for integral and double columns") {
    writtenOnce
    // a cast-to-double comparison would leave only IsNotNull pushed for
    // the bigint column — the unskipped files would lose row-group
    // pruning; native-type bounds restore it for both columns
    val plan = ZOrderLayout.readBox(spark, zpath,
        Map("o_custkey" -> ((40.0, 120.0)), "o_totalprice" -> ((1000.0, 90000.0))))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(o_custkey,40)"),
      s"custkey lower bound not pushed: $pushed")
    assert(pushed.contains("LessThanOrEqual(o_custkey,120)"),
      s"custkey upper bound not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(o_totalprice,1000.0)"),
      s"totalprice bound not pushed: $pushed")
    // tightening is exact: fractional bounds on an integral column admit
    // exactly the integers in [ceil(lo), floor(hi)]
    val got = ZOrderLayout.readBox(spark, zpath, Map("o_custkey" -> ((39.5, 120.5))))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val expected = orders.filter(col("o_custkey") >= 40 && col("o_custkey") <= 120)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("empty box intersects no files and returns no rows") {
    writtenOnce
    val bounds = Map("o_custkey" -> (-10.0, -5.0))
    assert(ZOrderLayout.filesFor(spark, zpath, bounds).isEmpty)
    assert(ZOrderLayout.readBox(spark, zpath, bounds).count() === 0L)
  }

  test("write reads the data at most 3x — the manifest is footer metadata, not a scan") {
    // three inherent passes: the approx-quantile cuts, the range
    // partitioner's own bounds sampling (inside repartitionByRange), and
    // the layout write. The r7 manifest then read the written table BACK
    // through a groupBy(input_file_name()) aggregation — a FOURTH full
    // pass at ingest. Budget 3n + slack; the read-back regression lands
    // at ~4n.
    val n = orders.count()
    val read = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      ZOrderLayout.write(orders, Seq("o_custkey", "o_totalprice"),
        "target/zorder-test/budget-z", 8)
      org.apache.spark.sql.graft.bridge.waitListenerBus(spark)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(read.get <= 3 * n + n / 2,
      s"write() read ${read.get} records for an $n-row table — " +
        "the manifest pass is scanning data again")
  }

  test("many-files manifest pass: parallel footer reads keep order and exactness") {
    // the footer pass is a parallel collection over the file list; at 64
    // files the entries must still come out in sorted-file order (par.map
    // preserves order), each with exact bounds — and a box read over the
    // many-file layout stays exact, so parallelism changed nothing but wall
    import spark.implicits._
    val df = (1L to 4096L).map(i => (i, (i % 64).toDouble)).toDF("id", "a")
    val p = "target/zorder-test/many-z"
    ZOrderLayout.write(df, Seq("a"), p, 64)
    val all = ZOrderLayout.filesFor(spark, p,
      Map("a" -> ((Double.MinValue, Double.MaxValue))))
    assert(all.size === 64, s"expected 64 manifest entries, got ${all.size}")
    assert(all === all.sorted, "manifest entries out of file order")
    val got = ZOrderLayout.readBox(spark, p, Map("a" -> ((3.0, 5.0))))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === (1L to 4096L).filter(i => i % 64 >= 3 && i % 64 <= 5).toSet)
    assert(ZOrderLayout.filesFor(spark, p, Map("a" -> ((3.0, 5.0)))).size < 64,
      "narrow box skipped nothing in a 64-file layout")
  }

  test("an all-null clustering column yields no bounds and never prunes rows") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, i.toDouble, Option.empty[Double]))
      .toDF("id", "a", "b")
    val p = "target/zorder-test/null-z"
    ZOrderLayout.write(df, Seq("a", "b"), p, 4)
    // b is all null: no file records b-bounds, so a b-constrained box
    // prunes NOTHING at the file level (missing stats = cannot prune)...
    assert(ZOrderLayout.filesFor(spark, p, Map("b" -> ((0.0, 1.0)))).size === 4)
    // ...and the exact predicate then drops the null rows — zero, not junk
    assert(ZOrderLayout.readBox(spark, p, Map("b" -> ((0.0, 1.0)))).count() === 0L)
    // the populated column still skips and still returns exact rows
    val aFiles = ZOrderLayout.filesFor(spark, p, Map("a" -> ((1.0, 100.0))))
    assert(aFiles.size < 4, s"a-bounds skipped nothing (${aFiles.size} of 4)")
    val got = ZOrderLayout.readBox(spark, p, Map("a" -> ((1.0, 100.0))))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === (1L to 100L).toSet)
  }

  test("excise tombstones rows out of serving immediately, replays as a " +
      "ledger no-op, and folds into the next compact physically") {
    val epath = "target/zorder-test/orders-z-excise"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(epath))
    ZOrderLayout.write(orders, Seq("o_custkey", "o_totalprice"), epath, 8)
    val bounds = Map("o_custkey" -> midBounds("o_custkey"))
    def boxIds() = ZOrderLayout.readBox(spark, epath, bounds)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val survivors = orders
      .filter(col("o_custkey") >= bounds("o_custkey")._1 &&
        col("o_custkey") <= bounds("o_custkey")._2 &&
        col("o_orderkey") % 7 =!= 0)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val ids = orders.filter(col("o_orderkey") % 7 === 0).select("o_orderkey")
    assert(ZOrderLayout.excise(spark, epath, ids, "o_orderkey", "takedown-1"))
    // SERVING path: tombstones honored before any compact, with file
    // skipping still intact (the anti-join rides on the pruned scan)
    assert(boxIds() === survivors,
      "tombstoned rows surfaced through the pre-compact serving path")
    // and the box predicate still reaches the parquet scan THROUGH the
    // anti-join (Catalyst pushes left-side filters below a left_anti) —
    // losing row-group pruning on the unskippable files would be the
    // silent cost of the tombstone filter
    val tombPlan = ZOrderLayout.readBox(spark, epath, bounds)
      .queryExecution.executedPlan.toString
    assert(tombPlan.contains("PushedFilters: [IsNotNull(o_custkey), " +
      "GreaterThanOrEqual(o_custkey"),
      s"box predicate no longer pushed below the tombstone anti-join:\n$tombPlan")
    val everything = Map("o_custkey" -> ((Double.MinValue, Double.MaxValue)))
    assert(ZOrderLayout.filesFor(spark, epath, everything).size === 8,
      "excise must be a metadata write — no data file touched")
    // replayed tag: ledger no-op
    assert(!ZOrderLayout.excise(spark, epath, ids, "o_orderkey", "takedown-1"))
    assert(boxIds() === survivors)
    // a different row identity is refused (one layout, one id column)
    intercept[IllegalArgumentException] {
      ZOrderLayout.excise(spark, epath,
        orders.select(col("o_custkey")), "o_custkey", "takedown-2")
    }
    // an ORPHAN tombstone dir (crash after the data write, before the
    // manifest commit) is invisible: only ledgered tags are served
    val orphanIds = orders.filter(col("o_orderkey") % 7 === 1)
      .select("o_orderkey").limit(50)
    orphanIds.write.mode("overwrite")
      .parquet(s"$epath/_ZORDER_TOMBSTONES/deadbeefdeadbeef")
    assert(boxIds() === survivors,
      "an uncommitted tombstone batch must not shape serving")
    // compact folds the drop in physically and carries BOTH ledgers
    ZOrderLayout.compact(spark, epath, nFiles = 4)
    assert(boxIds() === survivors, "compact lost or resurrected rows")
    assert(!new java.io.File(s"$epath/_ZORDER_TOMBSTONES").exists(),
      "the folded tombstone data must be gone with the old directory")
    assert(!ZOrderLayout.excise(spark, epath, ids, "o_orderkey", "takedown-1"),
      "compact dropped the excise ledger")
    // the id-column pin survives the compact too
    intercept[IllegalArgumentException] {
      ZOrderLayout.excise(spark, epath,
        orders.select(col("o_custkey")), "o_custkey", "takedown-3")
    }
    // a LATER append after the excise keeps the pending-takedown state
    val epath2 = "target/zorder-test/orders-z-excise-append"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(epath2))
    ZOrderLayout.write(orders.filter(col("o_orderkey") % 2 === 1),
      Seq("o_custkey", "o_totalprice"), epath2, 4)
    assert(ZOrderLayout.excise(spark, epath2, ids, "o_orderkey", "td-1"))
    assert(ZOrderLayout.appendTo(orders.filter(col("o_orderkey") % 2 === 0),
      epath2, 2, sourceTag = "day-1"))
    val got2 = ZOrderLayout.readBox(spark, epath2, bounds)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got2 === survivors,
      "an append after an excise must not un-tombstone the takedown")
  }

  test("excise refuses a column the layout doesn't have BEFORE the " +
      "commit point — a typo must not brick every later read") {
    val tpath = "target/zorder-test/orders-z-typo"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tpath))
    val sub = orders.orderBy("o_orderkey").limit(200) // deterministic subset
    ZOrderLayout.write(sub, Seq("o_custkey", "o_totalprice"), tpath, 2)
    val ids = sub.orderBy("o_orderkey").limit(10)
      .select(col("o_orderkey").as("oorderkey")) // the typo'd identity
    val e = intercept[IllegalArgumentException] {
      ZOrderLayout.excise(spark, tpath, ids, "oorderkey", "typo-batch")
    }
    assert(e.getMessage.contains("no column"), e.getMessage)
    // nothing committed: the layout still reads, and a CORRECT excise
    // under a fresh tag is not blocked by a poisoned identity pin
    val bounds = Map("o_custkey" -> ((Double.MinValue, Double.MaxValue)))
    assert(ZOrderLayout.readBox(spark, tpath, bounds).count() === 200L)
    assert(ZOrderLayout.excise(spark, tpath,
      sub.orderBy("o_orderkey").limit(10).select("o_orderkey"),
      "o_orderkey", "real-batch"))
    assert(ZOrderLayout.readBox(spark, tpath, bounds).count() === 190L)
  }

  test("rehome points a byte-copied layout's manifest at its own files") {
    val src = "target/zorder-test/orders-z-clone-src"
    val dst = "target/zorder-test/orders-z-clone-dst"
    Seq(src, dst).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    val sub = orders.orderBy("o_orderkey").limit(300) // deterministic subset
    ZOrderLayout.write(sub, Seq("o_custkey", "o_totalprice"), src, 4)
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(src), new java.io.File(dst))
    // before rehome the copied manifest still names the SOURCE's files
    assert(ZOrderLayout.filesFor(spark, dst, Map.empty)
      .forall(_.contains("orders-z-clone-src")))
    ZOrderLayout.rehome(spark, dst)
    val files = ZOrderLayout.filesFor(spark, dst, Map.empty)
    assert(files.nonEmpty && files.forall(_.contains("orders-z-clone-dst")),
      s"rehome must move every entry to the clone's directory: $files")
    // the decisive proof: delete the source — the clone must still serve
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    val bounds = Map("o_custkey" -> ((Double.MinValue, Double.MaxValue)))
    assert(ZOrderLayout.readBox(spark, dst, bounds).count() === 300L)
    // and the maintenance chain over the re-homed clone stays whole
    assert(ZOrderLayout.excise(spark, dst,
      sub.orderBy("o_orderkey").limit(20).select("o_orderkey"),
      "o_orderkey", "clone-td"))
    ZOrderLayout.compact(spark, dst, nFiles = 2)
    assert(ZOrderLayout.readBox(spark, dst, bounds).count() === 280L)
  }
}
