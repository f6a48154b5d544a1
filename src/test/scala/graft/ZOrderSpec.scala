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

  test("empty box intersects no files and returns no rows") {
    writtenOnce
    val bounds = Map("o_custkey" -> (-10.0, -5.0))
    assert(ZOrderLayout.filesFor(spark, zpath, bounds).isEmpty)
    assert(ZOrderLayout.readBox(spark, zpath, bounds).count() === 0L)
  }
}
