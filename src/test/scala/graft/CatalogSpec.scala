package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CatalogScanner

/** The chunked (27 per-letter scans) catalog fallback must produce exactly
  * the full scan's rows — same tables, columns, ordinals, and order (both
  * are table-name sorted: full scan sorts globally, chunks iterate `_`,A-Z
  * in order and are sorted within). */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chunked per-letter catalog equals the full scan") {
    val banned = Seq("c_phone")
    val full = CatalogScanner.fetchFullCatalog(spark, TestSpark.sfDir, banned)
    val chunked = CatalogScanner.fetchCatalogByLetter(spark, TestSpark.sfDir, banned)
    assert(chunked == full)
    assert(full.nonEmpty)
    assert(!full.exists(_.columnName == "c_phone"))
  }
}
