package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.CatalogScanner

/** The chunked (27 per-letter scans) catalog fallback must produce exactly
  * the full scan's rows. Order parity holds for letter-leading names
  * (the fixture): the full scan sorts globally, chunks iterate `_`,A-Z in
  * order and are sorted within. For `_`-prefixed tables the two orders
  * legitimately DIFFER — ASCII sorts `_` after `Z` so the full scan puts
  * them last while the chunk sequence emits them first — exactly as in
  * the reference, whose `ORDER BY TABLE_NAME` full query and `_`-first
  * chunk loop disagree the same way (builder.py:101-147). */
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
