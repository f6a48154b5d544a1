package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Versioning

/** Snapshot diff: all four change classes from one planted pair of
  * versions, and the bounded summary view. */
class VersioningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("every change class lands, keyed by id") {
    val v1 = Seq((1L, "same"), (2L, "old text"), (3L, "goes away"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new text"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val out = Versioning.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "modified",
      3L -> "removed", 4L -> "added"))
    val summary = Versioning.diffSummary(v1, v2, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary == Map("added" -> 1L, "modified" -> 1L,
      "removed" -> 1L, "unchanged" -> 1L))
  }

  test("null payloads classify by membership, not hash nullity") {
    // id 1 exists in BOTH versions with a null payload: unchanged, not
    // added; id 2's payload goes null: modified
    val v1 = Seq((1L, null.asInstanceOf[String]), (2L, "text"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Versioning.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "modified"))
  }

  test("identical snapshots diff to all-unchanged") {
    val v = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val classes = Versioning.snapshotDiff(v, v, "doc_id", "text")
      .select("change").distinct().collect().map(_.getString(0)).toSeq
    assert(classes == Seq("unchanged"))
  }
}
