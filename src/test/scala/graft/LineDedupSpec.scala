package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Line-level exact dedup (the CCNet / RefinedWeb boilerplate-line step):
  * planted multi-line corpora pin the guarantee — a line repeated across
  * documents is reported with its corpus-wide count and globally first
  * occurrence, excision drops every non-first (or every, under the CCNet
  * keepFirst=false convention) occurrence, empty lines are never counted
  * or excised, and the delimiter is caller-chosen. */
class LineDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val banner = "accept all cookies to continue"
  private val nav = "home products about contact"

  private lazy val planted = Seq(
    (1L, s"$banner\nunique first body\n$nav"),
    (2L, s"intro two\n$banner\nclosing two"),
    (3L, s"$nav\n\nsolo three\n$banner"),
    (4L, "entirely original page\nnothing shared here")
  ).toDF("doc_id", "text")

  test("duplicate lines report corpus count and globally first occurrence") {
    val dup = Dedup.duplicateLines(planted, "doc_id", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(dup.size == 2)
    assert(dup(md5Hex(banner)) == ((3L, 1L, 1L)))
    assert(dup(md5Hex(nav)) == ((2L, 1L, 3L)))
  }

  test("excision keeps the globally first occurrence and drops the rest") {
    val out = Dedup.exciseDupLines(planted, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    // doc 1 holds the first occurrence of both duplicated lines — whole
    assert(out(1L) == ((3, 0, 3, md5Hex(s"$banner\nunique first body\n$nav"))))
    assert(out(2L) == ((3, 1, 2, md5Hex("intro two\nclosing two"))))
    // doc 3: nav (dup of doc 1 line 3) and banner both excised; the empty
    // line is untouched and keeps its slot in the rejoined stream
    assert(out(3L) == ((4, 2, 2, md5Hex("\nsolo three"))))
    assert(out(4L) == ((2, 0, 2,
      md5Hex("entirely original page\nnothing shared here"))))
  }

  test("keepFirst=false drops every occurrence (the CCNet convention)") {
    val out = Dedup.exciseDupLines(planted, "doc_id", "text",
        keepFirst = false)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getString(4)))).toMap
    assert(out(1L) == ((2, md5Hex("unique first body"))))
    assert(out(2L) == ((1, md5Hex("intro two\nclosing two"))))
    assert(out(3L) == ((2, md5Hex("\nsolo three"))))
    assert(out(4L) == ((0,
      md5Hex("entirely original page\nnothing shared here"))))
  }

  test("empty lines are never counted as duplicates") {
    val df = Seq(
      (1L, "a\n\nb"),
      (2L, "c\n\nd"),
      (3L, "e\n\n\nf")
    ).toDF("doc_id", "text")
    assert(Dedup.duplicateLines(df, "doc_id", "text").count() == 0)
    val out = Dedup.exciseDupLines(df, "doc_id", "text").collect()
    assert(out.forall(_.getInt(2) == 0))
  }

  test("custom delimiter splits on the literal string, not a regex") {
    // '|' is a regex alternation metachar — a raw-regex split would
    // explode every character; the quoted literal split must not
    val df = Seq(
      (1L, "shared seg|only one"),
      (2L, "shared seg|only two"),
      (3L, "lone page")
    ).toDF("doc_id", "text")
    val dup = Dedup.duplicateLines(df, "doc_id", "text", delim = "|")
      .collect()
    assert(dup.map(_.getString(0)).toSeq == Seq(md5Hex("shared seg")))
    val out = Dedup.exciseDupLines(df, "doc_id", "text", delim = "|")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getString(4)))).toMap
    assert(out(1L) == ((0, md5Hex("shared seg|only one"))))
    assert(out(2L) == ((1, md5Hex("only two"))))
    assert(out(3L) == ((0, md5Hex("lone page"))))
  }

  test("minOcc raises the duplication bar") {
    val dup = Dedup.duplicateLines(planted, "doc_id", "text", minOcc = 3)
      .collect()
    assert(dup.map(_.getString(0)).toSeq == Seq(md5Hex(banner)))
    // nav occurs only twice: at minOcc=3 it survives excision everywhere
    val out = Dedup.exciseDupLines(planted, "doc_id", "text", minOcc = 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("precomputed detection table + cached bloom reproduce the one-shot path") {
    // the query layer persists ONE duplicateLines table (+ its bloom
    // literal) and feeds both detection and repair — the split must be
    // invisible in the output (r21: exciseDupLines now delegates, and
    // the bloom can ride in precomputed)
    val dups = Dedup.duplicateLines(planted, "doc_id", "text")
    val bloom = Dedup.dupLinesBloom(dups)
    assert(bloom.isDefined, "planted corpus has duplicated lines")
    val oneShot = Dedup.exciseDupLines(planted, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val split = Dedup.exciseDupLinesWith(planted, "doc_id", "text", dups)
      .orderBy("doc_id").collect().toSeq
    val cachedBloom = Dedup.exciseDupLinesWith(planted, "doc_id", "text",
        dups, bloom = Some(bloom))
      .orderBy("doc_id").collect().toSeq
    assert(split === oneShot)
    assert(cachedBloom === oneShot)
    // a dup-free corpus yields no bloom and a whole pass-through
    val clean = Seq((9L, "only page\nno repeats")).toDF("doc_id", "text")
    assert(Dedup.dupLinesBloom(Dedup.duplicateLines(clean, "doc_id", "text"))
      .isEmpty)
  }

  test("a corpus with no duplicated lines passes through whole") {
    val df = Seq((1L, "a\nb"), (2L, "c\nd")).toDF("doc_id", "text")
    val out = Dedup.exciseDupLines(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(0, 0))
    assert(out.map(_.getString(4)).toSeq ==
      Seq(md5Hex("a\nb"), md5Hex("c\nd")))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
