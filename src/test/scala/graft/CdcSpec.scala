package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CdcChunking, Multimodal}

/** Content-defined chunking: reference-impl parity, the shift-invariance
  * property that is CDC's whole reason to exist, FastCDC min/max
  * normalization, SQL-registry exposure, and edge cases. */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Plain-Scala reference of the stateless Gear cut rule. */
  private def refCuts(bytes: Array[Byte], maskBits: Int): Seq[Int] = {
    val mask = (1L << maskBits) - 1
    var h = 0L
    val out = Seq.newBuilder[Int]
    for (i <- bytes.indices) {
      h = ((h << 1) + (bytes(i) & 0xffL) * 2654435761L) & mask
      if (h == 0L && i + 1 < bytes.length) out += (i + 1)
    }
    out.result()
  }

  /** FastCDC-mode reference: hash restarts per chunk, first minSize-1
    * bytes skipped, forced cut at maxSize. */
  private def refCutsNormalized(bytes: Array[Byte], maskBits: Int,
      minSize: Int, maxSize: Int): Seq[Int] = {
    val mask = (1L << maskBits) - 1
    var h = 0L
    var len = 0
    val out = Seq.newBuilder[Int]
    for (i <- bytes.indices) {
      len += 1
      if (len >= minSize) {
        h = ((h << 1) + (bytes(i) & 0xffL) * 2654435761L) & mask
        if ((h == 0L || (maxSize > 0 && len >= maxSize)) && i + 1 < bytes.length) {
          out += (i + 1); h = 0L; len = 0
        }
      }
    }
    out.result()
  }

  private def engineCuts(texts: Seq[String], maskBits: Int,
      minSize: Int = 1, maxSize: Int = 0): Map[Long, Seq[Int]] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        CdcChunking.gearChunkEnds(col("text").cast("binary"), maskBits,
          minSize, maxSize).as("cuts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
  }

  test("cut positions match the scala reference on random ascii payloads") {
    val rnd = new scala.util.Random(7)
    val texts = (0 until 50).map { _ =>
      (0 until (20 + rnd.nextInt(400))).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val got = engineCuts(texts, maskBits = 6)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refCuts(t.getBytes("UTF-8"), 6),
        s"doc $i cut mismatch")
    }
  }

  test("cut positions match the reference on full-byte-range binary payloads") {
    // the corpus fixture is ASCII, but the expression must be pinned over
    // all 256 byte values (negative JVM bytes, 0x00, 0xff) — a sign-
    // extension bug in gear() would only surface here
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val payloads = (0 until 40).map { i =>
      val b = new Array[Byte](30 + rnd.nextInt(500)); rnd.nextBytes(b); (i.toLong, b)
    }
    val got = payloads.toDF("doc_id", "payload")
      .select(col("doc_id"),
        CdcChunking.gearChunkEnds(col("payload"), 6).as("cuts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    payloads.foreach { case (id, b) =>
      assert(got(id) == refCuts(b, 6), s"payload $id cut mismatch on binary bytes")
    }
  }

  test("expected chunk length tracks 2^maskBits") {
    val rnd = new scala.util.Random(11)
    val text = (0 until 20000).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    val cuts = engineCuts(Seq(text), maskBits = 6)(0L)
    val avg = text.length.toDouble / (cuts.size + 1)
    assert(avg > 32 && avg < 128, s"avg chunk $avg far from 64")
  }

  test("shift invariance: cuts past the edit region survive a prefix insertion") {
    val rnd = new scala.util.Random(13)
    val base = (0 until 2000).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    val shifted = "INSERTED-PREFIX-" + base
    val d = shifted.length - base.length
    val Seq(c0, c1) = Seq(0L, 1L).map(engineCuts(Seq(base, shifted), 6))
    // every base cut beyond the first maskBits bytes reappears shifted by d
    val survivors = c0.filter(_ > 6).map(_ + d).toSet
    assert(survivors.subsetOf(c1.toSet),
      s"cuts moved outside the edit window: ${survivors.diff(c1.toSet)}")
    // and the identical suffix therefore yields identical chunk hashes:
    // every interior chunk of base (both ends at surviving cuts) is a
    // chunk of shifted too
    def chunkSet(text: String, cuts: Seq[Int]): Set[String] = {
      val bounds = (0 +: cuts) :+ text.length
      bounds.sliding(2).map { case Seq(s, e) =>
        val md = MessageDigest.getInstance("MD5")
        md.digest(text.substring(s, e).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.toSet
    }
    val sharedHashes = chunkSet(base, c0).intersect(chunkSet(shifted, c1))
    assert(sharedHashes.size >= c0.count(_ > 6) - 1,
      "shared suffix did not re-synchronize to shared chunk hashes")
  }

  test("fastcdc mode: min size respected, max size forced, matches reference") {
    val rnd = new scala.util.Random(17)
    val texts = (0 until 30).map { _ =>
      (0 until (50 + rnd.nextInt(500))).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val (minS, maxS) = (16, 128)
    val got = engineCuts(texts, 6, minS, maxS)
    texts.zipWithIndex.foreach { case (t, i) =>
      val cuts = got(i.toLong)
      assert(cuts == refCutsNormalized(t.getBytes("UTF-8"), 6, minS, maxS))
      val bounds = (0 +: cuts) :+ t.length
      val lens = bounds.sliding(2).map { case Seq(s, e) => e - s }.toSeq
      // every chunk but the last obeys [minS, maxS]; the tail may be short
      assert(lens.dropRight(1).forall(l => l >= minS && l <= maxS),
        s"doc $i chunk lengths $lens violate [$minS,$maxS]")
    }
  }

  test("edge cases: empty, single byte, all-identical bytes") {
    assert(engineCuts(Seq(""), 6)(0L).isEmpty)
    assert(engineCuts(Seq("x"), 6)(0L).isEmpty)
    // constant payload: either no cuts or perfectly periodic ones, and
    // never a cut at the final position
    val cuts = engineCuts(Seq("a" * 500), 6)(0L)
    assert(!cuts.contains(500))
    if (cuts.size >= 2) {
      val gaps = cuts.sliding(2).map { case Seq(a, b) => b - a }.toSet
      assert(gaps.size == 1, s"constant input must cut periodically: $cuts")
    }
  }

  test("chunkTable reassembles the payload exactly; md5s match a direct digest") {
    import spark.implicits._
    val texts = Seq("the quick brown fox jumps over the lazy dog " * 8,
      "short doc", "a" * 200)
    val media = Multimodal.asMediaTable(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "t", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = CdcChunking.chunkTable(media, maskBits = 6)
      .orderBy("doc_id", "chunk_no").collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      val mine = rows.filter(_.getLong(0) == i.toLong)
      // offsets tile [1, n] with no gaps or overlaps
      assert(mine.head.getInt(2) == 1)
      assert(mine.map(r => r.getInt(3)).sum == t.length)
      mine.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getInt(2) == a.getInt(2) + a.getInt(3), "offset gap")
        case _ =>
      }
      // each chunk_md5 is the digest of the substring it claims
      mine.foreach { r =>
        val s = r.getInt(2) - 1; val l = r.getInt(3)
        val md = MessageDigest.getInstance("MD5")
        val want = md.digest(t.substring(s, s + l).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(r.getString(4) == want, s"md5 mismatch doc $i chunk ${r.getLong(1)}")
      }
    }
  }

  test("empty payloads yield zero chunk rows, never a shared phantom chunk") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(
      Seq((1L, "", "en", "t", 0L), (2L, "", "en", "t", 0L), (3L, "real text here", "en", "t", 14L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val chunks = CdcChunking.chunkTable(media, 6)
    assert(chunks.filter(col("doc_id") =!= 3L).count() == 0,
      "empty payloads must contribute no chunk rows")
    assert(CdcChunking.dupChunkGroups(chunks).count() == 0,
      "two content-free docs must not read as sharing a duplicate chunk")
  }

  test("dupChunkGroups finds the shared passage between two edited copies") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val core = (0 until 600).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    val docs = Seq((1L, "PREAMBLE-A " + core), (2L, "B " + core + " EPILOGUE"))
    val media = Multimodal.asMediaTable(
      docs.map { case (id, t) => (id, t, "en", "t", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val dups = CdcChunking.dupChunkGroups(CdcChunking.chunkTable(media, 6))
      .filter(col("chunk_len") >= 16).collect()
    assert(dups.nonEmpty, "600 shared bytes must produce shared chunks")
    assert(dups.forall(_.getLong(2) == 2L), "each dup group spans both docs")
  }

  test("chunkOverlapPairs surfaces the revision pair, ignores unrelated docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    def rand(n: Int) = (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    val core = rand(600)
    val docs = Seq(
      (1L, "PREFIX-EDIT " + core),     // revision pair: shared 600-byte core
      (2L, core + " SUFFIX-EDIT"),
      (3L, rand(600)))                 // unrelated — must not pair
    val media = Multimodal.asMediaTable(
      docs.map { case (id, t) => (id, t, "en", "t", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val pairs = CdcChunking.chunkOverlapPairs(
      CdcChunking.chunkTable(media, 6)).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val p = pairs.head
    assert(p.getLong(2) >= 2, "revision pair must share >= 2 chunks")
    // shared count can never exceed either side's substantial-chunk count
    assert(p.getLong(2) <= math.min(p.getLong(3), p.getLong(4)))
  }

  test("corpusOverlapReport invariants: totality, bounds, corpus-growth monotonicity") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    def rand(n: Int) = (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    val shared = rand(1500)
    def mediaOf(rows: Seq[(Long, String)]) = Multimodal.asMediaTable(
      rows.map { case (id, t) => (id, t, "en", "t", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val arrivals = Seq(
      (1L, "edit-a " + shared),          // revision of corpus content
      (2L, rand(300)),                   // fresh
      (3L, "tiny"))                      // no substantial chunks at all
    val arrChunks = CdcChunking.chunkTable(mediaOf(arrivals), 6)
    val corpusSmall = CdcChunking.chunkTable(mediaOf(Seq((100L, rand(300)))), 6)
    val corpusBig = CdcChunking.chunkTable(mediaOf(Seq(
      (100L, rand(300)), (101L, "other-lead-in " + shared + " edit-b"))), 6)
    def reportMap(corpus: org.apache.spark.sql.DataFrame) =
      CdcChunking.corpusOverlapReport(arrChunks, corpus).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val small = reportMap(corpusSmall)
    val big = reportMap(corpusBig)
    // totality: every arriving doc gets exactly one verdict row
    assert(small.keySet == Set(1L, 2L, 3L) && big.keySet == small.keySet)
    // bound: n_shared can never exceed the doc's own substantial count
    val subCount = arrChunks.filter(col("chunk_len") >= 16)
      .select("doc_id", "chunk_md5").distinct()
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    big.foreach { case (id, (n, _)) =>
      assert(n <= subCount.getOrElse(id, 0L), s"doc $id shares more than it has") }
    // chunkless docs trivially keep with zero overlap
    assert(small(3L) == ((0L, true)))
    // monotonicity: growing the corpus can only raise n_shared / flip keep->drop
    Seq(1L, 2L, 3L).foreach { id =>
      assert(big(id)._1 >= small(id)._1, s"doc $id lost overlap on corpus growth")
      assert(!(big(id)._2 && !small(id)._2), s"doc $id flipped drop->keep on corpus growth")
    }
    // the planted revision is dropped once its source enters the corpus
    assert(small(1L)._2, "revision must keep against an unrelated corpus")
    assert(!big(1L)._2, "revision must drop once its original is in the corpus")
  }

  test("sql registry exposes gear_chunk_ends and agrees with the column api") {
    import spark.implicits._
    graft.plans.GraftExtensions.registerSqlFunctions(spark)
    Seq((1L, "content defined chunking via sql " * 10)).toDF("doc_id", "text")
      .createOrReplaceTempView("cdc_sql_probe")
    val viaSql = spark.sql(
      "SELECT gear_chunk_ends(cast(text AS binary), 6) AS cuts FROM cdc_sql_probe")
      .head().getSeq[Int](0)
    val viaCol = engineCuts(Seq("content defined chunking via sql " * 10), 6)(0L)
    assert(viaSql == viaCol)
  }

  test("frame sampling: hex probe matches direct byte access, empty past end") {
    import spark.implicits._
    // n = 128 exactly: frames 0,1,2 with frame 2 probing byte 129 -> ''
    val t = "ab" * 64
    val media = Multimodal.asMediaTable(
      Seq((9L, t, "en", "t", t.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Multimodal.sampleFrames(media, stride = 64, maxFrames = 8)
      .select(col("doc_id"), explode(col("frames")).as("f"))
      .select(col("f.frame_no"), hex(col("f.sample")).as("hx"))
      .orderBy("frame_no").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(rows(0).getString(1) == "61") // 'a'
    assert(rows(1).getString(1) == "61") // byte 65 is 'a' again
    assert(rows(2).getString(1) == "")   // one past the end
  }
}
