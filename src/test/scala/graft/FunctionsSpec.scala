package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.SimHash64
import graft.functions.functions.simhash64
import graft.operators.Multimodal

/** Native expression + multimodal plumbing unit tests. */
class FunctionsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("simhash64: identical token sets hash identically; near sets are close") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words entirely unrelated content here now")
    ).toDF("id", "text").withColumn("h", simhash64(split(col("text"), " ")))
    val h = df.select("id", "h").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    val near = SimHash64.hamming(h(1L), h(3L))
    val far = SimHash64.hamming(h(1L), h(4L))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 16)
  }

  test("simhash64: interpreted eval agrees with codegen") {
    val df = Seq(Tuple1("alpha beta gamma delta epsilon")).toDF("text")
      .withColumn("toks", split(col("text"), " "))
    val viaCodegen = df.withColumn("h", simhash64(col("toks")))
      .select("h").collect()(0).getLong(0)
    // interpreted path
    val toks = "alpha beta gamma delta epsilon".split(" ")
    val arrData = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString))
    val viaEval = SimHash64.compute(arrData)
    assert(viaCodegen == viaEval)
  }

  test("multimodal decode stub: typed features via mapPartitions") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val media = Multimodal.asMediaTable(docs)
    val feats = Multimodal.decodeFeatures(spark, media)
    val row = feats.filter(_.doc_id == 0L).collect()(0)
    assert(row.channels == 3)
    assert(row.n_pixels == row.width.toLong * row.height * 3)
    assert(feats.count() == docs.count())
  }

  test("multimodal frame sampling produces bounded frame arrays") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val media = Multimodal.asMediaTable(docs)
    val framed = Multimodal.sampleFrames(media, stride = 64, maxFrames = 8)
    val sizes = framed.select(size(col("frames")).as("nf")).agg(
      min("nf"), max("nf")).collect()(0)
    assert(sizes.getInt(0) >= 1 && sizes.getInt(1) <= 8)
  }

  test("shingle_rows generator equals explode(word_shingles) row-for-row") {
    import graft.functions.functions.{shingle_rows, word_shingles}
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .withColumn("w", split(lower(col("text")), " "))
      .filter(size(col("w")) >= 3)
    val viaGen = docs.select(col("doc_id"), shingle_rows(col("w"), 3).as("s"))
      .as[(Long, String)].collect().toSeq
    val viaExplode = docs
      .select(col("doc_id"), explode(word_shingles(col("w"), 3)).as("s"))
      .as[(Long, String)].collect().toSeq
    assert(viaGen == viaExplode) // same rows AND same first-occurrence order
    assert(viaGen.nonEmpty)
  }

  test("pii-scrub email regex keeps its literal dot on the DataFrame API path") {
    // regression guard: routing this pattern through expr() would strip
    // the \. at SQL string-literal parse time, turning the dot into a
    // wildcard — 'a@b!de' must NOT count as an email
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val df = Seq("mail a@b!de here", "mail a@b.de here").toDF("text")
    val n = df.select(size(regexp_extract_all(lower(col("text")), lit(emailRe), lit(0))))
      .as[Int].collect()
    assert(n.toSeq == Seq(0, 1))
  }

  test("normalize_text: NFC composition, accent stripping, SQL surface") {
    import graft.functions.functions.{nfc_normalize, strip_accents}
    val composed = "café"    // é as one codepoint
    val decomposed = "café" // e + combining acute
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
    val nfc = df.select(nfc_normalize(col("t"))).as[String].collect()
    // both representations canonicalize to the SAME codepoints
    assert(nfc(0) == nfc(1) && nfc(0) == composed)
    val stripped = df.select(strip_accents(col("t"))).as[String].collect()
    assert(stripped.toSeq == Seq("cafe", "cafe"))
    // dedup relevance: fingerprints agree only after canonicalization
    assert(md5Str(composed) != md5Str(decomposed))
    assert(md5Str(nfc(0)) == md5Str(nfc(1)))
    // SQL surface via the extension registry
    graft.plans.GraftExtensions.install(spark)
    df.createOrReplaceTempView("norm_t")
    val viaSql = spark.sql("SELECT strip_accents(nfc_normalize(t)) FROM norm_t")
      .as[String].collect()
    assert(viaSql.toSeq == Seq("cafe", "cafe"))
  }

  private def md5Str(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("shingle_rows is SQL-callable via the extension registry") {
    graft.plans.GraftExtensions.install(spark)
    Tables.load(spark, TestSpark.sfDir, "documents").createOrReplaceTempView("docs_sql")
    val n = spark.sql(
      """SELECT doc_id, shingle_rows(split(lower(text), ' '), 3) AS s
        |FROM docs_sql WHERE size(split(lower(text), ' ')) >= 3""".stripMargin)
      .count()
    assert(n > 0)
  }

  test("CosineMaxBlock: max-vs-block equals the pairwise join max " +
      "(empty block null, NaN wins, round6-after-max == max-of-round6)") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def vec(xs: Double*): GenericArrayData =
      new GenericArrayData(xs.map(_.asInstanceOf[Any]).toArray)
    def entry(xs: Seq[Double]): Any = {
      val nrm = math.sqrt(xs.map(x => x * x).sum)
      new GenericInternalRow(Array[Any](vec(xs: _*), nrm))
    }
    val probe = Seq(0.4, -0.3, 0.8)
    val pn = math.sqrt(probe.map(x => x * x).sum)
    val evs = Seq(Seq(0.1, 0.9, -0.2), Seq(0.5, 0.5, 0.5), Seq(-0.4, 0.3, -0.8))
    val block = new GenericArrayData(evs.map(entry).toArray)
    val got = graft.functions.CosineMaxBlock.score(vec(probe: _*), pn, block,
      probeFloat = false, blockFloat = false)
    // reference: the former join formulation's per-pair cosine then max
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val ref = evs.map { e =>
      dot(probe, e) / (pn * math.sqrt(e.map(x => x * x).sum))
    }.max
    assert(got != null && got.doubleValue() === ref)
    // round6 is monotone, so rounding the max equals the max of roundeds
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(r6(got.doubleValue()) === evs.map { e =>
      r6(dot(probe, e) / (pn * math.sqrt(e.map(x => x * x).sum)))
    }.max)
    // empty block: null (the join's max-over-zero-rows), not 0 or -inf
    assert(graft.functions.CosineMaxBlock.score(vec(probe: _*), pn,
      new GenericArrayData(Array.empty[Any]), false, false) == null)
    // a zero-norm block entry scores NaN and NaN wins the max, exactly
    // as Spark's nan-safe max orders NaN above every double
    val withZero = new GenericArrayData((evs :+ Seq(0.0, 0.0, 0.0)).map(entry).toArray)
    val nan = graft.functions.CosineMaxBlock.score(vec(probe: _*), pn,
      withZero, false, false)
    assert(nan != null && nan.doubleValue().isNaN)
  }
}
