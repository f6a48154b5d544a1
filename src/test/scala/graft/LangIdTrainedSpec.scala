package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{QualityClassifier, TextAnalysis}

/** Trained char-trigram language ID (the fastText-lid shape): the
  * feature extraction, the hand-computed NB decision arithmetic over
  * char-n-gram features, and — on a REAL multi-language fixture, which
  * the synthetic corpus deliberately is not — agreement with both the
  * ground-truth label and the marker-argmax heuristic path. */
class LangIdTrainedSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("charNgrams: ordered positional substrings; short texts yield empty, not phantom grams") {
    val rows = Seq("Abcd", "xyz", "ab", "", "aaa")
      .toDF("t")
      .select(TextAnalysis.charNgrams(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("abc", "bcd")) // lowercased, in order
    assert(rows(1) == Seq("xyz"))
    // len < n: sequence(1, len-2) would count DOWN without the guard
    assert(rows(2) == Seq.empty)
    assert(rows(3) == Seq.empty)
    assert(rows(4) == Seq("aaa"))
  }

  test("native charNgrams matches the HOF formulation on multi-byte text") {
    import org.apache.spark.sql.Column
    // the composable chain the kernel replaces (and the DuckDB oracle
    // comprehension mirrors): lowercase, then every width-n CODE-POINT
    // window — so accented/CJK/astral chars must slice identically
    def hof(text: Column, n: Int): Column = {
      val t = lower(text)
      when(length(t) >= n,
        transform(sequence(lit(1), length(t) - lit(n - 1)),
          i => t.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    }
    val fixtures = Seq(
      "Árbol pequeño", "über Straße", "日本語のテキスト", "naïve café",
      "a日b語c", "𝔘nicode astral 𝄞 plane", "MIXED case ASCII text", "日本", "日本語",
      // lowercasing CHANGES the code-point count here (U+0130 'İ' maps
      // to 'i' + combining dot): positions must follow the LOWERCASED
      // length on both sides, the documented kernel contract
      "İstanbul İZMİR", "ẞharp")
    for (n <- Seq(1, 2, 3, 5)) {
      val out = fixtures.toDF("t")
        .select(TextAnalysis.charNgrams(col("t"), n).as("a"), hof(col("t"), n).as("b"))
        .collect()
      out.zip(fixtures).foreach { case (r, f) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n text=$f")
      }
    }
  }

  test("hand-computed NB scores over char-trigram features, tie to label order") {
    // model: class a trained on "aba" (1 gram), class b on "bcb" (1 gram)
    // -> classes (a: n_docs=1, tot=1), (b: 1, 1); vocab v=2
    val seed = Seq(("aba", "a"), ("bcb", "b")).toDF("text", "label")
    val clf = QualityClassifier.trainFeatures(seed,
      TextAnalysis.charNgrams(col("text"), 3), "label")
    assert(clf.v == 2)
    // "abab" -> grams aba, bab (n=2).
    //   a: s = 1*1 = 1, num = 3, den = 1+2 = 3 -> dscore 1.0,   p = 1.0
    //   b: s = 0,       num = 2, den = 3       -> dscore 0.667, p = 0.666667
    // "ccc" -> gram ccc (n=1): both classes num=1, den=3 -> TIE -> label 'a'
    val out = clf.scoreFeatures(Seq((1L, "abab"), (2L, "ccc")).toDF("id", "text"),
        "id", TextAnalysis.charNgrams(col("text"), 3))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 2L && out(0).getString(2) == "a"
      && out(0).getDouble(3) == 1.0, out(0).toString)
    assert(out(1).getLong(1) == 1L && out(1).getString(2) == "a"
      && out(1).getDouble(3) == math.round(1.0 / 3.0 * 1e6) / 1e6,
      out(1).toString)
  }

  test("trained path agrees with ground truth AND the marker path on real languages") {
    val train = Seq(
      ("the cat is of the house and the dog is of the barn", "en"),
      ("the mouse and the bird is of the field and the sky", "en"),
      ("el gato la casa de que el perro la cosa de que si", "es"),
      ("el rio la mesa de que el libro la calle de que no", "es"),
      ("le chat les maisons et des chiens le pain et des vins", "fr"),
      ("le monde les villes et des fleurs le chien et des rues", "fr"),
      ("der hund die katze und ist der haus die maus und ist", "de"),
      ("der wald die stadt und ist der berg die nacht und ist", "de"))
      .toDF("text", "lang")
    val heldOut = Seq(
      (1L, "the fox is of the den and the owl is of the tree", "en"),
      (2L, "el sol la luna de que el mar la isla de que", "es"),
      (3L, "le soir les routes et des ponts le jour et des gares", "fr"),
      (4L, "der fluss die wiese und ist der turm die wolke und ist", "de"))
      .toDF("doc_id", "text", "lang")
    val clf = QualityClassifier.trainFeatures(train,
      TextAnalysis.charNgrams(col("text"), 3), "lang")
    val scored = clf.scoreFeatures(heldOut, "doc_id",
        TextAnalysis.charNgrams(col("text"), 3))
      .join(heldOut.select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("marker_pred")), "doc_id")
      .orderBy("doc_id").collect()
    assert(scored.length == 4)
    scored.foreach { r =>
      val (pred, truth, marker) =
        (r.getString(2), r.getString(4), r.getString(5))
      assert(pred == truth, s"trained lang-id missed: $r")
      assert(marker == truth, s"fixture must be marker-identifiable: $r")
      assert(pred == marker, s"trained vs marker disagree: $r")
    }
  }

  test("token-feature delegation preserves the original classifier exactly") {
    // train/score via the string API and via explicit token features must
    // be the same computation (the r14 generalization must not perturb
    // the green classifier_* rows)
    val seed = Seq(("big data rows", "x"), ("small fast keys", "y"))
      .toDF("text", "label")
    val docs = Seq((1L, "big fast rows"), (2L, "tiny data")).toDF("id", "text")
    val a = QualityClassifier.train(seed, "text", "label")
      .score(docs, "id", "text").orderBy("id").collect()
    val b = QualityClassifier
      .trainFeatures(seed, split(lower(col("text")), " "), "label")
      .scoreFeatures(docs, "id", split(lower(col("text")), " "))
      .orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }
}
