package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Library-facing text-analysis column functions (all codegen'd built-ins,
  * no UDFs): tokenization, marker scoring, language ID, quality scoring,
  * regex token counts, fingerprinting. `graft.queries.TextQueries` wraps
  * these for the driver surface. */
object TextAnalysis {

  val enMarkers: Seq[String] = Seq("the", "and", "is", "of")
  val esMarkers: Seq[String] = Seq("el", "la", "de", "que")
  val frMarkers: Seq[String] = Seq("le", "les", "et", "des")
  val deMarkers: Seq[String] = Seq("der", "die", "und", "ist")
  val stopwords: Seq[String] = Seq("the", "and", "is", "of", "to", "a", "in")

  def tokens(text: Column): Column = split(lower(text), " ")

  /** How many tokens fall in the marker list (with multiplicity). */
  def markerScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers)))

  /** Priority-argmax language ID over the marker scores (en>es>fr>de>und). */
  def langId(text: Column): Column = {
    val (en, es, fr, de) = (markerScore(text, enMarkers), markerScore(text, esMarkers),
      markerScore(text, frMarkers), markerScore(text, deMarkers))
    when(en > 0 && en >= es && en >= fr && en >= de, "en")
      .when(es > 0 && es >= fr && es >= de, "es")
      .when(fr > 0 && fr >= de, "fr")
      .when(de > 0, "de")
      .otherwise("und")
  }

  def stopwordRatio(text: Column): Column =
    markerScore(text, stopwords) / size(tokens(text)).cast("double")

  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")) / size(tokens(text)).cast("double")

  /** Linear quality blend in [0,1]; arithmetic-only so it is reproducible
    * bit-for-bit across engines. */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text)).cast("double")
    val lenShape = lit(1.0) - least(abs(avgTokenLen(text) - 5.0) / 5.0, lit(1.0))
    val sizeSat = least(nTok / 100.0, lit(1.0))
    least(lit(0.3) * stopwordRatio(text) + lit(0.3) * sizeSat + lit(0.4) * lenShape,
      lit(1.0))
  }

  /** md5 of whitespace-normalized lowercase content. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Sliding-window document chunking (the step before embedding in a
    * retrieval/RAG pipeline): fixed `size`-char windows advancing by
    * `size - overlap`, so consecutive chunks share `overlap` chars of
    * context. One `explode(sequence(...))` per document — row-per-chunk
    * with no UDF and no driver involvement; a document's chunk count is
    * `ceil(max(len - overlap, 1) / step)`, so short documents yield
    * exactly one chunk. Returns (idCol, chunk_idx, chunk, n_chunks).
    */
  def chunkDocuments(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, size: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val nChunks = ceil(greatest(length(col(textCol)) - overlap, lit(1))
      .cast("double") / step).cast("long")
    df.select(col(idCol), col(textCol).as("__text"), nChunks.as("n_chunks"))
      .select(col(idCol), col("n_chunks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"),
        col("__text"))
      .select(col(idCol), col("chunk_idx"),
        col("__text").substr((lit(1L) + col("chunk_idx") * step).cast("int"),
          lit(size)).as("chunk"),
        col("n_chunks"))
  }
}
