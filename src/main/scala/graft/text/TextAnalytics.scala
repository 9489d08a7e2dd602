package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a documents table — language ID, quality
  * scoring, token counting, fingerprinting. Expressions are kept portable
  * (length/replace/split arithmetic) where a DuckDB oracle mirrors them.
  */
object TextAnalytics {

  /** Occurrences of a literal marker inside lower(text) — the portable
    * length-difference trick (identical semantics in DuckDB).
    */
  def markerCount(text: Column, marker: String): Column =
    (length(text) - length(replace(text, lit(marker), lit("")))) / marker.length

  /** Stopword-marker sets per language. Markers include surrounding spaces so
    * they only hit whole words.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " das ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " est "),
    "es" -> Seq(" el ", " la ", " los ", " que ", " es "))

  /** N-gram/stopword-heuristic language ID: argmax of marker hit counts over
    * ' ' + lower(text) + ' '; ties and all-zero scores → "und" (undetermined)
    * unless zero, ties break lexicographically smallest language code.
    * Output columns: lang_guess + per-language scores.
    */
  def languageId(docs: DataFrame, textCol: String): DataFrame = {
    val padded = concat(lit(" "), lower(col(textCol)), lit(" "))
    val scored = LangMarkers.foldLeft(docs) { case (df, (lang, markers)) =>
      df.withColumn(
        s"score_$lang",
        markers.map(m => markerCount(padded, m)).reduce(_ + _).cast("long"))
    }
    val best = LangMarkers
      .map { case (lang, _) => struct(col(s"score_$lang").as("s"), lit(lang).as("l")) }
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.withColumn(
      "lang_guess",
      when(greatest(LangMarkers.map(lm => col(s"score_${lm._1}")): _*) === 0, lit("und"))
        .otherwise(best.getField("l")))
  }

  /** Quality-signal columns (length / punctuation / stopword / digit ratios)
    * plus a deterministic composite score in [0, 1].
    */
  def qualitySignals(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("double")
    val words = split(t, " ")
    val nWords = size(words).cast("double")
    val stopHits = Seq(" the ", " and ", " of ", " to ", " a ", " in ")
      .map(m => markerCount(concat(lit(" "), lower(t), lit(" ")), m))
      .reduce(_ + _)
      .cast("double")
    def charClassCount(cls: String): Column =
      (nChars - length(regexp_replace(t, cls, ""))).cast("double")
    docs
      .withColumn("n_chars", nChars.cast("long"))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("avg_word_len", when(nWords > 0, nChars / nWords).otherwise(0.0))
      .withColumn("punct_ratio", when(nChars > 0, charClassCount("[!?.,;:]") / nChars).otherwise(0.0))
      .withColumn("digit_ratio", when(nChars > 0, charClassCount("[0-9]") / nChars).otherwise(0.0))
      .withColumn("stopword_ratio", when(nWords > 0, stopHits / nWords).otherwise(0.0))
      .withColumn(
        "quality_score",
        least(lit(1.0),
          greatest(lit(0.0),
            lit(0.3) * least(col("n_words") / 100.0, lit(1.0))
              + lit(0.4) * least(col("stopword_ratio") * 5.0, lit(1.0))
              + lit(0.3) * (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))))))
  }

  /** Token counts: whitespace tokens and a BPE-ish segmentation
    * (`\w+` word pieces and single non-space symbols counted separately).
    */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("ws_tokens",
        when(length(trim(t)) === 0, 0)
          .otherwise(size(split(trim(t), "\\s+"))).cast("long"))
      .withColumn("bpeish_tokens",
        (size(regexp_extract_all(t, lit("""\w+|[^\w\s]"""), lit(0)))).cast("long"))
  }

  /** Polynomial rolling-hash document fingerprint over lower(text):
    * fold of (acc·31 + charCode) mod 1e9+7 — portable (DuckDB list_reduce
    * mirrors it exactly), order-sensitive, whitespace-normalized.
    */
  def fingerprint(text: Column): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    val codes = transform(
      sequence(lit(1), length(norm)),
      i => ascii(substring(norm, i, lit(1))).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => pmod(acc * 31L + c, lit(1000000007L)))
  }

  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), fingerprint(col(textCol)).as("fingerprint"))
}
