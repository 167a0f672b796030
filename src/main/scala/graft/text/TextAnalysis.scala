package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale document corpora:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything here is composed from built-in `functions._` (no UDFs),
  * so the whole stage stays codegen'd and columnar — on a 100 TB
  * corpus these run as a single projection over the scan with no
  * shuffle and no JVM<->interpreter boundary.
  */
object TextAnalysis {

  /** Stopword marker pattern for quality scoring. */
  val StopwordPattern = "\\b(the|a|of|and|to|in|is|for|on|with)\\b"

  /** Whitespace-token count (BPE-ish regex tokenization variant below).
    * Counted as `\S+` runs rather than `split` so leading/trailing
    * whitespace can't produce phantom empty tokens.
    */
  def tokenCount(t: Column): Column =
    size(regexp_extract_all(t, lit("\\S+"), lit(0)))

  /** Word-piece-ish token count: runs of letters, digits, or single
    * punctuation — a cheap proxy for subword tokenizer output size.
    */
  def regexTokenCount(t: Column): Column =
    size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def punctCount(t: Column): Column =
    length(regexp_replace(t, "[^.!?,;:]", ""))

  def stopwordCount(t: Column): Column =
    size(regexp_extract_all(t, lit(StopwordPattern), lit(0)))

  def stopwordRatio(t: Column): Column =
    stopwordCount(t).cast("double") / tokenCount(t)

  def avgTokenLen(t: Column): Column =
    length(regexp_replace(t, "\\s+", "")).cast("double") / tokenCount(t)

  /** Heuristic quality score in [0,1]: length signal + punctuation
    * sanity + stopword presence (natural text has function words).
    */
  def qualityScore(t: Column): Column =
    lit(0.4) * least(lit(1.0), tokenCount(t).cast("double") / lit(50.0)) +
      lit(0.3) * (lit(1.0) - punctCount(t).cast("double") / greatest(length(t), lit(1))) +
      lit(0.3) * least(lit(1.0), lit(4.0) * stopwordRatio(t))

  /** Marker-word language ID: per-language function-word hit counts,
    * argmax with a fixed preference order for ties. The marker lists
    * are pluggable; a production profile would use char-n-gram
    * frequency profiles — the plan shape (one projection, no shuffle)
    * is the same.
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to)\\b",
    "es" -> "\\b(el|la|de|que)\\b",
    "de" -> "\\b(der|die|und|das)\\b",
    "fr" -> "\\b(le|les|et|une)\\b",
    "zh" -> "(的|是|了)"
  )

  def markerCount(t: Column, pattern: String): Column =
    size(regexp_extract_all(t, lit(pattern), lit(0)))

  def langId(t: Column): Column = {
    val counts = LangMarkers.map { case (lang, p) => lang -> markerCount(t, p) }
    // argmax with first-listed language winning ties
    counts.zipWithIndex.foldRight(lit(counts.last._1)) { case (((lang, c), i), elseCol) =>
      val rest = counts.drop(i + 1).map(_._2)
      if (rest.isEmpty) elseCol
      else when(rest.foldLeft(lit(true))((acc, r) => acc && c >= r), lang).otherwise(elseCol)
    }
  }

  /** Normalized content fingerprint (case/punctuation-insensitive). */
  def fingerprint(t: Column): Column =
    md5(lower(regexp_replace(t, "[^a-zA-Z0-9 ]", "")))

  /** Corpus vocabulary: top-k lowercased word tokens by document and
    * total frequency. explode -> two-level aggregate; the per-token
    * partial aggregation happens map-side so the shuffle carries one
    * row per (partition, token), not one per occurrence — the standard
    * vocab-building pass at corpus scale. Ties break on the token for
    * a deterministic LIMIT.
    */
  def topTokens(docs: org.apache.spark.sql.DataFrame, k: Int, textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count_distinct, explode, split => fsplit, sum => fsum}
    docs
      .select(col("doc_id"), explode(fsplit(lower(col(textCol)), "[^a-z0-9]+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("doc_id"), col("token"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("tf"))
      .groupBy(col("token"))
      .agg(
        fsum(col("tf")).as("total_freq"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("doc_freq")
      )
      .orderBy(org.apache.spark.sql.functions.desc("total_freq"), col("token"))
      .limit(k)
  }
}
