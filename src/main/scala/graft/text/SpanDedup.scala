package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SUBSTRING detection: the span-level dedup pass of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better"), which removes repeated byte spans rather than whole
  * near-duplicate documents. Doc-level dedup (Dedup.scala, winnowing)
  * misses the dominant failure mode of web corpora — templated
  * boilerplate and quoted passages embedded inside otherwise-unique
  * documents; span dedup finds exactly those regions.
  *
  * The distributed formulation replaces the paper's single-node suffix
  * array with positional word n-grams: a token position is DUPLICATED
  * iff the n-gram starting there occurs >= 2 times corpus-wide
  * (including a second occurrence inside the same document — the paper
  * dedups self-repeats too). Runs of duplicated positions merge into
  * maximal spans: grams at positions p and q chain when q - p <= n
  * (token ranges [p, p+n-1] and [q, q+n-1] overlap or touch), so each
  * output span is a maximal region of text every n-token window of
  * which... is not quite the suffix-array guarantee — the exact
  * semantic is: every output span is a maximal union of
  * overlapping-or-adjacent duplicated n-gram windows. Any duplicated
  * passage of >= n tokens is fully covered by some span; passages
  * shorter than n tokens are below the detection floor by design (the
  * paper uses a 50-token floor for the same reason).
  *
  * Portability: the gram hash is the first 60 bits of md5 of the
  * space-joined gram (the q12/q73 construction — `conv(substr(md5(g),
  * 1,15),16,10)` here, `('0x'||substr(md5(g),1,15))::BIGINT` in
  * DuckDB), so the duplicated-set decision is IDENTICAL in both
  * engines by construction — even a (2^-60-improbable) hash collision
  * affects both sides the same way.
  *
  * Scale shape (100 TB): three key-hashed shuffles, no self-join and
  * no per-pair work at all — unlike near-dup pairing, span dedup never
  * enumerates document pairs, so corpus-wide boilerplate costs
  * O(occurrences), not O(occurrences^2). (1) the occurrence count
  * map-side combines on the 8-byte gram hash; (2) the duplicated-hash
  * semi-join keys on the same hash; (3) the island merge windows on
  * doc id, and the final span aggregate reuses that partitioning
  * (doc id is a prefix of the grouping key — no fourth shuffle).
  * The gram frame has two consumers (the count and the join-back), so
  * it persists once; its rows are (id, pos, hash) — wider per token
  * than the text itself (~20 bytes/gram vs ~6 bytes/token), so at
  * full corpus scale prefer `cache = false` (one extra scan +
  * re-hash, nothing stored) or land the gram frame in a bucketed
  * table and run both consumers off it.
  *
  * Reference scope: the reference pipeline (IngestionJob.scala,
  * AggregationJob.scala) has no text operators at all; this is part of
  * the LLM-training-data extension surface the brief mandates.
  */
object SpanDedup {

  /** Positional word n-gram hashes of `textCol` as an array column —
    * element i (0-based) is the 60-bit portable hash of the gram
    * starting at token position i. NOT distinct and NOT sorted, unlike
    * [[graft.functions.WordGramHashes]]: position is the payload here.
    * The `transform(array(toks), ts -> ...)` wrapper is the shared
    * let-binding idiom (Contamination.wordGramsSql) that stops the
    * tokenizer from re-evaluating per gram.
    */
  def posGramHashesSql(textCol: String, n: Int): String =
    s"""transform(array(${TextAnalysis.wordTokensSql(textCol)}), ts ->
       |  CASE WHEN size(ts) >= $n
       |  THEN transform(sequence(1, size(ts) - ${n - 1}),
       |         i -> CAST(conv(substring(md5(concat_ws(' ', slice(ts, i, $n))), 1, 15), 16, 10) AS BIGINT))
       |  ELSE transform(slice(ts, 1, 0), x -> CAST(0 AS BIGINT)) END)[0]""".stripMargin

  /** Maximal duplicated spans per document: one row per span, as
    * 0-based token offsets `(idCol, span_start, span_end, span_tokens)`
    * with `span_end` inclusive. Documents with no duplicated gram
    * produce no rows.
    *
    * Cache discipline (nearDuplicates'): `cache = true` persists the
    * wide gram frame for its two consumers, then MATERIALIZES the
    * (small) span result and releases the gram cache before returning —
    * the caller sees exactly one registered cache entry (the returned
    * frame) and owns its `unpersist()`. `cache = false` registers
    * nothing: the corpus is scanned and hashed twice (once per gram
    * consumer) — the right trade at full corpus scale, where the gram
    * frame (~20 bytes/gram) outweighs the text.
    */
  def duplicatedSpans(
      docs: DataFrame,
      n: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id",
      cache: Boolean = true
  ): DataFrame = {
    // scatter BEFORE the positional-gram kernel (guide §2.5): a
    // single-file corpus scan would hash every gram — and cache the
    // exploded frame — in one partition
    val gramsRaw = graft.operators.Scatter.cpu(docs).select(
      col(idCol),
      posexplode(expr(posGramHashesSql(textCol, n))).as(Seq("pos", "h")))
    val grams =
      if (cache) gramsRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else gramsRaw
    // corpus-wide occurrence count (NOT distinct-doc df: within-doc
    // repeats are duplication too) — partial-aggregates on the hash
    val dup = grams.groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select("h")
    val dupPos = grams.join(dup, Seq("h"), "left_semi")
      .select(col(idCol), col("pos"))
    // gaps-and-islands: a new span starts when the previous duplicated
    // gram position is more than n back (windows disjoint and not
    // adjacent); first-in-doc lag is NULL -> condition false -> brk 0
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islands = dupPos
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > n, 1).otherwise(0))
      .withColumn("island",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = islands.groupBy(col(idCol), col("island"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1)).as("span_end"))
      .select(
        col(idCol),
        col("span_start"),
        col("span_end"),
        (col("span_end") - col("span_start") + lit(1)).as("span_tokens"))
    if (!cache) spans
    else {
      val mat = spans.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      mat.count()
      grams.unpersist()
      mat
    }
  }

  /** The span-deduplicated corpus: each document's text with every
    * duplicated span CUT (the Lee et al. output shape — they cut all
    * but one occurrence; cutting every occurrence is the conservative
    * variant that needs no global occurrence ordering, and is what
    * their released code does by default). Tokens are re-joined with
    * single spaces — the tokenizer is lossy about whitespace and
    * punctuation by design (matching every other text operator here),
    * so downstream consumers see normalized text.
    *
    * Documents that end up empty (entirely duplicated) are DROPPED,
    * mirroring the paper's removal of fully-duplicate documents.
    * Output: `(idCol, kept_text, kept_tokens, cut_tokens)`.
    */
  def spanDedupCorpus(
      docs: DataFrame,
      n: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id",
      cache: Boolean = true
  ): DataFrame = {
    val spans = duplicatedSpans(docs, n, textCol, idCol, cache)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    // left join: documents with no duplicated span keep all tokens.
    // Token kept iff covered by no span; spans per doc are few (they
    // are maximal, hence disjoint), so the per-token exists() probe is
    // linear in tokens x spans with tiny span counts.
    docs.select(col(idCol), expr(TextAnalysis.wordTokensSql(textCol)).as("toks"))
      .join(spans, Seq(idCol), "left")
      .select(
        col(idCol),
        expr("""filter(transform(toks, (t, i) -> CASE WHEN spans IS NULL
               |    OR NOT exists(spans, sp -> i >= sp.span_start AND i <= sp.span_end)
               |  THEN t END), x -> x IS NOT NULL)""".stripMargin).as("kept"),
        size(col("toks")).as("n_tokens"))
      .filter(size(col("kept")) > 0)
      .select(
        col(idCol),
        array_join(col("kept"), " ").as("kept_text"),
        size(col("kept")).as("kept_tokens"),
        (col("n_tokens") - size(col("kept"))).as("cut_tokens"))
  }
}
