package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sampling.Sampling

/** Corpus-to-training-batch layout operators: fixed-length sequence
  * packing and overlapping window chunking.
  */
object Packing {

  /** Sequence-packing assignment: map each document to the training
    * sequence (`seq_id`) and intra-sequence offset its first token
    * lands on, packing documents back-to-back into `seqLen`-token
    * sequences. A single global order would serialize the cumulative
    * sum through one partition, so packing is SHARDED: documents hash
    * (portably, by id) into `shards` independent streams, each packed
    * by a per-shard running total — the parallel unit is the shard, so
    * size `shards` to the cluster, not the corpus. Deterministic and
    * append-stable within a shard prefix; the downstream writer
    * materializes sequence `s` of shard `h` from the rows with that
    * (h, s), splitting documents that straddle a boundary.
    *
    * Plan: one projection (tokenizer), one shuffle on `shard`, one
    * per-shard sort — no joins, no driver round-trips.
    */
  def sequencePack(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      seqLen: Int = 2048,
      shards: Int = 8,
      // None = whitespace word tokens; Some(c) = caller-supplied count
      // (e.g. graft_bpe_count(text) — sequence budgets at crawl scale
      // are BPE-denominated, and whitespace counts misprice CJK/code)
      tokenCount: Option[org.apache.spark.sql.Column] = None
  ): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(
        col(idCol),
        Sampling.portableBucket(idCol, shards).as("shard"),
        tokenCount.getOrElse(
          expr(s"CAST(size(${TextAnalysis.wordTokensSql(textCol)}) AS BIGINT)")).as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(
        col(idCol), col("shard"), col("n_tokens"),
        expr(s"CAST((__cum - n_tokens) div $seqLen AS BIGINT)").as("seq_id"),
        expr(s"CAST((__cum - n_tokens) % $seqLen AS BIGINT)").as("seq_offset"))
  }

  /** Overlapping fixed-width character chunks (`size` chars every
    * `stride`) — the RAG-style windowing pass. One projection + one
    * generator per document, no shuffle; trailing windows shorter than
    * `size` are kept (they carry the document tail), empty ones
    * dropped.
    */
  def chunk(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      size: Int = 200,
      stride: Int = 150
  ): DataFrame =
    docs
      .select(
        col(idCol),
        posexplode(expr(
          s"""transform(
             |  sequence(0, CAST(ceil(greatest(length($textCol) - $size, 0) / ${stride}.0) AS INT)),
             |  i -> substring($textCol, i * $stride + 1, $size))""".stripMargin))
          .as(Seq("chunk_id", "chunk")))
      .filter(length(col("chunk")) > 0)
      .select(
        col(idCol), col("chunk_id").cast("long").as("chunk_id"), col("chunk"),
        length(col("chunk")).cast("long").as("chunk_len"))
}
