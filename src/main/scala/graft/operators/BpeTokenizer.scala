package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.col

import graft.functions.TextKernels

/** Trained BPE tokenizer: the "train the tokenizer" step of an LLM data
  * pipeline, built on the same replayability recipe as the PQ/IVF
  * codebook trainers ([[Similarity.ivfTrainCentroidsLocal]]):
  * a bounded deterministic sample, a distributed word-frequency table
  * capped to a deterministic top-K, and a driver-local training loop
  * with total tie-breaks — so two trainings on the same corpus
  * bit-agree, and the merge table is a build-once broadcastable asset
  * (a few KB for thousands of merges).
  *
  * Scale shape: training cost is bounded by (sampleN docs, maxWords
  * types, nMerges steps) regardless of corpus size; apply is one
  * whole-corpus scan with a per-row kernel against the broadcast merge
  * ranks — no shuffle at all until a consumer aggregates.
  */
object BpeTokenizer {

  private val P = 1000000007L

  /** Deterministic, bounded word-frequency table: smallest-portable-hash
    * doc sample (distributed top-k, never a full collect), whitespace
    * words, then the top `maxWords` types by (freq desc, word asc).
    */
  def wordFrequencies(docs: DataFrame, textCol: String, idCol: String,
      sampleN: Int = 2048, maxWords: Int = 4096): Array[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits.{newLongEncoder, newProductEncoder, newStringEncoder}
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t"),
        ((F.lit(3L) * (col(idCol).cast("long") % P) + 8L) % P).as("h"))
      .orderBy(col("h").asc, col("id").asc)
      .limit(sampleN)
      .as[(Long, String, Long)]
      .flatMap { case (_, t, _) =>
        TextKernels.tokens(if (t == null) "" else t).iterator.filter(_.nonEmpty)
      }
      .groupByKey(identity)
      .count()
      .toDF("word", "freq")
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxWords)
      .as[(String, Long)]
      .collect()
      // the trainer's pair counts are order-insensitive, but keep a
      // canonical order anyway so the collected asset is byte-stable
      .sortBy { case (w, f) => (-f, w) }
  }

  /** Train the merge table on the deterministic sample (driver-local,
    * bit-replayable — see [[TextKernels.bpeTrainMerges]]).
    */
  def trainMergesLocal(docs: DataFrame, textCol: String, idCol: String,
      nMerges: Int = 200, sampleN: Int = 2048,
      maxWords: Int = 4096): Array[(String, String)] =
    TextKernels.bpeTrainMerges(
      wordFrequencies(docs, textCol, idCol, sampleN, maxWords).toSeq, nMerges)

  /** Rank lookup for [[countsKernel]] from an ordered merge table. */
  def ranksOf(merges: Array[(String, String)]): Map[(String, String), Int] =
    merges.iterator.zipWithIndex.map { case (p, i) => (p, i) }.toMap

  /** Per-document (n_words, n_sym, n_bpe) under the trained ranks —
    * the ONE kernel behind both the batch apply ([[tokenCounts]]) and
    * the streaming twin (st42): sharing the code is what makes "stream
    * counts = batch counts" a structural fact instead of a contract
    * comment.
    */
  def countsKernel(text: String,
      ranks: collection.Map[(String, String), Int]): (Long, Long, Long) = {
    val ws = TextKernels.tokens(if (text == null) "" else text).filter(_.nonEmpty)
    var nSym = 0L
    var nBpe = 0L
    ws.foreach { w =>
      nSym += w.length
      nBpe += TextKernels.bpeSegment(w, ranks).length
    }
    (ws.length.toLong, nSym, nBpe)
  }

  /** Distributed apply: per-doc token counts under the trained merges.
    * One scan, per-row kernel, merge ranks broadcast by closure (KBs);
    * `n_sym` is the pre-merge symbol count (word character count), so
    * `n_sym / n_bpe` is the learned compression ratio.
    */
  def tokenCounts(docs: DataFrame, merges: Array[(String, String)],
      textCol: String, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits.{newLongEncoder, newProductEncoder, newStringEncoder}
    val ranks = ranksOf(merges)
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val (nw, nSym, nBpe) = countsKernel(t, ranks)
        (id, nw, nSym, nBpe)
      }
      .toDF("doc_id", "n_words", "n_sym", "n_bpe")
  }
}
