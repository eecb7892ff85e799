package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus indexing: term/document frequencies and per-document salient
  * terms (the TF-IDF building blocks a filtering/topic pipeline uses).
  *
  * Ranking is by the exact integer pair (tf DESC, df ASC) with the term
  * string as final tie-break — equivalent to ranking by tf·idf with
  * idf = 1/df, but free of float transcendentals, so the result is
  * bit-identical across engines (the DuckDB oracle runs the same
  * integer sort).
  *
  * 100 TB shape: tokenize+explode is per-row; both frequency tables are
  * map-side-combinable hash aggregates; the tf⋈df equi-join shuffles on
  * `term` (the df side is corpus-vocabulary sized — broadcast it when it
  * fits, as `topTerms` does via autoBroadcast); the final top-k is a
  * per-document window over tiny groups. No global sort, no collect.
  */
object TextIndex {

  /** (id, term, tf) — term frequencies per document. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))

  /** (term, df) — number of documents containing each term. */
  def docFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy("term").agg(count(lit(1)).as("df"))

  /** Top-`k` most salient terms per document by (tf DESC, df ASC, term). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val df = docFrequencies(tf)
    val w = Window.partitionBy("id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"), col("rank"))
  }
}
