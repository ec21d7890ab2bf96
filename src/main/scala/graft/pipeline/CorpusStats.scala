package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics for training-data pipelines: per-document
  * salient terms by tf·idf-style weighting.
  *
  * Physical shape (the canonical corpus-aggregation plan):
  * one `explode` over tokens, two hash aggregations (both with
  * map-side partial aggregation — term frequency keyed on
  * (doc, token), document frequency keyed on token), a join of tf
  * against the much smaller df relation (Catalyst broadcasts it when
  * the vocabulary fits, sort-merge otherwise), and one window shuffle
  * partitioned by document for the top-k. No driver-side iteration at
  * any step; every stage scales with executors.
  */
object CorpusStats {

  /** Top-k salient terms per document, scored tf/df — monotone in
    * term frequency and inverse document frequency like classic
    * tf·idf, but ln-free: a single integer-over-integer double
    * division is bit-identical across engines, so the DuckDB oracle
    * can check the full output exactly (a log-based idf would drift
    * in the last ulp between libm implementations).
    *
    * Ties break by token so the result is total-order deterministic.
    * Returns (id, token, tf, df) rows, ≤ k per document.
    */
  def topTerms(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "token")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy((col("tf").cast("double") / col("df")).desc, col("token"))))
    scored.filter(col("rn") <= k)
      .select(col("id"), col("token"), col("tf"), col("df"))
  }
}
