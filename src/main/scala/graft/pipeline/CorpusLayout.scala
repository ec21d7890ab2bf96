package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Corpus storage layout for repeated-pipeline workloads: write the
  * corpus ONCE bucketed + sorted by its join key, and every downstream
  * id-join / groupBy on that key — dedup verdict joins, quality-score
  * attachment, span rebuilds, CC label joins — reads co-located
  * partitions and skips the exchange entirely.
  *
  * This is the pay-the-shuffle-once discipline at 100 TB: a curation
  * pipeline joins the corpus on doc_id a dozen times per run (every
  * pl_* stage that ends `.join(docs, "doc_id")`), and each of those
  * joins is a full-corpus shuffle unless the layout already agrees
  * with the key. Bucketed tables make the agreement durable: Spark
  * records (bucket column, bucket count, sort order) in the catalog,
  * plans `SortMergeJoin` over the bucketed scans with NO
  * ShuffleExchange on either side, and two tables bucketed the same
  * way co-locate for free, forever. (Equivalent to Hive bucketing /
  * Iceberg's bucket transform — the portable lakehouse layout.)
  *
  * The quad store solves the same problem for RDF with hash-bucket
  * partition DIRECTORIES (`store/QuadStore`), which prune; bucketed
  * TABLES are the relational-corpus variant, which co-locate.
  */
object CorpusLayout {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table at
    * `path`, registered as `table` (external datasource table — the
    * catalog entry carries the bucket spec; the files are plain
    * parquet readable by any engine). `nBuckets` should be sized so
    * one bucket ≈ one task's memory at target scale; joins between
    * tables only elide the shuffle when their bucket counts match
    * (use one corpus-wide constant).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      nBuckets: Int = 32, bucketCol: String = "doc_id",
      sortCols: Seq[String] = Seq.empty): Unit = {
    val sorts = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Drop the catalog entry (files at `path` are left in place). */
  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
}
