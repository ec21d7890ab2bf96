package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing — beyond-reference
  * extension (SURVEY.md §7 phase 7).
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * (format/width/height), exactly how a 100 TB training pipeline
  * carries them next to text. The decode step is a clearly-marked
  * DETERMINISTIC STUB (no image/audio codecs in this environment); the
  * Spark-side plumbing — schema, Dataset encoders, mapPartitions batch
  * shape (the Scala analogue of a batched `mapInPandas` UDF), feature
  * schema, partition independence — is real and tested.
  */
object Multimodal {

  /** A media row: binary payload + typed metadata. */
  final case class MediaRow(doc_id: Long, source: String, format: String,
      width: Int, height: Int, media: Array[Byte])

  /** Decoded features per media item. */
  final case class MediaFeatures(doc_id: Long, source: String, format: String,
      width: Int, height: Int, n_bytes: Int, mean_byte: Double,
      histogram: Array[Float])

  /** One sampled frame of a "video" payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic synthetic media from the documents table: payload =
    * md5(text) bytes (16 "pixels"), 4x4 grayscale. Pure column ops.
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), lit("img/gray8").as("format"),
      lit(4).as("width"), lit(4).as("height"), unhex(md5(col("text"))).as("media"))

  /** Decode + feature-extract, batched per partition — the Scala
    * analogue of `mapInPandas(decode_batch, schema)`: rows stream
    * through in batches of `batchSize` without materializing the
    * partition, and the output schema is fixed by the Encoder.
    *
    * STUB: `decodeBytes` stands in for a real image decoder — it
    * deterministically treats the payload as row-major gray8 pixels.
    * A real deployment would swap in an actual codec here; everything
    * around it (schema, batching, partitioning) is unchanged.
    */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 256): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val px = decodeBytes(m.media)
          val hist = new Array[Float](16)
          var sum = 0L
          px.foreach { b => sum += b; hist(b / 16) += 1f }
          MediaFeatures(m.doc_id, m.source, m.format, m.width, m.height,
            px.length, if (px.isEmpty) 0.0 else sum.toDouble / px.length, hist)
        }
      }
    }
  }

  /** STUB image decode: payload bytes ARE the pixels (0..255). A real
    * codec (JPEG/PNG) would replace this single function.
    */
  private def decodeBytes(media: Array[Byte]): Array[Int] =
    if (media == null) Array.empty else media.map(b => b & 0xff)

  /** Frame sampling for "video" payloads: the binary is cut into
    * fixed-size frames and every `stride`-th frame is kept. Pure
    * column ops (no UDF): frames explode into one row each, so
    * downstream per-frame work parallelizes across the cluster.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 4, stride: Int = 2): DataFrame = {
    val nFrames = floor(length(col("media")) / frameBytes).cast("int")
    media.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nFrames - 1), i =>
          substring(col("media"), i * frameBytes + 1, lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
  }

  /** End-to-end: documents → synthetic media → decoded features, as a
    * typed Dataset (Encoder-checked schema).
    */
  def pipeline(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    decodeFeatures(synthesize(docs).as[MediaRow])
  }
}
