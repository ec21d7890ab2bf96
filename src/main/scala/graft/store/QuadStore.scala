package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rdf.{PatchOp, Quad}

/** Parquet-backed quad store with RDF set semantics — the engine's
  * `DatasetGraph` replacement (SURVEY.md §7 phase 2; reference
  * semantics: README.md:148-150 "the set semantics of RDF means
  * regardless of the order of event application the dataset will
  * eventually reach the same state").
  *
  * Layout: an LSM-ish op log. Each committed micro-batch writes one
  * immutable parquet segment of (op A|D, seq, graph, subject,
  * predicate, obj) rows, then atomically swings the `_version` pointer
  * file. Readers list only committed segments, so a crash mid-write is
  * invisible (the reference gets the same from DatasetGraph
  * transactions, FusekiProjector.java:484-490/514-573).
  *
  * State = latest-op-per-quad-wins over the committed log:
  *   add then delete  → absent;  delete then re-add → present.
  * This makes delete-bearing ingestion ORDER-INSENSITIVE across
  * parallel partitions as long as `seq` encodes the event order
  * (partition, offset, intra-event op index) — a stronger contract
  * than the reference's single-partition requirement (README.md:152-153)
  * because the merge is associative.
  *
  * 100 TB posture: segments are append-only and bounded by the batch
  * size; reads do ONE shuffle (hash-aggregate on the quad key) over
  * base + tail, and [[compact]] folds the tail into a new base so the
  * tail stays short. The quad-key groupBy parallelizes across the
  * cluster; no driver-side state. At cluster scale the base would be
  * bucketed by the quad-key hash to make compaction shuffle-free;
  * local parquet has no bucketing metadata, so that is documented
  * rather than enforced here.
  */
final class QuadStore(spark: SparkSession, path: String) {
  import QuadStore._

  private val dir = Paths.get(path)
  Files.createDirectories(dir)

  // --- version pointer ------------------------------------------------------

  private def versionFile = dir.resolve("_version")

  /** Committed segment ids in commit order. */
  def committedSegments(): Seq[String] = {
    if (!Files.exists(versionFile)) Seq.empty
    else {
      val txt = new String(Files.readAllBytes(versionFile), StandardCharsets.UTF_8).trim
      if (txt.isEmpty) Seq.empty else txt.split("\n").toSeq.filter(_.nonEmpty)
    }
  }

  /** Atomic pointer update: temp + ATOMIC_MOVE, with a `.backup` of the
    * previous pointer (the reference's defensive state-file dance,
    * FusekiOffsetStore.java:330-390).
    */
  private def writeVersion(segments: Seq[String]): Unit = {
    val tmp = dir.resolve("_version.temp")
    Files.write(tmp, segments.mkString("\n").getBytes(StandardCharsets.UTF_8))
    if (Files.exists(versionFile))
      Files.copy(versionFile, dir.resolve("_version.backup"), StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmp, versionFile, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // --- writes ---------------------------------------------------------------

  /** Commit one batch of ops (columns: op STRING, seq LONG, graph,
    * subject, predicate, obj term structs). Idempotent per batchId:
    * re-running an epoch overwrites the same segment and re-commits the
    * same pointer entry — Spark epoch replay is therefore safe
    * (replaces the reference's abort/replay machinery,
    * FusekiProjector.java:362-379).
    */
  def commitOps(batchId: Long, ops: DataFrame): Unit = {
    val seg = f"seg-$batchId%012d"
    ops.select(OP_COLUMNS.map(col): _*)
      .write.mode("overwrite").parquet(dir.resolve(seg).toString)
    val existing = committedSegments()
    if (!existing.contains(seg)) writeVersion(existing :+ seg)
  }

  /** Convenience: commit a dataset payload (adds only). */
  def addQuads(batchId: Long, quads: Seq[Quad]): Unit = {
    import spark.implicits._
    val rows = quads.zipWithIndex.map { case (q, i) =>
      OpRow("A", i.toLong, q.graph, q.subject, q.predicate, q.obj)
    }
    commitOps(batchId, rows.toDF())
  }

  /** Convenience: commit a patch A/D stream (pre-validated via
    * RdfPatchParser.dataOps) preserving op order in `seq`.
    */
  def applyPatch(batchId: Long, ops: Seq[PatchOp]): Unit = {
    import spark.implicits._
    val rows = ops.zipWithIndex.map { case (o, i) =>
      OpRow(o.op, i.toLong, o.graph, o.subject, o.predicate, o.obj)
    }
    commitOps(batchId, rows.toDF())
  }

  // --- reads ----------------------------------------------------------------

  /** Raw committed op log, with a segment-ordinal column folded into a
    * single global order key so later segments win.
    */
  private def opLog(): Option[DataFrame] = {
    val segs = committedSegments()
    if (segs.isEmpty) None
    else Some(segs.zipWithIndex.map { case (seg, ord) =>
      spark.read.parquet(dir.resolve(seg).toString)
        .withColumn("gseq", lit(ord.toLong) * lit(1L << 40) + col("seq"))
    }.reduce(_ unionByName _))
  }

  /** Current state as a quads DataFrame (graph, subject, predicate,
    * obj) with set semantics. One hash-aggregate shuffle; whole-stage
    * codegen end-to-end.
    */
  def quads(): DataFrame = {
    opLog() match {
      case None =>
        import spark.implicits._
        Seq.empty[OpRow].toDF().select(QUAD_COLUMNS.map(col): _*)
      case Some(log) =>
        log.groupBy(QUAD_COLUMNS.map(col): _*)
          .agg(max_by(col("op"), col("gseq")).as("last_op"))
          .filter(col("last_op") === "A")
          .drop("last_op")
    }
  }

  /** Fold the committed log into a single base segment. */
  def compact(): Unit = {
    val segs = committedSegments()
    if (segs.size <= 1) return
    val state = quads().withColumn("op", lit("A"))
      .withColumn("seq", monotonically_increasing_id())
    val seg = f"base-${System.currentTimeMillis()}%013d"
    state.select(OP_COLUMNS.map(col): _*)
      .write.mode("overwrite").parquet(dir.resolve(seg).toString)
    writeVersion(Seq(seg))
  }

  def count(): Long = quads().count()
}

object QuadStore {
  /** op row as a case class so tests get encoders for free. */
  final case class OpRow(op: String, seq: Long,
      graph: graft.rdf.Term, subject: graft.rdf.Term,
      predicate: graft.rdf.Term, obj: graft.rdf.Term)

  val QUAD_COLUMNS: Seq[String] = Seq("graph", "subject", "predicate", "obj")
  val OP_COLUMNS: Seq[String] = Seq("op", "seq") ++ QUAD_COLUMNS
}
