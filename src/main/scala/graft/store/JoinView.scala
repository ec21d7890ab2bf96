package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rdf.Term

/** Incrementally-maintained STAR-JOIN view over a [[QuadStore]] — the
  * materialized form of the dominant BGP shape (`?s <p1> ?o1 . ?s <p2>
  * ?o2 …` over the default graph), refreshed at CHANGE cost instead of
  * re-joining the store per query.
  *
  * Maintenance is touched-subject partial recompute, the IVM strategy
  * that fits a subject-star view: a change batch can only affect view
  * rows whose `subject` appears in the CDC window with one of the
  * view's predicates, so refresh
  *
  *  1. reads the store's CDC feed since the last refreshed batch,
  *     filtered to the view's predicates (an over-approximation —
  *     no-op re-adds/absent-deletes just recompute a subject to the
  *     same rows, so presence-exactness is NOT needed here, unlike
  *     [[AggView]]'s signed counts);
  *  2. drops the touched subjects from the persisted rows with a
  *     broadcast anti join (touched is bounded by the window's change
  *     volume, never by the store);
  *  3. recomputes exactly those subjects against the new state — each
  *     leaf scan is predicate-bound (row-group-pruned by the base
  *     layout's in-bucket predicate sort) and semi-joined to the
  *     touched set map-side before the star join.
  *
  * A full star join runs only on the first refresh or when compaction
  * passed the view's as-of point (the same CDC-replayability floor as
  * [[AggView]]). Persistence is the store's pointer discipline:
  * generation directory + atomic `_view` pointer move, so a reader
  * holding the old generation keeps a consistent snapshot.
  *
  * Multiplicities are SPARQL's: a subject with two objects under one
  * predicate contributes the cross product of its leaf matches, and a
  * subject missing ANY leaf contributes nothing (inner star).
  */
final class JoinView(spark: SparkSession, store: QuadStore, path: String,
    predicates: Seq[Term]) {
  require(predicates.nonEmpty, "a star view needs at least one predicate")

  private val dir = Paths.get(path)
  Files.createDirectories(dir)
  private def pointerFile = dir.resolve("_view")

  private def readPointer(): Option[(Long, String)] =
    if (!Files.exists(pointerFile)) None
    else new String(Files.readAllBytes(pointerFile), StandardCharsets.UTF_8)
      .trim.split(" ", 2) match {
        case Array(b, name) => Some((b.toLong, name))
        case _ => None
      }

  private def writePointer(batch: Long, name: String): Unit = {
    val tmp = dir.resolve("_view.temp")
    Files.write(tmp, s"$batch $name".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Batch the persisted rows reflect; −1 before the first refresh. */
  def refreshedAt: Long = readPointer().map(_._1).getOrElse(-1L)

  /** The maintained rows: `subject` + `o0`…`o{k-1}` term structs. */
  def result(): DataFrame = readPointer() match {
    case Some((_, name)) => spark.read.parquet(dir.resolve(name).toString)
    case None => throw new IllegalStateException("view never refreshed")
  }

  /** The star join over `state`, optionally restricted to a (small,
    * broadcast) subject set before any join runs.
    */
  private def starJoin(state: DataFrame,
      onlySubjects: Option[DataFrame]): DataFrame = {
    val dflt = state.filter(col("graph").isNull)
    predicates.zipWithIndex.map { case (p, i) =>
      val leaf = dflt
        .filter(col("predicate.termType") === p.termType &&
          col("predicate.lex") === p.lex)
        .select(col("subject"), col("obj").as(s"o$i"))
      onlySubjects.fold(leaf)(t =>
        leaf.join(broadcast(t), Seq("subject"), "left_semi"))
    }.reduce((a, b) => a.join(b, Seq("subject")))
  }

  /** Bring the view up to the store's current committed batch; returns
    * that batch. Incremental (touched-subject recompute) when the CDC
    * window is replayable, one full star join otherwise.
    */
  def refresh(): Long = synchronized {
    val to = store.currentBatchId
    val current = readPointer()
    val from = current.map(_._1).getOrElse(-1L)
    if (to <= from) return from
    val predLex = predicates.map(_.lex)
    val next = current match {
      case Some((f, _)) if f >= store.highWaterBatchId =>
        val touched = store.changes(f, to)
          .filter(col("graph").isNull &&
            col("predicate.termType") === Term.IRI &&
            col("predicate.lex").isin(predLex: _*))
          .select(col("subject")).distinct()
        if (touched.isEmpty) result() // net-irrelevant window
        else {
          val kept = result()
            .join(broadcast(touched), Seq("subject"), "left_anti")
          kept.unionByName(starJoin(store.quadsAt(to), Some(touched)))
        }
      case _ => starJoin(store.quadsAt(to), None)
    }
    val gen = current.map(_._2.stripPrefix("data-").split("-g").last.toInt + 1)
      .getOrElse(0)
    val name = s"data-b$to-g$gen"
    next.write.mode("overwrite").parquet(dir.resolve(name).toString)
    writePointer(to, name)
    to
  }
}
