package graft.connect

import org.apache.spark.sql.SparkSession

import graft.rdf.RdfPatchParser
import graft.store.QuadStore

/** BatchSink applying committed batches to a [[QuadStore]] — the
  * engine's FusekiSink (FusekiSink.java:38-77): dataset payloads
  * stream their quads as adds, patch payloads their effective A/D op
  * stream, all as ONE atomic parquet segment per commit.
  *
  * `seq` encodes (event index in batch, op index in event) so
  * latest-op-wins inside the store respects event order — the ordered
  * delete contract (README.md:152-153) without the reference's
  * single-partition restriction.
  */
final class QuadStoreSink(spark: SparkSession, val store: QuadStore) extends BatchSink {
  import QuadStore.OpRow

  override def apply(batchId: Long, events: Seq[MaterialisedEvent]): Unit = {
    import spark.implicits._
    // patch op streams resolve batch-wide: a transaction opened by one
    // event may be committed (or aborted) by a later one
    // (RDFChangesApplyExternalTransaction.java:10-42)
    val (effPatchOps, _) = RdfPatchParser.dataOpsBatch(
      events.map(m => if (m.decoded.kind == "patch") m.decoded.ops else Seq.empty))
    val ops = events.zipWithIndex.flatMap { case (m, ei) =>
      val base = ei.toLong << 24
      m.decoded.kind match {
        case "dataset" =>
          m.decoded.quads.zipWithIndex.map { case (q, qi) =>
            OpRow("A", base | qi.toLong, q.graph, q.subject, q.predicate, q.obj)
          }
        case "patch" =>
          effPatchOps(ei).zipWithIndex.map { case (o, oi) =>
            OpRow(o.op, base | oi.toLong, o.graph, o.subject, o.predicate, o.obj)
          }
        case other =>
          throw new ProjectorException(s"unapplied payload kind '$other'")
      }
    }
    store.commitOps(batchId, ops.toDF())
    // PA/PD prefix ops update the dataset prefix map in event order
    // (RDFChangesApply semantics; SURVEY §2.1 row 6)
    val prefixOps = events.flatMap { m =>
      if (m.decoded.kind == "patch")
        m.decoded.ops.collect {
          case o if o.op == "PA" => ("PA", o.subject.lex, o.obj.lex)
          case o if o.op == "PD" => ("PD", o.subject.lex, null)
        }
      else Seq.empty
    }
    store.updatePrefixes(prefixOps)
  }
}

/** Counting sink for decision-tree tests — the reference's mock
  * DatasetGraph (AbstractFusekiProjectorTests.mockDatasetGraph).
  */
final class CountingSink extends BatchSink {
  private val buf = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
  override def apply(batchId: Long, events: Seq[MaterialisedEvent]): Unit =
    synchronized { buf += ((batchId, events.size)) }
  /** (batchId, batch size) per commit, in commit order. */
  def commits: Seq[(Long, Int)] = synchronized(buf.toSeq)
}
