package graft.rdf

import scala.collection.mutable.ArrayBuffer

/** RDF Patch parser (reference fixture patch1.rdfp; op semantics per
  * RDFChangesApplyExternalTransaction.java:22-41).
  *
  * Grammar (line-oriented): `H <key> <term> .` header, `TX .`/`TC .`/
  * `TA .` transaction markers, `A s p o [g] .` add, `D s p o [g] .`
  * delete, `PA "prefix" <iri> [g] .` / `PD "prefix" [g] .` prefix ops.
  *
  * Note: nested `TX` (the malformed.rdfp fixture) parses fine — it is
  * an APPLY-time failure (abort + DLQ), not a deserialization failure,
  * matching the reference's two failure classes
  * (FusekiProjector.java:258-277).
  */
object RdfPatchParser {

  def parse(doc: String): Seq[PatchOp] = {
    val out = ArrayBuffer[PatchOp]()
    var lineNo = 0
    var start = 0
    val n = doc.length
    while (start <= n) {
      val nl = doc.indexOf('\n', start)
      val end = if (nl < 0) n else nl
      lineNo += 1
      if (end > start) parseLine(doc, start, end, lineNo, out)
      start = end + 1
      if (nl < 0) start = n + 1
    }
    out.toSeq
  }

  private def parseLine(doc: String, from: Int, to: Int, lineNo: Int,
                        out: ArrayBuffer[PatchOp]): Unit = {
    val s = new NQuadsParser.Scanner(doc, from, to, lineNo)
    s.skipWs()
    if (s.atEnd || s.peek == '#') return
    val opStart = s.pos
    while (!s.atEnd && s.peek.isLetter) s.advance()
    val op = doc.substring(opStart, s.pos)
    op match {
      case "TX" | "TC" | "TA" =>
        expectDot(s)
        out += PatchOp(op, null, null, null, null)
      case "H" =>
        s.skipWs()
        // header key is a bare word (e.g. `id`), value any term
        val kStart = s.pos
        while (!s.atEnd && s.peek != ' ' && s.peek != '\t') s.advance()
        val key = doc.substring(kStart, s.pos)
        val v = s.term()
        expectDot(s)
        // carried as subject=key-literal, obj=value for observability
        out += PatchOp("H", null, Term.lit(key), null, v)
      case "A" | "D" =>
        val subj = s.term()
        val pred = s.term()
        val obj = s.term()
        s.skipWs()
        var g: Term = null
        if (!s.atEnd && s.peek != '.') g = s.term()
        expectDot(s)
        out += PatchOp(op, g, subj, pred, obj)
      case "PA" =>
        val p = s.term()
        val iri = s.term()
        s.skipWs()
        var g: Term = null
        if (!s.atEnd && s.peek != '.') g = s.term()
        expectDot(s)
        out += PatchOp("PA", g, p, null, iri)
      case "PD" =>
        val p = s.term()
        s.skipWs()
        var g: Term = null
        if (!s.atEnd && s.peek != '.') g = s.term()
        expectDot(s)
        out += PatchOp("PD", g, p, null, null)
      case other =>
        s.fail(s"unknown patch op '$other'")
    }
  }

  private def expectDot(s: NQuadsParser.Scanner): Unit = {
    s.skipWs()
    if (s.atEnd || s.peek != '.') s.fail("missing '.' terminator")
    s.advance()
  }

  /** Apply-time transaction-marker validation + effective A/D stream:
    * the reference's malformed.rdfp (TX then TX) must fail at apply,
    * after parse, and ops inside a TX..TA region are DISCARDED (Jena's
    * RDFChangesApply aborts that transaction, rolling them back).
    * Returns the surviving A/D stream, or throws on invalid nesting.
    */
  def dataOps(ops: Seq[PatchOp]): Seq[PatchOp] = {
    var inTxn = false
    val out = ArrayBuffer[PatchOp]()
    val pending = ArrayBuffer[PatchOp]()
    ops.foreach { o =>
      o.op match {
        case "TX" =>
          if (inTxn) throw new RdfParseException("TX inside an open patch transaction")
          inTxn = true
        case "TC" =>
          if (!inTxn) throw new RdfParseException("TC without open patch transaction")
          inTxn = false
          out ++= pending; pending.clear()
        case "TA" =>
          if (!inTxn) throw new RdfParseException("TA without open patch transaction")
          inTxn = false
          pending.clear() // aborted: ops since TX roll back
        case "A" | "D" => if (inTxn) pending += o else out += o
        case _ => // H / PA / PD: no dataset effect
      }
    }
    // an unclosed TX leaves its ops in the (still open) transaction —
    // in the engine's batch model they commit with the enclosing batch
    out ++= pending
    out.toSeq
  }

  /** Effective A/D streams for a whole BATCH of patch events in one
    * stateful pass — a patch transaction may span events
    * (RDFChangesApplyExternalTransaction.java:10-42;
    * TestFusekiProjector.java:200-232):
    *
    *  - a patch ending with an unclosed `TX` leaves the transaction
    *    open; its ops stay pending into the NEXT event,
    *  - a later `TC` commits the carried transaction (pending ops from
    *    earlier events flush to their events' outputs), a later `TA`
    *    aborts it (pending ops from earlier events are DISCARDED),
    *  - a `TX` while a carried transaction is open commits it first
    *    (the reference's external-transaction commit), then begins its
    *    own; a second `TX` within the SAME event is the malformed
    *    nested case and throws,
    *  - a `TC` with no open patch transaction commits the projector's
    *    enclosing transaction — valid (the reference's
    *    PatchThatCommitsTheTransaction case); `TA` there would abort
    *    work already out of reach of the patch stream and throws,
    *  - a transaction still open at batch end commits with the batch
    *    (the reference's PatchThatLeavesTransactionOpen case: the
    *    projector's commit closes the dangling transaction).
    *
    * `eventOps` holds one (possibly empty) op seq per event, in batch
    * order; returns the surviving A/D ops per event plus whether a
    * patch transaction was still open at the end.
    */
  def dataOpsBatch(eventOps: Seq[Seq[PatchOp]]): (Seq[Seq[PatchOp]], Boolean) = {
    val out = eventOps.map(_ => ArrayBuffer[PatchOp]())
    val pending = ArrayBuffer[(Int, PatchOp)]()
    var txnOpenedAt = -1 // event index that opened the live txn; -1 = none
    def flush(): Unit = {
      pending.foreach { case (i, p) => out(i) += p }
      pending.clear()
    }
    eventOps.zipWithIndex.foreach { case (ops, ei) =>
      ops.foreach { o =>
        o.op match {
          case "TX" =>
            if (txnOpenedAt == ei)
              throw new RdfParseException("TX inside an open patch transaction")
            if (txnOpenedAt >= 0) flush() // commit the carried (external) txn
            txnOpenedAt = ei
          case "TC" =>
            flush() // commits the patch txn, or the projector's outer txn
            txnOpenedAt = -1
          case "TA" =>
            if (txnOpenedAt < 0)
              throw new RdfParseException("TA without open patch transaction")
            pending.clear() // aborted: pending ops (any event's) roll back
            txnOpenedAt = -1
          case "A" | "D" =>
            if (txnOpenedAt >= 0) pending += ((ei, o)) else out(ei) += o
          case _ => // H / PA / PD: no dataset effect
        }
      }
    }
    flush() // dangling open txn commits with the enclosing batch
    (out.map(_.toSeq), txnOpenedAt >= 0)
  }

  /** Whether applying this op stream leaves the dataset OUTSIDE a
    * transaction (reference: `isPatch() && !dataset.isInTransaction()`
    * after apply triggers the projector's own commit,
    * FusekiProjector.java:408-412). Entering state is "in the
    * projector's external transaction"; a TX op commits that external
    * transaction and opens the patch's own
    * (RDFChangesApplyExternalTransaction.java:22-29).
    */
  def closesTxn(ops: Seq[PatchOp]): Boolean = {
    var inTxn = true
    ops.foreach { o =>
      o.op match {
        case "TX" => inTxn = true
        case "TC" | "TA" => inTxn = false
        case _ => ()
      }
    }
    !inTxn
  }
}
