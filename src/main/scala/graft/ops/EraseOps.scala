package graft.ops

import org.apache.spark.sql.DataFrame

import graft.sink.{TableErase, UpsertSink}

/** Right-to-erasure SWEEP over a full admission-store group — the GDPR
  * direction of the incremental-store family: one call erases a
  * subject's documents from EVERY store modality present in the sink
  * (the q117-style composition: fingerprint counts, segment inventory,
  * MinHash band+shingle postings, substring-window inventory, DSIR
  * policy histograms, embedding LSH postings+vectors), under ONE
  * writer lease covering every member table — a concurrent
  * `snapshotMany` reader can never capture a state where the subject
  * is gone from one gate but still flagged by another, and a
  * concurrent admit can never slip postings in behind the erasure
  * (all key/decrement derivation runs inside the lease).
  *
  * Cost model: O(subject docs + touched buckets), never O(store) — the
  * count decrements re-derive the subject's additive contribution from
  * its text (map-only), the posting deletes scan the stores filtered
  * by the broadcast subject ids, and every bucket rewrite touches only
  * the subject's hash routes. Measured flat by the store-slope erase
  * leg in the bench artifact.
  *
  * Caller contract per modality (see the per-store retract ops):
  * `docs` carries the subjects' text EXACTLY as admitted, with the
  * same shaping parameters (`segWords`, `minTokens`), each subject
  * folded in exactly once; `fromTarget`/`fromRaw` split the subjects
  * by DSIR target-sample membership (pass empty frames when the
  * selection store is absent); `vecIds` are the subjects' embedding
  * ids. Stores absent from the sink are skipped — the sweep erases
  * from whatever subset of the family the pipeline actually runs.
  * The substring DELTA store (batch-keyed) is deliberately NOT part
  * of the sweep: its erasure granularity is the batch
  * ([[TextOps.substrDeltaRetractBatches]]), not the document.
  */
object EraseOps {

  /** Erase `docs` (and `vecIds`, for the embedding store) from every
    * store present in `sink`. Returns the member tables actually
    * erased (empty when no store exists — a no-op sweep).
    */
  def eraseSubjects(docs: DataFrame, idCol: String, textCol: String,
                    sink: UpsertSink,
                    fromTarget: Option[DataFrame] = None,
                    fromRaw: Option[DataFrame] = None,
                    vecIds: Option[DataFrame] = None,
                    vecIdCol: String = "vec_id",
                    segWords: Int = 25,
                    minTokens: Int = 20): Seq[String] = {
    val members = Seq.newBuilder[String]
    val plans = Seq.newBuilder[() => Seq[TableErase]]

    if (sink.exists(TextOps.FpStore)) {
      members += TextOps.FpStore
      plans += (() => TextOps.fingerprintRetractPlan(docs, idCol, textCol))
    }
    if (sink.exists(TextOps.SegStore)) {
      members += TextOps.SegStore
      plans += (() =>
        TextOps.segmentRetractPlan(docs, idCol, textCol, segWords))
    }
    if (sink.exists(TextOps.NearDupBands)) {
      members ++= TextOps.minhashRetractTables
      plans += (() => TextOps.minhashRetractPlan(docs, idCol, sink))
    }
    if (sink.exists(TextOps.SubstrStore)) {
      members += TextOps.SubstrStore
      plans += (() =>
        TextOps.substrRetractPlan(docs, idCol, textCol, minTokens))
    }
    if (sink.exists(SelectOps.AffStore)) {
      val ft = fromTarget.getOrElse(docs.limit(0))
      val fr = fromRaw.getOrElse(docs.limit(0))
      members += SelectOps.AffStore
      plans += (() => SelectOps.selectionRetractPlan(ft, fr, textCol, sink))
    }
    if (sink.exists(SimOps.EmbSigs)) {
      val (ids, idc) = vecIds.map((_, vecIdCol))
        .getOrElse((docs.select(docs(idCol)), idCol))
      members ++= SimOps.embLshRetractTables
      plans += (() => SimOps.embLshRetractPlan(ids, idc, sink))
    }

    val tables = members.result()
    val derivations = plans.result()
    if (tables.nonEmpty)
      sink.eraseMany(tables) { derivations.flatMap(_()) }
    tables
  }
}
