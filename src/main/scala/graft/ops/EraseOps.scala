package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sink.{TableCountRetract, TableDelete, TableErase, UpsertSink}

/** Right-to-erasure SWEEP over a full admission-store group — the GDPR
  * direction of the incremental-store family: one call erases a
  * subject's documents from EVERY store modality present in the sink
  * (the q117-style composition: fingerprint counts, segment inventory,
  * MinHash band+shingle postings, substring-window inventory, DSIR
  * policy histograms, embedding LSH postings+vectors — plus the
  * SERVING layers when persisted under the same root: the ANN index
  * (the subjects' PQ codes and SQ8 refine codes leave `ann_codes` /
  * `ann_vecs8`, so probes stop returning them as neighbors and no
  * reconstructible approximation of their embeddings keeps serving)
  * and the BM25 inverted index (the subjects' posting and length rows
  * leave `bm25_postings` / `bm25_doclens` and their (count, token-sum)
  * mass subtracts from `bm25_stats`, so searches stop ranking them
  * and their mass stops inflating (N, avgdl))),
  * under ONE writer lease covering every member table — a concurrent
  * `snapshotMany` reader can never capture a state where the subject
  * is gone from one gate but still flagged by another, and a
  * concurrent admit can never slip postings in behind the erasure
  * (all key/decrement derivation runs inside the lease). ONE
  * exception: a SHARDED ANN index's shards are independent sub-sinks
  * with their own leases, erased in a second phase AFTER the main
  * group — between the phases (and between shards) a reader can
  * observe subjects gone from every admission gate yet still served
  * as neighbors by their home shard; the sharded index is a serving
  * artifact outside any snapshot composition, and per-shard atomicity
  * is its documented contract ([[SimOps.shardedIndexRemove]]).
  *
  * Cost model: O(subject docs + touched buckets), never O(store) — the
  * count decrements re-derive the subject's additive contribution from
  * its text (map-only), the posting deletes scan the stores filtered
  * by the broadcast subject ids, and every bucket rewrite touches only
  * the subject's hash routes. Measured flat by the store-slope erase
  * leg in the bench artifact.
  *
  * The sweep REFUSES silent partial erasure: when the selection policy
  * store is present the caller MUST pass the subjects' target/raw
  * membership split (the membership convention was the caller's at
  * build time — guessing is worse than failing), and when any
  * embedding-keyed member is present (the LSH near-dup store, or a
  * persisted ANN index — single or sharded) the caller MUST pass the
  * subjects' vector ids (an id-mapping convention the sweep cannot
  * know). A
  * member table the sweep deliberately does NOT retract — today only
  * the batch-granularity substring DELTA store — is returned under
  * [[EraseReport.excluded]] with the reason AND the resolved
  * containing-batch ids, never listed as erased.
  *
  * Crash-replay: `sweepId` rides into the sink's erasure journal
  * ([[graft.sink.UpsertSink.eraseMany]]'s exactly-once overload), so
  * replaying a crashed sweep with the SAME id and subjects converges
  * bit-identically to a single uncrashed run — replay it before other
  * writers mutate the member tables (the journal's documented recovery
  * protocol).
  *
  * Caller contract per modality (see the per-store retract ops):
  * `docs` carries the subjects' text EXACTLY as admitted, with the
  * same shaping parameters (`segWords`, `minTokens`), each subject
  * folded in exactly once; `fromTarget`/`fromRaw` split the subjects
  * by DSIR target-sample membership; `vecIds` are the subjects'
  * embedding ids. Stores absent from the sink are skipped — the sweep
  * erases from whatever subset of the family the pipeline actually
  * runs.
  */
object EraseOps {

  /** The durable per-sweep receipt ([[eraseSubjects]] writes one row
    * per member table): the compliance-audit record that an erasure
    * HAPPENED, queryable after the fact. Columns: sweep_id,
    * member_table, action ('erased' | 'excluded'), subjects (distinct subject ids in
    * the sweep), removed (rows deleted / total count decremented in
    * that table), ver_before/ver_after (the sink's content-version
    * fingerprints bracketing the sweep — `ver_before != ver_after`
    * proves bytes moved). First-write-wins per (sweep_id, member_table): a
    * crash-REPLAY of a sweep whose ledger row already landed leaves
    * the original receipt untouched (the replay converges data, the
    * receipt already recorded the logical erasure).
    */
  val LedgerTable = "erasure_ledger"

  /** What a sweep did, per member table — the in-memory half of the
    * receipt (the durable half is [[LedgerTable]]).
    *
    * @param erased       member tables actually retracted (a fileless
    *                     member retracts vacuously — nothing stored)
    * @param excluded     member tables present but NOT retracted, with
    *                     why — a caller that sees its table here and
    *                     ignores it is making a documented choice, not
    *                     suffering a silent gap
    * @param deltaBatches the substring delta store's containing-batch
    *                     ids for these subjects (empty when the store
    *                     is absent) — feed to
    *                     [[TextOps.substrDeltaRetractBatches]] after
    *                     deciding how to handle bystander contributions
    */
  final case class EraseReport(sweepId: String, subjects: Long,
                               erased: Seq[String],
                               excluded: Map[String, String],
                               deltaBatches: Seq[Long])

  /** Erase `docs` (and `vecIds`, for the embedding-keyed members) from
    * every store present in `sink`, journal the sweep under `sweepId`
    * (exactly-once under crash-replay), and write the per-table ledger
    * receipt (disable with `ledger = false` for fire-and-forget
    * retractions that keep their own records).
    */
  def eraseSubjects(docs: DataFrame, idCol: String, textCol: String,
                    sink: UpsertSink, sweepId: String,
                    fromTarget: Option[DataFrame] = None,
                    fromRaw: Option[DataFrame] = None,
                    vecIds: Option[DataFrame] = None,
                    vecIdCol: String = "vec_id",
                    segWords: Int = 25,
                    minTokens: Int = 20,
                    ledger: Boolean = true): EraseReport = {
    // refuse silent partial erasure BEFORE touching anything: a sweep
    // that reports success while leaving the subjects' counts in one
    // member is the one failure mode a compliance API cannot have
    require(!sink.exists(SelectOps.AffStore) ||
        (fromTarget.isDefined && fromRaw.isDefined),
      s"the selection policy store (${SelectOps.AffStore}) is present: " +
        "pass fromTarget/fromRaw (the subjects split by target-sample " +
        "membership — the caller's convention at build time; pass an " +
        "empty frame for a side with no members)")
    val annSingle = SimOps.ivfPqIndexExists(sink)
    val annSharded = sink.exists(SimOps.ShardMeta)
    require(!(sink.exists(SimOps.EmbSigs) || annSingle || annSharded) ||
        vecIds.isDefined,
      "an embedding-keyed member is present (" +
        Seq(if (sink.exists(SimOps.EmbSigs)) Some(SimOps.EmbSigs) else None,
          if (annSingle) Some(SimOps.IdxCodes) else None,
          if (annSharded) Some(SimOps.ShardMeta) else None)
          .flatten.mkString(", ") +
        "): pass vecIds (the subjects' vector ids — the id mapping is " +
        "the caller's convention; pass an empty frame for subjects " +
        "with no vectors)")

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
    if (SearchOps.invertedIndexExists(sink)) {
      members ++= SearchOps.invertedRetractTables
      plans += (() =>
        SearchOps.invertedRetractPlan(docs, idCol, textCol))
    }
    if (sink.exists(SelectOps.AffStore)) {
      members += SelectOps.AffStore
      plans += (() => SelectOps.selectionRetractPlan(fromTarget.get,
        fromRaw.get, textCol, sink))
    }
    if (sink.exists(SimOps.EmbSigs)) {
      members ++= SimOps.embLshRetractTables
      plans += (() => SimOps.embLshRetractPlan(vecIds.get, vecIdCol, sink))
    }
    if (annSingle) {
      members ++= SimOps.ivfPqRemoveTables(sink)
      plans += (() =>
        SimOps.ivfPqIndexRemovePlan(vecIds.get, vecIdCol, sink))
    }

    // the delta store is a MEMBER the sweep cannot retract at document
    // granularity — surface it loudly with the resolved batch ids
    val excluded = Map.newBuilder[String, String]
    val deltaBatches: Seq[Long] =
      if (!sink.exists(TextOps.SubstrDelta)) Seq.empty
      else {
        val b = TextOps.substrDeltaContainingBatches(docs, idCol, textCol,
          sink, minTokens)
        excluded += TextOps.SubstrDelta ->
          ("batch-granularity store: NOT retracted by this sweep; the " +
            s"subjects' windows appear in batches [${b.mkString(", ")}] — " +
            "erase whole batches via substrDeltaRetractBatches (removes " +
            "bystander contributions of those batches too; re-admit " +
            "survivors) or rebuild")
        b
      }

    val tables = members.result()
    val derivations = plans.result()
    val excludedMap = excluded.result()
    val subjects = docs.select(col(idCol)).distinct().count()
    val ledgerTables = tables ++ excludedMap.keys.toSeq
    val verBefore =
      if (ledger) ledgerTables.map(t => t -> sink.version(t)).toMap
      else Map.empty[String, Long]
    val removed = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    if (tables.nonEmpty)
      sink.eraseMany(tables, Some(sweepId)) {
        val erases = derivations.flatMap(_())
        if (!ledger) erases
        else erases.map {
          // checkpoint each payload once so the receipt's totals and
          // the retraction itself share one materialization
          case TableDelete(t, keys, pk) =>
            val k = keys.localCheckpoint(true)
            removed(t) += k.count()
            TableDelete(t, k, pk)
          case TableCountRetract(t, dec, pk, cntCols, drop) =>
            val d = dec.localCheckpoint(true)
            val s = d.agg(cntCols.map(c => sum(col(c)))
              .reduce(_ + _).as("__s")).collect()(0)
            removed(t) += (if (s.isNullAt(0)) 0L else s.getLong(0))
            TableCountRetract(t, d, pk, cntCols, drop)
        }
      }
    // the SHARDED ANN index erases AFTER the main group — per-shard
    // sub-sinks carry their own leases and erasure journals (see
    // [[SimOps.shardedIndexRemove]] for why per-shard atomicity is the
    // right contract for a serving artifact): a crash between the main
    // group and the shard loop replays under the same sweep id and
    // each side converges independently, exactly-once
    val shardVersBefore: Map[Int, Long] =
      if (annSharded && ledger)
        SimOps.shardedIndexVersions(docs.sparkSession, sink)
      else Map.empty
    val shardRemoved: Map[Int, Long] =
      if (annSharded)
        SimOps.shardedIndexRemove(vecIds.get, vecIdCol, sink, Some(sweepId))
      else Map.empty
    // the member name comes from the ONE owner of the shard naming
    // scheme, so receipts can always join back to on-disk shard paths
    val shardMember = (sh: Int) => SimOps.shardMemberName(sh)
    if (ledger && (ledgerTables.nonEmpty || shardRemoved.nonEmpty)) {
      val spark = docs.sparkSession
      import spark.implicits._
      val already = sink.exists(LedgerTable) && sink.hasData(LedgerTable) &&
        !sink.read(LedgerTable).filter(col("sweep_id") === sweepId).isEmpty
      if (!already) {
        val shardVersAfter: Map[Int, Long] =
          if (shardRemoved.nonEmpty)
            SimOps.shardedIndexVersions(spark, sink)
          else Map.empty
        val rows = ledgerTables.map { t =>
          val action = if (excludedMap.contains(t)) "excluded" else "erased"
          (sweepId, t, action, subjects, removed(t), verBefore(t),
            sink.version(t))
        } ++ shardRemoved.toSeq.sortBy(_._1).map { case (sh, n) =>
          (sweepId, shardMember(sh), "erased", subjects, n,
            shardVersBefore.getOrElse(sh, 0L),
            shardVersAfter.getOrElse(sh, 0L))
        }
        val rowsDf = rows.toDF("sweep_id", "member_table", "action",
          "subjects", "removed", "ver_before", "ver_after")
        sink.merge(LedgerTable, rowsDf, Seq("sweep_id", "member_table"),
          pkUnique = true)
      }
    }
    EraseReport(sweepId, subjects,
      tables ++ shardRemoved.keys.toSeq.sorted.map(shardMember),
      excludedMap, deltaBatches)
  }
}
