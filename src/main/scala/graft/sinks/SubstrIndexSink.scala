package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained exact-substring index — q156's lifecycle
  * twin of the q154 batch scan. Two sub-stores per table path:
  *
  *  - `pos`: each batch's positional grams (doc_id, pos, h, ing) as an
  *    [[IngestSegments]] row store (overwrite-by-batch-id replay
  *    contract, rename-before-delete compaction; the span probe dedups
  *    on (doc_id, pos) — h is functionally determined by them — so a
  *    crash-window duplicate can never split an island or inflate its
  *    n_grams). `ing` is the writing batch's id persisted as DATA and
  *    `pos = -1` rows are TOMBSTONES — the [[IngestSegments]]
  *    retraction convention (positions are ≥ 1 by construction, so the
  *    sentinel is unreachable): a doc deleted upstream (the CDC `D`
  *    route) is retracted by [[retract]], and every read resolves
  *    latest-wins per doc before serving.
  *  - `counts`: each batch's gram-count partial (h, n) as
  *    [[AdditiveSegments]] (sum-reconciled; counts cannot tolerate
  *    duplicates, so that lifecycle's delete-before-rename protocol
  *    applies). Retraction writes a NEGATIVE partial — the retracted
  *    doc's live gram occurrences, recomputed from the pos store — so
  *    the reconciled sum is exact over the post-retraction corpus
  *    with no store rewrite.
  *
  * Ingest cost tracks the BATCH — its own grams plus a count partial
  * bounded by the batch's distinct grams — and the corpus is never
  * rewritten; retraction cost tracks the retracted DOCS (a doc-keyed
  * read of their stored positions), never the corpus. The span probe
  * reads the reconciled counts (n ≥ 2 ⇒ duplicated anywhere in the
  * live corpus so far), joins the stored positions on the 8-byte hash,
  * and runs q154's island merge — hash-equal to the batch answer over
  * the live docs under the one-doc-one-admission contract (a doc's
  * grams all land in one segment per admission; q102/q103's df
  * argument — retraction + re-ingest preserves it because the
  * tombstone resolution leaves exactly one admission's rows live, and
  * the count partials telescope to that admission's counts). Per-batch
  * grams are persisted across the two writes so the text is
  * tokenized/hashed once per batch.
  */
object SubstrIndexSink {

  /** q154's witness length — the stored layout's geometry; a retune
    * requires a rebuild (positions and counts are L-specific). */
  private val L = 8

  private def reconcile(segs: DataFrame): DataFrame =
    segs.groupBy(col("h")).agg(sum(col("n")).as("n"))

  /** foreachBatch hook for pure-ingest streams: positions segment +
    * count partial, both keyed by batchId (replay-idempotent in both
    * sub-stores). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    cdcCore(path, batch,
      batch.sparkSession.range(0).select(col("id").as("doc_id")), batchId)

  /** Retraction hook (the CDC `D` route applied to the index): `batch`
    * carries the doc_ids deleted upstream. */
  def retract(path: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    cdcCore(path,
      s.range(0).select(col("id").as("doc_id"), lit("").as("text")),
      batch.select(col("doc_id")), batchId)
  }

  /** foreachBatch hook for a MIXED CDC stream — one micro-batch can
    * carry inserts and deletes together (the reference's OdsBaseDbApp
    * batch shape): rows with `op = 'D'` retract their doc_id, every
    * other row ingests. Within one batch DELETE WINS: a doc both
    * inserted and deleted in the same batch is never admitted (its
    * insert rows are anti-joined away before tokenization, so the
    * counts partial stays consistent with the tombstoned positions),
    * and its tombstone still kills any prior admission. */
  def cdc(path: String)(batch: DataFrame, batchId: Long): Unit =
    cdcCore(path,
      batch.filter(col("op") =!= "D").select(col("doc_id"), col("text")),
      batch.filter(col("op") === "D").select(col("doc_id")), batchId)

  /** The one write path all three hooks share — ONE pos segment (this
    * batch's gram positions + tombstone rows) and ONE count partial
    * (the inserts' positive counts unioned with the deletes' NEGATIVE
    * live-occurrence counts, read back from the pos store itself:
    * doc-keyed, the corpus text is never touched — it may no longer
    * exist upstream, which is exactly why the subtraction must come
    * from the store).
    *
    * Replay/idempotence: both writes are overwrite-by-own-id, and the
    * negative partial is computed over the store EXCLUDING this
    * batch's own rows (`ing != batchId`), so a crash between the two
    * writes — or after either — replays to byte-identical content.
    * Retracting an already-retracted or never-ingested doc resolves to
    * zero live positions → no subtraction and a harmless tombstone:
    * double-subtraction is impossible by construction. */
  private def cdcCore(path: String, ins: DataFrame, dels: DataFrame,
      batchId: Long): Unit = {
    val docs = dels.select(col("doc_id")).distinct().persist()
    // delete-wins within the batch: an in-batch-deleted doc is never
    // admitted, so its grams inflate neither positions nor counts
    val g = graft.functions.DedupOps.gramPositions(
      ins.join(broadcast(docs), Seq("doc_id"), "left_anti"), L).persist()
    try {
      // the store read exists only for deletes — a pure-ingest batch
      // (the overwhelmingly common one) must not pay a store scan
      val neg = if (docs.isEmpty) None
      else IngestSegments.readLive(g.sparkSession, s"$path/pos") match {
        case None => None
        case Some(raw) =>
          val live = IngestSegments.resolveTombstones(
            raw.filter(col("ing") =!= batchId), "doc_id", "ing",
            col("pos") < 0, IngestSegments.TombStat.NonNegative("pos"))
            // duplicate-tolerant store read (compact-race double-reads):
            // a crash-window copy must not double the subtraction
            .dropDuplicates("doc_id", "pos")
          Some(live.join(broadcast(docs), Seq("doc_id"), "left_semi")
            .groupBy(col("h")).agg((-count(lit(1))).as("n")))
      }
      g.withColumn("ing", lit(batchId))
        .unionByName(docs.select(col("doc_id"), lit(-1L).as("pos"),
          lit(0L).as("h"), lit(batchId).as("ing")))
        .write.mode("overwrite").parquet(s"$path/pos/ingest=$batchId")
      val pos = g.groupBy(col("h")).agg(count(lit(1)).as("n"))
      AdditiveSegments.write(
        neg.map(n => pos.unionByName(n)
            .groupBy(col("h")).agg(sum(col("n")).as("n")))
          .getOrElse(pos),
        s"$path/counts", batchId)
    } finally { g.unpersist(false); docs.unpersist(false); () }
  }

  /** The LIVE resolved position set (doc_id, pos, h): tombstones
    * applied latest-wins on the persisted `ing`, crash-window
    * duplicates deduped on (doc_id, pos) AFTER resolution (before it,
    * a dead admission's copy could shadow the live one). None when
    * nothing is stored. */
  private def livePositions(spark: SparkSession,
      path: String): Option[DataFrame] =
    IngestSegments.readLive(spark, s"$path/pos").map { raw =>
      IngestSegments.resolveTombstones(raw, "doc_id", "ing", col("pos") < 0,
          IngestSegments.TombStat.NonNegative("pos"))
        .select(col("doc_id"), col("pos"), col("h"))
        .dropDuplicates("doc_id", "pos")
    }

  /** The full-corpus duplicated spans — q154's output shape, computed
    * from the stored index instead of re-scanning any text. The
    * crash-window dedup runs AFTER the dup-hash join, not before: a
    * (doc_id, pos) duplicate carries the same h (functionally
    * determined), so the join just replicates it against the same dup
    * row and the later dedup sees both copies — equivalent answer, but
    * the dedup exchange then keys the SPARSE dup rows (span mass)
    * instead of the whole position store (the r16 plan audit caught a
    * corpus-wide (doc_id, pos) exchange upstream of the join that the
    * join was about to prune anyway). Tombstone resolution stays FIRST
    * (map-side broadcast) — it must see every copy's ing before any
    * dedup picks one. provenance() cannot take this order: its stats
    * aggregate over ALL grams, so it dedups corpus-wide by necessity. */
  def spans(spark: SparkSession, path: String): DataFrame =
    IngestSegments.readLive(spark, s"$path/pos") match {
      case None =>
        spark.range(0).select(col("id").as("doc_id"),
          col("id").as("span_start"), col("id").as("span_end"),
          col("id").as("n_grams"))
      case Some(raw) =>
        val pos = IngestSegments
          .resolveTombstones(raw, "doc_id", "ing", col("pos") < 0,
            IngestSegments.TombStat.NonNegative("pos"))
          .select(col("doc_id"), col("pos"), col("h"))
        val dup = AdditiveSegments.read(spark, s"$path/counts", reconcile)
          .filter(col("n") >= 2).select(col("h"))
        graft.functions.DedupOps.islandSpans(
          pos.join(dup, "h").dropDuplicates("doc_id", "pos"), L)
    }

  /** q161: span provenance served from the stored index — the resolved
    * position store IS the positional gram frame of the live corpus
    * (under the one-doc-one-admission contract, deduped on (doc_id,
    * pos) against crash-window replays), so the q157 shape runs over
    * it directly and the corpus is never re-tokenized. The reconciled
    * counts store is not needed here: provenance's own per-(gram, doc)
    * aggregate over the stored positions yields n_occ as a free sum,
    * and recomputing it keeps the twin hash-equal to q157 by
    * construction rather than by a second reconciliation proof. */
  def provenance(spark: SparkSession, path: String): DataFrame =
    livePositions(spark, path) match {
      case None =>
        spark.range(0).select(col("id").as("doc_id"),
          col("id").as("span_start"), col("id").as("span_end"),
          col("id").as("partner_doc"), col("id").as("n_occ"))
      case Some(pos) =>
        graft.functions.DedupOps.spanProvenanceFromGrams(pos, L)
    }

  /** Fold: dead positions drop, tombstones are KEPT (newest per doc,
    * `ing` preserved) — the [[IngestSegments]] retraction convention's
    * crash-window argument. */
  def compact(spark: SparkSession, path: String): Unit = {
    IngestSegments.compact(spark, s"$path/pos",
      fold = IngestSegments.foldWithTombstones(_, "doc_id", "ing",
        col("pos") < 0,
        liveCols = Seq("doc_id", "pos", "h", "ing"),
        dedupCols = Seq("doc_id", "pos"),
        mkTomb = _.select(col("doc_id"), lit(-1L).as("pos"),
          lit(0L).as("h"), col("ing"))), Seq.empty)
    AdditiveSegments.compact(spark, s"$path/counts", reconcile)
  }
}
