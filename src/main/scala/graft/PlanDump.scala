package graft

import org.apache.spark.sql.SparkSession

/** Writes PLANS.md: the formatted physical plan of each headline query
  * at the given sf dir — the artifact backing the scale claims in
  * README/COVERAGE (broadcasts where expected, partition pruning on the
  * stored ANN layouts, single-scan pivots, no fan-out joins). Each entry
  * may carry a commentary paragraph (the why-this-shape notes); the
  * footer holds the ScaleProbe numbers, updated when the probe re-runs.
  *
  * Usage: sbt "runMain graft.PlanDump /root/testdata/sf0.01 PLANS.md"
  */
object PlanDump {
  val headline: Seq[(String, String, String)] = Seq(
    ("q05_order_wide", "fact-fact shuffle join + broadcast dims", ""),
    ("q15_dau_day_over_day", "single-pass pivot (one scan, no join)", ""),
    ("q21_quality_score", "fused TextStats expression, regex-free", ""),
    ("q28_minhash_lsh", "LSH band join + exact-Jaccard verify", ""),
    ("q38_ann_lsh_topk", "stored bucket layout, partition-pruned probe", ""),
    ("q42_ann_ivf_topk", "stored IVF cells, partition-pruned probe", ""),
    ("q94_ann_ivfpq_topk", "stored IVF-PQ codes, ADC lookup scan over probed cells",
      """The probed scan reads (vec_id, codes) only — m=8 int codes per
        |vector instead of the 64-double embedding (the 32× I/O reduction
        |is the point of PQ) — pruned at LISTING time to the nprobe cells
        |(only the probed cell dirs are handed to the reader). Scoring is literal-array lookups + adds per row; no vector
        |math, no shuffle, no join: the plan is Scan → Project → TakeOrdered.
        |The codebooks/centroids stay driver-side (model-sized). At 100 TB
        |the codes table is the only thing that grows, and per-query cost
        |is nprobe/k of it — same asymptotics as q42 but 32× less I/O per
        |probed row.""".stripMargin),
    ("q95_ann_knn_join", "batched kNN join: broadcast probe set, pruned corpus scan, one window shuffle",
      """The batch form of the IVF probe: per-query probe cells are ranked
        |map-side with the fused cosine (no exchange), the (query, cell)
        |probe set broadcasts, and the corpus read carries BOTH prunings —
        |listing-time pruning from the driver-enumerated probed-cell union
        |(bounded by the index's k, never by the query count) and the
        |broadcast join. A shuffle join on ~8 cell keys would collapse
        |parallelism to the cell count; broadcast keeps the corpus at scan
        |parallelism. The only exchange in the plan is the top-k window's
        |hash partition on query_id — high-cardinality, skew-free. At
        |100 TB queries arrive in batches: cost per batch is one pruned
        |corpus-slice scan shared by ALL queries, vs one driver round-trip
        |each under the single-probe form.""".stripMargin),
    ("q96_ann_pq_knn_join", "batched ADC kNN over PQ codes: probe-side ADC tables, lookup-only scan side",
      """The q95 shape over the compressed layout: the per-query ADC tables
        |(m×ksub dots against codebook literals) and cell-dot vector are
        |computed with interpreted HOF folds on the PROBE side — queries×1
        |rows, where interpreted is free — and travel with the broadcast.
        |The codes-side score is m element_at lookups + adds per row
        |(codegen'd), on 8-int code rows instead of 64-double vectors: the
        |32× I/O reduction of q94 retained in batch form. Same two
        |prunings as q95, same single window exchange.""".stripMargin),
    ("q97_bucketed_join", "stored bucketed fact pair: exchange-free SortMergeJoin",
      """Both scans read the bucketed layout (`Bucketed: true`, 8 buckets
        |each side), so the SMJ subtree holds NO exchange — the join's
        |shuffle happened once, at layout build time, and every subsequent
        |orderkey join rides it. The only exchange in the plan is the
        |5-row priority aggregate's. The in-partition Sorts under the SMJ
        |are elidable too (the layout writes one file per bucket; enabling
        |spark.sql.legacy.bucketedTableScan.outputOrdering uses the SORTED
        |BY metadata) — kept in the default plan because the conf is
        |session-global and the sorts are narrow. At 100 TB this is the
        |fact⋈fact answer where broadcast can't apply and a per-query
        |shuffle of either side is the dominant cost: co-location turns
        |the recurring exchange into a one-off ingest.""".stripMargin),
    ("q98_bucketed_snapshot", "live bucketed table: bucketed main ∪ micro-batch delta tail",
      """The between-folds serving shape of the incremental lifecycle: the
        |main scan reads the bucketed layout, the tail is the unfolded
        |delta segments (micro-batch-sized by construction), and the union
        |feeds one aggregate. The oracle is the PLAIN full table — the
        |hash gate proves the main/tail split loses no row and reads none
        |twice in the worst readable state. After a fold the tail branch
        |disappears and every key join on the main is co-located
        |(q97's plan).""".stripMargin),
    ("q99_partitioned_table", "range-partitioned lifecycles: frozen main + main∪tail + cold delta in one read",
      """One bucketed lifecycle per partition value — the 100 TB answer to
        |the fold's O(table) rewrite bound: a fold rewrites only
        |partitions with live deltas, and PartitionedTableSpec pins frozen
        |partitions' files byte-identical across folds. This plan reads
        |all three lifecycle states at once (P: frozen folded main, O:
        |main plus unfolded tail, F: cold delta-only) and the oracle is
        |again the plain full table.""".stripMargin),
    ("q141_embedding_gram", "gram_grid TypedImperativeAggregate: the buffer IS the d(d+1)/2 grid",
      """One corpus scan into ObjectHashAggregate(gram_grid): partial
        |grids per partition, one grid-sized merge exchange, and the only
        |posexplodes unpack the RESULT row and the 1-row (pos→i,j)
        |broadcast map — the 125M-pair explode of the round-11 shape is
        |gone (2.83 s → 0.43 s at sf0.1). Cells are exact signed 128-bit
        |(the decimal(38,0) headroom, allocation-free).""".stripMargin),
    ("q152_order_wide_stream", "q05 served from the stream-stream join lifecycle store", ""),
    ("q153_ann_recall", "recall@10 monitor: probes + brute-force exact ranking", ""),
    ("q154_substring_dedup", "exact-substring spans: fused positional grams, hash-count, island merge",
      """Two linear passes, no doc pairing: positional shingle hashes →
        |hash-count with map-side partial agg (hot grams collapse in the
        |combiner) → shuffle join on the 8-byte key → one doc-partitioned
        |window. Fixed witness length collapses Lee et al.'s suffix array
        |to gram counting.""".stripMargin),
    ("q155_substring_remove", "the every-occurrence cut: span lists LEFT-join the corpus, HOF index filter",
      """q154's spans collapse to per-doc lists (spans-sized, ≪ corpus),
        |the corpus LEFT-joins them on doc_id — span-less docs take the
        |null branch with zero token work — and one codegen'd
        |filter→element_at→array_join chain rebuilds the kept text.""".stripMargin),
    ("q156_substring_stream", "q154 served from the incremental two-store index (positions + additive counts)",
      """The probe reads the reconciled count store (n ≥ 2 ⇒ duplicated),
        |joins the stored positions on the 8-byte hash and runs the same
        |island merge — no text re-scan anywhere in the plan; ingest cost
        |was measured batch-bound (PLANS substring_ingest).""".stripMargin),
    ("q157_span_provenance", "per-gram provenance via the fused 32-byte SpanStatsAgg state",
      """One scan → one partial-combined exchange keyed h: the custom
        |TypedImperativeAggregate carries (n_occ, min1, c_min1,
        |second-lowest-distinct doc) in fixed state however hot the gram
        |— no per-(gram, doc) pre-shuffle (those keys defeat map-side
        |combining), no join-back for min2, never a per-gram doc list.
        |The dup positions and dup-gram stats checkpoint once each
        |(span-mass / dup-vocabulary sized); the round-14 ScaleProbe row
        |measured the r13 composition at 105.8 s vs the span scan's
        |14.1 s at 69M gram rows — this shape lands in the span scan's
        |own cost class (PLANS span_provenance).""".stripMargin),
    ("q158_duplication_report", "spans → per-doc covered mass → per-source rollup",
      """q154's span pass plus one corpus token-count scan; both rollup
        |sides collapse map-side and the final join is ≤#sources ×
        |≤#sources. Island disjointness makes covered mass an exact
        |integer sum (DedupSpec ties it to q155's removed mass).""".stripMargin),
    ("q159_substring_auto", "q154 routed plain-vs-Bloom by scan 1's dup-hash count",
      """The q106 router convention on the span scan: the dup set is
        |counted anyway (it is scan 2's join input / the Bloom's sizing),
        |so the route is free — below the BloomFilterAggregate clamps the
        |scan-2 exchange is pruned map-side through the filter (the
        |low-dup regime, 1.5-2.2× measured); at/past them (boilerplate-
        |heavy: dup set ≈ gram vocabulary, the filter would saturate) the
        |plain two-pass shuffle join is the floor. Either road, same
        |spans — the exact join downstream kills FPs.""".stripMargin),
    ("q162_substring_decontam", "span-level decontamination: bench gram set broadcast, NO corpus shuffle before the island merge",
      """The cross-corpus member of the span family: the dup set is the
        |benchmark's gram vocabulary (eval-registry-sized → broadcast),
        |so the training scan streams past it map-side — cheaper than
        |q154's two-pass, no corpus-wide count aggregate at all; the
        |only exchanges are the sparse island window and the doc-keyed
        |cut join. Training-internal duplication is KEPT by
        |construction (decontamination ≠ dedup; spec-pinned). The
        |registry's sizing judgment is ROUTED (r15): past the session
        |broadcast budget the q75 Bloom road prunes map-side, past the
        |Bloom clamps the plain shuffle join is the floor — all three
        |spec-pinned hash-equal.""".stripMargin),
    ("q164_decontam_registry", "q162 served from the persisted benchmark registry (fold + tail lifecycle)",
      """The q156 convention applied to the EVAL side: benchmark batches
        |fold into the BenchRegistrySink store (set semantics — replay
        |and crash-window duplicates are invisible under the serving
        |distinct, so the simple row-store protocol suffices); the cut
        |reads stored gram hashes instead of re-tokenizing the registry
        |per run and shares q162's routed span seam verbatim, so the
        |stored road cannot diverge on route or span semantics.
        |Registry maintenance never touches the training corpus.""".stripMargin),
    ("q160_substring_remove_stream", "q155's cut fed by the stored index's spans",
      """Span side: the q156 index probe (stored positions + reconciled
        |counts — no re-tokenize). The only corpus touch is the doc-keyed
        |LEFT join the cut itself needs for the text; at 100 TB the span
        |list stays spans-sized and the join is the same doc-hash
        |exchange as q155's.""".stripMargin),
    ("q161_span_provenance_stream", "q157's audit view from stored positions only",
      """The stored position rows ARE the positional gram frame, so the
        |whole provenance shape — per-(gram, doc) combine, vocabulary-
        |sized stats, island merge, partner join — runs without touching
        |document text at all; n_occ falls out of the same aggregate
        |(PLANS span_provenance: cost tracks the span scan across the
        |1.6M-doc sweep).""".stripMargin),
    ("q167_substring_retract", "q154 over the retracted store: routed tombstone resolve + negative-partial counts",
      """The retraction convention measured end-to-end: the position read
        |resolves tombstones through the r17 ROUTED join — the per-doc
        |tombstone aggregate is checkpointed once (retracted-doc-sized;
        |row-group stats prune the tomb scan to nothing on unretracted
        |segments), counted, and joined broadcast here / Bloom-prefiltered
        |or plain past the budgets; a store with NO retraction history
        |skips the join entirely (the zero-count short-circuit every
        |unretracted serving read now gets for free). The dup set comes
        |from the SAME reconciled counts store, summing the retraction
        |batches' NEGATIVE partials — no store rewrite, no corpus
        |re-scan, retraction cost tracks the retracted docs. Hash-gated
        |against q154's batch oracle on the post-retraction corpus
        |through retract → resurrect → fold → live-tail
        |re-retract.""".stripMargin),
    ("q168_decontam_retract", "q162 from the registry after benchmark retirement",
      """Per-doc (doc_id, h) pair rows + tombstone resolution: a retired
        |benchmark's grams stop cutting while grams shared with a
        |surviving benchmark keep cutting (set subtraction is exact only
        |on pair rows). Serving shape = q164's routed seam on the
        |resolved hash set; the training corpus is untouched by any
        |registry maintenance.""".stripMargin),
    ("q169_ann_retract", "ANN probe over the retracted LSH store: bucket-blind tombstone side table, routed + purged",
      """A deleted vec_id must NEVER surface — not "until compaction":
        |tombstones live in a separate unpartitioned side table
        |(retracted-id-sized, read whole by every probe), because an
        |in-store tombstone under one bucket dir would be invisible to a
        |probe pruned to other buckets. Corpus rows carry a persisted
        |logical ing; resurrection = a higher-ing re-ingest. Folds drop
        |dead versions; the side table's own compact now PURGES
        |provably-inert tombstones (no readable row at-or-below the
        |tombstone's ing — checked against the live store strictly after
        |its delete phase), so the table tracks CURRENT retractions, not
        |lifetime churn, and the r17 routed resolve
        |(broadcast/Bloom/plain by counted size) bounds whatever remains
        |at any churn scale.""".stripMargin),
    ("q170_pq_retract", "the q169 convention on the PQ codes store",
      """Same side-table design on the cell-partitioned codes table; the
        |ADC probe applies tombstones (routed, zero-count short-circuit)
        |before its recency window, and the join enters the plan ONLY
        |when a retraction ever happened, so unretracted q94/q107 plans
        |are byte-identical to r15's. Compaction purges inert tombstones
        |under the same after-the-delete-phase rule as q169.""".stripMargin),
    ("q172_vocab_retract", "q82 over the retracted vocabulary store: rows ledger + negative partials",
      """The substring counts convention ported to the first additive
        |text store: serving reads stay VOCABULARY-sized (the additive
        |agg sub-store, Heaps' law), while a per-doc (doc_id, token, tf)
        |ledger — read ONLY on deletes, doc-keyed — supplies the exact
        |negative partial a retraction subtracts. A token whose every
        |occurrence was retracted telescopes to zero and leaves the
        |table (df > 0 read filter); retraction cost tracks the
        |retracted docs, never the corpus.""".stripMargin),
    ("q173_phrase_retract", "q65 over the retracted phrase index: per-doc ledger, aggregates derive at read",
      """min_doc/max_doc are NOT invertible — no negative partial can
        |raise a min after its doc is deleted — so this store holds
        |per-doc (doc_id, phrase, occ) pair rows (the BenchRegistrySink
        |argument) and derives all five published aggregates at read
        |time: one routed tombstone resolve (map-side at this scale) +
        |one (doc, phrase)-keyed combine + one phrase-keyed aggregate.
        |The pair scan is the price of exactness under deletion; folds
        |bound it to the live corpus.""".stripMargin),
    ("q174_sourcestats_retract", "q84's mixture plan over the retracted source stats",
      """The cheapest ledger in the tier (ONE row per doc) keeps the
        |always-on dataset card retractable: a retired source's docs
        |subtract exactly, a zeroed source leaves the card, and the
        |tempered-mixture Σ√ denominator renormalizes to the live
        |sources — the training-mix decision stops budgeting ghost
        |tokens the moment the CDC delete lands.""".stripMargin),
    ("q175_retention_retract", "GDPR-shaped user deletion through the retention store",
      """The reference's user_info dim delete applied to the behavioral
        |tier: the activity set is an IngestSegments row store keyed by
        |USER for tombstones (set semantics — pairs arrive in any number
        |of batches and distinct on read), so one tombstone row kills a
        |user's whole history wherever it lives (fold or tail), and a
        |re-signup re-cohorts from the live set only. The cohort matrix
        |still derives at read over ≤ (users × active days) rows.""".stripMargin),
    ("q176_session_retract", "user deletion through the finalized-session store",
      """Same user-keyed tombstone resolve on the (user_id, start_us)
        |session rows; the corpus summary re-derives from the resolved
        |set, so count/means/conversion shift to the live users exactly
        |(hash-gated against q147's batch oracle over live users).""".stripMargin),
    ("q171_dedup_retract", "node deletion in the label chain: recompute ONLY the retracted docs' clusters from stored edge provenance",
      """The one retraction a contraction step cannot express: a deleted
        |node can SPLIT its cluster or retitle it, so the sink keeps the
        |edges (live iff newer than BOTH endpoints' newest tombstones)
        |and the retract step collapses just the affected clusters'
        |surviving edges — affected-component-sized, untouched clusters
        |spliced verbatim via one broadcast anti-join on the rep set.
        |Hash-gated against the same recursive-closure oracle as
        |q62/q115/q116 on the post-retraction corpus, through split,
        |rep change, vanish, resurrection re-merge and a post-fold
        |live-tail retraction.""".stripMargin),
    ("q50_asof_join", "merge-form as-of (union + window, no join)", ""),
    ("q51_embedding_dups", "bounded pairwise cosine (verification tier)", ""),
    ("q54_embedding_dups_lsh", "banded hyperplane LSH + fused-cosine verify",
      """One straight pipeline: fused SignBandVals banding (codegen, one
        |primitive pass per row), equality join on (band, value), distinct,
        |then the verify tier joins vectors back by id and scores each
        |candidate with the fused CosineSim expression. The earlier form
        |persisted the candidate frame and eagerly localCheckpoint-ed the
        |result — blocks that leaked into whatever the session ran next —
        |and scored pairs through the zip_with/aggregate HOF composition,
        |which is CodegenFallback (interpreted): the verify stage alone
        |cost 19s at sf0.1 and grew run-over-run. Fused + unpersisted:
        |0.8s, flat across runs. At scale the only wide exchange is the
        |narrow (vec_id, band, bv) band table; embeddings ship once,
        |keyed by id, to exactly the candidate set.""".stripMargin),
    ("q65_phrase_index", "inverted-index build (fused explode + two-phase distinct agg)",
      """Trigram generation is the fused `TokenNgrams` codegen expression (the
        |interpreted `transform(sequence, i -> concat(...))` HOF measured
        |~1.4 ms/doc — 7 s at sf0.1 because one parquet row-group means one
        |task; fused ≈ 10 µs/doc). Catalyst plans the mixed
        |distinct/non-distinct aggregate as the standard two-phase form: a
        |first exchange keyed (phrase, doc_id) dedups postings with map-side
        |partials, a second keyed (phrase) finishes. Both shuffles carry
        |narrow rows (phrase + 4 longs). At 100 TB the only hot spot is
        |ubiquitous phrases (df-cap them before publish); AQE skew-split
        |handles the band in between.""".stripMargin),
    ("q67_decile_filter", "exact global quantile without a global sort",
      """The corpus is scanned twice (once to build the distinct-value frame,
        |once to filter) but never globally sorted: the single-partition
        |Sort+Window runs over the aggregated value frame (≤ distinct token
        |counts — thousands of rows at any corpus size), and the filter side
        |joins against a broadcast single-row threshold. The alternative —
        |percent_rank over the raw corpus — is the global-sort cliff this
        |shape exists to avoid.""".stripMargin),
    ("q68_pack_greedy", "stateful shard-local scan (the one typed-Dataset operator)",
      """One exchange on the shard key, a within-partition sort, and a linear
        |walk. Cum-sum-with-reset (first-fit bin packing) cannot be a window
        |function, so this is the designed `flatMapSortedGroups` escape hatch
        |— the iterator holds four longs of state per shard regardless of
        |shard size.""".stripMargin),
    ("q69_source_overlap", "phrase→sources inverted index, fused pair explosion (no self-join)",
      """ONE wide shuffle builds the phrase→sorted-source-set inverted index
        |(collect_set with map-side partial agg — in-flight state per key is
        |bounded by #sources, so hot phrases never concentrate rows). Each
        |phrase then explodes its C(df, 2) ordered source pairs through the
        |fused OrderedPairs expression — the HOF flatten/transform/slice
        |composition it replaced is CodegenFallback, interpreted on one row
        |per DISTINCT PHRASE (1.47 → ~1.0 s at sf0.1); the phrase self-join
        |before THAT shuffled the presence list twice and paid the join
        |besides. The df-cap drops phrases present in every source (constant
        |+1 to all pairs/sizes, zero ranking information, and at 100 TB
        |boilerplate IS everywhere) before pair generation, so per-phrase
        |fan-out is strictly < C(#sources, 2) and the aggregate keys are the
        |≤ C(#sources, 2) source pairs. Sizes join broadcast (≤ #sources
        |rows).""".stripMargin),
    ("q71_e2e_pipeline", "quality gate → dedup → sample → pack in one plan",
      """Two hash exchanges end to end — the dedup-keeper shuffle on the
        |content hash and the packing window's shuffle on the shard key; the
        |quality gate, the mixture-sampling hash rule, and the bucket
        |assignment are all map-side expressions fused into the scan
        |stages.""".stripMargin))

  val footer: String =
    """
      |## ScaleProbe round-5 additions (local[32], synthetic corpora)
      |
      |```
      |phrase_index_build   100k 2.7s | 400k 5.1s | 1.6M 30.4s   (93M trigram rows at 1.6M docs;
      |                     shuffle-bound through the two distinct-agg exchanges — the fused
      |                     TokenNgrams scan itself is noise; the 400k→1.6M step pays shuffle spill)
      |pack_greedy          100k 0.65s | 400k 0.45s | 1.6M 0.66s (flat — the one-exchange +
      |                     lazy-iterator scan is below measurement noise at these sizes)
      |sign_band_scan       100k 0.36s | 400k 0.20s | 1.6M 0.55s (linear)
      |winnow_fingerprints  100k 0.95s | 400k 0.78s | 1.6M 2.52s (linear)
      |```
      |
      |Bench context at sf0.1 after the round: 74 queries total ≈ 28-39 s
      |(median-of-3 per query; box swings ±20 % run to run) against the 90.5 s
      |(2× baseline) gate; the heaviest single query is q29's irreducible
      |exact-verify tier (~3.4 s), and every round-5 addition lands sub-second.
      |
      |## ScaleProbe round-6 additions (local[32])
      |
      |The two asymptotics the round-5 verdict contested, at 1×/4×/16× docs
      |(synthetic 5 000-token-vocabulary corpus — adversarially dup-dense):
      |
      |```
      |simhash_tiered_candidates  100k  7.97s | 400k 69.44s | 1.6M 587.1s  (uncapped two-tier
      |                           enumeration; exponent ~1.54 on THIS corpus — linear on the
      |                           driver fixtures, but the synthetic vocab concentrates
      |                           occupancy into hot block values)
      |simhash_tiered_capped      100k 21.85s | 400k 50.13s | 1.6M 155.0s  (same keys through
      |                           cappedBandCandidates(64): exponent ≤0.8 — enumeration back
      |                           to ~linear, 3.8× faster at 1.6M and diverging)
      |cluster_collapse           100k 11.46s | 400k 10.64s | 1.6M 11.91s  (q62 label
      |                           propagation, 3-doc-chain graph: flat — diameter-bound
      |                           rounds, per-round cost linear in edges)
      |```
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = Graft.localSession(4)
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` at `$sfDir`. AQE final plans ")
    sb.append("(executed once so runtime re-optimizations are visible).\n")
    headline.foreach { case (name, note, detail) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0).trim
      sb.append(s"\n## $name — $note\n\n```\n$plan\n```\n")
      if (detail.nonEmpty) sb.append(s"\n${detail.stripLineEnd}\n")
    }
    sb.append(footer)
    // PLANS.md accumulates hand-written round narrative AFTER the
    // generated footer (the ScaleProbe sections appended per round);
    // regeneration would silently destroy it. Preserve the old file
    // verbatim so nothing is lost, and say so loudly.
    val target = java.nio.file.Paths.get(out)
    if (java.nio.file.Files.exists(target)) {
      val bak = java.nio.file.Paths.get(out + ".bak")
      java.nio.file.Files.copy(target, bak,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[plandump] existing $out backed up to $bak — " +
        "re-append any hand-maintained sections from it")
    }
    java.nio.file.Files.writeString(target, sb.toString)
    println(s"[plandump] wrote $out")
    spark.stop()
  }
}
