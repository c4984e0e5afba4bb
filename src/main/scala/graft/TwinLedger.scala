package graft

/** The rows-only ledger (r15 verdict #5): every driver query WITHOUT a
  * DuckDB oracle — `no_oracle` in the CORRECTNESS artifact — must be
  * registered here with its twin and its contract, so the per-round
  * "is the err set still exactly the twinned set?" audit is a diff
  * against THIS table instead of an archaeology session over r8+ round
  * prose. [[TwinLedgerSpec]] enforces the discipline structurally:
  *
  *   - the ledger's query set must equal the rows-only set derived
  *     from [[SparkEntry.queries]] minus [[SparkEntry.oracleSql]] —
  *     a new rows-only query without a ledger row fails the suite, as
  *     does a stale row for a query that gained an oracle or vanished;
  *   - a `twin` must name a registered query, and the twin CHAIN
  *     (rows-only twins may point at nearer rows-only relatives, e.g.
  *     x201 → x22 → x7) must terminate at a HASH-GREEN query within a
  *     bounded number of hops, cycle-free;
  *   - the `contract` must be the literal name of a test that exists
  *     in the test sources (scanned verbatim), so a renamed or deleted
  *     spec breaks the ledger loudly;
  *   - contract-only entries (no exact twin can exist: binary decode,
  *     seeded sampling, a harness measuring a sketch) must say WHY.
  */
object TwinLedger {

  /** One rows-only query's audit row.
    *
    * @param query    the rows-only driver query name
    * @param twin     nearest pinned relative (its chain must end at a
    *                 hash-green query); None = contract-only
    * @param contract literal test name pinning the semantics
    * @param why      why no oracle exists / how the twin pins it
    */
  final case class Entry(query: String, twin: Option[String],
      contract: String, why: String)

  val entries: Seq[Entry] = Seq(
    Entry("x8_minhash_pairs", Some("x43_text_dedup_exact"),
      "minhash estimates jaccard: near-dups high, unrelated low",
      "seeded-sketch est_jaccard values; the exact-Jaccard family the " +
        "estimate tracks is hash-green via x43"),
    Entry("x9_simhash_pairs", None,
      "simhash: identical docs collide; near-dup signatures are close",
      "64-bit seeded signature hamming distances have no ANSI replay; " +
        "PropertySpec fuzzes the near-dup metric"),
    Entry("x10_ngram_jaccard", Some("x43_text_dedup_exact"),
      "ngram jaccard verifies LSH candidates exactly",
      "candidate SET is LSH-seeded; the Jaccard verification formula is " +
        "exact and identical to the one x43 replays hash-green"),
    Entry("x12_ann_lsh", Some("x6_sim_topk"),
      "lsh ANN includes exact matches and respects k",
      "bucket membership is seeded; x6 pins the exact top-k ranking"),
    Entry("x13_media_features", None,
      "multimodal: deterministic stub features, frame sampling, blob pruning",
      "binary image/audio decode is not expressible in SQL"),
    Entry("x15_approx_distinct", None,
      "approx distinct: HLL estimate within rsd of the exact column beside it",
      "HLL++ register values are algorithm-specific; the exact count " +
        "rides in the SAME output row and the spec bounds the gap"),
    Entry("x17_ann_ivf", Some("x23_batch_topk"),
      "IVF: full-probe equals brute force; low-probe finds planted cluster",
      "probe pruning is approximate by construction; full probe ≡ exact " +
        "is the contract, x23 pins exact ranking"),
    Entry("x21_containment", Some("x35_containment_exact"),
      "winnowing guarantee holds on random shared substrings",
      "winnowing fingerprints are seeded; x35 pins the exact containment " +
        "semantics the fingerprints approximate"),
    Entry("x22_embedding_near_dup", Some("x7_embedding_pairs"),
      "embedding near-dup LSH: subset of exact pairs, usable recall",
      "hyperplane buckets are seeded; shared pairs carry the exact cosine " +
        "x7 replays hash-green"),
    Entry("x24_batch_topk_lsh", Some("x23_batch_topk"),
      "lsh batch top-k: every query recovers itself at rank 1; k respected",
      "bucket-bounded candidates; x23 is the exact batch-top-k twin"),
    Entry("x30_stratified_sample", None,
      "hash-stratified sample: fractions within tolerance, stable under relayout",
      "membership is the seeded operator's own choice — fractions, " +
        "determinism and relayout-stability are the contract"),
    Entry("x33_batch_topk_ivf", Some("x23_batch_topk"),
      "IVF batch ANN: full probe equals exact batch top-k; low probe finds self",
      "probe pruning approximate; full-probe ≡ exact spec-pinned"),
    Entry("x36_decontaminate", Some("x37_decontaminate_exact"),
      "cross-containment: planted train/eval overlap surfaces; eval boilerplate capped",
      "winnowing-fingerprint candidates; x37 pins exact trigram overlap"),
    Entry("x47_decontaminate_bloom", Some("x37_decontaminate_exact"),
      "bloom decontamination: no false negatives vs the join variant; counts exact at tiny fpp",
      "Bloom membership is probabilistic; no-false-negative superset + " +
        "x37's exact twin bound it"),
    Entry("x49_dedup_incremental", Some("x51_dedup_incremental_exact"),
      "incremental minhash == full run restricted to batch-touching pairs",
      "sketch path; x51 pins orientation/provenance exactly"),
    Entry("x63_freq_sketch", Some("x25_vocab_topk"),
      "count-min sketch: est >= exact always; tight sketch is exact on small vocab",
      "CMS estimates are merge-order-free but width-truncated; x25 is the " +
        "exact frequency twin"),
    Entry("x64_ivfpq_topk", Some("x23_batch_topk"),
      "IVF-PQ: full probe + full refine equals exact; tight refine keeps recall",
      "ADC candidate cuts approximate; full-probe-full-refine ≡ exact pinned"),
    Entry("x67_image_near_dup", None,
      "image dHash near-dups: planted resized re-encodes surface, corrupt bytes drop",
      "PNG decode is not expressible in SQL"),
    Entry("x68_heavy_hitters", Some("x25_vocab_topk"),
      "misra-gries: bounds hold under any layout, heavy tokens always present",
      "MG estimates are merge-order-dependent; x25 is the exact twin"),
    Entry("x71_audio_near_dup", None,
      "audio fingerprint near-dups: gain-scaled re-encodes surface, corrupt bytes drop",
      "WAV decode is not expressible in SQL"),
    Entry("x89_rolling_uniques_hll", Some("x90_rolling_uniques_exact"),
      "rolling uniques: sketch tracks exact within HLL error, windows actually roll",
      "HLL estimates aren't ANSI; x90 re-ships each day's user set as the " +
        "exact twin"),
    Entry("x106_quality_classifier_scaled", Some("x97_quality_classifier"),
      "logreg classifier: separable domains separate, relayout-stable, approx == exact",
      "plain-float-sum addition order is layout-dependent; x97 is the " +
        "order-pinned hash-green twin, paths agree ≤1e-6"),
    Entry("x111_pca_scaled", Some("x110_pca_power_iteration"),
      "pca power iteration: recovers a rank-1 direction, scaled twin agrees, relayout-stable",
      "constant-buffer partial sums are layout-dependent; x110 is the " +
        "sorted-fold hash-green twin"),
    Entry("x113_hard_negatives_lsh", Some("x112_hard_negatives"),
      "hard negatives: cross-label only, full-probe lsh equals exact, relayout-stable",
      "banded candidates; x112 pins the exact ranking"),
    Entry("x115_approx_quantiles", Some("x26_length_quantiles"),
      "approx quantiles: data-point values within GK rank error of the true order statistic",
      "GK sketch estimates aren't ANSI; x26 is the exact quantile twin"),
    Entry("x121_ann_recall", Some("x23_batch_topk"),
      "ann recall: full probe scores 1.0 everywhere, absent queries score 0, never inflates",
      "the measured side is an ANN sketch by design; the exact ranks it " +
        "scores against are x23's"),
    Entry("x144_dedup_recall", None,
      "pair recall: orientation-normalized, duplicates counted once, full cover = 1.0",
      "the harness MEASURES a seeded sketch — that's its purpose; the " +
        "recall arithmetic itself is spec-pinned"),
    Entry("x157_compression_ratio", Some("x80_char_entropy"),
      "deflate ratio: repetition compresses far below prose, short strings exceed 1",
      "DEFLATE bytes are implementation-defined; x80 is the hash-green " +
        "distributional cousin (unigram entropy)"),
    Entry("x176_audience_overlap_hll", Some("x175_audience_overlap"),
      "audience overlap: hand Jaccard, duplicate events collapse, sketch pins to exact",
      "HLL estimates aren't ANSI; x175 is the exact-count twin, every " +
        "pair spec-pinned against it"),
    Entry("x218_streaming_neardup_midthreshold",
      Some("x215_streaming_neardup_admission"),
      "mid-threshold admission: true-pair flags, intake partition, stores grow by admitted",
      "at 0.7 similarity is not transitive, so greedy online admission " +
        "depends on the batch split — valid decisions, no SQL oracle; " +
        "x215 is the SAME gate at threshold 1.0 where flagging induces " +
        "equivalence classes (hash-green), and the contract test pins " +
        "flags ⊆ the exact batch-mode pair set, statuses partition the " +
        "intake, and store growth = the admitted set"))
  // x201/x204/x206 left the ledger in r16: the replica-union known
  // answer (x205's pattern) made them hash-green — at the production
  // 0.95 threshold over an exact-replica union, sketch recall is
  // provably 1 on the planted pairs and nothing else verifies, so a
  // DuckDB oracle expresses the full output. x42/x118 likewise:
  // verified Jaccard 1.0 ⇔ identical gram sets, whose oracle is a
  // group-by over the sorted gram list — full semantics, no planted-
  // answer assumption.
}
