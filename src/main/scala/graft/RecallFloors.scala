package graft

/** The approximate-ANN tier contract: each driver key, its exact
  * anchor key, and the recall@10 FLOOR it must clear at sf0.1.
  *
  * One table, two consumers: [[Bench]] trends the measured values in
  * the contract line (and warns on stderr below floor — the contract
  * line itself must survive, so the bench never exits nonzero), and
  * `AnnRecallGateSpec` ASSERTS the floors so a deliberately mistuned
  * tier fails `sbt test` — the r8 LSH retune (0.16 → 0.575) showed a
  * tier can rot silently when the number only trends.
  *
  * Floors sit 0.03–0.05 under the values measured at the driver
  * parameter points (docs/ANN_SWEEP.md): every tier is deterministic
  * given its seeds, but centroid training averages floats, whose
  * rounding shifts with partitioning — the slack absorbs that, not
  * tuning drift.
  */
object RecallFloors {
  /** approx driver key -> (exact anchor driver key, recall floor). */
  val tiers: Seq[(String, String, Double)] = Seq(
    // r10: margin-ordered multiprobe (16×8×4) lifted 0.575 → 0.710;
    // r15: probe budget 4→8 per table lifted to 0.860; r18: probes
    // SATURATED at 16 tables (8→12 bought +0.005), so the TABLE axis
    // moved instead — 24×8×6 measured 0.910 at budget 0.563
    ("ann_lsh_topk", "ann_bruteforce_topk", 0.86),
    // r15: nprobe 8→12 (the r13/r14 escalation dial applied to the
    // plain tier) — measured 0.740 → 0.935 at sf0.1
    ("ann_ivf_topk", "ann_bruteforce_topk", 0.88),
    // r17: rerank 8→16 (flat PQ's loss is pure rank error — the
    // sweep's rerank axis ran 0.815/0.915/0.965/0.985 at 8/16/24/32)
    // — measured 0.915 at sf0.1
    ("ann_pq_topk", "ann_bruteforce_topk", 0.86),
    // late-r9 retune to rerank=16, r14 nprobe 8→12, then r17 nprobe
    // 12→14: the sweep isolated the residual loss as CELL miss
    // (rerank 16→32 at nprobe 12 moved 0.840 → 0.865 only; nprobe
    // 12→14 at rerank 16 reached 0.895) — measured 0.895 at sf0.1
    ("ann_ivfpq_topk", "ann_bruteforce_topk", 0.85),
    // r15: nprobe 8→12 — measured 0.780 → 0.920 at sf0.1
    ("ann_ivfpq_res_topk", "ann_bruteforce_topk", 0.87),
    ("ann_sq_topk", "ann_bruteforce_topk", 0.95),
    ("ann_rerank", "ann_bruteforce_topk", 0.85),
    // r13: nprobe 8→12 escalation lifted 0.69 → 0.91 measured
    ("ann_ivf_filtered_topk", "ann_filtered_topk", 0.85),
    // persisted-index probes: build params mirror the in-memory
    // tiers, so the floors do too (r15: nprobe 12 in lockstep with
    // ann_ivf_topk; AnnIndexSpec holds probe ≡ in-memory parity)
    ("ann_index_ivf_probe", "ann_bruteforce_topk", 0.88),
    // r17: nprobe=14 in lockstep with the in-memory tier (the
    // cell-miss finding applies identically to the persisted
    // layout — 14 of 16 cell partitions read, pruning intact)
    ("ann_index_ivfpq_probe", "ann_bruteforce_topk", 0.85),
    // incrementally-maintained indexes (model state from the base
    // half, delta appended): hash-picked half-corpus centroids cover
    // the space as well as the full pick. r15: nprobe 8→12 in
    // lockstep with the fresh build — measured 0.755 → 0.925
    ("ann_index_ivf_append_probe", "ann_bruteforce_topk", 0.87),
    // the incremental PQ index encodes the appended half with the
    // BASE half's codebooks — measured 0.665 at rerank=16, a real
    // r11: the append path's 0.665 plateau was CELL miss (stale
    // centroid assignment of the appended half), not rank miss:
    // rerank 16→64 moved nothing while nprobe 8→12 lifted
    // 0.665→0.860. r18: one more step, 12→14 (the dial value the
    // fresh ivfpq probe escalated to in r17) — measured 0.945
    // (13 → 0.900). Probe escalation is the operational dial
    // between rebuilds; the floor sits under the escalated point
    ("ann_index_ivfpq_append_probe", "ann_bruteforce_topk", 0.88),
    // PCA-compressed first pass (64 → 32 dims) + exact rerank. The
    // 16-dim point measured 0.305 — the testdata embeddings are
    // near-isotropic, so the spectrum gives PCA little to keep; 32
    // dims is the honest byte/recall point. r15: rerank 8→16 lifted
    // the measured sf0.1 point 0.775 → 0.910 (stage-1 scan unchanged)
    ("ann_pca_topk", "ann_bruteforce_topk", 0.86),
    // r11 at 32 dims/rerank 8 measured 0.670 (prefix ≈ kept-fraction
    // recall on the isotropic testdata); r13 rerank 8→16 → 0.825;
    // r17 rerank 16→32 → 0.895 measured — stage-1 scan unchanged,
    // the rerank join stays O(queries·k·32) candidate ids
    ("ann_matryoshka_topk", "ann_bruteforce_topk", 0.85))
}
