#!/usr/bin/env python3
"""Assemble the committed banded bench artifact from N same-binary runs.

Usage: band_merge.py OUT PREV_ARTIFACT RUN1 RUN2 [RUN3...]

Canonical value per key = min over runs; band = [min, max]; total =
min-of-runs totals. Keys whose canonical value exceeds 1.3x the
previous artifact's band max are listed in over_band_vs_prev with
their per-run values — in-artifact evidence that the number is
reproducible across runs, not a scheduling one-off (the r12->r13
artifact-process fix, kept per round).
"""
import json
import sys


def main() -> None:
    out, prev_path, *run_paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in run_paths]
    prev = json.load(open(prev_path))
    prev_band = prev.get("band", {})
    keys = sorted(set().union(*[r["queries"].keys() for r in runs]))
    band, queries = {}, {}
    for k in keys:
        vals = [r["queries"][k] for r in runs if k in r["queries"]]
        band[k] = [min(vals), max(vals)]
        queries[k] = min(vals)
    over = {}
    for k, v in queries.items():
        pb = prev_band.get(k)
        if pb and v > 1.3 * pb[1]:
            over[k] = {
                "runs": band[k],
                "prev_band": pb,
                "ratio": round(v / pb[1], 2),
            }
    totals = [r["value"] for r in runs]
    art = {
        "metric": "total",
        "value": min(totals),
        "unit": "sec",
        "n_queries": max(r["n_queries"] for r in runs),
        "queries": queries,
        "recall": runs[0].get("recall", {}),
        "prime_detail": runs[0].get("prime_detail", {}),
        "prime_self": runs[0].get("prime_self", {}),
        # min over runs = the quietest observation of the fixed
        # CPU probe; Bench compares its live spin against this to
        # stamp a run `noisy` (r17)
        "spin_base_ms": min(
            (r["spin_base_ms"] for r in runs if "spin_base_ms" in r),
            default=None,
        ),
        "noisy_runs": [r.get("noisy", False) for r in runs],
        # r18: the mid-run contention stamp (spin trail max > 2x the
        # committed reference at any point DURING the run, not just
        # at launch) — the r18 coda's "quiet launch, inflated run"
        # failure mode, now diagnosable per run
        "noisy_mid_runs": [r.get("noisy_mid", False) for r in runs],
        "sf": runs[0].get("sf"),
        "band": band,
        "runs": len(runs),
        "totals": totals,
        "band_note": "canonical = min over same-binary runs; band = "
                     "[min, max] per key; over_band_vs_prev carries "
                     "per-run evidence for keys >1.3x the previous "
                     "artifact's band max",
        "over_band_vs_prev": over,
        "prev_artifact": prev_path,
    }
    with open(out, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"wrote {out}: total={art['value']} n={art['n_queries']} "
          f"over_band_vs_prev={len(over)}")


if __name__ == "__main__":
    main()
