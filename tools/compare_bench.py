"""Sentinel-normalized bench comparison: adjudicate a round-over-round
"regression" in seconds instead of a full re-bench.

    python tools/compare_bench.py BENCH_r08_full.json BENCH_r09_full.json

Round 7's driver bench ran +35-46% on IDENTICAL untouched query sets —
pure box contention — and disproving it cost a full idle re-run. The
fix has two halves: bench.py emits a data-independent calibration query
(``sentinel_sec``) with every run, and this tool divides it back out.

For two runs A (baseline) and B (candidate):

- ``sentinel_ratio`` = B.sentinel / A.sentinel — how much slower the BOX
  was, independent of the engine. A ratio near 1 means totals compare
  directly; a ratio of 1.5 means a +50% total is expected noise.
- each shared subset total and each shared query is reported raw and
  normalized (B / sentinel_ratio), and flagged only when the NORMALIZED
  ratio leaves [1/(1+tol), 1+tol] (default tol 0.30 per query, 0.10 for
  subset totals — totals average out per-query jitter).

The normalization is deliberately linear — a contended box slows a CPU-
bound calibration sum and CPU-bound query stages roughly proportionally.
It cannot model cache eviction or IO contention, so treat a flagged
query as "re-measure this", never as proof.
"""

from __future__ import annotations

import json
import sys

SUBSETS = (
    "r01_subset_total",
    "r02_headline_total",
    "r03_headline_total",
    "r04_headline_total",
    "r06_headline_total",
    "r08_headline_total",
    "value",
)


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip())


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    sa, sb = a.get("sentinel_sec"), b.get("sentinel_sec")
    ratio = (sb / sa) if (sa and sb) else 1.0
    if not (sa and sb):
        print("WARNING: sentinel missing in one run (pre-r8 artifact?) — "
              "comparing raw, box contention invisible")
    print(f"sentinel: {sa} -> {sb}  box_ratio={ratio:.3f}  "
          f"loadavg {a.get('loadavg_start')} -> {b.get('loadavg_start')}")

    print("\nsubset totals (raw | normalized):")
    for k in SUBSETS:
        if k in a and k in b:
            raw = b[k] / a[k] if a[k] else float("nan")
            norm = raw / ratio
            flag = "  <-- CHECK" if abs(norm - 1) > 0.10 else ""
            print(f"  {k:22s} {a[k]:9.2f} -> {b[k]:9.2f}   "
                  f"x{raw:.3f} | x{norm:.3f}{flag}")

    qa, qb = a.get("queries", {}), b.get("queries", {})
    shared = sorted(set(qa) & set(qb))
    moved = []
    for q in shared:
        if qa[q] <= 0.2 and qb[q] <= 0.2:
            continue  # sub-noise-floor timings
        norm = (qb[q] / qa[q]) / ratio if qa[q] else float("inf")
        if norm > 1.30 or norm < 1 / 1.30:
            moved.append((norm, q, qa[q], qb[q]))
    print(f"\nqueries shared={len(shared)} "
          f"only_in_a={sorted(set(qa)-set(qb))} only_in_b={sorted(set(qb)-set(qa))}")
    if moved:
        print("normalized movers (>±30%) — re-measure before believing:")
        for norm, q, va, vb in sorted(moved, reverse=True):
            print(f"  x{norm:5.2f}  {q}  {va:.2f}s -> {vb:.2f}s")
    else:
        print("no query moved >±30% after sentinel normalization")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
