"""Per-query bench regression gate.

``bench.py`` compares nothing — the driver only records the suite total,
so a single query regressing 3x inside a flat total (round 3's
dedup_clusters) reaches the judge before the builder notices. This tool
diffs the freshly-written ``BENCH_DETAIL.json`` against the committed
``BENCH_BASELINE.json`` (the previous round's per-query timings at the
same SF) and fails on:

- any query slower than ``THRESH``x its baseline AND above the noise
  floor (sub-``FLOOR``-second timings jitter 2x run-to-run on a busy
  local[32]; a regression that small cannot matter at 100 TB either);
- any query that went from green to FAILED (-1.0);
- suite total slower than ``THRESH_TOTAL``x baseline.

Usage:
    PYTHONPATH=/root/repo python tools/bench_compare.py            # gate
    PYTHONPATH=/root/repo python tools/bench_compare.py --update   # promote
    PYTHONPATH=/root/repo python tools/bench_compare.py --snapshot r07

``--update`` promotes the current detail to the committed baseline —
run it (and commit) after a round's final accepted bench run. New
queries (no baseline entry) and removed ones are reported informationally
but never fail the gate.

``--snapshot <tag>`` copies the current detail to
``BENCH_DETAIL_<tag>.json`` — commit one per round so round-over-round
comparison never depends on the driver's rotating 50-query
``BENCH_r0N.json`` window (disjoint windows made r05 vs r06
incomparable). The gate itself still reads the promoted baseline.

Noise discipline: the gate divides every ratio by the MEDIAN shared
ratio first (the host delta — a fresh VM per round shifts every query
together; a real regression shifts alone), and a detail produced for
promotion should be the per-query MIN over >=2 bench.py runs
(single-run sub-second timings jitter 2-4x on a busy local[32]; the
round-7 A/B runs flagged two fully DISJOINT "regression" sets).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(ROOT, "BENCH_DETAIL.json")
BASELINE = os.path.join(ROOT, "BENCH_BASELINE.json")

THRESH = 1.5
THRESH_TOTAL = 1.3
FLOOR = 0.3  # seconds: below this, local-mode jitter dominates
MIN_SHARED = 20  # shared queries needed before the median measures the host


def main() -> int:
    if "--snapshot" in sys.argv:
        tag = sys.argv[sys.argv.index("--snapshot") + 1]
        dest = os.path.join(ROOT, f"BENCH_DETAIL_{tag}.json")
        shutil.copyfile(DETAIL, dest)
        d = json.load(open(dest))
        print(
            f"snapshot -> {os.path.basename(dest)}: sf={d['sf']} "
            f"total={d['total_sec']}s n={len(d['queries'])}"
        )
        return 0
    if "--update" in sys.argv:
        shutil.copyfile(DETAIL, BASELINE)
        d = json.load(open(BASELINE))
        print(
            f"baseline <- detail: sf={d['sf']} total={d['total_sec']}s "
            f"n={len(d['queries'])}"
        )
        return 0

    cur = json.load(open(DETAIL))
    base = json.load(open(BASELINE))
    # Working-tree churn warning (VERDICT r11 task 8): the round driver
    # overwrites BENCH_DETAIL.json after the final commit, so the
    # working-tree file may be a different (possibly noisier) run than
    # the committed adjudicated record. Surface which one this gate is
    # reading so a fresh session doesn't misread driver churn as a
    # regression. Since r12, bench.py writes min-of-N adjudicated
    # details (the "runs" key) — a detail WITHOUT it is a pre-r12
    # single-run artifact and its ratios carry full single-run noise.
    try:
        import subprocess

        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--", DETAIL],
            capture_output=True, text=True, cwd=ROOT, timeout=10,
        ).stdout.strip()
        if dirty:
            print(
                "NOTE: BENCH_DETAIL.json differs from the committed "
                "version (the driver rewrites it post-commit); the "
                "COMMITTED file is the round's adjudicated record."
            )
    except Exception:
        pass
    if "runs" not in cur:
        print(
            "NOTE: detail has no per-query 'runs' — a single-run "
            "(pre-adjudication) artifact; expect jitter on sub-second "
            "queries."
        )
    if cur["sf"] != base["sf"]:
        print(
            f"INCOMPARABLE: detail sf={cur['sf']} vs baseline sf={base['sf']} — "
            "regression ratios are only meaningful at the same scale "
            "factor; re-run bench.py at the baseline SF. (Exit 2: an "
            "ungateable input must not read as a green gate.)"
        )
        return 2

    cq, bq = cur["queries"], base["queries"]
    # Host normalization: the driver provisions a FRESH VM per round,
    # so a baseline promoted last round carries that host's speed. The
    # median per-query ratio measures the host delta (every query
    # shifts together under a slower host; a real regression shifts
    # alone) — divide it out before thresholding, exactly the
    # host-adjustment the round judge applies. Median over shared
    # green queries only; 1.0 when nothing is comparable.
    shared = [
        cq[n] / bq[n]
        for n in cq
        if n in bq and bq[n] > 0 and cq[n] > 0
    ]
    # the median only measures the host with a real sample behind it —
    # below MIN_SHARED the gate compares raw ratios (a 2-query file's
    # "median" would be whichever query regressed)
    host = (
        sorted(shared)[len(shared) // 2]
        if len(shared) >= MIN_SHARED
        else 1.0
    )
    print(f"host-median ratio: {host:.3f} (ratios below are adjusted)")
    regressions, broke = [], []
    for name, t in sorted(cq.items()):
        b = bq.get(name)
        if t < 0:
            # FAILED queries always gate — including brand-new ones
            # (the gate exists so a broken query never reaches the
            # judge first).
            broke.append(name)
        elif b is None:
            print(f"new    {name}: {t}s (no baseline)")
        elif b >= 0 and t > THRESH * b * host and max(t, b) >= FLOOR:
            regressions.append((name, b, t))
    for name in sorted(set(bq) - set(cq)):
        print(f"gone   {name} (was {bq[name]}s)")

    for name, b, t in regressions:
        print(f"SLOWER {name}: {b}s -> {t}s ({t / b / host:.2f}x adj)")
    for name in broke:
        was = f"was {bq[name]}s" if name in bq else "new query"
        print(f"BROKE  {name}: {was}, now FAILED")

    total_ratio = cur["total_sec"] / base["total_sec"] / host
    print(
        f"suite: {base['total_sec']}s -> {cur['total_sec']}s "
        f"({total_ratio:.2f}x adj), per-query regressions: "
        f"{len(regressions)}, broken: {len(broke)}"
    )
    if broke or regressions or total_ratio > THRESH_TOTAL:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
