#!/usr/bin/env python3
"""Compare the latest bench_history.jsonl row against the most recent
COMPARABLE earlier row (same sf AND same cpus) median-to-median.

A query is flagged as a REGRESSION only when its median moved by more
than the noise its own min/max spread explains in BOTH runs — the test
the r8 board couldn't run (single-run numbers made a 4x host spike and
a real 2x regression look identical).

Same-cpus pairing is mandatory (r9 VERDICT #5): the identical code at
local[4] vs local[32] differs up to 2.7x on tiny windowed frames with
byte-identical plans — cross-cpus deltas measure the scheduler, not the
plan. Rows without a "cpus" field (pre-r9) are treated as cpus=4, which
is what they ran at.

Usage: python3 tools/bench_diff.py [history_file] [threshold]
  threshold: flag medians that moved more than this factor beyond the
             joint spread (default 1.15)
"""
import json, sys

def main(path="bench_history.jsonl", threshold=1.15):
    all_rows = [json.loads(l) for l in open(path)]
    # partial rows are a wall-cap-killed run's shutdown-hook flush
    # (r18 VERDICT #1): their medians cover an arbitrary prefix of the
    # set under an arbitrary slice of the warm-up, so they are never a
    # comparison baseline — diagnostic only. Degraded rows (r19 VERDICT
    # #1: the wall budget dropped the run to single-run medians on a
    # known-slow host) are complete but excluded the same way — diffing
    # against one would read every later quiet run as "improved".
    drop = lambda r: r.get("partial") or r.get("degraded")
    rows = [r for r in all_rows if r.get("queries") and not drop(r)]
    # a silently-dropped TRAILING row is easy to misread as "the diff
    # shows the current state" when a more recent wall-capped run
    # exists (r19 ADVICE #2) — say so
    trailing = 0
    for r in reversed(all_rows):
        if not drop(r):
            break
        trailing += 1
    if trailing:
        last = all_rows[-1]
        kind = "partial" if last.get("partial") else "degraded"
        detail = (f" ({last.get('completed', '?')}/{last.get('of', '?')} "
                  "queries)" if last.get("partial") else
                  " (single-run medians under a blown wall budget)")
        print(f"note: latest {trailing} row(s) dropped as partial/degraded "
              f"— newest is {kind}{detail}; diffing the last two "
              "full-quality runs")
    if len(rows) < 2:
        print("need at least two full-quality bench runs in history")
        return 0
    cur = rows[-1]
    cfg = lambda r: (r["sf"], r.get("cpus", 4))
    # Data-fingerprint pairing: the r10 driver regenerated sf0.1 with
    # 10x documents under the SAME path, so path+cpus pairing silently
    # compared different data. Rows carrying a "data" field (per-table
    # row counts from the parquet footers) must match it exactly; a
    # fingerprinted row is never diffed against a pre-fingerprint row.
    # A row WITHOUT a fingerprint (pre-r10, or a run whose footer reads
    # failed - Bench drops the field rather than writing a shared
    # sentinel) is never comparable to anything: missing-vs-missing
    # must not pair either, or two broken reads resume cross-data
    # diffs (r10 ADVICE #1).
    if cur.get("data") is None:
        print("current row carries no data fingerprint (footer reads "
              "failed or pre-fingerprint format) - refusing to diff")
        return 0
    same_data = lambda r: r.get("data") == cur.get("data")
    comparable = [r for r in rows[:-1] if cfg(r) == cfg(cur) and same_data(r)]
    if not comparable:
        n_path = sum(1 for r in rows[:-1] if cfg(r) == cfg(cur))
        why = (f" ({n_path} row(s) match sf+cpus but measured DIFFERENT "
               "testdata - cross-data deltas measure the generator, not "
               "the plan)" if n_path else "")
        print(f"no earlier row matches sf={cur['sf']} cpus={cur.get('cpus', 4)} "
              f"with identical table row counts{why}")
        return 0
    prev = comparable[-1]
    skipped = len(rows) - 1 - rows.index(prev) - 1
    if skipped:
        print(f"note: skipped {skipped} non-comparable row(s) to reach the "
              f"latest sf={cur['sf']} cpus={cur.get('cpus', 4)} match")
    common = sorted(set(prev["queries"]) & set(cur["queries"]))
    p_plans, c_plans = prev.get("plans", {}), cur.get("plans", {})
    flagged, improved = [], []
    for q in common:
        p_min, p_med, p_max = prev["queries"][q]
        c_min, c_med, c_max = cur["queries"][q]
        if p_med <= 0 or c_med <= 0:
            continue
        ratio = c_med / p_med
        # noise a query can self-explain: the larger of the two runs'
        # max/min spreads
        noise = max(p_max / p_min if p_min > 0 else 1.0,
                    c_max / c_min if c_min > 0 else 1.0)
        same_plan = (q in p_plans and q in c_plans
                     and p_plans[q] == c_plans[q])
        plan = "plan unchanged" if same_plan else (
            "PLAN CHANGED" if q in p_plans and q in c_plans else "plan n/a")
        if ratio > noise * threshold:
            flagged.append((q, p_med, c_med, ratio, noise, plan))
        elif 1 / ratio > noise * threshold:
            improved.append((q, p_med, c_med, ratio, noise, plan))
    print(f"{len(common)} common queries at sf={cur['sf']} "
          f"cpus={cur.get('cpus', 4)}, "
          f"totals {prev['total']:.1f}s -> {cur['total']:.1f}s")
    for name, rows_ in (("REGRESSION", flagged), ("improved", improved)):
        for q, p, c, r, n, plan in sorted(rows_, key=lambda x: -abs(x[3] - 1)):
            print(f"{name:>10}  {q:32s} {p:6.2f}s -> {c:6.2f}s "
                  f"({r:.2f}x, noise {n:.2f}x, {plan})")
    if not flagged and not improved:
        print("no median moved beyond its own spread - all noise")
    # Shuffle VOLUME deltas (bytes are plan-deterministic - no noise
    # band needed, any real move is a real move): flag queries whose
    # per-run shuffle read+write bytes moved more than the time
    # threshold AND by at least 1 MiB, the "same plan, 10x data moved"
    # regression plan hashes cannot see.
    p_sh, c_sh = prev.get("shuffle", {}), cur.get("shuffle", {})
    vol = []
    for q in common:
        if q not in p_sh or q not in c_sh:
            continue
        p_tot = sum(p_sh[q]); c_tot = sum(c_sh[q])
        if abs(c_tot - p_tot) < (1 << 20):
            continue
        r = c_tot / p_tot if p_tot > 0 else float("inf")
        if r > threshold or (r < 1 / threshold and p_tot > 0):
            vol.append((q, p_tot, c_tot, r))
    for q, p_tot, c_tot, r in sorted(vol, key=lambda x: -abs(x[3] - 1)):
        tag = "VOLUME UP" if c_tot > p_tot else "volume down"
        print(f"{tag:>11}  {q:32s} {p_tot/2**20:8.1f}MiB -> "
              f"{c_tot/2**20:8.1f}MiB ({r:.2f}x shuffle)")
    return 1 if flagged else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    path = args[0] if args else "bench_history.jsonl"
    thr = float(args[1]) if len(args) > 1 else 1.15
    sys.exit(main(path, thr))
