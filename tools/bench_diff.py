#!/usr/bin/env python3
"""Compare two bench profiles (BENCH_DETAIL.json, or BENCH_r{N}.json whose
`tail` embeds the stdout JSON line) and print per-query deltas worth
looking at. Guards against the host's noisy-neighbor swings: a delta is
only "worth looking at" when it exceeds both a ratio and an absolute
floor, and the summary separates added/removed queries from timing moves.

CAVEAT: the stdout line inside a driver BENCH_r{N}.json carries only the
20 slowest (headline) queries — diffing one against a full
BENCH_DETAIL.json covers just that headline set, and "added/removed"
then mostly means "inside/outside the top-20". The tool warns when a
side looks headline-only; use two BENCH_DETAIL.json files for full
coverage.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [ratio=1.5] [floor_sec=0.5]
"""
import json
import re
import sys


def load(path):
    d = json.loads(open(path).read())
    if "queries" in d and isinstance(d["queries"], dict) and "metric" in d:
        return d
    # driver-wrapped BENCH_r{N}.json: the stdout JSON line lives in `tail`
    m = re.search(r'\{"metric".*', d.get("tail", ""))
    if not m:
        sys.exit(f"{path}: no bench JSON found")
    return json.loads(m.group(0))


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    oq, nq = old["queries"], new["queries"]

    # two totals, two names (see Bench.scala): total_with_drives_sec is the
    # stdout `value` (queries + drive:* + streaming); the per-sweep
    # query-only sums live in query_only_run_totals_sec (run_totals in
    # pre-r15 captures). Read both names so old/new captures compare.
    def with_drives(d):
        return d.get("total_with_drives_sec", d["value"])

    def query_only(d):
        return d.get("query_only_run_totals_sec", d.get("run_totals"))

    print(f"total_with_drives: {with_drives(old):.1f}s -> "
          f"{with_drives(new):.1f}s  "
          f"(n: {old.get('n_queries')} -> {new.get('n_queries')})")
    if query_only(old) and query_only(new):
        print(f"query_only_sweeps: {query_only(old)} -> {query_only(new)}")
    headline = [s for s, d, q in (("old", old, oq), ("new", new, nq))
                if d.get("n_queries") and len(q) < d["n_queries"]]
    if headline:
        print(f"NOTE: {'/'.join(headline)} profile is headline-only "
              f"(top-20 of n_queries) — comparing the overlap, not the full set")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added and not headline:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed and not headline:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    moves = []
    for k in set(oq) & set(nq):
        a, b = oq[k], nq[k]
        if max(a, b) >= floor and (b > a * ratio or a > b * ratio):
            moves.append((b - a, k, a, b))
    for d, k, a, b in sorted(moves, reverse=True):
        tag = "SLOWER" if d > 0 else "faster"
        print(f"  {tag} {k}: {a:.2f}s -> {b:.2f}s ({b - a:+.2f})")
    if not moves:
        print("no per-query move beyond the noise gate "
              f"(ratio {ratio}x AND {floor}s floor)")
    # Streaming regression gate: MIN-of-runs ev/s round-over-round. The
    # committed headline is max-of-runs (contention is one-sided), but a
    # real throughput regression drags the MIN down too — a >1.5x min drop
    # exits 2 so the gate can be scripted. Max is reported alongside for
    # context.
    so, sn = old.get("streaming") or {}, new.get("streaming") or {}
    o_rates = [r for r in so.get("runs_per_sec", []) if r > 0]
    n_rates = [r for r in sn.get("runs_per_sec", []) if r > 0]
    if o_rates and n_rates:
        o_min, n_min = min(o_rates), min(n_rates)
        print(f"streaming ev/s: min {o_min} -> {n_min}, "
              f"max {max(o_rates)} -> {max(n_rates)}")
        if n_min * 1.5 < o_min:
            print(f"STREAMING REGRESSION: min ev/s fell >1.5x "
                  f"({o_min} -> {n_min})")
            sys.exit(2)


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        pass
