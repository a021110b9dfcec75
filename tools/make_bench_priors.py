#!/usr/bin/env python3
"""Generate bench_priors.json: per-query calib-normalized prior seconds.

Merges the best (minimum) wall/calib per query across recent official
records (BENCH_r*.json tails carry the compact line; bench_full.json the
full one). Bench.scala reads this file at launch and re-pins any row
whose best-of-3 normalized time exceeds 2x its prior — the defense
against mid-sweep host-noise spikes poisoning the permanent record
(r15 verdict ask #1: six diff-clean rows recorded 3-5.6x slow on a
settling box).

Usage: python3 tools/make_bench_priors.py  (run from repo root)
"""
import json
import re
import sys

def parse_tail_line(path):
    """Extract the LAST JSON metrics line from a driver bench record."""
    try:
        d = json.load(open(path))
    except Exception:
        return None
    tail = d.get("tail") or ""
    best = None
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if not line.startswith('{"metric":"total_headline"'):
            continue
        try:
            best = json.loads(line)
        except Exception:
            pass
    return best

def full_line(path):
    try:
        return json.load(open(path))
    except Exception:
        return None

def main():
    # full names come from the current headline set (bench_full.json)
    sources = []
    full = full_line("bench_full.json")
    if full:
        sources.append(("bench_full.json", full))
    for r in ("BENCH_r14.json", "BENCH_r15.json"):
        p = parse_tail_line(r)
        if p:
            sources.append((r, p))
    if not full:
        sys.exit("need bench_full.json for the short->full name map")

    short2full = {}
    for name in full["queries"]:
        short2full[name.split("_")[0]] = name
        # r16+: compact keys drop the 'q' prefix to stay inside the
        # driver's 2000-byte tail window
        short2full[name.split("_")[0].lstrip("q")] = name

    priors = {}
    for src, rec in sources:
        calib = rec.get("cpu_calib_sec")
        if not calib or calib <= 0:
            continue
        for k, v in rec.get("queries", {}).items():
            if v is None or v <= 0:
                continue
            name = short2full.get(k.split("_")[0], k)
            norm = v / calib
            if name not in priors or norm < priors[name]:
                priors[name] = norm

    out = {k: round(v, 3) for k, v in sorted(priors.items())}
    json.dump(out, open("bench_priors.json", "w"), indent=0)
    print(f"wrote bench_priors.json with {len(out)} priors "
          f"from {[s for s, _ in sources]}")

if __name__ == "__main__":
    main()
