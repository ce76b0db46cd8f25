#!/usr/bin/env python3
"""Build BENCH_FLOORS.json: per-query historical floor medians.

    bench_floors.py OUT.json [--sf-dir=DIR] ARTIFACT [ARTIFACT ...]

Floor = MIN median per query across the given Bench artifacts (kept
full-precision files and/or driver tail captures — bench_diff.load
handles both). Machine contamination only ever INFLATES timings, so the
cross-round minimum is the best available estimate of a query's true
cost on this box; Bench reads the file at run time and re-probes any row
landing >3x its floor (see Bench.scala's floor-memory comment — the r11
join_semi/join_anti lesson: a sustained mid-battery slow window has
TIGHT spreads and is invisible to per-row noise flags, only cross-run
memory catches it).

Keys are canonicalized to the full "q_"-prefixed query names. Driver
tails are front-truncated (the first surviving pair may be clipped) and
compact-precision — both fine for a 3x threshold. Queries missing from
every artifact simply get no floor (no check).

`--sf-dir=DIR` stamps a content fingerprint of DIR into the output under
"_fingerprint"; tools/bench_keep.py refuses to APPLY floors whose stamp
does not match the battery's data dir (stale floors mislead — the r12
mid-round regeneration lesson). Bench.scala's own entry regex skips the
stamp, so the in-process guard keeps working either way.
"""
import json
import sys

from bench_diff import fingerprint, load


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1)
                for a in sys.argv[1:] if a.startswith("--") and "=" in a)
    if len(args) < 2:
        print(__doc__)
        return 1
    out, arts = args[0], args[1:]
    hist = {}
    fullnames = {}  # stripped -> full, learned from full-precision artifacts
    parsed = [load(a) for a in arts]
    for d in parsed:
        for k in d.get("queries", {}):
            # learn stripped->full only from genuinely full-precision keys
            # ("q_..." or the prefixless "q1_agg" style); a compact key that
            # happens to start with 'q' (a future "q_q..." query's tail form)
            # must not register itself as a full name
            if k.startswith("q_"):
                fullnames[k[2:]] = k
            elif k.startswith("q") and not k[1:2].isalpha():
                fullnames[k] = k  # "q1_agg": compact == full
    for d in parsed:
        for k, v in d.get("queries", {}).items():
            name = k if k in fullnames.values() \
                else fullnames.get(k, "q_" + k)
            v = float(v)
            if v <= 0:
                continue  # a failed/near-zero row is not a real floor
            hist.setdefault(name, []).append(v)
    # Each entry is [floor, typical]: floor = cross-round MIN, typical =
    # cross-round MEDIAN. Bench flags a row only when it is >3x floor AND
    # >1.5x typical — the second guard stops a single anomalously-LOW
    # historical reading (r10's q_kmeans_exact 0.4s vs its normal 2.2-2.6s)
    # from turning every later normal round into a standing false suspect.
    floors = {}
    for name, vs in hist.items():
        vs = sorted(vs)
        floors[name] = [round(vs[0], 3), round(vs[len(vs) // 2], 3)]
    doc = dict(sorted(floors.items()))
    note = ""
    if "sf-dir" in opts:
        doc["_fingerprint"] = {"dir": opts["sf-dir"],
                               "md5": fingerprint(opts["sf-dir"])}
        note = f" (fingerprinted to {opts['sf-dir']})"
    with open(out, "w") as f:
        json.dump(doc, f, separators=(",", ":"))
        f.write("\n")
    print(f"wrote {out}: {len(floors)} floors from {len(arts)} artifacts{note}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
