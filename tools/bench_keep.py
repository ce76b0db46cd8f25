#!/usr/bin/env python3
"""Keep-time gate for bench artifacts (the r11 contamination lesson).

    bench_keep.py FULL.json KEPT.json [--sf-dir=DIR] [--cpus=N]

Validates a `graft_bench_full.json` before it becomes the round's kept
artifact, and closes the one gap per-row retry + spread flags cannot:
a SUSTAINED mid-battery slow window that inflates medians with TIGHT
spreads (r11 kept q_join_semi at 4.6 s vs a 0.49 s fresh-JVM floor).

Checks, in order:
  1. canary pre/post must agree within 1.5x (else the whole RUN is
     contaminated — exit 2, don't keep); the sustained-write canary
     ("susw", r19+) gates identically — a decaying-disk window inflates
     write/shuffle rows while every CPU canary stays flat;
  2. `failed` must be empty (exit 3);
  2b. the floors file's `_fingerprint` stamp must match the battery's
     sf dir content (stamped by tools/bench_floors.py --sf-dir); a
     missing or mismatched stamp means the floors were measured on
     DIFFERENT data — they are refused (fail closed, suspects stay);
  3. for every `floor_suspect` row (Bench's own cross-run floor check,
     already re-probed once in-process), run a FRESH-JVM probe via
     `graft.tools.BenchOne` and take the min of artifact median and
     probe — the probe result replaces the row value and is recorded
     under `floor_probes`; a row STILL >3x floor after the fresh-JVM
     probe stays listed in `floor_suspect` (root-cause it or discard
     the run), otherwise it is cleared.

Writes KEPT.json (the full artifact + `floor_probes` + the updated
`floor_suspect`) and exits 0 if clean, 1 if suspects survive.
"""
import json
import subprocess
import sys


def fresh_jvm_probe(query, sf_dir, cpus):
    """One fresh-JVM timing of `query` via graft.tools.BenchOne.
    BENCH_KEEP_PROBE_CMD overrides the command (self-test hook — lets
    tools/test_keep_gate.py exercise the gate without a 5-minute sbt run).
    """
    import os
    override = os.environ.get("BENCH_KEEP_PROBE_CMD")
    cmd = (override.split() + [query]) if override else \
        ["sbt", "-batch", f"runMain graft.tools.BenchOne {query}"]
    env = dict(__import__("os").environ,
               SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=900).stdout
    except (subprocess.TimeoutExpired, OSError) as e:
        print(f"probe subprocess failed for {query}: {e}")
        return None
    for line in out.splitlines():
        # "[benchone] TARGET q_x 0.52 s" (sbt prefixes "[info] ")
        if "TARGET" in line and query in line:
            return float(line.split()[-2])
    return None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), True)
                for a in sys.argv[1:] if a.startswith("--"))
    if len(args) != 2:
        print(__doc__)
        return 1
    full_path, kept_path = args
    sf_dir = opts.get("sf-dir", "/root/testdata/sf0.1")
    cpus = opts.get("cpus", "32")
    if not isinstance(sf_dir, str) or not isinstance(cpus, str):
        print(__doc__)
        return 1
    art = json.loads(open(full_path).read().strip())

    can = art.get("canary", [])
    if can and max(can) / max(min(can), 1e-9) > 1.5:
        print(f"REJECT: canary pre/post disagree >1.5x: {can} — "
              "machine load changed mid-run; re-run the battery")
        return 2
    # The sustained-write canary gates the same way (r19: a decaying-disk
    # window inflated write/shuffle rows 1.6x while BOTH CPU canaries
    # stayed flat and the run passed this gate). Absent in pre-r19
    # artifacts — skipped for those.
    # Write variance is inherently higher than CPU variance: clean-window
    # kept artifacts already read susw pre/post ratios up to ~1.4x (e.g.
    # [1.83, 2.53]), so inheriting the CPU canary's 1.5x left <10% margin
    # before false rejects. 1.8x keeps headroom over the clean band while
    # still catching the r19 contamination class (observed degraded-window
    # ratios were ~2x+ on the write rows themselves).
    susw = art.get("susw", [])
    if susw and max(susw) / max(min(susw), 1e-9) > 1.8:
        print(f"REJECT: write canary pre/post disagree >1.8x: {susw} — "
              "disk throughput changed mid-run; re-run the battery")
        return 2
    if art.get("failed"):
        print(f"REJECT: failed queries present: {art['failed']}")
        return 3

    suspects = art.get("floor_suspect", [])
    # Same resolution order as Bench (Bench.resolveFloorsPath): an explicit
    # SPARK_GRAFT_FLOORS_FILE wins; else the sf-dir BASENAME maps to its
    # checked-in per-sf floors file. The old default was BENCH_FLOORS.json
    # unconditionally, so an sf1/sf3 keep without the env var probed its
    # suspects against the sf0.1 floors and then refused them as stale
    # (r21 — the gate failed closed, but for the wrong reason). Fail
    # CLOSED either way: if there are suspects but the floors can't be
    # read, a successful probe must not clear them (floors={} would make
    # the >3x-floor re-check vacuously pass and launder exactly the
    # contamination this gate exists to block).
    per_sf = {"sf0.1": "BENCH_FLOORS.json", "sf1": "BENCH_FLOORS_SF1.json",
              "sf3": "BENCH_FLOORS_SF3.json", "sf10": "BENCH_FLOORS_SF10.json"}
    import os
    floors_path = os.environ.get(
        "SPARK_GRAFT_FLOORS_FILE",
        per_sf.get(os.path.basename(sf_dir.rstrip("/")), "BENCH_FLOORS.json"))
    try:
        floors = json.load(open(floors_path))
    except (OSError, ValueError) as e:
        floors = None
        if suspects:
            print(f"WARNING: floors file {floors_path} unreadable ({e}) — "
                  "suspects cannot be cleared, they stay listed")
    # Data binding (the r12 stale-floors lesson): floors are evidence about
    # the EXACT data they were measured on. A floors file whose content
    # fingerprint is missing or does not match this battery's sf dir is
    # treated exactly like an unreadable one — fail CLOSED, suspects stay.
    if floors is not None:
        from bench_diff import fingerprint
        stamp = floors.get("_fingerprint")
        actual = fingerprint(sf_dir)
        if not stamp:
            floors = None
            if suspects:
                print(f"WARNING: floors file {floors_path} carries no "
                      "_fingerprint stamp — re-stamp it with "
                      "tools/bench_floors.py --sf-dir; suspects stay listed")
        elif stamp.get("md5") != actual:
            floors = None
            if suspects:
                print(f"REFUSING stale floors: {floors_path} was built for "
                      f"{stamp.get('dir')} (md5 {stamp.get('md5')}) but "
                      f"{sf_dir} hashes to {actual} — the data changed; "
                      "rebuild the floors. Suspects stay listed")
    probes, still = {}, []
    for q in suspects:
        p = fresh_jvm_probe(q, sf_dir, cpus)
        print(f"fresh-JVM probe {q}: {p if p is not None else 'FAILED'} s "
              f"(artifact {art['queries'].get(q):.2f} s)")
        if p is None:
            still.append(q)
            continue
        probes[q] = p
        old = art["queries"].get(q, p)
        if p < old:
            art["queries"][q] = p  # contamination only inflates: min wins
        f = floors.get(q) if floors is not None else None
        v = art["queries"][q]
        # same rule as Bench.overFloor: >3x floor AND >0.3s over AND >1.5x typical
        # No floor entry to re-check against (missing file OR a suspect with
        # no historical floor) → stays listed: a suspect is only cleared by
        # EVIDENCE that it is back under its floor.
        if f is None or (v > 3 * f[0] and v - f[0] > 0.3 and v > 1.5 * f[1]):
            still.append(q)  # survives a fresh JVM: real regression signal
    if probes:
        art["floor_probes"] = probes
        art["value"] = sum(art["queries"].values())
    art["floor_suspect"] = still

    with open(kept_path, "w") as f:
        json.dump(art, f, separators=(",", ":"))
        f.write("\n")
    if still:
        print(f"KEPT with surviving floor suspects (root-cause these): {still}")
        return 1
    print(f"KEPT clean: {kept_path} total={art['value']:.1f}s "
          f"noisy={art.get('noisy', [])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
