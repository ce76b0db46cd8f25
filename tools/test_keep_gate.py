#!/usr/bin/env python3
"""Self-test for the bench keep gate's floors handling (run from repo root:
`python3 tools/test_keep_gate.py`). Exercises the three floors-trust paths
without a 5-minute sbt probe (BENCH_KEEP_PROBE_CMD stubs the fresh-JVM
probe):

  1. STALE floors (fingerprint mismatch vs the battery's sf dir) must be
     REFUSED — a suspect row stays listed (exit 1) even though the stubbed
     probe would clear it;
  2. UNSTAMPED floors (no _fingerprint) are equally refused — fail closed;
  3. MATCHING floors + an under-floor probe clear the suspect (exit 0) and
     the probe value replaces the row.

Why this exists: the r12 mid-round testdata regeneration showed that
floors measured on other data silently mislead the gate; the fingerprint
stamp turns that into a loud refusal, and this script is the standing
proof the refusal works.
"""
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_diff import fingerprint  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_gate(tmp, floors, sf_dir, expect_exit, label, expect_cleared,
             art_extra=None):
    full = os.path.join(tmp, f"full_{label}.json")
    kept = os.path.join(tmp, f"kept_{label}.json")
    floors_path = os.path.join(tmp, f"floors_{label}.json")
    with open(floors_path, "w") as f:
        json.dump(floors, f)
    # one suspect at 2.0s vs floor 0.4/typical 0.5; probe stub says 0.41s
    art = {"metric": "total", "value": 2.0, "canary": [0.4, 0.42],
           "queries": {"q_join_semi": 2.0}, "failed": [],
           "floor_suspect": ["q_join_semi"], "sf": sf_dir}
    art.update(art_extra or {})
    with open(full, "w") as f:
        json.dump(art, f)
    probe = os.path.join(tmp, "probe.sh")
    with open(probe, "w") as f:
        f.write('#!/bin/sh\necho "TARGET $1 0.41 s"\n')
    os.chmod(probe, 0o755)
    env = dict(os.environ, SPARK_GRAFT_FLOORS_FILE=floors_path,
               BENCH_KEEP_PROBE_CMD=f"/bin/sh {probe}")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_keep.py"),
         full, kept, f"--sf-dir={sf_dir}"],
        capture_output=True, text=True, env=env, cwd=REPO)
    if expect_exit == 2:  # whole-run rejection: no kept file is written
        ok = r.returncode == 2 and not os.path.exists(kept)
        cleared = None
    else:
        out = json.load(open(kept))
        cleared = out["floor_suspect"] == []
        ok = r.returncode == expect_exit and cleared == expect_cleared
    status = "PASS" if ok else "FAIL"
    print(f"{status} {label}: exit={r.returncode} (want {expect_exit}) "
          f"cleared={cleared} (want {expect_cleared})")
    if not ok:
        print(r.stdout)
        print(r.stderr)
    return ok


def main():
    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp, "sfX")
        os.makedirs(sf)
        with open(os.path.join(sf, "t.parquet"), "wb") as f:
            f.write(b"data-v1")
        good = fingerprint(sf)
        base = {"q_join_semi": [0.4, 0.5]}
        ok = True
        # 1. stale: stamp from different data content
        ok &= run_gate(tmp, dict(base, _fingerprint={
            "dir": sf, "md5": "0" * 32}), sf, 1, "stale_refused", False)
        # 2. unstamped: legacy floors without a fingerprint
        ok &= run_gate(tmp, dict(base), sf, 1, "unstamped_refused", False)
        # 3. matching stamp: probe (0.41s < 3x floor) clears the suspect
        ok &= run_gate(tmp, dict(base, _fingerprint={
            "dir": sf, "md5": good}), sf, 0, "matching_cleared", True)
        # 4. write canary pre/post >1.8x rejects the run even when every
        #    other gate (incl. the CPU canary) is green — the r19
        #    decaying-disk window
        ok &= run_gate(tmp, dict(base, _fingerprint={
            "dir": sf, "md5": good}), sf, 2, "susw_rejected", None,
            art_extra={"susw": [2.4, 1.2]})
        # 4b. susw in the 1.5-1.8x band is KEPT: clean-window write readings
        #     spread up to ~1.4x, so the susw threshold is calibrated wider
        #     than the CPU canary's 1.5x (r20 ADVICE)
        ok &= run_gate(tmp, dict(base, _fingerprint={
            "dir": sf, "md5": good}), sf, 0, "susw_band_kept", True,
            art_extra={"susw": [2.0, 1.2]})
        # 5. pre-r19 artifact without a susw key is NOT rejected for it
        ok &= run_gate(tmp, dict(base, _fingerprint={
            "dir": sf, "md5": good}), sf, 0, "no_susw_ok", True,
            art_extra={"sus": [1.3, 1.35]})
    print("keep-gate self-test:", "ALL PASS" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
