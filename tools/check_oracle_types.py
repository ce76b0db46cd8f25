#!/usr/bin/env python3
"""Oracle result-TYPE meta-check (VERDICT r7 item #2).

The driver's correctness compare normalizes values for the rows/schema
checks but its HASH is type-sensitive: DuckDB widens `sum(BIGINT)` (agg
and window) to HUGEINT while Spark stays BIGINT, so a value-identical
result can still hash-mismatch (the r7 `q_window_range` failure). This
tool turns that failure class into a pre-flight check:

  for each oracle SQL:  DESCRIBE <sql>      -> DuckDB column types
  for each spark dump:  DESCRIBE read_parquet(...) -> Spark-as-parquet types
  assert the type map matches (exactly, modulo documented equivalences)

Usage: python3 tools/check_oracle_types.py <sfDir> <verifyOutDir>
Exit 1 on any mismatch. Run after graft.Verify, before shipping a round.
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DuckDB type spellings that denote the SAME wire type for the driver's
# hasher (it renders values, so only width/precision divergence matters).
EQUIV = [
    {"BIGINT", "INT64"},
    {"INTEGER", "INT32", "INT"},
    {"DOUBLE", "FLOAT64"},
    {"VARCHAR", "STRING", "TEXT"},
    {"BLOB", "BYTEA"},
]

def canon(t: str) -> str:
    t = t.upper()
    for group in EQUIV:
        if t in group:
            return sorted(group)[0]
    return t

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"SKIP {name}: no spark output")
            n_skip += 1
            continue
        try:
            ora = {r[0]: canon(r[1]) for r in
                   con.execute(f"DESCRIBE {oracle[name]}").fetchall()}
        except Exception as e:
            print(f"FAIL {name}: oracle DESCRIBE error: {str(e)[:200]}")
            n_fail += 1
            continue
        spk = {r[0]: canon(r[1]) for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
        bad = []
        if set(ora) != set(spk):
            bad.append(f"columns spark={sorted(spk)} oracle={sorted(ora)}")
        else:
            for c in sorted(ora):
                if ora[c] != spk[c]:
                    bad.append(f"{c}: spark={spk[c]} oracle={ora[c]}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            n_pass += 1
    print(f"\ntypes: {n_pass} pass, {n_fail} fail, {n_skip} skipped")
    return 1 if n_fail else 0

def selftest():
    """The checker must go red on the exact failure class it exists for:
    an uncast DuckDB sum(BIGINT) widens to HUGEINT while the Spark side
    stays BIGINT. No fixture files needed — compare DESCRIBE types the
    same way main() does."""
    con = duckdb.connect()
    uncast = {r[0]: canon(r[1]) for r in con.execute(
        "DESCRIBE SELECT sum(x) AS s FROM (SELECT 1::BIGINT AS x)").fetchall()}
    cast = {r[0]: canon(r[1]) for r in con.execute(
        "DESCRIBE SELECT sum(x)::BIGINT AS s FROM (SELECT 1::BIGINT AS x)").fetchall()}
    spark_side = {"s": "BIGINT"}
    assert uncast != spark_side, f"selftest broken: uncast sum looked fine ({uncast})"
    assert cast == spark_side, f"selftest broken: cast sum mismatched ({cast})"
    # window sums widen identically
    wuncast = {r[0]: canon(r[1]) for r in con.execute(
        "DESCRIBE SELECT sum(x) OVER () AS s FROM (SELECT 1::BIGINT AS x)").fetchall()}
    assert wuncast != spark_side, "selftest broken: uncast window sum looked fine"
    print("selftest: uncast sum(BIGINT) goes red (HUGEINT), cast goes green — OK")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
