#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares row count, schema (column names), and values (sorted columns, row
order as returned).
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted([os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
                    if os.path.isdir(p)])
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(spark_df)} rows")
            continue
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}"); n_fail += 1; continue
        ok = True; msgs = []
        if sorted(spark_df.columns) != sorted(ora_df.columns):
            ok = False; msgs.append(f"cols spark={sorted(spark_df.columns)} oracle={sorted(ora_df.columns)}")
        if len(spark_df) != len(ora_df):
            ok = False; msgs.append(f"rows spark={len(spark_df)} oracle={len(ora_df)}")
        if ok:
            s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
            o = ora_df[sorted(ora_df.columns)].reset_index(drop=True)
            for c in s.columns:
                sv, ov = s[c], o[c].astype(s[c].dtype, errors="ignore") if hasattr(o[c], "astype") else o[c]
                try:
                    eq = (sv.fillna("__N__") == ov.fillna("__N__")) if sv.dtype == object else (sv == ov) | (sv.isna() & ov.isna())
                except Exception:
                    eq = sv.astype(str) == ov.astype(str)
                if not eq.all():
                    bad = (~eq).idxmax()
                    ok = False
                    msgs.append(f"col {c} first-mismatch row {bad}: spark={sv[bad]!r} oracle={ov[bad]!r} ({int((~eq).sum())} diffs)")
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs)); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
