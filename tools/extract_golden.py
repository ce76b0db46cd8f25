#!/usr/bin/env python3
"""Extract the reference's recorded artifact (etl_data.db) into JSON test
resources for the golden-replay suite (SURVEY §5.2).

The reference ships no tests; its only correctness artifact is the SQLite
file holding two real ingestion runs (2,492 TXT records at schema v1, 100
customer-CSV records at schema v2, two schema_history rows, one
schema_changes row). This script dumps those rows verbatim so the Scala
suite can replay the batches through Pipeline.ingest and byte-compare
(driver-side python is the sanctioned place for sqlite access — the engine
itself has no SQLite dependency).

Usage: python3 tools/extract_golden.py [db_path] [out_dir]
"""
import json
import sqlite3
import sys
import os

db = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/etl_data.db"
out = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/golden"
os.makedirs(out, exist_ok=True)

con = sqlite3.connect(f"file:{db}?mode=ro", uri=True)
cur = con.cursor()

hist = [{"version": v, "schema": s, "created_at": c}
        for v, s, c in cur.execute(
            "SELECT version, schema, created_at FROM schema_history ORDER BY version")]
with open(f"{out}/schema_history.json", "w") as f:
    json.dump(hist, f, indent=1)

changes = [{"id": i, "old_version": o, "new_version": n,
            "added_fields": a, "removed_fields": r, "created_at": c}
           for i, o, n, a, r, c in cur.execute(
               "SELECT id, old_version, new_version, added_fields, removed_fields, created_at "
               "FROM schema_changes ORDER BY id")]
with open(f"{out}/schema_changes.json", "w") as f:
    json.dump(changes, f, indent=1)

for ver in (1, 2):
    with open(f"{out}/records_v{ver}.jsonl", "w") as f:
        for (data,) in cur.execute(
                "SELECT data FROM records WHERE schema_version=? ORDER BY id", (ver,)):
            f.write(json.dumps({"data": data}))
            f.write("\n")

print("wrote", out, ":", len(hist), "schemas,", len(changes), "changes,",
      sum(1 for _ in open(f"{out}/records_v1.jsonl")), "v1 records,",
      sum(1 for _ in open(f"{out}/records_v2.jsonl")), "v2 records")
