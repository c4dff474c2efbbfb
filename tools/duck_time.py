#!/usr/bin/env python3
"""Time every DuckDB oracle once, single connection, for the
engine-vs-DuckDB ratio (the denominator of recompute_ratio.py).

Usage: python3 tools/duck_time.py <sfDir> <verifyOutDir> [outJson]

Reads <verifyOutDir>/oracle_sql.json (a graft.Verify dump — run Verify
first so the oracle map matches the registry at HEAD), creates views
over <sfDir>'s parquet tables plus the live fixtures Verify leaves in
the dump dir, executes each oracle once and records wall seconds.
Writes {"total_oracle_sec": T, "protocol": "...", "queries": {...}} to
outJson (default tools/duck_times_rN.json must be named explicitly).

One pass, no warmup: this mirrors how the r10/r11 sweeps were taken, so
cross-round DuckDB numbers stay comparable. A failing oracle records -1
(it would have failed the correctness gate first, so this is belt and
braces, not an expected path).
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, vout = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "tools/duck_times.json"
    oracles = json.load(open(os.path.join(vout, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times, total = {}, 0.0
    for name in sorted(oracles):
        sql = oracles[name]
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            sec = time.time() - t0
        except Exception as e:  # noqa: BLE001 - record, don't die mid-sweep
            print(f"[duck] {name} FAILED: {str(e)[:100]}", file=sys.stderr)
            sec = -1.0
        times[name] = round(sec, 4)
        if sec > 0:
            total += sec
        print(f"[duck] {name:34s} {sec:8.3f} s", flush=True)
    out = {"total_oracle_sec": round(total, 2),
           "protocol": f"single pass, one connection, views over {sf_dir}",
           "queries": times}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print(f"[duck] wrote {len(times)} timings, total {total:.1f} s -> {out_path}")


if __name__ == "__main__":
    main()
