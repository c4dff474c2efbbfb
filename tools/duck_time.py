#!/usr/bin/env python3
"""Time every DuckDB oracle, single connection, for the engine-vs-DuckDB
ratio (the denominator of recompute_ratio.py).

Usage: python3 tools/duck_time.py <sfDir> <verifyOutDir> [outJson] [passes]

Reads <verifyOutDir>/oracle_sql.json (a graft.Verify dump — run Verify
first so the oracle map matches the registry at HEAD), creates views
over <sfDir>'s parquet tables plus the live fixtures Verify leaves in
the dump dir, executes each oracle and records wall seconds.
Writes {"total_oracle_sec": T, "protocol": "...", "queries": {...}} to
outJson (default tools/duck_times_rN.json must be named explicitly).

Round-15 (verdict-14 Missing-2): each oracle runs `passes` times
(default 2) in the SAME sweep and the MIN is kept — the symmetric
protocol to the engine side's per-query min-of-passes, so the
cross-round ratio stops carrying single-sample oracle-host noise
(between the two r14 same-code sweeps one CTE swung -37%% and the
headline ratio 0.72x<->0.89x). The protocol field names the pass
count; per-pass raw times are kept in "pass_times" so a single-pass
sweep stays recomputable from the artifact.
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
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    oracles = json.load(open(os.path.join(vout, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times, raw, total = {}, {}, 0.0
    for name in sorted(oracles):
        sql = oracles[name]
        attempts = []
        for _ in range(passes):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                attempts.append(time.time() - t0)
            except Exception as e:  # noqa: BLE001 - record, don't die mid-sweep
                print(f"[duck] {name} FAILED: {str(e)[:100]}",
                      file=sys.stderr)
                attempts.append(-1.0)
                break  # a failing oracle won't pass on retry; move on
        ok = [a for a in attempts if a >= 0]
        sec = min(ok) if ok else -1.0
        times[name] = round(sec, 4)
        raw[name] = [round(a, 4) for a in attempts]
        if sec > 0:
            total += sec
        print(f"[duck] {name:34s} {sec:8.3f} s  "
              f"(passes: {' '.join(f'{a:.3f}' for a in attempts)})",
              flush=True)
    out = {"total_oracle_sec": round(total, 2),
           "protocol": (f"per-query min over {passes} back-to-back runs, "
                        f"one connection, views over {sf_dir}"),
           "pass_times": raw,
           "queries": times}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print(f"[duck] wrote {len(times)} timings, total {total:.1f} s -> {out_path}")


if __name__ == "__main__":
    main()
