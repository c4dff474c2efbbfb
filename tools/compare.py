#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For every query dir under verifyOutDir: read the Spark parquet result, run
the DuckDB oracle SQL from oracle_sql.json against views over sfDir's
tables, sort columns by name and rows by all columns, and compare values
exactly. Prints one line per query plus a summary.
"""
import sys, os, json, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows by the stringified tuple
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple('\0N' if v is None else (repr(v) if not isinstance(v, float)
                     else f"{v:.10g}") for v in t)
    return sorted(out, key=key), [cols[i] for i in order]

def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # decimal vs float etc.
    try:
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return float(a) == float(b)
    except Exception:
        pass
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional: --times PATH records per-query DuckDB oracle seconds (the
    # baseline side of the engine-vs-DuckDB aggregate in SCALING.md)
    times_path = None
    if '--times' in sys.argv:
        times_path = sys.argv[sys.argv.index('--times') + 1]
    times = {}
    con = duckdb.connect()
    for f in os.listdir(sf_dir):
        if f.endswith('.parquet'):
            name = f[:-8]
            # driver tables are single files; Spark-written tables (e.g. the
            # ScaleCheck sfx10 set) are directories of part files
            path = os.path.join(sf_dir, f)
            src = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    results = {}
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
        except Exception as e:
            results[q] = f'SPARK_READ_ERR {e}'
            continue
        if q not in oracle:
            results[q] = f'ROWS_ONLY rows={len(sp_rows)}'
            continue
        try:
            import time
            t0 = time.monotonic()
            du = con.execute(oracle[q])
            du_cols = [d[0] for d in du.description]
            du_rows = du.fetchall()
            times[q] = round(time.monotonic() - t0, 3)
        except Exception as e:
            results[q] = f'ORACLE_ERR {str(e)[:200]}'
            continue
        if sorted(sp_cols) != sorted(du_cols):
            results[q] = f'SCHEMA_MISMATCH spark={sorted(sp_cols)} duck={sorted(du_cols)}'
            continue
        if len(sp_rows) != len(du_rows):
            results[q] = f'ROWCOUNT_MISMATCH spark={len(sp_rows)} duck={len(du_rows)}'
            continue
        a, cols = canon(sp_rows, sp_cols)
        b, _ = canon(du_rows, du_cols)
        bad = None
        for i, (ra, rb) in enumerate(zip(a, b)):
            if not all(eq(x, y) for x, y in zip(ra, rb)):
                bad = (i, ra, rb)
                break
        if bad:
            results[q] = f'VALUE_MISMATCH at sorted-row {bad[0]} cols={cols}\n  spark={bad[1]}\n  duck ={bad[2]}'
        else:
            results[q] = f'OK rows={len(sp_rows)}'
    n_ok = sum(1 for v in results.values() if v.startswith('OK'))
    n_ro = sum(1 for v in results.values() if v.startswith('ROWS_ONLY'))
    for q, v in sorted(results.items()):
        flag = 'PASS' if v.startswith('OK') else ('INFO' if v.startswith('ROWS_ONLY') else 'FAIL')
        print(f'[{flag}] {q}: {v}')
    print(f'\n{n_ok} OK, {n_ro} rows-only, {len(results)-n_ok-n_ro} failing, of {len(results)}')
    if times_path:
        with open(times_path, 'w') as fh:
            json.dump({'total_oracle_sec': round(sum(times.values()), 1),
                       'queries': times}, fh, indent=1)
        print(f'oracle timings -> {times_path} '
              f'(total {sum(times.values()):.1f} s over {len(times)} oracles)')

if __name__ == '__main__':
    main()
