#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate — GATE-FAITHFUL.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--times PATH]

For every query dir under verifyOutDir: read the Spark parquet result
(pandas/pyarrow — the driver's read path), run the DuckDB oracle SQL from
oracle_sql.json against views over sfDir's tables (fetched as a pandas
frame, the driver's oracle path), then compare the way the driver does:

  1. columns sorted by name; schema = sorted column-name equality;
  2. rows sorted with pandas `sort_values` over ALL columns — an
     array-typed cell raises TypeError here exactly like the driver's
     gate (recorded as SORT_ERR / a failure, never silently tolerated);
  3. values compared by per-cell REPR (dtype-sensitive: int64 500 vs
     float64 500.0 is a MISMATCH, mirroring the driver's hash), floats
     compared bitwise-or-both-NaN only when both sides are floats.

Round-8 lesson: the old mirror sorted by stringified tuples and coerced
int/float, so it passed array outputs and width drift the driver gate
failed. This version is strictly at-least-as-strict: mirror-green must
imply gate-green.
"""
import sys, os, json, math
import duckdb
import pandas as pd
import numpy as np


def cell_key(v):
    """Driver-equivalent canonical repr of one cell (dtype-sensitive).
    All missing-value flavors (None / NaN / NaT / pd.NA) canonicalize to
    one NULL token: the driver gate passes a Spark NULL against a DuckDB
    NaN in object columns (q_profile_drift, green in r08), and in float64
    columns pandas erases the distinction anyway."""
    if v is None:
        return '\0NULL'
    if isinstance(v, float):
        if math.isnan(v):
            return '\0NULL'
        return repr(v)
    if isinstance(v, np.floating):
        x = float(v)
        return '\0NULL' if math.isnan(x) else repr(x)
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, np.bool_):
        return repr(bool(v))
    if isinstance(v, (np.ndarray, list, tuple)):
        # arrays are un-sortable at the gate; if we ever get here the
        # sort already failed, but keep a deterministic repr anyway
        return 'ARR[' + ','.join(cell_key(x) for x in v) + ']'
    try:
        if pd.isna(v):
            return '\0NULL'
    except (TypeError, ValueError):
        pass
    return type(v).__name__ + ':' + repr(v)


def canon_df(df):
    """Sort columns by name, then rows pandas-style over all columns.
    Raises (like the driver) on unsortable cell types."""
    cols = sorted(df.columns)
    out = df[cols]
    if len(cols) and len(out):
        out = out.sort_values(by=cols, kind='mergesort')
    return out.reset_index(drop=True), cols


def frame_mismatch(a, b):
    """First differing (row, col, spark_repr, duck_repr) or None."""
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            kx, ky = cell_key(x), cell_key(y)
            if kx != ky:
                return (i, c, kx, ky)
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    times_path = None
    if '--times' in sys.argv:
        times_path = sys.argv[sys.argv.index('--times') + 1]
    times = {}
    con = duckdb.connect()
    for f in os.listdir(sf_dir):
        if f.endswith('.parquet'):
            name = f[:-8]
            # driver tables are single files; Spark-written tables (e.g.
            # the ScaleCheck sfx10 set) are directories of part files
            path = os.path.join(sf_dir, f)
            src = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    results = {}
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        try:
            sp = pd.read_parquet(qdir)
        except Exception as e:
            results[q] = f'SPARK_READ_ERR {str(e)[:200]}'
            continue
        if q not in oracle:
            results[q] = f'ROWS_ONLY rows={len(sp)}'
            continue
        try:
            import time
            t0 = time.monotonic()
            du = con.execute(oracle[q]).df()
            times[q] = round(time.monotonic() - t0, 3)
        except Exception as e:
            results[q] = f'ORACLE_ERR {str(e)[:200]}'
            continue
        if sorted(sp.columns) != sorted(du.columns):
            results[q] = (f'SCHEMA_MISMATCH spark={sorted(sp.columns)} '
                          f'duck={sorted(du.columns)}')
            continue
        if len(sp) != len(du):
            results[q] = f'ROWCOUNT_MISMATCH spark={len(sp)} duck={len(du)}'
            continue
        try:
            a, cols = canon_df(sp)
        except Exception as e:
            results[q] = f'SORT_ERR spark-side {str(e)[:160]}'
            continue
        try:
            b, _ = canon_df(du)
        except Exception as e:
            results[q] = f'SORT_ERR oracle-side {str(e)[:160]}'
            continue
        bad = frame_mismatch(a, b)
        if bad:
            results[q] = (f'VALUE_MISMATCH row {bad[0]} col {bad[1]}:'
                          f' spark={bad[2]} duck={bad[3]}')
        else:
            # value-equal; surface dtype drift (e.g. int32 vs int64) as a
            # warning — same numeric kind passes the gate today, but the
            # drift is the seam class that bit q_dup_token_profile
            warn = [c for c in cols
                    if str(a[c].dtype) != str(b[c].dtype)]
            suffix = f' DTYPE_WARN {warn}' if warn else ''
            results[q] = f'OK rows={len(sp)}{suffix}'
    n_ok = sum(1 for v in results.values() if v.startswith('OK'))
    n_ro = sum(1 for v in results.values() if v.startswith('ROWS_ONLY'))
    for q, v in sorted(results.items()):
        flag = ('PASS' if v.startswith('OK')
                else ('INFO' if v.startswith('ROWS_ONLY') else 'FAIL'))
        print(f'[{flag}] {q}: {v}')
    print(f'\n{n_ok} OK, {n_ro} rows-only, '
          f'{len(results)-n_ok-n_ro} failing, of {len(results)}')
    if times_path:
        with open(times_path, 'w') as fh:
            json.dump({'total_oracle_sec': round(sum(times.values()), 1),
                       'queries': times}, fh, indent=1)
        print(f'oracle timings -> {times_path} '
              f'(total {sum(times.values()):.1f} s over {len(times)} oracles)')


if __name__ == '__main__':
    main()
