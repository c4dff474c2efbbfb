#!/usr/bin/env python3
"""One-shot sweep: rewrite bare SQL `round(EXPR, 6)` in oracle strings to
the rndSql scale-18 expansion (Spark-round twin). Conservative filters:
 - balanced-paren argument must end with `, 6` and not contain Scala
   markers (col(, lit(, =>, double quotes) — those are engine-side;
 - skip args already of rndSql shape (start with CAST(CAST().
Usage: sweep_round.py [--apply] file...
"""
import sys, re

APPLY = '--apply' in sys.argv
FILES = [a for a in sys.argv[1:] if not a.startswith('--')]

def expand(expr):
    return (f"CAST(round(CAST(CAST({expr} AS VARCHAR) AS DECIMAL(38,18)), 6)"
            f" AS DOUBLE)")

for path in FILES:
    src = open(path).read()
    out = []
    i = 0
    n_hits = 0
    while True:
        j = src.find('round(', i)
        if j < 0:
            out.append(src[i:])
            break
        # char before must not be identifier-ish
        if j > 0 and (src[j-1].isalnum() or src[j-1] in '_.'):
            out.append(src[i:j+6]); i = j+6; continue
        # lambda context just before? engine-side Scala
        if '=>' in src[max(0, j-24):j]:
            out.append(src[i:j+6]); i = j+6; continue
        # balanced scan of the argument list
        depth = 1
        k = j + 6
        while k < len(src) and depth > 0:
            if src[k] == '(':
                depth += 1
            elif src[k] == ')':
                depth -= 1
            k += 1
        arg = src[j+6:k-1]
        ok = (arg.rstrip().endswith(', 6')
              and 'col(' not in arg and 'lit(' not in arg
              and '=>' not in arg and '"' not in arg
              and not arg.startswith('CAST(CAST('))
        if not ok:
            out.append(src[i:j+6]); i = j+6; continue
        expr = arg.rstrip()[:-3].rstrip().rstrip(',')
        n_hits += 1
        ctx = src[max(0, j-40):j].replace('\n', ' ')
        print(f"{path}: ...{ctx} ROUND6[{expr[:90]}]")
        out.append(src[i:j])
        out.append(expand(expr))
        i = k
    if APPLY and n_hits:
        open(path, 'w').write(''.join(out))
        print(f"-> {path}: {n_hits} rewritten")
    elif n_hits:
        print(f"-> {path}: {n_hits} candidates (dry run)")
