"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir and compares it with
``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value comparison (floats rounded). Prints one line
per query + a summary; exits non-zero on any mismatch.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pyrosm_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_rows(rows, cols):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(round(v, 5))
            elif isinstance(v, bool):
                vals.append(bool(v))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main(sf_dir: str, only=None):
    # scale-dependent oracles (IVF codebook re-derivation) must train
    # on the same table the Spark query reads
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    spark = get_spark("correctness", master="local[8]",
                      shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            got_cols = sorted(df.columns)
            got = [tuple(r[c] for c in got_cols) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}")
            failures.append(name)
            continue
        exp_cols = sorted(ocols)
        if got_cols != exp_cols:
            print(f"FAIL  {name}: schema {got_cols} != {exp_cols}")
            failures.append(name)
            continue
        reorder = [ocols.index(c) for c in exp_cols]
        exp = [tuple(r[i] for i in reorder) for r in orows]
        g, e = norm_rows(got, got_cols), norm_rows(exp, exp_cols)
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} != {len(e)}")
            failures.append(name)
            continue
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            for gv, ev in zip(gr, er):
                ok = (
                    math.isclose(gv, ev, rel_tol=1e-5, abs_tol=1e-5)
                    if isinstance(gv, float) and isinstance(ev, float)
                    else gv == ev
                )
                if not ok:
                    bad = (i, gr, er)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL  {name}: first diff row {bad[0]}:\n"
                  f"      got {bad[1]}\n      exp {bad[2]}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(g)} rows match "
                  f"[{time.time()-t0:.1f}s = spark {t_spark:.1f} "
                  f"+ oracle {time.time()-t0-t_spark:.1f}]")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass "
          f"({len(oracles)} with oracles)")
    if failures:
        print("failures:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         only=set(sys.argv[2:]) or None)
