"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count, column
names/types, and order-insensitive values. Use before committing:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)


def df_to_sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as se
    from flink_scala_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duck_con(sf_dir)
    qmap, omap = se.queries(), se.oracle_sql()

    n_pass = n_fail = n_weak = 0
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in omap:
            print(f"WEAK {name}: rows={len(s_rows)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            res = con.execute(omap[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue

        ok = True
        msgs = []
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            ok = False
            msgs.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if ok:
            _, s_sorted = df_to_sorted_rows(s_cols, s_rows)
            _, d_sorted = df_to_sorted_rows(d_cols, d_rows)
            if s_sorted != d_sorted:
                ok = False
                diffs = [
                    (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
                ][:3]
                msgs.append(f"values differ; first diffs: {diffs}")
        if ok and s_rows and d_rows:
            # Values equal under str-normalization, but the driver hashes
            # typed values: DuckDB HUGEINT/DECIMAL vs Spark LONG slips
            # through str() yet hash-mismatches. Surface it here.
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            for i_s, i_d in zip(order_s, order_d):
                ts_, td_ = type(s_rows[0][i_s]), type(d_rows[0][i_d])
                if ts_ is not td_ and None not in (s_rows[0][i_s], d_rows[0][i_d]):
                    msgs.append(
                        f"TYPE-WARN col {s_cols[i_s]}: spark={ts_.__name__} duck={td_.__name__}"
                    )
        if ok:
            warn = (" | " + " | ".join(msgs)) if msgs else ""
            print(f"PASS {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]{warn}")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + " | ".join(msgs))
            n_fail += 1

    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
