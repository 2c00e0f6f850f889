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

from flink_scala_spark.oracle_types import dtype_mismatches  # noqa: E402

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


def _union_find_entity_rows(con):
    """Linear-time oracle for component queries: DuckDB produces the
    VERIFIED edge list + vocabulary (ENTITY_VERIFY_SQL — the same CTEs
    the gate oracle closes with its recursive CTE), Python union-find
    closes the graph, canonical = lexicographic min per component.
    Exact at any scale; the recursive-CTE closure is O(|component|²)
    and takes minutes on sf0.1's pathological 15k-name component."""
    from flink_scala_spark.queries.pipeline_queries import ENTITY_VERIFY_SQL

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = []
    edges = []
    for kind, a, b in con.execute(ENTITY_VERIFY_SQL).fetchall():
        if kind == "node":
            nodes.append(a)
            parent.setdefault(a, a)
        else:
            edges.append((a, b))
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    canon: dict[str, str] = {}
    for n in parent:
        r = find(n)
        if r not in canon or n < canon[r]:
            canon[r] = n
    label = {n: canon[find(n)] for n in nodes}
    sizes: dict[str, int] = {}
    for c in label.values():
        sizes[c] = sizes.get(c, 0) + 1
    cols = ["name", "canonical", "cluster_size", "is_canonical"]
    rows = [
        (n, c, sizes[c], 1 if n == c else 0) for n, c in label.items()
    ]
    return cols, rows


#: Queries whose SQL oracle is superlinear in a component/closure size:
#: the gate still runs the SQL (the driver's contract), but local
#: sweeps verify through these exact linear fallbacks.
COMPONENT_ORACLES = {
    "entity_clusters": _union_find_entity_rows,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    use_sql_oracle = "--sql-oracle" in only
    only.discard("--sql-oracle")
    head50 = "--head50" in only  # rehearse exactly the driver's 50-entry gate
    only.discard("--head50")

    import __spark_entry__ as se

    if os.environ.get("CHECK_VANILLA"):
        # driver-gate dress rehearsal: a plain session with none of our
        # tuned configs, like the harness passes (queries() wraps each
        # fn in tune_existing, which is the only tuning they may rely on)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(
                os.environ.get("CHECK_MASTER", "local[8]")
            )
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from flink_scala_spark.session import get_spark

        spark = get_spark("check_oracle")
    con = duck_con(sf_dir)
    qmap, omap = se.queries(), se.oracle_sql()
    if head50:
        only |= set(list(qmap)[:50])

    n_pass = n_fail = n_weak = 0
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_dtypes = sdf.dtypes
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
            if name in COMPONENT_ORACLES and not use_sql_oracle:
                d_cols, d_rows = COMPONENT_ORACLES[name](con)
                tbl = None
            else:
                tbl = con.execute(omap[name]).fetch_arrow_table()
                d_cols = tbl.schema.names
                d_rows = [
                    tuple(row[c] for c in d_cols) for row in tbl.to_pylist()
                ]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue

        ok = True
        msgs = []
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        # The driver hashes TYPED values: an uncast DuckDB integer sum()
        # (HUGEINT → arrow decimal128(38,0)) hash-mismatches Spark's
        # BIGINT even when every str(cell) agrees. Hard-fail it locally.
        # (The union-find fallback path has no arrow table; type parity
        # for those queries is covered by the gate's SQL oracle runs.)
        tmis = dtype_mismatches(s_dtypes, tbl.schema) if tbl is not None else []
        if tmis:
            ok = False
            msgs.append("dtype drift: " + "; ".join(tmis))
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
        if ok:
            print(f"PASS {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + " | ".join(msgs))
            n_fail += 1

    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
