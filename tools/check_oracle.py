#!/usr/bin/env python
"""Local replica of the driver's CORRECTNESS check.

Runs each __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB over the same sf parquet tables, compares row count, schema
(column names sorted), and a value hash over name-sorted columns.

    python tools/check_oracle.py [query ...]        # default: all
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/check_oracle.py
"""

from __future__ import annotations

import hashlib
import os
import sys

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _canon(df) -> tuple[int, list, str]:
    """(n_rows, sorted col names, value hash) for a pandas DataFrame."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        cells = []
        for v in tup:
            if v is None or (isinstance(v, float) and v != v):
                cells.append("\\N")
            elif isinstance(v, float):
                cells.append(f"{v:.10g}")
            elif isinstance(v, (bytes, bytearray)):
                cells.append(hashlib.md5(bytes(v)).hexdigest())
            else:
                cells.append(str(v))
        rows.append("\x01".join(cells))
    rows.sort()
    h = hashlib.md5("\x02".join(rows).encode()).hexdigest()
    return len(rows), cols, h


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    want = sys.argv[1:]
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = want or list(qs)

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed = []
    for name in names:
        if name not in qs:
            print(f"{name}: NOT FOUND"); failed.append(name); continue
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            s_n, s_cols, s_h = _canon(sdf)
            if name not in oracles:
                print(f"{name}: rows={s_n} (no oracle — rows-only)")
                continue
            odf = con.execute(oracles[name]).fetchdf()
            o_n, o_cols, o_h = _canon(odf)
            ok = (s_n == o_n, s_cols == o_cols, s_h == o_h)
            status = "OK" if all(ok) else f"FAIL rows={ok[0]} schema={ok[1]} hash={ok[2]}"
            print(f"{name}: {status} (spark={s_n}, oracle={o_n})")
            if not all(ok):
                failed.append(name)
                if not ok[1]:
                    print(f"  spark cols:  {s_cols}\n  oracle cols: {o_cols}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failed.append(name)
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
