#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Runs each SparkEntry query result (parquet written by graft.Verify) against
its DuckDB oracle SQL over the same sf-dir parquet tables, compares after
sorting columns by name and rows by all values, and prints a per-query
verdict. Usage: selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Large-sf sweeps: cap DuckDB's memory and let it spill to disk
    # instead of riding an unbounded allocation into the kernel
    # OOM-killer (the sf1 q_graph_msf oracle reached 96 GB RSS).
    # Under the cap DuckDB either spills or raises a catchable
    # out-of-memory error -> a FAIL line, never a dead process.
    import os
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        spill = Path(f"/tmp/duck_spill_{os.getpid()}")
        spill.mkdir(exist_ok=True)
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{spill}'")
    threads = os.environ.get("GRAFT_DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written dir (SfGen output): glob the parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISSING {name}: no spark result")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ERROR   {name}: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"SCHEMA  {name}: spark={gcols} oracle={wcols}")
            n_fail += 1
            continue
        # Driver hash is type-sensitive: DuckDB SUM(BIGINT)->DECIMAL(38,0)
        # vs Spark int64 must FAIL here even though Python == would pass.
        gtypes = {f.name: str(f.type) for f in got.schema}
        wtypes = {f.name: str(f.type) for f in want.schema}
        if gtypes != wtypes:
            diff = {c: (gtypes[c], wtypes[c]) for c in gtypes
                    if gtypes[c] != wtypes[c]}
            print(f"TYPES   {name}: spark-vs-oracle {diff}")
            n_fail += 1
            continue
        if got.num_rows != want.num_rows:
            print(f"ROWS    {name}: spark={got.num_rows} oracle={want.num_rows}")
            n_fail += 1
            continue
        key = lambda r: tuple((x is None, str(type(x)), str(x)) for x in r)
        g = sorted([tuple(norm(v) for v in row)
                    for row in zip(*[got.column(c).to_pylist() for c in gcols])], key=key)
        w = sorted([tuple(norm(v) for v in row)
                    for row in zip(*[want.column(c).to_pylist() for c in wcols])], key=key)
        if g != w:
            bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
            print(f"VALUES  {name}: first diff at sorted row {bad}:")
            print(f"        spark : {g[bad]}")
            print(f"        oracle: {w[bad]}")
            n_fail += 1
            continue
        print(f"PASS    {name} ({got.num_rows} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
