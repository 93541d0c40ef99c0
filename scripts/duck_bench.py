#!/usr/bin/env python3
"""Time the full oracle workload in DuckDB — the single-node baseline
the engine's Bench total is judged against.

Usage: python3 scripts/duck_bench.py <sfDir> <oracle_sql.json> [passes]

Prints one JSON line: total = min-over-passes of the sum of per-query
times (pass-major order, matching graft.Bench's warm passes).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1]
    sqls = json.load(open(sys.argv[2]))
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    names = sorted(sqls)
    # warmup pass (uncounted), then timed passes
    per = {n: [] for n in names}
    for p in range(passes + 1):
        for n in names:
            t0 = time.time()
            con.execute(sqls[n]).fetchall()
            dt = time.time() - t0
            if p > 0:
                per[n].append(dt)
    qmin = {n: min(v) for n, v in per.items()}
    totals = [sum(per[n][p] for n in names) for p in range(passes)]
    print(json.dumps({
        "metric": "duckdb_total", "value": min(totals), "unit": "sec",
        "pass_totals": [round(t, 3) for t in totals],
        "queries_min": {n: round(v, 4) for n, v in qmin.items()},
        "n_queries": len(names), "sf": sf}))


if __name__ == "__main__":
    main()
