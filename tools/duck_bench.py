#!/usr/bin/env python3
"""Paired-bench DuckDB side: run every oracle SQL statement from a Verify
dump's oracle_sql.json against the raw parquet tables at <sf_dir>, twice
(warm-up + timed, mirroring graft.Bench), and print per-query + total
timings as one JSON line.

Usage: python3 tools/duck_bench.py <verify_out_dir> <sf_dir> [threads]
"""
import sys, os, json, time
import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timings, errors = {}, {}
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            con.execute(sql).fetchall()  # warm-up (buffer caches, plans)
            t0 = time.time()
            con.execute(sql).fetchall()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:
            errors[name] = str(e)[:120]
    line = {"metric": "duckdb_total", "value": round(sum(timings.values()), 3),
            "unit": "sec", "n_queries": len(timings), "sf": sf_dir,
            "threads": threads}
    if errors:
        line["errors"] = errors
    print(json.dumps(line))
    with open("duck_bench_detail.json", "w") as f:
        json.dump({**line, "queries": timings}, f, indent=0)

if __name__ == "__main__":
    main()
