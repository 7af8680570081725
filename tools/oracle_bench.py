#!/usr/bin/env python3
"""Time the DuckDB oracle on the full oracle_sql.json at a given SF — the
like-for-like single-node baseline for BENCH_r{N}. Each query gets a
time-box (default 120 s) enforced via duckdb's interrupt from a watchdog
thread; timed-out queries report -1 and are EXCLUDED from the comparable
total (compare graft on the same subset).

Usage: oracle_bench.py <sfDir> <oracle_sql.json> [timebox_sec]
Output: one JSON line {"total_sec":..,"n":..,"timeouts":[..],"queries":{..}}
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, timebox=120.0):
    con = duckdb.connect()
    ncpu = 32
    con.execute(f"SET threads={ncpu}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    times, timeouts = {}, []
    for name, sql in oracle.items():
        done = threading.Event()

        def watchdog():
            if not done.wait(timebox):
                con.interrupt()

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = round(time.time() - t0, 3)
        except duckdb.InterruptException:
            times[name] = -1.0
            timeouts.append(name)
        except Exception as e:
            times[name] = -1.0
            timeouts.append(name)
            print(f"[oracle_bench] {name} errored: {str(e)[:200]}",
                  file=sys.stderr)
        finally:
            done.set()
            w.join()
        print(f"[oracle_bench] {name}: {times[name]}", file=sys.stderr)
    total = round(sum(v for v in times.values() if v >= 0), 3)
    line = json.dumps({"total_sec": total, "n": len(times),
                       "timeouts": timeouts, "queries": times})
    print(line)


if __name__ == "__main__":
    tb = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    main(sys.argv[1], sys.argv[2], tb)
