"""Count py4j socket round trips per query PLAN BUILD (construction +
analysis), by wrapping the gateway connection's send_command.  A pure
count — unaffected by host contention — so it is the stable cost model
for driver-side build time on this shared host (~0.9 ms per trip when
idle, r13 measurement).

Usage: python tools/count_py4j.py [sf_dir] [names...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COUNT = {"n": 0}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]

    import bench
    from file_d_spark.queries import QUERIES, release_caches
    from file_d_spark.session import get_spark
    from file_d_spark.tables import load_table

    spark = get_spark("count_py4j")
    load_table(spark, sf_dir, "region").count()

    import py4j.clientserver as cs

    orig = cs.ClientServerConnection.send_command

    def counting(self, *a, **kw):
        COUNT["n"] += 1
        return orig(self, *a, **kw)

    cs.ClientServerConnection.send_command = counting

    names = only if only else list(bench.BENCH_QUERIES)
    rows = {}
    for name in names:
        fn = QUERIES[name]
        # warm build once (memoized schema loads etc.), then count
        df = fn(spark, sf_dir)
        df.schema
        spark.catalog.clearCache()
        release_caches()
        COUNT["n"] = 0
        df = fn(spark, sf_dir)
        df.schema
        rows[name] = COUNT["n"]
        spark.catalog.clearCache()
        release_caches()
        print(f"# {name}: {rows[name]} trips", file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
