"""Dump .explain('formatted') for every bench query (or a given list)
into plans/<tag>/<query>_<suffix>.txt — the before/after evidence the
optimization rounds commit.  Usage:
    python tools/dump_plans.py <tag> <suffix> [sf_dir] [names...]
e.g. python tools/dump_plans.py r13 before /root/testdata/sf0.1
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tag = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])

    import bench
    from file_d_spark.queries import QUERIES, release_caches
    from file_d_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans", cpus=8)
    names = list(only) if only else list(bench.BENCH_QUERIES)
    for name in names:
        fn = QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        release_caches()
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
