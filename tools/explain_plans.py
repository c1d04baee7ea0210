"""Plan-quality audit: for each headline query print the physical-plan
properties that matter at 100 TB — parquet pushdown (PushedFilters),
column pruning (ReadSchema), join strategies (Broadcast vs SortMerge),
and shuffle counts (Exchange)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from file_d_spark.queries import QUERIES
    from file_d_spark.session import get_spark

    spark = get_spark("explain", cpus=8)
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:
            print(f"{name}: ERROR {str(e)[:120]}")
            continue
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        read_schema = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        n_wsc = len(re.findall(r"WholeStageCodegen", plan))
        n_py = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas)", plan))
        cols = [s.split(":")[0] for rs in read_schema for s in rs.split(",")]
        print(
            f"{name:24s} exch={n_exchange} bhj={n_bhj} smj={n_smj} bnlj={n_bnlj} "
            f"codegen={n_wsc} py={n_py} pushed={sum(1 for p in pushed if p)} "
            f"readcols={len(cols)}"
        )
        for rs in read_schema:
            print(f"    read: {rs[:100]}")
        for p in pushed:
            if p:
                print(f"    pushed: {p[:100]}")


if __name__ == "__main__":
    main()
