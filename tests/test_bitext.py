"""bitext_margin_mine: pure-Python fixture on tiny vector sets.

Covers the under-k arm (each side smaller than k, so neighborhood
means divide by the actual count), the hub suppression the margin
exists for (a target near everything loses to a mutually-specific
pair), and the threshold filter — all checked against an independent
Python evaluator, so a mistake mirrored into the DuckDB oracle cannot
hide here.
"""

import math

from pyspark.sql import types as T

from file_d_spark.functions.similarity import bitext_margin_mine

SRC = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.6, 0.8, 0.0])]
TGT = [(10, [0.9, 0.1, 0.1]), (11, [0.5, 0.5, 0.5])]  # 11 = the hub


def py_mine(src, tgt, k, threshold):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    sims = {(s, t): cos(sv, tv) for s, sv in src for t, tv in tgt}
    fp = {p: round(v * 1e7) for p, v in sims.items()}

    def topk(pairs, key_idx):
        out = {}
        for (s, t), v in sims.items():
            out.setdefault((s, t)[key_idx], []).append(((s, t), v))
        res = {}
        for node, lst in out.items():
            lst.sort(key=lambda e: (-e[1], e[0][1 - key_idx]))
            res[node] = lst[:k]
        return res

    fwd, bwd = topk(sims, 0), topk(sims, 1)
    s_hood = {n: (sum(fp[p] for p, _ in lst), len(lst)) for n, lst in fwd.items()}
    t_hood = {n: (sum(fp[p] for p, _ in lst), len(lst)) for n, lst in bwd.items()}
    best = {}
    for s, lst in fwd.items():
        cands = []
        for (pair, sim) in lst:
            ssum, scnt = s_hood[s]
            tsum, tcnt = t_hood[pair[1]]
            denom = (ssum / scnt + tsum / tcnt) / 2.0 / 1e7
            cands.append((pair[1], sim, sim / denom))
        cands.sort(key=lambda e: (-e[2], e[0]))
        t, sim, margin = cands[0]
        if margin >= threshold:
            best[s] = (t, round(sim, 6), round(margin, 6))
    return best


def test_bitext_under_k_and_hub(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    src = spark.createDataFrame(SRC, schema)
    tgt = spark.createDataFrame(TGT, schema)
    got = {
        r["src_id"]: (r["tgt_id"], r["sim"], r["margin"])
        for r in bitext_margin_mine(src, tgt, k=4, threshold=0.0).collect()
    }
    # float32 storage: the Python evaluator must see the same rounded
    # components Spark reads back from the ArrayType(FloatType) column
    import struct

    def f32(v):
        return struct.unpack("f", struct.pack("f", v))[0]

    src_py = [(i, [f32(x) for x in v]) for i, v in SRC]
    tgt_py = [(i, [f32(x) for x in v]) for i, v in TGT]
    want = py_mine(src_py, tgt_py, k=4, threshold=0.0)
    assert got == want
    # the mutually-specific target (10) must beat the hub (11) for the
    # aligned source 0 even though the hub is near everything
    assert got[0][0] == 10
