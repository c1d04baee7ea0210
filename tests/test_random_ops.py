"""Seeded randomized checks for the round-3 operators against
independent reference implementations (pandas merge_asof, a literal
python interval scan, Counter-based entropy) — one Spark job per test,
hundreds of random rows with deliberate key/timestamp collisions."""

import datetime as dt
import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def _random_frames(seed, n_left=300, n_right=120, n_keys=12):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)
    left = pd.DataFrame(
        {
            "id": np.arange(n_left),
            "k": rng.integers(0, n_keys, n_left),
            "ts": [
                base + dt.timedelta(seconds=int(s))
                for s in rng.integers(0, 50_000, n_left)
            ],
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "ts": [
                base + dt.timedelta(seconds=int(s))
                for s in rng.integers(0, 50_000, n_right)
            ],
            "v": np.round(rng.uniform(0, 100, n_right), 2),
        }
    )
    # asof ties on (k, ts) are out of contract — dedup right per (k, ts)
    right = right.drop_duplicates(subset=["k", "ts"], keep="first")
    return left, right


@pytest.mark.parametrize("seed", [7, 19])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas_merge_asof(spark, seed, direction):
    from file_d_spark.functions.asof import asof_join

    left, right = _random_frames(seed)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            direction=direction,
        )
        .select("id", "v")
        .toPandas()
        .set_index("id")["v"]
        .sort_index()
    )
    want = (
        pd.merge_asof(
            left.sort_values("ts", kind="mergesort"),
            right.sort_values("ts", kind="mergesort"),
            on="ts",
            by="k",
            direction=direction,
            allow_exact_matches=True,
        )
        .set_index("id")["v"]
        .sort_index()
    )
    pd.testing.assert_series_equal(got, want, check_names=False)


@pytest.mark.parametrize("seed", [3])
@pytest.mark.parametrize("bucket_s", [600, 3600])
def test_interval_join_matches_python_scan(spark, seed, bucket_s):
    from file_d_spark.functions.asof import interval_join

    left, right = _random_frames(seed, n_left=200, n_right=60)
    right = right.assign(
        start_ts=right["ts"],
        end_ts=right["ts"] + dt.timedelta(seconds=1800),
        rid=np.arange(len(right)),
    ).drop(columns=["ts"])
    got = {
        (r.id, r.rid)
        for r in interval_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            point_ts="ts",
            start_ts="start_ts",
            end_ts="end_ts",
            bucket_seconds=bucket_s,
        )
        .select("id", "rid")
        .collect()
    }
    want = {
        (l.id, r.rid)
        for l in left.itertuples()
        for r in right.itertuples()
        if l.k == r.k and r.start_ts <= l.ts < r.end_ts
    }
    assert got == want
    assert want, "random fixture should produce matches"


def test_char_entropy_matches_counter(spark):
    from file_d_spark.functions.text import char_entropy

    texts = [
        (0, "aaaa"),
        (1, "abab"),
        (2, "abcd"),
        (3, "hello world"),
        (4, "aa bb cc dd ee ff gg hh"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: r.entropy for r in char_entropy(df, "doc_id", "text").collect()
    }
    for doc_id, text in texts:
        counts = Counter(text)
        n = sum(counts.values())
        want = -sum(k / n * math.log2(k / n) for k in counts.values())
        assert abs(got[doc_id] - round(want, 4)) < 1e-9, (doc_id, text)


def test_kitchen_sink_event_type_digit_free(spark, sf_dir):
    """kitchen_sink_actions' oracle equates count(DISTINCT msg_hash)
    with count(DISTINCT event_type), which holds only while event_type
    carries no digits (the 'int|float' normalizer would collapse
    digit-bearing types).  Pin the invariant the oracle rests on."""
    from pyspark.sql import functions as F

    from file_d_spark.tables import load_table

    bad = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").rlike(r"\d"))
        .limit(1)
        .count()
    )
    assert bad == 0, (
        "event_type contains digits — kitchen_sink_actions' distinct-"
        "hash oracle is no longer sound; re-template the hashed msg"
    )
