"""Randomized differential for join_cri_partials (sources/__init__.py):
seeded random chunk sequences — random P/F flags, chunk lengths that
straddle split_event_size boundaries, interleaved streams — replayed
by an INDEPENDENT pure-Python reassembler implementing the
multiline_action.go:66-210 spec directly (buffer until F, fields from
the last chunk of each emitted piece, overflow pieces split at the
cumulative-length boundary).  The decoder_lineformats driver row pins
the F-heavy fixture; this pins the corner cases the fixture can't
reach (trailing unterminated P-runs, empty chunks, splits landing
exactly on the boundary).

Mutation teeth (verified when authoring): bucketing by the INCLUSIVE
cumulative length, taking fields from the first chunk, or closing
groups on P instead of F each flip dozens of compared cells."""

from __future__ import annotations

import random

from file_d_spark.sources import join_cri_partials


def _py_reassemble(rows, split_event_size):
    """rows: list of dicts with src, seq, log, is_partial, time
    (already any order); returns {(src, piece_key): (log, time,
    is_partial)} keyed deterministically by (src, first seq of
    piece)."""
    out = {}
    by_src: dict = {}
    for r in sorted(rows, key=lambda r: (r["src"], r["seq"])):
        by_src.setdefault(r["src"], []).append(r)
    for src, chunks in by_src.items():
        group: list = []
        for c in chunks:
            group.append(c)
            if not c["is_partial"]:
                _emit_group(out, src, group, split_event_size)
                group = []
        if group:  # trailing unterminated P-run still emits
            _emit_group(out, src, group, split_event_size)
    return out


def _emit_group(out, src, group, sz):
    buckets: dict = {}
    offset = 0
    for c in group:
        b = offset // sz
        buckets.setdefault(b, []).append(c)
        offset += len(c["log"] or "")
    for b, cs in sorted(buckets.items()):
        log = "".join(c["log"] or "" for c in cs)
        last = cs[-1]
        out[(src, cs[0]["seq"])] = (log, last["time"], last["is_partial"])


def _rand_rows(seed, n=400):
    rng = random.Random(seed)
    rows = []
    for seq in range(n):
        src = f"s{rng.randrange(4)}"
        log = "x" * rng.randrange(0, 9)
        rows.append(
            {
                "src": src,
                "seq": seq,
                "log": log,
                "is_partial": rng.random() < 0.6,
                "time": f"t{seq}",
            }
        )
    return rows


def test_join_cri_partials_matches_pure_python(spark):
    for seed in (0xC1, 0xC2):
        rows = _rand_rows(seed)
        df = spark.createDataFrame(
            [(r["src"], r["seq"], r["log"], r["is_partial"], r["time"])
             for r in rows],
            "src string, seq long, log string, is_partial boolean,"
            " time string",
        )
        for sz in (5, 17, 1_000_000):
            # the operator drops the seq col, so compare the
            # (src, log, time, is_partial) MULTISETS — they pin the
            # reassembly, the split points and last-chunk-wins without
            # coupling to a key choice
            g = sorted(
                (r.src, r.log, r.time, r.is_partial)
                for r in join_cri_partials(
                    df, ["src"], "seq", split_event_size=sz
                ).collect()
            )
            w = sorted(
                (k[0], v[0], v[1], v[2])
                for k, v in _py_reassemble(rows, sz).items()
            )
            assert g == w, f"seed {seed} sz {sz}"


def test_join_cri_partials_empty_and_all_partial(spark):
    df = spark.createDataFrame(
        [("a", 0, "p1", True, "t0"), ("a", 1, "p2", True, "t1")],
        "src string, seq long, log string, is_partial boolean, time string",
    )
    got = join_cri_partials(df, ["src"], "seq").collect()
    assert len(got) == 1
    assert got[0].log == "p1p2"
    assert got[0].time == "t1"
    assert got[0].is_partial is True  # unterminated run stays flagged
