"""matchrule golden replay of the reference's own corpus.

Cases transcribed from /root/reference/cfg/matchrule/matchrule_test.go:
TestRule_Match (lines 21-92), the TestRule_Match_ZeroAlloc rule configs
against `rawEvent` (lines 94-126), and TestException_Match
(lines 155-169) — same rules, same raw byte strings, same booleans.
"""

from pyspark.sql import functions as F

from file_d_spark.matchrule import rule_pred, ruleset_pred

RAW_EVENT = (
    '{"level":"error","ts":"2019-08-21T11:43:25.865Z",'
    '"message":"get_items_error_1","trace_id":"3ea4a6589d06bb3f",'
    '"span_id":"deddd718684b10a","get_items_error":"product: error while '
    'consuming CoverImage: context canceled",'
    '"get_items_error_option":"CoverImage",'
    '"get_items_error_cause":"context canceled",'
    '"get_items_error_cause_type":"context_canceled"}'
)

# (rule, raw event string, want) — TestRule_Match table
RULE_CASES = [
    ({"values": ['{"level":"error"'], "mode": "prefix"},
     '{"level":"error","message":"some message"}', True),
    ({"values": ['{"level":"info"'], "mode": "prefix"},
     '{"level":"error","message":"some message"}', False),
    ({"values": ['{"level":"info"'], "mode": "prefix", "case_insensitive": True},
     '{"level":"INFO","message":"some message"}', True),
    ({"values": ['"level":"error"}'], "mode": "suffix"},
     '{"message":"some message","level":"error"}', True),
    ({"values": ['{"level":"info"'], "mode": "suffix"},
     '{"message":"some message","level":"error"}', False),
    ({"values": ['"level":"Info"}'], "mode": "suffix", "case_insensitive": True},
     '{"message":"some message","level":"INFO"}', True),
    ({"values": ['"level":"panic"'], "mode": "contains"},
     '{"time":"18:00", "event":"dinner", "level":"panic", "ok":"google"}', True),
    ({"values": ['"level":"fatal"'], "mode": "contains"},
     '{"time":"18:00", "event":"dinner", "level":"panic", "ok":"google"}', False),
    # ZeroAlloc configs, all matching rawEvent
    ({"values": ['"ts":"2019-08-21T11:43:25.865Z"', "get_items_error_1",
                 '"trace_id":"3ea4a6589d06bb3f"'], "mode": "contains"},
     RAW_EVENT, True),
    ({"values": ['{"level":"error"'], "mode": "prefix"}, RAW_EVENT, True),
    ({"values": ['"ts":"2019-08-21T11:43:25.865Z"', "get_items_error_1",
                 '"trace_id":"3ea4a6589d06bb3f"'], "mode": "contains",
      "case_insensitive": True}, RAW_EVENT, True),
]


def _eval(spark, col_expr, raw: str) -> bool:
    df = spark.createDataFrame([(raw,)], "raw string")
    return df.select(F.coalesce(col_expr, F.lit(False)).alias("g")).head().g


def test_rule_match_reference_corpus(spark):
    rows = [(i, raw) for i, (_, raw, _) in enumerate(RULE_CASES)]
    df = spark.createDataFrame(rows, "i int, raw string")
    cols = [
        F.coalesce(rule_pred(F.col("raw"), rule), F.lit(False)).alias(f"c{i}")
        for i, (rule, _, _) in enumerate(RULE_CASES)
    ]
    got = df.select("i", *cols).collect()
    by_i = {r.i: r for r in got}
    for i, (rule, raw, want) in enumerate(RULE_CASES):
        assert by_i[i][f"c{i}"] is want, (i, rule, raw)


def test_exception_match_and_or(spark):
    rules = [
        {"values": ["404"], "mode": "prefix", "case_insensitive": True},
        {"values": ["ok"], "mode": "prefix", "case_insensitive": True},
    ]
    assert _eval(
        spark, ruleset_pred(F.col("raw"), {"cond": "and", "rules": rules}), "ok"
    ) is False
    assert _eval(
        spark, ruleset_pred(F.col("raw"), {"cond": "or", "rules": rules}), "ok"
    ) is True
