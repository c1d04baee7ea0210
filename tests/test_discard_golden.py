"""Golden replay of the reference discard action test corpus
(/root/reference/plugin/action/discard/discard_test.go): every case's
pass/discard event partition, driven through the pipeline's variant
decode path (the events are schema-heterogeneous — `field2` is an
object in one event and a string in the next — exactly what variant
mode exists for)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from file_d_spark.engine import Pipeline

# (name, action config, pass events, discard events) — verbatim corpus
CASES = [
    (
        "match_and",
        {"type": "discard",
         "match_fields": {"event.field1": "value1", "event.field2": "value2"},
         "match_mode": "and"},
        ['{"field1":"not_value1"}', '{"field2":"not_value2"}',
         '{"field1":"value1"}', '{"field2":"value2"}'],
        ['{"field1":"value1","field2":"value2"}',
         '{"field3":"value3","field1":"value1","field2":"value2"}'],
    ),
    (
        "match_or",
        {"type": "discard",
         "match_fields": {"event.field1": "value1", "event.field2": "value2"},
         "match_mode": "or"},
        ['{"field1":"not_value1"}', '{"field2":"not_value2"}'],
        ['{"field1":"value1"}', '{"field2":"value2"}',
         '{"field1":"value1","field2":"value2"}',
         '{"field3":"value3","field1":"value1","field2":"value2"}'],
    ),
    (
        "match_or_regex",
        {"type": "discard",
         "match_fields": {"event.field1": "/(one|two|three)/", "event.field2.field3": "/four/"},
         "match_mode": "or"},
        ['{"field2":{"field3":"0000 one 0000"}}', '{"field1":"four"}',
         '{"field2":"... four ....","field3":"value2"}',
         '{"field3":"value3","field1":"value1","field2":"value2"}'],
        ['{"field1":"0000 one 0000"}', '{"field2":{"field3":"0000 four 0000"}}',
         '{"field1":". two ."}'],
    ),
    (
        "match_and_invert",
        {"type": "discard",
         "match_fields": {"event.field2": "value2"},
         "match_mode": "and", "match_invert": True},
        ['{"field2":"value2"}', '{"field1":"value1","field2":"value2"}',
         '{"field3":"value3","field1":"value1","field2":"value2"}'],
        ['{"field1":"not_value1"}', '{"field2":"not_value2"}',
         '{"field1":"value1"}'],
    ),
]


@pytest.mark.parametrize("name,action,passes,discards", CASES,
                         ids=[c[0] for c in CASES])
def test_discard_golden(spark, name, action, passes, discards):
    raw = [(i, e) for i, e in enumerate(passes + discards)]
    df = spark.createDataFrame(raw, "idx int, raw string")
    p = Pipeline.from_dict({"actions": [action]})
    decoded = df.withColumn("event", F.parse_json(F.col("raw")))
    out = p.apply(decoded)
    kept = {r["idx"] for r in out.select("idx").collect()}
    assert kept == set(range(len(passes))), (
        f"{name}: kept {sorted(kept)}, want 0..{len(passes)-1}"
    )
