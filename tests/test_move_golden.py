"""Golden pairs for the move action, mirroring
/root/reference/plugin/action/move/move_test.go (TestMove,
TestConfigValidate).  Typed-engine divergence: when no field moves,
the reference leaves an empty target object — Spark structs cannot be
empty, so no target column appears (documented in actions/projection.py)."""

import pytest

from tests.test_actions import run_actions

FLAT = "field1 string, field2 boolean, field3 long"
FLAT_ROW = [("value1", True, 3)]


def move(spark, rows, schema, **cfg):
    return run_actions(spark, rows, schema, [{"type": "move", **cfg}]).collect()[0]


def test_move_allow_simple(spark):
    r = move(
        spark, FLAT_ROW, FLAT,
        fields=["field1", "field3"], mode="allow", target="target_field",
    )
    assert r.target_field.asDict() == {"field1": "value1", "field3": 3}
    assert "field1" not in r.asDict() and "field3" not in r.asDict()
    assert r.field2 is True


def test_move_block_simple(spark):
    r = move(
        spark, FLAT_ROW, FLAT,
        fields=["field1", "field3"], mode="block", target="target_field",
    )
    assert r.target_field.asDict() == {"field2": True}
    assert r.field1 == "value1" and r.field3 == 3


DEEP = (
    "field1 string, "
    "field2 struct<field2_1:string, field2_2:struct<field2_2_1:long, field2_2_2:string>>, "
    "field3 long"
)
DEEP_ROW = [("value1", ("value2_1", (100, "value2_2_2")), 3)]


def test_move_allow_deep_fields(spark):
    r = move(
        spark, DEEP_ROW, DEEP,
        fields=["field3", "field2.field2_1", "field2.field2_2.field2_2_2"],
        mode="allow", target="target_field",
    )
    assert r.target_field.asDict() == {
        "field3": 3,
        "field2_1": "value2_1",
        "field2_2_2": "value2_2_2",
    }
    # moved leaves are gone; untouched siblings remain
    assert r.field2.asDict(recursive=True) == {"field2_2": {"field2_2_1": 100}}


def test_move_block_deep_fields(spark):
    """block mode ignores list entries deeper than 1, so field2 is NOT
    protected and moves wholesale."""
    r = move(
        spark, DEEP_ROW, DEEP,
        fields=["field1", "field2.field2_2"], mode="block", target="target_field",
    )
    t = r.target_field.asDict(recursive=True)
    assert t == {
        "field2": {
            "field2_1": "value2_1",
            "field2_2": {"field2_2_1": 100, "field2_2_2": "value2_2_2"},
        },
        "field3": 3,
    }
    assert r.field1 == "value1"


def test_move_allow_unknown_fields(spark):
    r = move(
        spark, FLAT_ROW, FLAT,
        fields=["unknown1", "unknown2"], mode="allow", target="target_field",
    )
    d = r.asDict()
    assert d.get("field1") == "value1" and d.get("field3") == 3
    assert "target_field" not in d  # typed divergence: no empty struct


def test_move_block_empty_fields(spark):
    r = move(spark, FLAT_ROW, FLAT, mode="block", target="target_field")
    assert r.target_field.asDict() == {
        "field1": "value1",
        "field2": True,
        "field3": 3,
    }


def test_move_allow_deep_target(spark):
    r = move(
        spark, FLAT_ROW, FLAT,
        fields=["field1", "field3"], mode="allow", target="target1.target2.target3",
    )
    assert r.target1.target2.target3.asDict() == {"field1": "value1", "field3": 3}


def test_move_existing_target_merges(spark):
    r = move(
        spark,
        [("value1", True, (3,))],
        "field1 string, field2 boolean, field3 struct<field3_1:long>",
        fields=["field2"], mode="allow", target="field3",
    )
    assert r.field3.asDict() == {"field3_1": 3, "field2": True}


def test_move_existing_target_not_object(spark):
    """a scalar target is overwritten with a fresh object."""
    r = move(
        spark, FLAT_ROW, FLAT,
        fields=["field2"], mode="allow", target="field3",
    )
    assert r.field3.asDict() == {"field2": True}


def test_move_allow_target_in_fields(spark):
    """the target itself is never moved into itself."""
    r = move(
        spark,
        [("value1", True, (3,))],
        "field1 string, field2 boolean, field3 struct<field3_1:long>",
        fields=["field2", "field3"], mode="allow", target="field3",
    )
    assert r.field3.asDict() == {"field3_1": 3, "field2": True}


def test_move_block_target_in_fields(spark):
    r = move(
        spark,
        [("value1", True, (3,))],
        "field1 string, field2 boolean, field3 struct<field3_1:long>",
        fields=["field1", "field3"], mode="block", target="field3",
    )
    assert r.field3.asDict() == {"field3_1": 3, "field2": True}
    assert r.field1 == "value1"


def test_move_fields_same_end_last_wins(spark):
    r = move(
        spark,
        [("value1", ("value2_1", "value2_2"), ("value3_1", "value3_2"))],
        "field1 string, field2 struct<field1:string,field2:string>, "
        "field3 struct<field1:string,field2:string>",
        fields=["field2.field1", "field3.field1"], mode="allow", target="target_field",
    )
    assert r.target_field.asDict() == {"field1": "value3_1"}


def test_move_config_validation(spark):
    with pytest.raises(Exception):
        move(spark, FLAT_ROW, FLAT, mode="unknown", target="t")
    with pytest.raises(Exception):
        move(spark, FLAT_ROW, FLAT, mode="block", target="t1.t2.t3")
