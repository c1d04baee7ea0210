"""Golden pairs for convert_log_level, mirroring
/root/reference/plugin/action/convert_log_level/convert_log_level_test.go
and the RFC-5424 table in /root/reference/pipeline/util.go:69-108.
Typed-engine note: number style emits the digit as a string (a typed
column cannot switch between int and string per row)."""

from tests.test_actions import run_actions


def convert(spark, value, schema="level string", **cfg):
    out = run_actions(
        spark,
        [(value,)],
        schema,
        [{"type": "convert_log_level", "field": "level", **cfg}],
    )
    return out.collect()[0].level


def test_string_style_from_digit(spark):
    assert convert(spark, "1", style="string") == "alert"


def test_number_style_from_name(spark):
    assert convert(spark, "alert", style="number") == "1"


def test_number_input_to_string_style(spark):
    assert convert(spark, 5, schema="level long", style="string") == "notice"


def test_unknown_kept_without_remove(spark):
    assert convert(spark, "UNKNOWN", style="number") == "UNKNOWN"


def test_unknown_removed_on_fail(spark):
    assert convert(spark, "UNKNOWN", style="number", remove_on_fail=True) is None


def test_unknown_removed_even_with_default(spark):
    """convert_log_level_test.go 'remove on fail parse with default
    level': the default does NOT rescue a non-empty unknown value."""
    assert (
        convert(
            spark, "UNKNOWN", style="number", default_level="1", remove_on_fail=True
        )
        is None
    )


def test_empty_input_takes_default(spark):
    assert (
        convert(spark, "", style="number", default_level="4", remove_on_fail=True)
        == "4"
    )


def test_missing_value_takes_default(spark):
    assert convert(spark, None, style="string", default_level="alert") == "alert"


def test_missing_value_no_default_passes(spark):
    assert convert(spark, None, style="string") is None


def test_trim_and_case_insensitive(spark):
    assert convert(spark, "  WARN  ", style="number") == "4"


def test_alias_table(spark):
    """every alias from pipeline/util.go ParseLevelAsNumber."""
    aliases = {
        "emergency": 0, "emerg": 0, "fatal": 0, "panic": 0, "dpanic": 0,
        "alert": 1,
        "critical": 2, "crit": 2,
        "error": 3, "err": 3,
        "warning": 4, "warn": 4,
        "notice": 5,
        "informational": 6, "info": 6,
        "debug": 7,
    }
    rows = [(k,) for k in aliases]
    out = run_actions(
        spark,
        rows,
        "level string",
        [{"type": "convert_log_level", "field": "level", "style": "number"}],
    )
    got = [int(r.level) for r in out.collect()]
    assert got == list(aliases.values())


def test_roundtrip_names(spark):
    names = [
        "emergency", "alert", "critical", "error",
        "warning", "notice", "informational", "debug",
    ]
    out = run_actions(
        spark,
        [(str(i),) for i in range(8)],
        "level string",
        [{"type": "convert_log_level", "field": "level", "style": "string"}],
    )
    assert [r.level for r in out.collect()] == names
