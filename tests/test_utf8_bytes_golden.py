"""Golden replay of the reference convert_utf8_bytes test corpus
(/root/reference/plugin/action/convert_utf8_bytes/convert_utf8_bytes_test.go).

Each case feeds the field value as it would look AFTER the outer JSON
decode (the reference digs the node and scans its AsString), and
asserts the exact output string — including the tricky tokenization
rules: a ``\\\\`` pair is opaque (``\\\\x86_64`` stays literal while
``\\xD0`` decodes), surrogate pairs combine, malformed escapes fall
back to their literal spelling, and octal needs a 0-3 lead digit.
"""

from __future__ import annotations

import pytest

from file_d_spark.engine import Pipeline

CYR = r"\xD0\xA1\xD0\x98\xD0\xA1\xD0\xA2\xD0\x95\xD0\x9C\xD0\x90"

CASES = [
    ("valid_hex", CYR + ".xml", "СИСТЕМА.xml", False),
    ("valid_octal",
     r"$\110\145\154\154\157\054\040\146\151\154\145\056\144!",
     "$Hello, file.d!", False),
    ("valid_unicode4",
     r"$\u0048\u0065\u006C\u006C\u006F\u002C\u0020\u0066\u0069\u006C\u0065\u002E\u0064!",
     "$Hello, file.d!", False),
    ("valid_unicode4_surrogate",
     r"$\u0048\u0065\u006C\u006C\u006F\u002C\u0020\uD801\uDC01!",
     "$Hello, 𐐁!", False),
    ("valid_unicode8",
     r"$\U00000048\U00000065\U0000006C\U0000006C\U0000006F\U0000002C\U00000020"
     r"\U00000066\U00000069\U0000006C\U00000065\U0000002E\U00000064!",
     "$Hello, file.d!", False),
    ("valid_escaped",
     '{"Test":"test' + r"\u003F\ud801\udc01" + '","User":"NT AUTHORITY'
     + "\\\\" + CYR + '"}',
     '{"Test":"test?𐐁","User":"NT AUTHORITY' + "\\\\" + 'СИСТЕМА"}',
     False),
    ("valid_escaped_winpath",
     '{"Dir":"C:\\\\Users\\\\username\\\\.prog\\\\120.67.0\\\\x86_64\\\\x64",'
     '"File":"H$Storage_2e3d6dbe-3b0a-4fa9-a6b7-bf1e91e8b3de$'
     + r"\xD0\x9F\xD1\x80\xD0\xB8\xD0\xB7\xD0\xBD\xD0\xB0\xD0\xBA"
     + '.20.tbl.xml"}',
     '{"Dir":"C:\\\\Users\\\\username\\\\.prog\\\\120.67.0\\\\x86_64\\\\x64",'
     '"File":"H$Storage_2e3d6dbe-3b0a-4fa9-a6b7-bf1e91e8b3de$'
     'Признак.20.tbl.xml"}',
     False),
    ("invalid_octal",
     r"$\110\145\154\154\157\054\40\146\151\154\145\777\144!",
     r"$Hello,\40file\777d!", False),
    ("invalid_unicode4",
     r"$\u0048\u0065\u006C\u006C\u006F\u002C\u\u0066\u0069\u006C\u0065\u00\u0064!",
     r"$Hello,\ufile\u00d!", False),
    ("invalid_unicode8",
     r"$\U00000048\U00000065\U0000006C\U0000006C\U0000006F\U0000002C\U0000"
     r"\U00000066\U00000069\U0000006C\U00000065\UFFFFFFF\U00000064!",
     r"$Hello,\U0000file\UFFFFFFFd!", False),
    ("non_graphic_char",
     '{"version":"1.0.18.16 6' + r"\t\u0001" + 'ProductVersion"}',
     '{"version":"1.0.18.16 6' + r"\t" + '�ProductVersion"}', True),
]


@pytest.mark.parametrize("name,val,want,rng", CASES, ids=[c[0] for c in CASES])
def test_utf8_bytes_golden(spark, name, val, want, rng):
    df = spark.createDataFrame([(val,)], "s string")
    p = Pipeline.from_dict(
        {"actions": [{"type": "convert_utf8_bytes", "fields": ["s"],
                      "replace_non_graphic": rng}]}
    )
    got = p.apply(df).collect()[0].s
    assert got == want


def test_utf8_bytes_multiple_fields_and_nonstring(spark):
    df = spark.createDataFrame(
        [(CYR + ".xml", r"test\u003F\uD801\uDC01", True)],
        "a string, b string, c boolean",
    )
    p = Pipeline.from_dict(
        {"actions": [{"type": "convert_utf8_bytes", "fields": ["a", "b", "c"]}]}
    )
    row = p.apply(df).collect()[0]
    assert row.a == "СИСТЕМА.xml"
    assert row.b == "test?𐐁"
    assert row.c == "true"  # non-string node rendered as its string form


def test_utf8_bytes_null_passthrough(spark):
    df = spark.createDataFrame([(None,), ("plain",)], "s string")
    p = Pipeline.from_dict(
        {"actions": [{"type": "convert_utf8_bytes", "fields": ["s"]}]}
    )
    got = {r.s for r in p.apply(df).collect()}
    assert got == {None, "plain"}
