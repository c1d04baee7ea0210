"""Golden pairs for the mask action, mirroring the reference's own
test corpus (/root/reference/plugin/action/mask/mask_test.go):
TestMaskFunctions value table, TestMaskAddExtraField,
TestWithEmptyRegex, TestPluginWithComplexMasks, and
TestIgnoreProcessFields."""

import pytest

from tests.test_actions import run_actions

ID_RE = r"[А-Я][а-я]{1,64}(\-[А-Я][а-я]{1,64})?\s+[А-Я][а-я]{1,64}(\.)?\s+[А-Я][а-я]{1,64}"
CARD_RE = r"\b(\d{1,4})\D?(\d{1,4})\D?(\d{1,4})\D?(\d{1,4})\b"
CARD_DELIM_RE = r"\b(\d{4})\s?\-?(\d{4})\s?\-?(\d{4})\s?\-?(\d{4})\b"
EMAIL_RE = r"([a-z0-9]+@[a-z0-9]+\.[a-z]+)"


def mask_one(spark, value, mask_cfg):
    out = run_actions(
        spark,
        [(value,)],
        "field1 string",
        [{"type": "mask", "masks": [mask_cfg]}],
    )
    return out.collect()[0].field1


# (name, input, mask cfg, expected) — rows lifted from
# mask_test.go:36-240 TestMaskFunctions
MASK_VALUE_CASES = [
    ("all digits", "12.34.5678", {"re": r"\d", "groups": [0]}, "**.**.****"),
    ("no match", "ab.cd.efgh", {"re": r"\d", "groups": [0]}, "ab.cd.efgh"),
    ("group 1 only", "-ab-axxb-", {"re": r"a(x*)b", "groups": [1]}, "-ab-a**b-"),
    ("group 0 all", "-ab-axxb-", {"re": r"a(x*)b", "groups": [0]}, "-**-****-"),
    (
        "card number",
        "5408-7430-0756-2004",
        {"re": CARD_RE, "groups": [1, 2, 3, 4]},
        "****-****-****-****",
    ),
    (
        "card groups 1-3",
        "5568-2587-2420-0263",
        {"re": CARD_RE, "groups": [1, 2, 3]},
        "****-****-****-0263",
    ),
    (
        "cyrillic ID",
        "user details: Иванов Иван Иванович",
        {"re": ID_RE, "groups": [0]},
        "user details: ********************",
    ),
    (
        "cyrillic ID max_count",
        "user details: Иванов Иван Иванович",
        {"re": ID_RE, "groups": [0], "max_count": 10},
        "user details: **********",
    ),
    (
        "cyrillic ID replace word",
        "user details: Иванов Иван Иванович",
        {"re": ID_RE, "groups": [0], "replace_word": "***MASKED***"},
        "user details: ***MASKED***",
    ),
    (
        "two card numbers",
        "issued card number 3528-3889-3793-9946 and card number 4035-3005-3980-4083",
        {"re": CARD_RE, "groups": [1, 2, 3, 4]},
        "issued card number ****-****-****-**** and card number ****-****-****-****",
    ),
    (
        "card delim dash partial",
        "card number 3528-3889-3793-9946",
        {"re": CARD_DELIM_RE, "groups": [1, 2, 3]},
        "card number ****-****-****-9946",
    ),
    (
        "card delim space partial",
        "card number 3528 3889 3793 9946",
        {"re": CARD_DELIM_RE, "groups": [1, 2, 3]},
        "card number **** **** **** 9946",
    ),
    (
        "card no delim partial",
        "card number 3528388937939946",
        {"re": CARD_DELIM_RE, "groups": [1, 2, 3]},
        "card number ************9946",
    ),
    (
        "email replace",
        "email login@domain.ru",
        {"re": EMAIL_RE, "groups": [0], "replace_word": "SECMASKED"},
        "email SECMASKED",
    ),
    (
        "email cut",
        "email login@domain.ru",
        {"re": EMAIL_RE, "groups": [0], "cut_values": True},
        "email ",
    ),
    (
        "email with newline replace",
        "email\nnlogin@domain.ru",
        {"re": EMAIL_RE, "groups": [0], "replace_word": "SECMASKED"},
        "email\nSECMASKED",
    ),
    (
        "mask many values",
        "test 1 mask 2 mask 3 mask 4 end",
        {"re": "(mask)", "groups": [1]},
        "test 1 **** 2 **** 3 **** 4 end",
    ),
    (
        "mask many values with limit",
        "test 1 mask 2 mask 3 mask 4 end",
        {"re": "(mask)", "groups": [1], "max_count": 2},
        "test 1 ** 2 ** 3 ** 4 end",
    ),
    (
        "mask many utf8 values",
        "test 1 Петя 2 Петя 3 Петя 4 end",
        {"re": "(Петя)", "groups": [1]},
        "test 1 **** 2 **** 3 **** 4 end",
    ),
    (
        "mask many utf8 values with limit",
        "test 1 Вася 2 Вася 3 Вася 4 end",
        {"re": "(Вася)", "groups": [1], "max_count": 2},
        "test 1 ** 2 ** 3 ** 4 end",
    ),
    (
        "cut many values",
        "test 1 mask 2 mask 3 mask 4 end",
        {"re": "(mask)", "groups": [1], "cut_values": True},
        "test 1  2  3  4 end",
    ),
    (
        "replace many values short word",
        "test 1 mask 2 mask 3 mask 4 end",
        {"re": "(mask)", "groups": [1], "replace_word": "ab"},
        "test 1 ab 2 ab 3 ab 4 end",
    ),
    (
        "replace many values long word",
        "test 1 mask 2 mask 3 mask 4 end",
        {"re": "(mask)", "groups": [1], "replace_word": "qwerty"},
        "test 1 qwerty 2 qwerty 3 qwerty 4 end",
    ),
]


def test_mask_value_golden(spark):
    rows = [(case[1],) for case in MASK_VALUE_CASES]
    # run all single-mask cases in one job per distinct mask config
    for name, value, cfg, expected in MASK_VALUE_CASES:
        got = mask_one(spark, value, cfg)
        assert got == expected, name


def test_mask_invalid_configs(spark):
    with pytest.raises(Exception):
        mask_one(spark, "x", {"re": r"\d", "groups": [0], "max_count": 1, "replace_word": "w"})
    with pytest.raises(Exception):
        mask_one(spark, "x", {"re": r"\d", "groups": [0], "replace_word": "w", "cut_values": True})
    with pytest.raises(Exception):
        mask_one(spark, "x", {"re": r"(a)(b)", "groups": [1, 1]})
    with pytest.raises(Exception):
        mask_one(spark, "x", {"re": r"(a)", "groups": [2]})
    with pytest.raises(Exception):
        mask_one(spark, "x", {})  # neither regex nor rules


def test_mask_applied_field_plugin_level(spark):
    """mask_test.go TestMaskAddExtraField: plugin-level
    mask_applied_field is set when any mask fired."""
    out = run_actions(
        spark,
        [("5568-2587-2420-0263",), ("no digits here",)],
        "field1 string",
        [
            {
                "type": "mask",
                "masks": [{"re": CARD_RE, "groups": [1, 2, 3, 4]}],
                "mask_applied_field": "mask_field",
                "mask_applied_value": "mask_value",
            }
        ],
    )
    rows = {r.field1: r.mask_field for r in out.collect()}
    assert rows["****-****-****-****"] == "mask_value"
    assert rows["no digits here"] is None


def test_mask_empty_regex_match_rules(spark):
    """mask_test.go TestWithEmptyRegex: a rule-only mask marks the
    event without rewriting; the card mask still rewrites."""
    out = run_actions(
        spark,
        [
            ("Индивидуальный предприниматель Иванов Иван Иванович",),
            ("просто текст",),
        ],
        "field1 string",
        [
            {
                "type": "mask",
                "masks": [
                    {
                        "match_rules": [
                            {
                                "rules": [
                                    {
                                        "values": ["Индивидуальный предприниматель"],
                                        "mode": "contains",
                                    }
                                ]
                            }
                        ],
                        "applied_field": "access_token_leaked",
                        "applied_value": "personal_data_leak",
                    },
                    {"re": CARD_RE, "groups": [1, 2, 3, 4]},
                ],
            }
        ],
    )
    rows = {r.field1: r.access_token_leaked for r in out.collect()}
    assert (
        rows["Индивидуальный предприниматель Иванов Иван Иванович"]
        == "personal_data_leak"
    )
    assert rows["просто текст"] is None


def test_mask_complex_rulesets(spark):
    """mask_test.go TestPluginWithComplexMasks case 1: AND ruleset of
    case-insensitive prefix+suffix gating a replace mask with a
    per-mask applied_field."""
    inputs = [
        "prefix1 to_mask suffix1",
        "1prefix to_mask 1suffix",
        "prefix1 test suffix1",
        "prefix2 to_mask suffix2",
    ]
    out = run_actions(
        spark,
        [(v,) for v in inputs],
        "field1 string",
        [
            {
                "type": "mask",
                "masks": [
                    {
                        "match_rules": [
                            {
                                "cond": "and",
                                "rules": [
                                    {
                                        "values": ["prefix1", "1prefix"],
                                        "mode": "prefix",
                                        "case_insensitive": True,
                                    },
                                    {
                                        "values": ["suffix1", "1suffix"],
                                        "mode": "suffix",
                                        "case_insensitive": True,
                                    },
                                ],
                            }
                        ],
                        "re": r"(to\_mask)",
                        "groups": [0],
                        "replace_word": "REPLACED",
                        "applied_field": "mask_field",
                        "applied_value": "mask_value",
                    }
                ],
            }
        ],
    )
    got = {r.field1: r.mask_field for r in out.collect()}
    assert got == {
        "prefix1 REPLACED suffix1": "mask_value",
        "1prefix REPLACED 1suffix": "mask_value",
        "prefix1 test suffix1": None,
        "prefix2 to_mask suffix2": None,
    }


THREE = "f1 string, f2 string, f3 string"


def test_mask_global_ignore_fields(spark):
    """mask_test.go TestIgnoreProcessFields
    global_ignore_fields_flat_single_mask_ok."""
    out = run_actions(
        spark,
        [
            ("some test val", "another test val", "more test val"),
            ("some val", "another val", "more val"),
            ("some test val test more tests", "another test val", "more test val"),
        ],
        THREE,
        [
            {
                "type": "mask",
                "ignore_fields": ["f3"],
                "masks": [{"re": "(test)", "groups": [0], "replace_word": "REPLACED"}],
            }
        ],
    )
    rows = [(r.f1, r.f2, r.f3) for r in out.collect()]
    assert sorted(rows) == sorted(
        [
            ("some REPLACED val", "another REPLACED val", "more test val"),
            ("some val", "another val", "more val"),
            (
                "some REPLACED val REPLACED more REPLACEDs",
                "another REPLACED val",
                "more test val",
            ),
        ]
    )


def test_mask_global_process_fields(spark):
    out = run_actions(
        spark,
        [
            ("some test val", "another test val", "more test val"),
            (
                "some test val test more tests",
                "another test val",
                "more test val test testtest atestb",
            ),
        ],
        THREE,
        [
            {
                "type": "mask",
                "process_fields": ["f3"],
                "masks": [{"re": "(test)", "groups": [0], "replace_word": "REPLACED"}],
            }
        ],
    )
    rows = [(r.f1, r.f2, r.f3) for r in out.collect()]
    assert sorted(rows) == sorted(
        [
            ("some test val", "another test val", "more REPLACED val"),
            (
                "some test val test more tests",
                "another test val",
                "more REPLACED val REPLACED REPLACEDREPLACED aREPLACEDb",
            ),
        ]
    )


def test_mask_multi_mask_chain_order(spark):
    """global_ignore_fields_flat_multi_mask_ok: masks chain in order
    on the evolving value."""
    out = run_actions(
        spark,
        [
            (
                "some test tst tesst val",
                "another tesst tst test val",
                "more test val",
            )
        ],
        THREE,
        [
            {
                "type": "mask",
                "ignore_fields": ["f3"],
                "masks": [
                    {"re": "(test)", "groups": [0], "replace_word": "REPLACED1"},
                    {"re": "(tst)", "groups": [0], "replace_word": "REPLACED2"},
                    {"re": "(tesst)", "groups": [0], "replace_word": "REPLACED3"},
                ],
            }
        ],
    )
    r = out.collect()[0]
    assert r.f1 == "some REPLACED1 REPLACED2 REPLACED3 val"
    assert r.f2 == "another REPLACED3 REPLACED2 REPLACED1 val"
    assert r.f3 == "more test val"


def test_mask_per_mask_ignore_fields(spark):
    """inmask_ignore_fields_flat_two_mask_ok: the first mask skips f3,
    the second (no list) masks everywhere."""
    out = run_actions(
        spark,
        [("some test tst tesst val", "another tesst tst test val", "more test val tst")],
        THREE,
        [
            {
                "type": "mask",
                "masks": [
                    {
                        "re": "(test)",
                        "groups": [0],
                        "replace_word": "REPLACED1",
                        "ignore_fields": ["f3"],
                    },
                    {"re": "(tst)", "groups": [0], "replace_word": "REPLACED2"},
                ],
            }
        ],
    )
    r = out.collect()[0]
    assert r.f1 == "some REPLACED1 REPLACED2 tesst val"
    assert r.f2 == "another tesst REPLACED2 REPLACED1 val"
    assert r.f3 == "more test val REPLACED2"
