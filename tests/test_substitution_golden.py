r"""Golden pairs for substitution templates, mirroring
/root/reference/cfg/substitution/substitution_test.go TestFilterApply
(filter semantics, byte for byte) and TestParseSubstitution's escape
rows.  The reference's backtick test strings mean `\\n` in a filter
arg is backslash+backslash+n, JSON-unescaping to the two-character
cutset {\, n} — the same path the repo's json.loads takes."""

from tests.test_actions import run_actions


def render(spark, data, template):
    out = run_actions(
        spark,
        [(data,)],
        "field string",
        [{"type": "modify", "result": template}],
    )
    return out.collect()[0].result


FILTER_CASES = [
    (
        "ok_single_re_filter",
        r'${field|re("(re\d)",-1,[1],"|")}',
        "this is some text re1 end",
        "re1",
    ),
    (
        "ok_two_re_filters",
        r'${field|re("(.*)",-1,[1],"|")|re("(\d\.)",-1,[1],"|")}',
        "1.2.3.4.5.",
        "1.|2.|3.|4.|5.",
    ),
    (
        "ok_single_re_filter_2",
        r'${field|re("(re\d)",2,[1],"|")}',
        "this is some text re1 re2 re3 re4 end",
        "re1|re2",
    ),
    (
        "ok_re_filter_empty_on_not_matched_false",
        r'${field|re("(re\d)",1,[1],"|")}',
        "this is some text",
        "this is some text",
    ),
    (
        "ok_re_filter_empty_on_not_matched_true",
        r'${field|re("(re\d)",1,[1],"|",true)}',
        "this is some text",
        "",
    ),
    (
        "ok_single_trim_filter_trim_all",
        r'${field|trim("all","\\n")}',
        r'\n{"message":"test"}\n',
        r'{"message":"test"}',
    ),
    (
        "ok_single_trim_filter_trim_left",
        r'${field|trim("left","\\n")}',
        r'\n{"message":"test"}\n',
        r'{"message":"test"}\n',
    ),
    (
        "ok_single_trim_filter_trim_right",
        r'${field|trim("right","\\n")}',
        r'\n{"message":"test"}\n',
        r'\n{"message":"test"}',
    ),
    (
        "ok_single_trim_to_filter_trim_all",
        r'${field|trim_to("all","\"")}',
        'some data "quoted" some another data',
        '"quoted"',
    ),
    (
        "ok_two_trim_to_filters",
        r'${field|trim_to("left","{")|trim_to("right","}")}',
        'some data {"message":"test"} some data',
        '{"message":"test"}',
    ),
    (
        "ok_single_cut_filter_cut_first",
        r'${field|cut("first",10)}',
        "some looooooooong data",
        "some loooo",
    ),
    (
        "ok_single_cut_filter_cut_last",
        r'${field|cut("last",10)}',
        "some looooooooong data",
        "ooong data",
    ),
    (
        "ok_two_cut_filters",
        r'${field|cut("first",17)|cut("last",12)}',
        "some looooooooong data",
        "looooooooong",
    ),
    (
        "ok_two_cut_filters_small_data",
        r'${field|cut("first",10)|cut("last",10)}',
        "some data",
        "some data",
    ),
]


def test_filter_apply_golden(spark):
    for name, template, data, want in FILTER_CASES:
        got = render(spark, data, template)
        assert got == want, f"{name}: {got!r} != {want!r}"


def test_template_literals_and_escapes(spark):
    cases = [
        ("just value", "just value"),
        ("days till world end ${field}. so what?", "days till world end 42. so what?"),
        ("days till world end $$100", "days till world end $100"),
        ("days till world end $100", "days till world end $100"),
        ("days till world end $100$", "days till world end $100$"),
        ("$", "$"),
        ("", ""),
    ]
    for template, want in cases:
        got = render(spark, "42", template)
        assert got == want, f"{template!r}: {got!r} != {want!r}"
