"""Property-based tests (hypothesis) for the pure-Python compile layer:
selector parsing, substitution template splitting, duration parsing."""

from hypothesis import given, settings
from hypothesis import strategies as st

from file_d_spark.fields import join_selector, parse_selector
from file_d_spark.substitution import parse_template, _Ref

part = st.text(
    alphabet=st.characters(blacklist_characters="\\", blacklist_categories=("Cs",)),
    min_size=1,
    max_size=8,
)


@given(st.lists(part, min_size=1, max_size=5))
@settings(max_examples=200)
def test_selector_roundtrip(parts):
    assert parse_selector(join_selector(parts)) == parts


@given(
    st.text(
        alphabet=st.characters(blacklist_characters="$\\{}|", blacklist_categories=("Cs",)),
        max_size=30,
    )
)
@settings(max_examples=100)
def test_template_literal_passthrough(text):
    """Templates with no ${} are a single literal chunk."""
    parsed = parse_template(text)
    assert parsed == ([text] if text else [])


ref_name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_."),
    min_size=1,
    max_size=8,
)
literal = st.text(
    alphabet=st.characters(
        blacklist_characters="${}|\\", blacklist_categories=("Cs",)
    ),
    min_size=1,
    max_size=10,
)


@given(st.lists(st.tuples(st.booleans(), st.one_of(ref_name, literal)), min_size=1, max_size=6))
@settings(max_examples=100)
def test_template_mixed_chunks(chunks):
    """Literal/ref interleavings parse back to the same sequence."""
    template = "".join(
        ("${" + p + "}")
        if is_ref and all(ch.isalnum() or ch in "_." for ch in p)
        else "".join(ch for ch in p if ch not in "${}|\\")
        for is_ref, p in chunks
    )
    parsed = parse_template(template)
    rebuilt = "".join(
        ("${" + c.selector + "}") if isinstance(c, _Ref) else c for c in parsed
    )
    assert rebuilt == template


def test_duration_parsing():
    from file_d_spark.actions.throttle import _parse_duration_seconds

    assert _parse_duration_seconds("1m", 0) == 60
    assert _parse_duration_seconds("1.5h", 0) == 5400
    assert _parse_duration_seconds("250ms", 0) == 0.25
    assert _parse_duration_seconds(30, 0) == 30
    assert _parse_duration_seconds(None, 42) == 42
    assert _parse_duration_seconds("junk-", 7) == 7
