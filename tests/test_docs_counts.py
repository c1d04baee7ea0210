"""Keep README.md / COVERAGE.md query counts honest: the claimed
totals must be derived from the live registry, never hand-edited
numbers that drift (r3 postmortem: docs said 70/69 while the registry
held 71/70)."""

import re

from file_d_spark.queries import ORACLES, QUERIES


def test_registry_shape():
    # every oracle belongs to a registered query; since round 5 every
    # query is oracle-paired (kitchen_sink_actions joined via pinned
    # clock + hostname literal + distinct-hash-count observable)
    assert set(ORACLES) <= set(QUERIES)
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == set()


def test_coverage_md_totals_match_registry():
    text = open("COVERAGE.md").read()
    m = re.search(
        r"\*\*(\d+) queries — (\d+) oracle-paired, (\d+) rows-only\*\*",
        text,
    )
    assert m, "COVERAGE.md totals line missing or reformatted"
    assert int(m.group(1)) == len(QUERIES)
    assert int(m.group(2)) == len(ORACLES)
    assert int(m.group(3)) == len(QUERIES) - len(ORACLES)


def test_readme_totals_match_registry():
    text = open("README.md").read()
    m = re.search(
        r"across all (\d+) declared\s+queries \((\d+) DuckDB-hash-matched",
        text,
    )
    assert m, "README.md oracle-count line missing or reformatted"
    assert int(m.group(1)) == len(QUERIES)
    assert int(m.group(2)) == len(ORACLES)
    m = re.search(r"DuckDB oracle \((\d+) of\s+(\d+);", text)
    assert m, "README.md coverage-section count missing"
    assert int(m.group(1)) == len(ORACLES)
    assert int(m.group(2)) == len(QUERIES)
