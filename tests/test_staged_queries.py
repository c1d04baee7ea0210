"""Round-8 staged query/oracle pairs (file_d_spark/queries_staged.py)
validated the same way the driver will validate them once registered:
Spark result vs DuckDB oracle on the shared parquet, column-sorted,
value-compared.  Keeping this green means registration day is a
bookkeeping change, not an integration risk."""

import pytest

from file_d_spark.queries_staged import STAGED
from tests.util import assert_frames_match


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_pair_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = STAGED[name]
    got = fn(spark, sf_dir)
    want = duck.execute(sql).df()
    assert_frames_match(got, want)
    assert got.count() > 0


def test_staged_names_not_yet_registered():
    """A staged name colliding with a live registration would shadow
    the verified query on registration day."""
    from file_d_spark.queries import QUERIES

    assert not (set(STAGED) & set(QUERIES))
