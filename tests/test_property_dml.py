"""Property tests (hypothesis): copy-on-write UPDATE/DELETE semantics
against a pure-Python reference model over randomized tables, ranges and
SET expressions — and the Z-curve interleave's structural invariants.

The DML reference model is deliberately trivial: apply the predicate to
an in-memory list of rows. Everything the table adds (bucketing, file
pruning, manifest commits, schema resolution) must be invisible in the
final row set — including the NULL contract (a range predicate never
matches NULL, so NULL rows always survive a DELETE and pass through an
UPDATE unchanged).
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hydra_spark.tables import TransactionalTable

ROWS = st.lists(
    st.tuples(st.integers(0, 999), st.one_of(st.none(), st.integers(-50, 50))),
    min_size=3,
    max_size=20,
    unique_by=lambda r: r[0],
)
BOUND = st.integers(-60, 60)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@pytest.fixture(scope="module")
def _tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("prop_dml")


_counter = [0]


@given(rows=ROWS, a=BOUND, b=BOUND, delta=st.integers(-20, 20))
@settings(**_SETTINGS)
def test_update_then_delete_matches_model(spark, _tmp_root, rows, a, b, delta):
    lo, hi = min(a, b), max(a, b)
    _counter[0] += 1
    t = TransactionalTable(str(_tmp_root / f"t{_counter[0]}"), ["k"], n_buckets=2)
    df = spark.createDataFrame(rows, "k int, v int")
    t.append_dedup(spark, df, "g0")

    # UPDATE v = v + delta WHERE v BETWEEN lo AND hi
    t.update_where(spark, {"v": (lo, hi)}, {"v": F.col("v") + F.lit(delta)})
    model = [
        (k, v + delta if v is not None and lo <= v <= hi else v) for k, v in rows
    ]
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == sorted(model)

    # DELETE WHERE v BETWEEN lo AND hi (over the post-update state)
    t.delete_where(spark, {"v": (lo, hi)})
    survivors = [(k, v) for k, v in model if v is None or not lo <= v <= hi]
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == sorted(survivors)


def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for j in range(bits):
        out |= ((a >> j) & 1) << (2 * j)
        out |= ((b >> j) & 1) << (2 * j + 1)
    return out


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
        min_size=2,
        max_size=50,
        unique=True,
    )
)
@settings(max_examples=50, deadline=None)
def test_morton_reference_invariants(pairs):
    """Bijectivity (distinct pairs -> distinct keys) and per-axis
    monotonicity with the other axis held fixed — the two properties
    that make Z-ordered file ranges prunable on every axis."""
    zs = [_morton_ref(a, b) for a, b in pairs]
    assert len(set(zs)) == len(pairs)
    for i in range(len(pairs)):
        for j in range(len(pairs)):
            (a1, b1), (a2, b2) = pairs[i], pairs[j]
            if b1 == b2 and a1 < a2:
                assert zs[i] < zs[j]
            if a1 == a2 and b1 < b2:
                assert zs[i] < zs[j]
