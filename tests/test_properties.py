"""Hypothesis property tests for the engine's core invariants
(SURVEY.md §5.3), over generated key/value tables:

- upsert: idempotent fixpoint; result keys = base ∪ new keys; every
  incoming key carries the incoming value.
- keep-first dedup: survivor set = distinct keys; survivors are drawn
  from the input; deduping twice = deduping once.
- reject routing: accept ⊎ reject is a partition of the input.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.operators.dedupe import keep_first
from prueba_tecnica_analista_etl_spark.operators.quality import (
    split_rejects,
)
from prueba_tecnica_analista_etl_spark.operators.upsert import upsert

KV = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=0,
    max_size=30,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)],
        "k long, v long, pos long",
    )


@given(base=KV, new=KV)
@SLOW
def test_upsert_invariants(spark, base, new):
    base_df = keep_first(_df(spark, base), ["k"], [F.asc("pos")]).drop("pos")
    new_df = _df(spark, new)
    new_first = keep_first(new_df, ["k"], [F.asc("pos")]).drop("pos")
    out = upsert(base_df, new_first, ["k"])

    got = {r["k"]: r["v"] for r in out.collect()}
    base_map = {r["k"]: r["v"] for r in base_df.collect()}
    expected = dict(base_map)
    first_per_key: dict[int, int] = {}
    for k, v in new:
        first_per_key.setdefault(k, v)
    expected.update(first_per_key)
    assert got == expected

    # idempotent fixpoint
    again = upsert(out, new_first, ["k"])
    assert {r["k"]: r["v"] for r in again.collect()} == got


@given(rows=KV)
@SLOW
def test_keep_first_invariants(spark, rows):
    df = _df(spark, rows)
    out = keep_first(df, ["k"], [F.asc("pos")])
    got = {r["k"]: (r["v"], r["pos"]) for r in out.collect()}
    expected: dict[int, tuple[int, int]] = {}
    for i, (k, v) in enumerate(rows):
        expected.setdefault(k, (v, i))
    assert got == expected
    # dedup is idempotent
    out2 = keep_first(out, ["k"], [F.asc("pos")])
    assert sorted(map(tuple, out2.collect())) == sorted(
        map(tuple, out.collect())
    )


@given(rows=KV)
@SLOW
def test_split_rejects_partition(spark, rows):
    df = _df(spark, rows)
    acc, rej = split_rejects(
        df, {"neg": F.col("v") < 0, "big_key": F.col("k") > 15}
    )
    assert acc.count() + rej.count() == df.count()
    back = acc.unionByName(rej.drop("reject_reason"))
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


LEFTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # key
        st.integers(min_value=0, max_value=30),  # time
    ),
    min_size=0,
    max_size=15,
)
RIGHTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=0,
    max_size=15,
)


@given(lefts=LEFTS, rights=RIGHTS)
@SLOW
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """Property: the sort-based as-of equals the brute-force definition
    'latest right at-or-before, ties by max rid' on arbitrary inputs —
    including empty sides, all-tied timestamps, single-key pileups."""
    from prueba_tecnica_analista_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)],
        "lid long, k long, t long",
    )
    right = spark.createDataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(rights)],
        "k long, t long, rid long",
    )
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            left, right, ["k"], "t", "t", ["rid"], "rid"
        ).collect()
    }
    want = {}
    for i, (lk, lt) in enumerate(lefts):
        best = None
        for j, (rk, rt) in enumerate(rights):
            if rk == lk and rt <= lt:
                cand = (rt, 100 + j)
                if best is None or cand > best:
                    best = cand
        want[i] = best[1] if best else None
    assert got == want


@given(big=KV, small=KV)
@settings(
    max_examples=6,  # 4 join types × 2 collects per example
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_salted_join_matches_plain(spark, big, small):
    """Property: salted_join == plain join for every supported type on
    arbitrary (skew-free and skewed alike) inputs."""
    from prueba_tecnica_analista_etl_spark.operators.salt import (
        salted_join,
    )

    b = _df(spark, big)
    s = keep_first(_df(spark, small), ["k"], [F.asc("pos")]).select(
        "k", F.col("v").alias("w")
    )
    for how in ("inner", "left", "left_semi", "left_anti"):
        want = sorted(
            tuple(r) for r in b.join(s, on=["k"], how=how).collect()
        )
        got = sorted(
            tuple(r)
            for r in salted_join(b, s, ["k"], how=how, n_salts=4).collect()
        )
        assert got == want, how
