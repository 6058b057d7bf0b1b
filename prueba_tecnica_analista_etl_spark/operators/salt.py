"""Explicit key-salting for skewed joins (SCALE.md §2 joins note).

AQE's skew-join split handles most skew at runtime, but it only works
for sort-merge joins after a shuffle materializes; salting is the
static fallback when AQE can't apply (e.g. the skewed side feeds a
stateful op, or the planner picked a path AQE won't rewrite). The
trade: the small side is replicated ``n_salts``× (explode), the big
side's hottest key splits across ``n_salts`` reducers.

The salt is DERIVED (hash of the big side's whole row, mod n_salts),
not ``rand()``: reproducible plans, and no RNG nondeterminism under
task retries — a retried task must salt each row identically or rows
silently drop/duplicate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join with the big (skewed) side salted into ``n_salts``
    sub-keys and the small side replicated across all salts. Result is
    row-identical to ``big.join(small, on, how)`` (property-tested);
    the hot key's rows now spread over ``n_salts`` reducers instead of
    one straggler.

    ``how`` supports the outer-preserving-big variants ('inner',
    'left', 'left_semi', 'left_anti') — salting the preserved side of
    a right/full outer would duplicate unmatched small rows.
    """
    assert how in ("inner", "left", "left_semi", "left_anti")
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(
            f"salted_join reserved column {_SALT} already present in an "
            "input; rename it before salting"
        )
    key_list = list(on)
    # Salt from a row hash so one hot key's rows spread across salts.
    # MapType columns are unhashable (F.hash rejects them) — exclude
    # them; if nothing hashable remains, fall back to a row-id mod.
    from pyspark.sql import types as T

    hashable = [
        f.name
        for f in big.schema.fields
        if not isinstance(f.dataType, T.MapType)
    ]
    salt = (
        F.pmod(F.hash(*[F.col(c) for c in hashable]), F.lit(n_salts))
        if hashable
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    b = big.withColumn(_SALT, salt)
    s = small.withColumn(
        _SALT,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    joined = b.join(s, on=key_list + [_SALT], how=how)
    return joined.drop(_SALT)
