"""Vector/similarity builders over ``array<float>`` embedding columns
(north-star extension: similarity search for training-data pipelines).

Everything computes in DOUBLE with sequential fold order so results are
bit-identical to a straightforward loop (and to DuckDB's
``list_dot_product`` on DOUBLE[]) — which is what makes the cosine
queries oracle-checkable at 4dp.

Scale path: brute-force top-k is one broadcast + one pass (fine for one
query vector over any corpus size); for all-pairs / many-query ANN use
the LSH bucketing in ``plans/extensions_scale.py`` which turns O(n²)
into per-bucket work.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (index order, double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def random_hyperplanes(
    n_planes: int, dim: int, seed: int = 42
) -> list[list[float]]:
    """Deterministic ±1 hyperplanes for sign-LSH (seeded PRNG — stable
    across runs/engines; no Date/now dependence)."""
    rng = random.Random(seed)
    return [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        for _ in range(n_planes)
    ]


def sign_bits(v: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH signature: one bit per hyperplane packed into a long.
    Buckets preserve cosine locality (SimHash for dense vectors)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(v, p) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig + (bit.cast("long") * F.lit(2**i).cast("long"))
    return sig
