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

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    Buckets preserve cosine locality (SimHash for dense vectors).

    Arrow-batched Pandas UDF: the n_planes dot products are ONE numpy
    matmul per batch. The equivalent native expression (n_planes ×
    64-element ``aggregate`` folds) blows past codegen limits and falls
    back to interpreted evaluation — measured ~10× slower than this
    vectorized path; per-row Python would be ~100× slower still.
    """
    P = np.asarray(planes, dtype=np.float64).T  # dim × n_planes
    weights = (1 << np.arange(P.shape[1])).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def _sig(vs: pd.Series) -> pd.Series:
        M = np.asarray(vs.tolist(), dtype=np.float64)  # batch × dim
        bits = (M @ P) >= 0.0
        return pd.Series(bits @ weights)

    return _sig(v)
