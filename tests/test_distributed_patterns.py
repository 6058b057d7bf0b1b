"""Semantics + plan-shape tests for plans/extensions_distributed.py —
the round-8 distributed-algebra patterns. Oracle parity is covered
registry-wide by test_oracle_parity; these pin the SCALE claims the
docstrings make (no SinglePartition rank, prefilter soundness,
merge == recompute under arbitrary splits, funnel monotonicity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.plans.extensions_distributed import (
    _BLOOM_BITS,
    q_bloom_semi_join,
    q_filter_funnel,
    q_global_rank,
    q_incremental_agg_merge,
    q_winsorize,
)
from prueba_tecnica_analista_etl_spark.plans.queries import _t, dec2


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_global_rank_has_no_single_partition_window(spark, sf_dir):
    """The whole point: global RANK() without funneling fact rows
    through one reducer. The window must partition by bucket, the
    offsets ride the plan as a dense array LITERAL (r15: element_at
    projection — no offsets createDataFrame, no broadcast join on the
    fact path), and no exchange beyond the bucket hash exchange."""
    df = q_global_rank(spark, sf_dir)
    plan = _plan(df)
    assert "windowspecdefinition(__rank_bucket" in plan
    assert "Exchange SinglePartition" not in plan
    assert "element_at" in plan  # literal offset lookup
    assert "BroadcastExchange" not in plan  # the join form is gone


def test_global_rank_matches_window_rank(spark, sf_dir):
    """Bucketed rank == the single-window rank Spark itself computes
    (independent of the DuckDB oracle): ties across the bucket seam
    would break equality, so this pins the same-value-same-bucket
    invariant."""
    got = {
        r["event_id"]: r["global_rank"]
        for r in q_global_rank(spark, sf_dir).collect()
    }
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    want = {
        r["event_id"]: r["rank"]
        for r in ev.select(
            "event_id",
            F.rank().over(Window.orderBy("value")).alias("rank"),
        ).collect()
    }
    assert got == want


def test_bucketed_rank_on_adversarial_distributions(spark):
    """The operator itself on the seams the queries can't hit: all
    rows tied (every rank 1), one row, heavy duplication across a
    tiny grid, and a degenerate lo==hi range — each compared to the
    single-window truth computed on the same frame."""
    from pyspark.sql import Window

    from prueba_tecnica_analista_etl_spark.operators.rank import (
        bucketed_rank,
        numeric_bucket,
    )

    cases = [
        [5.0] * 40,                      # all tied
        [1.0],                           # single row
        [float(i % 3) for i in range(50)],  # 3 distinct over any grid
        [float(i) for i in range(20)],   # strictly increasing
        [(-1.0) ** i * i * 0.7 for i in range(30)],  # negatives + zero
    ]
    for i, values in enumerate(cases):
        df = spark.createDataFrame(
            [(j, v) for j, v in enumerate(values)], "id long, v double"
        )
        lo, hi = min(values), max(values)
        for n_buckets in (1, 4, 16):
            got = {
                r["id"]: r["global_rank"]
                for r in bucketed_rank(
                    df, numeric_bucket(F.col("v"), lo, hi, n_buckets),
                    ["v"], method="rank",
                ).collect()
            }
            want = {
                r["id"]: r["rank"]
                for r in df.select(
                    "id", F.rank().over(Window.orderBy("v")).alias("rank")
                ).collect()
            }
            assert got == want, f"case {i} buckets {n_buckets}"


def test_train_order_is_a_permutation_without_single_partition(spark, sf_dir):
    """Positions are exactly 1..n (ROW_NUMBER semantics survive the
    bucket seam) and the plan never funnels the corpus through one
    reducer; rerunning yields the identical order (seeded shuffle)."""
    from prueba_tecnica_analista_etl_spark.plans.extensions_distributed import (
        q_train_order,
    )

    df = q_train_order(spark, sf_dir)
    plan = _plan(df)
    assert "Exchange SinglePartition" not in plan
    rows = df.collect()
    positions = sorted(r["position"] for r in rows)
    assert positions == list(range(1, len(rows) + 1))
    again = {r["doc_id"]: r["position"]
             for r in q_train_order(spark, sf_dir).collect()}
    assert again == {r["doc_id"]: r["position"] for r in rows}


def test_incremental_merge_equals_recompute_for_any_split(spark, sf_dir):
    """merge(state(before), state(after)) == state(all) for several
    split points, including degenerate ones (all data in one leg) —
    the property that makes delta refresh sound."""
    ev = _t(spark, sf_dir, "events")

    def full():
        return {
            r["user_id"]: (r["n"], r["tot"], r["mn"], r["mx"])
            for r in ev.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum(dec2(F.col("value"))).cast("double").alias("tot"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
            )
            .collect()
        }

    import prueba_tecnica_analista_etl_spark.plans.extensions_distributed as xd

    want = full()
    for split in ("2024-01-01 00:00:00", "2024-01-15 12:00:00",
                  "2031-01-01 00:00:00"):
        old = xd._SPLIT_TS
        xd._SPLIT_TS = split
        try:
            got = {
                r["user_id"]: (
                    r["n_events"], r["total_value"],
                    r["min_value"], r["max_value"],
                )
                for r in q_incremental_agg_merge(spark, sf_dir).collect()
            }
        finally:
            xd._SPLIT_TS = old
        assert got == want, f"merge != recompute at split {split}"


def test_bloom_prefilter_is_sound_and_selective(spark, sf_dir):
    """No false negatives by construction (same hash both sides) and
    the bitset actually drops most non-matching fact rows: with the
    BUILDING segment ~1/5 of customers, the pass-through fraction must
    sit well under 1 (false-positive rate ≤ load factor of the
    bitset). Soundness is already proven by oracle parity; this pins
    SELECTIVITY — the property that makes the prefilter worth its
    cost at 100 TB."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    buckets = [
        r[0]
        for r in cust.select(
            F.pmod(F.xxhash64(F.col("c_custkey")), F.lit(_BLOOM_BITS))
            .alias("b")
        ).distinct().collect()
    ]
    load = len(buckets) / _BLOOM_BITS
    orders = _t(spark, sf_dir, "orders")
    total = orders.count()
    kept = orders.filter(
        F.pmod(F.xxhash64(F.col("o_custkey")), F.lit(_BLOOM_BITS)).isin(
            buckets
        )
    ).count()
    true_matches = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    ).count()
    assert kept >= true_matches  # soundness: nothing true was dropped
    # Selectivity: pass-through ≤ true fraction + bitset load factor
    # (+small slack) — i.e. the filter is doing real work.
    assert kept / total <= true_matches / total + load + 0.05


def test_bloom_semi_join_plan_filters_before_join(spark, sf_dir):
    """The bitset test must appear as a Filter below the broadcast
    semi-join (map-side, pre-shuffle), not above it."""
    plan = _plan(q_bloom_semi_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    jpos = plan.index("LeftSemi")
    fpos = plan.index("getbit")
    assert fpos > jpos  # executedPlan prints top-down: filter deeper


def test_bucketed_rank_rejects_null_keys(spark):
    """A NULL sort key has no defined place in the order (engines
    disagree: Spark NULLS FIRST, DuckDB NULLS LAST) and the offset
    join would silently DROP the row — the operator must stop with an
    actionable error instead."""
    import pytest

    from prueba_tecnica_analista_etl_spark.operators.rank import (
        bucketed_rank,
        md5_prefix_bucket,
        numeric_bucket,
    )

    with_null = spark.createDataFrame(
        [(1, 2.0), (2, None), (3, 5.0)], "id long, v double"
    )
    with pytest.raises(ValueError, match="NULL"):
        bucketed_rank(
            with_null, numeric_bucket(F.col("v"), 2.0, 5.0, 4), ["v"]
        ).collect()
    docs = spark.createDataFrame([("a",), (None,)], "doc_id string")
    bucket, key = md5_prefix_bucket(F.col("doc_id"))
    with pytest.raises(ValueError, match="NULL"):
        bucketed_rank(
            docs.withColumn("k", key), bucket, ["k"], method="row_number"
        ).collect()


def test_bitset_prefilter_kills_null_keys_map_side(spark):
    """The docstring's equi-join-parity claim for NULL keys must hold
    at the PREFILTER, not only after the exact join: a bare
    xxhash64(NULL) is the seed constant, which would let every
    NULL-key fact row through whenever the dim occupies that bucket —
    guaranteed when the dim itself has a NULL key."""
    from prueba_tecnica_analista_etl_spark.operators.bloom import (
        bitset_prefilter,
        bitset_words,
    )

    fact = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "id long, k string"
    )
    dim = spark.createDataFrame([("a",), (None,)], "dk string")
    words = bitset_words(dim, "dk", bits=64)
    kept = bitset_prefilter(fact, "k", words, bits=64).collect()
    assert all(r["k"] is not None for r in kept)
    assert {r["id"] for r in kept} >= {1}  # true match always survives


def test_bitset_semi_join_equals_plain_semi_join(spark):
    """Operator-level property: identical rows to the plain semi-join
    on frames with NULL keys, non-matching keys and an empty dim."""
    from prueba_tecnica_analista_etl_spark.operators.bloom import (
        bitset_semi_join,
    )

    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "c"), (5, "a"), (6, "z")],
        "id long, k string",
    )
    for dim_rows in ([("a",), ("c",), (None,)], []):
        dim = spark.createDataFrame(dim_rows, "dk string")
        got = sorted(
            r["id"]
            for r in bitset_semi_join(fact, dim, "k", "dk", bits=64)
            .collect()
        )
        want = sorted(
            r["id"]
            for r in fact.join(
                dim, fact["k"] == dim["dk"], "left_semi"
            ).collect()
        )
        assert got == want, f"dim={dim_rows}"


def test_winsorize_clamps_within_cuts(spark, sf_dir):
    """Every group's cut pair is ordered and the winsorized sum lies
    between n*lo and n*hi — the invariant that survives any data."""
    for r in q_winsorize(spark, sf_dir).collect():
        assert r["lo_cut"] <= r["hi_cut"]
        n, s = r["n_events"], r["winsorized_sum"]
        assert n * r["lo_cut"] - 1e-6 <= s <= n * r["hi_cut"] + 1e-6


def test_winsorize_integer_ranks_on_tiny_groups(spark):
    """n=1 and n=20 edge cases of the integer rank arithmetic:
    ceil(n/20) and ceil(19n/20) via (n+19) div 20 / (19n+19) div 20."""
    for n, lo, hi in [(1, 1, 1), (19, 1, 19), (20, 1, 19), (21, 2, 20),
                      (40, 2, 38)]:
        assert (n + 19) // 20 == -(-n // 20) == lo
        assert (19 * n + 19) // 20 == -(-19 * n // 20) == hi


def test_inverted_index_caps_postings_via_window_group_limit(spark, sf_dir):
    """The skew guard is structural: the rank filter must compile to
    WindowGroupLimit (bounded per-term state during the sort), and no
    emitted posting list may exceed the cap even when df does."""
    from prueba_tecnica_analista_etl_spark.plans.extensions_distributed import (
        _POSTINGS_CAP,
        q_inverted_index,
    )

    df = q_inverted_index(spark, sf_dir)
    assert "WindowGroupLimit" in _plan(df)
    for r in df.collect():
        # postings serialize to a canonical comma-joined string (the
        # recorded window hashes only driver-proven scalar dtypes)
        ids = [int(x) for x in r["postings"].split(",")]
        assert 1 <= len(ids) <= _POSTINGS_CAP
        assert ids == sorted(ids)
        assert r["df"] >= len(ids)


def test_filter_funnel_is_monotone_and_single_scan(spark, sf_dir):
    df = q_filter_funnel(spark, sf_dir)
    rows = df.collect()
    survivors = [r["survivors"] for r in sorted(rows, key=lambda r: r["stage"])]
    assert len(survivors) == 4
    assert survivors == sorted(survivors, reverse=True)
    # One scan: exactly one parquet FileScan of documents in the plan
    # (AQE prints Final + Initial sections — count the final only).
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1


def test_unpivot_round_trips_the_pivot(spark, sf_dir):
    """unpivot(pivot(x)) must equal the plain long-form aggregate —
    the reshape algebra is lossless because the pivot's explicit value
    list + zero-fill makes the matrix dense. Also pins the scale
    claim: unpivot compiles to Expand (map-only), never a shuffle of
    its own."""
    from prueba_tecnica_analista_etl_spark.plans.extensions_distributed import (
        q_unpivot_long,
    )

    df = q_unpivot_long(spark, sf_dir)
    assert "Expand" in _plan(df)
    got = {
        (r["o_orderpriority"], r["status"]): r["cnt"] for r in df.collect()
    }
    o = _t(spark, sf_dir, "orders")
    long = {
        (r["o_orderpriority"], r["o_orderstatus"]): r["cnt"]
        for r in o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # Dense matrix: every (priority, status in F/O/P) cell is present,
    # zero-filled where the long form has no row.
    statuses = {s for _, s in got}
    assert statuses == {"F", "O", "P"}
    for (pri, st), cnt in got.items():
        assert cnt == long.get((pri, st), 0)
    assert all((pri, st) in got for (pri, st) in long if st in statuses)


def test_rolling_distinct_semantics_and_bounded_expansion(spark, sf_dir):
    """Each day's users_7d must equal the brute-force distinct count
    over the trailing 7 calendar days, sit between the single-day
    distinct and the 7-day sum of single-day distincts, and the plan
    must realize the trailing window as a map-only anchor expansion
    into a broadcast HASH join — never a nested-loop range join
    (O(|ud| x |days|) predicate evaluations) or a cartesian."""
    from prueba_tecnica_analista_etl_spark.plans.extensions_distributed import (
        q_rolling_distinct,
    )

    df = q_rolling_distinct(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, (
        "anchor-grid join must be a broadcast equi-join"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "Generate" in plan
    got = {r["day"]: r["users_7d"] for r in df.collect()}

    ev = _t(spark, sf_dir, "events")
    per_day = (
        ev.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .collect()
    )
    from collections import defaultdict

    day_users = defaultdict(set)
    for r in per_day:
        day_users[r["day"]].add(r["user_id"])
    import datetime

    for day, n in got.items():
        window_users = set()
        singles = 0
        for back in range(7):
            d = day - datetime.timedelta(days=back)
            window_users |= day_users.get(d, set())
            singles += len(day_users.get(d, set()))
        assert n == len(window_users), day
        assert len(day_users[day]) <= n <= singles


def test_bucketed_prefix_sums_on_adversarial_distributions(spark):
    """bucketed_prefix_sums vs the single-window truth on its seams:
    one key, a degenerate lo==hi grid, keys straddling every bucket
    boundary, negatives, and a second summed column — exclusive
    semantics (strictly-before totals) must hold through the offset
    join for every bucket count."""
    from pyspark.sql import Window

    from prueba_tecnica_analista_etl_spark.operators.rank import (
        bucketed_prefix_sums,
        numeric_bucket,
    )

    cases = [
        [(5.0, 3, 1)],                                  # single key
        [(float(i), i + 1, i % 2) for i in range(20)],  # increasing
        [((-1.0) ** i * i * 0.7, 2, 1) for i in range(15)],  # negatives
        [(0.0, 7, 2), (1e-12, 1, 0)],                   # near-degenerate
    ]
    for i, rows in enumerate(cases):
        df = spark.createDataFrame(rows, "v double, cnt long, pos long")
        lo = min(r[0] for r in rows)
        hi = max(r[0] for r in rows)
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        want = {
            r["v"]: (r["c1"], r["c2"])
            for r in df.select(
                "v",
                F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("c1"),
                F.coalesce(F.sum("pos").over(w), F.lit(0)).alias("c2"),
            ).collect()
        }
        for n_buckets in (1, 4, 16):
            got = {
                r["v"]: (r["cum_cnt"], r["cum_pos"])
                for r in bucketed_prefix_sums(
                    df,
                    numeric_bucket(F.col("v"), lo, hi, n_buckets),
                    "v",
                    ["cnt", "pos"],
                ).collect()
            }
            assert got == want, f"case {i} buckets {n_buckets}"


def test_bucketed_prefix_sums_rejects_null_keys(spark):
    """A NULL order key has no place in the cumulative order — the
    operator must stop, not silently drop the row in the offset join
    (bucketed_rank's rule)."""
    import pytest

    from prueba_tecnica_analista_etl_spark.operators.rank import (
        bucketed_prefix_sums,
        numeric_bucket,
    )

    df = spark.createDataFrame(
        [(1.0, 1), (None, 2)], "v double, cnt long"
    )
    with pytest.raises(ValueError, match="NULL"):
        bucketed_prefix_sums(
            df, numeric_bucket(F.col("v"), 0.0, 2.0, 4), "v", ["cnt"]
        )


def test_eval_auc_hand_computed_and_sharded_plan(spark):
    """AUC identity on a hand-checkable frame (via the registry
    function's exact arithmetic path re-applied to a tiny in-memory
    oracle), plus the plan law on the real query: the cumulative
    window partitions by bucket, never SinglePartition."""
    from prueba_tecnica_analista_etl_spark.plans.extensions_distributed import (
        q_eval_auc,
    )

    # Perfect separation: positives score above every negative.
    # AUC = 1. Then a tie block: one pos and one neg tied -> 0.5.
    def auc(rows):
        # rows: (score, label)
        from collections import Counter

        cnt = Counter(s for s, _ in rows)
        pos = Counter(s for s, l in rows if l)
        npos = sum(pos.values())
        n = len(rows)
        r2 = 0
        for s in cnt:
            below = sum(c for v, c in cnt.items() if v < s)
            r2 += pos[s] * (2 * below + cnt[s] + 1)
        return (r2 - npos * (npos + 1)) / (2 * npos * (n - npos))

    assert auc([(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]) == 1.0
    assert auc([(1.0, 0), (1.0, 1)]) == 0.5
    assert auc([(3.0, 0), (4.0, 0), (1.0, 1), (2.0, 1)]) == 0.0

    df = q_eval_auc(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The cumulative window must run bucketed, and the ONLY
    # SinglePartition exchange allowed is the closing scalar census
    # aggregate — a second one would mean a global window/sort
    # regression snuck in beside the bucketed path.
    assert "windowspecdefinition(__rank_bucket" in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_artifact_cache_invalidates_on_corpus_rewrite(
    spark, tmp_path, monkeypatch
):
    """ADVICE r8: a corpus regenerated under the SAME path must MISS
    the artifact caches (the key carries a file-stat fingerprint) —
    a stale bloom bitset silently drops true semi-join matches, so
    answering stale is the one wrong behavior. Same-content lookups
    still hit (one build per generation). The fingerprint itself is
    TTL-memoized (r9 ADVICE — see
    test_corpus_fingerprint_memo_collapses_walks); zero the TTL here
    so this test exercises the fingerprint mechanism, not the memo's
    documented <=TTL staleness window."""
    import os

    from prueba_tecnica_analista_etl_spark import artifacts
    from prueba_tecnica_analista_etl_spark.artifacts import (
        census_artifact,
        corpus_artifact,
    )

    monkeypatch.setattr(artifacts, "_FP_TTL_S", 0.0)
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)

    def write(payload: str) -> None:
        with open(os.path.join(corpus, "t.parquet"), "w") as fh:
            fh.write(payload)

    write("generation-one")
    builds = []

    def build_census():
        builds.append("c")
        return len(builds) * 100

    assert census_artifact(spark, corpus, "x", build_census) == 100
    assert census_artifact(spark, corpus, "x", build_census) == 100
    assert builds == ["c"], "same generation must hit the cache"

    write("generation-two-(different-size)")
    assert census_artifact(spark, corpus, "x", build_census) == 200
    assert builds == ["c", "c"], "rewrite must rebuild, not answer stale"

    frames = []

    def build_frame():
        frames.append("f")
        return spark.range(len(frames))

    assert corpus_artifact(spark, corpus, "y", build_frame).count() == 1
    assert corpus_artifact(spark, corpus, "y", build_frame).count() == 1
    assert frames == ["f"]
    write("generation-three:-still-different")
    assert corpus_artifact(spark, corpus, "y", build_frame).count() == 2
    assert frames == ["f", "f"]


def test_artifact_store_survives_process_boundary(
    spark, tmp_path, monkeypatch
):
    """Disk layer (r10 verdict task 1): artifacts are one-time-per-
    CORPUS, not per-process — a lookup whose memory memo is gone (the
    fresh-process case, simulated by clearing the in-memory caches)
    must be served from the persisted parquet/pickle WITHOUT calling
    build(). clear_artifacts(name=...) voids the disk copy too (a
    name-scoped clear means the artifact's definition changed, which
    no corpus fingerprint can detect) — after it, build() runs again."""
    import os

    from prueba_tecnica_analista_etl_spark import artifacts

    monkeypatch.setattr(artifacts, "_FP_TTL_S", 0.0)
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    with open(os.path.join(corpus, "t.parquet"), "w") as fh:
        fh.write("generation-one")

    builds = []

    def build_frame():
        builds.append("f")
        return spark.createDataFrame([(1, "a")], "id long, s string")

    def build_census():
        builds.append("c")
        return {"words": [3, 5, 7]}

    df1 = artifacts.corpus_artifact(spark, corpus, "pb_frame", build_frame)
    v1 = artifacts.census_artifact(spark, corpus, "pb_val", build_census)
    assert df1.count() == 1 and v1 == {"words": [3, 5, 7]}
    assert builds == ["f", "c"]

    # simulate a fresh process: memory memos gone, disk intact
    artifacts._CACHE.clear()
    artifacts._VALUE_CACHE.clear()
    df2 = artifacts.corpus_artifact(spark, corpus, "pb_frame", build_frame)
    v2 = artifacts.census_artifact(spark, corpus, "pb_val", build_census)
    assert builds == ["f", "c"], "fresh process must be served from disk"
    assert [r.asDict() for r in df2.collect()] == [
        r.asDict() for r in df1.collect()
    ]
    assert df2.schema == df1.schema, "schema sidecar must round-trip"
    assert v2 == v1

    # name-scoped clear removes the disk copy -> rebuild
    artifacts.clear_artifacts(name="pb_frame")
    artifacts.corpus_artifact(spark, corpus, "pb_frame", build_frame)
    assert builds == ["f", "c", "f"]

    # empty frames round-trip via the schema sidecar (a bare parquet
    # dir with zero part files cannot infer a schema)
    def build_empty():
        builds.append("e")
        return spark.createDataFrame([], "k int, t timestamp")

    e1 = artifacts.corpus_artifact(spark, corpus, "pb_empty", build_empty)
    artifacts._CACHE.clear()
    e2 = artifacts.corpus_artifact(spark, corpus, "pb_empty", build_empty)
    assert builds[-1] == "e" and builds.count("e") == 1
    assert e2.count() == 0 and e2.schema == e1.schema


def test_artifact_directory_reuses_and_evicts_generations(
    tmp_path, monkeypatch
):
    """artifact_directory (r10 ADVICE: the per-process mkdtemp IVF
    index copies leaked): one build per corpus generation, reused
    across lookups; a corpus rewrite builds a NEW generation and the
    superseded directory is REMOVED from disk, not leaked."""
    import os

    from prueba_tecnica_analista_etl_spark import artifacts

    monkeypatch.setattr(artifacts, "_FP_TTL_S", 0.0)
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)

    def write(payload: str) -> None:
        with open(os.path.join(corpus, "t.parquet"), "w") as fh:
            fh.write(payload)

    write("generation-one")
    builds = []

    def build(d: str) -> None:
        builds.append(d)
        with open(os.path.join(d, "payload"), "w") as fh:
            fh.write("x")

    p1 = artifacts.artifact_directory(corpus, "pb_dir", build)
    p1b = artifacts.artifact_directory(corpus, "pb_dir", build)
    assert p1 == p1b and len(builds) == 1
    assert os.path.isfile(os.path.join(p1, "payload"))

    write("generation-two-(different-size)")
    p2 = artifacts.artifact_directory(corpus, "pb_dir", build)
    assert p2 != p1 and len(builds) == 2
    assert not os.path.exists(p1), "superseded generation must be removed"
    assert os.path.isfile(os.path.join(p2, "payload"))


def test_corpus_fingerprint_memo_collapses_walks(tmp_path, monkeypatch):
    """r9 ADVICE: _corpus_fingerprint walked+stat'ed the whole corpus
    tree on EVERY artifact lookup — O(files) syscalls per cache HIT.
    Within the TTL, repeated lookups must serve the memo (one walk);
    past the TTL (or after clear_artifacts, the explicit invalidation
    path) the tree is re-walked and a rewrite is seen."""
    import os

    from prueba_tecnica_analista_etl_spark import artifacts

    corpus = str(tmp_path / "c")
    os.makedirs(corpus)
    with open(os.path.join(corpus, "f"), "w") as fh:
        fh.write("one")
    monkeypatch.setattr(artifacts, "_FP_TTL_S", 3600.0)
    artifacts._FP_MEMO.clear()
    first = artifacts._corpus_fingerprint(corpus)
    with open(os.path.join(corpus, "f"), "w") as fh:
        fh.write("two-different-size")
    # memo hit: the rewrite is invisible within the TTL by contract
    assert artifacts._corpus_fingerprint(corpus) == first
    # clear_artifacts drops the memo -> the rewrite is seen
    artifacts.clear_artifacts()
    assert artifacts._corpus_fingerprint(corpus) != first


def test_corpus_writers_drop_fingerprint_memo(spark, tmp_path, monkeypatch):
    """r10 ADVICE: the fingerprint TTL memo reintroduced a bounded
    stale-artifact window — a corpus rewritten within the TTL of a
    prior lookup served artifacts from the old generation. The engine's
    corpus-WRITING helpers now call invalidate_corpus after every
    mutation, so the TTL window can never span one of the engine's own
    rewrites (an external writer still relies on the TTL expiring or
    clear_artifacts, the documented contract). Pin it with an
    effectively-infinite TTL: a versioned commit INSIDE the corpus
    must be visible to the very next fingerprint lookup."""
    import os

    from prueba_tecnica_analista_etl_spark import artifacts
    from prueba_tecnica_analista_etl_spark.sources.versioned import (
        commit_snapshot,
    )

    monkeypatch.setattr(artifacts, "_FP_TTL_S", 3600.0)
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    with open(os.path.join(corpus, "seed"), "w") as fh:
        fh.write("x")
    before = artifacts._corpus_fingerprint(corpus)
    # memo is warm: an untracked external write would now be invisible
    commit_snapshot(
        spark.createDataFrame([(1,)], "id long"),
        os.path.join(corpus, "dim_table"),
    )
    after = artifacts._corpus_fingerprint(corpus)
    assert after != before, (
        "engine write inside the corpus must invalidate the TTL memo"
    )


def test_misra_gries_guarantee_and_bounds(spark):
    """operators/sketch.py invariants on an adversarially skewed key
    set: (a) the candidate frame is bounded by capacity×partitions;
    (b) every key above the n/(capacity+1) threshold survives (the
    classic MG guarantee, here 'hot' at 40% with capacity 4 →
    threshold 20%); (c) every candidate's second-pass count is EXACT
    (equals the full groupBy); (d) filtering candidates at the
    threshold reproduces the exact heavy-hitter answer — the property
    q_heavy_hitters' oracle-parity rests on; (e) NULL keys are
    excluded, not counted."""
    from prueba_tecnica_analista_etl_spark.operators.sketch import (
        frequent_items,
        mg_candidates,
    )

    vals = (
        ["hot"] * 2000
        + ["warm"] * 750
        + [f"tail{i}" for i in range(2250)]
        + [None] * 100
    )
    df = spark.createDataFrame(
        [(v,) for v in vals], "k string"
    ).repartition(7)
    capacity, n = 4, 5000  # NULLs excluded from n

    cand = mg_candidates(df.filter(F.col("k").isNotNull()), "k", capacity)
    n_parts = df.rdd.getNumPartitions()
    assert cand.count() <= capacity * n_parts

    got = {
        r["k"]: r["cnt"]
        for r in frequent_items(df, "k", capacity).collect()
    }
    assert None not in got
    exact = {
        r["k"]: r["cnt"]
        for r in df.filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got.get("hot") == 2000  # guarantee: 40% > 1/(4+1)
    for k, c in got.items():
        assert exact[k] == c, k  # second pass is exact, always
    passing = {k for k, c in got.items() if c * (capacity + 1) > n}
    truth = {k for k, c in exact.items() if c * (capacity + 1) > n}
    assert passing == truth == {"hot"}


def test_misra_gries_all_distinct_and_empty(spark):
    """Degenerate ends of the sketch: an all-distinct key set has NO
    heavy hitters — candidates stay bounded, the exact pass still
    returns only true counts, and the threshold filter yields the
    empty set (matching the exact answer); an empty input yields
    empty candidates and an empty result rather than an error."""
    from prueba_tecnica_analista_etl_spark.operators.sketch import (
        frequent_items,
        mg_candidates,
    )

    distinct = spark.createDataFrame(
        [(f"k{i}",) for i in range(500)], "k string"
    ).repartition(5)
    capacity = 4
    assert mg_candidates(distinct, "k", capacity).count() <= capacity * 5
    got = {
        r["k"]: r["cnt"]
        for r in frequent_items(distinct, "k", capacity).collect()
    }
    assert all(c == 1 for c in got.values())
    assert not {k for k, c in got.items() if c * (capacity + 1) > 500}

    empty = distinct.filter(F.lit(False))
    assert mg_candidates(empty, "k", capacity).count() == 0
    assert frequent_items(empty, "k", capacity).count() == 0


def test_gc_stale_versions_prunes_only_strictly_older(tmp_path):
    """The version GC must remove ONLY strictly-older artifacts-v<N>
    siblings, compared numerically: a NEWER revision's store (another
    checkout sharing this $HOME) and unparseable siblings must
    survive, or two alternating revisions would wipe each other's
    stores on every run (r11 review finding)."""
    import os

    from prueba_tecnica_analista_etl_spark.artifacts import (
        _STORE_VERSION,
        _gc_stale_versions,
    )

    mine = int(_STORE_VERSION[1:])
    base = tmp_path / f"artifacts-{_STORE_VERSION}"
    older = tmp_path / f"artifacts-v{mine - 1}"
    newer = tmp_path / f"artifacts-v{mine + 7}"
    # numeric compare matters: lexicographically "v10" < "v9"
    much_newer = tmp_path / f"artifacts-v{mine * 10}"
    weird = tmp_path / "artifacts-custom"
    for d in (base, older, newer, much_newer, weird):
        os.makedirs(d)
    _gc_stale_versions(str(base))
    assert not older.exists(), "strictly older version must be pruned"
    assert newer.exists(), "newer version must survive"
    assert much_newer.exists(), "numerically newer must survive"
    assert weird.exists(), "unparseable sibling must survive"
    assert base.exists()
