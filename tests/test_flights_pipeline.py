"""Golden-number tests on a synthetic flights-like fixture reproducing
the reference's data quirks (FIXTURES.md §2): BOM, ';' delimiter,
corrupt duplicate headers, right-padded emails/phones, cross-file key
overlap where the primary file must win keep-first dedup. Expected
values are computed by construction (the generating lists are the
oracle), mirroring SURVEY.md §5's golden numbers structurally."""

from __future__ import annotations

import random
import re

import pytest

from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.pipelines.flights import (
    flights_pipeline,
)

EMAIL_RE = re.compile(
    r"^[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}$"
)

GOOD_HEADER = ";".join(f"Col_{i}" for i in range(1, 20))
# corrupt header family: duplicate names at positions 6/16/18
# (flights_5000v2.csv quirk — reader must discard it)
BAD_HEADER = ";".join(
    "Col_7" if i == 6 else "Col_17" if i == 16 else "Col_13" if i == 18
    else f"Col_{i}"
    for i in range(1, 20)
)


def _email(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.7:
        return f"user{rng.randrange(10_000)}@example.com"
    if r < 0.8:
        return "NO TIENE"
    if r < 0.9:
        return "n/a"
    return f"user{rng.randrange(10_000)}@@example..com"


def _phone(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.6:
        return f"3{rng.randrange(10**9):09d}"          # Celular
    if r < 0.7:
        return f"601{rng.randrange(10**7):07d}"        # Fijo
    if r < 0.8:
        return f"+57-3{rng.randrange(10**9):09d}"      # Celular after clean
    if r < 0.9:
        return f"{rng.randrange(10**9):09d}"           # 9 digits → No Apto
    return "0"


def _row(rng: random.Random, key: str, row_id: int) -> list[str]:
    email = _email(rng).ljust(250)                      # width-250 padding
    phone = _phone(rng).ljust(30)                       # width-30 padding
    return [
        key,
        rng.choice(["TK", "DL", "AA", "EK"]),
        "BOG",
        f"{rng.randrange(999)}{rng.choice(['', 'E', 'L'])}",
        "00:00.0",
        "BOG",
        "MIA",
        email,
        f"{rng.uniform(100, 9000):.1f}",
        f"{rng.uniform(100, 9000):.1f}",
        phone,
        rng.choice(["E", "I"]),
        "55:34.4",
        f"10591512|125|{key.zfill(8)}|E",
        str(row_id),
        "0",
        "55:34.4",
        "agi_bideveloper2",
        "INSERT",
    ]


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    rng = random.Random(42)
    base = tmp_path_factory.mktemp("flights")
    # primary: 300 rows over 200 keys (internal dups);
    # secondary: 150 rows over keys that 50% overlap primary's
    primary_keys = [str(23600000 + rng.randrange(200)) for _ in range(300)]
    secondary_keys = [
        str(23600000 + rng.randrange(400)) for _ in range(150)
    ]
    rows_a = [_row(rng, k, 14000000 + i) for i, k in enumerate(primary_keys)]
    rows_b = [_row(rng, k, 15000000 + i) for i, k in enumerate(secondary_keys)]

    pa = base / "flights_primary.csv"
    pb = base / "flights_secondary.csv"
    with open(pa, "w", encoding="utf-8-sig") as f:       # BOM on purpose
        f.write(GOOD_HEADER + "\n")
        f.writelines(";".join(r) + "\n" for r in rows_a)
    with open(pb, "w", encoding="utf-8-sig") as f:
        f.write(BAD_HEADER + "\n")                       # corrupt header
        f.writelines(";".join(r) + "\n" for r in rows_b)

    return {
        "primary": str(pa),
        "secondary": str(pb),
        "rows_a": rows_a,
        "rows_b": rows_b,
    }


@pytest.fixture(scope="module")
def result(spark, fixture):
    return flights_pipeline(spark, fixture["primary"], fixture["secondary"])


def _expected_survivors(fixture) -> dict[str, list[str]]:
    """keep-first oracle: first occurrence in [primary rows, secondary
    rows] order wins (the reference's concat order)."""
    seen: dict[str, list[str]] = {}
    for row in fixture["rows_a"] + fixture["rows_b"]:
        seen.setdefault(row[0], row)
    return seen


def test_union_count_and_schema(result, fixture):
    union = result["union"]
    assert union.count() == len(fixture["rows_a"]) + len(fixture["rows_b"])
    assert union.columns == [f"Col_{i}" for i in range(1, 20)]


def test_corrupt_header_repaired(result, fixture):
    """The corrupt duplicate header names must be discarded and the
    positional 19-name schema applied: every value lands in its true
    positional column."""
    union = result["union"]
    assert union.filter(F.col("Col_7") != "MIA").count() == 0
    assert union.filter(F.col("Col_19") != "INSERT").count() == 0
    assert union.filter(F.col("Col_13") != F.col("Col_17")).count() == 0


def test_keep_first_dedup_matches_oracle(result, fixture):
    survivors = _expected_survivors(fixture)
    got = {
        r["Col_1"]: r["Col_15"]
        for r in result["deduped"].select("Col_1", "Col_15").collect()
    }
    assert len(got) == len(survivors)
    for key, row in survivors.items():
        assert got[key] == row[14], f"wrong survivor for key {key}"


def test_email_validation_counts(result, fixture):
    survivors = _expected_survivors(fixture)
    expected_valid = sum(
        1 for row in survivors.values() if EMAIL_RE.match(row[7].strip())
    )
    got = (
        result["validated"]
        .filter(F.col("Email_Valido"))
        .count()
    )
    assert got == expected_valid


def _phone_class(raw: str) -> str:
    c = re.sub(r"[+\-\s]", "", raw.strip())
    if c.isdigit() and len(c) == 10 and c.startswith("3"):
        return "Celular"
    if c.isdigit() and len(c) == 10 and c.startswith("601"):
        return "Fijo"
    return "No Apto"


def test_phone_classification_counts(result, fixture):
    survivors = _expected_survivors(fixture)
    expected: dict[str, int] = {}
    for row in survivors.values():
        expected[_phone_class(row[10])] = (
            expected.get(_phone_class(row[10]), 0) + 1
        )
    got = {
        r["Telefono_Estado"]: r["cnt"]
        for r in result["validated"]
        .groupBy("Telefono_Estado")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected


def test_export_cleans_in_place_on_full_union(result, fixture):
    export = result["export"]
    assert export.count() == len(fixture["rows_a"]) + len(fixture["rows_b"])
    bad = export.filter(
        F.col("Col_8").rlike(r"\s$") | F.col("Col_11").rlike(r"[+\-\s]")
    ).count()
    assert bad == 0
