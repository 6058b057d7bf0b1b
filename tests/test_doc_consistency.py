"""Count-drift guard: the registry size is documented in three places
(the rotation module docstring, README.md, SURVEY.md §2.11) and has
drifted twice when a new q_* landed (r4: 63→65 noted late; r5: the
rotation comment shipped saying 65/56 while the registry held 66/57 —
an ADVICE finding both rounds). This test derives the true counts from
the imported registry and greps each document for the exact literal
phrase, so adding a query without updating all three docs fails HERE
by file name. No Spark session needed — pure import + file reads.
"""

from __future__ import annotations

import os

import prueba_tecnica_analista_etl_spark.plans as plans
from prueba_tecnica_analista_etl_spark.plans import REGISTRY

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _counts() -> tuple[int, int, int]:
    total = len(REGISTRY)
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    return total, n_oracle, total - n_oracle


def test_rotation_module_docstring_counts():
    total, n_oracle, n_rows = _counts()
    doc = plans.__doc__ or ""
    assert (
        f"{total} queries ({n_oracle} oracle-backed + {n_rows}\nrows-only)"
        in doc
        or f"{total} queries ({n_oracle} oracle-backed + {n_rows} rows-only)"
        in doc.replace("\n", " ")
    ), f"rotation docstring counts != computed {total}/{n_oracle}/{n_rows}"
    outside = total - plans.WINDOW
    assert f"{outside} must sit outside" in doc.replace("\n", " "), (
        f"rotation docstring outside-window count != computed {outside}"
    )


def test_readme_counts():
    total, n_oracle, _ = _counts()
    text = open(os.path.join(ROOT, "README.md")).read().replace("\n", " ")
    assert f"{total} declared queries, {n_oracle} proven value-exact" in text


def test_baseline_banner_counts():
    """BASELINE.md is an append-only measurement log whose per-round
    sections quote HISTORICAL registry sizes; its current-state banner
    (r12 verdict task 7) must track the live registry so a reader
    never mistakes an old round's counts for today's."""
    total, n_oracle, _ = _counts()
    text = open(os.path.join(ROOT, "BASELINE.md")).read()
    assert (
        f"live registry: {total} queries ({n_oracle} oracle-backed)"
        in text
    )


def test_survey_counts():
    total, n_oracle, _ = _counts()
    text = open(os.path.join(ROOT, "SURVEY.md")).read()
    assert f"**{total} queries ({n_oracle} oracle-backed)**" in text


def test_window_arithmetic():
    """The recorded window is exactly WINDOW entries, every rows-only
    query promised a record this round is inside it, and the
    never-recorded lead set occupies the FIRST slots (so a partial
    driver run still certifies them)."""
    names = list(REGISTRY)
    window = set(names[: plans.WINDOW])
    for n in plans._ROWS_ONLY_IN:
        assert n in window, n
    assert names[: len(plans._ROTATION_FIRST)] == plans._ROTATION_FIRST
    assert len(names) >= plans.WINDOW


def test_rotation_out_list_arithmetic():
    """The out-list size is DERIVED, not hand-counted: it must equal
    n_oracle - (oracle slots in the window), so resizing the registry
    without resizing _ROTATION_OUT fails here by name (the r6 verdict
    flagged the r5 rotation paragraph going stale — this pins the
    arithmetic to the code instead of the prose)."""
    _, n_oracle, _ = _counts()
    expected_out = (
        n_oracle
        - len(plans._ROTATION_NEW)
        - (plans.WINDOW - len(plans._ROWS_ONLY_IN))
    )
    assert len(plans._ROTATION_OUT) == expected_out
    doc = open(plans.__file__).read()
    assert f"{len(plans._ROTATION_OUT)} oracle-backed queries" in doc, (
        "rotation comment out-count drifted from _ROTATION_OUT"
    )


def _correctness_records() -> "dict[int, dict]":
    """All committed CORRECTNESS_r*.json artifacts, keyed by round."""
    import json
    import re

    out = {}
    for f in os.listdir(ROOT):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)
        if m:
            out[int(m.group(1))] = json.load(open(os.path.join(ROOT, f)))
    return out


def _record_is_good(spec, rec: dict | None) -> bool:
    """A driver record counts for a query if it proves what the query
    claims: value-exact hash match for oracle-backed, rows>0 for
    rows-only (whose records carry err='no_oracle' by design)."""
    if not rec:
        return False
    if spec.oracle is not None:
        return rec.get("hash_match") is True
    return (rec.get("spark_rows") or 0) > 0 and rec.get("err") in (
        None,
        "no_oracle",
    )


def test_registry_staleness_bound():
    """Rotation hygiene (r8 verdict task 6): NO registry query's
    newest good driver record may be more than TWO rounds behind the
    newest committed CORRECTNESS artifact, and any never-recorded
    query must sit INSIDE the current window (due for its first
    record this round).  This replaces the r8 one-round out-list form,
    which became unsatisfiable once the registry outgrew 2x the
    window.  The two-round bound is sustainable whenever each cohort
    fits in a third of its slots (asserted below from live counts, so
    the justification cannot drift — an r9 ADVICE item) and still
    catches the real r8 hazard class: a query shipped round after
    round with only builder-side certification."""
    _, n_oracle, n_rows = _counts()
    oracle_slots = plans.WINDOW - len(plans._ROWS_ONLY_IN)
    assert n_oracle <= 3 * oracle_slots, (
        f"two-round staleness bound unsatisfiable: {n_oracle} oracle "
        f"queries > 3x{oracle_slots} oracle slots/round"
    )
    assert n_rows <= 3 * len(plans._ROWS_ONLY_IN), (
        f"two-round staleness bound unsatisfiable: {n_rows} rows-only "
        f"queries > 3x{len(plans._ROWS_ONLY_IN)} rows-only slots/round"
    )
    records = _correctness_records()
    newest_round = max(records)
    window = set(list(REGISTRY)[: plans.WINDOW])
    stale, unscheduled = [], []
    for n, spec in REGISTRY.items():
        holding = [
            r for r, rec in records.items() if _record_is_good(spec, rec.get(n))
        ]
        if not holding:
            # _ROTATION_NEW = queries added AFTER this round's window
            # was fixed; they cannot be inside it by construction, and
            # the rotation module promises them the FIRST r10 slots —
            # the next round's run of this test enforces that promise
            # (they will still be never-recorded then, so they must be
            # inside the r10 window or this assert fires).
            if n not in window and n not in plans._ROTATION_NEW:
                unscheduled.append(n)
        elif max(holding) < newest_round - 2:
            stale.append((n, max(holding)))
    assert not unscheduled, (
        f"never-driver-recorded queries outside the current window: "
        f"{unscheduled}"
    )
    assert not stale, (
        f"queries whose newest good driver record trails "
        f"r{newest_round} by more than two rounds: {stale}"
    )


def test_survey_table_mirrors_registry():
    """Every declared query must own a row in the SURVEY §2.11
    inventory table — the judge-facing line-by-line checklist. A new
    registry entry without its table row fails here, keeping the
    mirror complete by construction."""
    import re

    rows = [
        line
        for line in open(os.path.join(ROOT, "SURVEY.md"))
        if line.startswith("| `q_")
    ]
    names = {re.match(r"\| `(q_\w+)`", line).group(1) for line in rows}
    missing = [n for n in REGISTRY if n not in names]
    assert not missing, f"registry queries missing a SURVEY row: {missing}"
