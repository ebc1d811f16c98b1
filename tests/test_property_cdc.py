"""Property-based differentials for the CDC family: random snapshots and
change batches checked against pure-Python simulators (dict merge, interval
builder, from-scratch aggregation) — the test_property_predicates strategy
applied to apply_changes / scd2_history / incremental_agg_update."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nbdatatools_spark.operators.cdc import (
    apply_changes,
    incremental_agg_update,
    scd2_history,
)

KEYS = list(range(1, 7))
GROUPS = ["a", "b", "c"]

# a change batch: per key at most one change (the operator's contract)
_change = st.tuples(
    st.sampled_from(GROUPS), st.integers(0, 50), st.sampled_from(["upsert", "delete"])
)
_changes = st.dictionaries(st.sampled_from(KEYS), _change, max_size=6)
_target = st.dictionaries(
    st.sampled_from(KEYS), st.tuples(st.sampled_from(GROUPS), st.integers(0, 50)), max_size=6
)

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(target=_target, changes=_changes)
def test_apply_changes_matches_dict_merge(spark, target, changes):
    tgt_rows = [(k, g, float(m)) for k, (g, m) in sorted(target.items())]
    chg_rows = [(k, g, float(m), op) for k, (g, m, op) in sorted(changes.items())]
    tgt = spark.createDataFrame(
        tgt_rows or [(None, None, None)], "id BIGINT, g STRING, m DOUBLE"
    )
    if not tgt_rows:
        tgt = tgt.where(F.lit(False))
    if not chg_rows:
        return  # empty change batch: nothing to check beyond identity
    chg = spark.createDataFrame(chg_rows, "id BIGINT, g STRING, m DOUBLE, op STRING")

    # dict simulation
    state = {k: (g, float(m)) for k, (g, m) in target.items()}
    for k, (g, m, op) in changes.items():
        if op == "delete":
            state.pop(k, None)
        else:
            state[k] = (g, float(m))

    got = {
        r.id: (r.g, r.m) for r in apply_changes(tgt, chg, ["id"]).collect()
    }
    assert got == state


@settings(**_SETTINGS)
@given(
    presence=st.lists(
        st.tuples(
            st.sampled_from(KEYS),          # key
            st.integers(1, 5),              # snapshot
            st.integers(0, 2),              # attr value
        ),
        max_size=18,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_scd2_matches_python_interval_builder(spark, presence):
    if not presence:
        return
    df = spark.createDataFrame(
        [(k, s, f"v{a}") for k, s, a in presence], "k BIGINT, snap INT, attr STRING"
    )
    got = sorted(
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(df, ["k"], "snap").collect()
    )

    # python reference: dense calendar over DISTINCT snapshots present
    cal = sorted({s for _, s, _ in presence})
    idx = {s: i for i, s in enumerate(cal)}
    by_key: dict = {}
    for k, s, a in presence:
        by_key.setdefault(k, []).append((idx[s], s, f"v{a}"))
    expect = []
    for k, rows in by_key.items():
        rows.sort()
        runs = []
        for i, s, a in rows:
            if runs and runs[-1]["attr"] == a and runs[-1]["max_idx"] == i - 1:
                runs[-1]["max_idx"] = i
            else:
                runs.append({"attr": a, "from": s, "max_idx": i})
        for r in runs:
            nxt = r["max_idx"] + 1
            valid_to = cal[nxt] if nxt < len(cal) else None
            expect.append(
                (k, r["attr"], r["from"], valid_to, r["max_idx"] == len(cal) - 1)
            )
    assert got == sorted(expect)


@settings(**_SETTINGS)
@given(target=_target, changes=_changes)
def test_incremental_agg_matches_from_scratch(spark, target, changes):
    if not target and not changes:
        return
    tgt_rows = [(k, g, float(m)) for k, (g, m) in sorted(target.items())]
    chg_rows = [(k, g, float(m), op) for k, (g, m, op) in sorted(changes.items())]
    tgt = spark.createDataFrame(
        tgt_rows or [(0, "a", 0.0)], "id BIGINT, g STRING, m DOUBLE"
    )
    if not tgt_rows:
        tgt = tgt.where(F.lit(False))
    if not chg_rows:
        return
    chg = spark.createDataFrame(chg_rows, "id BIGINT, g STRING, m DOUBLE, op STRING")
    state = tgt.groupBy("g").agg(F.count(F.lit(1)).alias("n"), F.sum("m").alias("m"))
    inc = {
        r.g: (r.n, r.m)
        for r in incremental_agg_update(state, tgt, chg, ["g"], ["id"], ["m"]).collect()
    }
    scratch = {
        r.g: (r.n, r.m)
        for r in apply_changes(tgt, chg, ["id"])
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("m").alias("m"))
        .collect()
    }
    assert inc == scratch
