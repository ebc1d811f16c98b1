"""Snapshot diff (operators/cdc.py) and declarative quality checks
(operators/quality_checks.py)."""

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.cdc import snapshot_diff
from nbdatatools_spark.operators.quality_checks import (
    foreign_key,
    in_range,
    matches,
    not_null,
    quality_report,
    satisfies,
    unique,
)

SNAP = "k BIGINT, v DOUBLE, s STRING"


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, 20.0, "b"),
            (3, 30.0, "c"),
            (4, None, "d"),  # NULL compared value
            (5, 50.0, None),
        ],
        SNAP,
    )
    new = spark.createDataFrame(
        [
            (1, 10.0, "a"),      # unchanged
            (2, 21.0, "b"),      # update (v)
            (3, 30.0, "cc"),     # update (s)
            (4, None, "d"),      # unchanged (NULL == NULL)
            # 5 absent              delete
            (6, 60.0, "f"),      # insert
        ],
        SNAP,
    )
    return old, new


def test_snapshot_diff_classifies(snapshots):
    old, new = snapshots
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {2: "update", 3: "update", 5: "delete", 6: "insert"}


def test_snapshot_diff_include_unchanged(snapshots):
    old, new = snapshots
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], include_unchanged=True).collect()
    }
    assert got[1] == "unchanged" and got[4] == "unchanged"
    assert len(got) == 6


def test_snapshot_diff_digest_mode_agrees(snapshots):
    old, new = snapshots
    a = sorted(
        (r["k"], r["change_type"])
        for r in snapshot_diff(old, new, ["k"], include_unchanged=True).collect()
    )
    b = sorted(
        (r["k"], r["change_type"])
        for r in snapshot_diff(
            old, new, ["k"], include_unchanged=True, digest=True
        ).collect()
    )
    assert a == b


def test_snapshot_diff_compare_subset(snapshots):
    old, new = snapshots
    # comparing only v: doc 3 (s changed, v same) becomes unchanged
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert 3 not in got
    assert got[2] == "update"


def test_snapshot_diff_null_key_raises(spark, snapshots):
    _, new = snapshots
    bad = spark.createDataFrame([(None, 1.0, "x")], SNAP)
    with pytest.raises(Exception, match="NULL key"):
        snapshot_diff(bad, new, ["k"]).collect()


def test_snapshot_diff_validates_keys(snapshots):
    old, new = snapshots
    with pytest.raises(ValueError, match="key_cols"):
        snapshot_diff(old, new, [])


def test_snapshot_diff_slim_projection(snapshots):
    """The join inputs must not carry columns outside key+compared —
    column pruning reaches the scan."""
    old, new = snapshots
    plan = (
        snapshot_diff(old, new, ["k"], ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the pre-shuffle projections carry only key + v + presence marker;
    # 's' never enters the exchange (ExistingRDD scans can't prune, so
    # check the Project nodes feeding the join, not the scan line)
    for line in plan.splitlines():
        if "Project" in line and "__present" in line:
            assert "s#" not in line


# --- quality checks --------------------------------------------------------

ROWS = "id BIGINT, grade STRING, score DOUBLE, ref BIGINT"


@pytest.fixture(scope="module")
def table(spark):
    df = spark.createDataFrame(
        [
            (1, "A-1", 50.0, 10),
            (2, "B-2", 150.0, 10),   # score out of [0, 100]
            (2, "C-3", 60.0, 20),    # duplicate id
            (4, None, 70.0, 30),     # NULL grade
            (5, "bad", 80.0, None),  # grade regex violation; NULL ref passes FK
            (6, "A-9", 90.0, 99),    # ref 99 absent from parent
        ],
        ROWS,
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pid BIGINT")
    return df, parent


def test_quality_report_counts(table):
    df, parent = table
    rep = {
        r["check"]: (r["n_violations"], r["passed"])
        for r in quality_report(
            df,
            [
                not_null("grade"),
                unique("id"),
                in_range("score", 0, 100),
                matches("grade", "^[A-C]-[0-9]$"),
                foreign_key("ref", parent, "pid"),
            ],
        ).collect()
    }
    assert rep["not_null(grade)"] == (1, False)
    assert rep["unique(id)"] == (1, False)
    assert rep["in_range(score,0,100)"] == (1, False)
    assert rep["matches(grade)"] == (1, False)  # NULL grade doesn't violate regex
    assert rep["foreign_key(ref)"] == (1, False)  # NULL ref passes


def test_quality_report_all_pass(table):
    df, parent = table
    rep = quality_report(df, [not_null("id"), in_range("score", 0, 1000)]).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rep)


def test_quality_report_satisfies(table):
    df, _ = table
    rep = quality_report(
        df, [satisfies("score_above_id", F.col("score") > F.col("id"))]
    ).collect()
    assert rep[0]["n_violations"] == 6  # every row violates: score > id


def test_quality_report_single_pass_for_row_checks(table):
    """All row-local checks compile into ONE aggregate over one scan —
    no joins, no extra exchanges per check."""
    df, _ = table
    plan = (
        quality_report(
            df, [not_null("grade"), in_range("score", 0, 100), matches("grade", "x")]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") <= 2  # partial + final of one agg
    assert "Join" not in plan


def test_quality_report_validates(table):
    df, parent = table
    with pytest.raises(ValueError, match="no checks"):
        quality_report(df, [])
    with pytest.raises(ValueError, match="duplicate check"):
        quality_report(df, [not_null("grade"), not_null("grade")])
    with pytest.raises(ValueError, match="arity"):
        foreign_key(["a", "b"], parent, "pid")


# ---------------------------------------------------------------------------
# profile_columns
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def profile_df(spark):
    rows = [
        (1, "alpha", 10.5),
        (2, "beta", None),
        (3, None, 2.25),
        (4, "alpha", 2.25),
    ]
    return spark.createDataFrame(rows, "id BIGINT, name STRING, score DOUBLE")


def test_profile_columns_stats(profile_df):
    from nbdatatools_spark.operators.quality_checks import profile_columns

    out = {
        r["column"]: r
    for r in profile_columns(profile_df, ["id", "name", "score"]).collect()}
    assert set(out) == {"id", "name", "score"}
    for r in out.values():
        assert r["n_rows"] == 4
    assert out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 4
    assert out["id"]["min_num"] == 1.0 and out["id"]["max_num"] == 4.0
    assert out["id"]["min_str"] is None and out["id"]["max_str"] is None
    assert out["name"]["n_null"] == 1
    assert out["name"]["n_distinct"] == 2  # NULL excluded, alpha dup collapses
    assert out["name"]["min_str"] == "alpha" and out["name"]["max_str"] == "beta"
    assert out["name"]["min_num"] is None
    assert out["score"]["n_null"] == 1
    assert out["score"]["n_distinct"] == 2
    assert out["score"]["min_num"] == 2.25 and out["score"]["max_num"] == 10.5


def test_profile_columns_approx_and_single_pass(profile_df):
    from nbdatatools_spark.operators.quality_checks import profile_columns

    out = {
        r["column"]: r
        for r in profile_columns(profile_df, ["id", "name"], approx=True).collect()
    }
    # HLL is exact at these cardinalities
    assert out["id"]["n_distinct"] == 4
    assert out["name"]["n_distinct"] == 2
    # approx profile is one non-expanded aggregate: no Expand node, and a
    # single scan of the source
    plan = profile_columns(profile_df, ["id", "name"], approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_profile_columns_validation(profile_df):
    from nbdatatools_spark.operators.quality_checks import profile_columns

    with pytest.raises(ValueError):
        profile_columns(profile_df, [])
    with pytest.raises(ValueError):
        profile_columns(profile_df, ["nope"])


# ---------------------------------------------------------------------------
# apply_changes (MERGE semantics)
# ---------------------------------------------------------------------------

class TestApplyChanges:
    def _target(self, spark):
        return spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id BIGINT, status STRING, amt DOUBLE",
        )

    def test_upsert_insert_delete(self, spark):
        from nbdatatools_spark.operators.cdc import apply_changes

        changes = spark.createDataFrame(
            [
                (2, "B", 21.0, "upsert"),   # update existing
                (4, "d", 40.0, "upsert"),   # insert new
                (3, None, 0.0, "delete"),   # delete
            ],
            "id BIGINT, status STRING, amt DOUBLE, op STRING",
        )
        out = {
            r.id: (r.status, r.amt)
            for r in apply_changes(self._target(spark), changes, ["id"]).collect()
        }
        assert out == {1: ("a", 10.0), 2: ("B", 21.0), 4: ("d", 40.0)}

    def test_duplicate_change_key_raises(self, spark):
        from nbdatatools_spark.operators.cdc import apply_changes

        changes = spark.createDataFrame(
            [(2, "x", 1.0, "upsert"), (2, "y", 2.0, "upsert")],
            "id BIGINT, status STRING, amt DOUBLE, op STRING",
        )
        with pytest.raises(Exception, match="duplicate change rows"):
            apply_changes(self._target(spark), changes, ["id"]).collect()

    def test_unknown_op_raises(self, spark):
        from nbdatatools_spark.operators.cdc import apply_changes

        changes = spark.createDataFrame(
            [(2, "x", 1.0, "merge")], "id BIGINT, status STRING, amt DOUBLE, op STRING"
        )
        with pytest.raises(Exception, match="unknown op"):
            apply_changes(self._target(spark), changes, ["id"]).collect()


# ---------------------------------------------------------------------------
# scd2_history
# ---------------------------------------------------------------------------

class TestScd2History:
    def _snaps(self, spark):
        # key A: x@1, x@2, y@3  -> [1,3) x; [3,-) y current
        # key B: x@1, (absent 2), x@3 -> [1,2) x closed; [3,-) x current (gap)
        # key C: x@1, x@2, absent 3 -> [1,3) x closed, not current
        rows = [
            ("A", 1, "x"), ("A", 2, "x"), ("A", 3, "y"),
            ("B", 1, "x"), ("B", 3, "x"),
            ("C", 1, "x"), ("C", 2, "x"),
        ]
        return spark.createDataFrame(rows, "k STRING, snap INT, attr STRING")

    def test_closed_form_runs(self, spark):
        from nbdatatools_spark.operators.cdc import scd2_history

        out = sorted(
            (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_history(self._snaps(spark), ["k"], "snap").collect()
        )
        assert out == [
            ("A", "x", 1, 3, False),
            ("A", "y", 3, None, True),
            ("B", "x", 1, 2, False),   # closed by the gap at snapshot 2
            ("B", "x", 3, None, True),
            ("C", "x", 1, 3, False),
        ]

    def test_duplicate_snapshot_row_raises(self, spark):
        from nbdatatools_spark.operators.cdc import scd2_history

        snaps = spark.createDataFrame(
            [("A", 1, "x"), ("A", 1, "y")], "k STRING, snap INT, attr STRING"
        )
        with pytest.raises(Exception, match="duplicate rows"):
            scd2_history(snaps, ["k"], "snap").collect()

    def test_one_wide_exchange(self, spark):
        """The lag/run/rollup/lead chain reuses ONE key partitioning; only
        the tiny calendar adds exchanges (broadcast + its single-partition
        row_number)."""
        from nbdatatools_spark.operators.cdc import scd2_history

        plan = (
            scd2_history(self._snaps(spark), ["k"], "snap")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        wide = len(re.findall(r"Exchange hashpartitioning\(k", plan))
        assert wide == 1, plan


class TestIncrementalAggUpdate:
    def test_matches_from_scratch(self, spark):
        from nbdatatools_spark.operators.cdc import apply_changes, incremental_agg_update

        target = spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 5.0)],
            "id BIGINT, g STRING, m DOUBLE",
        )
        changes = spark.createDataFrame(
            [
                (2, "b", 25.0, "upsert"),   # moves group a -> b
                (4, None, 0.0, "delete"),   # group c empties out
                (5, "a", 7.0, "upsert"),    # new row
            ],
            "id BIGINT, g STRING, m DOUBLE, op STRING",
        )
        state = target.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("m").alias("m")
        )
        inc = {
            r.g: (r.n, r.m)
            for r in incremental_agg_update(
                state, target, changes, ["g"], ["id"], ["m"]
            ).collect()
        }
        scratch = {
            r.g: (r.n, r.m)
            for r in apply_changes(target, changes, ["id"])
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("m").alias("m"))
            .collect()
        }
        assert inc == scratch == {"a": (2, 17.0), "b": (2, 55.0)}
        assert "c" not in inc  # zero-count groups drop out

    def test_validation(self, spark):
        from nbdatatools_spark.operators.cdc import incremental_agg_update

        df = spark.createDataFrame([(1, "a", 1.0)], "id BIGINT, g STRING, m DOUBLE")
        with pytest.raises(ValueError):
            incremental_agg_update(df, df, df, [], ["id"], ["m"])
