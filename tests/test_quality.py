"""Data-quality operators (operators/quality.py): single-scan
expectation suites, uniqueness/referential counts, keyed frame diff,
and the one-scan column profiler.

No reference equivalent — extension surface; the reference's
``validate_dataframe`` (pydantic row glue) is mirrored separately in
``rdsa_utils_spark.validation`` and tested in test_frame_validation.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.quality import (
    frame_diff,
    in_range,
    in_set,
    matches_regex,
    not_null,
    profile_columns,
    referential_violations,
    run_checks,
    satisfies,
    unique_violations,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "alice", 30, "US"),
            (2, "bob", -5, "GB"),
            (3, None, 45, "FR"),
            (4, "dora", 200, "XX"),
            (5, "eve", None, "US"),
        ],
        "id long, name string, age int, country string",
    )


class TestRunChecks:
    def test_counts_per_check(self, people):
        out = run_checks(
            people,
            [
                not_null("name"),
                in_range("age", 0, 150),
                in_set("country", ["US", "GB", "FR"]),
                matches_regex("name", "^[a-z]+$"),
                satisfies("adult", F.col("age") >= 18),
            ],
        )
        got = {r["check"]: r["violations"] for r in out.collect()}
        assert got == {
            "not_null(name)": 1,      # id 3
            "in_range(age,0,150)": 2,  # ids 2, 4 (NULL passes)
            "in_set(country)": 1,      # id 4
            "matches_regex(name)": 0,  # NULL passes
            "adult": 1,                # id 2; NULL predicate passes
        }
        assert all(r["rows_checked"] == 5 for r in out.collect())

    def test_single_bound_range(self, people):
        out = run_checks(people, [in_range("age", lo=0)]).collect()
        assert out[0]["violations"] == 1

    def test_empty_frame_zero_violations(self, spark, people):
        out = run_checks(people.limit(0), [not_null("name")]).collect()
        assert out[0]["violations"] == 0
        assert out[0]["rows_checked"] == 0

    def test_duplicate_names_rejected(self, people):
        with pytest.raises(ValueError, match="duplicate"):
            run_checks(people, [not_null("name"), not_null("name")])

    def test_no_checks_rejected(self, people):
        with pytest.raises(ValueError, match="non-empty"):
            run_checks(people, [])

    def test_in_range_requires_bound(self):
        with pytest.raises(ValueError, match="bound"):
            in_range("age")

    def test_one_aggregation_pass(self, people):
        plan = run_checks(
            people, [not_null("name"), in_range("age", 0, 150)],
        )._jdf.queryExecution().executedPlan().toString()
        # N checks share one scan: exactly one pair of hash aggregates
        # (partial + final), no join or union of per-check subplans.
        assert plan.count("HashAggregate") == 2
        assert "Join" not in plan


class TestDatasetChecks:
    def test_unique_violations(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "a"), (2, "b"), (3, "c")],
            "k long, v string",
        )
        row = unique_violations(df, "k").collect()[0]
        assert row["check"] == "unique(k)"
        assert row["violations"] == 2  # group of 3 → 2 surplus rows
        assert row["rows_checked"] == 5

    def test_unique_clean(self, people):
        assert unique_violations(people, ["id"]).collect()[0]["violations"] == 0

    def test_referential_violations(self, spark, people):
        dim = spark.createDataFrame([("US",), ("GB",)], "code string")
        row = referential_violations(people, "country", dim, "code").collect()[0]
        assert row["check"] == "references(country)"
        assert row["violations"] == 2  # FR, XX
        assert row["rows_checked"] == 5

    def test_referential_null_passes(self, spark):
        df = spark.createDataFrame([(None,), ("US",)], "country string")
        dim = spark.createDataFrame([("US",)], "code string")
        assert referential_violations(df, "country", dim, "code").collect()[0][
            "violations"
        ] == 0

    def test_suite_unions_cleanly(self, spark, people):
        dim = spark.createDataFrame([("US",), ("GB",), ("FR",)], "code string")
        suite = (
            run_checks(people, [not_null("name")])
            .unionByName(unique_violations(people, "id"))
            .unionByName(referential_violations(people, "country", dim, "code"))
        )
        assert suite.count() == 3


class TestFrameDiff:
    def test_statuses(self, spark):
        left = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
            "k long, v string, x double",
        )
        right = spark.createDataFrame(
            [(2, "b", 20.0), (3, "c", None), (4, "D", 40.0), (5, "e", 50.0)],
            "k long, v string, x double",
        )
        got = {
            r["k"]: r["diff_status"]
            for r in frame_diff(left, right, "k").collect()
        }
        assert got == {
            1: "removed",
            2: "unchanged",
            3: "unchanged",  # NULL == NULL is unchanged (null-safe)
            4: "changed",
            5: "added",
        }

    def test_null_vs_value_is_changed(self, spark):
        left = spark.createDataFrame([(1, None)], "k long, v string")
        right = spark.createDataFrame([(1, "x")], "k long, v string")
        assert frame_diff(left, right, "k").collect()[0]["diff_status"] == "changed"

    def test_explicit_compare_cols(self, spark):
        left = spark.createDataFrame([(1, "a", 1)], "k long, v string, noise int")
        right = spark.createDataFrame([(1, "a", 2)], "k long, v string, noise int")
        out = frame_diff(left, right, "k", compare_cols=["v"])
        assert out.collect()[0]["diff_status"] == "unchanged"
        assert out.columns == ["k", "left_v", "right_v", "diff_status"]

    def test_single_shuffle_plan(self, spark):
        left = spark.range(100).withColumn("v", F.col("id") % 7)
        right = spark.range(50, 150).withColumn("v", F.col("id") % 5)
        plan = frame_diff(
            left, right, "id",
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1


class TestProfileColumns:
    def test_metrics(self, people):
        prof = {r["column"]: r for r in profile_columns(people, exact_distinct=True).collect()}
        assert set(prof) == {"id", "name", "age", "country"}
        assert prof["name"]["row_count"] == 5
        assert prof["name"]["null_count"] == 1
        assert prof["name"]["distinct_count"] == 4
        assert prof["age"]["min_value"] == "-5"
        assert prof["age"]["max_value"] == "200"
        assert prof["country"]["distinct_count"] == 4
        assert prof["country"]["min_value"] == "FR"

    def test_approx_mode_close(self, people):
        prof = {r["column"]: r for r in profile_columns(people).collect()}
        # HLL on 5 values is exact in practice
        assert prof["country"]["distinct_count"] == 4

    def test_subset_and_missing(self, people):
        assert profile_columns(people, ["id"]).count() == 1
        with pytest.raises(ValueError, match="not in frame"):
            profile_columns(people, ["nope"])
        with pytest.raises(ValueError, match="no columns"):
            profile_columns(people, [])

    def test_one_scan_plan(self, people):
        plan = profile_columns(
            people, exact_distinct=False,
        )._jdf.queryExecution().executedPlan().toString()
        # one partial + one final aggregate (HLL buffers may compile to
        # SortAggregate), sharing a single scan — no join, no union
        assert plan.count("HashAggregate") + plan.count("SortAggregate") == 2
        assert "Join" not in plan


class TestSchemaDrift:
    def test_no_drift_is_empty_report(self, spark):
        from rdsa_utils_spark.operators.quality import schema_drift

        df = spark.createDataFrame([(1, "a")], "id long, name string")
        assert schema_drift(df, df.select("name", "id")) == []  # order ignored

    def test_added_removed_type_changed(self, spark):
        from rdsa_utils_spark.operators.quality import schema_drift

        exp = spark.createDataFrame([(1, "a", 1.0)], "id long, name string, v double")
        act = spark.createDataFrame([(1, 2, True)], "id long, v int, extra boolean")
        report = {d["column"]: d for d in schema_drift(exp, act)}
        assert report["extra"]["status"] == "added"
        assert report["name"]["status"] == "removed"
        assert report["v"]["status"] == "type_changed"
        assert report["v"]["expected_type"] == "double"
        assert report["v"]["actual_type"] == "int"
        assert "id" not in report

    def test_accepts_structtype_and_nested_changes(self, spark):
        from pyspark.sql.types import (
            LongType, StructField, StructType, StringType,
        )

        from rdsa_utils_spark.operators.quality import schema_drift

        expected = StructType([
            StructField("id", LongType()),
            StructField("payload", StructType([StructField("a", StringType())])),
        ])
        act = spark.createDataFrame(
            [(1, (2,))], "id long, payload struct<a: long>",
        )
        [d] = schema_drift(expected, act)
        assert d["column"] == "payload" and d["status"] == "type_changed"

    def test_require_schema_gate(self, spark):
        import pytest as _pytest

        from rdsa_utils_spark.exceptions import SchemaDriftError
        from rdsa_utils_spark.operators.quality import require_schema

        exp = spark.createDataFrame([(1, "a")], "id long, name string")
        ok = spark.createDataFrame([(2, "b")], "id long, name string")
        assert require_schema(ok, exp) is ok
        extra = ok.withColumn("extra", ok.id + 1)
        with _pytest.raises(SchemaDriftError, match="extra: added"):
            require_schema(extra, exp)
        assert require_schema(extra, exp, allow_added=True) is extra
        bad = spark.createDataFrame([(1, 2)], "id long, name long")
        with _pytest.raises(SchemaDriftError, match="string -> bigint"):
            require_schema(bad, exp, allow_added=True)


def test_benford_deviation_on_benford_like_data(spark):
    import math

    from rdsa_utils_spark.operators.quality import benford_deviation
    from pyspark.sql import functions as F  # noqa: F401

    # Geometric series 1.05^i spans many decades -> near-Benford digits.
    rows = [(1.05 ** i,) for i in range(1, 400)]
    rows += [(0.0,), (None,)]  # excluded
    df = spark.createDataFrame(rows, "v double")
    out = {r.digit: r for r in benford_deviation(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    n = sum(r.n_obs for r in out.values())
    assert n == 399
    # Digit-1 expectation ~ 30.1% of rows, and low chi2 overall.
    assert out[1].expected == pytest.approx(math.log10(2) * 399, abs=1e-3)
    stat = sum(r.chi2_contrib for r in out.values())
    assert stat < 20.0
    # Negative values use |x|; magnitudes < 1 still have a first digit.
    # ALL nine digits appear (absent ones with n_obs=0 so their
    # (0-E)^2/E terms enter the statistic).
    neg = spark.createDataFrame([(-234.5,), (0.071,)], "v double")
    got = {r.digit: r.n_obs for r in benford_deviation(neg, "v").collect()}
    assert got == {d: (1 if d in (2, 7) else 0) for d in range(1, 10)}


def test_detect_pii_columns_single_scan_and_rates(spark):
    from rdsa_utils_spark.operators.quality import detect_pii_columns
    from rdsa_utils_spark.plans.explain import count_exchanges

    df = spark.createDataFrame(
        [
            ("a@b.com", "clean", 1),
            ("no pii here", "10.0.0.1", 2),
            (None, "call +1 555 123 4567", 3),
        ],
        "c1 string, c2 string, k long",
    )
    out = detect_pii_columns(df)  # auto-selects string columns only
    got = {(r.column_name, r.pattern): (r.n_matching, r.match_rate)
           for r in out.collect()}
    assert set(c for c, _ in got) == {"c1", "c2"}
    assert got[("c1", "email")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert got[("c2", "ipv4")][0] == 1
    # Triage counts are per-pattern on the RAW text (unlike redact_pii's
    # sequenced counts): a dotted IPv4 is phone-shaped too.
    assert got[("c2", "phone")][0] == 2
    assert got[("c1", "ipv4")][0] == 0
    # ONE scan, one global aggregation (its partial->final single-
    # partition funnel plans as two exchanges) — and no joins, so no
    # per-column or per-pattern jobs.
    assert count_exchanges(out) <= 2
    from rdsa_utils_spark.plans.explain import plan_string

    assert "Join" not in plan_string(out)
    import pytest as _pt

    with _pt.raises(ValueError):
        detect_pii_columns(df.select("k"))


def test_frame_checksum_order_and_partition_invariant(spark):
    from rdsa_utils_spark.operators.quality import frame_checksum

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "k long, v string",
    )
    base = frame_checksum(df, ["k", "v"]).first()
    assert base.n_rows == 3
    # reversed row order, different partitioning -> identical digest
    shuffled = frame_checksum(
        df.orderBy(F.col("k").desc()).repartition(7), ["k", "v"],
    ).first()
    assert (base.n_rows, base.checksum) == (shuffled.n_rows, shuffled.checksum)
    # any value change -> different digest
    changed = frame_checksum(
        df.withColumn("v", F.when(F.col("k") == 3, "X").otherwise(F.col("v"))),
        ["k", "v"],
    ).first()
    assert changed.checksum != base.checksum
    # NULL vs the string 'NULL' must not collide
    lit_null = frame_checksum(
        df.withColumn("v", F.when(F.col("k") == 2, "NULL").otherwise(F.col("v"))),
        ["k", "v"],
    ).first()
    assert lit_null.checksum != base.checksum

    import pytest as _pytest

    with _pytest.raises(ValueError, match="cols"):
        frame_checksum(df, [])
