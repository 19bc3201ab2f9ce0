"""Unit tests for core relational operators (golden inline frames —
the reference's test strategy, SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal

from rdsa_utils_spark.operators.filters import (
    filter_out_values,
    map_column_names,
    map_column_values,
    set_nulls,
)
from rdsa_utils_spark.operators.reshape import (
    flatten_struct_columns,
    melt,
    pack_struct_column,
    unpack_list_col,
)
from rdsa_utils_spark.operators.sets import union_mismatched_dfs, union_multi_dfs
from rdsa_utils_spark.operators.windows import (
    drop_duplicates_reproducible,
    select_first_obs_appearing_in_group,
    top_k_per_group,
)
from rdsa_utils_spark.operators.aggregations import (
    aggregate_col,
    assert_same_distinct_values,
    check_year_range,
    count_nulls,
    get_unique,
    has_no_nulls,
    sum_columns,
)


def test_melt(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 30.0, 40.0)], "id long, a double, b double",
    )
    out = melt(df, ["id"], ["a", "b"], var_name="var", value_name="val")
    expected = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0), (2, "b", 40.0)],
        "id long, var string, val double",
    )
    assert_df_equal(out, expected, sort_cols=["id", "var"])


def test_melt_missing_column_raises(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, a double")
    with pytest.raises(ValueError, match="not in dataframe"):
        melt(df, ["id"], ["nope"])


def test_unpack_list_col(spark):
    df = spark.createDataFrame([(1, ["x", "y"])], "id long, tags array<string>")
    out = unpack_list_col(df, "tags", "tag")
    assert [tuple(r) for r in out.orderBy("tag").collect()] == [(1, "x"), (1, "y")]


def test_pack_and_flatten_struct(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, v double")
    packed = pack_struct_column(df, "payload", ["name", "v"])
    assert packed.columns == ["id", "payload"]
    flat = flatten_struct_columns(packed)
    assert flat.columns == ["id", "payload_name", "payload_v"]
    assert flat.first()["payload_name"] == "a"


def test_pack_struct_placeholder(spark):
    df = spark.createDataFrame([(1,)], "id long")
    packed = pack_struct_column(df, "payload", None)
    field = packed.schema["payload"].dataType.fields[0]
    assert field.name == "no_payload"
    assert packed.first()["payload"]["no_payload"] is None


def test_filter_out_values_null_handling(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id long, v string",
    )
    kept = filter_out_values(df, "v", ["a"], keep_nulls=True)
    assert sorted(r["id"] for r in kept.collect()) == [2, 3]
    dropped = filter_out_values(df, "v", ["a"], keep_nulls=False)
    assert sorted(r["id"] for r in dropped.collect()) == [2]


def test_set_nulls_preserves_other_values(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, None)], "id long, v string")
    out = set_nulls(df, "v", ["x"])
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert rows == {1: None, 2: "y", 3: None}


def test_map_column_values_fallback(spark):
    df = spark.createDataFrame([(1, "a"), (2, "zz")], "id long, v string")
    out = map_column_values(df, {"a": "A"}, "v", "w")
    rows = {r["id"]: r["w"] for r in out.collect()}
    assert rows == {1: "A", 2: "zz"}


def test_map_column_names(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    assert map_column_names(df, {"a": "x"}).columns == ["x", "b"]


def test_union_multi_and_mismatched(spark):
    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([(2, "y")], "id long, v string")
    c = spark.createDataFrame([(3,)], "id long")
    assert union_multi_dfs([a, b]).count() == 2
    out = union_mismatched_dfs([a, c])
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert rows == {1: "x", 3: None}


def test_drop_duplicates_reproducible(spark):
    df = spark.createDataFrame(
        [("k", 2, "second"), ("k", 1, "first"), ("j", 5, "only")],
        "key string, seq long, v string",
    )
    out = drop_duplicates_reproducible(df, "key", id_col="seq")
    rows = {r["key"]: r["v"] for r in out.collect()}
    assert rows == {"k": "first", "j": "only"}


def test_drop_duplicates_warns_without_id(spark):
    df = spark.createDataFrame([("k", 1)], "key string, v long")
    with pytest.warns(RuntimeWarning, match="monotonically_increasing_id"):
        out = drop_duplicates_reproducible(df, "key")
    assert out.count() == 1
    assert out.columns == ["key", "v"]


def test_drop_duplicates_keeps_user_dedup_id_col(spark):
    # A user column named __dedup_id__ must survive when passed as the
    # explicit tiebreaker (the helper only drops the one it creates).
    df = spark.createDataFrame(
        [("k", 2), ("k", 1)], "key string, __dedup_id__ long",
    )
    out = drop_duplicates_reproducible(df, "key", id_col="__dedup_id__")
    assert out.columns == ["key", "__dedup_id__"]
    assert out.first()["__dedup_id__"] == 1


def test_select_first_obs(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-02", 1), ("a", "2024-01-01", 2), ("b", "2024-05-05", 3)],
        "g string, d string, v long",
    )
    out = select_first_obs_appearing_in_group(df, ["g"], "d", ascending=True)
    rows = {r["g"]: r["v"] for r in out.collect()}
    assert rows == {"a": 2, "b": 3}


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(5)], "g string, id long, v double",
    )
    out = top_k_per_group(df, "g", "v", k=2, ascending=False)
    assert sorted(r["id"] for r in out.collect()) == [3, 4]


def test_aggregations_small(spark):
    df = spark.createDataFrame(
        [(1, 2.0, None), (2, 4.0, "x"), (3, 6.0, "x")],
        "id long, v double, s string",
    )
    assert aggregate_col(df, "v", "sum") == 12.0
    assert aggregate_col(df, "v", "mean") == 4.0
    with pytest.raises(ValueError):
        aggregate_col(df, "v", "nope")
    nulls = count_nulls(df)
    assert nulls["s"].iloc[0] == 1 and nulls["v"].iloc[0] == 0
    assert get_unique(df, "s") == ["x", None]
    assert get_unique(df, "s", remove_null=True) == ["x"]
    assert has_no_nulls(df, "v") is True
    assert has_no_nulls(df, "s") is False


def test_sum_columns(spark):
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], "a double, b double")
    out = sum_columns(df, ["a", "b"], "total")
    assert sorted(r["total"] for r in out.collect()) == [3.0, 7.0]


def test_check_year_range(spark):
    df = spark.createDataFrame([(2020,), (2021,), (2022,)], "y int")
    check_year_range(df, 2020, 2022, "y")
    with pytest.raises(ValueError, match="missing years"):
        check_year_range(df, 2019, 2022, "y")


def test_assert_same_distinct_values(spark):
    a = spark.createDataFrame([(1,), (2,)], "v int")
    b = spark.createDataFrame([(2,), (1,), (1,)], "v int")
    assert_same_distinct_values(a, b, "v")
    c = spark.createDataFrame([(3,)], "v int")
    with pytest.raises(ValueError, match="only in"):
        assert_same_distinct_values(a, c, "v")


def test_epoch_double_ntz_requires_utc_session(spark):
    """NTZ→epoch dispatch is exact only under UTC; any other session
    zone raises instead of silently computing DST-shifted epochs."""
    from pyspark.sql import functions as F

    from rdsa_utils_spark.functions.columns import epoch_double

    df = spark.createDataFrame(
        [("2024-06-01 12:00:00",)], "s string",
    ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
    # UTC (the engine/test default): exact epoch
    val = df.select(epoch_double(df, "ts").alias("e")).collect()[0].e
    assert val == 1717243200.0
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="only exact under UTC"):
            df.select(epoch_double(df, "ts"))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
