"""Tests for DataFrame sugar and validation glue."""

from __future__ import annotations

import pytest
from pyspark.sql import Column, functions as F

from rdsa_utils_spark.frame import (
    apply_col_func,
    find_spark_dataframes,
    is_df_empty,
    to_spark_col,
    transform_,
)
from rdsa_utils_spark.validation import (
    allowed_date_format,
    apply_validation,
    list_convert_validator,
)


def test_to_spark_col(spark):
    @to_spark_col(exclude=["label"])
    def scaled(col, factor=2.0, label="x"):
        assert isinstance(col, Column)
        assert isinstance(label, str)
        return (col * factor).alias(label)

    df = spark.createDataFrame([(3.0,)], "v double")
    assert df.select(scaled("v", label="out")).first()["out"] == 6.0


def test_transform_and_apply_col_func(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")

    def add_one(frame, col):
        return frame.withColumn(col, F.col(col) + 1)

    out = apply_col_func(df, ["a", "b"], add_one)
    assert tuple(out.first()) == (2.0, 3.0)
    piped = transform_(df, apply_col_func, ["a"], add_one)
    assert piped.first()["a"] == 2.0


def test_is_df_empty_and_find_frames(spark):
    empty = spark.createDataFrame([], "v int")
    full = spark.createDataFrame([(1,)], "v int")
    assert is_df_empty(empty) is True
    assert is_df_empty(full) is False
    found = find_spark_dataframes({"empty": empty, "full": full, "n": 3, "_hidden": full})
    assert set(found) == {"empty", "full"}


def test_validation_helpers():
    pydantic = pytest.importorskip("pydantic")

    class Section(pydantic.BaseModel):
        names: list
        when: str

    cfg = {"sec": {"names": ["a"], "when": "2024-01-31"}}
    out = apply_validation(cfg, {"sec": Section})
    assert out["sec"]["names"] == ["a"]
    assert list_convert_validator("x") == ["x"]
    assert list_convert_validator(None) == []
    assert allowed_date_format("2024-01-31") == "2024-01-31"
    with pytest.raises(ValueError, match="does not match format"):
        allowed_date_format("31/01/2024")
