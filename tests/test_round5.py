"""Round-5 operators: Kaplan-Meier survival, weighted quantiles, URL
canonicalization/dedup/domain stats, label-propagation communities."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.graph import label_propagation
from rdsa_utils_spark.operators.stats import kaplan_meier, weighted_quantiles
from rdsa_utils_spark.operators.text import (
    canonical_url,
    domain_stats,
    url_dedup,
    url_host,
)


# ------------------------------------------------------------ kaplan_meier

def test_kaplan_meier_textbook_curve(spark):
    """Hand-checked product-limit: 4 subjects in group a (events at 5
    and 8, censored at 5 and 10) → S(5)=3/4, S(8)=3/8; group b loses
    everyone at t=2 → S=0."""
    df = spark.createDataFrame(
        [("a", 5.0, 1), ("a", 5.0, 0), ("a", 8.0, 1), ("a", 10.0, 0),
         ("b", 2.0, 1), ("b", 2.0, 1)],
        "g string, dur double, ev int",
    )
    got = {
        (r.g, r.t): (r.n_risk, r.n_events, r.survival)
        for r in kaplan_meier(df, ["g"], "dur", "ev").collect()
    }
    assert got == {
        ("a", 5.0): (4, 1, 0.75),
        ("a", 8.0): (2, 1, 0.375),
        ("b", 2.0): (2, 2, 0.0),
    }


def test_kaplan_meier_censored_only_group_emits_nothing(spark):
    df = spark.createDataFrame(
        [("c", 3.0, 0), ("c", 7.0, 0)], "g string, dur double, ev int",
    )
    assert kaplan_meier(df, ["g"], "dur", "ev").count() == 0


# ------------------------------------------------------- weighted_quantiles

def test_weighted_quantiles_hand_checked(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 2.0), ("b", 5.0, 10.0)],
        "g string, v double, w double",
    )
    got = {
        (r.g, r.q): r.weighted_quantile
        for r in weighted_quantiles(df, ["g"], "v", "w", [0.5, 0.9]).collect()
    }
    assert got == {("a", 0.5): 2.0, ("a", 0.9): 3.0, ("b", 0.5): 5.0, ("b", 0.9): 5.0}


def test_weighted_quantiles_reduces_to_unweighted_median(spark):
    """With unit weights, q=0.5 equals the lower median."""
    df = spark.createDataFrame(
        [("g", float(v), 1.0) for v in range(1, 11)], "g string, v double, w double",
    )
    (row,) = weighted_quantiles(df, ["g"], "v", "w", [0.5]).collect()
    assert row.weighted_quantile == 5.0  # smallest v with cumw >= 5


def test_weighted_quantiles_validates_q(spark):
    df = spark.createDataFrame([("g", 1.0, 1.0)], "g string, v double, w double")
    with pytest.raises(ValueError, match="quantiles"):
        weighted_quantiles(df, ["g"], "v", "w", [0.0])
    with pytest.raises(ValueError, match="quantiles"):
        weighted_quantiles(df, ["g"], "v", "w", [1.5])


# ---------------------------------------------------------------- URL ops

CANON_CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM/Path/?utm_source=x&id=3#frag",
     "https://example.com/Path?id=3"),
    ("https://example.com/Path?id=3", "https://example.com/Path?id=3"),
    ("http://sub.example.com/a/b/", "http://sub.example.com/a/b"),
    ("https://example.com/?gclid=abc", "https://example.com"),
    ("https://example.com", "https://example.com"),
    ("https://example.com/x?utm_source=a&utm_medium=b&keep=1",
     "https://example.com/x?keep=1"),
    ("https://example.com/x?ref=rss", "https://example.com/x"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CANON_CASES], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    assert got == [c for _, c in CANON_CASES]


def test_url_host(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Ex.COM:8080/a",), ("http://data.gov.uk/x?y=1",)], "url string",
    )
    assert [r[0] for r in df.select(url_host("url")).collect()] == [
        "ex.com", "data.gov.uk",
    ]


def test_url_dedup_keeps_min_id_per_canonical(spark):
    df = spark.createDataFrame(
        [(2, "https://example.com/a?utm_source=x"),
         (1, "https://EXAMPLE.com/a"),
         (3, "https://example.com/b")],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.canonical_url for r in url_dedup(df, "url", "doc_id").collect()}
    assert got == {1: "https://example.com/a", 3: "https://example.com/b"}


def test_domain_stats_dup_ratio(spark):
    df = spark.createDataFrame(
        [(1, "https://example.com/a"), (2, "https://example.com/a#x"),
         (3, "https://example.com/b"), (4, "https://other.net/c")],
        "doc_id long, url string",
    )
    got = {r.host: (r.n_pages, r.n_canonical, r.dup_ratio)
           for r in domain_stats(df, "url", "doc_id").collect()}
    assert got == {"example.com": (3, 2, round(1 - 2 / 3, 6)), "other.net": (1, 1, 0.0)}


# ------------------------------------------------------- label_propagation

def test_label_propagation_two_triangles(spark):
    """Two triangles joined by a single bridge stay two communities —
    the separation connected_components cannot make."""
    from rdsa_utils_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    lpa = {r.node: r.community for r in label_propagation(edges, iterations=3).collect()}
    assert len(set(lpa.values())) == 2
    assert lpa[1] == lpa[2] == lpa[3]
    assert lpa[4] == lpa[5] == lpa[6]
    cc = {r.id: r.cluster_id for r in connected_components(edges).collect()}
    assert len(set(cc.values())) == 1  # one component — LPA is finer


def test_label_propagation_deterministic_and_validates(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    a = sorted(tuple(r) for r in label_propagation(edges, iterations=2).collect())
    b = sorted(tuple(r) for r in label_propagation(edges, iterations=2).collect())
    assert a == b
    with pytest.raises(ValueError, match="iterations"):
        label_propagation(edges, iterations=0)
