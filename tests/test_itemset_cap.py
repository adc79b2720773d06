"""q179 basket cap: the within-basket triple explode is C(basket, 3) —
cubic — so giant baskets must truncate deterministically and
observably (the q173 member-cap discipline)."""

from __future__ import annotations

import pandas as pd
import pytest

from datapipeline_dags_spark.plans import relational


@pytest.fixture(scope="module")
def giant_basket_dir(tmp_path_factory):
    # two identical 200-part orders: uncapped they would emit
    # C(200,3) = 1 313 400 triples each; capped, C(50,3) = 19 600
    rows = []
    for ok in (1, 2):
        for pk in range(200):
            rows.append((ok, pk, 1, pk + 1, 1.0, 100.0, 0.0, 0.0, "N", "O",
                         "1995-01-01"))
    pdf = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    pdf["l_shipdate"] = pd.to_datetime(pdf["l_shipdate"]).dt.date
    d = tmp_path_factory.mktemp("giant_basket")
    pdf.to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


def test_giant_baskets_are_capped_and_observable(spark, giant_basket_dir):
    out = relational.q179_itemset_triples(spark, giant_basket_dir).collect()
    assert len(out) == relational.TRIPLE_TOP
    cap = relational.TRIPLE_MAX_BASKET
    # only the bottom-cap partkeys survive the truncation
    for r in out:
        assert r["part_c"] < cap
        assert r["support"] == 2
    obs = relational.BASKET_OBSERVATIONS["q179_itemset_triples"].get
    assert obs["buckets"] == 2
    assert obs["capped_buckets"] == 2
    assert obs["max_bucket_size"] == 200
