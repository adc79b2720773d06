"""Property-based tests (hypothesis): extended-JSON round-trip fidelity
and upsert last-write-wins fold equivalence.

Example counts are small — every example runs Spark jobs — but inputs
are adversarial (random unicode, extreme decimals, duplicate keys)."""

from __future__ import annotations

import datetime as dt
import os
from decimal import Decimal

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
    DecimalType,
)

from datapipeline_dags_spark.functions.extended_json import (
    from_extended_json,
    oid_field,
    to_extended_json,
)
from datapipeline_dags_spark.sinks.upsert import UpsertSink

SCHEMA = StructType(
    [
        oid_field("_id"),
        StructField("when", TimestampType()),
        StructField("amount", DecimalType(38, 6)),
        StructField("n", LongType()),
        StructField("note", StringType()),
    ]
)

oids = st.text(alphabet="0123456789abcdef", min_size=24, max_size=24)
# DATE_FMT carries millisecond precision — generate ms-aligned instants
timestamps = st.datetimes(
    min_value=dt.datetime(1971, 1, 1), max_value=dt.datetime(2200, 1, 1)
).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000))
amounts = st.decimals(
    min_value=Decimal("-99999999.999999"),
    max_value=Decimal("99999999.999999"),
    places=6,
    allow_nan=False,
    allow_infinity=False,
)
notes = st.text(min_size=0, max_size=40).filter(lambda s: "\x00" not in s)
records = st.tuples(oids, timestamps, amounts, st.integers(-(2**62), 2**62), notes)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(records, min_size=1, max_size=10))
def test_extended_json_roundtrip_property(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    back = (
        df.select(to_extended_json(F.struct(*df.columns), SCHEMA).alias("j"))
        .select(from_extended_json("j", SCHEMA).alias("r"))
        .select("r.*")
        .collect()
    )
    got = sorted((r._id, r.when, r.amount, r.n, r.note) for r in back)
    want = sorted((o, w, a.quantize(Decimal("0.000001")), n, s) for o, w, a, n, s in rows)
    assert got == want


keys = st.sampled_from(["k1", "k2", "k3", "k4"])
batch = st.lists(st.tuples(keys, st.integers(0, 100)), min_size=1, max_size=6)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(batch, min_size=1, max_size=3))
def test_upsert_fold_equivalence(spark, tmp_path_factory, batches):
    """Applying batches through the MERGE sink must equal the driver-side
    fold: per key, the row with the highest seq wins (order_by), later
    batches override earlier ones."""
    db = str(tmp_path_factory.mktemp("prop") / "t.duckdb")
    sink = UpsertSink(db, "t", keys=["k"], order_by="seq")
    expected: dict[str, int] = {}
    seq = 0
    for b in batches:
        rows = []
        best: dict[str, tuple[int, int]] = {}
        for k, v in b:
            rows.append((k, v, seq))
            # within a batch: keep the highest seq (ties keep the later row
            # deterministically via seq uniqueness)
            best[k] = (seq, v)
            seq += 1
        df = spark.createDataFrame(rows, "k string, v long, seq long")
        sink.write(df)
        for k, (_, v) in best.items():
            expected[k] = v
    con = duckdb.connect(db)
    try:
        got = dict(con.execute("SELECT k, v FROM t").fetchall())
    finally:
        con.close()
    assert got == expected


# ---------------------------------------------------------------------------
# Connected components ≡ union-find on random graphs
# ---------------------------------------------------------------------------


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation must agree with sequential union-find on
    arbitrary graphs — including chains longer than the typical dup
    cluster, which exercise the multi-round convergence path."""
    from datapipeline_dags_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "src: long, dst: long")
    # default route (r12: gated driver-side union-find at this size)
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == _union_find_components(edges)
    # the distributed propagation must agree too — force it past the gate
    os.environ["SPARK_GRAFT_COLLECT_ROUTE"] = "distributed"
    try:
        dist = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        jumped = {
            r["node"]: r["component"]
            for r in connected_components(df, pointer_jump=True).collect()
        }
    finally:
        del os.environ["SPARK_GRAFT_COLLECT_ROUTE"]
    assert dist == got
    assert jumped == got


def test_pointer_jump_converges_on_long_path(spark):
    """A 300-node path has diameter 299 — far beyond the plain
    min-label round budget; pointer jumping must converge in
    O(log diameter) rounds (the q209 grid-cell regime)."""
    from datapipeline_dags_spark.operators import graph
    from datapipeline_dags_spark.operators.graph import connected_components

    n = 300
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    # force the distributed propagation: the round-count bound is the
    # property under test, and the r12 collect gate would otherwise
    # solve this tiny graph driver-side
    os.environ["SPARK_GRAFT_COLLECT_ROUTE"] = "distributed"
    try:
        got = connected_components(df, pointer_jump=True).collect()
    finally:
        del os.environ["SPARK_GRAFT_COLLECT_ROUTE"]
    assert all(r["component"] == 0 for r in got)
    assert len(got) == n
    assert graph.LAST_ROUNDS <= 14  # ~log2(300) + slack, vs 299 plain


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(
            allow_nan=False,
            allow_infinity=False,
            min_value=-1e15,
            max_value=1e15,
        ),
        min_size=2,
        max_size=40,
    )
)
def test_dxp_obin_monotone(spark, vals):
    """The log-scale bin of the collected percentile route must be
    MONOTONE in the value (bin order == value order) — the invariant
    the driver-side rank locate relies on.  java Math.log guarantees
    semi-monotonicity by spec; this pins the full expression
    (sign split, +1 shift, scale, floor) over adversarial doubles."""
    from datapipeline_dags_spark.plans.scalars import DXP_LN_SCALE, _dxp_obin

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = (
        df.select("v", _dxp_obin(F.col("v"), DXP_LN_SCALE).alias("ob"))
        .orderBy("v")
        .collect()
    )
    bins = [r["ob"] for r in rows]
    assert all(a <= b for a, b in zip(bins, bins[1:])), (
        list(zip([r["v"] for r in rows], bins))
    )
