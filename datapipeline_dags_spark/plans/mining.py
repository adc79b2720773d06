"""Corpus-mining & statistics queries (SURVEY.md §2.11, r6 batch 2).

Graph analytics (triangle counting), distribution drift (two-sample
Kolmogorov–Smirnov), iterative clustering (Lloyd k-means in integer
fixed-point), robust outlier detection (MAD built on the q186
``distributed_percentiles`` primitive), and readability scoring — the
second tier of analyses a training-data curation pipeline runs on top
of the reference's ingest surface (reference scope:
parallelized_data_pipeline_dag.py orchestrates ingest only; the engine
declares the analytics the ingested corpus feeds).

Scale discipline matches the rest of the corpus: basket caps before
quadratic explodes, degree-ordered orientation bounding wedge fan-out,
bounded-domain collapses before windows, integer arithmetic wherever a
value crosses the engine-parity boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.operators import blocking
from datapipeline_dags_spark.checkpoint import local_checkpoint
from datapipeline_dags_spark.plans.helpers import dec
from datapipeline_dags_spark.plans.llm_ops import _SHINGLES_SQL, _fanout, _shingles
from datapipeline_dags_spark.plans.registry import query
from datapipeline_dags_spark.plans.route import bounded_collect, collect_and_solve
from datapipeline_dags_spark.plans.scalars import distributed_percentiles

#: cap counters for this module's quadratic-risk explodes (the
#: relational.BASKET_OBSERVATIONS / llm_ops.BUCKET_OBSERVATIONS
#: discipline).
MINING_OBSERVATIONS: dict[str, Observation] = {}

# ---------------------------------------------------------------------------
# q199 — co-purchase graph triangle census
# ---------------------------------------------------------------------------

#: baskets are capped to their TRI_MAX_BASKET smallest parts BEFORE the
#: pair explode (mirrored in the oracle — the q179 contract).
TRI_MAX_BASKET = 50
#: co-purchase pairs below this order-support are noise, not edges;
#: the threshold also sparsifies the graph before the wedge join.
TRI_MIN_SUPPORT = 2

#: DuckDB CTE body shared by the q199/q204 oracles — the same capped
#: basket explode -> support-thresholded pair agg the Spark side runs.
_EDGE_CTES = f"""
    b0 AS (SELECT l_orderkey,
                  (list_sort(list(DISTINCT l_partkey)))[1:{TRI_MAX_BASKET}]
                    AS parts
           FROM lineitem GROUP BY 1),
    b AS (SELECT l_orderkey, unnest(parts) AS pk FROM b0),
    e AS (SELECT x.pk AS a, y.pk AS bb
          FROM b x JOIN b y
            ON x.l_orderkey = y.l_orderkey AND x.pk < y.pk
          GROUP BY 1, 2 HAVING COUNT(*) >= {TRI_MIN_SUPPORT})"""


def _copurchase_edges(spark: SparkSession, sf_dir: str, qname: str) -> DataFrame:
    """The co-purchase edge table (a < bb, order-support >=
    {TRI_MIN_SUPPORT}) both graph queries build on: capped basket
    explode, pair agg, support threshold — checkpointed once because
    every consumer fans out over it multiple times (the q183
    derived-table discipline; keeps each consumer's physical plan at
    single-digit shuffles instead of re-deriving the explode per
    reference)."""
    li = table(spark, sf_dir, "lineitem")
    obs = Observation()
    MINING_OBSERVATIONS[qname] = obs
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .observe(
            obs,
            F.count(F.lit(1)).alias("baskets"),
            F.sum(
                (F.size("parts") > TRI_MAX_BASKET).cast("long")
            ).alias("capped_baskets"),
            F.max(F.size("parts")).alias("max_basket_size"),
        )
    )
    b = baskets.select(
        "l_orderkey",
        F.explode(F.slice("parts", 1, TRI_MAX_BASKET)).alias("pk"),
    )
    return local_checkpoint(
        b.select("l_orderkey", F.col("pk").alias("a"))
        .join(b.select("l_orderkey", F.col("pk").alias("bb")), "l_orderkey")
        .filter(F.col("a") < F.col("bb"))
        .groupBy("a", "bb")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= TRI_MIN_SUPPORT)
        .select("a", "bb"),
        f"{qname} edge table",
    )


@query(
    "q199_copurchase_triangles",
    oracle=f"""
    WITH {_EDGE_CTES},
    deg AS (SELECT n, COUNT(*) AS d
            FROM (SELECT a AS n FROM e UNION ALL SELECT bb FROM e)
            GROUP BY 1),
    tri AS (SELECT COUNT(*) AS t
            FROM e e1
            JOIN e e2 ON e2.a = e1.bb
            JOIN e e3 ON e3.a = e1.a AND e3.bb = e2.bb),
    agg AS (SELECT COUNT(*) AS n_nodes,
                   SUM(d * (d - 1) / 2) AS wedges
            FROM deg)
    SELECT CAST(agg.n_nodes AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(tri.t AS BIGINT) AS n_triangles,
           CAST(agg.wedges AS BIGINT) AS n_wedges,
           (ROUND(CASE WHEN agg.wedges = 0 THEN 0.0
                       ELSE 3.0 * tri.t / agg.wedges END, 6) + 0.0)
             AS global_clustering
    FROM agg, tri
    """,
)
def q199_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph: nodes are parts,
    an edge joins two parts co-ordered in >= {TRI_MIN_SUPPORT} orders,
    and the output is the triangle count plus the global clustering
    coefficient 3*triangles/wedges — the graph-cohesion statistic
    behind bundle discovery and link-spam detection on co-occurrence
    graphs.

    Scale shape (the Suri–Vassilvitskii MapReduce design): baskets are
    capped to {TRI_MAX_BASKET} smallest parts BEFORE the quadratic
    pair explode (observable via MINING_OBSERVATIONS, mirrored in the
    oracle); the support threshold sparsifies edges before any graph
    work; and the wedge join runs on DEGREE-ORIENTED edges — every
    edge points from its (degree, id)-smaller endpoint, so a node's
    out-degree is O(sqrt(m)) and the wedge fan-out is bounded m^1.5
    total even on power-law degree distributions where the naive
    per-node pair explode is quadratic in the hottest node's degree.
    Orientation changes which node 'owns' each wedge, never the closed
    count, so the id-ordered oracle agrees exactly.  All counts are
    integers; the single ratio takes the final 6dp round.
    """
    edges = _copurchase_edges(spark, sf_dir, "q199_copurchase_triangles")
    deg = local_checkpoint(
        edges.select(F.col("a").alias("n"))
        .unionAll(edges.select(F.col("bb").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d")),
        "q199 degree table",
    )
    # degree-oriented edges: u -> v iff (d_u, u) < (d_v, v)
    e2 = (
        edges.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("bb"), F.col("d").alias("db")), "bb")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("bb"))
    )
    # the oriented edge table feeds the wedge join twice plus the
    # semi-close — checkpoint so the two degree joins run once
    o = local_checkpoint(
        e2.select(
            F.when(fwd, F.col("a")).otherwise(F.col("bb")).alias("u"),
            F.when(fwd, F.col("bb")).otherwise(F.col("a")).alias("v"),
            F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
        ),
        "q199 oriented edges",
    )
    x, y = o.alias("x"), o.alias("y")
    wedge_lt = (F.col("x.dv") < F.col("y.dv")) | (
        (F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v"))
    )
    wedges = x.join(y, (F.col("x.u") == F.col("y.u")) & wedge_lt).select(
        F.col("x.v").alias("u"), F.col("y.v").alias("v")
    )
    tri = wedges.join(o.select("u", "v"), ["u", "v"], "left_semi").agg(
        F.count("*").alias("t")
    )
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    ecnt = edges.agg(F.count("*").alias("n_edges"))
    return (
        stats.crossJoin(ecnt)
        .crossJoin(tri)
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("t").cast("long").alias("n_triangles"),
            "n_wedges",
            dec(
                F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                    3.0 * F.col("t") / F.col("n_wedges")
                ),
                6,
            ).alias("global_clustering"),
        )
    )


# ---------------------------------------------------------------------------
# q200 — per-source Kolmogorov–Smirnov drift vs the rest of the corpus
# ---------------------------------------------------------------------------


@query(
    "q200_ks_source_drift",
    oracle="""
    WITH c AS (SELECT source, n_chars AS v, COUNT(*) AS n
               FROM documents GROUP BY 1, 2),
    vals AS (SELECT DISTINCT n_chars AS v FROM documents),
    tot AS (SELECT v, SUM(n) AS tn FROM c GROUP BY 1),
    ns AS (SELECT source, SUM(n) AS ns FROM c GROUP BY 1),
    bign AS (SELECT SUM(n) AS big_n FROM c),
    grid AS (SELECT ns.source, ns.ns, vals.v, tot.tn,
                    COALESCE(c.n, 0) AS n, bign.big_n
             FROM ns CROSS JOIN vals
             JOIN tot ON tot.v = vals.v
             CROSS JOIN bign
             LEFT JOIN c ON c.source = ns.source AND c.v = vals.v),
    cum AS (SELECT source, v, ns, big_n,
                   SUM(n) OVER (PARTITION BY source ORDER BY v) AS cs,
                   SUM(tn) OVER (PARTITION BY source ORDER BY v) AS ct
            FROM grid),
    d AS (SELECT source, v, ns, big_n,
                 ABS(cs * (big_n - ns) - (ct - cs) * ns) AS num,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY ABS(cs * (big_n - ns) - (ct - cs) * ns) DESC,
                            v) AS rk
          FROM cum)
    SELECT source, CAST(ns AS BIGINT) AS n_docs,
           (ROUND(num * 1.0 / (ns * (big_n - ns)), 6) + 0.0) AS d_stat,
           CAST(v AS BIGINT) AS at_len
    FROM d WHERE rk = 1
    """,
)
def q200_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per source: the max
    ECDF gap between one source's document-length distribution and
    the REST of the corpus — the standard nonparametric drift gate a
    curation pipeline runs per ingest source (did src7 start shipping
    truncated pages?), stronger than q123's binned PSI because it
    needs no bin choice.

    Scale shape: lengths collapse FIRST to the (source, length,
    count) table — |sources| x |distinct lengths| rows, both
    catalog/domain-bounded, never corpus-scale — the ECDFs are
    per-source cumulative windows over that bounded grid (no global
    window), and the KS sup-gap is computed in INTEGER
    cross-multiplied form |cs*(N-ns) - (ct-cs)*ns| so the argmax and
    tie-break (smallest length) are engine-exact; only the final
    normalized D gets the 6dp round.
    """
    docs = table(spark, sf_dir, "documents")
    c = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("n")
    )
    vals = docs.select(F.col("n_chars").alias("v")).distinct()
    tot = c.groupBy("v").agg(F.sum("n").alias("tn"))
    ns = c.groupBy("source").agg(F.sum("n").alias("ns"))
    big_n = c.agg(F.sum("n").alias("big_n"))
    grid = (
        ns.crossJoin(F.broadcast(vals))
        .join(F.broadcast(tot), "v")
        .crossJoin(F.broadcast(big_n))
        .join(c, ["source", "v"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
    )
    cw = (
        W.partitionBy("source")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = grid.select(
        "source",
        "v",
        "ns",
        "big_n",
        F.sum("n").over(cw).alias("cs"),
        F.sum("tn").over(cw).alias("ct"),
    )
    num = F.abs(
        F.col("cs") * (F.col("big_n") - F.col("ns"))
        - (F.col("ct") - F.col("cs")) * F.col("ns")
    )
    rw = W.partitionBy("source").orderBy(F.col("num").desc(), "v")
    d = cum.withColumn("num", num).withColumn(
        "rk", F.row_number().over(rw)
    )
    return d.filter(F.col("rk") == 1).select(
        "source",
        F.col("ns").cast("long").alias("n_docs"),
        dec(
            F.col("num") * 1.0 / (F.col("ns") * (F.col("big_n") - F.col("ns"))),
            6,
        ).alias("d_stat"),
        F.col("v").cast("long").alias("at_len"),
    )


# ---------------------------------------------------------------------------
# q201 — distributed Lloyd k-means in integer fixed-point
# ---------------------------------------------------------------------------

KM_K = 8
KM_ROUNDS = 2
#: fixed-point scale: embeddings quantize to round-half-up
#: floor(x*1000 + 0.5) BIGINTs, so every distance / centroid update is
#: integer (order-independent sums => engine-exact iterative numerics,
#: the q183 PageRank discipline).
KM_FP = 1000

_KM_Q_SQL = (
    "list_transform(embedding, x -> "
    f"CAST(FLOOR(x::DOUBLE * {KM_FP} + 0.5) AS BIGINT))"
)


_KM_POS_UNNEST = (
    "unnest(list_transform(qa, (x, i) -> {'pos': i - 1, 'v': x})) AS u"
)

#: shared CTE chain of the two Lloyd rounds, ending at the final
#: assignment ``asg2`` — composed by q201 (stats) and q234 (external
#: validation vs labels), so the clustering and its audits can never
#: drift (the q99/q232 composition rule).
def _km_ctes() -> str:
    pos_unnest = _KM_POS_UNNEST
    return f"""q AS (SELECT vec_id, {_KM_Q_SQL} AS qa FROM embeddings),
    qpos AS (SELECT vec_id, us.u.pos AS pos, us.u.v AS qv
             FROM (SELECT vec_id, {pos_unnest} FROM q) us),
    seeds AS (SELECT vec_id, rn - 1 AS cid
              FROM (SELECT vec_id, ROW_NUMBER() OVER (
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
                    FROM embeddings)
              WHERE rn <= {KM_K}),
    c0 AS (SELECT seeds.cid, qpos.pos, qpos.qv AS cv
           FROM seeds JOIN qpos ON qpos.vec_id = seeds.vec_id),
    a1 AS (SELECT qpos.vec_id, c0.cid,
                  SUM((qpos.qv - c0.cv) * (qpos.qv - c0.cv)) AS dist
           FROM qpos JOIN c0 ON c0.pos = qpos.pos
           GROUP BY 1, 2),
    asg1 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY dist, cid) AS rk
               FROM a1) WHERE rk = 1),
    c1 AS (SELECT asg1.cid, qpos.pos,
                  CAST(FLOOR(SUM(qpos.qv) * 1.0 / COUNT(*)) AS BIGINT) AS cv
           FROM asg1 JOIN qpos ON qpos.vec_id = asg1.vec_id
           GROUP BY 1, 2),
    a2 AS (SELECT qpos.vec_id, c1.cid,
                  SUM((qpos.qv - c1.cv) * (qpos.qv - c1.cv)) AS dist
           FROM qpos JOIN c1 ON c1.pos = qpos.pos
           GROUP BY 1, 2),
    asg2 AS (SELECT vec_id, cid, dist FROM (
               SELECT vec_id, cid, dist, ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY dist, cid) AS rk
               FROM a2) WHERE rk = 1)"""


def _km_oracle() -> str:
    """DuckDB mirror of the two Lloyd rounds (CTE chain)."""
    return f"""
    WITH {_km_ctes()}
    SELECT CAST(asg2.cid AS INT) AS cid,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(asg2.dist) AS BIGINT) AS inertia_fp,
           CAST(MAX(cn.l2) AS BIGINT) AS centroid_l2sq_fp
    FROM asg2
    JOIN (SELECT cid, SUM(cv * cv) AS l2 FROM c1 GROUP BY 1) cn
      ON cn.cid = asg2.cid
    GROUP BY 1
    """


def _km_assign_numpy(
    spark: SparkSession, qdf: DataFrame, cents: "list[tuple[int, list[int]]]"
) -> DataFrame:
    """Numpy twin of the assign() HOF below: ALL-INTEGER fixed-point
    distances (int64 wraps identically to the JVM long), first-argmin
    over ascending-cid columns = array_min's (dist, cid) tie-break —
    trivially bit-exact, one Arrow pass instead of an interpreted
    k × dim zip_with fold per row."""
    import numpy as np
    import pandas as pd

    from datapipeline_dags_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    cids = np.asarray([c for c, _ in cents], dtype=np.int64)
    cb = np.asarray([v for _, v in cents], dtype=np.int64)

    def go(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.stack(pdf["qa"].to_numpy()).astype(np.int64)
            d = ((e[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            am = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "qa": pdf["qa"],
                    "cid": cids[am].astype(np.int32),
                    "dist": d[np.arange(len(pdf)), am],
                }
            )

    return qdf.select("vec_id", "qa").mapInPandas(
        go, "vec_id long, qa array<long>, cid int, dist long"
    )


def _kmeans_final(
    spark: SparkSession, sf_dir: str, assign_backend: str | None = None
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Shared Lloyd engine (two fixed-point rounds): returns the final
    (vec_id, qa, cid, dist) assignment and the final centroid list —
    composed by q201 (inertia stats) and q234 (purity/NMI vs labels).
    ``assign_backend`` picks the per-round assignment evaluator: the
    "numpy" Arrow pass (bit-exact — integer arithmetic throughout;
    test_numpy_backends.py) or the "jvm" HOF fold the oracle mirrors;
    default auto-selects numpy when importable."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * KM_FP + 0.5).cast("long"),
        ).alias("qa"),
    )
    seeds = (
        q.select("vec_id", "qa", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(KM_K)
    )
    sw = W.orderBy("h", "vec_id")
    c0 = [
        (int(r["cid"]), list(r["qa"]))
        for r in bounded_collect(
            seeds.select((F.row_number().over(sw) - 1).alias("cid"), "qa"),
            KM_K,
            "q201_kmeans_seeds",
        )
    ]
    # collect() row order of a windowed projection is not contractual;
    # _km_assign_numpy's first-argmin tie-break requires centroids
    # ascending by cid (the JVM array_min path is order-independent) —
    # sort defensively so an equidistant tie can't diverge on an
    # unsorted round-1 c0
    c0.sort()

    if assign_backend is None:
        from datapipeline_dags_spark.plans.llm_ops import _numpy_available

        assign_backend = "numpy" if _numpy_available() else "jvm"

    def assign(qdf: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
        if assign_backend == "numpy":
            return _km_assign_numpy(spark, qdf, cents)
        structs = [
            F.struct(
                F.aggregate(
                    F.zip_with(
                        "qa",
                        F.array(*[F.lit(v) for v in carr]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(cid).alias("cid"),
            )
            for cid, carr in cents
        ]
        best = F.array_min(F.array(*structs))
        return qdf.select(
            "vec_id",
            "qa",
            best.getField("cid").alias("cid"),
            best.getField("dist").alias("dist"),
        )

    cents = c0
    asg = assign(q, cents)
    for rnd in range(KM_ROUNDS - 1):
        # checkpoint the k*dim centroid update so the audit hook
        # captures the per-round plan (assignment scan + one (cid,pos)
        # agg collapsing map-side to k*dim cells)
        newc = local_checkpoint(
            asg.select("cid", F.posexplode("qa").alias("pos", "qv"))
            .groupBy("cid", "pos")
            .agg(
                F.floor(F.sum("qv") * 1.0 / F.count("*"))
                .cast("long")
                .alias("cv")
            ),
            f"q201 kmeans centroid update round {rnd + 2}",
        )
        rows = bounded_collect(
            newc.groupBy("cid").agg(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("ps")
            ),
            KM_K,
            "q201_kmeans_centroids",
        )
        cents = [
            (int(r["cid"]), [int(p["cv"]) for p in r["ps"]]) for r in rows
        ]
        cents.sort()
        asg = assign(q, cents)
    return asg, cents


@query("q201_kmeans_fixed_point", oracle=_km_oracle())
def q201_kmeans_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd rounds of k-means (k={KM_K}) over the embeddings
    table, entirely in integer fixed-point — cluster sizes, inertia
    and centroid norms after the second assignment.  The clustering
    primitive behind corpus bucketing / topic sharding, expressed so
    an iterative numeric algorithm stays bit-reproducible across
    engines AND across partitionings (integer sums are
    order-independent; float accumulation is not — the q183 PageRank
    rule applied to ML).

    Scale shape per round: assignment is MAP-ONLY — the k x dim
    centroid table is a driver-side literal (bounded control plane,
    the PQ-codebook pattern) folded into an array_min over k
    (distance, cid) structs, so the corpus-sized table never shuffles
    for assignment; the centroid UPDATE is posexplode -> groupBy
    (cid, pos) where map-side partial aggregation collapses every
    partition to <= k*dim cells before the shuffle (the q64 centroid
    shape).  Seeds are the {KM_K} md5-smallest vec_ids via
    orderBy().limit() (TakeOrderedAndProject — never a global
    row_number).  Empty clusters drop out of the next round's
    centroid literal exactly as they vanish from the oracle's c1.
    """
    asg, cents = _kmeans_final(spark, sf_dir)
    l2 = {cid: sum(v * v for v in carr) for cid, carr in cents}
    l2_map = F.create_map(
        *[F.lit(x) for kv in l2.items() for x in kv]
    )
    return (
        asg.groupBy("cid")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("dist").alias("inertia_fp"),
        )
        .select(
            F.col("cid").cast("int").alias("cid"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("inertia_fp").cast("long").alias("inertia_fp"),
            l2_map[F.col("cid")].cast("long").alias("centroid_l2sq_fp"),
        )
    )


# ---------------------------------------------------------------------------
# q202 — MAD robust outlier audit (composes distributed_percentiles)
# ---------------------------------------------------------------------------

#: q202 collects one (group, median) row per event TYPE — a
#: low-cardinality enum by construction.  The bound is asserted by
#: plans.route.bounded_collect (q207 discipline): a fixture or schema
#: change that turns event_type high-cardinality fails loudly instead
#: of growing the driver heap and the broadcast literal map.
MAD_COLLECT_GROUPS = 100_000

# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------


@query(
    "q202_mad_outliers",
    oracle="""
    WITH m AS (SELECT event_type AS g, quantile_cont(value, 0.5) AS med,
                      COUNT(*) AS n
               FROM events GROUP BY 1),
    d AS (SELECT e.event_type AS g, e.value, m.med, m.n,
                 ABS(e.value - m.med) AS dv
          FROM events e JOIN m ON m.g = e.event_type),
    md AS (SELECT g, quantile_cont(dv, 0.5) AS mad FROM d GROUP BY 1)
    SELECT d.g AS event_type,
           CAST(MAX(d.n) AS BIGINT) AS n_events,
           (ROUND(MAX(d.med), 6) + 0.0) AS med,
           (ROUND(MAX(md.mad), 6) + 0.0) AS mad,
           CAST(SUM(CASE WHEN d.dv > 3 * md.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN md ON md.g = d.g
    GROUP BY 1
    """,
)
def q202_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier audit per event type: med =
    median(value), MAD = median(|value - med|), outliers = rows with
    |value - med| > 3*MAD — the robust z-score that doesn't let the
    outliers it hunts inflate its own scale estimate (unlike q108's
    mean/stddev z).

    Scale shape: BOTH medians run through q186's
    ``distributed_percentiles`` (exact quantile_cont interpolation,
    max task memory ~ one histogram sub-bin) — never Spark's
    buffering ``percentile`` — and each |groups|-row result is
    COLLECTED to a map-side literal before the next pass (bounded
    control plane, the PQ-codebook pattern): composing the two
    percentile plans symbolically would re-derive pass 1 inside every
    self-reference of pass 2 (a ~400-shuffle physical plan at
    compile time); the literal collapse keeps the final comparison
    pass one map-only scan + one hash agg.  Parity: the interpolated
    medians are bit-equal to DuckDB's quantile_cont (proven by q186's
    oracle), so the strict > cut agrees exactly; displayed medians
    take the 6dp round.
    """
    ev = table(spark, sf_dir, "events")
    gv = ev.select(
        F.col("event_type").alias("g"), F.col("value").cast("double").alias("v")
    )
    med_rows = bounded_collect(
        local_checkpoint(
            distributed_percentiles(gv, (0.5,)).select("g", "value"),
            "q202 median pass",
        ),
        MAD_COLLECT_GROUPS,
        "q202_mad_outliers_medians",
    )
    med_map = F.create_map(
        *[F.lit(x) for r in med_rows for x in (r["g"], float(r["value"]))]
    )
    j = gv.withColumn("med", med_map[F.col("g")]).withColumn(
        "dv", F.abs(F.col("v") - F.col("med"))
    )
    mad_rows = bounded_collect(
        local_checkpoint(
            distributed_percentiles(j.select("g", F.col("dv").alias("v")), (0.5,)),
            "q202 MAD pass",
        ).select("g", "value"),
        MAD_COLLECT_GROUPS,
        "q202_mad_outliers_mads",
    )
    mad_map = F.create_map(
        *[F.lit(x) for r in mad_rows for x in (r["g"], float(r["value"]))]
    )
    return (
        j.withColumn("mad", mad_map[F.col("g")])
        .groupBy("g")
        .agg(
            F.count("*").alias("n_events"),
            dec(F.max("med"), 6).alias("med"),
            dec(F.max("mad"), 6).alias("mad"),
            F.sum(
                (F.col("dv") > 3 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .select(
            F.col("g").alias("event_type"),
            F.col("n_events").cast("long").alias("n_events"),
            "med",
            "mad",
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# q203 — readability scoring (Flesch reading ease, per source)
# ---------------------------------------------------------------------------

_WORD_RE = "[a-z]+"
_SENT_RE = "[.!?]+"
_SYL_RE = "[aeiouy]+"


@query(
    "q203_readability",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             GREATEST(len(regexp_extract_all(lower(text), '{_WORD_RE}')), 1)
               AS w,
             GREATEST(len(regexp_extract_all(text, '{_SENT_RE}')), 1) AS s,
             len(regexp_extract_all(lower(text), '{_SYL_RE}')) AS y
      FROM documents),
    scored AS (
      SELECT source, w, s, y,
             206.835 - 1.015 * (w * 1.0 / s) - 84.6 * (y * 1.0 / w)
               AS flesch
      FROM per_doc)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS total_words,
           (ROUND(206.835 - 1.015 * (SUM(w) * 1.0 / SUM(s))
                  - 84.6 * (SUM(y) * 1.0 / SUM(w)), 4) + 0.0)
             AS flesch_source,
           CAST(SUM(CASE WHEN flesch >= 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_easy,
           CAST(SUM(CASE WHEN flesch >= 30 AND flesch < 60 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_college,
           CAST(SUM(CASE WHEN flesch < 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_graduate
    FROM scored GROUP BY 1
    """,
)
def q203_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source: per-doc word / sentence /
    syllable-proxy counts (vowel-cluster heuristic — no dictionary
    needed, the standard streaming approximation), a source-level
    Flesch computed from the INTEGER count totals, and per-doc grade
    buckets — the readability leg of the q50/q99 quality-filter
    family (curation pipelines gate on it to skew corpora toward
    plain prose).

    Scale shape: three regexp_extract_all counts per document,
    map-only over the corpus scan, then ONE hash aggregate on source
    — no shuffle carries text.  Parity: every aggregate is an integer
    sum; the source-level Flesch is a single double expression over
    exact integer totals (deterministic IEEE evaluation, no
    order-dependent float accumulation) rounded at 4dp, and the
    per-doc grade buckets compare per-doc expressions both engines
    evaluate identically.
    """
    docs = table(spark, sf_dir, "documents")
    lo = F.lower("text")
    per_doc = docs.select(
        "source",
        F.greatest(
            F.size(F.regexp_extract_all(lo, F.lit(_WORD_RE), F.lit(0))), F.lit(1)
        ).alias("w"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(_SENT_RE), F.lit(0))),
            F.lit(1),
        ).alias("s"),
        F.size(F.regexp_extract_all(lo, F.lit(_SYL_RE), F.lit(0))).alias("y"),
    )
    flesch = (
        F.lit(206.835)
        - 1.015 * (F.col("w") * 1.0 / F.col("s"))
        - 84.6 * (F.col("y") * 1.0 / F.col("w"))
    )
    scored = per_doc.withColumn("flesch", flesch)
    src = (
        F.lit(206.835)
        - 1.015 * (F.col("sw") * 1.0 / F.col("ss"))
        - 84.6 * (F.col("sy") * 1.0 / F.col("sw"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("w").alias("sw"),
            F.sum("s").alias("ss"),
            F.sum("y").alias("sy"),
            F.sum((F.col("flesch") >= 60).cast("long")).alias("n_easy"),
            F.sum(
                ((F.col("flesch") >= 30) & (F.col("flesch") < 60)).cast("long")
            ).alias("n_college"),
            F.sum((F.col("flesch") < 30).cast("long")).alias("n_graduate"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("sw").cast("long").alias("total_words"),
            dec(src, 4).alias("flesch_source"),
            "n_easy",
            "n_college",
            "n_graduate",
        )
    )


# ---------------------------------------------------------------------------
# q204 — BFS reachability levels from the md5-seeded part
# ---------------------------------------------------------------------------

#: BFS frontier rounds (shortest-hop levels 0..BFS_MAX_LEVEL); a fixed
#: round count keeps the driver loop deterministic — deeper nodes are
#: simply "unreached" under the contract, exactly as in the oracle's
#: lvl-capped recursion.
BFS_MAX_LEVEL = 6


@query(
    "q204_bfs_reach",
    oracle=f"""
    WITH RECURSIVE {_EDGE_CTES},
    sym AS (SELECT a AS src, bb AS dst FROM e
            UNION ALL SELECT bb, a FROM e),
    nodes AS (SELECT a AS n FROM e UNION SELECT bb FROM e),
    seed AS (SELECT n FROM nodes
             ORDER BY md5(CAST(n AS VARCHAR)), n LIMIT 1),
    bfs(n, lvl) AS (
      SELECT n, 0 FROM seed
      UNION
      SELECT s.dst, b.lvl + 1
      FROM bfs b JOIN sym s ON s.src = b.n
      WHERE b.lvl < {BFS_MAX_LEVEL}),
    lv AS (SELECT n, MIN(lvl) AS lvl FROM bfs GROUP BY 1)
    SELECT CAST(lvl AS INT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(COUNT(*)) OVER (ORDER BY lvl) AS BIGINT) AS cum_reached
    FROM lv GROUP BY lvl
    """,
)
def q204_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reachability profile of the co-purchase graph:
    node counts per shortest-hop level (0..{BFS_MAX_LEVEL}) from a
    deterministic md5-seeded part — the frontier-expansion primitive
    behind "how far does influence/contamination propagate", and the
    engine's demonstration that a Spark ITERATIVE frontier loop and a
    SQL RECURSIVE CTE are the same declarative contract (the oracle is
    DuckDB's WITH RECURSIVE over the identical edge table).

    Scale shape per round: ONE equi-join frontier x symmetric-edges +
    distinct + anti-join against visited — all partitioned on the node
    key, frontier never exceeds the corpus; each round
    localCheckpoints (lineage cut + audit capture, the q69/q183
    discipline).  Levels are shortest-hop by construction (a node
    enters visited the first round it appears, the anti-join blocks
    re-entry), which is exactly the oracle's MIN(lvl).  The level
    histogram is <= {BFS_MAX_LEVEL}+1 rows; its cumulative window is
    bounded-domain (allowlisted).
    """
    edges = _copurchase_edges(spark, sf_dir, "q204_bfs_reach")
    sym = local_checkpoint(
        edges.select(F.col("a").alias("src"), F.col("bb").alias("dst")).unionAll(
            edges.select(F.col("bb").alias("src"), F.col("a").alias("dst"))
        ),
        "q204 symmetric edges",
    )
    nodes = sym.select(F.col("src").alias("n")).distinct()
    seed = bounded_collect(
        nodes.orderBy(F.md5(F.col("n").cast("string")), "n").limit(1),
        1,
        "q204_bfs_seed",
    )[0]["n"]
    visited = spark.createDataFrame([(int(seed), 0)], "n long, lvl int")
    frontier = visited.select("n")
    for lvl in range(1, BFS_MAX_LEVEL + 1):
        nxt = local_checkpoint(
            frontier.join(sym, frontier["n"] == sym["src"])
            .select(F.col("dst").alias("n"))
            .distinct()
            .join(visited, "n", "left_anti")
            .withColumn("lvl", F.lit(lvl)),
            f"q204 bfs frontier round {lvl}",
        )
        visited = visited.unionAll(nxt)
        frontier = nxt.select("n")
    hist = visited.groupBy("lvl").agg(F.count("*").alias("n_nodes"))
    cw = W.orderBy("lvl").rowsBetween(W.unboundedPreceding, 0)
    return hist.select(
        F.col("lvl").cast("int").alias("level"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.sum("n_nodes").over(cw).cast("long").alias("cum_reached"),
    )


# ---------------------------------------------------------------------------
# q206 — effective sample size of the sampling weights (Kish)
# ---------------------------------------------------------------------------


@query(
    "q206_sampling_ess",
    oracle="""
    WITH s AS (SELECT source,
                      COUNT(*) AS n,
                      SUM(n_chars) AS sw,
                      SUM(n_chars * n_chars) AS sw2,
                      MAX(n_chars) AS wmax
               FROM documents GROUP BY 1)
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           (ROUND(sw * sw * 1.0 / sw2, 4) + 0.0) AS ess,
           (ROUND(n * sw2 * 1.0 / (sw * sw), 4) + 0.0) AS design_effect,
           (ROUND(wmax * 1.0 / sw, 6) + 0.0) AS max_weight_share
    FROM s
    """,
)
def q206_sampling_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of the q85/q72 sampling weights, per
    source stratum: ESS = (sum w)^2 / sum w^2, the design effect
    n/ESS, and the heaviest document's weight share — the diagnostic
    every importance-weighted pipeline needs BEFORE trusting a
    weighted estimate (a stratum whose ESS collapses to ~1 is one
    document wearing a distribution costume; DSIR/mixture resampling
    results from it are noise).

    Scale shape: one map-side pass, one hash aggregate on source —
    the three moment sums are integers (n_chars weights), so partial
    aggregation collapses every partition to |sources| cells before
    the shuffle and the two ratios are single double expressions over
    exact integer totals (engine-identical IEEE evaluation, the q203
    discipline); 4dp/6dp final rounds only.
    """
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("sw"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sw2"),
        F.max("n_chars").alias("wmax"),
    )
    return s.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        dec(F.col("sw") * F.col("sw") * 1.0 / F.col("sw2"), 4).alias("ess"),
        dec(
            F.col("n") * F.col("sw2") * 1.0 / (F.col("sw") * F.col("sw")), 4
        ).alias("design_effect"),
        dec(F.col("wmax") * 1.0 / F.col("sw"), 6).alias("max_weight_share"),
    )


# ---------------------------------------------------------------------------
# q215 — label-propagation communities on the co-purchase graph
# ---------------------------------------------------------------------------

#: synchronous label-propagation rounds — a fixed count keeps both
#: engines' non-asymptotic state identical (the q183/q207 K-round
#: contract; sync LPA can oscillate on bipartite structures, and a
#: fixed K with deterministic tie-breaks makes even an oscillation
#: engine-exact).
LPA_ROUNDS = 6
LPA_TOP = 20


def _q215_oracle() -> str:
    prev = "lp0"
    iters = []
    for k in range(1, LPA_ROUNDS + 1):
        iters.append(f"""
    lp{k} AS MATERIALIZED (
      SELECT dst AS node, label FROM (
        SELECT s.dst, p.label, COUNT(*) AS c
        FROM symlp s JOIN {prev} p ON p.node = s.src
        GROUP BY 1, 2)
      QUALIFY row_number() OVER (PARTITION BY dst
                                 ORDER BY c DESC, label) = 1)""")
        prev = f"lp{k}"
    return f"""
    WITH {_EDGE_CTES},
    symlp AS MATERIALIZED (
      SELECT a AS src, bb AS dst FROM e
      UNION ALL SELECT bb, a FROM e),
    lp0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS label FROM symlp),
    {','.join(iters)},
    comm AS (SELECT label AS community, COUNT(*) AS n_nodes
             FROM {prev} GROUP BY 1),
    tot AS (SELECT COUNT(*) AS nc FROM comm),
    topk AS (SELECT community, n_nodes FROM comm
             ORDER BY n_nodes DESC, community LIMIT {LPA_TOP})
    SELECT CAST(t.community AS BIGINT) AS community,
           CAST(t.n_nodes AS BIGINT) AS n_nodes,
           CAST(x.nc AS BIGINT) AS n_communities
    FROM topk t CROSS JOIN tot x
    """


@query("q215_label_propagation", oracle=_q215_oracle())
def q215_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation
    (Raghavan et al. 2007) over the co-purchase part graph: each round
    every node adopts its neighbors' most frequent label (ties to the
    smallest label id), {LPA_ROUNDS} fixed rounds — the assortment-
    planning view (which parts sell TOGETHER as a community) that
    connected components (one giant blob) and q199's global clustering
    coefficient (one number) can't give.

    Scale shape: per round ONE node-keyed join + ONE (node, label)
    hash aggregate + ONE per-node argmax window (partitioned by node,
    never global), localCheckpointed (the q183 loop discipline); the
    argmax ranks on exact integer counts with a label tiebreak, so
    round-by-round state is engine-identical and the oracle's
    chained-CTE rounds reproduce it bit-for-bit.  Output is a
    top-{LPA_TOP} TakeOrderedAndProject by integer size plus the 1-row
    community-count attach.
    """
    edges = _copurchase_edges(spark, sf_dir, "q215_label_propagation")
    sym = local_checkpoint(
        edges.select(F.col("a").alias("src"), F.col("bb").alias("dst")).unionAll(
            edges.select(F.col("bb").alias("src"), F.col("a").alias("dst"))
        ),
        "q215 symmetric edges",
    )
    labels = local_checkpoint(
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label")),
        "q215 lp init",
    )
    wmax = W.partitionBy("dst").orderBy(F.col("c").desc(), F.col("label"))
    for k in range(LPA_ROUNDS):
        counts = (
            sym.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy("dst", "label")
            .agg(F.count("*").alias("c"))
        )
        nxt = (
            counts.withColumn("rn", F.row_number().over(wmax))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("node"), "label")
        )
        # labels has ONE consumer per round, so checkpointing every
        # SECOND round (the q221/q183 r8 discipline) halves the eager
        # checkpoint jobs with zero recompute and a ≤2-round lineage.
        labels = (
            local_checkpoint(nxt, f"q215 lp round {k + 1}")
            if k % 2 == 1 or k == LPA_ROUNDS - 1
            else nxt
        )
    comm = labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").alias("n_nodes")
    )
    tot = comm.agg(F.count("*").alias("nc"))
    return (
        comm.orderBy(F.col("n_nodes").desc(), "community")
        .limit(LPA_TOP)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("community").cast("long"),
            F.col("n_nodes").cast("long"),
            F.col("nc").cast("long").alias("n_communities"),
        )
    )


# ---------------------------------------------------------------------------
# q216 — item-item collaborative filtering (co-purchase cosine top-k)
# ---------------------------------------------------------------------------

CF_TOP = 5  # neighbors recommended per part


@query(
    "q216_item_item_cf",
    oracle=f"""
    WITH {_EDGE_CTES},
    freq AS MATERIALIZED (SELECT pk, COUNT(*) AS n FROM b GROUP BY 1),
    pairs AS MATERIALIZED (
      SELECT x.pk AS a, y.pk AS bb, COUNT(*) AS nab
      FROM b x JOIN b y
        ON x.l_orderkey = y.l_orderkey AND x.pk < y.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= {TRI_MIN_SUPPORT}),
    scored AS (
      SELECT p.a AS part, p.bb AS neighbor, p.nab,
             ROUND(p.nab / SQRT(fa.n * fb.n), 6) AS cos6
      FROM pairs p
      JOIN freq fa ON fa.pk = p.a
      JOIN freq fb ON fb.pk = p.bb),
    sym AS (SELECT part, neighbor, nab, cos6 FROM scored
            UNION ALL
            SELECT neighbor, part, nab, cos6 FROM scored),
    ranked AS (SELECT part, neighbor, nab, cos6,
                      row_number() OVER (PARTITION BY part
                                         ORDER BY cos6 DESC, neighbor)
                        AS rec_rank
               FROM sym)
    SELECT part, CAST(rec_rank AS INT) AS rec_rank, neighbor,
           CAST(nab AS BIGINT) AS cooccur, (cos6 + 0.0) AS cosine
    FROM ranked WHERE rec_rank <= {CF_TOP}
    """,
)
def q216_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (Sarwar et al. 2001 / the
    Amazon recommender): each part's top-{CF_TOP} co-purchase
    neighbors by cosine over order-occurrence vectors, cos(a, b) =
    n_ab / sqrt(n_a * n_b) — the "customers who bought this also
    bought" table, computed batch-side.  Distinct from q142 (pair lift
    ranking) and q199 (triangle census): this emits a per-item
    RANKED NEIGHBOR LIST, the serving artifact.

    Scale shape: the capped basket explode bounds pair generation
    (Σ C(min(basket, {TRI_MAX_BASKET}), 2), the q179/q199 contract —
    same observable cap counters); frequencies and pair counts are two
    hash aggregates; the top-{CF_TOP} window partitions by part, never
    global.  Parity: cosine is ONE IEEE expression over exact integer
    counts, ranked after a 6-dp round with the neighbor-id tiebreak
    (engine-agreed k-boundary).
    """
    li = table(spark, sf_dir, "lineitem")
    obs = Observation()
    MINING_OBSERVATIONS["q216_item_item_cf"] = obs
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .observe(
            obs,
            F.count(F.lit(1)).alias("baskets"),
            F.sum((F.size("parts") > TRI_MAX_BASKET).cast("long")).alias(
                "capped_baskets"
            ),
            F.max(F.size("parts")).alias("max_basket_size"),
        )
    )
    b = local_checkpoint(
        baskets.select(
            "l_orderkey", F.explode(F.slice("parts", 1, TRI_MAX_BASKET)).alias("pk")
        ),
        "q216 basket explode",
    )
    freq = b.groupBy("pk").agg(F.count("*").alias("n"))
    pairs = (
        b.select("l_orderkey", F.col("pk").alias("a"))
        .join(b.select("l_orderkey", F.col("pk").alias("bb")), "l_orderkey")
        .filter(F.col("a") < F.col("bb"))
        .groupBy("a", "bb")
        .agg(F.count("*").alias("nab"))
        .filter(F.col("nab") >= TRI_MIN_SUPPORT)
    )
    scored = (
        pairs.join(freq.select(F.col("pk").alias("a"), F.col("n").alias("na")), "a")
        .join(freq.select(F.col("pk").alias("bb"), F.col("n").alias("nb")), "bb")
        .select(
            F.col("a").alias("part"),
            F.col("bb").alias("neighbor"),
            "nab",
            F.round(F.col("nab") / F.sqrt(F.col("na") * F.col("nb")), 6).alias(
                "cos6"
            ),
        )
    )
    sym = scored.unionAll(
        scored.select(
            F.col("neighbor").alias("part"),
            F.col("part").alias("neighbor"),
            "nab",
            "cos6",
        )
    )
    wr = W.partitionBy("part").orderBy(F.col("cos6").desc(), F.col("neighbor"))
    return (
        sym.withColumn("rec_rank", F.row_number().over(wr))
        .filter(F.col("rec_rank") <= CF_TOP)
        .select(
            "part",
            F.col("rec_rank").cast("int").alias("rec_rank"),
            "neighbor",
            F.col("nab").cast("long").alias("cooccur"),
            (F.col("cos6") + F.lit(0.0)).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# q218 — Wasserstein-1 (earth mover) drift per source vs rest-of-corpus
# ---------------------------------------------------------------------------

#: fixed-width length buckets: bounds the grid (and the exact integer
#: sum) by the length domain / EMD_BIN, never the corpus.
EMD_BIN = 16


@query(
    "q218_emd_drift",
    oracle=f"""
    WITH d AS (SELECT source, n_chars // {EMD_BIN} AS bin FROM documents),
    g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_tot FROM d GROUP BY 1),
    sc AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_s
           FROM d GROUP BY 1, 2),
    srcs AS (SELECT source, CAST(SUM(n_s) AS BIGINT) AS ns FROM sc GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_tot) AS BIGINT) AS nt FROM g),
    frame AS (
      SELECT s.source, g.bin, g.n_tot, COALESCE(c.n_s, 0) AS n_s
      FROM srcs s CROSS JOIN g
      LEFT JOIN sc c ON c.source = s.source AND c.bin = g.bin),
    cums AS (
      SELECT source, bin,
             SUM(n_s) OVER (PARTITION BY source ORDER BY bin) AS cs,
             SUM(n_tot) OVER (PARTITION BY source ORDER BY bin) AS ct,
             LEAD(bin) OVER (PARTITION BY source ORDER BY bin) AS nxt
      FROM frame),
    terms AS (
      SELECT c.source,
             ABS(c.cs * (t.nt - s.ns) - (c.ct - c.cs) * s.ns)
               * (c.nxt - c.bin) AS term,
             s.ns, t.nt
      FROM cums c
      JOIN srcs s ON s.source = c.source
      CROSS JOIN tot t
      WHERE c.nxt IS NOT NULL)
    SELECT source, CAST(ns AS BIGINT) AS n_docs,
           (ROUND({EMD_BIN} * SUM(term) * 1.0
                  / (ns * (nt - ns)), 4) + 0.0) AS emd_chars
    FROM terms GROUP BY source, ns, nt
    """,
)
def q218_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth mover) distance between each source's
    doc-length distribution and the rest of the corpus, in characters:
    EMD_1 = ∫|CDF_a − CDF_b| — the drift metric that, unlike q200's KS
    sup-gap (worst point) and q123's PSI (binned likelihood), measures
    HOW FAR mass must move, in the variable's own units.

    Scale shape: the corpus collapses in one pass to the (source,
    length-bucket) grid — bounded by |sources| × (length domain /
    {EMD_BIN}), never the corpus (the q200 grid discipline);
    cumulative windows partition by source.  Parity: the integrand is
    the exact cross-multiplied integer |cs·n_rest − c_rest·n_s| times
    the integer bucket gap, summed exactly; ONE double division at the
    edge, 4-dp round.
    """
    docs = table(spark, sf_dir, "documents")
    d = docs.select("source", F.expr(f"n_chars div {EMD_BIN}").alias("bin"))
    g = d.groupBy("bin").agg(F.count("*").alias("n_tot"))
    sc = d.groupBy("source", "bin").agg(F.count("*").alias("n_s"))
    srcs = sc.groupBy("source").agg(F.sum("n_s").alias("ns"))
    tot = g.agg(F.sum("n_tot").alias("nt"))
    frame = (
        srcs.crossJoin(g)
        .join(sc, ["source", "bin"], "left")
        .select("source", "bin", "n_tot", F.coalesce("n_s", F.lit(0)).alias("n_s"), "ns")
    )
    wc = W.partitionBy("source").orderBy("bin")
    cums = frame.select(
        "source",
        "bin",
        "ns",
        F.sum("n_s").over(wc.rowsBetween(W.unboundedPreceding, 0)).alias("cs"),
        F.sum("n_tot").over(wc.rowsBetween(W.unboundedPreceding, 0)).alias("ct"),
        F.lead("bin").over(wc).alias("nxt"),
    )
    terms = (
        cums.crossJoin(F.broadcast(tot))
        .filter(F.col("nxt").isNotNull())
        .select(
            "source",
            "ns",
            "nt",
            (
                F.abs(
                    F.col("cs") * (F.col("nt") - F.col("ns"))
                    - (F.col("ct") - F.col("cs")) * F.col("ns")
                )
                * (F.col("nxt") - F.col("bin"))
            ).alias("term"),
        )
    )
    return terms.groupBy("source", "ns", "nt").agg(
        F.sum("term").alias("s")
    ).select(
        "source",
        F.col("ns").cast("long").alias("n_docs"),
        dec(
            EMD_BIN * F.col("s") * 1.0 / (F.col("ns") * (F.col("nt") - F.col("ns"))),
            4,
        ).alias("emd_chars"),
    )


# ---------------------------------------------------------------------------
# q222 — k-core decomposition of the co-purchase graph
# ---------------------------------------------------------------------------

KCORE_K = 3
#: Collect-and-solve gate (the q221/q183/q225 discipline): when the
#: checkpointed co-purchase edge table fits under this many rows, the
#: {12}-round peel runs driver-side over numpy int64 arrays — pure
#: integer degree/set arithmetic, so the surviving edge set is
#: IDENTICAL to the distributed rounds (route-equality test pins it) —
#: replacing 12 x (degree agg + two semi-joins + localCheckpoint)
#: scheduled jobs with ONE collect.  Above the gate the distributed
#: loop runs unchanged.
KCORE_COLLECT_EDGES = 10_000_000
#: fixed peel rounds (the q204 BFS contract: both engines run exactly
#: this many rounds, so parity never depends on convergence; the
#: fixture converges well inside the cap — fixpoint at round 11 at
#: sf0.01, round 1 at sf0.001 — and the returned-degree invariant
#: test catches a cap that stopped short).
KCORE_ROUNDS = 12
KCORE_TOP = 20


def _q222_oracle() -> str:
    prev = "kc0"
    iters = []
    for r in range(1, KCORE_ROUNDS + 1):
        iters.append(f"""
    kp{r} AS MATERIALIZED (
      SELECT nd FROM (SELECT a AS nd FROM {prev}
                      UNION ALL SELECT bb FROM {prev}) t
      GROUP BY 1 HAVING COUNT(*) >= {KCORE_K}),
    kc{r} AS MATERIALIZED (
      SELECT c.a, c.bb FROM {prev} c
      JOIN kp{r} ka ON ka.nd = c.a
      JOIN kp{r} kb ON kb.nd = c.bb)""")
        prev = f"kc{r}"
    return f"""
    WITH {_EDGE_CTES},
    kc0 AS MATERIALIZED (SELECT a, bb FROM e),
    {','.join(iters)},
    deg AS (SELECT nd, COUNT(*) AS d
            FROM (SELECT a AS nd FROM {prev}
                  UNION ALL SELECT bb FROM {prev}) t
            GROUP BY 1),
    stats AS (SELECT (SELECT COUNT(*) FROM deg) AS n_core_nodes,
                     (SELECT COUNT(*) FROM {prev}) AS n_core_edges)
    SELECT CAST(d.nd AS BIGINT) AS part,
           CAST(d.d AS BIGINT) AS core_degree,
           CAST(s.n_core_nodes AS BIGINT) AS n_core_nodes,
           CAST(s.n_core_edges AS BIGINT) AS n_core_edges
    FROM deg d CROSS JOIN stats s
    ORDER BY d.d DESC, d.nd LIMIT {KCORE_TOP}
    """


@query("q222_kcore_decomposition", oracle=_q222_oracle())
def q222_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {KCORE_K}-core of the co-purchase part graph: iteratively
    peel nodes of degree < {KCORE_K} until every survivor has at least
    {KCORE_K} surviving neighbors — the maximal dense backbone that
    degree alone overstates (a hub whose neighbors are all leaves
    peels away; a clique member stays).  Assortment planners read the
    core as the "always merchandised together" nucleus; graph-ML
    pipelines use coreness as a cheap density feature before expensive
    community detection (q215).

    Parity: pure integer set/degree arithmetic; a fixed
    {KCORE_ROUNDS}-round peel keeps the two engines' non-asymptotic
    states identical (the q204 fixed-cap contract), and the oracle's
    chained MATERIALIZED CTEs replay the identical rounds.

    Scale shape: rides the shared capped-basket edge engine
    (``_copurchase_edges``: Σ C(min(basket,{TRI_MAX_BASKET}), 2) pair
    explode, support floor, observed caps); each peel round is ONE
    degree hash-agg + TWO semi joins on the shrinking edge table,
    localCheckpointed so round r never re-derives rounds 1..r-1;
    output is a top-{KCORE_TOP} TakeOrderedAndProject plus two 1-row
    core-stat attaches.
    """
    e = _copurchase_edges(spark, sf_dir, "q222_kcore_decomposition")

    def _distributed(e: DataFrame) -> DataFrame:
        cur = e
        for r in range(KCORE_ROUNDS):
            deg = (
                cur.select(F.col("a").alias("nd"))
                .unionAll(cur.select(F.col("bb").alias("nd")))
                .groupBy("nd")
                .agg(F.count("*").alias("d"))
            )
            keep = deg.filter(F.col("d") >= KCORE_K).select("nd")
            cur = local_checkpoint(
                cur.join(keep.withColumnRenamed("nd", "a"), "a", "semi")
                .join(keep.withColumnRenamed("nd", "bb"), "bb", "semi")
                .select("a", "bb"),
                f"q222 peel {r + 1}",
            )
        deg = (
            cur.select(F.col("a").alias("part"))
            .unionAll(cur.select(F.col("bb").alias("part")))
            .groupBy("part")
            .agg(F.count("*").alias("core_degree"))
        )
        stats = deg.agg(F.count("*").alias("n_core_nodes")).crossJoin(
            cur.agg(F.count("*").alias("n_core_edges"))
        )
        return (
            deg.crossJoin(F.broadcast(stats))
            .orderBy(F.col("core_degree").desc(), "part")
            .limit(KCORE_TOP)
            .select(
                F.col("part").cast("long"),
                F.col("core_degree").cast("long"),
                F.col("n_core_nodes").cast("long"),
                F.col("n_core_edges").cast("long"),
            )
        )

    def _collected(e: DataFrame) -> DataFrame:
        import numpy as np

        pdf = e.toPandas()
        a = pdf["a"].to_numpy(np.int64)
        b = pdf["bb"].to_numpy(np.int64)
        for _ in range(KCORE_ROUNDS):
            if not len(a):
                break
            nodes = np.concatenate([a, b])
            uniq, cnt = np.unique(nodes, return_counts=True)
            kept = uniq[cnt >= KCORE_K]
            mask = np.isin(a, kept) & np.isin(b, kept)
            if mask.all():
                # fixpoint: remaining rounds peel nothing — the final
                # state equals running every fixed round
                break
            a, b = a[mask], b[mask]
        schema = (
            "part long, core_degree long, n_core_nodes long, n_core_edges long"
        )
        if not len(a):
            return spark.createDataFrame([], schema=schema)
        uniq, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        order = np.lexsort((uniq, -cnt))[:KCORE_TOP]
        n_nodes, n_edges = int(len(uniq)), int(len(a))
        return spark.createDataFrame(
            [
                (int(uniq[i]), int(cnt[i]), n_nodes, n_edges)
                for i in order
            ],
            schema=schema,
        )

    return collect_and_solve(
        e,
        KCORE_COLLECT_EDGES,
        "q222_kcore_decomposition",
        _collected,
        _distributed,
    )


# ---------------------------------------------------------------------------
# q225 — greedy set-cover data selection (submodular coverage pick)
# ---------------------------------------------------------------------------

SC_PICKS = 10
#: Collect-and-solve gate (the q221/q183 discipline): when the
#: (doc, shingle) incidence table fits under this many rows, the
#: greedy rounds run driver-side over factorized integer codes —
#: exact integer gains with the same doc-id tiebreak, so the pick
#: trajectory is identical — replacing {SC_PICKS} x (anti-join + agg
#: + top-1 collect + covered-set checkpoint) scheduled jobs with ONE
#: collect.  Above the gate the distributed loop runs unchanged.
SC_COLLECT_TOKENS = 5_000_000


def _sc_collected_solve(tokens) -> list[tuple[int, int, int, int]]:
    """Driver-side greedy maximum-coverage over the collected
    (doc_id, tok) incidence rows: tokens factorize to integer codes
    (exact string identity — no hashing, so no collision caveat vs the
    oracle), gains are ``np.bincount`` over the uncovered-row mask,
    and ties break on the LOWEST doc_id exactly like the distributed
    top-1's (gain DESC, doc_id) ordering."""
    import numpy as np
    import pandas as pd

    pdf = tokens.toPandas()
    d = pdf["doc_id"].to_numpy(np.int64)
    t, _ = pd.factorize(pdf["tok"])
    n_tok = int(t.max()) + 1 if len(t) else 0
    covered = np.zeros(n_tok, dtype=bool)
    out: list[tuple[int, int, int, int]] = []
    total = 0
    picked_docs: set[int] = set()
    for r in range(1, SC_PICKS + 1):
        live = ~covered[t]
        if picked_docs:
            live &= ~np.isin(d, np.fromiter(picked_docs, np.int64))
        if not live.any():
            break
        docs_live = d[live]
        uniq, counts = np.unique(docs_live, return_counts=True)
        best = counts.max()
        doc = int(uniq[counts == best].min())
        gain = int(best)
        total += gain
        picked_docs.add(doc)
        covered[t[d == doc]] = True
        out.append((r, doc, gain, total))
    return out


def _q225_oracle() -> str:
    iters = []
    for r in range(1, SC_PICKS + 1):
        prev_p, prev_c = f"picked{r - 1}", f"cov{r - 1}"
        iters.append(f"""
    g{r} AS MATERIALIZED (
      SELECT t.doc_id, COUNT(*) AS gain
      FROM tok t
      WHERE t.doc_id NOT IN (SELECT doc_id FROM {prev_p})
        AND t.tok NOT IN (SELECT tok FROM {prev_c})
      GROUP BY 1),
    p{r} AS MATERIALIZED (
      SELECT doc_id, gain FROM g{r} ORDER BY gain DESC, doc_id LIMIT 1),
    picked{r} AS MATERIALIZED (
      SELECT doc_id, gain, CAST({r} AS BIGINT) AS pick_rank FROM p{r}
      UNION ALL SELECT doc_id, gain, pick_rank FROM {prev_p}),
    cov{r} AS MATERIALIZED (
      SELECT tok FROM {prev_c}
      UNION
      SELECT t.tok FROM tok t JOIN p{r} pp ON t.doc_id = pp.doc_id)""")
    return f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS tok FROM documents) x),
    picked0 AS MATERIALIZED (
      SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS gain,
             CAST(NULL AS BIGINT) AS pick_rank WHERE 1 = 0),
    cov0 AS MATERIALIZED (SELECT CAST(NULL AS VARCHAR) AS tok WHERE 1 = 0),
    {','.join(iters)}
    SELECT pick_rank, doc_id,
           CAST(gain AS BIGINT) AS marginal_gain,
           CAST(SUM(gain) OVER (ORDER BY pick_rank) AS BIGINT)
             AS covered_tokens
    FROM picked{SC_PICKS}
    ORDER BY pick_rank
    """


@query("q225_greedy_set_cover", oracle=_q225_oracle())
def q225_greedy_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage data selection: pick {SC_PICKS} documents
    that together cover the most distinct 5-gram shingles, one
    highest-marginal-gain pick per round — the submodular
    facility-location selection LLM curation pipelines use to choose a
    small, diverse fine-tuning subset (greedy is (1-1/e)-optimal for
    coverage, Nemhauser 1978).

    Parity: gains are exact integer counts with a doc-id tiebreak on
    the argmax, so every round's pick — and therefore the whole
    trajectory — is engine-identical; the oracle replays the rounds as
    chained MATERIALIZED CTEs (the q183/q207 contract).

    Scale shape: the corpus collapses once to the (doc, shingle)
    table (checkpointed).  Under SC_COLLECT_TOKENS the greedy rounds
    solve driver-side on factorized codes (``_sc_collected_solve`` —
    one collect instead of {SC_PICKS} anti-join/agg/top-1/checkpoint
    rounds, the q221 collect-and-solve lever); above it each round is
    one anti join against the covered-token set (≤ picks ×
    max-doc-vocab rows, bounded) + one hash agg + a global top-1
    TakeOrderedAndProject; the 1-row pick per round is bounded control
    plane (the q101 BPE top-1 / q207 matrix-collect precedent).
    Output is ≤ {SC_PICKS} rows built driver-side from the picks.
    """
    docs = table(spark, sf_dir, "documents")
    # _shingles emits array_distinct per doc, so (doc_id, tok) is
    # already unique — no distinct shuffle needed before the loop.
    tokens = local_checkpoint(
        docs.select(
            "doc_id", F.explode(_shingles(F.col("text"))).alias("tok")
        ),
        "q225 doc-shingle sets",
    )
    schema = (
        "pick_rank long, doc_id long, marginal_gain long, covered_tokens long"
    )

    def _distributed(toks: DataFrame) -> DataFrame:
        covered: DataFrame | None = None
        picked: list[tuple[int, int, int, int]] = []
        total = 0
        for r in range(1, SC_PICKS + 1):
            cand = toks
            if picked:
                cand = cand.filter(
                    ~F.col("doc_id").isin([p[1] for p in picked])
                )
            if covered is not None:
                cand = cand.join(covered, "tok", "anti")
            top = bounded_collect(
                cand.groupBy("doc_id")
                .agg(F.count("*").alias("gain"))
                .orderBy(F.col("gain").desc(), "doc_id")
                .limit(1),
                1,
                "q225_set_cover_pick",
            )
            if not top:
                break
            doc, gain = top[0]["doc_id"], top[0]["gain"]
            total += gain
            picked.append((r, doc, gain, total))
            newtoks = toks.filter(F.col("doc_id") == doc).select("tok")
            covered = local_checkpoint(
                newtoks
                if covered is None
                else covered.union(newtoks).distinct(),
                f"q225 covered after pick {r}",
            )
        return spark.createDataFrame(picked, schema)

    # Route probe (plans.route shared gate): one count of the
    # (already-materialized) checkpoint.  Under the gate the whole
    # greedy trajectory is bounded control plane — solve driver-side
    # on factorized codes.
    return collect_and_solve(
        tokens,
        SC_COLLECT_TOKENS,
        "q225_greedy_set_cover",
        lambda toks: spark.createDataFrame(_sc_collected_solve(toks), schema),
        _distributed,
    )


# ---------------------------------------------------------------------------
# q226 — k-mins distinct-count sketch audit (vocabulary size per source)
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_SPACE = f"{2**60}.0"  # hash space size as an exact double literal


@query(
    "q226_kmin_distinct_sketch",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT DISTINCT source, tok FROM (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents) x),
    m AS (
      SELECT t.source, s.salt,
             MIN(('0x' || substr(md5(t.tok || '|' || CAST(s.salt AS VARCHAR)),
                                 1, 15))::BIGINT) AS mn
      FROM t CROSS JOIN range(0, {KMV_K}) s(salt)
      GROUP BY 1, 2),
    kv AS (SELECT source, SUM(mn) AS sm FROM m GROUP BY 1),
    ex AS (SELECT source, COUNT(*) AS n_exact FROM t GROUP BY 1)
    SELECT ex.source,
           CAST(ex.n_exact AS BIGINT) AS n_exact,
           (ROUND({KMV_K} * {_KMV_SPACE} / kv.sm - 1, 2) + 0.0)
             AS kmin_estimate,
           (ROUND(({KMV_K} * {_KMV_SPACE} / kv.sm - 1 - ex.n_exact)
                  / ex.n_exact, 4) + 0.0) AS rel_error
    FROM ex JOIN kv ON ex.source = kv.source
    """,
)
def q226_kmin_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-mins distinct-count sketch (Flajolet–Martin / Bar-Yossef
    family) of per-source vocabulary, audited against the exact
    distinct count: {KMV_K} independent md5 permutations, the per-source
    MIN under each, and the estimator n̂ = k·2^60/Σmin − 1 (each min of
    n uniforms has mean space/(n+1)).  The mergeable way to size
    vocabularies across shards: per-shard state is {KMV_K} longs per
    source, merged by pairwise MIN — no sort, no per-source window,
    unlike a bottom-k sketch.

    Parity: the md5 bytes are identical in both engines, MIN/SUM over
    them are exact integers, and the estimate is a single double
    expression over those integers (the q203 rule); 2/4-dp rounds at
    the edge.

    Scale shape: one distinct collapse to (source, token); the sketch
    pass is map-side md5 × {KMV_K} with partial-combine MINs, so the
    shuffle carries |sources| × {KMV_K} cells regardless of corpus
    size; the exact side is ONE count per source over the same
    collapse (the audit's baseline cost, only paid when auditing).
    """
    docs = table(spark, sf_dir, "documents")
    t = local_checkpoint(
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        ).distinct(),
        "q226 source-token sets",
    )
    salts = spark.range(0, KMV_K).select(F.col("id").alias("salt"))
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("tok"), F.lit("|"), F.col("salt").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    kv = (
        t.crossJoin(F.broadcast(salts))
        .groupBy("source", "salt")
        .agg(F.min(u).alias("mn"))
        .groupBy("source")
        .agg(F.sum("mn").alias("sm"))
    )
    ex = t.groupBy("source").agg(F.count("*").alias("n_exact"))
    est = F.expr(f"{KMV_K} * {_KMV_SPACE} / sm - 1")
    return ex.join(kv, "source").select(
        "source",
        F.col("n_exact").cast("long"),
        dec(est, 2).alias("kmin_estimate"),
        dec((est - F.col("n_exact")) / F.col("n_exact"), 4).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# q228 — degree assortativity of the co-purchase graph
# ---------------------------------------------------------------------------


def _q228_oracle() -> str:
    return f"""
    WITH {_EDGE_CTES},
    sym AS MATERIALIZED (SELECT a AS s, bb AS d FROM e
                         UNION ALL SELECT bb, a FROM e),
    deg AS MATERIALIZED (SELECT s AS node, COUNT(*) AS dg FROM sym GROUP BY 1),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(da.dg) AS sx, SUM(db.dg) AS sy,
             SUM(da.dg * db.dg) AS sxy,
             SUM(da.dg * da.dg) AS sxx,
             SUM(db.dg * db.dg) AS syy
      FROM sym
      JOIN deg da ON da.node = sym.s
      JOIN deg db ON db.node = sym.d)
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           (ROUND((m.n * m.sxy - m.sx * m.sy) * 1.0
                  / (sqrt(m.n * m.sxx - m.sx * m.sx)
                     * sqrt(m.n * m.syy - m.sy * m.sy)), 6) + 0.0)
             AS assortativity
    FROM m
    """


@query("q228_degree_assortativity", oracle=_q228_oracle())
def q228_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the co-purchase part
    graph: the Pearson correlation of endpoint degrees over all
    directed edge stubs — positive means hubs link to hubs (a
    rich-club assortment), negative means hubs fan out to niche parts
    (the typical retail disassortative shape).  One number that tells
    a recommender whether popular-item neighborhoods are
    self-reinforcing before anyone mines them (q216/q199/q222).

    Parity: degree moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact
    BIGINTs over the symmetrized edge list; the correlation is a
    single double expression over them (the q203 rule — sqrt of exact
    integers is deterministic IEEE), rounded once at 6 dp.

    Scale shape: rides the shared capped-basket edge engine; two
    node-keyed joins attach endpoint degrees; ONE 1-row moment
    aggregate — no window, no per-node state.  Degree products top out
    around n·maxdeg² ≈ 1e19/corpus-dependent; at extreme corpus sizes
    the degree cap is the support threshold's job (raise
    TRI_MIN_SUPPORT with corpus density, the q47 ann_params note).
    """
    e = _copurchase_edges(spark, sf_dir, "q228_degree_assortativity")
    sym = e.select(F.col("a").alias("s"), F.col("bb").alias("d")).unionAll(
        e.select(F.col("bb").alias("s"), F.col("a").alias("d"))
    )
    deg = sym.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("dg"))
    da = deg.select(F.col("node").alias("s"), F.col("dg").alias("dx"))
    db = deg.select(F.col("node").alias("d"), F.col("dg").alias("dy"))
    m = (
        sym.join(da, "s")
        .join(db, "d")
        .agg(
            F.count("*").alias("n"),
            F.sum("dx").alias("sx"),
            F.sum("dy").alias("sy"),
            F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
            F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
            F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        )
    )
    counts = deg.agg(F.count("*").alias("n_nodes")).crossJoin(
        e.agg(F.count("*").alias("n_edges"))
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0 / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.crossJoin(F.broadcast(counts)).select(
        F.col("n_nodes").cast("long"),
        F.col("n_edges").cast("long"),
        dec(r, 6).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# q229 — Good–Turing unseen mass + Chao1 vocabulary richness per source
# ---------------------------------------------------------------------------

#: raw (non-deduplicated) 5-gram occurrences — Good–Turing needs true
#: frequencies, so this is llm_ops._SHINGLES_SQL minus the
#: list_distinct (and its Spark twin below minus array_distinct).
_RAW_W = "string_split(text, ' ')"
_RAW_SHINGLES_SQL = (
    f"CASE WHEN len({_RAW_W}) >= 5 THEN "
    f"list_transform(generate_series(1, len({_RAW_W}) - 4), "
    f"i -> array_to_string(({_RAW_W})[i:i+4], ' ')) "
    "ELSE [text] END"
)


def _raw_shingles(text):  # Column -> Column
    words = F.split(text, " ")
    n = F.size(words) - 4
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(words, i, 5)),
        ),
    ).otherwise(F.array(text))


@query(
    "q229_good_turing_richness",
    oracle=f"""
    WITH s AS MATERIALIZED (
      SELECT source, tok FROM (
        SELECT source, unnest({_RAW_SHINGLES_SQL}) AS tok
        FROM documents) x),
    f AS (SELECT source, tok, COUNT(*) AS c FROM s GROUP BY 1, 2),
    m AS (
      SELECT source,
             SUM(c) AS n, COUNT(*) AS v,
             SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS n2
      FROM f GROUP BY 1)
    SELECT source,
           CAST(n AS BIGINT) AS n_shingles,
           CAST(v AS BIGINT) AS vocab,
           CAST(n1 AS BIGINT) AS n_singletons,
           CAST(n2 AS BIGINT) AS n_doubletons,
           (ROUND(n1 * 1.0 / n, 6) + 0.0) AS unseen_mass,
           (ROUND(v + n1 * (n1 - 1) * 1.0 / (2 * (n2 + 1)), 2) + 0.0)
             AS chao1_richness
    FROM m
    """,
)
def q229_good_turing_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing unseen-mass and Chao1 richness per source: the
    singleton fraction n1/N estimates the probability the NEXT shingle
    drawn from a source is one never seen (is this source exhausted,
    or does more crawling pay?), and the bias-corrected Chao1
    V + n1(n1-1)/(2(n2+1)) estimates how much vocabulary remains —
    the coverage/deduplication-planning complement of q226's sketch
    (which sizes what IS seen).

    Parity: frequencies, N, V, n1, n2 are exact integers from two hash
    aggs; both estimators are single double expressions over them (the
    q203 rule); the Chao1 +1 correction also removes the n2 = 0
    division guard, identically in both engines.

    Scale shape: one raw 5-gram explode → (source, shingle) hash agg
    with map-side partial combine → |sources|-row moment agg.  No
    windows, no joins.
    """
    docs = table(spark, sf_dir, "documents")
    f = (
        docs.select("source", F.explode(_raw_shingles(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    m = f.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("v"),
        F.sum((F.col("c") == 1).cast("long")).alias("n1"),
        F.sum((F.col("c") == 2).cast("long")).alias("n2"),
    )
    return m.select(
        "source",
        F.col("n").cast("long").alias("n_shingles"),
        F.col("v").cast("long").alias("vocab"),
        F.col("n1").cast("long").alias("n_singletons"),
        F.col("n2").cast("long").alias("n_doubletons"),
        dec(F.col("n1") * 1.0 / F.col("n"), 6).alias("unseen_mass"),
        dec(
            F.col("v")
            + F.col("n1") * (F.col("n1") - 1) * 1.0 / (2 * (F.col("n2") + 1)),
            2,
        ).alias("chao1_richness"),
    )


# ---------------------------------------------------------------------------
# q233 — sketch-based join-cardinality estimation audit
# ---------------------------------------------------------------------------

#: key-sampling modulus: keep keys with md5(key) % M == 0 and scale
#: the sampled partial-product sum by M — an unbiased estimator of
#: |A JOIN B| = Σ_k cA(k)·cB(k) whose state is 1/M of the key domain.
JCE_M = 16

#: (join label, left table, left key, right table, right key)
_JCE_JOINS = (
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("events_events", "events", "user_id", "events", "user_id"),
)


def _q233_oracle() -> str:
    parts = []
    for label, lt, lk, rt, rk in _JCE_JOINS:
        parts.append(f"""
    SELECT '{label}' AS join_name, exact_rows, est_rows,
           (ROUND((est_rows - exact_rows) * 1e0 / exact_rows, 4) + 0.0)
             AS rel_error
    FROM (
      SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS exact_rows,
             CAST({JCE_M} * SUM(CASE WHEN
                    ('0x' || substr(md5(CAST(a.k AS VARCHAR)), 1, 8))::BIGINT
                      % {JCE_M} = 0
                    THEN a.c * b.c ELSE 0 END) AS BIGINT) AS est_rows
      FROM (SELECT {lk} AS k, COUNT(*) AS c FROM {lt} GROUP BY 1) a
      JOIN (SELECT {rk} AS k, COUNT(*) AS c FROM {rt} GROUP BY 1) b
        ON a.k = b.k) t""")
    return " UNION ALL ".join(parts)


@query("q233_join_cardinality_estimate", oracle=_q233_oracle())
def q233_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based join-size estimation audited against the exact
    answer: |A ⋈ B| = Σ_k cA(k)·cB(k), estimated from the 1/{JCE_M}
    md5-sampled key slice scaled by {JCE_M} — the cost-based-optimizer
    primitive (join reordering, broadcast-threshold decisions) that
    lets a planner predict a blow-up join (the events self-join's
    Σ c(u)² here) BEFORE running it.  Deterministic md5 key sampling
    makes the "estimate" reproducible and hash-checkable — the same
    trick q58/q148 use for rows, applied to the key domain.

    Parity: per-key counts, products, and both sums are exact
    integers; the single division is the reported relative error
    (4 dp).

    Scale shape: per join, TWO key hash-aggs (map-side combine) and a
    key-collapsed join — never the row-level join whose size is being
    predicted; the sketch side is the same aggregate filtered to the
    sampled key slice, so its state is 1/{JCE_M} of the key domain.
    Output is {len(_JCE_JOINS)} rows.
    """
    out = None
    for label, lt, lk, rt, rk in _JCE_JOINS:
        a = (
            table(spark, sf_dir, lt)
            .groupBy(F.col(lk).alias("k"))
            .agg(F.count("*").alias("ca"))
        )
        b = (
            table(spark, sf_dir, rt)
            .groupBy(F.col(rk).alias("k"))
            .agg(F.count("*").alias("cb"))
        )
        coin = (
            F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % JCE_M
            == 0
        )
        j = a.join(b, "k").select(
            (F.col("ca") * F.col("cb")).alias("p"),
            F.when(coin, F.col("ca") * F.col("cb")).otherwise(F.lit(0)).alias("sp"),
        )
        row = j.agg(
            F.sum("p").cast("long").alias("exact_rows"),
            (F.lit(JCE_M) * F.sum("sp")).cast("long").alias("est_rows"),
        ).select(
            F.lit(label).alias("join_name"),
            "exact_rows",
            "est_rows",
            dec(
                (F.col("est_rows") - F.col("exact_rows"))
                * F.expr("1e0")
                / F.col("exact_rows"),
                4,
            ).alias("rel_error"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# q234 — external cluster validation: purity + NMI of q201 vs labels
# ---------------------------------------------------------------------------


def _q234_oracle() -> str:
    return f"""
    WITH {_km_ctes()},
    cont AS (
      SELECT a.cid, e.label, COUNT(*) AS n
      FROM asg2 a JOIN embeddings e ON e.vec_id = a.vec_id
      GROUP BY 1, 2),
    nc AS (SELECT cid, SUM(n) AS ncid FROM cont GROUP BY 1),
    nl AS (SELECT label, SUM(n) AS nlab FROM cont GROUP BY 1),
    tt AS (SELECT SUM(n) AS nn FROM cont),
    mi AS (
      SELECT SUM(c.n * ln((c.n * 1e0 * t.nn) / (nc.ncid * 1e0 * nl.nlab)))
               / MAX(t.nn) AS i
      FROM cont c
      JOIN nc ON nc.cid = c.cid
      JOIN nl ON nl.label = c.label
      CROSS JOIN tt t),
    hc AS (SELECT -SUM(ncid * ln(ncid * 1e0 / t.nn)) / MAX(t.nn) AS h
           FROM nc CROSS JOIN tt t),
    hl AS (SELECT -SUM(nlab * ln(nlab * 1e0 / t.nn)) / MAX(t.nn) AS h
           FROM nl CROSS JOIN tt t),
    mj AS (
      SELECT cid, label AS majority_label, n AS majority_n
      FROM (SELECT cid, label, n, ROW_NUMBER() OVER (
              PARTITION BY cid ORDER BY n DESC, label) AS rk
            FROM cont) WHERE rk = 1),
    pur AS (SELECT SUM(majority_n) AS pn FROM mj)
    SELECT mj.cid,
           CAST(nc.ncid AS BIGINT) AS n_members,
           mj.majority_label,
           CAST(mj.majority_n AS BIGINT) AS majority_n,
           (ROUND(p.pn * 1e0 / t.nn, 4) + 0.0) AS purity,
           (ROUND(2 * mi.i / (hc.h + hl.h), 4) + 0.0) AS nmi
    FROM mj
    JOIN nc ON nc.cid = mj.cid
    CROSS JOIN pur p CROSS JOIN tt t CROSS JOIN mi CROSS JOIN hc
    CROSS JOIN hl
    """


@query("q234_cluster_purity_nmi", oracle=_q234_oracle())
def q234_cluster_purity_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External validation of the q201 k-means clustering against the
    embeddings' ground-truth ``label``: per-cluster majority label +
    size, corpus purity (Σ majority / N), and normalized mutual
    information 2·I(C;L)/(H(C)+H(L)) — the does-the-clustering-mean-
    anything audit that inertia (q201) and silhouette (q185) can't
    answer because they never look at labels.  Composes the SHARED
    Lloyd engine (``_kmeans_final`` / ``_km_ctes``), so the validated
    clustering is exactly the registered one (the q99/q232 rule).

    Parity: the contingency table and its margins are exact integers
    over the bounded (k × |labels|) frame; purity is an integer ratio;
    NMI's ln terms follow the q107 precedent (≤ k·|labels| bounded
    addends, 4-dp edge round absorbs ulp).  Majority argmax ties break
    on the label.

    Scale shape: the assignment is q201's map-only scan; ONE
    (cid, label) hash agg collapses the corpus; everything downstream
    (margins, MI, entropies, majority window) runs on the ≤ k·|labels|
    collapse with 1-row attaches.
    """
    asg, _ = _kmeans_final(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    cont = (
        asg.select("vec_id", "cid")
        .join(emb, "vec_id")
        .groupBy("cid", "label")
        .agg(F.count("*").alias("n"))
    )
    nc = cont.groupBy("cid").agg(F.sum("n").alias("ncid"))
    nl = cont.groupBy("label").agg(F.sum("n").alias("nlab"))
    tt = cont.agg(F.sum("n").alias("nn"))
    mi = (
        cont.join(nc, "cid")
        .join(nl, "label")
        .crossJoin(F.broadcast(tt))
        .agg(
            (
                F.sum(
                    F.col("n")
                    * F.log(
                        (F.col("n") * F.expr("1e0") * F.col("nn"))
                        / (F.col("ncid") * F.expr("1e0") * F.col("nlab"))
                    )
                )
                / F.max("nn")
            ).alias("i")
        )
    )
    hc = nc.crossJoin(F.broadcast(tt)).agg(
        (
            -F.sum(F.col("ncid") * F.log(F.col("ncid") * F.expr("1e0") / F.col("nn")))
            / F.max("nn")
        ).alias("hc")
    )
    hl = nl.crossJoin(F.broadcast(tt)).agg(
        (
            -F.sum(F.col("nlab") * F.log(F.col("nlab") * F.expr("1e0") / F.col("nn")))
            / F.max("nn")
        ).alias("hl")
    )
    wmj = W.partitionBy("cid").orderBy(F.col("n").desc(), "label")
    mj = (
        cont.withColumn("rk", F.row_number().over(wmj))
        .filter(F.col("rk") == 1)
        .select("cid", F.col("label").alias("majority_label"), F.col("n").alias("majority_n"))
    )
    pur = mj.agg(F.sum("majority_n").alias("pn"))
    return (
        mj.join(nc, "cid")
        .crossJoin(F.broadcast(pur))
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .select(
            F.col("cid").cast("int"),
            F.col("ncid").cast("long").alias("n_members"),
            "majority_label",
            F.col("majority_n").cast("long"),
            dec(F.col("pn") * F.expr("1e0") / F.col("nn"), 4).alias("purity"),
            dec(2 * F.col("i") / (F.col("hc") + F.col("hl")), 4).alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# q250 — co-purchase edge churn between consecutive years
# ---------------------------------------------------------------------------


def _q250_oracle() -> str:
    return f"""
    WITH b0 AS (
      SELECT l.l_orderkey,
             EXTRACT(year FROM o.o_orderdate) AS yr,
             (list_sort(list(DISTINCT l.l_partkey)))[1:{TRI_MAX_BASKET}]
               AS parts
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2),
    b AS (SELECT l_orderkey, yr, unnest(parts) AS pk FROM b0),
    e AS MATERIALIZED (
      SELECT x.yr AS yr, x.pk AS a, y.pk AS bb
      FROM b x JOIN b y
        ON x.l_orderkey = y.l_orderkey AND x.yr = y.yr AND x.pk < y.pk
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= {TRI_MIN_SUPPORT}),
    yrs AS (SELECT DISTINCT yr FROM e),
    pair AS (
      SELECT p.yr AS y1, p.yr + 1 AS y2
      FROM yrs p JOIN yrs q ON q.yr = p.yr + 1),
    cmp AS (
      SELECT pr.y1, pr.y2,
             (SELECT COUNT(*) FROM e WHERE e.yr = pr.y1) AS n_old,
             (SELECT COUNT(*) FROM e WHERE e.yr = pr.y2) AS n_new,
             (SELECT COUNT(*) FROM e x JOIN e y
               ON x.a = y.a AND x.bb = y.bb
              WHERE x.yr = pr.y1 AND y.yr = pr.y2) AS n_common
      FROM pair pr)
    SELECT CAST(y1 AS BIGINT) AS year_from,
           CAST(y2 AS BIGINT) AS year_to,
           CAST(n_old AS BIGINT) AS n_edges_from,
           CAST(n_new AS BIGINT) AS n_edges_to,
           CAST(n_common AS BIGINT) AS n_common,
           (ROUND(n_common * 1e0
                  / GREATEST(n_old + n_new - n_common, 1), 6) + 0.0)
             AS edge_jaccard
    FROM cmp
    """


@query("q250_edge_churn", oracle=_q250_oracle())
def q250_edge_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal graph evolution: the co-purchase edge set rebuilt PER
    ORDER YEAR, then year-over-year edge Jaccard — how fast the
    "bought together" structure churns, the drift monitor that decides
    when q215/q216's mined communities and recommendations are stale
    and must be refreshed.

    Parity: per-year edges ride the capped-basket explode with the
    support floor (q199's contract, per year); all counts exact
    integers; one division per year pair.

    Scale shape: the explode cost is the same Σ C(basket, 2) bound
    sliced by year; the year-pair comparison is an edge-keyed
    self-join of the year-tagged edge table (checkpointed once);
    output is |years|−1 rows.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    baskets = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", F.year("o_orderdate").alias("yr"))
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    b = baskets.select(
        "l_orderkey", "yr", F.explode(F.slice("parts", 1, TRI_MAX_BASKET)).alias("pk")
    )
    e = local_checkpoint(
        b.select("l_orderkey", "yr", F.col("pk").alias("a"))
        .join(
            b.select("l_orderkey", "yr", F.col("pk").alias("bb")),
            ["l_orderkey", "yr"],
        )
        .filter(F.col("a") < F.col("bb"))
        .groupBy("yr", "a", "bb")
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") >= TRI_MIN_SUPPORT)
        .select("yr", "a", "bb"),
        "q250 yearly edges",
    )
    cnt = e.groupBy("yr").agg(F.count("*").alias("n"))
    old = e.select(F.col("yr").alias("y1"), "a", "bb")
    new = e.select((F.col("yr") - 1).alias("y1"), "a", "bb")
    common = (
        old.join(new, ["y1", "a", "bb"])
        .groupBy("y1")
        .agg(F.count("*").alias("n_common"))
    )
    co = cnt.select(F.col("yr").alias("y1"), F.col("n").alias("n_old"))
    cn = cnt.select((F.col("yr") - 1).alias("y1"), F.col("n").alias("n_new"))
    return (
        co.join(cn, "y1")
        .join(common, "y1", "left")
        .select(
            F.col("y1").cast("long").alias("year_from"),
            (F.col("y1") + 1).cast("long").alias("year_to"),
            F.col("n_old").cast("long").alias("n_edges_from"),
            F.col("n_new").cast("long").alias("n_edges_to"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            dec(
                F.coalesce("n_common", F.lit(0))
                * F.expr("1e0")
                / F.greatest(
                    F.col("n_old") + F.col("n_new") - F.coalesce("n_common", F.lit(0)),
                    F.lit(1),
                ),
                6,
            ).alias("edge_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# q260 — common-neighbor link prediction on the co-purchase graph
# ---------------------------------------------------------------------------

LINK_TOP_K = 20


@query(
    "q260_common_neighbor_links",
    oracle=f"""
    WITH {_EDGE_CTES},
    sym AS (SELECT a AS n, bb AS nb FROM e UNION ALL SELECT bb, a FROM e),
    deg AS (SELECT n, COUNT(*) AS d FROM sym GROUP BY 1),
    cn AS (SELECT s1.n AS u, s2.n AS v, COUNT(*) AS cnt
           FROM sym s1 JOIN sym s2 ON s1.nb = s2.nb AND s1.n < s2.n
           GROUP BY 1, 2),
    ne AS (SELECT cn.u, cn.v, cn.cnt
           FROM cn ANTI JOIN e ON e.a = cn.u AND e.bb = cn.v),
    j AS (SELECT ne.u, ne.v, ne.cnt, du.d AS du, dv.d AS dv
          FROM ne
          JOIN deg du ON du.n = ne.u
          JOIN deg dv ON dv.n = ne.v)
    SELECT u AS part_a, v AS part_b,
           CAST(cnt AS BIGINT) AS common_neighbors,
           (ROUND(cnt * 1e0 / (du + dv - cnt), 6) + 0.0) AS jaccard
    FROM j
    QUALIFY row_number() OVER (ORDER BY cnt DESC, u, v) <= {LINK_TOP_K}
    """,
)
def q260_common_neighbor_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the part co-purchase graph: the top
    {LINK_TOP_K} NON-adjacent part pairs by common-neighbor count (with
    their neighbor-set Jaccard) — the "customers who bought these also
    bought..." candidate generator run before any learned recommender.

    Scale shape: common-neighbor counting needs EVERY wedge, so the
    triangle trick (degree orientation, which enumerates each wedge at
    its lowest-order corner only) does not apply — instead each
    center's neighbor list feeds ``blocking.chunk_buckets``: a hot hub
    spreads its pair generation across ≤ cap²-sized tasks with zero
    recall loss and observable fan-out counters (the q42/q43
    machinery).  Candidate pairs anti-join the edge table; the global
    top-k is a TakeOrderedAndProject on the total order (count desc,
    id, id) so the k-boundary never depends on an engine tiebreak.

    Parity: counts and degrees are integers; Jaccard = cnt/(du+dv−cnt)
    is the single 6-dp division (the pair is a non-edge, so the union
    needs no −2 correction).
    """
    edges = _copurchase_edges(spark, sf_dir, "q260_common_neighbor_links")
    sym = edges.select(F.col("a").alias("n"), F.col("bb").alias("nb")).unionAll(
        edges.select(F.col("bb").alias("n"), F.col("a").alias("nb"))
    )
    deg = local_checkpoint(
        sym.groupBy("n").agg(F.count("*").alias("d")), "q260 degree table"
    )
    nbrs = (
        sym.groupBy("n")
        .agg(F.collect_list("nb").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = blocking.chunk_buckets(
        nbrs, "q260_common_neighbor_links", "ids"
    ).select(F.explode(blocking.chunk_pair_structs()).alias("p"))
    cn = pairs.groupBy(
        F.col("p.a").alias("u"), F.col("p.b").alias("v")
    ).agg(F.count("*").alias("cnt"))
    ne = cn.join(
        edges,
        (cn.u == edges.a) & (cn.v == edges.bb),
        "anti",
    )
    j = ne.join(
        deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    return (
        j.orderBy(F.col("cnt").desc(), "u", "v")
        .limit(LINK_TOP_K)
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            F.col("cnt").cast("long").alias("common_neighbors"),
            dec(
                F.col("cnt")
                * F.expr("1e0")
                / (F.col("du") + F.col("dv") - F.col("cnt")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# q261 — per-node local clustering coefficient
# ---------------------------------------------------------------------------


@query(
    "q261_local_clustering",
    oracle=f"""
    WITH {_EDGE_CTES},
    sym AS (SELECT a AS n, bb AS nb FROM e UNION ALL SELECT bb, a FROM e),
    deg AS (SELECT n, COUNT(*) AS d FROM sym GROUP BY 1),
    tri AS (SELECT e1.a AS x, e1.bb AS y, e2.bb AS z
            FROM e e1
            JOIN e e2 ON e2.a = e1.bb
            JOIN e e3 ON e3.a = e1.a AND e3.bb = e2.bb),
    tn AS (SELECT n, COUNT(*) AS t
           FROM (SELECT unnest([x, y, z]) AS n FROM tri)
           GROUP BY 1)
    SELECT deg.n AS part, CAST(deg.d AS BIGINT) AS degree,
           CAST(COALESCE(tn.t, 0) AS BIGINT) AS n_triangles,
           (ROUND(2 * COALESCE(tn.t, 0) * 1e0
                  / (deg.d * (deg.d - 1)), 6) + 0.0) AS clustering
    FROM deg LEFT JOIN tn ON tn.n = deg.n
    WHERE deg.d >= 2
    """,
)
def q261_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part LOCAL clustering coefficient 2t/(d(d−1)) on the
    co-purchase graph — q199 reports the global census; this
    attributes each triangle to its three corners, the per-node cohesion
    feature community detectors and spam filters consume.

    Scale shape: triangles enumerate once via the degree-oriented
    wedge join + edge close (m^1.5 bound, q199's machinery), each
    closed triangle explodes to exactly 3 (node, 1) rows, and the
    coefficient is a map-side expression over the |nodes|-row
    degree⋈count join.

    Parity: t and d are integers; the coefficient is the single 6-dp
    division.
    """
    edges = _copurchase_edges(spark, sf_dir, "q261_local_clustering")
    deg = local_checkpoint(
        edges.select(F.col("a").alias("n"))
        .unionAll(edges.select(F.col("bb").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d")),
        "q261 degree table",
    )
    e2 = (
        edges.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("bb"), F.col("d").alias("db")), "bb")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("bb"))
    )
    o = local_checkpoint(
        e2.select(
            F.when(fwd, F.col("a")).otherwise(F.col("bb")).alias("u"),
            F.when(fwd, F.col("bb")).otherwise(F.col("a")).alias("v"),
            F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
        ),
        "q261 oriented edges",
    )
    x, y = o.alias("x"), o.alias("y")
    wedge_lt = (F.col("x.dv") < F.col("y.dv")) | (
        (F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v"))
    )
    closed = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & wedge_lt)
        .select(
            F.col("x.u").alias("c"),
            F.col("x.v").alias("u"),
            F.col("y.v").alias("v"),
        )
        .join(o.select("u", "v"), ["u", "v"], "left_semi")
    )
    tn = closed.select(
        F.explode(F.array("c", "u", "v")).alias("n")
    ).groupBy("n").agg(F.count("*").alias("t"))
    return (
        deg.filter(F.col("d") >= 2)
        .join(tn, "n", "left")
        .select(
            F.col("n").alias("part"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
            dec(
                2
                * F.coalesce(F.col("t"), F.lit(0))
                * F.expr("1e0")
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("clustering"),
        )
    )


# ---------------------------------------------------------------------------
# q262 — character-class corpus profile
# ---------------------------------------------------------------------------


@query(
    "q262_charset_profile",
    oracle="""
    WITH per AS (
      SELECT source,
             LEN(text) AS n,
             LEN(text) - LEN(regexp_replace(text, '[a-zA-Z]', '', 'g'))
               AS letters,
             LEN(text) - LEN(regexp_replace(text, '[0-9]', '', 'g'))
               AS digits,
             LEN(text) - LEN(regexp_replace(text, ' ', '', 'g')) AS spaces
      FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_chars,
           CAST(SUM(letters) AS BIGINT) AS letter_chars,
           CAST(SUM(digits) AS BIGINT) AS digit_chars,
           CAST(SUM(spaces) AS BIGINT) AS space_chars,
           CAST(SUM(n - letters - digits - spaces) AS BIGINT) AS other_chars,
           (ROUND(SUM(n - letters - digits - spaces) * 1e0
                  / SUM(n), 6) + 0.0) AS other_ratio
    FROM per GROUP BY 1
    """,
)
def q262_charset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class profile per source: letter / digit / space /
    other densities — the mojibake & markup tripwire a crawl-ingest
    pipeline runs before language ID (a source whose "other" ratio
    jumps is emitting binary junk, entities, or a new markup format;
    cf. q50's quality score, which consumes these shapes per doc).

    Parity: counts are length deltas of regexp_replace (both engines
    replace ALL matches — DuckDB needs the explicit 'g' flag); one
    ratio at 6 dp.

    Scale shape: map-only character counting (JVM regex inside
    codegen, zero UDFs), one hash agg to |sources| cells.
    """
    d = table(spark, sf_dir, "documents")
    n = F.length("text")
    letters = n - F.length(F.regexp_replace("text", "[a-zA-Z]", ""))
    digits = n - F.length(F.regexp_replace("text", "[0-9]", ""))
    spaces = n - F.length(F.regexp_replace("text", " ", ""))
    per = d.select(
        "source",
        n.alias("n"),
        letters.alias("letters"),
        digits.alias("digits"),
        spaces.alias("spaces"),
    )
    other = F.sum(
        F.col("n") - F.col("letters") - F.col("digits") - F.col("spaces")
    )
    return per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("n_chars"),
        F.sum("letters").cast("long").alias("letter_chars"),
        F.sum("digits").cast("long").alias("digit_chars"),
        F.sum("spaces").cast("long").alias("space_chars"),
        other.cast("long").alias("other_chars"),
        dec(other * F.expr("1e0") / F.sum("n"), 6).alias("other_ratio"),
    )


# ---------------------------------------------------------------------------
# q263 — shingle novelty curve (corpus growth diagnostics)
# ---------------------------------------------------------------------------

NOVELTY_BATCH = 50


@query(
    "q263_shingle_novelty_curve",
    oracle=f"""
    WITH docs AS (SELECT doc_id // {NOVELTY_BATCH} AS batch,
                         {_SHINGLES_SQL} AS sh
                  FROM documents),
    ps AS (SELECT DISTINCT batch, unnest(sh) AS s FROM docs),
    fs AS (SELECT s, MIN(batch) AS fb FROM ps GROUP BY 1)
    SELECT CAST(ps.batch AS BIGINT) AS batch,
           CAST(COUNT(*) AS BIGINT) AS distinct_shingles,
           CAST(SUM(CASE WHEN fs.fb = ps.batch THEN 1 ELSE 0 END) AS BIGINT)
             AS new_shingles,
           (ROUND(SUM(CASE WHEN fs.fb = ps.batch THEN 1 ELSE 0 END) * 1e0
                  / COUNT(*), 6) + 0.0) AS novelty
    FROM ps JOIN fs ON fs.s = ps.s
    GROUP BY 1
    """,
)
def q263_shingle_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty curve over ingest batches of {NOVELTY_BATCH} docs: the
    fraction of a batch's distinct 5-gram shingles never seen in any
    earlier batch — the diminishing-returns diagnostic that tells a
    data-acquisition team when a source is mined out (and sizes the
    dedup work q41/q43 will face as the corpus grows).

    Parity: batch = integer floor-div of doc_id; everything is
    distinct-counting; one ratio at 6 dp.

    Scale shape: one shingle explode, ONE distinct collapse to
    (batch, shingle), a min-batch agg keyed on the shingle (map-side
    combinable), and the re-join is shingle-keyed — both sides hash by
    the same key, so the first-seen attach reuses the collapse
    partitioning.  Output is |batches| rows.
    """
    # integer div, not double-div-then-cast: equal for the fixture's
    # non-negative ids, but `div` keeps the batch key integer-routed
    # like q268/q274 (ADVICE r7 #3 — float routing diverges from the
    # oracle's `//` on negative ids).
    docs = _fanout(spark, table(spark, sf_dir, "documents")).select(
        F.expr(f"CAST(CAST(doc_id AS BIGINT) div {NOVELTY_BATCH} AS BIGINT)")
        .alias("batch"),
        _shingles(F.col("text")).alias("sh"),
    )
    ps = docs.select("batch", F.explode("sh").alias("s")).distinct()
    fs = ps.groupBy("s").agg(F.min("batch").alias("fb"))
    return (
        ps.join(fs, "s")
        .groupBy("batch")
        .agg(
            F.count("*").cast("long").alias("distinct_shingles"),
            F.sum((F.col("fb") == F.col("batch")).cast("long"))
            .cast("long")
            .alias("new_shingles"),
        )
        .select(
            F.col("batch").cast("long").alias("batch"),
            "distinct_shingles",
            "new_shingles",
            dec(
                F.col("new_shingles") * F.expr("1e0") / F.col("distinct_shingles"),
                6,
            ).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# q264 — quantile forecast backtest (pinball loss)
# ---------------------------------------------------------------------------

#: pinball quantile (τ = 0.9) and the train/test year split
PINBALL_TAU10 = 9
PINBALL_SPLIT_YEAR = 1998


@query(
    "q264_pinball_backtest",
    oracle=f"""
    WITH o AS (
      SELECT o_orderpriority AS pri,
             EXTRACT(year FROM o_orderdate) AS yr,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders),
    tr AS (SELECT pri, cents, COUNT(*) AS cnt FROM o
           WHERE yr < {PINBALL_SPLIT_YEAR} GROUP BY 1, 2),
    kt AS (SELECT pri, (({PINBALL_TAU10} * SUM(cnt) + 9) // 10) AS k
           FROM tr GROUP BY 1),
    cum AS (SELECT pri, cents,
                   SUM(cnt) OVER (PARTITION BY pri ORDER BY cents
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM tr),
    yhat AS (SELECT cum.pri, MIN(cum.cents) AS yhat
             FROM cum JOIN kt ON kt.pri = cum.pri
             WHERE cum.cum >= kt.k GROUP BY 1),
    te AS (SELECT o.pri, o.cents, y.yhat FROM o
           JOIN yhat y ON y.pri = o.pri
           WHERE o.yr >= {PINBALL_SPLIT_YEAR})
    SELECT pri AS priority,
           CAST(ANY_VALUE(yhat) AS BIGINT) AS yhat_cents,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           (ROUND(SUM(GREATEST({PINBALL_TAU10} * (cents - yhat),
                               yhat - cents)) * 1e0
                  / (10 * COUNT(*)), 4) + 0.0) AS mean_pinball
    FROM te GROUP BY 1
    """,
)
def q264_pinball_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast backtest: per order priority, predict the
    τ=0.9 order-value quantile from the pre-{PINBALL_SPLIT_YEAR} years
    and score it on the later years with pinball (quantile) loss — the
    standard evaluation for the P90 capacity forecasts q141/q186
    produce (a forecast that merely looks high is not checked; pinball
    loss is minimized by the true quantile).

    Parity: the predictor is an EXACT order statistic — the k-th
    smallest train value, k = ⌈0.9·n⌉ via integer (9n+9)//10 — read
    off a cumulative-count window over the (priority, cents) collapse
    (the q227 rank pattern), so no interpolation crosses the engine
    boundary; the loss is the integer GREATEST(9·(y−ŷ), ŷ−y) (10×
    scale keeps τ=0.9 exact) with ONE division at the edge.

    Scale shape: train collapses to (priority, distinct cents) before
    the window (bounded by the value domain, never the row count);
    test joins the 5-row ŷ table; both aggs map-combine.
    """
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.year("o_orderdate").alias("yr"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    tr = (
        o.filter(F.col("yr") < PINBALL_SPLIT_YEAR)
        .groupBy("pri", "cents")
        .agg(F.count("*").alias("cnt"))
    )
    kt = tr.groupBy("pri").agg(
        F.expr(f"CAST(({PINBALL_TAU10} * SUM(cnt) + 9) div 10 AS BIGINT)").alias(
            "k"
        )
    )
    cum_w = (
        W.partitionBy("pri").orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    )
    cum = tr.withColumn("cum", F.sum("cnt").over(cum_w))
    yhat = (
        cum.join(kt, "pri")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("pri")
        .agg(F.min("cents").alias("yhat"))
    )
    te = o.filter(F.col("yr") >= PINBALL_SPLIT_YEAR).join(yhat, "pri")
    loss10 = F.greatest(
        PINBALL_TAU10 * (F.col("cents") - F.col("yhat")),
        F.col("yhat") - F.col("cents"),
    )
    return te.groupBy(F.col("pri").alias("priority")).agg(
        F.first("yhat").cast("long").alias("yhat_cents"),
        F.count("*").cast("long").alias("n_test"),
        dec(
            F.sum(loss10) * F.expr("1e0") / (10 * F.count("*")), 4
        ).alias("mean_pinball"),
    )


# ---------------------------------------------------------------------------
# q265 — randomization test for a two-sample mean difference
# ---------------------------------------------------------------------------

RAND_TEST_K = 200
RAND_TEST_LANG = "en"


@query(
    "q265_randomization_test",
    oracle=f"""
    WITH d AS (SELECT doc_id, n_chars,
                      CASE WHEN lang = '{RAND_TEST_LANG}' THEN 0 ELSE 1 END
                        AS grp
               FROM documents),
    obs AS (
      SELECT SUM(CASE WHEN grp = 0 THEN n_chars END) * 1e0
               / COUNT(CASE WHEN grp = 0 THEN 1 END)
             - SUM(CASE WHEN grp = 1 THEN n_chars END) * 1e0
               / COUNT(CASE WHEN grp = 1 THEN 1 END) AS diff
      FROM d),
    perm AS (
      SELECT ks.k,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '_'
                                 || CAST(ks.k AS VARCHAR)), 1, 1))::BIGINT % 2
               AS coin,
             d.n_chars
      FROM d, (SELECT unnest(generate_series(0, {RAND_TEST_K - 1})) AS k) ks),
    stat AS (
      SELECT k,
             SUM(CASE WHEN coin = 0 THEN n_chars END) * 1e0
               / NULLIF(COUNT(CASE WHEN coin = 0 THEN 1 END), 0)
             - SUM(CASE WHEN coin = 1 THEN n_chars END) * 1e0
               / NULLIF(COUNT(CASE WHEN coin = 1 THEN 1 END), 0) AS s
      FROM perm GROUP BY 1)
    SELECT (ROUND(obs.diff, 6) + 0.0) AS obs_diff,
           CAST(SUM(CASE WHEN ABS(stat.s) >= ABS(obs.diff)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           (ROUND((1 + SUM(CASE WHEN ABS(stat.s) >= ABS(obs.diff)
                                THEN 1 ELSE 0 END)) * 1e0
                  / ({RAND_TEST_K} + 1), 6) + 0.0) AS p_value
    FROM stat CROSS JOIN obs
    GROUP BY obs.diff
    """,
)
def q265_randomization_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (Monte-Carlo permutation) test: is the
    '{RAND_TEST_LANG}'-vs-rest mean document length difference
    explainable by chance?  {RAND_TEST_K} deterministic md5-coin
    relabelings of the corpus re-compute the mean difference under the
    null; the p-value is the add-one-smoothed fraction of relabelings
    at least as extreme as the observed split — the assumption-free
    significance test teams reach for when t-test normality is
    dubious (long-tailed document lengths).

    Parity: every relabeling is the q58 md5 coin keyed on
    (doc_id, k) — identical bytes in both engines; each statistic is
    ONE double expression over exact integer sums (deterministic IEEE
    eval), so the |s| ≥ |obs| comparisons agree exactly; the p-value
    is a count ratio.

    Scale shape: the ×{RAND_TEST_K} explode is map-side and collapses
    to 2·{RAND_TEST_K} partial-agg cells before the shuffle; the
    observed split is a 1-row attach.  Linear in corpus × K.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == RAND_TEST_LANG, 0).otherwise(1).alias("grp"),
    )
    obs = d.agg(
        (
            F.sum(F.when(F.col("grp") == 0, F.col("n_chars")))
            * F.expr("1e0")
            / F.count(F.when(F.col("grp") == 0, F.lit(1)))
            - F.sum(F.when(F.col("grp") == 1, F.col("n_chars")))
            * F.expr("1e0")
            / F.count(F.when(F.col("grp") == 1, F.lit(1)))
        ).alias("diff")
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_", F.col("doc_id").cast("string"), F.col("k").cast("string")
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    perm = d.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(RAND_TEST_K - 1))).alias("k"),
    ).select("k", "n_chars", coin.alias("coin"))
    stat = perm.groupBy("k").agg(
        (
            F.sum(F.when(F.col("coin") == 0, F.col("n_chars")))
            * F.expr("1e0")
            / F.nullif(F.count(F.when(F.col("coin") == 0, F.lit(1))), F.lit(0))
            - F.sum(F.when(F.col("coin") == 1, F.col("n_chars")))
            * F.expr("1e0")
            / F.nullif(F.count(F.when(F.col("coin") == 1, F.lit(1))), F.lit(0))
        ).alias("s")
    )
    extreme = (F.abs(F.col("s")) >= F.abs(F.col("diff"))).cast("long")
    return (
        stat.crossJoin(F.broadcast(obs))
        .groupBy("diff")
        .agg(
            F.sum(extreme).cast("long").alias("n_extreme"),
        )
        .select(
            dec(F.col("diff"), 6).alias("obs_diff"),
            "n_extreme",
            dec(
                (1 + F.col("n_extreme")) * F.expr("1e0") / (RAND_TEST_K + 1), 6
            ).alias("p_value"),
        )
    )


# ---------------------------------------------------------------------------
# q266 — monthly seasonal index of order revenue
# ---------------------------------------------------------------------------


@query(
    "q266_seasonal_index",
    oracle="""
    WITH m AS (
      SELECT EXTRACT(month FROM o_orderdate) AS mo,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1),
    t AS (SELECT SUM(cents) AS total FROM m)
    SELECT CAST(m.mo AS BIGINT) AS month,
           CAST(m.cents AS BIGINT) AS revenue_cents,
           (ROUND(12 * m.cents * 1e0 / t.total, 6) + 0.0) AS seasonal_index
    FROM m CROSS JOIN t
    """,
)
def q266_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month seasonal index of order revenue: each month's
    share of total revenue normalized so a flat year is 1.0 — the
    first-pass seasonality profile behind q163's anomaly bands and
    q211's forecast initialization (an index of 1.3 in December is the
    multiplicative factor a naive forecast must carry).

    Parity: integer cents; one division per output row, 6 dp.

    Scale shape: one hash agg to 12 cells, a 1-row total attach — the
    q190 weekday pattern on the month axis.
    """
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.month("o_orderdate").alias("mo")).agg(
        F.sum(
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).alias("cents")
    )
    t = m.agg(F.sum("cents").alias("total"))
    return m.crossJoin(F.broadcast(t)).select(
        F.col("mo").cast("long").alias("month"),
        F.col("cents").cast("long").alias("revenue_cents"),
        dec(12 * F.col("cents") * F.expr("1e0") / F.col("total"), 6).alias(
            "seasonal_index"
        ),
    )


# ---------------------------------------------------------------------------
# q267 — co-purchase CF holdout evaluation (precision/recall @ k)
# ---------------------------------------------------------------------------

CF_EVAL_SPLIT_YEAR = 1998
CF_EVAL_K = 5


def _cf_eval_ctes() -> str:
    """Year-split capped basket explodes shared by the q267 oracle —
    the q199 edge build restricted to train/test order years."""
    return f"""
    ob AS (SELECT l.l_orderkey,
                  EXTRACT(year FROM o.o_orderdate) AS yr,
                  (list_sort(list(DISTINCT l.l_partkey)))[1:{TRI_MAX_BASKET}]
                    AS parts
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2),
    bx AS (SELECT l_orderkey, yr, unnest(parts) AS pk FROM ob),
    tre AS (SELECT x.pk AS a, y.pk AS bb, COUNT(*) AS cnt
            FROM bx x JOIN bx y
              ON x.l_orderkey = y.l_orderkey AND x.pk < y.pk
            WHERE x.yr < {CF_EVAL_SPLIT_YEAR}
            GROUP BY 1, 2 HAVING COUNT(*) >= {TRI_MIN_SUPPORT}),
    tse AS (SELECT DISTINCT x.pk AS a, y.pk AS bb
            FROM bx x JOIN bx y
              ON x.l_orderkey = y.l_orderkey AND x.pk < y.pk
            WHERE x.yr >= {CF_EVAL_SPLIT_YEAR}),
    trs AS (SELECT a AS p, bb AS nb, cnt FROM tre
            UNION ALL SELECT bb, a, cnt FROM tre),
    tss AS (SELECT a AS p, bb AS nb FROM tse
            UNION ALL SELECT bb, a FROM tse),
    recs AS (SELECT p, nb FROM trs
             QUALIFY row_number() OVER (PARTITION BY p
                                        ORDER BY cnt DESC, nb)
                     <= {CF_EVAL_K})"""


@query(
    "q267_cf_holdout_eval",
    oracle=f"""
    WITH {_cf_eval_ctes()},
    nrec AS (SELECT p, COUNT(*) AS n_recs FROM recs GROUP BY 1),
    ntst AS (SELECT p, COUNT(*) AS n_test FROM tss GROUP BY 1),
    hits AS (SELECT recs.p, COUNT(*) AS h
             FROM recs JOIN tss ON tss.p = recs.p AND tss.nb = recs.nb
             GROUP BY 1)
    SELECT nrec.p AS part,
           CAST(nrec.n_recs AS BIGINT) AS n_recs,
           CAST(ntst.n_test AS BIGINT) AS n_test,
           CAST(COALESCE(hits.h, 0) AS BIGINT) AS hits,
           (ROUND(COALESCE(hits.h, 0) * 1e0 / nrec.n_recs, 6) + 0.0)
             AS precision_at_k,
           (ROUND(COALESCE(hits.h, 0) * 1e0 / ntst.n_test, 6) + 0.0)
             AS recall
    FROM nrec
    JOIN ntst ON ntst.p = nrec.p
    LEFT JOIN hits ON hits.p = nrec.p
    """,
)
def q267_cf_holdout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline evaluation of the co-purchase recommender: train top-
    {CF_EVAL_K} neighbor lists on pre-{CF_EVAL_SPLIT_YEAR} orders
    (support-thresholded co-counts, the q216 model family), test
    against what was ACTUALLY co-purchased from
    {CF_EVAL_SPLIT_YEAR} on — per-part precision@k and recall, the
    holdout gate a mined model passes before it ships (q216 builds
    the model; this query decides whether to believe it).

    Parity: co-counts and hits are integers; the per-part rank uses
    the total order (count desc, id); two divisions at 6 dp.

    Scale shape: both splits reuse the capped basket explode (caps
    observable via MINING_OBSERVATIONS); the top-k window partitions
    by part over its support-thresholded candidates; hit counting is
    one equi-join of bounded rec lists against the distinct test
    pairs.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr")
    )
    obs = Observation()
    MINING_OBSERVATIONS["q267_cf_holdout_eval"] = obs
    baskets = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "yr")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .observe(
            obs,
            F.count(F.lit(1)).alias("baskets"),
            F.sum((F.size("parts") > TRI_MAX_BASKET).cast("long")).alias(
                "capped_baskets"
            ),
            F.max(F.size("parts")).alias("max_basket_size"),
        )
    )
    b = baskets.select(
        "l_orderkey",
        "yr",
        F.explode(F.slice("parts", 1, TRI_MAX_BASKET)).alias("pk"),
    )
    # the year-tagged pair explode feeds BOTH splits — checkpoint it
    # once (q250's year-tagged-edge discipline) so train and test don't
    # each re-run the basket build + self-join
    pairs = local_checkpoint(
        b.select("l_orderkey", "yr", F.col("pk").alias("a"))
        .join(
            b.select("l_orderkey", F.col("pk").alias("bb")), "l_orderkey"
        )
        .filter(F.col("a") < F.col("bb"))
        .select("yr", "a", "bb"),
        "q267 year-tagged pairs",
    )
    tre = (
        pairs.filter(F.col("yr") < CF_EVAL_SPLIT_YEAR)
        .groupBy("a", "bb")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= TRI_MIN_SUPPORT)
    )
    tse = (
        pairs.filter(F.col("yr") >= CF_EVAL_SPLIT_YEAR)
        .select("a", "bb")
        .distinct()
    )
    trs = tre.select(F.col("a").alias("p"), F.col("bb").alias("nb"), "cnt").unionAll(
        tre.select(F.col("bb").alias("p"), F.col("a").alias("nb"), "cnt")
    )
    tss = local_checkpoint(
        tse.select(F.col("a").alias("p"), F.col("bb").alias("nb")).unionAll(
            tse.select(F.col("bb").alias("p"), F.col("a").alias("nb"))
        ),
        "q267 test pairs",
    )
    wk = W.partitionBy("p").orderBy(F.col("cnt").desc(), "nb")
    recs = local_checkpoint(
        trs.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= CF_EVAL_K)
        .select("p", "nb"),
        "q267 rec lists",
    )
    nrec = recs.groupBy("p").agg(F.count("*").alias("n_recs"))
    ntst = tss.groupBy("p").agg(F.count("*").alias("n_test"))
    hits = recs.join(tss, ["p", "nb"]).groupBy("p").agg(
        F.count("*").alias("h")
    )
    return (
        nrec.join(ntst, "p")
        .join(hits, "p", "left")
        .select(
            F.col("p").alias("part"),
            F.col("n_recs").cast("long").alias("n_recs"),
            F.col("n_test").cast("long").alias("n_test"),
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hits"),
            dec(
                F.coalesce(F.col("h"), F.lit(0)) * F.expr("1e0") / F.col("n_recs"),
                6,
            ).alias("precision_at_k"),
            dec(
                F.coalesce(F.col("h"), F.lit(0)) * F.expr("1e0") / F.col("n_test"),
                6,
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# q268 — percent_rank / cume_dist price bands (§2.7 window-rank surface)
# ---------------------------------------------------------------------------

PRICE_BAND_CENTS = 10_000  # $100-wide bands


@query(
    "q268_percent_rank_bands",
    oracle=f"""
    WITH b AS (
      SELECT l_returnflag AS flag,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               // {PRICE_BAND_CENTS} AS band,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2)
    SELECT flag, CAST(band AS BIGINT) AS band, CAST(n AS BIGINT) AS n,
           (ROUND(percent_rank() OVER (PARTITION BY flag ORDER BY band),
                  6) + 0.0) AS pr,
           (ROUND(cume_dist() OVER (PARTITION BY flag ORDER BY band),
                  6) + 0.0) AS cd
    FROM b
    """,
)
def q268_percent_rank_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist over $100 price bands per return
    flag — the remaining §2.7 window-rank surface (q88 covers NTILE,
    q35 dense_rank/lead).  Banding first means the window runs over
    the BOUNDED (flag, band) collapse: distinct keys, so no peers and
    the ROWS/RANGE frame distinction is moot (the q156 collapse rule),
    and the rank fractions are exact rationals over integer positions.

    Parity: integer banding (floor-div of cents — never F.round, the
    q195 lesson); both rank functions are position ratios, 6 dp.

    Scale shape: one hash agg collapses the scan to ≤ |flags|×|bands|
    cells; the windows sort only that bounded frame.
    """
    li = table(spark, sf_dir, "lineitem")
    b = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.expr(
            f"CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
            f" div {PRICE_BAND_CENTS}"
        ).alias("band"),
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("flag").orderBy("band")
    return b.select(
        "flag",
        F.col("band").cast("long").alias("band"),
        F.col("n").cast("long").alias("n"),
        dec(F.percent_rank().over(w), 6).alias("pr"),
        dec(F.cume_dist().over(w), 6).alias("cd"),
    )


# ---------------------------------------------------------------------------
# q269 — order-total reconciliation audit
# ---------------------------------------------------------------------------


@query(
    "q269_order_reconciliation",
    oracle="""
    WITH d AS (
      SELECT o.o_orderkey,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS head_cents,
             SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                            * (1 + l.l_tax) * 100 + 0.5) AS BIGINT))
               AS line_cents
      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2),
    lab AS (
      SELECT CASE
               WHEN line_cents IS NULL THEN 'no_lines'
               WHEN head_cents = line_cents THEN 'exact'
               ELSE CASE WHEN head_cents > line_cents THEN 'over_' ELSE 'under_' END
                    || CAST(LEN(CAST(ABS(head_cents - line_cents) AS VARCHAR))
                            AS VARCHAR) || 'digits'
             END AS bucket,
             COALESCE(ABS(head_cents - line_cents), 0) AS adiff
      FROM d)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(adiff) AS BIGINT) AS total_abs_diff_cents
    FROM lab GROUP BY 1
    """,
)
def q269_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation: o_totalprice against the sum
    of its lines' discounted, taxed prices, bucketed by direction and
    DECIMAL MAGNITUDE of the discrepancy (digits of the cent diff —
    an integer magnitude class, no log10 at the parity boundary) —
    the first financial-audit query run against any ingested ledger
    (q170 reconciles totals; this attributes the residual per order).

    Parity: per-line cents round ONCE per line then sum (integer);
    magnitude = string length of the absolute diff.

    Scale shape: one fact agg keyed on orderkey (map-combined), a
    broadcast-eligible join back to orders, a bounded bucket agg.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "head_cents"
        ),
    )
    lc = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(FLOOR(l_extendedprice * (1 - l_discount)"
                    " * (1 + l_tax) * 100 + 0.5) AS BIGINT)"
                )
            ).alias("line_cents")
        )
    )
    d = o.join(lc, o.o_orderkey == lc.l_orderkey, "left")
    diff = F.col("head_cents") - F.col("line_cents")
    bucket = (
        F.when(F.col("line_cents").isNull(), F.lit("no_lines"))
        .when(diff == 0, F.lit("exact"))
        .otherwise(
            F.concat(
                F.when(diff > 0, F.lit("over_")).otherwise(F.lit("under_")),
                F.length(F.abs(diff).cast("string")).cast("string"),
                F.lit("digits"),
            )
        )
    )
    return d.select(
        bucket.alias("bucket"),
        F.coalesce(F.abs(diff), F.lit(0)).alias("adiff"),
    ).groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("adiff").cast("long").alias("total_abs_diff_cents"),
    )


# ---------------------------------------------------------------------------
# q270 — repeat-purchase interval distribution per market segment
# ---------------------------------------------------------------------------


@query(
    "q270_repeat_purchase_interval",
    oracle="""
    WITH o AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey,
             CAST(o.o_orderdate AS DATE) AS od
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    g AS (
      SELECT seg,
             date_diff('day',
                       lag(od) OVER (PARTITION BY o_custkey
                                     ORDER BY od, seg),
                       od) AS gap
      FROM o),
    gv AS (SELECT seg, gap, COUNT(*) AS cnt FROM g
           WHERE gap IS NOT NULL GROUP BY 1, 2),
    kt AS (SELECT seg, SUM(cnt) AS n,
                  (SUM(cnt) + 1) // 2 AS k50,
                  (9 * SUM(cnt) + 9) // 10 AS k90
           FROM gv GROUP BY 1),
    cum AS (SELECT seg, gap,
                   SUM(cnt) OVER (PARTITION BY seg ORDER BY gap
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM gv)
    SELECT kt.seg AS segment,
           CAST(kt.n AS BIGINT) AS n_gaps,
           CAST(MIN(CASE WHEN cum.cum >= kt.k50 THEN cum.gap END) AS BIGINT)
             AS median_gap_days,
           CAST(MIN(CASE WHEN cum.cum >= kt.k90 THEN cum.gap END) AS BIGINT)
             AS p90_gap_days
    FROM kt JOIN cum ON cum.seg = kt.seg
    GROUP BY 1, 2
    """,
)
def q270_repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence per market segment: the (lower) median
    and p90 of days between a customer's consecutive orders — the
    inter-purchase-time distribution behind churn thresholds (q249's
    "idle" cutoff) and session gaps (q251's sweep), computed as EXACT
    order statistics, never an interpolating percentile.

    Parity: calendar-day gaps are integers (date_diff('day') on DATEs
    == Spark datediff); the k-th statistics read off a cumulative
    window over the bounded (segment, gap) collapse — the q227/q264
    rank pattern; ordering ties inside a customer's same-day orders
    are broken by the stable (od, seg) sort both engines share.

    Scale shape: the lag window partitions per customer (its frame is
    that customer's orders); gaps collapse to (segment, distinct gap)
    before the rank windows, bounded by the calendar span.
    """
    o = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            "o_custkey",
            F.to_date("o_orderdate").alias("od"),
        )
    )
    lagw = W.partitionBy("o_custkey").orderBy("od", "seg")
    g = o.select(
        "seg", F.datediff(F.col("od"), F.lag("od").over(lagw)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    gv = g.groupBy("seg", "gap").agg(F.count("*").alias("cnt"))
    kt = gv.groupBy("seg").agg(
        F.sum("cnt").alias("n"),
        F.expr("CAST((SUM(cnt) + 1) div 2 AS BIGINT)").alias("k50"),
        F.expr("CAST((9 * SUM(cnt) + 9) div 10 AS BIGINT)").alias("k90"),
    )
    cum_w = (
        W.partitionBy("seg").orderBy("gap").rowsBetween(W.unboundedPreceding, 0)
    )
    cum = gv.withColumn("cum", F.sum("cnt").over(cum_w))
    return (
        kt.join(cum, "seg")
        .groupBy(F.col("seg").alias("segment"), F.col("n").cast("long").alias("n_gaps"))
        .agg(
            F.min(F.when(F.col("cum") >= F.col("k50"), F.col("gap")))
            .cast("long")
            .alias("median_gap_days"),
            F.min(F.when(F.col("cum") >= F.col("k90"), F.col("gap")))
            .cast("long")
            .alias("p90_gap_days"),
        )
    )


# ---------------------------------------------------------------------------
# q271 — exact-dedup savings report per source
# ---------------------------------------------------------------------------


@query(
    "q271_dedup_savings",
    oracle="""
    WITH keep AS (
      SELECT MIN(doc_id) AS keep_doc_id FROM documents GROUP BY text),
    d AS (SELECT doc_id, source,
                 LEN(string_split(text, ' ')) AS toks
          FROM documents)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(k.keep_doc_id) AS BIGINT) AS n_kept,
           CAST(SUM(d.toks) AS BIGINT) AS tokens,
           CAST(SUM(CASE WHEN k.keep_doc_id IS NULL THEN 0 ELSE d.toks END)
                AS BIGINT) AS tokens_kept,
           (ROUND(1e0 - SUM(CASE WHEN k.keep_doc_id IS NULL THEN 0
                                 ELSE d.toks END) * 1e0
                        / SUM(d.toks), 6) + 0.0) AS token_savings
    FROM d LEFT JOIN keep k ON k.keep_doc_id = d.doc_id
    GROUP BY 1
    """,
)
def q271_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup impact report: per source, how many documents AND
    whitespace tokens survive q40's digest dedup — the savings
    statement a curation team attaches to every dedup run (tokens, not
    docs, are what the training budget buys; a source can lose 2% of
    docs and 30% of tokens).  Composes the REGISTERED q40 operator so
    the keep-set can never drift from the dedup contract (the q99/q232
    composition rule).

    Parity: token counts are split-array lengths (integers); one
    savings ratio at 6 dp.  q40 keeps MIN(doc_id) per digest; the
    oracle groups by raw text (identical absent sha256 collisions —
    q40's own documented equivalence).

    Scale shape: q40's digest-keyed shuffle + one left join back on
    doc_id + a |sources|-cell agg; token counting is map-side.
    """
    from datapipeline_dags_spark.plans.llm_ops import q40_dedup_exact

    keep = q40_dedup_exact(spark, sf_dir).select("keep_doc_id")
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("toks")
    )
    j = d.join(keep, d.doc_id == keep.keep_doc_id, "left")
    kept_toks = F.sum(
        F.when(F.col("keep_doc_id").isNull(), 0).otherwise(F.col("toks"))
    )
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count("keep_doc_id").cast("long").alias("n_kept"),
        F.sum("toks").cast("long").alias("tokens"),
        kept_toks.cast("long").alias("tokens_kept"),
        dec(
            F.expr("1e0") - kept_toks * F.expr("1e0") / F.sum("toks"), 6
        ).alias("token_savings"),
    )


# ---------------------------------------------------------------------------
# q272 — runtime-filter (semi-join reduction) audit
# ---------------------------------------------------------------------------

RF_PRIORITY = "1-URGENT"
RF_YEAR = 1998


@query(
    "q272_runtime_filter_audit",
    oracle=f"""
    WITH sel AS (
      SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '{RF_PRIORITY}'
        AND EXTRACT(year FROM o_orderdate) = {RF_YEAR}),
    t AS (SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
                 (SELECT COUNT(*) FROM sel) AS n_sel,
                 (SELECT COUNT(*) FROM lineitem) AS n_lines,
                 (SELECT COUNT(*) FROM lineitem l
                   WHERE EXISTS (SELECT 1 FROM sel
                                 WHERE sel.o_orderkey = l.l_orderkey))
                   AS n_surviving)
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n_sel AS BIGINT) AS n_selected_orders,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_surviving AS BIGINT) AS n_surviving_lines,
           (ROUND(n_sel * 1e0 / n_orders, 6) + 0.0) AS order_selectivity,
           (ROUND(1e0 - n_surviving * 1e0 / n_lines, 6) + 0.0)
             AS line_reduction
    FROM t
    """,
)
def q272_runtime_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter benefit audit: how much of the fact scan a
    dimension-side predicate ('{RF_PRIORITY}' orders of {RF_YEAR})
    would eliminate if pushed across the join as a runtime filter
    (DPP / bloom / semi-join reduction) — the measurement that decides
    whether enabling spark.sql.optimizer.runtimeFilter.* pays on a
    workload; completes the q233/q240/q241/q248 planner-statistics
    family with the JOIN-side estimate.

    Parity: four exact counts and two divisions.

    Scale shape: the surviving-line count IS the semi join the audit
    models (LeftSemi on orderkey); the other three counts are
    map-combined scans; final row is a 1-row assembly.
    """
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    sel = orders.filter(
        (F.col("o_orderpriority") == RF_PRIORITY)
        & (F.year("o_orderdate") == RF_YEAR)
    ).select("o_orderkey")
    n_orders = orders.agg(F.count("*").alias("n_orders"))
    n_sel = sel.agg(F.count("*").alias("n_sel"))
    n_lines = li.agg(F.count("*").alias("n_lines"))
    n_surv = (
        li.join(sel, li.l_orderkey == sel.o_orderkey, "left_semi")
        .agg(F.count("*").alias("n_surviving"))
    )
    return (
        n_orders.crossJoin(F.broadcast(n_sel))
        .crossJoin(F.broadcast(n_lines))
        .crossJoin(F.broadcast(n_surv))
        .select(
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("n_sel").cast("long").alias("n_selected_orders"),
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_surviving").cast("long").alias("n_surviving_lines"),
            dec(F.col("n_sel") * F.expr("1e0") / F.col("n_orders"), 6).alias(
                "order_selectivity"
            ),
            dec(
                F.expr("1e0")
                - F.col("n_surviving") * F.expr("1e0") / F.col("n_lines"),
                6,
            ).alias("line_reduction"),
        )
    )


# ---------------------------------------------------------------------------
# q273 — capture-recapture corpus-overlap estimate
# ---------------------------------------------------------------------------

CR_SOURCE_A = "src0"
CR_SOURCE_B = "src1"


@query(
    "q273_capture_recapture",
    oracle=f"""
    WITH docs AS (SELECT source, {_SHINGLES_SQL} AS sh FROM documents
                  WHERE source IN ('{CR_SOURCE_A}', '{CR_SOURCE_B}')),
    s AS (SELECT DISTINCT source, unnest(sh) AS s FROM docs),
    a AS (SELECT s FROM s WHERE source = '{CR_SOURCE_A}'),
    b AS (SELECT s FROM s WHERE source = '{CR_SOURCE_B}'),
    t AS (SELECT (SELECT COUNT(*) FROM a) AS n1,
                 (SELECT COUNT(*) FROM b) AS n2,
                 (SELECT COUNT(*) FROM a JOIN b ON a.s = b.s) AS m,
                 (SELECT COUNT(DISTINCT s) FROM s) AS actual_union)
    SELECT CAST(n1 AS BIGINT) AS n_a,
           CAST(n2 AS BIGINT) AS n_b,
           CAST(m AS BIGINT) AS n_overlap,
           CAST(actual_union AS BIGINT) AS actual_union,
           CAST(CASE WHEN m = 0 THEN NULL
                     ELSE n1 * n2 // m END AS BIGINT) AS lincoln_petersen
    FROM t
    """,
)
def q273_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Lincoln–Petersen) estimate of the underlying
    shingle population from two sources' samples: N̂ = n₁·n₂/m where m
    is the observed overlap — the mark-recapture estimator data teams
    use to size "how much unique content is left" from two crawls of
    the same domain (q229 estimates richness from ONE sample's
    frequency profile; this triangulates from TWO samples' overlap).

    Parity: distinct counts and an integer floor-division (NULL when
    disjoint); the actual union is reported next to the estimate.

    Scale shape: one distinct (source, shingle) collapse; the overlap
    is a shingle-keyed self-join of the two pruned sides; all counts
    map-combine.
    """
    from pyspark.storagelevel import StorageLevel

    docs = _fanout(
        spark,
        table(spark, sf_dir, "documents").filter(
            F.col("source").isin(CR_SOURCE_A, CR_SOURCE_B)
        ),
    ).select("source", _shingles(F.col("text")).alias("sh"))
    # five branches read the distinct collapse (both counts, both join
    # sides, the union) — persist so the shingle pass runs once, not
    # per branch (the harness clearCache releases it)
    s = (
        docs.select("source", F.explode("sh").alias("s"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = s.filter(F.col("source") == CR_SOURCE_A).select("s")
    b = s.filter(F.col("source") == CR_SOURCE_B).select("s")
    n1 = a.agg(F.count("*").alias("n1"))
    n2 = b.agg(F.count("*").alias("n2"))
    m = a.join(b, "s").agg(F.count("*").alias("m"))
    uni = s.select("s").distinct().agg(F.count("*").alias("actual_union"))
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(uni))
        .select(
            F.col("n1").cast("long").alias("n_a"),
            F.col("n2").cast("long").alias("n_b"),
            F.col("m").cast("long").alias("n_overlap"),
            F.col("actual_union").cast("long").alias("actual_union"),
            F.when(
                F.col("m") == 0, F.lit(None).cast("long")
            )
            .otherwise(F.expr("CAST(n1 * n2 div m AS BIGINT)"))
            .alias("lincoln_petersen"),
        )
    )


# ---------------------------------------------------------------------------
# q274 — Tukey IQR outlier fences per event type
# ---------------------------------------------------------------------------


@query(
    "q274_iqr_outlier_fences",
    oracle="""
    WITH e AS (SELECT event_type,
                      CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
               FROM events),
    gv AS (SELECT event_type, c, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
    kt AS (SELECT event_type, SUM(cnt) AS n,
                  (SUM(cnt) + 3) // 4 AS k1,
                  (3 * SUM(cnt) + 3) // 4 AS k3
           FROM gv GROUP BY 1),
    cum AS (SELECT event_type, c,
                   SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM gv),
    q AS (SELECT kt.event_type, kt.n,
                 MIN(CASE WHEN cum.cum >= kt.k1 THEN cum.c END) AS q1,
                 MIN(CASE WHEN cum.cum >= kt.k3 THEN cum.c END) AS q3
          FROM kt JOIN cum ON cum.event_type = kt.event_type
          GROUP BY 1, 2)
    SELECT e.event_type,
           CAST(ANY_VALUE(q.n) AS BIGINT) AS n,
           CAST(ANY_VALUE(q.q1) AS BIGINT) AS q1_cents,
           CAST(ANY_VALUE(q.q3) AS BIGINT) AS q3_cents,
           CAST(SUM(CASE WHEN 2 * e.c < 2 * q.q1 - 3 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
           CAST(SUM(CASE WHEN 2 * e.c > 2 * q.q3 + 3 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
    FROM e JOIN q ON q.event_type = e.event_type
    GROUP BY 1
    """,
)
def q274_iqr_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey fences per event type: values beyond Q1−1.5·IQR /
    Q3+1.5·IQR, with the quartiles as EXACT k-th order statistics
    (k=⌈n/4⌉, ⌈3n/4⌉) over the (type, cents) collapse — the IQR
    sibling of q202's MAD outliers (IQR is what box-plots and most
    alerting defaults use; MAD is the heavier-tailed robust scale).

    Parity: cents quantization, integer rank cuts, and the 1.5·IQR
    fences as the ×2-scaled integer comparisons 2c < 2q1−3·IQR — no
    float touches the boundary.

    Scale shape: the q264/q270 collapse-then-rank pattern (bounded by
    the value domain); the fence pass re-joins the 5-row quartile
    table map-side.
    """
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("c"),
    )
    gv = e.groupBy("event_type", "c").agg(F.count("*").alias("cnt"))
    kt = gv.groupBy("event_type").agg(
        F.sum("cnt").alias("n"),
        F.expr("CAST((SUM(cnt) + 3) div 4 AS BIGINT)").alias("k1"),
        F.expr("CAST((3 * SUM(cnt) + 3) div 4 AS BIGINT)").alias("k3"),
    )
    cum_w = (
        W.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = gv.withColumn("cum", F.sum("cnt").over(cum_w))
    q = (
        kt.join(cum, "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.min(F.when(F.col("cum") >= F.col("k1"), F.col("c"))).alias("q1"),
            F.min(F.when(F.col("cum") >= F.col("k3"), F.col("c"))).alias("q3"),
        )
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        e.join(q, "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").cast("long").alias("n"),
            F.first("q1").cast("long").alias("q1_cents"),
            F.first("q3").cast("long").alias("q3_cents"),
            F.sum(
                (2 * F.col("c") < 2 * F.col("q1") - 3 * iqr).cast("long")
            )
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(
                (2 * F.col("c") > 2 * F.col("q3") + 3 * iqr).cast("long")
            )
            .cast("long")
            .alias("n_high_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# q277 — Hill tail-index estimate of the document-length distribution
# ---------------------------------------------------------------------------

HILL_K = 100


@query(
    "q277_hill_tail_index",
    oracle=f"""
    WITH topk AS (
      SELECT n_chars, doc_id,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
      QUALIFY rn <= {HILL_K}),
    xk AS (SELECT n_chars AS x_k FROM topk WHERE rn = {HILL_K}),
    sums AS (
      SELECT SUM(ln(topk.n_chars * 1e0 / xk.x_k))
               OVER (ORDER BY topk.rn ROWS UNBOUNDED PRECEDING) AS s,
             topk.rn
      FROM topk CROSS JOIN xk
      WHERE topk.rn < {HILL_K}),
    tot AS (SELECT s FROM sums WHERE rn = {HILL_K - 1})
    SELECT CAST({HILL_K} AS BIGINT) AS k,
           CAST(xk.x_k AS BIGINT) AS x_k,
           (ROUND(({HILL_K} - 1) * 1e0 / tot.s, 4) + 0.0) AS hill_alpha
    FROM xk CROSS JOIN tot
    """,
)
def q277_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the document-length power-law tail index:
    α̂ = (k−1) / Σᵢ ln(xᵢ/x_k) over the k={HILL_K} largest lengths —
    the heavy-tail diagnostic that tells a batch sizer whether extreme
    documents are exponential outliers or a genuine Pareto tail
    (q128's Zipf audit fits the vocabulary; this fits the length
    distribution feeding q71's sequence packing).

    Parity: the top-k multiset is fixed by the total order
    (n_chars desc, doc_id); the ln-ratio sum folds in EXPLICIT rank
    order in both engines (Spark: F.aggregate over the rank-sorted
    collected array; DuckDB: cumulative window over rn — the q175
    ordered-fold rule), so any per-ln ulp difference is absorbed by
    the 4-dp round, never reordered.

    Scale shape: TakeOrderedAndProject pulls k rows; everything after
    is driver-scale arithmetic expressed on a 1-row frame.
    """
    topk = (
        table(spark, sf_dir, "documents")
        .select("n_chars", "doc_id")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(HILL_K)
    )
    wrn = W.orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = topk.withColumn("rn", F.row_number().over(wrn))
    agg = ranked.agg(
        F.min(F.when(F.col("rn") == HILL_K, F.col("n_chars"))).alias("x_k"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("rn") < HILL_K,
                    F.struct(F.col("rn"), F.col("n_chars").alias("x")),
                )
            )
        ).alias("xs"),
    )
    s = F.aggregate(
        F.col("xs"),
        F.lit(0.0),
        lambda acc, e: acc
        + F.log(e["x"] * F.expr("1e0") / F.col("x_k")),
    )
    return agg.select(
        F.lit(HILL_K).cast("long").alias("k"),
        F.col("x_k").cast("long").alias("x_k"),
        dec((HILL_K - 1) * F.expr("1e0") / s, 4).alias("hill_alpha"),
    )


# ---------------------------------------------------------------------------
# q278 — hashing-trick (feature hashing) collision audit
# ---------------------------------------------------------------------------

FEATURE_HASH_BITS = 12  # 4096 buckets


@query(
    "q278_feature_hash_audit",
    oracle=f"""
    WITH w AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
               FROM documents),
    h AS (SELECT w,
                 ('0x' || substr(md5(w), 1, 8))::BIGINT
                   % {1 << FEATURE_HASH_BITS} AS b
          FROM w),
    per AS (SELECT b, COUNT(*) AS load FROM h GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM w) AS BIGINT) AS n_features,
           CAST({1 << FEATURE_HASH_BITS} AS BIGINT) AS n_buckets,
           CAST((SELECT COUNT(*) FROM per) AS BIGINT) AS buckets_used,
           CAST((SELECT MAX(load) FROM per) AS BIGINT) AS max_load,
           CAST((SELECT SUM(load - 1) FROM per) AS BIGINT) AS n_collisions,
           (ROUND((SELECT SUM(load - 1) FROM per) * 1e0
                  / (SELECT COUNT(*) FROM w), 6) + 0.0) AS collision_rate
    """,
)
def q278_feature_hash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) audit: map the distinct token
    vocabulary into 2^{FEATURE_HASH_BITS} buckets with the md5 hash
    and report occupancy, max load, and the collision rate — the
    dimensionality-vs-collision tradeoff measured before a hashed
    bag-of-words model ships (the Weinberger hashing-trick sizing
    check; q117's count-min sketch is the counting sibling).

    Parity: the bucket is the q58 md5 integer (identical bytes both
    engines) masked to {FEATURE_HASH_BITS} bits; everything else is
    distinct counting and ONE 6-dp division.

    Scale shape: one distinct-token collapse (map-combined), one
    |buckets|-bounded agg, 1-row assembly.
    """
    w = (
        _fanout(spark, table(spark, sf_dir, "documents"))
        .select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
    )
    nb = 1 << FEATURE_HASH_BITS
    h = w.select(
        (F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % nb).alias(
            "b"
        )
    )
    per = h.groupBy("b").agg(F.count("*").alias("load"))
    nf = w.agg(F.count("*").alias("n_features"))
    stats = per.agg(
        F.count("*").alias("buckets_used"),
        F.max("load").alias("max_load"),
        F.sum(F.col("load") - 1).alias("n_collisions"),
    )
    return (
        nf.crossJoin(F.broadcast(stats))
        .select(
            F.col("n_features").cast("long").alias("n_features"),
            F.lit(nb).cast("long").alias("n_buckets"),
            F.col("buckets_used").cast("long").alias("buckets_used"),
            F.col("max_load").cast("long").alias("max_load"),
            F.col("n_collisions").cast("long").alias("n_collisions"),
            dec(
                F.col("n_collisions") * F.expr("1e0") / F.col("n_features"), 6
            ).alias("collision_rate"),
        )
    )
