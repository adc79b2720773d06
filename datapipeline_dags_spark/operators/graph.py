"""Distributed connected components over an edge DataFrame.

The primitive behind dedup cluster resolution (plans/llm_ops.py q69):
near-dup candidate pairs chain (A~B on one blocking key, B~C on
another), so canonical-doc assignment needs the transitive closure,
not per-block grouping.

Algorithm: iterative min-label propagation — each round every node
takes the minimum label among itself and its neighbors; fixpoint when
no label changes.  Per round: ONE hash join + ONE hash aggregate, both
partitioned on the node key, and ONE action — the convergence probe
rides the checkpoint materialization as an ``observe`` metric (each
node's previous label is unioned in alongside the candidates, so
"changed" is a conditional sum computed as rows flow; no second
join-and-count job).  Rounds = graph diameter; dup-cluster diameters are tiny
(blocking keys connect most members straight to the cluster minimum).
For adversarial chain graphs swap in two-phase large-star/small-star
contraction (O(log^2 n) rounds) — same per-round plan shape.

Iterative loops MUST truncate lineage each round or the logical plan
(and task-closure size) grows with the iteration count:
``localCheckpoint`` materializes each round's labels on the executors
and cuts the plan there.  On a cluster with lossy executors, use
reliable ``checkpoint(dir)`` at the same call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from datapipeline_dags_spark.checkpoint import local_checkpoint

DEFAULT_MAX_ITERS = 20

#: Collect-and-solve gate (the q183/q221/q222 discipline): when the
#: edge list fits under this many rows, the transitive closure runs
#: driver-side as a union-find over the collected edges — identical
#: min-label components (pure integer set semantics; pinned by the
#: route-equality test and the existing union-find property test) —
#: replacing diameter-many (join + agg + checkpoint + probe) jobs with
#: ONE collect.  Above the gate the iterative propagation runs
#: unchanged; SPARK_GRAFT_COLLECT_ROUTE forces either side.
CC_COLLECT_EDGES = 10_000_000

#: rounds used by the most recent connected_components call — observable
#: scale signal: for blocking-key dup graphs this should stay flat as
#: the corpus grows (diameter is a property of cluster shape, not corpus
#: size); a growing round count means adversarial chain structure and
#: time to switch to large-star/small-star.
LAST_ROUNDS: int = 0


def _cc_collected_solve(spark, e: DataFrame) -> DataFrame:
    """Driver-side solve over the collected (src, dst) edges:
    component = min node id of each connected set — exactly the
    min-label fixpoint the distributed rounds converge to (integer set
    semantics, no floats anywhere).

    Vectorized min-label propagation with pointer jumping: per round
    one ``np.minimum.at`` scatter over the edge list plus label-chain
    halving to idempotence — O(E) numpy work per round, O(log n)
    rounds — replacing the per-edge Python union loop that cost tens
    of seconds of driver CPU near the 10M-edge gate boundary.  Labels
    are indexes into the ascending-sorted node array and only ever
    decrease toward the component minimum, so ``nodes[label]`` is the
    min node id once every edge agrees."""
    import numpy as np
    import pandas as pd

    pdf = e.toPandas()
    schema = "node long, component long"
    # mirror the distributed route's null-join semantics: an edge with
    # a null endpoint never matches the equality join, so it
    # contributes neither a node nor a connection
    pdf = pdf.dropna(subset=["src", "dst"])
    if not len(pdf):
        return spark.createDataFrame([], schema=schema)
    s = pdf["src"].to_numpy(np.int64)
    d = pdf["dst"].to_numpy(np.int64)
    nodes, idx = np.unique(np.concatenate([s, d]), return_inverse=True)
    si, di = idx[: len(s)], idx[len(s) :]
    u = np.concatenate([si, di])
    v = np.concatenate([di, si])
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        # every endpoint takes the min of its own and its neighbor's
        # label (unbuffered scatter-min handles duplicate endpoints)
        np.minimum.at(lab, u, lab[v])
        # pointer-jump the label forest to idempotence so chains
        # collapse in O(log) rounds instead of O(diameter)
        while True:
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        if not (lab[u] != lab[v]).any():
            break
    out = pd.DataFrame({"node": nodes, "component": nodes[lab]})
    return spark.createDataFrame(out, schema=schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = DEFAULT_MAX_ITERS,
    pointer_jump: bool = False,
) -> DataFrame:
    """Resolve connected components of an undirected graph.

    ``edges`` holds one row per edge (either direction; duplicates are
    fine).  Returns (node, component) where ``component`` is the
    minimum node id reachable from ``node``.  Isolated nodes never
    appear in ``edges`` and so are absent — callers union them back as
    their own singletons if needed.

    ``edges`` should be MATERIALIZED (checkpointed/persisted) by the
    caller: the collect-and-solve gate counts it eagerly at plan-build
    time (collect_gate's contract), so a non-materialized derivation
    would be computed twice — once for the probe count and once for
    the route taken.  Every in-repo caller passes a checkpointed pair
    frame.

    ``pointer_jump=True`` adds a label-of-label hop each round (one
    extra node-keyed self-join): labels shortcut through the label
    forest, so convergence is O(log diameter) rounds instead of
    O(diameter).  Use it for graphs that are chain-like BY CONSTRUCTION
    — grid-cell adjacency (q209), long path components — where plain
    min-label propagation needs diameter rounds (the failure mode the
    module docstring warns about, observed on q209's dense-cell blob at
    sf0.1).  Blocking-key dup graphs (q69) keep the cheaper plain
    rounds: their diameters are tiny and flat (see LAST_ROUNDS).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    from datapipeline_dags_spark.plans.route import collect_gate

    global LAST_ROUNDS
    if collect_gate(e, CC_COLLECT_EDGES, "connected_components"):
        LAST_ROUNDS = 1
        return _cc_collected_solve(edges.sparkSession, e)
    sym = e.union(e.select(F.col("dst"), F.col("src"))).toDF("src", "dst")
    cur = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )
    cur = local_checkpoint(cur, "cc_init")
    for i in range(max_iters):
        nbr = sym.join(cur.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"),
            "component",
            F.lit(None).cast("long").alias("prev"),
        )
        cand = cur.select(
            "node", "component", F.col("component").cast("long").alias("prev")
        )
        merged = (
            cand.unionByName(nbr)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                # every node carries exactly one non-null prev (its own
                # cur row); max() recovers it without a second join
                F.max("prev").alias("prev"),
            )
        )
        if pointer_jump:
            # label-of-label hop: component ids are node ids of the same
            # component, so label(component) is too — taking the min
            # keeps the invariant while halving chain distances.
            lab = merged.select(
                F.col("node").alias("jnode"), F.col("component").alias("jcomp")
            )
            merged = merged.join(
                lab, merged["component"] == lab["jnode"], "left"
            ).select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("jcomp"), F.col("component")),
                ).alias("component"),
                "prev",
            )
        obs = Observation()
        new = merged.observe(
            obs,
            F.sum((F.col("component") != F.col("prev")).cast("long")).alias(
                "changed"
            ),
        ).select("node", "component")
        new = local_checkpoint(new, f"cc_round_{i + 1}")
        changed = int(obs.get["changed"] or 0)
        cur = new
        if changed == 0:
            LAST_ROUNDS = i + 1
            return cur
    raise RuntimeError(f"connected components: no fixpoint in {max_iters} rounds")
