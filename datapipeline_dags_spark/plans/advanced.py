"""Advanced operators: as-of join, deterministic sampling, percentiles.

Each fills a gap a reference user (or a 100 TB training-data pipeline)
hits quickly: point-in-time enrichment, reproducible corpus sampling,
and distribution statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.plans.helpers import dec
from datapipeline_dags_spark.plans.registry import query


@query(
    "q57_asof_join",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id AS user_id,
           c.ts AS click_ts, p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q57_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each click matched to the user's most recent prior (or
    simultaneous) purchase.

    Spark has no native ASOF operator; the scalable pattern is
    union + one window pass: tag both streams, sort within user by
    (ts, tag) with purchases first at ties, and carry the last non-null
    purchase ts forward.  ONE shuffle on user_id, no range-join
    explosion — this is the plan you want at 100 TB (a naive range join
    is O(clicks × purchases) per user).  Oracle: DuckDB's native ASOF.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("ts").alias("p_ts"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("click_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(1).alias("tag"),
        F.col("event_id").alias("click_id"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        purchases.unionByName(clicks)
        .withColumn("purchase_ts", F.last("p_ts", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select("click_id", "user_id", F.col("ts").alias("click_ts"), "purchase_ts")
    )


ATTR_WINDOW_US = 3_600_000_000  # 1-hour attribution window, microseconds


@query(
    "q48_range_join_attribution",
    oracle=f"""
    WITH p AS (SELECT event_id AS purchase_id, epoch_us(ts) AS p_us
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, epoch_us(ts) AS c_us
          FROM events WHERE event_type = 'click')
    SELECT p.purchase_id, CAST(COUNT(c.click_id) AS BIGINT) AS n_clicks
    FROM p LEFT JOIN c
      ON c.c_us >= p.p_us AND c.c_us < p.p_us + {ATTR_WINDOW_US}
    GROUP BY p.purchase_id
    """,
)
def q48_range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): clicks attributed to every purchase
    whose 1-hour window contains them, counted per purchase.

    Spark plans a bare interval predicate as a nested-loop cross join —
    O(P×C) and a 100 TB non-starter.  The scale pattern is GRID
    BUCKETING: quantize time into window-width cells, explode each
    interval to the cells it covers (≤2 here, since interval length =
    cell width), map each point to its single cell, then equi-join on
    the cell with the exact range predicate as a residual.  The join is
    hash-partitioned on the cell key — work ∝ matches, AQE splits hot
    cells.  Zero-click purchases survive via the left join (their
    exploded cell rows count no clicks); each matching click lands in
    exactly one of the purchase's cells, so no dedup pass is needed.
    Oracle: DuckDB's native IEJoin evaluates the same predicate
    directly.
    """
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.unix_micros("ts").alias("p_us")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.unix_micros("ts").alias("c_us")
    )
    w = F.lit(ATTR_WINDOW_US)
    cells = F.sequence(
        F.expr(f"p_us div {ATTR_WINDOW_US}"),
        F.expr(f"(p_us + {ATTR_WINDOW_US} - 1) div {ATTR_WINDOW_US}"),
    )
    p_cells = p.select("purchase_id", "p_us", F.explode(cells).alias("cell"))
    c_cells = c.select("click_id", "c_us", F.expr(f"c_us div {ATTR_WINDOW_US}").alias("cell"))
    joined = p_cells.join(
        c_cells,
        (p_cells["cell"] == c_cells["cell"])
        & (F.col("c_us") >= F.col("p_us"))
        & (F.col("c_us") < F.col("p_us") + w),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("click_id").cast("long").alias("n_clicks")
    )


CHUNK_WORDS = 50
CHUNK_STEP = 40  # 10-word overlap between consecutive chunks


@query(
    "q60_chunk_documents",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    starts AS (
      SELECT doc_id, words, unnest(generate_series(1, len(words), {CHUNK_STEP})) AS s
      FROM w)
    SELECT doc_id,
           CAST((s - 1) / {CHUNK_STEP} AS BIGINT) AS chunk_idx,
           array_to_string(words[s:s+{CHUNK_WORDS - 1}], ' ') AS chunk_text,
           CAST(len(words[s:s+{CHUNK_WORDS - 1}]) AS BIGINT) AS n_words
    FROM starts
    """,
)
def q60_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (50-word chunks, 10-word overlap)
    — the standard pre-tokenization splitter for long documents in a
    training pipeline.  Pure JVM: stepped sequence of chunk starts →
    transform/slice → explode; map-only, output rows ∝ tokens/step
    regardless of document length (no quadratic blowup on long docs).
    A Python-UDTF variant of this operator demonstrates the §2.10
    table-function extension point (tests/test_chunking.py)."""
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(1), F.size(words), F.lit(CHUNK_STEP))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            ((s - 1) / CHUNK_STEP).cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(words, s, CHUNK_WORDS)).alias("chunk_text"),
            F.size(F.slice(words, s, CHUNK_WORDS)).cast("long").alias("n_words"),
        ),
    )
    return docs.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", F.col("c.chunk_idx"), F.col("c.chunk_text"), F.col("c.n_words")
    )


SAMPLE_MOD = 10  # keep 1/10th


@query(
    "q58_deterministic_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {SAMPLE_MOD} = 0
    """,
)
def q58_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 10% corpus sample via hash-bucketing on the key
    (md5 mod N) — the training-data way to carve stable train/eval
    splits: no RNG state, stable under re-runs, resharding, and engine
    changes, and pushes down as an ordinary filter.  (``TABLESAMPLE`` /
    ``df.sample`` are partition-order-dependent — not reproducible.)"""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % SAMPLE_MOD
    )
    return docs.filter(bucket == 0).select("doc_id", "lang", "n_chars")


STRATA_FRAC = 0.1


@query(
    "q61_stratified_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents)
    SELECT doc_id, lang FROM ranked
    WHERE rn <= CEIL(n_lang * {STRATA_FRAC})
    """,
)
def q61_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 10% sample: exactly ⌈n·frac⌉ docs per language, chosen
    by md5 rank — proportional representation of every stratum (q58's
    plain hash filter drifts on small strata), still fully
    deterministic and engine-independent.  One shuffle on the stratum
    key; rank + count share the window exchange."""
    docs = table(spark, sf_dir, "documents")
    order = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    counts = W.partitionBy("lang")
    return (
        docs.withColumn("rn", F.row_number().over(order))
        .withColumn("n_lang", F.count("*").over(counts))
        .filter(F.col("rn") <= F.ceil(F.col("n_lang") * STRATA_FRAC))
        .select("doc_id", "lang")
    )


@query(
    "q59_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           (ROUND(quantile_cont(l_extendedprice, 0.5), 4) + 0.0) AS p50,
           (ROUND(quantile_cont(l_extendedprice, 0.9), 4) + 0.0) AS p90,
           (ROUND(quantile_cont(l_extendedprice, 0.99), 4) + 0.0) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q59_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (token-length /
    price distribution analysis).  Exact percentile needs the sorted
    group in memory — fine for bounded group counts; the 100 TB
    unbounded-cardinality variant is approx_percentile (same call
    shape, mergeable sketch), with q36 demonstrating the bounded-error
    gating pattern."""
    li = table(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("p"))
        .select(
            "l_returnflag",
            dec(F.element_at("p", 1), 4).alias("p50"),
            dec(F.element_at("p", 2), 4).alias("p90"),
            dec(F.element_at("p", 3), 4).alias("p99"),
        )
    )


@query(
    "q68_approx_percentiles_gated",
    oracle="""
    SELECT l_returnflag,
           (ROUND(quantile_cont(l_extendedprice, 0.5), 4) + 0.0) AS p50_exact,
           (ROUND(quantile_cont(l_extendedprice, 0.9), 4) + 0.0) AS p90_exact,
           TRUE AS p50_within_5pct,
           TRUE AS p90_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q68_approx_percentiles_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (mergeable quantile sketch) next to the exact
    value, gated on its error bound — q36's HLL pattern for the quantile
    family.  The sketch value is engine-specific, so the checked
    contract is |approx − exact| ≤ 5% of exact (accuracy=10000 bounds
    rank error to n/10000, far inside 5% here; the ≤1-gap discrete-vs-
    interpolated difference is likewise negligible at the tolerance).
    At 100 TB the sketch is the variant you run: it merges map-side and
    never materializes a sorted group."""
    li = table(spark, sf_dir, "lineitem")
    exact = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)))
    approx = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
    )
    gate = lambda i: (  # noqa: E731
        F.abs(F.element_at("_a", i) - F.element_at("_e", i))
        <= 0.05 * F.element_at("_e", i)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(exact.alias("_e"), approx.alias("_a"))
        .select(
            "l_returnflag",
            dec(F.element_at("_e", 1), 4).alias("p50_exact"),
            dec(F.element_at("_e", 2), 4).alias("p90_exact"),
            gate(1).alias("p50_within_5pct"),
            gate(2).alias("p90_within_5pct"),
        )
    )
