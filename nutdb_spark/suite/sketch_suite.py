"""[EXT] Sketch suite — mergeable HLL distinct counts and count-min
heavy-hitter estimates with exact DuckDB replays (operators/sketch.py).

Why sketches are a first-class 100 TB operator: the exact distinct
count shuffles the VALUE domain (a terabyte-scale exchange when the
column is user ids), while the sketch reduces each partition to a
fixed-size state (2^p register rows / d·w counters) that merges
associatively — the cross-executor traffic is constant per group. The
entries here pin three claims the approx built-ins can't: the register
state is engine-neutral (hash-exact DuckDB twin), shard-sketch-merge
EQUALS direct-sketch bit for bit (the mergeability contract — what an
incremental/nightly ingest relies on), and the estimator's error on
the fixture is the textbook ~1.04/√m.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutdb_spark.operators.sketch import (
    cms_estimate,
    cms_table,
    hll_estimate,
    hll_merge,
    hll_registers,
    oracle_cms,
    oracle_hll_estimate,
    oracle_hll_registers,
)
from nutdb_spark.sources import load_table
from nutdb_spark.suite.registry import query

_P = 8  # 256 registers: ±6.5% sigma, and the fixture's per-group
# cardinality (~1600 distinct user-days per event type at sf0.01)
# sits safely ABOVE 2.5·m — the raw-estimator regime. Below that the
# textbook algorithm switches to linear counting, whose ln() is libm
# (not exactly rounded) and so deliberately out of oracle scope
# (operators/sketch.py docstring); n_zero is emitted so a consumer
# can apply it.

# "active user-days": the natural distinct-count target here — the
# value renders identically in both engines (decimal user_id + ISO
# date)
_UDAY_SQL = (
    "CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)"
)


def _uday() -> F.Column:
    return F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.to_date("ts").cast("string"),
    )


def _hll_oracle() -> str:
    regs = oracle_hll_registers(
        "events", ["event_type"], _UDAY_SQL, p=_P
    )
    est = oracle_hll_estimate(regs, ["event_type"], p=_P)
    return f"""
    WITH est AS ({est}),
    exact AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT {_UDAY_SQL}) AS BIGINT) AS exact_distinct
      FROM events GROUP BY event_type)
    SELECT event_type, n_zero, est, exact_distinct,
           (est - exact_distinct) / exact_distinct AS rel_err
    FROM est JOIN exact USING (event_type)
    ORDER BY event_type"""


@query("q_sketch_hll", _hll_oracle())
def q_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] HLL distinct active user-days per event type, raw
    estimator vs the exact count. The register build is one
    map-side-partial groupBy (≤256 rows per group cross the shuffle,
    whatever the row count); the exact twin is only affordable at
    fixture scale and exists to expose the error. All estimator
    arithmetic is integer + two exactly-rounded IEEE ops — the DuckDB
    twin is bit-identical, no tolerance band."""
    e = load_table(spark, sf_dir, "events")
    regs = hll_registers(e, ["event_type"], _uday(), p=_P)
    est = hll_estimate(regs, ["event_type"], p=_P)
    exact = e.groupBy("event_type").agg(
        F.count_distinct(_uday()).alias("exact_distinct")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_zero",
            "est",
            "exact_distinct",
            (
                (F.col("est") - F.col("exact_distinct"))
                / F.col("exact_distinct")
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def _hll_merge_oracle() -> str:
    shard_regs = oracle_hll_registers(
        f"(SELECT event_type, {_UDAY_SQL} AS uday, user_id % 4 AS shard "
        f"FROM events)",
        ["event_type", "shard"],
        "uday",
        p=_P,
    )
    merged = f"""
    SELECT event_type, idx, CAST(MAX(m) AS BIGINT) AS m
    FROM ({shard_regs}) GROUP BY event_type, idx"""
    direct = oracle_hll_registers("events", ["event_type"], _UDAY_SQL, p=_P)
    est_m = oracle_hll_estimate(merged, ["event_type"], p=_P)
    est_d = oracle_hll_estimate(direct, ["event_type"], p=_P)
    return f"""
    WITH m AS ({est_m}), d AS ({est_d})
    SELECT m.event_type, m.est AS est_merged, d.est AS est_direct,
           (m.est = d.est) AS merge_exact
    FROM m JOIN d USING (event_type)
    ORDER BY m.event_type"""


@query("q_sketch_hll_merge", _hll_merge_oracle())
def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The mergeability contract, PINNED: sketch four
    user-id shards independently (the nightly-ingest / per-executor
    shape), merge by register-wise max, and the estimate equals the
    direct whole-corpus sketch exactly — `merge_exact` is true on
    every row, here and in the DuckDB replay. This is the property
    that lets 100 TB distinct counts run as a tree of constant-size
    states instead of a value-domain shuffle."""
    e = load_table(spark, sf_dir, "events")
    sharded = e.withColumn("shard", F.pmod(F.col("user_id"), F.lit(4)))
    shard_regs = hll_registers(
        sharded, ["event_type", "shard"], _uday(), p=_P
    )
    merged = hll_merge(shard_regs.drop("shard"), ["event_type"])
    est_m = hll_estimate(merged, ["event_type"], p=_P).withColumnRenamed(
        "est", "est_merged"
    )
    direct = hll_registers(e, ["event_type"], _uday(), p=_P)
    est_d = hll_estimate(direct, ["event_type"], p=_P).withColumnRenamed(
        "est", "est_direct"
    )
    return (
        est_m.select("event_type", "est_merged")
        .join(est_d.select("event_type", "est_direct"), "event_type")
        .select(
            "event_type",
            "est_merged",
            "est_direct",
            (F.col("est_merged") == F.col("est_direct")).alias(
                "merge_exact"
            ),
        )
        .orderBy("event_type")
    )


_WORD_RE = "[a-z0-9]+"


def _cms_oracle() -> str:
    values = f"""
      SELECT unnest(regexp_extract_all(lower(text), '{_WORD_RE}')) AS v
      FROM documents"""
    keys = f"""
      SELECT v AS k, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM ({values}) GROUP BY v
      ORDER BY exact_cnt DESC, k LIMIT 20"""
    probed = oracle_cms(values, keys)
    return f"""
    WITH topw AS ({keys}), est AS ({probed})
    SELECT t.k AS word, t.exact_cnt, e.cms_est,
           e.cms_est - t.exact_cnt AS overcount,
           (e.cms_est >= t.exact_cnt) AS never_under
    FROM topw t JOIN est e ON t.k = e.k
    ORDER BY t.exact_cnt DESC, word"""


@query("q_sketch_cms_heavy", _cms_oracle())
def q_sketch_cms_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Count-min heavy hitters over the corpus word stream: a
    4×512-counter sketch (8 KiB of state however large the corpus),
    probed at the exact top-20 words. Pins the CMS one-sided-error
    contract (`never_under` true on every row) and shows the
    overcount magnitude. The sketch build is one explode + one
    map-side-partial groupBy; the probe broadcasts the 2k-row sketch
    — no corpus-sized shuffle anywhere."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0)
        ).alias("v")
    )
    cms = cms_table(words, F.col("v"))
    topw = (
        words.groupBy("v")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("v"))
        .limit(20)
        .withColumnRenamed("v", "k")
    )
    est = cms_estimate(cms, topw, F.col("k"))
    return est.select(
        F.col("k").alias("word"),
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        (F.col("cms_est") >= F.col("exact_cnt")).alias("never_under"),
    ).orderBy(F.col("exact_cnt").desc(), "word")


def _hll_incremental_oracle() -> str:
    # identical to the direct whole-corpus sketch: the persisted-state
    # merge is exact by the register-max algebra (q_sketch_hll_merge),
    # and the parquet round-trip must not perturb a single register
    regs = oracle_hll_registers("events", ["event_type"], _UDAY_SQL, p=_P)
    est = oracle_hll_estimate(regs, ["event_type"], p=_P)
    return f"SELECT * FROM ({est}) ORDER BY event_type"


@query("q_sketch_hll_incremental", _hll_incremental_oracle())
def q_sketch_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Nightly-ingest HLL: batch 1's register table persists to
    parquet (the sketch IS the stored index — ≤256 rows per group,
    however large the ingested batch); batch 2 sketches only its DELTA
    and merges register-max into the stored state. The entry's output
    is the estimate FROM THE PERSISTED MERGED STATE, and the oracle is
    the direct whole-corpus sketch — equality is the claim: ingest
    order, state persistence, and the parquet round-trip change
    nothing. This is the 100 TB operating mode (yesterday's sketch +
    today's delta; the raw corpus is never re-scanned)."""
    import os

    e = load_table(spark, sf_dir, "events")
    hi = e.agg(F.max("event_id")).first()[0]  # bounded collect: one row
    split = (hi + 1) // 2
    base = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        "spark-warehouse",
        "hll_index",
        os.path.basename(sf_dir.rstrip("/")) or "dir",
    )
    regs1 = hll_registers(
        e.filter(F.col("event_id") < split), ["event_type"], _uday(), p=_P
    )
    regs1.write.mode("overwrite").parquet(os.path.join(base, "ingest=1"))
    stored = spark.read.parquet(os.path.join(base, "ingest=1"))
    regs2 = hll_registers(
        e.filter(F.col("event_id") >= split), ["event_type"], _uday(), p=_P
    )
    merged = hll_merge(stored.unionByName(regs2), ["event_type"])
    merged.write.mode("overwrite").parquet(os.path.join(base, "ingest=2"))
    state = spark.read.parquet(os.path.join(base, "ingest=2"))
    return hll_estimate(state, ["event_type"], p=_P).orderBy("event_type")


def _hll_setops_oracle() -> str:
    # the generic helper wants group columns; the ungrouped A/B/union
    # sides are clearer built explicitly
    def regs(where: str) -> str:
        base = (
            f"CAST('0x' || substring(md5({_UDAY_SQL}), 1, 15) AS BIGINT)"
        )
        wbits = 60 - _P
        return f"""
      SELECT base % {2**_P} AS idx,
             CAST(MAX(CASE WHEN base // {2**_P} = 0 THEN {wbits + 1}
                  ELSE {wbits} - length(bin(base // {2**_P})) + 1 END)
                  AS BIGINT) AS m
      FROM (SELECT {base} AS base FROM events WHERE {where})
      GROUP BY idx"""

    maxrank = 60 - _P + 1
    m = 2**_P
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(2**maxrank)

    def est(regs_sql: str) -> str:
        return f"""(
      SELECT CAST({num!r} AS DOUBLE)
             / CAST(SUM(CAST(1 AS BIGINT) << ({maxrank} - m))
                    + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {maxrank})
                    AS DOUBLE)
      FROM ({regs_sql}))"""

    ra = regs("event_type = 'click'")
    rb = regs("event_type = 'view'")
    ru = f"""
      SELECT idx, CAST(MAX(m) AS BIGINT) AS m
      FROM ({ra} UNION ALL {rb}) GROUP BY idx"""
    exact = f"""
      SELECT CAST(COUNT(*) AS BIGINT) FROM (
        SELECT DISTINCT {_UDAY_SQL} AS uday FROM events
        WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT {_UDAY_SQL} AS uday FROM events
        WHERE event_type = 'view')"""
    return f"""
    SELECT {est(ra)} AS est_a, {est(rb)} AS est_b,
           {est(ru)} AS est_union,
           {est(ra)} + {est(rb)} - {est(ru)} AS est_inter,
           ({exact}) AS exact_inter"""


@query("q_sketch_hll_setops", _hll_setops_oracle())
def q_sketch_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Sketch SET OPERATIONS — the audience-overlap question
    ("user-days with BOTH a click and a view") answered from two
    already-built sketches: union is register-max (exact sketch
    algebra), intersection is inclusion-exclusion est_a + est_b −
    est_union — no raw-data pass, no value-domain shuffle, the
    standard HLL workaround for intersection (a Theta sketch would
    answer it natively; I-E is what HLL affords). The exact
    intersection rides along to expose the error (I-E error grows
    with the union size — the documented caveat). One output row; all
    arithmetic engine-exact."""
    e = load_table(spark, sf_dir, "events")
    ra = hll_registers(
        e.filter(F.col("event_type") == "click").withColumn(
            "g", F.lit(1)
        ),
        ["g"], _uday(), p=_P,
    )
    rb = hll_registers(
        e.filter(F.col("event_type") == "view").withColumn(
            "g", F.lit(1)
        ),
        ["g"], _uday(), p=_P,
    )
    ru = hll_merge(ra.unionByName(rb), ["g"])
    ea = hll_estimate(ra, ["g"], p=_P).select(
        "g", F.col("est").alias("est_a")
    )
    eb = hll_estimate(rb, ["g"], p=_P).select(
        "g", F.col("est").alias("est_b")
    )
    eu = hll_estimate(ru, ["g"], p=_P).select(
        "g", F.col("est").alias("est_union")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(_uday().alias("uday"))
        .distinct()
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .select(_uday().alias("uday"))
        .distinct()
    )
    exact = clicks.intersect(views).agg(
        F.lit(1).alias("g"), F.count(F.lit(1)).alias("exact_inter")
    )
    return (
        ea.join(eb, "g")
        .join(eu, "g")
        .join(exact, "g")
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_inter"
            ),
            "exact_inter",
        )
    )


def _join_size_oracle() -> str:
    from nutdb_spark.operators.sketch import oracle_cms_inner_product

    est = oracle_cms_inner_product(
        "SELECT o_custkey AS v FROM orders",
        "SELECT user_id AS v FROM events",
        width=4096,
    )
    return f"""
    WITH exact AS (
      SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS exact_size
      FROM (SELECT o_custkey AS k, COUNT(*) AS ca FROM orders GROUP BY 1) a
      JOIN (SELECT user_id AS k, COUNT(*) AS cb FROM events GROUP BY 1) b
      USING (k)),
    est AS ({est})
    SELECT exact.exact_size, est.est_size,
           est.est_size - exact.exact_size AS overcount,
           (est.est_size >= exact.exact_size) AS never_under
    FROM exact, est"""


@query("q_sketch_join_size", _join_size_oracle())
def q_sketch_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] JOIN-SIZE estimation from two count-min sketches — the
    planner-cardinality question ("how big is orders ⋈ events on the
    customer key?") answered without touching either table again:
    est = min_i Σ_b A[i][b]·B[i][b], the CMS inner-product estimator
    (Cormode & Muthukrishnan §4.2). Each row's sum is the true join
    size plus nonnegative collision mass, so the estimate NEVER reads
    low — the safe direction for a planner choosing between broadcast
    and shuffle at 100 TB (an optimistic estimate is how a 10 TB
    build side ends up broadcast). Exact size rides along to expose
    the error. Width is 4096 here (vs the heavy-hitter entry's 512)
    because inner-product collision mass scales with ‖a‖₁·‖b‖₁/w —
    the sketch is still 128 KiB however large the tables, and merges
    by counter-sum as data arrives."""
    from nutdb_spark.operators.sketch import cms_inner_product, cms_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("v")
    )
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("v")
    )
    est = cms_inner_product(
        cms_table(o, F.col("v"), width=4096),
        cms_table(e, F.col("v"), width=4096),
    )
    ca = o.groupBy("v").agg(F.count(F.lit(1)).alias("ca"))
    cb = e.groupBy("v").agg(F.count(F.lit(1)).alias("cb"))
    exact = ca.join(cb, "v").agg(
        F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
        .cast("long")
        .alias("exact_size")
    )
    return exact.crossJoin(est).select(
        "exact_size",
        "est_size",
        (F.col("est_size") - F.col("exact_size")).alias("overcount"),
        (F.col("est_size") >= F.col("exact_size")).alias("never_under"),
    )
