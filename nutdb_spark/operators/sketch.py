"""[EXT] Mergeable cardinality / frequency sketches — exact-replay HLL
and count-min, fully JVM-side.

At 100 TB, "how many distinct users per segment" and "which values are
heavy" are sketch problems: the exact answers need a corpus-wide
shuffle on the value, while a sketch is a tiny, MERGEABLE aggregate —
each executor folds its partition into a fixed-size state (HLL: m
registers; CMS: d×w counters), states combine associatively (register
max / counter sum), and only the sketch crosses the wire. Spark's own
``approx_count_distinct`` is such an HLL, but its register layout is
engine-private, so it can't be oracled, persisted for incremental
ingest, or merged with sketches built elsewhere. This module builds
the sketches from ENGINE-NEUTRAL primitives — md5 (the MinHash base
hash, operators/dedup.py:263), integer modulo, and bin()-length rank —
so the full register/counter state is a plain DataFrame with an exact
DuckDB twin, and the mergeability claim is PINNED by an oracle
(shard-sketch-merge equals direct-sketch, bit for bit) instead of
asserted.

HLL (Flajolet et al. 2007, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm"):

- base hash: first 15 md5 hex digits of the value's decimal string →
  a uniform 60-bit integer (the MinHash convention),
- register index = base mod m (m = 2^p); the remaining (60-p)-bit
  word w sets the rank: rank = (60-p) - floor(log2 w) computed
  EXACTLY as ``(60-p) - length(bin(w)) + 1`` (w = 0 → 60-p+1),
- estimate = alpha_m · m² / Σ 2^(-M_j). The indicator sum is kept in
  INTEGER form S = Σ 2^((60-p+1) - M_j) (empty register → M_j = 0),
  so the only floating-point steps are one int→double cast and two
  exactly-rounded IEEE ops — bit-identical across engines. The
  small-range linear-counting branch needs ln(), which is libm and
  NOT exactly rounded, so this module deliberately emits the raw
  estimator plus the linear-counting INPUTS (n_zero) and leaves the
  branch to the consumer; the suite entry reports both raw estimate
  and exact count side by side.

CMS (Cormode & Muthukrishnan 2005, "An improved data stream summary:
the count-min sketch and its applications"): d pairwise-independent
rows h_i(x) = (a_i·base + b_i) mod P mod w (the MinHash affine family
and prime, so coefficients stay shared repo-wide), point estimate =
min_i counter[i][h_i(x)] — always ≥ the true count, within εN with
probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutdb_spark.operators.dedup import MINHASH_P, _affine

# 60-bit base hash (15 md5 hex digits) — shared with MinHash.
_BASE_BITS = 60


def base_hash60(v: Column) -> Column:
    """Uniform 60-bit integer hash of any value, via the decimal/string
    rendering both engines share. JVM-side: md5 + conv, no UDF."""
    return F.conv(
        F.substring(F.md5(v.cast("string")), 1, 15), 16, 10
    ).cast("long")


def oracle_base_hash60(expr: str) -> str:
    return (
        f"CAST('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 15) "
        f"AS BIGINT)"
    )


# --- HyperLogLog -------------------------------------------------------------


def hll_registers(
    df: DataFrame, group_cols: list[str], value: Column, *, p: int = 10
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., idx, m) with one
    row per NON-EMPTY register (idx in [0, 2^p), m = max rank seen).

    This IS the sketch state: 2^p rows per group at most, regardless
    of input size — the thing that persists for incremental ingest
    and merges across shards by ``groupBy(idx).agg(max(m))``. The
    build is one map-side-partial groupBy (Spark pushes the max into
    the combiner), so only ≤2^p rows per group per partition shuffle.
    """
    wbits = _BASE_BITS - p
    base = base_hash60(value)
    w = F.shiftright(base, p)  # exact integer shift, not a double div
    rank = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )
    return (
        df.select(
            *group_cols,
            F.pmod(base, F.lit(2**p)).alias("idx"),
            rank.cast("long").alias("rank"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("rank").alias("m"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches that share a group key: register-wise max. The
    whole point of the representation — shard/day/executor sketches
    combine without touching the raw data again."""
    return registers.groupBy(*group_cols, "idx").agg(
        F.max("m").alias("m")
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], *, p: int = 10
) -> DataFrame:
    """Per-group raw HLL estimate from a register table: (group_cols,
    n_zero, est). Integer indicator sum S = Σ 2^(maxrank - M_j) over
    ALL 2^p registers (absent rows contribute M_j = 0), then
    est = alpha·m²·2^maxrank / S with exactly-rounded IEEE steps only.
    S ≤ 2^p · 2^(maxrank) = 2^(p + 61 - p) = 2^61 — int64-safe."""
    m = 2**p
    maxrank = _BASE_BITS - p + 1
    # alpha for m >= 128 (Flajolet et al. §4); full-precision literal
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # F.shiftleft takes a literal bit count; the column-valued shift
    # needs the SQL spelling (still JVM-side integer ops, no Python)
    present = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(
                f"shiftleft(cast(1 as bigint), cast({maxrank} - m as int))"
            )
        ).alias("__s_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    n_zero = (F.lit(m) - F.col("__n_present")).cast("long")
    s = (
        F.col("__s_present")
        + (F.lit(m) - F.col("__n_present")) * F.lit(2**maxrank)
    )
    est = (
        F.lit(alpha * m * m * float(2**maxrank))
        / s.cast("double")
    )
    return present.select(
        *group_cols,
        n_zero.alias("n_zero"),
        est.alias("est"),
    )


def oracle_hll_registers(
    from_sql: str, group_exprs: list[str], value_expr: str, *, p: int = 10
) -> str:
    """DuckDB twin of ``hll_registers`` over ``FROM {from_sql}``."""
    wbits = _BASE_BITS - p
    base = oracle_base_hash60(value_expr)
    g = ", ".join(group_exprs)
    return f"""
    SELECT {g}, base % {2**p} AS idx,
           CAST(MAX(CASE WHEN base // {2**p} = 0 THEN {wbits + 1}
                ELSE {wbits} - length(bin(base // {2**p})) + 1 END)
                AS BIGINT) AS m
    FROM (SELECT {g}, {base} AS base FROM {from_sql})
    GROUP BY {g}, idx"""


def oracle_hll_estimate(
    registers_sql: str, group_exprs: list[str], *, p: int = 10
) -> str:
    """DuckDB twin of ``hll_estimate`` over a register-table subquery."""
    m = 2**p
    maxrank = _BASE_BITS - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # ONE Python-folded numerator literal, exactly as the Spark side
    # embeds it (hll_estimate folds alpha·m²·2^maxrank before F.lit)
    num = alpha * m * m * float(2**maxrank)
    g = ", ".join(group_exprs)
    return f"""
    SELECT {g},
           CAST({m} - COUNT(*) AS BIGINT) AS n_zero,
           CAST({num!r} AS DOUBLE)
             / CAST(SUM(CAST(1 AS BIGINT) << ({maxrank} - m))
                    + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {maxrank})
                    AS DOUBLE) AS est
    FROM ({registers_sql})
    GROUP BY {g}"""


# --- count-min sketch --------------------------------------------------------


def cms_table(
    df: DataFrame,
    value: Column,
    *,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Count-min counter table over the values of one column: (row,
    bucket, cnt), ≤ depth·width rows total. Each input value updates
    one bucket per row via the shared affine family on the 60-bit
    base hash. One explode (depth entries per input) + one
    map-side-partial groupBy; the state merges across shards by
    summing counters on (row, bucket)."""
    base = base_hash60(value)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    F.pmod(
                        F.pmod(base, F.lit(MINHASH_P))
                        * F.lit(_affine(i)[0])
                        + F.lit(_affine(i)[1]),
                        F.lit(MINHASH_P),
                    )
                    % F.lit(width)
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cms_bucket_expr(base_expr: str, i: int, width: int) -> str:
    a, b = _affine(i)
    return f"((({base_expr}) % {MINHASH_P}) * {a} + {b}) % {MINHASH_P} % {width}"


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    value: Column,
    *,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point estimates for the rows of ``keys``: min over the sketch
    rows of the addressed counter. The sketch is ≤ depth·width rows —
    always broadcastable — so the probe is a broadcast join however
    large the key set is."""
    base = base_hash60(value)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    F.pmod(
                        F.pmod(base, F.lit(MINHASH_P))
                        * F.lit(_affine(i)[0])
                        + F.lit(_affine(i)[1]),
                        F.lit(MINHASH_P),
                    )
                    % F.lit(width)
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probes = keys.select("*", F.explode(rows).alias("rb")).select(
        *keys.columns,
        F.col("rb.row").alias("row"),
        F.col("rb.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(*keys.columns)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
    )


def oracle_cms(
    values_sql: str,
    keys_sql: str,
    *,
    depth: int = 4,
    width: int = 512,
) -> str:
    """DuckDB twin of build+probe: ``values_sql`` yields one column
    ``v`` (the sketched values, with multiplicity); ``keys_sql``
    yields (k, ...passthrough) — the probe keys. Returns one row per
    key with ``cms_est``."""
    base_v = oracle_base_hash60("v")
    base_k = oracle_base_hash60("k")
    unions_v = "\nUNION ALL\n".join(
        f"SELECT {i} AS row, {_cms_bucket_expr(base_v, i, width)} AS bucket "
        f"FROM vals"
        for i in range(depth)
    )
    unions_k = "\nUNION ALL\n".join(
        f"SELECT k, {i} AS row, {_cms_bucket_expr(base_k, i, width)} AS bucket "
        f"FROM keys"
        for i in range(depth)
    )
    return f"""
    WITH vals AS ({values_sql}),
    keys AS ({keys_sql}),
    cms AS (
      SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ({unions_v}) GROUP BY row, bucket),
    probes AS ({unions_k})
    SELECT p.k, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_est
    FROM probes p LEFT JOIN cms c USING (row, bucket)
    GROUP BY p.k"""


def cms_inner_product(
    cms_a: DataFrame, cms_b: DataFrame, *, depth: int = 4
) -> DataFrame:
    """Join-size estimate from two count-min sketches built with the
    SAME hash family/width: est = min_i Σ_b A[i][b]·B[i][b]
    (Cormode & Muthukrishnan §4.2 — the CMS inner-product estimator).
    Each row's sum equals the true Σ_v cA(v)·cB(v) plus nonnegative
    collision mass, so the min over rows NEVER underestimates — the
    planner-friendly direction (an optimistic join-size estimate is
    what breaks plans at 100 TB). One ≤depth·width-row join; neither
    raw table is touched. Returns one row: (est_size)."""
    a = cms_a.select("row", "bucket", F.col("cnt").alias("__ca"))
    b = cms_b.select("row", "bucket", F.col("cnt").alias("__cb"))
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    return per_row.agg(
        F.min("__ip").cast("long").alias("est_size")
    )


def oracle_cms_inner_product(
    values_a_sql: str,
    values_b_sql: str,
    *,
    depth: int = 4,
    width: int = 512,
) -> str:
    """DuckDB twin: both value streams (one column ``v`` each) →
    sketches → min-over-rows inner product, as one scalar subquery."""
    base = oracle_base_hash60("v")
    def cms(src: str, tag: str) -> str:
        unions = "\nUNION ALL\n".join(
            f"SELECT {i} AS row, {_cms_bucket_expr(base, i, width)} AS bucket "
            f"FROM {tag}v"
            for i in range(depth)
        )
        return f"""{tag}v AS ({src}),
    {tag}c AS (
      SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ({unions}) GROUP BY row, bucket)"""

    return f"""
    WITH {cms(values_a_sql, 'a')},
    {cms(values_b_sql, 'b')}
    SELECT CAST(MIN(ip) AS BIGINT) AS est_size FROM (
      SELECT ac.row AS r, SUM(ac.cnt * bc.cnt) AS ip
      FROM ac JOIN bc ON ac.row = bc.row AND ac.bucket = bc.bucket
      GROUP BY ac.row)"""
