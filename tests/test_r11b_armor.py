"""Batched randomized armor for the round-11 session-2 folds: seeded
random inputs through ONE Spark job per family, compared against
pure-Python references — windowFunnel strict modes (the DP folds),
seriesPeriodDetect (cross-multiplied argmax), arrayAUCPR (pessimistic
tie order), groupArrayInsertAt/Last, and the -Resample cells.
"""

from __future__ import annotations

import random
from fractions import Fraction

from pyspark.sql import functions as F

from nutdb_spark.functions.registry import (
    PARAMETRIC_AGGS as P,
    SCALAR_FNS as S,
)

SEED = 20260816
WIN = 50


def _ref_funnel_strict_order(events, n):
    """events: ts-sorted (t, conds tuple). Chains extend only at the
    immediately next event."""
    run = [None] * n
    best = 0
    for t, cs in events:
        new = [None] * n
        if cs[0]:
            new[0] = t
        for k in range(1, n):
            if cs[k] and run[k - 1] is not None and t - run[k - 1] <= WIN:
                new[k] = run[k - 1]
        run = new
        depth = max((k + 1 for k in range(n) if run[k] is not None),
                    default=0)
        best = max(best, depth)
    return best


def _ref_funnel_strict_dedup(events, n):
    dp = [None] * n
    best = 0
    for t, cs in events:
        ext = [None] * n
        if cs[0]:
            ext[0] = t
        for k in range(1, n):
            if cs[k] and dp[k - 1] is not None and t - dp[k - 1] <= WIN:
                ext[k] = dp[k - 1]
        new = []
        for k in range(n):
            if ext[k] is not None:
                new.append(ext[k])
            elif any(cs[j] for j in range(k + 1)):
                new.append(None)  # repeat of a consumed condition
            else:
                new.append(dp[k])
        dp = new
        depth = max((k + 1 for k in range(n) if dp[k] is not None),
                    default=0)
        best = max(best, depth)
    return best


def test_funnel_strict_modes_randomized(spark):
    rnd = random.Random(SEED)
    rows = []
    refs_order, refs_dedup = {}, {}
    for g in range(60):
        evs = sorted(
            (rnd.randint(0, 120), tuple(rnd.random() < 0.35 for _ in range(3)))
            for _ in range(rnd.randint(1, 12))
        )
        # unique timestamps keep the struct-sort order == list order
        seen, uniq = set(), []
        for t, cs in evs:
            while t in seen:
                t += 1
            seen.add(t)
            uniq.append((t, cs))
        uniq.sort()
        refs_order[g] = _ref_funnel_strict_order(uniq, 3)
        refs_dedup[g] = _ref_funnel_strict_dedup(uniq, 3)
        rows += [(g, t, cs[0], cs[1], cs[2]) for t, cs in uniq]
    df = spark.createDataFrame(
        rows, "g int, t long, a boolean, b boolean, c boolean"
    )
    got = {
        r["g"]: (r["o"], r["d"])
        for r in df.groupBy("g")
        .agg(
            P["windowFunnel"](
                [WIN, "strict_order"],
                F.col("t"), F.col("a"), F.col("b"), F.col("c"),
            ).alias("o"),
            P["windowFunnel"](
                [WIN, "strict_dedup"],
                F.col("t"), F.col("a"), F.col("b"), F.col("c"),
            ).alias("d"),
        )
        .collect()
    }
    for g in refs_order:
        assert got[g][0] == refs_order[g], ("order", g)
        assert got[g][1] == refs_dedup[g], ("dedup", g)


def test_series_period_randomized(spark):
    rnd = random.Random(SEED + 1)
    arrays = [
        [rnd.randint(0, 9) for _ in range(rnd.randint(0, 30))]
        for _ in range(150)
    ]
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i int, a array<long>"
    )
    got = {
        r["i"]: r["p"]
        for r in df.select(
            "i", S["seriesPeriodDetect"](F.col("a"), F.lit(8)).alias("p")
        ).collect()
    }

    def ref(a):
        L = len(a)
        ml = min(8, L - 1)
        if L < 2 or ml < 1:
            return None
        best = (Fraction(-1, 1), 0)
        for lag in range(1, ml + 1):
            score = Fraction(
                sum(x * y for x, y in zip(a, a[lag:])), L - lag
            )
            if score > best[0]:
                best = (score, lag)
        return best[1]

    for i, a in enumerate(arrays):
        assert got[i] == ref(a), (i, a)


def test_array_aucpr_randomized(spark):
    rnd = random.Random(SEED + 2)
    cases = [
        (
            [rnd.randint(0, 6) for _ in range(n)],
            [rnd.randint(0, 1) for _ in range(n)],
        )
        for n in (rnd.randint(1, 12) for _ in range(150))
    ]
    df = spark.createDataFrame(
        [(i, s, l) for i, (s, l) in enumerate(cases)],
        "i int, s array<long>, l array<long>",
    )
    got = {
        r["i"]: r["a"]
        for r in df.select(
            "i", S["arrayAUCPR"](F.col("s"), F.col("l")).alias("a")
        ).collect()
    }

    def ref(sc, lb):
        pairs = sorted(zip(sc, lb), key=lambda p: (-p[0], p[1]))
        tp = acc = 0
        for i, (_, l) in enumerate(pairs, start=1):
            if l == 1:
                tp += 1
                acc += tp / i
        return None if tp == 0 else acc / tp

    for i, (sc, lb) in enumerate(cases):
        want = ref(sc, lb)
        if want is None:
            assert got[i] is None, i
        else:
            assert abs(got[i] - want) < 1e-12, i


def test_resample_randomized(spark):
    rnd = random.Random(SEED + 3)
    rows = []
    per_group: dict[int, list] = {}
    for g in range(40):
        pts = [
            (rnd.randint(0, 50), rnd.randint(-5, 12))
            for _ in range(rnd.randint(1, 20))
        ]
        per_group[g] = pts
        rows += [(g, x, k) for k, x in pts]
    df = spark.createDataFrame(rows, "g int, x long, k long")
    got = {
        r["g"]: (list(r["s"]), list(r["c"]), list(r["m"]))
        for r in df.groupBy("g")
        .agg(
            P["sumResample"]([0, 40, 10], F.col("x"), F.col("k")).alias("s"),
            P["countResample"]([0, 40, 10], F.col("x"), F.col("k")).alias(
                "c"
            ),
            P["minResample"]([0, 40, 10], F.col("x"), F.col("k")).alias("m"),
        )
        .collect()
    }
    for g, pts in per_group.items():
        s = [0] * 4
        c = [0] * 4
        m: list = [None] * 4
        for k, x in pts:
            if 0 <= k < 40:
                b = k // 10
                s[b] += x
                c[b] += 1
                m[b] = x if m[b] is None else min(m[b], x)
        assert got[g] == (s, c, m), g


def test_java_hash_anchors(spark):
    """Known Java String.hashCode() values (the JLS anchors)."""
    cases = {"": 0, "a": 97, "abc": 96354, "hello world": 1794106052,
             "polygenelubricants": -2147483648}
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {
        r["s"]: (r["jh"], r["hh"])
        for r in df.select(
            "s",
            S["javaHash"](F.col("s")).alias("jh"),
            S["hiveHash"](F.col("s")).alias("hh"),
        ).collect()
    }
    for s, want in cases.items():
        assert got[s][0] == want, s
        assert got[s][1] == want & 0x7FFFFFFF, s


def test_tombstone_dedup_three_batch_replay(spark):
    """Randomized 3-batch replay with deletes after every batch,
    compared against a Python simulator of the documented contract:
    keep-min-id per key among rows never deleted and never blocked at
    their ingest time; deleting a keeper re-admits its key."""
    import random

    from nutdb_spark.operators.dedup import (
        incremental_exact_dedup_tombstone,
    )

    rnd = random.Random(99)
    next_id = [0]

    def batch(n):
        rows = []
        for _ in range(n):
            rows.append((next_id[0], f"k{rnd.randint(0, 6)}"))
            next_id[0] += 1
        return rows

    batches = [batch(12), batch(12), batch(12)]
    # simulator state: key -> keeper id; survivors set; deletes chosen
    # AFTER each batch from current keepers
    keepers: dict[str, int] = {}
    live: set[int] = set()
    deletes_per_step: list[list[int]] = []
    for b in batches:
        seen_in_batch: set[str] = set()
        for i, k in sorted(b):
            if k in keepers or k in seen_in_batch:
                continue
            keepers[k] = i
            seen_in_batch.add(k)
            live.add(i)
        dels = [i for i in sorted(live) if rnd.random() < 0.3]
        deletes_per_step.append(dels)
        for i in dels:
            live.discard(i)
            for k, kid in list(keepers.items()):
                if kid == i:
                    del keepers[k]
    # engine replay
    idx = None
    surv_ids: set[int] = set()
    for step, b in enumerate(batches):
        df = spark.createDataFrame(b, "id long, t string")
        dels = (
            spark.createDataFrame(
                [(i,) for i in deletes_per_step[step - 1]], "id long"
            )
            if step > 0 and deletes_per_step[step - 1]
            else None
        )
        surv, entries, purged = incremental_exact_dedup_tombstone(
            df, idx, "id", F.col("t"), deletes=dels
        )
        surv_ids |= {r["id"] for r in surv.collect()}
        idx = (
            entries if purged is None else purged.unionByName(entries)
        ).localCheckpoint()
    # apply every delete wave to the accumulated survivors
    for dels in deletes_per_step:
        surv_ids -= set(dels)
    assert surv_ids == live
