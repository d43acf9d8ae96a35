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
