"""Round-6 third-wave dialect extensions: SELECT-list wildcard
modifiers (`* EXCEPT` / `* REPLACE`), COLUMNS('regex') dynamic
projection, GLOBAL IN, and parametric aggregates `fn(params)(args)` —
parse shapes, set-operator disambiguation, lowering semantics, and
failure branches.
"""

from __future__ import annotations

import pytest

from nutdb_spark.frontend import ast_nodes as A
from nutdb_spark.frontend.lower import LoweringError
from nutdb_spark.frontend.parser import ParseError, parse

SF = "/root/testdata/sf0.001"


def _eng(spark):
    from nutdb_spark.engine import NutEngine

    return NutEngine(spark, data_dir=SF)


# --- parse shapes ----------------------------------------------------------


def test_wildcard_except_parses():
    stmt = parse("select * except (a, b) from t")
    wc = stmt.query.columns[0][0]
    assert isinstance(wc, A.Wildcard)
    assert wc.except_cols == ["a", "b"]


def test_wildcard_except_bare_column():
    stmt = parse("select * except a from t")
    assert stmt.query.columns[0][0].except_cols == ["a"]


def test_wildcard_replace_parses():
    stmt = parse("select * replace (x + 1 as x, y * 2 as y) from t")
    wc = stmt.query.columns[0][0]
    assert [name for _, name in wc.replaces] == ["x", "y"]


def test_qualified_wildcard_modifiers():
    stmt = parse("select t.* except (a) replace (b as c) from t")
    wc = stmt.query.columns[0][0]
    assert wc.qualifier == "t"
    assert wc.except_cols == ["a"]
    assert [n for _, n in wc.replaces] == ["c"]


def test_except_set_operator_still_parses():
    # `* EXCEPT SELECT`, `* EXCEPT (SELECT ...)`, and the explicit
    # ALL/DISTINCT spellings must all remain set operations
    for sql in (
        "select * from t except select * from u",
        "select * from t except (select * from u)",
        "select * from t except all select * from u",
        "select * from t except distinct select * from u",
    ):
        stmt = parse(sql)
        wc = stmt.query.left.columns[0][0]
        assert isinstance(wc, A.Wildcard) and wc.except_cols is None


def test_replace_without_paren_is_alias():
    # bare REPLACE after * without parens is NOT a modifier; it has
    # no other parse here, so it must fail loudly rather than eat
    with pytest.raises(ParseError):
        parse("select * replace x from t")


def test_global_in_parses_as_in():
    stmt = parse("select a from t where b global in (1, 2)")
    cond = stmt.query.where
    assert isinstance(cond, A.InList) and not cond.negated


def test_global_not_in_parses():
    stmt = parse("select a from t where b global not in (select c from u)")
    cond = stmt.query.where
    assert isinstance(cond, A.InSubquery) and cond.negated


def test_parametric_call_parses():
    stmt = parse("select topK(3)(x) from t")
    call = stmt.query.columns[0][0]
    assert isinstance(call, A.FnCall)
    assert call.name == "topK"
    assert len(call.params) == 1 and len(call.args) == 1


def test_parametric_then_over_window():
    stmt = parse("select quantile(0.5)(x) over (partition by g) from t")
    wcall = stmt.query.columns[0][0]
    assert isinstance(wcall, A.WindowCall)


# --- lowering semantics ----------------------------------------------------


def test_except_drops_and_replace_substitutes(spark):
    df = _eng(spark).sql(
        "select * except (n_name) "
        "replace (n_nationkey + 100 as n_nationkey) "
        "from nation order by n_nationkey limit 2"
    )
    assert df.columns == ["n_nationkey", "n_regionkey"]
    assert [r["n_nationkey"] for r in df.collect()] == [100, 101]


def test_except_unknown_column_errors(spark):
    with pytest.raises(LoweringError, match="EXCEPT column"):
        _eng(spark).sql("select * except (nope) from nation")


def test_replace_unknown_column_errors(spark):
    with pytest.raises(LoweringError, match="REPLACE column"):
        _eng(spark).sql("select * replace (1 as nope) from nation")


def test_except_narrows_read_schema(spark):
    # the modifier is a scan-narrowing declaration: the dropped column
    # must be pruned out of the parquet ReadSchema
    df = _eng(spark).sql("select * except (n_name) from nation")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "n_name" not in plan


def test_columns_regex_expands(spark):
    df = _eng(spark).sql("select columns('key') from nation limit 1")
    assert df.columns == ["n_nationkey", "n_regionkey"]


def test_columns_regex_no_match_errors(spark):
    with pytest.raises(LoweringError, match="matched no columns"):
        _eng(spark).sql("select columns('zzz') from nation")


def test_global_in_lowering(spark):
    rows = (
        _eng(spark)
        .sql(
            "select r_regionkey from region "
            "where r_regionkey global in (0, 4) order by r_regionkey"
        )
        .collect()
    )
    assert [r["r_regionkey"] for r in rows] == [0, 4]


def test_topk_exact_with_tiebreak(spark):
    # 5×0, 3×1, 3×2 — k=2 must be [0, 1]: count desc then value asc
    df = spark.createDataFrame(
        [(0,)] * 5 + [(1,)] * 3 + [(2,)] * 3, "x int"
    )
    from nutdb_spark.functions.registry import PARAMETRIC_AGGS

    got = df.agg(PARAMETRIC_AGGS["topK"]([2], df.x).alias("tk")).collect()
    assert got[0]["tk"] == [0, 1]


def test_quantiles_exact_quartiles(spark):
    df = _eng(spark).sql(
        "select quantiles(0.25, 0.5, 0.75)(n_nationkey)[2] as med "
        "from nation"
    )
    assert df.collect()[0]["med"] == 12.0


def test_parametric_unknown_fn_errors(spark):
    with pytest.raises(LoweringError, match="not parametric"):
        _eng(spark).sql("select substring(1)(n_name) from nation")


def test_parametric_nonconstant_param_errors(spark):
    with pytest.raises(LoweringError, match="constant"):
        _eng(spark).sql(
            "select topK(n_regionkey)(n_nationkey) from nation"
        )


def test_parametric_stays_jvm_side(spark):
    df = _eng(spark).sql(
        "select n_regionkey, topK(2)(n_nationkey % 3) as tk "
        "from nation group by n_regionkey"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
