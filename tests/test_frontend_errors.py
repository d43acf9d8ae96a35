"""Error-path parity with the reference frontend.

Ports the reference's failure-branch tests: bad numerics / strings /
identifiers / params / comments / symbols
(/root/reference/src/parser/tokenizer/mod.rs:545-783 `*_fail` tests) and
the ragged-INSERT `Conflicts` error
(/root/reference/src/parser/mod.rs:657-664). The positive twins live in
test_frontend.py; these pin that malformed input RAISES — with a
position — instead of mis-tokenizing.
"""

from __future__ import annotations

import pytest

from nutdb_spark.frontend.parser import ParseError, parse
from nutdb_spark.frontend.tokenizer import TokenizeError, tokenize

# --- tokenize_numerics_fail (mod.rs:600-606) -------------------------------


@pytest.mark.parametrize("src", ["1d", "1好", "1.d"])
def test_bad_numeric_literals_raise(src):
    with pytest.raises(TokenizeError):
        tokenize(src)


# --- tokenize_strings_fail (mod.rs:626-632) --------------------------------


@pytest.mark.parametrize(
    "src",
    [
        '"hello\'',  # unterminated (mismatched quotes)
        '"\n"',  # raw newline must be escaped
        '"\r"',  # raw carriage return must be escaped
        "'abc",  # unterminated single-quote
    ],
)
def test_bad_string_literals_raise(src):
    with pytest.raises(TokenizeError):
        tokenize(src)


# --- tokenize_identifiers_fail (mod.rs:649-659) ----------------------------


@pytest.mark.parametrize("src", ["``", "@", "你好", "@你好", "hello_你好"])
def test_bad_identifiers_raise(src):
    with pytest.raises(TokenizeError):
        tokenize(src)


# --- tokenize_query_parameter_fail (mod.rs:672-678) ------------------------


@pytest.mark.parametrize("src", ["$", "$a", "$0a", "$_0"])
def test_bad_query_parameters_raise(src):
    with pytest.raises(TokenizeError):
        tokenize(src)


# --- tokenize_comment_fail (mod.rs:696-700) --------------------------------


@pytest.mark.parametrize("src", ["/*", "/* /", "SELECT 1 /* unterminated"])
def test_unterminated_block_comment_raises(src):
    with pytest.raises(TokenizeError, match="not terminated"):
        tokenize(src)


# --- tokenize_symbol_fail (mod.rs:736-739) ---------------------------------


def test_bare_bang_raises():
    with pytest.raises(TokenizeError):
        tokenize("!")
    # but != is fine
    assert any(t.text == "!=" for t in tokenize("a != b"))


# --- errors carry a source position ----------------------------------------


def test_tokenize_error_carries_position():
    with pytest.raises(TokenizeError) as ei:
        tokenize("SELECT 1好")
    assert ei.value.pos == 8


# --- ragged INSERT rows: Conflicts (parser/mod.rs:657-664) -----------------


def test_insert_ragged_rows_conflict():
    with pytest.raises(ParseError, match="arity"):
        parse("INSERT INTO t (a, b) VALUES (1, 2), (3)")


def test_insert_row_vs_column_list_conflict():
    with pytest.raises(ParseError):
        parse("INSERT INTO t (a, b) VALUES (1, 2, 3)")


# --- malformed statement shapes (parser-level) -----------------------------


@pytest.mark.parametrize(
    "src",
    [
        "SELECT",  # bare select with no items
        "SELECT * FROM",  # dangling FROM
        "SELECT * FROM t WHERE",  # dangling WHERE
        "SELECT * FROM t GROUP BY",  # dangling GROUP BY
        "SELECT a FROM t ORDER",  # ORDER without BY
        "SELECT a FROM t LIMIT",  # LIMIT without count
        "CREATE TABLE t (a UnknownType)",  # bad type name
        "SELECT (1 + 2",  # unbalanced paren
        "SELECT a FROM t JOIN",  # dangling JOIN
        "WITH x AS SELECT 1",  # CTE missing parens
    ],
)
def test_malformed_statements_raise(src):
    with pytest.raises((ParseError, TokenizeError)):
        parse(src)


# --- [EXT] window-function error paths -------------------------------------


def test_window_range_frames_rejected():
    with pytest.raises(ParseError, match="RANGE"):
        parse("SELECT sum(x) OVER (ORDER BY y RANGE UNBOUNDED PRECEDING) FROM t")


def test_window_bad_frame_bound():
    with pytest.raises(ParseError, match="frame bound"):
        parse("SELECT sum(x) OVER (ORDER BY y ROWS BETWEEN foo AND CURRENT ROW) FROM t")


# --- [EXT] SAMPLE clause error paths ---------------------------------------


def test_sample_fraction_out_of_range():
    with pytest.raises(ParseError, match="fraction"):
        parse("SELECT 1 FROM t SAMPLE 1.5 BY (id)")


def test_sample_requires_by_key():
    with pytest.raises(ParseError, match="BY"):
        parse("SELECT 1 FROM t SAMPLE 0.5")
