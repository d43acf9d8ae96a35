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


# --- reference error-enum parity sweep (error.rs / tokenizer/error.rs) -----
# One test per reference error VARIANT (VERDICT r7 "Next round" #7).
# Mapping:
#   ParseError::LexError            → TokenizeError (every tokenizer test)
#   ParseError::SyntaxError          → ParseError, variants below
#   SyntaxError::NotExpectedTokenTypes → test_malformed_statements_raise
#     ("SELECT (1 + 2", dangling clauses)
#   SyntaxError::NotExpectedKeywords   → test_malformed_statements_raise
#     ("SELECT a FROM t ORDER" — ORDER not followed by BY)
#   SyntaxError::ParseFail             → test_malformed_statements_raise
#     ("CREATE TABLE t (a UnknownType)")
#   SyntaxError::Conflicts             → test_insert_ragged_rows_conflict
#   TokenizeErrorType::UnexpectedEOF   → test_bad_string_literals_raise /
#     test_unterminated_block_comment_raises
#   TokenizeErrorType::UnexpectedChar  → test_bad_numeric_literals_raise /
#     test_bad_identifiers_raise
#   TokenizeErrorType::Incomplete      → test_bad_query_parameters_raise /
#     test_bare_bang_raises
# The remaining variants get explicit pins here:


def test_empty_query():
    # SyntaxError::EmptyQuery (error.rs:37, raised parser/mod.rs:143)
    with pytest.raises(ParseError, match="empty query"):
        parse("")
    with pytest.raises(ParseError, match="empty query"):
        parse("   \n\t ")


@pytest.mark.parametrize(
    "src",
    [
        r"SELECT '\u{zzz}'",     # non-hex payload
        r"SELECT '\u{110000}'",  # beyond U+10FFFF (char::from_u32 None)
        r"SELECT '\u{D800}'",    # surrogate (char::from_u32 None)
    ],
)
def test_invalid_escaped_unicode(src):
    # SyntaxError::InvalidEscapedUnicode (error.rs:39,
    # raised literal.rs:76-89 — both the from_str_radix failure and
    # the char::from_u32 rejection arms)
    with pytest.raises(TokenizeError, match="invalid .u escape"):
        parse(src)


def test_invalid_integer_literal_overflow():
    # SyntaxError::InvalidIntegerLiteral (error.rs:45): the reference
    # parses integer literals into u128 (parser/mod.rs:1263) — one
    # past u128::MAX must raise, u128::MAX itself must parse
    u128_max = (1 << 128) - 1
    assert parse(f"SELECT {u128_max}").query.columns[0][0].value == u128_max
    with pytest.raises(TokenizeError, match="invalid integer"):
        parse(f"SELECT {u128_max + 1}")


def test_invalid_hex_literal_overflow():
    # SyntaxError::InvalidHexLiteral (error.rs:42): hex parses into
    # u128 via from_str_radix (parser/mod.rs:1264) — 33 hex digits
    # overflow, 32 f's are u128::MAX and parse
    assert (
        parse("SELECT 0x" + "f" * 32).query.columns[0][0].value
        == (1 << 128) - 1
    )
    with pytest.raises(TokenizeError, match="invalid hex"):
        parse("SELECT 0x1" + "0" * 32)


def test_invalid_float_literal_unreachable_shapes():
    # SyntaxError::InvalidFloatLiteral (error.rs:40): the reference's
    # BigDecimal accepts every tokenizer-accepted float shape, so the
    # variant is only reachable through the LEX layer — pin that the
    # accepted shapes parse and the rejected shape raises there
    # (tokenizer mod.rs:586-606)
    assert parse("SELECT 1.").query.columns[0][0].kind == "float"
    assert parse("SELECT .5").query.columns[0][0].kind == "float"
    with pytest.raises(TokenizeError):
        parse("SELECT 1.d")


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


# --- [EXT] session-6 grammar error paths ------------------------------------


def test_alter_modify_requires_column():
    with pytest.raises(ParseError, match="COLUMN"):
        parse("ALTER TABLE t MODIFY x Int64")


def test_exchange_requires_and():
    with pytest.raises(ParseError, match="AND"):
        parse("EXCHANGE TABLES a b")


def test_exchange_requires_tables_keyword():
    with pytest.raises(ParseError, match="TABLES"):
        parse("EXCHANGE a AND b")


def test_optimize_deduplicate_parse_shapes():
    s = parse("OPTIMIZE TABLE t DEDUPLICATE")
    assert s.deduplicate and s.dedup_by is None
    s = parse("OPTIMIZE TABLE t FINAL DEDUPLICATE BY a, b")
    assert s.deduplicate and s.dedup_by == ["a", "b"]
    s = parse("OPTIMIZE TABLE t FINAL")
    assert not s.deduplicate


def test_generate_series_zero_step_rejected():
    from nutdb_spark.frontend.lower import LoweringError
    # parse is fine; the step guard fires at lowering
    stmt = parse("SELECT * FROM generate_series(1, 5, 0)")
    assert stmt is not None


def test_ansi_offset_fetch_shapes():
    s = parse(
        "SELECT x FROM t ORDER BY x OFFSET 5 ROWS "
        "FETCH FIRST 3 ROWS ONLY"
    )
    assert s.query.limit.n.value == 3 and s.query.limit.offset.value == 5
    s = parse("SELECT x FROM t ORDER BY x FETCH NEXT 2 ROW WITH TIES")
    assert s.query.limit.with_ties and s.query.limit.n.value == 2
    s = parse("SELECT x FROM t ORDER BY x OFFSET 7 ROWS")
    assert s.query.limit.offset.value == 7
    with pytest.raises(ParseError, match="ROW"):
        parse("SELECT x FROM t OFFSET 5 FETCH FIRST 1 ROWS ONLY")
    with pytest.raises(ParseError, match="ONLY or WITH TIES"):
        parse("SELECT x FROM t FETCH FIRST 1 ROWS")
    with pytest.raises(ParseError, match="FIRST or NEXT"):
        parse("SELECT x FROM t FETCH 1 ROWS ONLY")


def test_explain_ast_mode_parses():
    s = parse("EXPLAIN AST SELECT 1")
    assert s.mode == "ast"
    s = parse("EXPLAIN SELECT 1")
    assert s.mode == "simple"


def test_global_requires_join():
    with pytest.raises(ParseError, match="GLOBAL must be followed"):
        parse("SELECT 1 FROM t GLOBAL WHERE 1 = 1")
