"""NutDB dialect parser — Python re-derivation of the reference's Pratt
(TDOP) parser (/root/reference/src/parser/mod.rs, 1,974 LoC): same
statement set (10 kinds), same clause order, same precedence ladder
(mod.rs:1950-1966), same set-operation precedence climbing
(UnionTypePower: EXCEPT < UNION < INTERSECT, mod.rs:1968-1974), and the
same parse-time constant folds (simplify.rs).

Entry point: ``parse(sql) -> Statement`` — single statement, trailing
``;`` allowed (mod.rs:165-173).
"""

from __future__ import annotations

from nutdb_spark.frontend import ast_nodes as A
from nutdb_spark.frontend import tokenizer as T

# precedence ladder (TokenPower, mod.rs:1950-1966); larger binds tighter
P_TERM = 0
P_OR = 1
P_XOR = 2
P_AND = 3
P_NOT = 4
P_CMP = 5
P_BETWEEN = 6
P_BITOR = 7
P_BITXOR = 8
P_BITAND = 9
P_SHIFT = 10
P_ADD = 11
P_MUL = 12
P_ACCESS = 13

_SYM_POWER = {
    "=": P_CMP, "!=": P_CMP, "<": P_CMP, "<=": P_CMP, ">=": P_CMP, ">": P_CMP,
    "|": P_BITOR, "^": P_BITXOR, "&": P_BITAND,
    "<<": P_SHIFT, ">>": P_SHIFT,
    "+": P_ADD, "-": P_ADD,
    "*": P_MUL, "/": P_MUL, "%": P_MUL,
    "[": P_ACCESS, "::": P_ACCESS, "||": P_ADD,
}
_KW_POWER = {
    "or": P_OR, "xor": P_XOR, "and": P_AND, "not": P_NOT,
    "is": P_CMP, "in": P_CMP, "like": P_CMP, "ilike": P_CMP,
    "global": P_CMP,
    "between": P_BETWEEN,
}

# set-op precedence (UnionTypePower): EXCEPT < UNION < INTERSECT
_UNION_POWER = {"except": 1, "union": 2, "intersect": 3}

# keywords that open clauses — never identifiers in postfix positions
_CLAUSE_KEYWORDS = {
    "from", "where", "group", "order", "having", "limit", "union",
    "intersect", "except", "join", "inner", "left", "right", "full",
    "on", "using", "as", "and", "or", "then", "else", "end", "when",
    "settings", "into", "window", "qualify", "prewhere", "sample",
    "asc", "desc", "nulls", "with", "by", "offset",
}

_INTERVAL_UNITS = {
    "second", "minute", "hour", "day", "week", "month", "quarter", "year",
}

# ANSI EXTRACT(unit FROM expr) → the registered datetime getters
_EXTRACT_FNS = {
    "year": "getYear", "month": "toMonth", "day": "toDayOfMonth",
    "hour": "toHour", "minute": "toMinute", "second": "toSecond",
    "quarter": "toQuarter", "dayofyear": "toDayOfYear",
}

_TYPE_KEYWORDS = {
    "int8", "int16", "int32", "int64", "int128",
    "uint8", "uint16", "uint32", "uint64", "uint128",
    "serial32", "serial64", "serial128",
    "userial32", "userial64", "userial128",
    "decimal32", "decimal64", "float32", "float64",
    "boolean", "chars", "string", "uuid", "date", "datetime",
    "array", "enum", "tuple", "map", "dictionary", "nullable",
}


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, sql: str):
        self.tokens = T.tokenize(sql)
        self.pos = 0
        # [EXT] pending `OVER w` references for the current query body
        self._window_refs: list = []

    # --- token plumbing ---------------------------------------------------

    def peek(self) -> T.Token:
        return self.tokens[self.pos]

    def peek_at(self, off: int) -> T.Token:
        """Lookahead clamped to the trailing EOF token."""
        return self.tokens[min(self.pos + off, len(self.tokens) - 1)]

    def next(self) -> T.Token:
        t = self.tokens[self.pos]
        if t.type != T.EOF:
            self.pos += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.type == T.KWID and t.text.lower() in kws

    def eat_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.next()
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.eat_kw(kw):
            raise ParseError(f"expected {kw.upper()}, got {self.peek().text!r}")

    def at_sym(self, s: str) -> bool:
        t = self.peek()
        return t.type == T.SYM and t.text == s

    def eat_sym(self, s: str) -> bool:
        if self.at_sym(s):
            self.next()
            return True
        return False

    def expect_sym(self, s: str) -> None:
        if not self.eat_sym(s):
            raise ParseError(f"expected {s!r}, got {self.peek().text!r}")

    def ident(self) -> str:
        t = self.peek()
        if t.type in (T.KWID, T.DELIM_IDENT):
            self.next()
            return t.text
        raise ParseError(f"expected identifier, got {t.text!r}")

    # [EXT] GROUP BY ALL / ORDER BY ALL: the bare keyword is the
    # modifier only when nothing after it could continue an expression
    # or a list — a column actually named `all` keeps working in
    # every other position
    _ALL_ENDERS = {
        "with", "having", "qualify", "window", "order", "limit",
        "offset", "settings", "union", "intersect", "except", "into",
        "format", "interpolate", "asc", "desc", "nulls", "fetch",
    }

    def _bare_all_ahead(self) -> bool:
        t = self.peek()
        if not (t.type == T.KWID and t.text.lower() == "all"):
            return False
        if self.pos + 1 >= len(self.tokens):
            return True
        nxt = self.tokens[self.pos + 1]
        if not nxt.text:
            return True
        if nxt.type == T.KWID and nxt.text.lower() in self._ALL_ENDERS:
            return True
        return nxt.type == T.SYM and nxt.text == ")"

    # --- entry ------------------------------------------------------------

    def parse_stmt(self):
        t = self.peek()
        if t.type != T.KWID:
            if not t.text:
                # error.rs SyntaxError::EmptyQuery — same wording
                raise ParseError("empty query")
            raise ParseError(f"statement must start with a keyword, got {t.text!r}")
        kw = t.text.lower()
        dispatch = {
            "select": self._select_stmt, "with": self._select_stmt,
            "explain": self._explain, "insert": self._insert,
            "create": self._create, "describe": self._describe,
            "drop": self._drop, "truncate": self._truncate,
            "alter": self._alter, "optimize": self._optimize,
            "set": self._set, "show": self._show,
            "rename": self._rename,
            "exchange": self._exchange,
            "delete": self._delete,
            "update": self._update,
            "merge": self._merge,
            "detach": self._detach, "attach": self._detach,
            "backup": self._backup, "restore": self._backup,
        }
        if kw not in dispatch:
            raise ParseError(f"unknown statement keyword {t.text!r}")
        stmt = dispatch[kw]()
        self.eat_sym(";")
        if self.peek().type != T.EOF:
            raise ParseError(
                f"unexpected trailing input {self.peek().text!r} "
                "(only one statement is allowed)"
            )
        return stmt

    # --- queries (TDOP over set ops, mod.rs:243-276) ----------------------

    def parse_query(self, min_power: int = 0):
        left = self._query_body()
        while True:
            t = self.peek()
            if not (t.type == T.KWID and t.text.lower() in _UNION_POWER):
                return left
            power = _UNION_POWER[t.text.lower()]
            if power <= min_power:
                return left
            op_kw = t.text.lower()
            self.next()
            if op_kw == "union":
                # ALL|DISTINCT keyword required (mod.rs:258-264)
                if self.eat_kw("all"):
                    op = "union_all"
                elif self.eat_kw("distinct"):
                    op = "union_distinct"
                else:
                    raise ParseError("UNION requires ALL or DISTINCT")
            elif op_kw == "intersect":
                # [EXT] ALL = multiset semantics (ClickHouse/standard);
                # bare or explicit DISTINCT stays distinct per the
                # reference
                if self.eat_kw("all"):
                    op = "intersect_all"
                else:
                    self.eat_kw("distinct")
                    op = "intersect"
            else:
                if self.eat_kw("all"):
                    op = "except_all"
                else:
                    self.eat_kw("distinct")
                    op = "except"
            right = self.parse_query(power)
            left = A.SetOp(op, left, right)

    def _query_body(self) -> A.SelectCore:
        if self.at_sym("("):
            # parenthesized query
            self.next()
            q = self.parse_query()
            self.expect_sym(")")
            return q
        q = A.SelectCore()
        # [EXT] window-name refs are per query body: snapshot the
        # enclosing body's pending refs so a subquery's WINDOW clause
        # never captures (or errors on) the outer body's `OVER w`.
        outer_window_refs = self._window_refs
        self._window_refs = []
        # WITH (mod.rs:327-347); [EXT] WITH RECURSIVE
        if self.eat_kw("with"):
            recursive = self.eat_kw("recursive")
            while True:
                # standard CTE shape: ident AS ( SELECT ... ). Anything
                # else is the [EXT] ClickHouse scalar form
                # `WITH <expr> AS <name>` — a named expression macro.
                t0 = self.peek_at(0)
                t1 = self.peek_at(1)
                t2 = self.peek_at(2)
                t3 = self.peek_at(3)
                is_cte = (
                    t0.type in (T.KWID, T.DELIM_IDENT)
                    and t1.type == T.KWID
                    and t1.text.lower() == "as"
                    and t2.type == T.SYM
                    and t2.text == "("
                    and t3.type == T.KWID
                    and t3.text.lower() in ("select", "with")
                )
                if is_cte:
                    name = self.ident()
                    self.expect_kw("as")
                    self.expect_sym("(")
                    sub = self.parse_query()
                    self.expect_sym(")")
                    q.ctes.append(A.Cte(name, sub, recursive))
                else:
                    e = self.parse_expr()
                    self.expect_kw("as")
                    q.expr_aliases.append((self.ident(), e))
                if not self.eat_sym(","):
                    break
        self.expect_kw("select")
        # DISTINCT [ON (cols)] (mod.rs:349-360)
        if self.eat_kw("distinct"):
            if self.eat_kw("on"):
                self.expect_sym("(")
                q.distinct_on = self._expr_list(")")
            else:
                q.distinct = True
        # projection (mod.rs:571-585)
        while True:
            q.columns.append(self._select_item())
            if not self.eat_sym(","):
                break
        # FROM (mod.rs:362-374)
        if self.eat_kw("from"):
            q.from_ = self._from_source()
            # JOINs chain left-deep (mod.rs:303-306, 376-431);
            # [EXT] ARRAY JOIN interleaves (the reference's own TODO,
            # ast/query.rs:27-28)
            while True:
                aj = self._try_array_join()
                if aj is not None:
                    q.joins.append(aj)
                    continue
                if self.eat_sym(","):
                    # [EXT] comma join (FROM a, b WHERE ...): lowered
                    # as a cross join; Catalyst rewrites it to a hash
                    # join once WHERE supplies the equality
                    src, alias = self._table_like()
                    q.joins.append(A.Join("cross", src, alias))
                    continue
                j = self._try_join()
                if j is None:
                    break
                q.joins.append(j)
        # [EXT] PREWHERE (ClickHouse pre-filter, ahead of WHERE)
        if self.eat_kw("prewhere"):
            q.prewhere = self.parse_expr()
        if self.eat_kw("where"):
            q.where = self.parse_expr()
        if self.eat_kw("group"):
            self.expect_kw("by")
            # [EXT] GROUP BY GROUPING SETS ((a,b), (a), ())
            t2 = self.tokens[self.pos + 1] if self.at_kw("grouping") else None
            if t2 is not None and t2.type == T.KWID and t2.text.lower() == "sets":
                self.next()
                self.next()
                self._grouping_sets(q)
            elif self._bare_all_ahead():
                # [EXT] GROUP BY ALL — the modifier wins over a column
                # named `all` (ClickHouse precedence); expansion to the
                # non-aggregate select expressions happens at lowering
                self.next()
                q.group_all = True
            elif (
                self.at_kw("rollup") or self.at_kw("cube")
            ) and self.peek_at(1).text == "(":
                # [EXT] ANSI spelling GROUP BY ROLLUP (a, b) /
                # CUBE (a, b) — same AST as the ClickHouse
                # `GROUP BY a, b WITH ROLLUP/CUBE` form
                q.group_modifier = self.next().text.lower()
                self.expect_sym("(")
                while True:
                    q.group_by.append(self.parse_expr())
                    if not self.eat_sym(","):
                        break
                self.expect_sym(")")
            else:
                while True:
                    q.group_by.append(self.parse_expr())
                    if not self.eat_sym(","):
                        break
                # [EXT] WITH ROLLUP / WITH CUBE / WITH TOTALS (subtotal /
                # grand-total grouping sets)
                if self.at_kw("with"):
                    t2 = self.tokens[self.pos + 1]
                    if t2.type == T.KWID and t2.text.lower() in (
                        "rollup", "cube", "totals"
                    ):
                        self.next()
                        q.group_modifier = self.next().text.lower()
        if self.eat_kw("having"):
            q.having = self.parse_expr()
        # [EXT] QUALIFY (window-result filter)
        if self.eat_kw("qualify"):
            q.qualify = self.parse_expr()
        # [EXT] named WINDOW clause: `WINDOW w AS (spec) [, ...]`.
        # References (`OVER w`) parse earlier in the select list, so
        # they are collected unresolved and patched here.
        if self.eat_kw("window"):
            while True:
                name = self.ident()
                self.expect_kw("as")
                spec = self._window_over(None)
                q.windows.append((name, spec))
                if not self.eat_sym(","):
                    break
        if self.eat_kw("order"):
            self.expect_kw("by")
            if self._bare_all_ahead():
                # [EXT] ORDER BY ALL [ASC|DESC] [NULLS ...] — every
                # select item left-to-right, expanded to positional
                # ordinals (resolved by _resolve_positional in the
                # lowerer, same machinery as ORDER BY 1, 2)
                self.next()
                a_asc = not self.eat_kw("desc")
                if a_asc:
                    self.eat_kw("asc")
                a_nulls = None
                if self.eat_kw("nulls"):
                    if self.eat_kw("first"):
                        a_nulls = "first"
                    else:
                        self.expect_kw("last")
                        a_nulls = "last"
                if any(
                    isinstance(c[0], A.Wildcard)
                    or (
                        isinstance(c[0], A.FnCall)
                        and c[0].name.lower() == "columns"
                    )
                    for c in q.columns
                ):
                    # wildcards and COLUMNS()/APPLY carriers expand at
                    # lowering, so parse-time ordinals can't address
                    # the final column list
                    raise ParseError(
                        "ORDER BY ALL requires an explicit select list "
                        "(no * or COLUMNS() items)"
                    )
                for i in range(len(q.columns)):
                    q.order_by.append(
                        A.OrderItem(A.Lit(i + 1, "int"), a_asc, None, a_nulls)
                    )
            else:
                while True:
                    e = self.parse_expr()
                    asc = True
                    if self.eat_kw("desc"):
                        asc = False
                    else:
                        self.eat_kw("asc")  # default; accepted+ignored
                    # [EXT] NULLS FIRST / NULLS LAST
                    nulls = None
                    if self.eat_kw("nulls"):
                        if self.eat_kw("first"):
                            nulls = "first"
                        else:
                            self.expect_kw("last")
                            nulls = "last"
                    # [EXT] WITH FILL [FROM a] [TO b] [STEP s]
                    # (TO exclusive)
                    fill = None
                    if self.at_kw("with"):
                        t2 = self.tokens[self.pos + 1]
                        if t2.type == T.KWID and t2.text.lower() == "fill":
                            self.next()
                            self.next()
                            f_from = (
                                self.parse_expr()
                                if self.eat_kw("from") else None
                            )
                            f_to = (
                                self.parse_expr()
                                if self.eat_kw("to") else None
                            )
                            f_step = (
                                self.parse_expr()
                                if self.eat_kw("step") else None
                            )
                            fill = (f_from, f_to, f_step)
                    q.order_by.append(A.OrderItem(e, asc, fill, nulls))
                    if not self.eat_sym(","):
                        break
            # [EXT] INTERPOLATE (col [AS expr], ...) — how WITH FILL
            # populates non-key columns of the generated rows
            if self.eat_kw("interpolate"):
                self.expect_sym("(")
                while True:
                    cname = self.ident()
                    iexpr = self.parse_expr() if self.eat_kw("as") else None
                    q.interpolate.append((cname, iexpr))
                    if not self.eat_sym(","):
                        break
                self.expect_sym(")")
        # [EXT] ANSI `OFFSET n ROW[S] [FETCH {FIRST|NEXT} m ROW[S]
        # {ONLY|WITH TIES}]` — sugar over the same Limit AST
        if self.at_kw("offset"):
            self.next()
            off = self.parse_expr()
            if not (self.eat_kw("rows") or self.eat_kw("row")):
                raise ParseError("OFFSET n must be followed by ROW[S]")
            if self.eat_kw("fetch"):
                q.limit = self._fetch_clause(off)
            else:
                # bare OFFSET: everything after the first n rows.
                # Spark requires limit + offset <= max int32, so the
                # synthetic limit is the remaining headroom (the
                # offset must be a literal for that arithmetic).
                if not (isinstance(off, A.Lit) and off.kind == "int"):
                    raise ParseError(
                        "bare OFFSET n ROWS requires an integer literal"
                    )
                cap = 2**31 - 1 - int(off.value)
                q.limit = A.Limit(A.Lit(cap, "int"), offset=off)
        elif self.at_kw("fetch"):
            self.next()
            q.limit = self._fetch_clause(None)
        elif self.eat_kw("limit"):
            q.limit = self._limit_clause()
            # [EXT] LIMIT [off,] n BY keys (ClickHouse per-group head);
            # a second plain LIMIT may follow for the combined result
            if self.eat_kw("by"):
                if q.limit.with_ties:
                    raise ParseError("LIMIT WITH TIES cannot take BY")
                keys = [self.parse_expr()]
                while self.eat_sym(","):
                    keys.append(self.parse_expr())
                q.limit_by = A.LimitBy(q.limit.n, q.limit.offset, keys)
                q.limit = None
                if self.eat_kw("limit"):
                    q.limit = self._limit_clause()
        # resolve at body end so ORDER BY window refs see the defs too
        self._resolve_window_refs(q)
        self._window_refs = outer_window_refs
        return q

    def _grouping_sets(self, q) -> None:
        """GROUPING SETS ((a,b), (a), ()) — fills q.group_by with the
        ordered union of members and q.group_sets with index lists."""
        self.expect_sym("(")
        sets: list[list] = []
        while True:
            if self.at_sym("("):
                self.next()
                if self.at_sym(")"):
                    self.next()
                    members: list = []
                else:
                    members = self._expr_list(")")
            else:
                members = [self.parse_expr()]  # bare single-expr set
            sets.append(members)
            if not self.eat_sym(","):
                break
        self.expect_sym(")")
        q.group_sets = []
        for members in sets:
            idxs: list[int] = []
            for m in members:
                for i, g in enumerate(q.group_by):
                    if g == m:
                        idxs.append(i)
                        break
                else:
                    idxs.append(len(q.group_by))
                    q.group_by.append(m)
            q.group_sets.append(idxs)

    def _resolve_window_refs(self, q) -> None:
        """Patch `OVER w` references collected while parsing this query
        body from the body's WINDOW clause definitions."""
        refs, self._window_refs = self._window_refs, []
        defs = {name: spec for name, spec in q.windows}
        for wc in refs:
            spec = defs.get(wc.ref)
            if spec is None:
                raise ParseError(f"unknown window name {wc.ref!r}")
            wc.partition_by = spec.partition_by
            wc.order_by = spec.order_by
            wc.frame = spec.frame

    def _select_item(self):
        if self.at_sym("*"):
            self.next()
            return (self._wildcard_modifiers(A.Wildcard()), None)
        e = self.parse_expr()
        if isinstance(e, A.Wildcard):
            # `t.*` came back from the expression parser — the same
            # EXCEPT/REPLACE modifiers apply to the qualified form
            return (self._wildcard_modifiers(e), None)
        if isinstance(e, A.Ident) and e.qualifier is None and self.at_sym("."):
            pass  # handled in prefix
        # [EXT] COLUMNS('re') APPLY(fn) [APPLY(fn2) ...] — the APPLY
        # chain rides on the COLUMNS call and expands at lowering
        if (
            isinstance(e, A.FnCall)
            and e.name.lower() == "columns"
            and self.at_kw("apply")
        ):
            applies = []
            while self.at_kw("apply"):
                nxt = self.peek_at(1)
                if not (nxt.type == T.SYM and nxt.text == "("):
                    break
                self.next()
                self.next()
                applies.append(self.ident())
                self.expect_sym(")")
            if applies:
                e.applies = applies
        alias = None
        if self.eat_kw("as"):
            alias = self.ident()
        elif self.peek().type == T.DELIM_IDENT:
            alias = self.ident()
        return (e, alias)

    def _wildcard_modifiers(self, wc: A.Wildcard) -> A.Wildcard:
        """[EXT] ClickHouse SELECT-list modifiers on a wildcard:
        `* EXCEPT (a, b)` and `* REPLACE (expr AS col, ...)`, in any
        order. EXCEPT is ambiguous with the set operator — it is taken
        as a modifier only when followed by `(` NOT opening a
        subquery, or by a bare column name (a set-op operand must
        start with SELECT/WITH/`(`, so `* EXCEPT SELECT ...` and
        `* EXCEPT (SELECT ...)` still parse as set operations; so do
        the explicit `EXCEPT ALL/DISTINCT` spellings)."""
        while True:
            if self.at_kw("except"):
                nxt = self.peek_at(1)
                if nxt.type == T.SYM and nxt.text == "(":
                    after = self.peek_at(2)
                    if after.type == T.KWID and after.text.lower() in (
                        "select", "with"
                    ):
                        break  # `* EXCEPT (SELECT ...)` — set operator
                    self.next()
                    self.next()
                    cols = [self.ident()]
                    while self.eat_sym(","):
                        cols.append(self.ident())
                    self.expect_sym(")")
                elif nxt.type == T.DELIM_IDENT or (
                    nxt.type == T.KWID
                    and nxt.text.lower()
                    not in ("select", "with", "all", "distinct")
                ):
                    self.next()
                    cols = [self.ident()]
                else:
                    break  # set operator
                wc.except_cols = (wc.except_cols or []) + cols
                continue
            if self.at_kw("replace"):
                nxt = self.peek_at(1)
                if not (nxt.type == T.SYM and nxt.text == "("):
                    break
                self.next()
                self.next()
                repls = []
                while True:
                    e = self.parse_expr()
                    self.expect_kw("as")
                    repls.append((e, self.ident()))
                    if not self.eat_sym(","):
                        break
                self.expect_sym(")")
                wc.replaces = (wc.replaces or []) + repls
                continue
            if self.at_kw("apply"):
                nxt = self.peek_at(1)
                if not (nxt.type == T.SYM and nxt.text == "("):
                    break
                self.next()
                self.next()
                wc.applies = (wc.applies or []) + [self.ident()]
                self.expect_sym(")")
                continue
            break
        return wc

    def _from_source(self) -> A.FromClause:
        src, alias = self._table_like()
        final = self.eat_kw("final")
        sample = None
        if self.eat_kw("sample"):
            t = self.peek()
            if t.type not in (T.FLOAT, T.INT):
                raise ParseError(
                    f"expected sample fraction, got {t.text!r}"
                )
            self.next()
            frac = float(t.text)
            if not 0.0 < frac <= 1.0:
                raise ParseError("sample fraction must be in (0, 1]")
            self.expect_kw("by")
            self.expect_sym("(")
            key = self.parse_expr()
            self.expect_sym(")")
            sample = (frac, key)
        return A.FromClause(src, alias, sample, final)

    def _table_like(self):
        if self.at_sym("("):
            self.next()
            if self.at_kw("values"):
                # [EXT] inline table: (VALUES (…), (…)) AS t(a, b)
                self.next()
                rows = []
                while True:
                    self.expect_sym("(")
                    row = self._expr_list(")")
                    if rows and len(row) != len(rows[0]):
                        raise ParseError(
                            "VALUES rows have conflicting arity"
                        )
                    rows.append(row)
                    if not self.eat_sym(","):
                        break
                self.expect_sym(")")
                alias = self._opt_alias()
                names = None
                if self.at_sym("("):
                    self.next()
                    names = [self.ident()]
                    while self.eat_sym(","):
                        names.append(self.ident())
                    self.expect_sym(")")
                    if len(names) != len(rows[0]):
                        raise ParseError(
                            "VALUES column list arity does not match rows"
                        )
                return A.ValuesTable(rows, names), alias
            sub = self.parse_query()
            self.expect_sym(")")
            alias = self._opt_alias()
            return sub, alias
        name = self.ident()
        if self.at_sym("("):
            # table function (DataSource::TableFn, mod.rs:546-562)
            self.next()
            args = [] if self.eat_sym(")") else self._expr_list(")")
            alias = self._opt_alias()
            return A.TableFn(name, args), alias
        alias = self._opt_alias()
        return A.TableRef(name), alias

    def _opt_alias(self) -> str | None:
        if self.eat_kw("as"):
            return self.ident()
        t = self.peek()
        if t.type == T.DELIM_IDENT:
            return self.ident()
        if t.type == T.KWID and t.text.lower() not in {
            "on", "using", "where", "group", "having", "order", "limit",
            "join", "inner", "left", "right", "full", "semi", "anti", "asof",
            "outer", "union", "intersect", "except", "as", "asc", "desc",
            "with", "ties", "offset", "set", "values", "from", "select",
            # [EXT] clause openers must not read as table aliases
            "array",  # ARRAY JOIN
            "sample",  # SAMPLE <frac> BY (key)
            "qualify",  # QUALIFY <window predicate>
            "prewhere",  # PREWHERE <pre-filter>
            "window",  # WINDOW w AS (spec)
            "into",  # INTO OUTFILE sink
            "settings",  # trailing SETTINGS k = v
            "final",  # FROM t FINAL (merged-state read)
            "cross",  # CROSS JOIN
            "interpolate",  # WITH FILL INTERPOLATE (...)
            "global",  # GLOBAL <join> (broadcast hint)
            "when",  # MERGE INTO … USING src WHEN MATCHED …
            "fetch",  # ANSI OFFSET/FETCH
        }:
            return self.ident()
        return None

    def _try_array_join(self):
        """[EXT] `[LEFT] ARRAY JOIN expr [AS alias][, ...]`. A bare
        column needs no alias (its name is replaced by the element,
        ClickHouse semantics); any other expression requires AS."""
        t = self.peek()
        left = False
        if t.type == T.KWID and t.text.lower() == "left":
            t2 = self.tokens[self.pos + 1]
            if not (t2.type == T.KWID and t2.text.lower() == "array"):
                return None
            self.next()
            left = True
        elif not (t.type == T.KWID and t.text.lower() == "array"):
            return None
        self.next()  # ARRAY
        self.expect_kw("join")
        items = []
        while True:
            e = self.parse_expr()
            if self.eat_kw("as"):
                alias = self.ident()
            elif isinstance(e, A.Ident) and e.qualifier is None:
                alias = e.name
            else:
                raise ParseError(
                    "ARRAY JOIN expression requires AS <alias>"
                )
            items.append((e, alias))
            if not self.eat_sym(","):
                break
        return A.ArrayJoin(items, left)

    _JOIN_KINDS = {"inner", "full", "left", "right"}

    def _try_join(self) -> A.Join | None:
        # [inner|left|right|full] [outer|semi|anti|asof] join — the asof
        # qualifier per the reference grammar comment (ast/query.rs:56-60)
        # and JoinType::AsOf (query.rs:110), which the reference parser
        # declares but never produces
        t = self.peek()
        glob = False
        if t.type == T.KWID and t.text.lower() == "global":
            # [EXT] ClickHouse GLOBAL <join>: on a cluster CH ships the
            # right side to every node — here, an explicit BROADCAST
            # hint on the right side of the join.
            self.next()
            glob = True
            t = self.peek()
        if not (
            t.type == T.KWID
            and t.text.lower() in (self._JOIN_KINDS | {"join", "asof", "cross"})
        ):
            if glob:
                raise ParseError("GLOBAL must be followed by a JOIN")
            return None
        kind = "inner"
        if self.eat_kw("cross"):
            # [EXT] explicit CROSS JOIN — no ON/USING allowed
            self.expect_kw("join")
            src, alias = self._table_like()
            return A.Join("cross", src, alias)
        if self.eat_kw("asof"):
            kind = "asof"
        elif not self.at_kw("join"):
            base = self.next().text.lower()
            if base == "inner":
                if self.eat_kw("asof"):
                    kind = "asof"
                elif self.eat_kw("any"):
                    # [EXT] ClickHouse ANY strictness (pick-one match)
                    kind = "inner_any"
                else:
                    kind = "inner"
            elif base == "full":
                self.eat_kw("outer")
                if self.at_kw("asof"):
                    raise ParseError("ASOF join supports INNER/LEFT only")
                kind = "full"
            elif base in ("left", "right"):
                if self.eat_kw("semi"):
                    kind = f"{base}_semi"
                elif self.eat_kw("anti"):
                    kind = f"{base}_anti"
                elif self.eat_kw("asof"):
                    if base == "right":
                        raise ParseError("ASOF join supports INNER/LEFT only")
                    kind = "left_asof"
                elif self.eat_kw("any"):
                    # [EXT] LEFT/RIGHT ANY JOIN (ClickHouse strictness)
                    kind = f"{base}_any"
                else:
                    self.eat_kw("outer")
                    kind = base
        self.expect_kw("join")
        src, alias = self._table_like()
        on = None
        using = None
        if self.eat_kw("on"):
            on = self.parse_expr()
        elif self.eat_kw("using"):
            self.expect_sym("(")
            using = []
            while True:
                using.append(self.ident())
                if not self.eat_sym(","):
                    break
            self.expect_sym(")")
        within = None
        if self.eat_kw("within"):
            # ASOF tolerance: match only right rows within the interval
            # BEFORE the left timestamp (the bounded as-of window)
            if kind not in ("asof", "left_asof"):
                raise ParseError("WITHIN is only valid on ASOF joins")
            self.expect_kw("interval")
            within = self._interval()
        out = A.Join(kind, src, alias, on, using, within)
        out.broadcast = glob
        return out

    def _fetch_clause(self, offset) -> A.Limit:
        """FETCH {FIRST|NEXT} m ROW[S] {ONLY | WITH TIES} — called with
        FETCH already consumed."""
        if not (self.eat_kw("first") or self.eat_kw("next")):
            raise ParseError("FETCH requires FIRST or NEXT")
        n = self.parse_expr()
        if not (self.eat_kw("rows") or self.eat_kw("row")):
            raise ParseError("FETCH m must be followed by ROW[S]")
        if self.eat_kw("only"):
            return A.Limit(n, offset=offset)
        if self.eat_kw("with"):
            self.expect_kw("ties")
            return A.Limit(n, offset=offset, with_ties=True)
        raise ParseError("FETCH requires ONLY or WITH TIES")

    def _limit_clause(self) -> A.Limit:
        first = self.parse_expr()
        if self.eat_sym(","):
            # LIMIT offset, n (MySQL-style, mod.rs:516-521); the
            # reference grammar allows WITH TIES after every LIMIT
            # form (mod.rs:513-543)
            n = self.parse_expr()
            return A.Limit(n, offset=first, with_ties=self._opt_with_ties())
        if self.eat_kw("offset"):
            off = self.parse_expr()
            return A.Limit(first, offset=off, with_ties=self._opt_with_ties())
        return A.Limit(first, with_ties=self._opt_with_ties())

    def _opt_with_ties(self) -> bool:
        if self.eat_kw("with"):
            self.expect_kw("ties")
            return True
        return False

    def _expr_list(self, closing: str) -> list:
        out = [self.parse_expr()]
        while self.eat_sym(","):
            out.append(self.parse_expr())
        self.expect_sym(closing)
        return out

    # --- expressions (TDOP, mod.rs:1209-1486) -----------------------------

    def parse_expr(self, min_power: int = P_TERM):
        left = self._prefix()
        while True:
            power = self._infix_power()
            if power <= min_power:
                return left
            left = self._infix(left, power)

    def _infix_power(self) -> int:
        t = self.peek()
        if t.type == T.SYM:
            if t.text == ".":
                return P_ACCESS  # tuple element access
            return _SYM_POWER.get(t.text, P_TERM)
        if t.type == T.KWID:
            return _KW_POWER.get(t.text.lower(), P_TERM)
        if t.type == T.FLOAT and t.text.startswith(".") and t.text[1:].isdigit():
            # `.1` after an expression tokenized as a float literal —
            # it is tuple element access
            return P_ACCESS
        return P_TERM

    def _prefix(self):
        t = self.next()
        if t.type == T.INT:
            return A.Lit(t.value, "int")
        if t.type == T.HEX:
            return A.Lit(t.value, "hex")
        if t.type == T.FLOAT:
            return A.Lit(t.value, "float")
        if t.type == T.STRING:
            return A.Lit(t.value, "string")
        if t.type == T.PARAM:
            return A.Param(t.value)
        if t.type == T.SYM:
            if t.text == "-":
                operand = self.parse_expr(P_MUL)  # unary minus binds tight
                if isinstance(operand, A.Lit) and operand.kind in ("int", "float", "hex"):
                    return A.Lit(-operand.value, operand.kind)
                return A.UnOp("neg", operand)
            if t.text == "+":
                return self.parse_expr(P_MUL)  # no-op (mod.rs:1270)
            if t.text == "~":
                return A.UnOp("bitnot", self.parse_expr(P_ACCESS - 1))
            if t.text == "(":
                return self._paren()
            if t.text == "[":
                if self.eat_sym("]"):
                    return A.ArrayLit([])
                return A.ArrayLit(self._expr_list("]"))
            if t.text == "{":
                return self._map_literal()
            if t.text == "*":
                return A.Wildcard()
            raise ParseError(f"unexpected symbol {t.text!r} in expression")
        if t.type == T.CONFIG:
            # [EXT] @name config identifiers usable in expressions —
            # resolved to their SET value at lowering time
            return A.ConfigIdent(t.text)
        if t.type in (T.KWID, T.DELIM_IDENT):
            return self._prefix_keyword_or_ident(t)
        raise ParseError(f"unexpected token {t.text!r} in expression")

    def _paren(self):
        if self.at_kw("select", "with"):
            q = self.parse_query()
            self.expect_sym(")")
            return A.ScalarSubquery(q)
        items = self._expr_list(")")
        if len(items) == 1:
            return items[0]
        return A.TupleLit(items)  # ≥2 → tuple literal (mod.rs:1229-1246)

    def _map_literal(self):
        entries = []
        if self.eat_sym("}"):
            return A.MapLit(entries)
        while True:
            k = self.parse_expr()
            self.expect_sym(":")
            v = self.parse_expr()
            entries.append((k, v))
            if not self.eat_sym(","):
                break
        self.expect_sym("}")
        return A.MapLit(entries)

    def _prefix_keyword_or_ident(self, t: T.Token):
        if t.type == T.KWID:
            kw = t.text.lower()
            if kw == "null":
                return A.Lit(None, "null")
            if kw == "true":
                return A.Lit(True, "bool")
            if kw == "false":
                return A.Lit(False, "bool")
            if kw == "not":
                return self._not_prefix()
            if kw == "case":
                return self._case()
            if kw == "if":
                # [EXT] function form if(cond, then, else) vs the
                # reference's IF … THEN … ELSE … END: backtrack-probe
                # the paren form for the 3-arg comma shape
                if self.at_sym("("):
                    save = self.pos
                    try:
                        self.next()
                        args = self._expr_list(")")
                        if len(args) == 3 and not self.at_kw("then"):
                            return A.FnCall("if", args)
                    except ParseError:
                        pass
                    self.pos = save
                return self._if_expr()
            if kw == "interval":
                return self._interval()
            if kw in ("date", "timestamp") and self.peek().type == T.STRING:
                # [EXT] typed literals DATE '...' / TIMESTAMP '...'
                lit = self.next()
                dt = A.DataType("date" if kw == "date" else "datetime", [])
                return A.Cast(A.Lit(lit.value, "string"), dt)
            if kw == "exists" and self.at_sym("("):
                self.next()
                q = self.parse_query()
                self.expect_sym(")")
                return A.Exists(q)
        # identifier / qualified / wildcard / function call
        name = t.text
        if self.at_sym("(") :
            self.next()
            call = self._fn_call(name)
            # [EXT] parametric aggregates: fn(params)(args) —
            # ClickHouse combinator syntax (topK(3)(x),
            # quantiles(0.25, 0.5)(x)). The first list is parameters,
            # the second the actual arguments.
            if (
                isinstance(call, A.FnCall)
                and call.params is None
                and self.at_sym("(")
            ):
                if not call.args:
                    raise ParseError(
                        "parametric call requires at least one parameter"
                    )
                self.next()
                inner = self._fn_call(name)
                inner.params = call.args
                call = inner
            # [EXT] window functions: fn(args) OVER (...) — not in the
            # reference grammar (SURVEY §2.6), engine extension
            if isinstance(call, A.FnCall) and self.at_kw("over"):
                self.next()
                call = self._window_over(call)
            return call
        if self.at_sym("."):
            self.next()
            if self.eat_sym("*"):
                return A.Wildcard(qualifier=name)
            field = self.ident()
            if self.at_sym("("):
                raise ParseError("qualified function calls are not in the dialect")
            return A.Ident(field, qualifier=name)
        return A.Ident(name)

    def _fn_call(self, name: str):
        """try_parse_fn_call_args (mod.rs:1534-1556): a lone subquery is
        allowed as the only argument — how EXISTS(SELECT…) parses."""
        if name.lower() in ("cast", "accuratecast"):
            # [EXT] CAST(expr AS Type) and CAST(expr, 'Type')
            e = self.parse_expr()
            if self.eat_kw("as"):
                dt = self._datatype()
            else:
                self.expect_sym(",")
                t = self.next()
                if t.type != T.STRING:
                    raise ParseError(
                        "CAST(expr, type) requires a string type literal"
                    )
                dt = Parser(t.value)._datatype()
            self.expect_sym(")")
            return A.Cast(e, dt)
        if name.lower() == "extract" and self._extract_unit_ahead():
            # [EXT] ANSI EXTRACT(unit FROM expr); the regex form
            # extract(s, 're') keeps the plain-call path below
            unit = self.next().text.lower()
            self.expect_kw("from")
            e = self.parse_expr()
            self.expect_sym(")")
            return A.FnCall(_EXTRACT_FNS[unit], [e])
        if self.eat_sym(")"):
            return A.FnCall(name, [])
        if self.at_kw("select", "with"):
            q = self.parse_query()
            self.expect_sym(")")
            return A.FnCall(name, [A.ScalarSubquery(q)])
        # [EXT] fn(DISTINCT args) — standard spelling of the distinct
        # aggregates (count/sum)
        distinct = self.eat_kw("distinct")
        if self.at_sym("*"):
            # count(*)
            self.next()
            self.expect_sym(")")
            return A.FnCall(name, [A.Wildcard()])
        args = []
        while True:
            args.append(self._arg_or_lambda())
            if self.eat_sym(","):
                continue
            self.expect_sym(")")
            break
        return A.FnCall(name, args, distinct=distinct)

    def _extract_unit_ahead(self) -> bool:
        t0, t1 = self.peek_at(0), self.peek_at(1)
        return (
            t0.type == T.KWID
            and t0.text.lower() in _EXTRACT_FNS
            and t1.type == T.KWID
            and t1.text.lower() == "from"
        )

    def _arg_or_lambda(self):
        """[EXT] a function argument may be a lambda: `x -> body` or
        `(a, b) -> body` (higher-order array functions). Plain
        expressions are unaffected — the arrow is detected by
        lookahead before any token is consumed."""
        t = self.peek()
        if (
            t.type == T.KWID
            and self.tokens[self.pos + 1].type == T.SYM
            and self.tokens[self.pos + 1].text == "->"
        ):
            name = self.ident()
            self.next()  # ->
            return A.Lambda([name], self.parse_expr())
        if t.type == T.SYM and t.text == "(":
            j = self.pos + 1
            params = []
            ok = False
            while True:
                tj = self.tokens[j]
                if tj.type != T.KWID:
                    break
                params.append(tj.text)
                j += 1
                tj = self.tokens[j]
                if tj.type == T.SYM and tj.text == ",":
                    j += 1
                    continue
                if tj.type == T.SYM and tj.text == ")":
                    t2 = self.tokens[j + 1]
                    ok = t2.type == T.SYM and t2.text == "->"
                    break
                break
            if ok and params:
                self.pos = j + 2  # past ') ->'
                return A.Lambda(params, self.parse_expr())
        return self.parse_expr()

    def _window_over(self, call):
        """OVER (PARTITION BY ... ORDER BY ... [ROWS frame]) or
        `OVER w` naming a WINDOW-clause definition — clause order
        fixed; RANGE frames are not in the extension (RANGE defaults
        differ across engines when the order key has duplicates; the
        engine default frame is used instead)."""
        if not self.at_sym("("):
            # `OVER w` — collect unresolved; _resolve_window_refs
            # patches in the definition at the end of the query body
            wc = A.WindowCall(call, [], [], None, ref=self.ident())
            self._window_refs.append(wc)
            return wc
        self.expect_sym("(")
        partition: list = []
        order: list = []
        frame = None
        if self.eat_kw("partition"):
            self.expect_kw("by")
            while True:
                partition.append(self.parse_expr())
                if not self.eat_sym(","):
                    break
        if self.eat_kw("order"):
            self.expect_kw("by")
            while True:
                e = self.parse_expr()
                asc = True
                if self.eat_kw("desc"):
                    asc = False
                else:
                    self.eat_kw("asc")
                order.append(A.OrderItem(e, asc))
                if not self.eat_sym(","):
                    break
        if self.eat_kw("range"):
            # [EXT] RANGE frames are allowed ONLY with explicit bounds
            # over one numeric sort key: value-offset frames include
            # peer rows symmetrically on every engine, so they are
            # deterministic where the bare-RANGE *default* frame (the
            # original reason for rejection) is not.
            if not self.eat_kw("between"):
                raise ParseError(
                    "RANGE requires explicit BETWEEN bounds"
                )
            lo = self._frame_bound()
            self.expect_kw("and")
            hi = self._frame_bound()
            frame = ("range", lo, hi)
            self.expect_sym(")")
            return A.WindowCall(call, partition, order, frame)
        if self.eat_kw("rows"):
            if self.eat_kw("between"):
                lo = self._frame_bound()
                self.expect_kw("and")
                hi = self._frame_bound()
            else:
                lo = self._frame_bound()
                hi = ("cur", None)
            frame = ("rows", lo, hi)
        self.expect_sym(")")
        return A.WindowCall(call, partition, order, frame)

    def _frame_bound(self):
        if self.eat_kw("unbounded"):
            if self.eat_kw("preceding"):
                return ("up", None)
            self.expect_kw("following")
            return ("uf", None)
        if self.eat_kw("current"):
            self.expect_kw("row")
            return ("cur", None)
        if self.eat_kw("interval"):
            # [EXT] time-offset RANGE bounds over a timestamp sort key
            iv = self._interval()
            if self.eat_kw("preceding"):
                return ("pre", iv)
            self.expect_kw("following")
            return ("fol", iv)
        t = self.peek()
        if t.type == T.INT:
            self.next()
            n = int(t.text)
            if self.eat_kw("preceding"):
                return ("pre", n)
            self.expect_kw("following")
            return ("fol", n)
        raise ParseError(
            f"expected frame bound, got {t.text!r}"
        )

    def _not_prefix(self):
        # NOT IN / NOT LIKE / NOT ILIKE / NOT BETWEEN / NOT EXISTS
        # (mod.rs:1404-1424)
        if self.at_kw("exists"):
            self.next()
            self.expect_sym("(")
            q = self.parse_query()
            self.expect_sym(")")
            return A.Exists(q, negated=True)
        operand = self.parse_expr(P_NOT)
        return self._fold_not(operand)

    def _case(self):
        scrutinee = None
        if not self.at_kw("when"):
            scrutinee = self.parse_expr()
        whens = []
        while self.eat_kw("when"):
            cond = self.parse_expr()
            self.expect_kw("then")
            res = self.parse_expr()
            whens.append((cond, res))
        if not whens:
            raise ParseError("CASE requires at least one WHEN")
        else_ = None
        if self.eat_kw("else"):
            else_ = self.parse_expr()
        self.expect_kw("end")
        return A.Case(scrutinee, whens, else_)

    def _if_expr(self):
        # IF a THEN b ELSE c END (mod.rs:1570-1582)
        cond = self.parse_expr()
        self.expect_kw("then")
        then = self.parse_expr()
        self.expect_kw("else")
        else_ = self.parse_expr()
        self.expect_kw("end")
        return A.Case(None, [(cond, then)], else_)

    def _interval(self):
        t = self.next()
        if t.type != T.INT:
            raise ParseError("INTERVAL count must be an integer literal")
        unit_t = self.next()
        unit = unit_t.text.lower() if unit_t.type == T.KWID else ""
        if unit not in _INTERVAL_UNITS:
            raise ParseError(f"invalid interval unit {unit_t.text!r}")
        return A.Interval(t.value, unit)

    def _infix(self, left, power: int):
        t = self.next()
        if (
            t.type == T.FLOAT
            and t.text.startswith(".")
            and t.text[1:].isdigit()
        ):
            return A.TupleAccess(left, int(t.text[1:]))
        if t.type == T.SYM:
            sym = t.text
            if sym == "[":
                idx = self.parse_expr()
                self.expect_sym("]")
                return A.IndexAccess(left, idx)
            if sym == "::":
                # [EXT] postfix cast operator
                return A.Cast(left, self._datatype())
            if sym == ".":
                # [EXT] tuple/struct element access on a non-identifier
                # primary: (t).1 or (t).field — clause keywords are NOT
                # field names (`(x). from t` must fail loudly, not eat
                # the FROM)
                nt = self.next()
                if nt.type == T.INT:
                    return A.TupleAccess(left, int(nt.text))
                if nt.type == T.DELIM_IDENT or (
                    nt.type == T.KWID
                    and nt.text.lower() not in _CLAUSE_KEYWORDS
                ):
                    return A.TupleAccess(left, nt.text)
                raise ParseError(
                    "tuple access needs an element number or field name"
                )
            if (
                sym in ("=", "!=", "<", "<=", ">", ">=")
                and self.at_kw("any", "all", "some")
                and self.peek_at(1).type == T.SYM
                and self.peek_at(1).text == "("
            ):
                # [EXT] quantified comparison: expr <op> ANY|ALL (SELECT …)
                quant = "any" if self.peek().text.lower() in ("any", "some") else "all"
                self.next()
                self.next()  # (
                if not self.at_kw("select", "with"):
                    raise ParseError("ANY/ALL requires a subquery")
                q = self.parse_query()
                self.expect_sym(")")
                return A.QuantCompare(sym, left, quant, q)
            right = self.parse_expr(power)
            if sym in ("=", "!="):
                return self._fold_eq(sym, left, right)
            return A.BinOp(sym, left, right)
        kw = t.text.lower()
        if kw in ("and", "or", "xor"):
            right = self.parse_expr(power)
            return self._fold_logical(kw, left, right)
        if kw == "is":
            negated = self.eat_kw("not")
            if self.eat_kw("distinct"):
                # [EXT] IS [NOT] DISTINCT FROM — null-safe comparison
                self.expect_kw("from")
                right = self.parse_expr(P_CMP)
                op = "is_not_distinct" if negated else "is_distinct"
                return A.BinOp(op, left, right)
            self.expect_kw("null")
            return self._fold_is_null(left, negated)
        if kw == "in":
            return self._in_rhs(left, negated=False)
        if kw == "global":
            # [EXT] GLOBAL IN / GLOBAL NOT IN (ClickHouse). The GLOBAL
            # keyword controls distributed-subquery shipping in CH; on
            # Spark the broadcast-vs-shuffle decision is Catalyst's, so
            # it is accepted for dialect parity and lowers identically
            # to plain IN.
            negated = self.eat_kw("not")
            self.expect_kw("in")
            return self._in_rhs(left, negated=negated)
        if kw in ("like", "ilike"):
            right = self.parse_expr(power)
            return A.BinOp(kw, left, right)
        if kw == "between":
            low = self.parse_expr(P_BETWEEN)
            self.expect_kw("and")
            high = self.parse_expr(P_BETWEEN)
            return A.Between(left, low, high)
        if kw == "not":
            if self.eat_kw("in"):
                return self._in_rhs(left, negated=True)
            if self.eat_kw("like"):
                return A.UnOp("not", A.BinOp("like", left, self.parse_expr(P_CMP)))
            if self.eat_kw("ilike"):
                return A.UnOp("not", A.BinOp("ilike", left, self.parse_expr(P_CMP)))
            if self.eat_kw("between"):
                low = self.parse_expr(P_BETWEEN)
                self.expect_kw("and")
                high = self.parse_expr(P_BETWEEN)
                return A.Between(left, low, high, negated=True)
            raise ParseError("infix NOT must be NOT IN/LIKE/ILIKE/BETWEEN")
        raise ParseError(f"unexpected infix token {t.text!r}")

    def _in_rhs(self, left, *, negated: bool):
        self.expect_sym("(")
        if self.at_kw("select", "with"):
            q = self.parse_query()
            self.expect_sym(")")
            return A.InSubquery(left, q, negated)
        items = self._expr_list(")")
        return A.InList(left, items, negated)

    # --- parse-time constant folds (simplify.rs) --------------------------

    @staticmethod
    def _is_bool_lit(e) -> bool:
        return isinstance(e, A.Lit) and e.kind == "bool"

    def _fold_eq(self, sym, left, right):
        if isinstance(left, A.Lit) and isinstance(right, A.Lit):
            if left.kind != "null" and right.kind != "null":
                eq = left.value == right.value
                return A.Lit(eq if sym == "=" else not eq, "bool")
        return A.BinOp(sym, left, right)

    def _fold_logical(self, kw, left, right):
        for a, b in ((left, right), (right, left)):
            if self._is_bool_lit(a):
                v = a.value
                if kw == "and":
                    return b if v else A.Lit(False, "bool")
                if kw == "or":
                    return A.Lit(True, "bool") if v else b
                if kw == "xor":
                    return self._fold_not(b) if v else b
        return A.BinOp(kw, left, right)

    def _fold_not(self, operand):
        if self._is_bool_lit(operand):
            return A.Lit(not operand.value, "bool")
        if isinstance(operand, A.UnOp) and operand.op == "not":
            return operand.operand
        return A.UnOp("not", operand)

    def _fold_is_null(self, left, negated: bool):
        if isinstance(left, A.Lit):
            is_null = left.kind == "null"
            return A.Lit(is_null != negated, "bool")
        return A.UnOp("isnotnull" if negated else "isnull", left)

    # --- statements -------------------------------------------------------

    def _select_stmt(self):
        q = self.parse_query()
        outfile = None
        # [EXT] INTO OUTFILE '<path>' [FORMAT fmt] — write sink
        if self.eat_kw("into"):
            self.expect_kw("outfile")
            pe = self.parse_expr()
            if not (isinstance(pe, A.Lit) and pe.kind == "string"):
                raise ParseError(
                    "INTO OUTFILE requires a string literal path"
                )
            fmt = "parquet"
            if self.eat_kw("format"):
                fmt = self.ident().lower()
            outfile = (pe.value, fmt)
        # [EXT] trailing SETTINGS name = lit [, ...]
        settings: list = []
        if self.eat_kw("settings"):
            while True:
                name = self.ident()
                self.expect_sym("=")
                v = self.parse_expr()
                if not isinstance(v, A.Lit):
                    raise ParseError("SETTINGS values must be literals")
                settings.append((name, v.value))
                if not self.eat_sym(","):
                    break
        return A.SelectStmt(q, outfile, settings)

    def _show(self):
        """[EXT] SHOW TABLES / VIEWS / DATABASE — catalog listing."""
        self.expect_kw("show")
        if self.eat_kw("create"):
            # [EXT] SHOW CREATE TABLE <name> — reconstructed DDL
            self.eat_kw("table") or self.eat_kw("view")
            return A.ShowStmt("create", self.ident())
        for kw, entity in (
            ("tables", "table"), ("views", "view"), ("database", "database"),
        ):
            if self.eat_kw(kw):
                return A.ShowStmt(entity)
        raise ParseError("SHOW supports TABLES, VIEWS, DATABASE, CREATE")

    def _explain(self):
        self.expect_kw("explain")
        # [EXT] EXPLAIN FORMATTED / EXPLAIN ANALYZE
        mode = "simple"
        if self.eat_kw("formatted"):
            mode = "formatted"
        elif self.eat_kw("analyze"):
            mode = "analyze"
        elif self.eat_kw("ast"):
            # [EXT] EXPLAIN AST (ClickHouse): the parsed tree itself
            mode = "ast"
        elif self.eat_kw("estimate"):
            # [EXT] EXPLAIN ESTIMATE (ClickHouse): Catalyst's size/row
            # statistics for the optimized plan
            mode = "estimate"
        elif self.eat_kw("syntax"):
            # [EXT] EXPLAIN SYNTAX (ClickHouse): the query printed
            # back from the parsed tree
            mode = "syntax"
        elif self.eat_kw("pipeline"):
            # [EXT] EXPLAIN PIPELINE (ClickHouse): the physical
            # execution pipeline — Spark's executed plan, unrun
            mode = "pipeline"
        else:
            self.eat_kw("plan")  # EXPLAIN PLAN = the default mode
        if self.at_kw("merge"):
            # [EXT] EXPLAIN SYNTAX/AST over MERGE INTO — the mutation
            # statement prints/walks like a query; the executing modes
            # stay query-only (a MERGE has no result plan to show)
            if mode not in ("syntax", "ast"):
                raise ParseError(
                    "EXPLAIN over MERGE supports SYNTAX and AST only"
                )
            return A.ExplainStmt(self._merge(), mode)
        return A.ExplainStmt(self.parse_query(), mode)

    def _insert(self):
        self.expect_kw("insert")
        self.expect_kw("into")
        table = self.ident()
        columns = None
        if self.at_sym("("):
            self.next()
            columns = []
            while True:
                columns.append(self.ident())
                if not self.eat_sym(","):
                    break
            self.expect_sym(")")
        if self.eat_kw("values"):
            rows = []
            while True:
                self.expect_sym("(")
                row = self._expr_list(")")
                if rows and len(row) != len(rows[0]):
                    raise ParseError(
                        "INSERT rows have conflicting arity "
                        f"({len(row)} vs {len(rows[0])})"
                    )
                rows.append(row)
                if not self.eat_sym(","):
                    break
            if columns is not None and rows and len(rows[0]) != len(columns):
                raise ParseError("INSERT row arity does not match column list")
            return A.InsertStmt(table, columns, ("values", rows))
        if self.eat_kw("from"):
            name = self.ident()
            self.expect_sym("(")
            args = [] if self.eat_sym(")") else self._expr_list(")")
            return A.InsertStmt(table, columns, ("fn", A.TableFn(name, args)))
        if self.at_kw("select", "with"):
            return A.InsertStmt(table, columns, ("query", self.parse_query()))
        raise ParseError("INSERT requires VALUES, FROM fn(...), or SELECT")

    # --- CREATE -----------------------------------------------------------

    def _create(self):
        self.expect_kw("create")
        # [EXT] CREATE OR REPLACE TABLE/VIEW
        or_replace = False
        if self.eat_kw("or"):
            self.expect_kw("replace")
            or_replace = True
        if self.eat_kw("table"):
            d = self._table_definition()
            d.or_replace = or_replace
            if or_replace and d.if_not_exists:
                raise ParseError(
                    "OR REPLACE and IF NOT EXISTS are mutually exclusive"
                )
            return A.CreateTableStmt(d)
        if self.eat_kw("view"):
            v = self._view_definition()
            v.or_replace = or_replace
            if or_replace and v.if_not_exists:
                raise ParseError(
                    "OR REPLACE and IF NOT EXISTS are mutually exclusive"
                )
            return A.CreateViewStmt(v)
        raise ParseError("CREATE supports TABLE and VIEW")

    def _delete(self):
        # [EXT] DELETE FROM t WHERE cond — ClickHouse lightweight
        # delete; sugar for the ALTER TABLE t DELETE WHERE mutation
        self.expect_kw("delete")
        self.expect_kw("from")
        table = self.ident()
        self.expect_kw("where")
        return A.AlterStmt(table, "delete", self.parse_expr())

    def _merge(self):
        # [EXT] ANSI MERGE INTO — the warehouse upsert statement:
        # MERGE INTO t [AS a] USING (subquery)|tbl [AS s] ON cond
        #   WHEN MATCHED [AND c] THEN UPDATE SET col = e, … | DELETE
        #   WHEN NOT MATCHED [AND c] THEN INSERT [(cols)] VALUES (…)
        # Clauses apply in order (first matching WHEN per row wins);
        # a target row matching multiple source rows is an error.
        self.expect_kw("merge")
        self.expect_kw("into")
        table = self.ident()
        talias = self._opt_alias()
        self.expect_kw("using")
        if self.at_sym("("):
            self.next()
            source: object = self.parse_query()
            self.expect_sym(")")
        else:
            source = self.ident()
        salias = self._opt_alias()
        self.expect_kw("on")
        on = self.parse_expr()
        matched: list = []
        not_matched: list = []
        by_source_clauses: list = []
        while self.eat_kw("when"):
            if self.eat_kw("matched"):
                cond = self.parse_expr() if self.eat_kw("and") else None
                self.expect_kw("then")
                if self.eat_kw("update"):
                    self.expect_kw("set")
                    assignments: list = []
                    while True:
                        col = self.ident()
                        self.expect_sym("=")
                        assignments.append((col, self.parse_expr()))
                        if not self.eat_sym(","):
                            break
                    matched.append((cond, ("update", assignments)))
                elif self.eat_kw("delete"):
                    matched.append((cond, ("delete",)))
                else:
                    raise ParseError(
                        "WHEN MATCHED THEN expects UPDATE SET or DELETE"
                    )
            elif self.eat_kw("not"):
                self.expect_kw("matched")
                by_source = False
                if self.eat_kw("by"):
                    if self.eat_kw("source"):
                        by_source = True
                    elif not self.eat_kw("target"):
                        raise ParseError(
                            "NOT MATCHED BY expects SOURCE or TARGET"
                        )
                cond = self.parse_expr() if self.eat_kw("and") else None
                self.expect_kw("then")
                if by_source:
                    # [EXT] Delta/T-SQL full-sync form: act on TARGET
                    # rows no source row matched (stale rows)
                    if self.eat_kw("update"):
                        self.expect_kw("set")
                        assignments = []
                        while True:
                            col = self.ident()
                            self.expect_sym("=")
                            assignments.append((col, self.parse_expr()))
                            if not self.eat_sym(","):
                                break
                        by_source_clauses.append(
                            (cond, ("update", assignments))
                        )
                    elif self.eat_kw("delete"):
                        by_source_clauses.append((cond, ("delete",)))
                    else:
                        raise ParseError(
                            "WHEN NOT MATCHED BY SOURCE THEN expects "
                            "UPDATE SET or DELETE"
                        )
                    continue
                self.expect_kw("insert")
                cols = None
                if self.at_sym("("):
                    self.next()
                    cols = [self.ident()]
                    while self.eat_sym(","):
                        cols.append(self.ident())
                    self.expect_sym(")")
                self.expect_kw("values")
                self.expect_sym("(")
                exprs = self._expr_list(")")
                if cols is not None and len(cols) != len(exprs):
                    raise ParseError(
                        "MERGE INSERT column list arity does not match "
                        "VALUES"
                    )
                not_matched.append((cond, cols, exprs))
            else:
                raise ParseError("WHEN expects MATCHED or NOT MATCHED")
        if not matched and not not_matched and not by_source_clauses:
            raise ParseError("MERGE requires at least one WHEN clause")
        return A.MergeStmt(
            table, talias, source, salias, on, matched, not_matched,
            by_source_clauses,
        )

    def _update(self):
        # [EXT] UPDATE t SET c = e[, ...] WHERE cond — statement sugar
        # for the ALTER TABLE t UPDATE mutation (WHERE stays mandatory)
        self.expect_kw("update")
        table = self.ident()
        self.expect_kw("set")
        assignments: list = []
        while True:
            col = self.ident()
            self.expect_sym("=")
            assignments.append((col, self.parse_expr()))
            if not self.eat_sym(","):
                break
        self.expect_kw("where")
        return A.AlterStmt(table, "update", (assignments, self.parse_expr()))

    def _exchange(self):
        # [EXT] EXCHANGE TABLES a AND b — ClickHouse's atomic swap
        self.expect_kw("exchange")
        self.expect_kw("tables")
        a = self.ident()
        self.expect_kw("and")
        return A.ExchangeStmt(a, self.ident())

    def _detach(self):
        # [EXT] DETACH TABLE t / ATTACH TABLE t (CH visibility toggle)
        kw = self.next().text.lower()
        self.expect_kw("table")
        return A.DetachStmt(self.ident(), attach=(kw == "attach"))

    def _backup(self):
        # [EXT] BACKUP TABLE t TO '<dir>' / RESTORE TABLE t FROM '<dir>'
        kw = self.next().text.lower()
        restore = kw == "restore"
        self.expect_kw("table")
        name = self.ident()
        self.expect_kw("from" if restore else "to")
        pe = self.parse_expr()
        if not (isinstance(pe, A.Lit) and pe.kind == "string"):
            raise ParseError(
                f"{kw.upper()} requires a string literal directory"
            )
        return A.BackupStmt(name, pe.value, restore=restore)

    def _rename(self):
        # [EXT] RENAME TABLE a TO b[, c TO d ...]
        self.expect_kw("rename")
        self.expect_kw("table")
        pairs = []
        while True:
            old = self.ident()
            self.expect_kw("to")
            pairs.append((old, self.ident()))
            if not self.eat_sym(","):
                break
        return A.RenameStmt(pairs)

    def _if_not_exists(self) -> bool:
        if self.eat_kw("if"):
            self.expect_kw("not")
            self.expect_kw("exists")
            return True
        return False

    def _table_definition(self) -> A.TableDefinition:
        ine = self._if_not_exists()
        name = self.ident()
        d = A.TableDefinition(name, [], if_not_exists=ine)
        if not self.at_sym("("):
            # [EXT] CTAS: CREATE TABLE name [ENGINE [=] e] [attrs]
            # AS <query> — schema derived from the query
            if self.eat_kw("engine"):
                self.eat_sym("=")
                d.engine = self.ident()
            self._table_attrs(d)
            self.expect_kw("as")
            d.as_query = self.parse_query()
            return d
        self.expect_sym("(")
        while True:
            if self.at_kw("index"):
                self.next()
                iname = self.ident()
                fname = self.ident()
                self.expect_sym("(")
                args = [] if self.eat_sym(")") else self._expr_list(")")
                d.indexes.append(A.IndexDef(iname, A.FnCall(fname, args)))
            elif self.at_kw("constraint"):
                self.next()
                cname = self.ident()
                self.expect_kw("check")
                d.constraints.append(A.ConstraintDef(cname, self.parse_expr()))
            else:
                d.columns.append(self._column_def())
            if not self.eat_sym(","):
                break
        self.expect_sym(")")
        self._table_attrs(d)
        return d

    def _column_def(self) -> A.ColumnDef:
        name = self.ident()
        dtype = self._datatype()
        col = A.ColumnDef(name, dtype)
        while True:
            if self.eat_kw("default"):
                col.default = self.parse_expr()
            elif self.eat_kw("comment"):
                t = self.next()
                if t.type != T.STRING:
                    raise ParseError("COMMENT requires a string literal")
                col.comment = t.value
            else:
                break
        return col

    def _table_attrs(self, d) -> None:
        # unordered trailing attributes with duplicate detection
        # (mod.rs:747-802)
        while True:
            if self.eat_kw("primary"):
                self.expect_kw("key")
                if d.primary_key is not None:
                    raise ParseError("duplicate PRIMARY KEY")
                d.primary_key = self._name_list()
            elif self.eat_kw("order"):
                self.expect_kw("by")
                if d.order_by is not None:
                    raise ParseError("duplicate ORDER BY")
                d.order_by = self._name_list()
            elif self.eat_kw("partition"):
                self.expect_kw("by")
                if d.partition_by is not None:
                    raise ParseError("duplicate PARTITION BY")
                d.partition_by = self.parse_expr()
            elif hasattr(d, "comment") and self.at_kw("comment"):
                self.next()
                t = self.next()
                if t.type != T.STRING:
                    raise ParseError("COMMENT requires a string literal")
                if d.comment is not None:
                    raise ParseError("duplicate COMMENT")
                d.comment = t.value
            else:
                return

    def _name_list(self) -> list[str]:
        if self.eat_sym("("):
            out = []
            while True:
                out.append(self.ident())
                if not self.eat_sym(","):
                    break
            self.expect_sym(")")
            return out
        return [self.ident()]

    def _view_definition(self) -> A.ViewDefinition:
        ine = self._if_not_exists()
        name = self.ident()
        # UPDATE BY <strategy> is NON-optional in the reference
        # grammar (mod.rs:823-833,902); [EXT] omitting it creates a
        # PLAIN (non-materialized) view — the stored query lowers
        # fresh on every read.
        if self.eat_kw("update"):
            self.expect_kw("by")
            strategy = self.ident()
        else:
            strategy = "plain"
        v = A.ViewDefinition(name, strategy, if_not_exists=ine)
        # trailing attrs (no COMMENT on views in the grammar)
        while True:
            if self.eat_kw("primary"):
                self.expect_kw("key")
                v.primary_key = self._name_list()
            elif self.eat_kw("order"):
                self.expect_kw("by")
                v.order_by = self._name_list()
            elif self.eat_kw("partition"):
                self.expect_kw("by")
                v.partition_by = self.parse_expr()
            else:
                break
        self.expect_kw("as")
        v.query = self.parse_query()
        return v

    # --- datatypes (mod.rs:1688-1797) -------------------------------------

    def _datatype(self) -> A.DataType:
        t = self.next()
        if t.type != T.KWID or t.text.lower() not in _TYPE_KEYWORDS:
            raise ParseError(f"unknown data type {t.text!r}")
        name = t.text.lower()
        if name in ("decimal32", "decimal64"):
            self.expect_sym("(")
            scale = self.next()
            if scale.type != T.INT:
                raise ParseError("decimal scale must be an integer")
            self.expect_sym(")")
            return A.DataType(name, [scale.value])
        if name == "chars":
            self.expect_sym("(")
            ln = self.next()
            if ln.type != T.INT:
                raise ParseError("Chars length must be an integer")
            self.expect_sym(")")
            return A.DataType(name, [ln.value])
        if name == "string":
            if self.eat_sym("("):
                mx = self.next()
                if mx.type != T.INT:
                    raise ParseError("String max length must be an integer")
                self.expect_sym(")")
                return A.DataType(name, [mx.value])
            return A.DataType(name)
        if name == "array":
            self.expect_sym("(")
            inner = self._datatype()
            self.expect_sym(")")
            return A.DataType(name, [inner])
        if name == "enum":
            self.expect_sym("(")
            binds = []
            next_id = 1
            while True:
                s = self.next()
                if s.type != T.STRING:
                    raise ParseError("Enum member must be a string literal")
                if self.eat_sym("="):
                    vid = self.next()
                    if vid.type != T.INT:
                        raise ParseError("Enum id must be an integer")
                    next_id = vid.value
                binds.append(A.EnumBind(s.value, next_id))
                next_id += 1  # auto-increment ids (mod.rs:1799-1813)
                if not self.eat_sym(","):
                    break
            self.expect_sym(")")
            return A.DataType(name, binds)
        if name == "tuple":
            self.expect_sym("(")
            inners = [self._datatype()]
            while self.eat_sym(","):
                inners.append(self._datatype())
            self.expect_sym(")")
            return A.DataType(name, inners)
        if name == "map":
            self.expect_sym("(")
            k = self._datatype()
            self.expect_sym(",")
            v = self._datatype()
            self.expect_sym(")")
            # logical (K, V) order — the reference constructs Map(value,
            # key) by mistake (mod.rs:1780 vs item.rs:63); we implement
            # the documented order
            return A.DataType(name, [k, v])
        if name == "dictionary":
            self.expect_sym("(")
            inner = self._datatype()
            self.expect_sym(")")
            return A.DataType(name, [inner])
        if name == "nullable":
            self.expect_sym("(")
            inner = self._datatype()
            self.expect_sym(")")
            inner.nullable = True
            return inner
        return A.DataType(name)

    # --- remaining statements ---------------------------------------------

    def _describe(self):
        self.expect_kw("describe")
        if self.eat_kw("database"):
            return A.DescribeStmt("database", None)
        if self.eat_kw("view"):
            return A.DescribeStmt("view", self.ident())
        self.eat_kw("table")
        return A.DescribeStmt("table", self.ident())

    def _drop(self):
        self.expect_kw("drop")
        entity = "view" if self.eat_kw("view") else "table"
        if entity == "table":
            self.expect_kw("table")
        ife = False
        if self.eat_kw("if"):
            self.expect_kw("exists")
            ife = True
        return A.DropStmt(entity, self.ident(), ife)

    def _truncate(self):
        self.expect_kw("truncate")
        entity = "view" if self.eat_kw("view") else "table"
        if entity == "table":
            self.expect_kw("table")
        ife = False
        if self.eat_kw("if"):
            self.expect_kw("exists")
            ife = True
        return A.TruncateStmt(entity, self.ident(), ife)

    def _optimize(self):
        self.expect_kw("optimize")
        self.expect_kw("table")
        name = self.ident()
        part = None
        if self.eat_kw("on"):
            self.expect_kw("partition")
            part = self.parse_expr()
        # [EXT] ClickHouse OPTIMIZE modifiers: FINAL is a no-op here
        # (this OPTIMIZE always rewrites fully); DEDUPLICATE [BY cols]
        # drops duplicate rows during the compaction rewrite.
        self.eat_kw("final")
        dedup = False
        by: list | None = None
        if self.eat_kw("deduplicate"):
            dedup = True
            if self.eat_kw("by"):
                by = [self.ident()]
                while self.eat_sym(","):
                    by.append(self.ident())
        return A.OptimizeStmt(name, part, dedup, by)

    def _set(self):
        self.expect_kw("set")
        t = self.next()
        if t.type != T.CONFIG:
            raise ParseError("SET requires @config identifier")
        self.expect_sym("=")
        return A.SetStmt(t.text, self.parse_expr())

    def _alter(self):
        self.expect_kw("alter")
        self.expect_kw("table")
        table = self.ident()
        if self.eat_kw("add"):
            if self.eat_kw("column"):
                ine = self._if_not_exists()
                col = self._column_def()
                position = None
                if self.eat_kw("first"):
                    position = ("first",)
                elif self.eat_kw("after"):
                    position = ("after", self.ident())
                return A.AlterStmt(table, "add_column", col, position, ine)
            if self.eat_kw("index"):
                ine = self._if_not_exists()
                iname = self.ident()
                fname = self.ident()
                self.expect_sym("(")
                args = [] if self.eat_sym(")") else self._expr_list(")")
                return A.AlterStmt(
                    table, "add_index", A.IndexDef(iname, A.FnCall(fname, args)),
                    None, ine,
                )
            if self.eat_kw("constraint"):
                ine = self._if_not_exists()
                cname = self.ident()
                self.expect_kw("check")
                return A.AlterStmt(
                    table, "add_constraint",
                    A.ConstraintDef(cname, self.parse_expr()), None, ine,
                )
            raise ParseError("ALTER ADD supports COLUMN, INDEX, CONSTRAINT")
        if self.eat_kw("drop"):
            for ent in ("column", "index", "constraint", "partition"):
                if self.eat_kw(ent):
                    ife = False
                    if self.eat_kw("if"):
                        self.expect_kw("exists")
                        ife = True
                    payload = (
                        self.parse_expr() if ent == "partition" else self.ident()
                    )
                    return A.AlterStmt(table, f"drop_{ent}", payload, None, ife)
            raise ParseError("ALTER DROP supports COLUMN/INDEX/CONSTRAINT/PARTITION")
        if self.eat_kw("modify"):
            # [EXT] ALTER TABLE t MODIFY COLUMN c <Type> — retype the
            # column; stored data is cast during the rewrite.
            self.expect_kw("column")
            return A.AlterStmt(table, "modify_column", self._column_def())
        if self.eat_kw("rename"):
            for ent in ("column", "index", "constraint"):
                if self.eat_kw(ent):
                    old = self.ident()
                    new = self.ident()
                    return A.AlterStmt(table, f"rename_{ent}", (old, new))
            if self.eat_kw("to"):
                return A.AlterStmt(table, "rename_table", self.ident())
            return A.AlterStmt(table, "rename_table", self.ident())
        # [EXT] ClickHouse-style mutations — WHERE is mandatory (the
        # ClickHouse rule; an unconditioned rewrite must be spelled
        # `WHERE 1`), so a forgotten predicate can't wipe a table.
        if self.eat_kw("update"):
            assignments: list = []
            while True:
                col = self.ident()
                self.expect_sym("=")
                assignments.append((col, self.parse_expr()))
                if not self.eat_sym(","):
                    break
            self.expect_kw("where")
            return A.AlterStmt(
                table, "update", (assignments, self.parse_expr())
            )
        if self.eat_kw("delete"):
            self.expect_kw("where")
            return A.AlterStmt(table, "delete", self.parse_expr())
        raise ParseError(
            "ALTER supports ADD, DROP, RENAME, MODIFY, UPDATE, DELETE"
        )


def parse(sql: str):
    """`Parser::parse` equivalent (reference mod.rs:27-29)."""
    return Parser(sql).parse_stmt()
