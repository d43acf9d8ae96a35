"""NutDB dialect tokenizer — Python re-derivation of the reference's
hand-written streaming tokenizer (/root/reference/src/parser/tokenizer/
mod.rs, 783 LoC) with identical token classes and error behavior:

- `'...'` / `"..."` are BOTH string literals; `''`/`""` doubling and
  backslash escapes (`\\n \\r \\t \\u{XXXX} \\<any>`); raw newlines in
  strings are errors (mod.rs:160-173)
- backtick-delimited identifiers (no newlines, non-empty)
- integers (leading-zero rejected), hex `0x…`, floats incl. `.5`/`1.`
  (a bare `.` is the Dot symbol)
- `$n` query parameters, `@name` config identifiers
- `--` line and `/* */` block comments are whitespace
- `!` only as `!=`; `<>` ≡ `!=`; `<<`/`>>` shifts
"""

from __future__ import annotations

from dataclasses import dataclass

# token types
EOF = "eof"
KWID = "kwid"  # keyword-or-identifier (case kept; parser matches ci)
DELIM_IDENT = "delim_ident"
INT = "int"
HEX = "hex"
FLOAT = "float"
STRING = "string"  # value field holds the unescaped text
PARAM = "param"  # $n — value holds the index int
CONFIG = "config"  # @name
SYM = "sym"  # text is the symbol itself


class TokenizeError(ValueError):
    def __init__(self, msg: str, pos: int):
        super().__init__(f"{msg} (at offset {pos})")
        self.pos = pos


@dataclass(frozen=True)
class Token:
    type: str
    text: str
    value: object = None
    pos: int = 0


_SIMPLE = set("()[]{},:;+*%=&^~")
_IDENT_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_")
_IDENT_CONT = _IDENT_START | set("0123456789")
_DIGITS = set("0123456789")
_HEX_DIGITS = _DIGITS | set("abcdefABCDEF")

# the reference parses integer/hex literals into u128
# (src/parser/mod.rs:1263-1285 via literal.rs integer_from_str!);
# beyond that it raises InvalidIntegerLiteral / InvalidHexLiteral —
# Python ints are unbounded, so the bound is enforced here
_U128_MAX = (1 << 128) - 1


def unescape(raw: str, quote: str) -> str:
    """Unescape per reference literal.rs:36-107: quote-doubling,
    \\n \\r \\t, \\u{hex}, and \\<any> → <any> (incl. escaped real
    newlines, i.e. line continuations keep the newline char)."""
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        ch = raw[i]
        if ch == quote:  # doubled quote: tokenizer guarantees pairs
            out.append(quote)
            i += 2
            continue
        if ch == "\\" and i + 1 < n:
            nxt = raw[i + 1]
            if nxt == "n":
                out.append("\n")
                i += 2
            elif nxt == "r":
                out.append("\r")
                i += 2
            elif nxt == "t":
                out.append("\t")
                i += 2
            elif nxt == "u" and i + 2 < n and raw[i + 2] == "{":
                end = raw.find("}", i + 3)
                if end < 0:
                    raise TokenizeError("unterminated \\u{...} escape", i)
                hexpart = raw[i + 3 : end]
                try:
                    cp = int(hexpart, 16)
                    # mirror Rust char::from_u32 (literal.rs:82-89):
                    # surrogate code points are not chars — Python's
                    # chr() would accept them, producing an
                    # unencodable string instead of an error
                    if 0xD800 <= cp <= 0xDFFF:
                        raise ValueError("surrogate")
                    out.append(chr(cp))
                except ValueError as ex:
                    raise TokenizeError(f"invalid \\u escape {hexpart!r}", i) from ex
                i = end + 1
            elif nxt == "\r":
                # \<CR><LF> consumes both (tokenizer mod.rs:148-156)
                out.append("\r")
                i += 2
                if i < n and raw[i] == "\n":
                    out.append("\n")
                    i += 1
            else:
                out.append(nxt)
                i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


class Tokenizer:
    """Pull tokenizer; whitespace/comments are skipped (the reference
    emits Whitespace tokens and the parser drops them — same effect)."""

    def __init__(self, src: str):
        self.src = src
        self.i = 0
        self.n = len(src)

    def _err(self, msg: str) -> TokenizeError:
        return TokenizeError(msg, self.i)

    def _skip_ws_and_comments(self) -> None:
        s, n = self.src, self.n
        while self.i < n:
            ch = s[self.i]
            if ch in " \t\r\n":
                self.i += 1
            elif ch == "-" and self.i + 1 < n and s[self.i + 1] == "-":
                j = s.find("\n", self.i + 2)
                self.i = n if j < 0 else j + 1
            elif ch == "/" and self.i + 1 < n and s[self.i + 1] == "*":
                j = s.find("*/", self.i + 2)
                if j < 0:
                    # reference parity: unterminated block comment is an
                    # error (tokenizer/mod.rs tokenize_comment_fail)
                    raise TokenizeError(
                        "block comment is not terminated", self.i
                    )
                self.i = j + 2
            else:
                return

    def next_token(self) -> Token:
        self._skip_ws_and_comments()
        s, n = self.src, self.n
        if self.i >= n:
            return Token(EOF, "", pos=self.i)
        start = self.i
        ch = s[start]
        if ch == "|":
            # [EXT] '||' string/array concatenation; single '|' stays
            # bitwise OR
            if start + 1 < n and s[start + 1] == "|":
                self.i += 2
                return Token(SYM, "||", pos=start)
            self.i += 1
            return Token(SYM, "|", pos=start)
        if ch == ":":
            # [EXT] '::' cast operator; a single ':' stays the map
            # literal / slice separator
            if start + 1 < n and s[start + 1] == ":":
                self.i += 2
                return Token(SYM, "::", pos=start)
            self.i += 1
            return Token(SYM, ":", pos=start)
        if ch in _SIMPLE:
            self.i += 1
            return Token(SYM, ch, pos=start)
        if ch == "-":
            # [EXT] '->' lambda arrow (higher-order array functions);
            # previously '-' '>' could only be a parse error, so no
            # legal reference program changes meaning
            if start + 1 < n and s[start + 1] == ">":
                self.i += 2
                return Token(SYM, "->", pos=start)
            self.i += 1
            return Token(SYM, "-", pos=start)
        if ch == "/":
            self.i += 1
            return Token(SYM, "/", pos=start)
        if ch == "!":
            if start + 1 < n and s[start + 1] == "=":
                self.i += 2
                return Token(SYM, "!=", pos=start)
            raise self._err("'!' can only be used with '='")
        if ch == "<":
            nxt = s[start + 1] if start + 1 < n else ""
            if nxt == "=":
                self.i += 2
                return Token(SYM, "<=", pos=start)
            if nxt == ">":
                self.i += 2
                return Token(SYM, "!=", pos=start)
            if nxt == "<":
                self.i += 2
                return Token(SYM, "<<", pos=start)
            self.i += 1
            return Token(SYM, "<", pos=start)
        if ch == ">":
            nxt = s[start + 1] if start + 1 < n else ""
            if nxt == "=":
                self.i += 2
                return Token(SYM, ">=", pos=start)
            if nxt == ">":
                self.i += 2
                return Token(SYM, ">>", pos=start)
            self.i += 1
            return Token(SYM, ">", pos=start)
        if ch in _IDENT_START:
            j = start
            while j < n and s[j] in _IDENT_CONT:
                j += 1
            self.i = j
            return Token(KWID, s[start:j], pos=start)
        if ch == "`":
            j = start + 1
            while j < n and s[j] not in "`\r\n":
                j += 1
            if j == start + 1:
                raise self._err("delimited identifier cannot be empty")
            if j >= n:
                raise self._err("delimited identifier is not complete")
            if s[j] != "`":
                raise self._err("newline in delimited identifier")
            self.i = j + 1
            return Token(DELIM_IDENT, s[start + 1 : j], pos=start)
        if ch == "$":
            j = start + 1
            while j < n and s[j] in _DIGITS:
                j += 1
            if j == start + 1:
                raise self._err("query parameter should have an index")
            if j < n and s[j] in _IDENT_CONT:
                raise self._err("invalid char in query parameter")
            self.i = j
            return Token(PARAM, s[start:j], value=int(s[start + 1 : j]), pos=start)
        if ch == "@":
            j = start + 1
            if j < n and s[j] in _DIGITS:
                raise self._err("config identifier cannot start with numbers")
            while j < n and s[j] in _IDENT_CONT:
                j += 1
            if j == start + 1:
                raise self._err("config identifier should have a name")
            self.i = j
            return Token(CONFIG, s[start + 1 : j], pos=start)
        if ch in "'\"":
            return self._string(ch)
        if ch == "." or ch in _DIGITS:
            return self._dot_or_numeric()
        raise self._err(f"{ch!r} is invalid outside string literal")

    def _string(self, quote: str) -> Token:
        s, n = self.src, self.n
        start = self.i
        i = start + 1
        while True:
            if i >= n:
                raise TokenizeError("string literal is not complete", i)
            ch = s[i]
            if ch == quote:
                if i + 1 < n and s[i + 1] == quote:
                    i += 2
                    continue
                raw = s[start + 1 : i]
                self.i = i + 1
                return Token(STRING, raw, value=unescape(raw, quote), pos=start)
            if ch == "\\":
                i += 2  # skip escaped char (incl. \r; \r\n pair below)
                if i - 1 < n and s[i - 1] == "\r" and i < n and s[i] == "\n":
                    i += 1
                continue
            if ch in "\r\n":
                raise TokenizeError(
                    "newline in string must be escaped by '\\'", i
                )
            i += 1

    def _dot_or_numeric(self) -> Token:
        s, n = self.src, self.n
        start = self.i
        j = start
        while j < n and s[j] in _DIGITS:
            j += 1
        intpart = s[start:j]
        if intpart == "0" and j < n and s[j] in "xX":
            j += 1
            h = j
            while j < n and s[j] in _HEX_DIGITS:
                j += 1
            self.i = j
            hval = int(s[h:j] or "0", 16)
            if hval > _U128_MAX:
                # literal.rs integer_from_str!(hex, u128, s): the
                # reference parses hex into u128 and surfaces overflow
                # as SyntaxError::InvalidHexLiteral
                raise TokenizeError(f"invalid hex '0x{s[h:j]}'", start)
            return Token(HEX, s[h:j], value=hval, pos=start)
        if j < n and s[j] == ".":
            j += 1
            while j < n and s[j] in _DIGITS:
                j += 1
            text = s[start:j]
            if text == ".":
                self.i = j
                return Token(SYM, ".", pos=start)
            if j < n and s[j] in _IDENT_START:
                raise self._err("invalid char in float literal")
            self.i = j
            return Token(FLOAT, text, value=float(text), pos=start)
        if not intpart:
            self.i = j
            return Token(SYM, ".", pos=start)
        if j < n and s[j] in _IDENT_START:
            raise self._err("invalid char in integer literal")
        self.i = j
        ival = int(intpart)
        if ival > _U128_MAX:
            # literal.rs integer_from_str!(u128, s): the reference
            # parses integers into u128 and surfaces overflow as
            # SyntaxError::InvalidIntegerLiteral
            raise TokenizeError(f"invalid integer '{intpart}'", start)
        return Token(INT, intpart, value=ival, pos=start)


def tokenize(src: str) -> list[Token]:
    """Tokenize fully (whitespace/comments dropped), EOF-terminated."""
    tk = Tokenizer(src)
    out: list[Token] = []
    while True:
        t = tk.next_token()
        out.append(t)
        if t.type == EOF:
            return out
