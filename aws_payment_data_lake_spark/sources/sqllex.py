"""Shared SQL lexer for the lakehouse SQL surface (VERDICT r12 #3).

``txsql.py`` grew to ~2,300 lines of regex dispatch, each verb arm
carrying its own quote/paren awareness (``_quote_spans``,
``_search/_sub/_find_outside_quotes``, ``_scan_parens``,
``_split_top``, ``_split_when`` — six hand-rolled scanners plus the
``_PBODY`` quoted-paren alternation). The builder's own documented
trigger for a tokenizer migration ("if the grammar grows again",
COVERAGE.md stretch #7) fired in round 12. This module is that
migration's core: ONE lexer, and string-literal safety that is
STRUCTURAL rather than per-callsite.

Design
------
``lex(s)`` tokenizes a statement into (word | string | num | punct)
tokens with exact source spans. ``mask(s)`` projects the statement to
an equal-length string in which every single-quoted literal's
INTERIOR is replaced by ``\\x00`` bytes (quote characters stay).
Every regex the SQL surface runs now runs over ``mask(s)`` through
the wrappers below, while captured groups are extracted from the
ORIGINAL text by span — so:

  * a keyword, table name, comma or paren inside a literal can never
    match (``\\x00`` is not a word/space/paren character), making the
    old "outside quotes" discipline impossible to forget;
  * patterns that deliberately capture literal CONTENT — e.g.
    ``'([^']+)'`` — still work: the masked interior matches
    ``[^']+`` and the span reads the real text back from the source.

Structure helpers (``split_top``, ``split_keyword_top``,
``scan_parens``) scan the masked projection, so parens and commas
inside literals are content by construction.

Spark literal syntax handled: backslash escapes (``\\'``) and doubled
quotes (``''``) inside single-quoted strings; an unterminated literal
runs to end-of-statement (the prior ``_quote_spans`` contract).
Backtick-quoted identifiers lex as ``word`` tokens and are NOT
masked — they are identifiers, not data.

SQL comments (``--`` to end-of-line; ``/* */``, nested per Spark's
SPARK-28880) lex as ``comment`` tokens and project to SPACES in
``mask()`` — so every verb pattern sees a comment as whitespace, a
comma/paren/keyword inside a comment is never structure, and
``strip_statement`` removes the leading/trailing ones (plus trailing
semicolons) before dispatch. A ``--`` or ``/*`` inside a string
literal is content (the string token is consumed first), and
vice versa.

The lexer is pure and the statement strings are small, so ``lex`` /
``mask`` are memoized; the catalog's O(catalog) substring gate in
``_bind_reads`` still runs before any of this.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Callable, Iterator, NamedTuple

WORD = "word"
STRING = "string"
NUM = "num"
PUNCT = "punct"
COMMENT = "comment"

_MASK_CH = "\x00"


class Token(NamedTuple):
    kind: str
    text: str          # raw source text, quotes/backticks included
    start: int
    end: int           # exclusive
    closed: bool = True  # STRING only: saw the closing quote

    def unquoted(self) -> str:
        """Literal value of a STRING token (escape sequences
        processed); WORD tokens shed backticks; others return text."""
        if self.kind == STRING:
            body = self.text[1:-1] if self.closed else self.text[1:]
            out, i, n = [], 0, len(body)
            while i < n:
                ch = body[i]
                if ch == "\\" and i + 1 < n:
                    out.append(body[i + 1])
                    i += 2
                    continue
                if ch == "'" and i + 1 < n and body[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                out.append(ch)
                i += 1
            return "".join(out)
        if self.kind == WORD and self.text.startswith("`"):
            return self.text[1:-1].replace("``", "`")
        return self.text


@lru_cache(maxsize=512)
def lex(s: str) -> tuple[Token, ...]:
    toks: list[Token] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "'":
            j, closed = i + 1, False
            while j < n:
                cj = s[j]
                if cj == "\\":
                    j += 2
                    continue
                if cj == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    closed = True
                    j += 1
                    break
                j += 1
            j = min(j, n)
            toks.append(Token(STRING, s[i:j], i, j, closed))
            i = j
            continue
        if ch == "`":
            j = s.find("`", i + 1)
            while 0 <= j < n - 1 and s[j + 1] == "`":   # `` escape
                j = s.find("`", j + 2)
            j = n if j < 0 else j + 1
            toks.append(Token(WORD, s[i:j], i, j))
            i = j
            continue
        if ch == "-" and i + 1 < n and s[i + 1] == "-":
            # line comment: to end-of-line (ANSI; `5--3` is `5` then a
            # comment, which is also Spark's reading)
            j = s.find("\n", i + 2)
            j = n if j < 0 else j
            toks.append(Token(COMMENT, s[i:j], i, j))
            i = j
            continue
        if ch == "/" and i + 1 < n and s[i + 1] == "*":
            # bracketed comment, NESTED per Spark (SPARK-28880);
            # unterminated runs to end-of-statement
            depth, j = 1, i + 2
            while j < n and depth:
                if s[j] == "/" and j + 1 < n and s[j + 1] == "*":
                    depth += 1
                    j += 2
                elif s[j] == "*" and j + 1 < n and s[j + 1] == "/":
                    depth -= 1
                    j += 2
                else:
                    j += 1
            toks.append(Token(COMMENT, s[i:j], i, j, depth == 0))
            i = j
            continue
        if ch.isalpha() or ch == "_":
            j = i + 1
            while j < n and (s[j].isalnum() or s[j] == "_"):
                j += 1
            toks.append(Token(WORD, s[i:j], i, j))
            i = j
            continue
        if ch.isdigit():
            j = i + 1
            while j < n and s[j].isdigit():
                j += 1
            if j < n - 1 and s[j] == "." and s[j + 1].isdigit():
                j += 1
                while j < n and s[j].isdigit():
                    j += 1
            toks.append(Token(NUM, s[i:j], i, j))
            i = j
            continue
        toks.append(Token(PUNCT, ch, i, i + 1))
        i += 1
    return tuple(toks)


@lru_cache(maxsize=512)
def mask(s: str) -> str:
    """Equal-length projection with every string literal's interior
    replaced by NUL bytes; all other characters (including the quote
    characters themselves) pass through, so regex spans over the
    projection index 1:1 into the source."""
    out = list(s)
    for t in lex(s):
        if t.kind == STRING:
            lo = t.start + 1
            hi = t.end - 1 if t.closed else t.end
            for k in range(lo, hi):
                out[k] = _MASK_CH
        elif t.kind == COMMENT:
            # comments project to SPACES (delimiters included), so a
            # `UPDATE /*x*/ t` matches `UPDATE\s+t` and a comma or
            # paren inside a comment is never structure
            for k in range(t.start, t.end):
                if not s[k].isspace():   # keep newlines as-is
                    out[k] = " "
    return "".join(out)


class Match:
    """An ``re.Match`` over ``mask(s)`` whose group texts are read
    from the ORIGINAL statement by span."""

    __slots__ = ("_m", "_s")

    def __init__(self, m: re.Match, s: str) -> None:
        self._m = m
        self._s = s

    def _g(self, i) -> str | None:
        a, b = self._m.span(i)
        return None if a == -1 else self._s[a:b]

    def group(self, *idx):
        if not idx:
            idx = (0,)
        got = tuple(self._g(i) for i in idx)
        return got[0] if len(got) == 1 else got

    def groups(self) -> tuple:
        return tuple(self._g(i)
                     for i in range(1, self._m.re.groups + 1))

    def start(self, i: int = 0) -> int:
        return self._m.start(i)

    def end(self, i: int = 0) -> int:
        return self._m.end(i)

    def span(self, i: int = 0) -> tuple[int, int]:
        return self._m.span(i)


def match(pattern: str, s: str, flags: int = 0) -> Match | None:
    """``re.match`` over ``mask(s)`` — same argument order as ``re``,
    so a callsite migration is a pure name substitution."""
    m = re.match(pattern, mask(s), flags)
    return Match(m, s) if m else None


def search(pattern: str, s: str, flags: int = 0) -> Match | None:
    m = re.search(pattern, mask(s), flags)
    return Match(m, s) if m else None


def finditer(pattern: str, s: str,
             flags: int = 0) -> Iterator[Match]:
    for m in re.finditer(pattern, mask(s), flags):
        yield Match(m, s)


def contains(pattern: str, s: str, flags: int = 0) -> bool:
    return re.search(pattern, mask(s), flags) is not None


def find(pattern: str, s: str, flags: int = 0) -> int:
    """Start index of the first structural match, or -1."""
    m = re.search(pattern, mask(s), flags)
    return m.start() if m else -1


def sub(pattern: str, repl: str | Callable[[Match], str],
        s: str, flags: int = 0) -> str:
    """Replace structural matches, rebuilding around ORIGINAL text.
    ``repl`` may be a plain string or a callable taking the wrapped
    match (no backreference expansion — callers pass literal text)."""
    out, last = [], 0
    for m in re.finditer(pattern, mask(s), flags):
        out.append(s[last:m.start()])
        out.append(repl(Match(m, s)) if callable(repl) else repl)
        last = m.end()
    out.append(s[last:])
    return "".join(out)


def words(s: str) -> list[Token]:
    """The WORD tokens of a statement — verb dispatch that comments
    and literals cannot fool."""
    return [t for t in lex(s) if t.kind == WORD]


def strip_statement(s: str) -> str:
    """Normalize a statement for the verb arms: drop surrounding
    whitespace, LEADING and TRAILING comments, and trailing
    semicolons (in any interleaving). Inline comments stay — the
    masked projection turns them into whitespace for every pattern."""
    s = s.strip()
    while True:
        toks = lex(s)
        if toks and toks[0].kind == COMMENT:
            s = s[toks[0].end:].lstrip()
            continue
        if toks and toks[-1].kind == COMMENT:
            s = s[:toks[-1].start].rstrip()
            continue
        stripped = s.rstrip(";").rstrip()
        if stripped == s:
            return s
        s = stripped


def scan_parens(s: str, i: int) -> int:
    """End index (exclusive) of the balanced parenthesized group
    starting at ``s[i] == '('`` — arbitrary nesting, literal-safe
    (a ')' inside a string is \\x00 in the projection)."""
    p = mask(s)
    depth = 0
    for j in range(i, len(p)):
        if p[j] == "(":
            depth += 1
        elif p[j] == ")":
            depth -= 1
            if depth == 0:
                return j + 1
    raise ValueError(f"unbalanced parentheses: {s[i:i + 80]!r}")


def split_top(s: str) -> list[str]:
    """Split on commas at paren depth 0, literal-safe; segments are
    ORIGINAL text (quotes and escapes intact)."""
    p = mask(s)
    out, depth, last = [], 0, 0
    for j, ch in enumerate(p):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[last:j])
            last = j + 1
    tail = s[last:]
    if tail:                  # 'a,' -> ['a'], '' -> [], ',' -> ['']
        out.append(tail)
    return out


def split_keyword_top(s: str, word: str) -> list[int]:
    """Start indices of depth-0, literal-safe occurrences of
    ``word`` (case-insensitive, word-bounded)."""
    p = mask(s)
    w = word.upper()
    k = len(w)
    out, depth = [], 0
    j, n = 0, len(p)
    while j < n:
        ch = p[j]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (depth == 0 and p[j:j + k].upper() == w
              and (j == 0 or not (p[j - 1].isalnum()
                                  or p[j - 1] == "_"))
              and (j + k >= n or not (p[j + k].isalnum()
                                      or p[j + k] == "_"))):
            out.append(j)
            j += k
            continue
        j += 1
    return out
