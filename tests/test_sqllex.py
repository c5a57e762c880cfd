"""Unit + property coverage for the shared SQL lexer
(`sources/sqllex.py`) — the tokenizer the SQL surface's quote/paren
safety now derives from structurally (VERDICT r12 #3). No
SparkSession: the lexer is pure string work.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_payment_data_lake_spark.sources import sqllex as lx

# strings mixing structure characters with literal syntax, including
# escapes, doubled quotes, and unterminated literals
_SOUP = st.lists(
    st.sampled_from(list("abc01,()'= .\\`_") + ["WHEN", "WHERE",
                                                "''", "\\'", "'x'"]),
    min_size=0, max_size=12).map("".join)


# ------------------------------------------------------------------ lex
def test_token_kinds_and_spans():
    s = "UPDATE t1 SET tag = 'a,b' WHERE v >= 1.5"
    toks = lx.lex(s)
    kinds = [(t.kind, t.text) for t in toks]
    assert (lx.WORD, "UPDATE") in kinds
    assert (lx.STRING, "'a,b'") in kinds
    assert (lx.NUM, "1.5") in kinds
    assert (lx.PUNCT, "=") in kinds
    for t in toks:                       # spans are exact
        assert s[t.start:t.end] == t.text


def test_string_escapes_and_unquoted():
    t = lx.lex(r"'it''s \' ok'")[0]
    assert t.kind == lx.STRING and t.closed
    assert t.unquoted() == "it's ' ok"


def test_unterminated_string_runs_to_eof():
    toks = lx.lex("SELECT 'open")
    assert toks[-1].kind == lx.STRING and not toks[-1].closed
    assert toks[-1].text == "'open"


def test_backtick_identifier_is_word_not_masked():
    s = "SELECT `count(1)` FROM t"
    toks = lx.lex(s)
    assert any(t.kind == lx.WORD and t.text == "`count(1)`"
               for t in toks)
    assert "count(1)" in lx.mask(s)      # identifiers stay visible


# ----------------------------------------------------------------- mask
def test_mask_same_length_and_quotes_survive():
    s = "SET tag = 'paid where (due)' WHERE id = 1"
    p = lx.mask(s)
    assert len(p) == len(s)
    assert "where (due" not in p         # interior gone
    assert p.count("'") == 2             # delimiters stay
    assert p.endswith("WHERE id = 1")


@settings(max_examples=200, deadline=None)
@given(s=_SOUP)
def test_mask_is_length_preserving_and_idempotent_outside(s):
    p = lx.mask(s)
    assert len(p) == len(s)
    # every unmasked position is verbatim source
    assert all(a == b for a, b in zip(p, s) if a != "\x00")


# -------------------------------------------------- match/search/sub
def test_group_extraction_reads_original_text():
    s = "UPDATE t SET tag = 'x = y' WHERE id = 3"
    m = lx.match(r"UPDATE\s+(\w+)\s+SET\s+(.*)$", s)
    assert m.group(1) == "t"
    assert m.group(2) == "tag = 'x = y' WHERE id = 3"


def test_keyword_inside_literal_never_matches():
    s = "UPDATE t SET tag = 'paid where due' WHERE id = 1"
    assert lx.find(r"\s+WHERE\s+", s, 2) == s.rindex(" WHERE")
    assert len(list(lx.finditer(r"\s+WHERE\s+", s, 2))) == 1


def test_literal_content_patterns_still_capture():
    # the '([^']+)' idiom: masked interior matches, span reads source
    s = "COPY INTO t FROM '/tmp/a b' FILEFORMAT = PARQUET"
    m = lx.search(r"FROM\s+'([^']+)'", s)
    assert m.group(1) == "/tmp/a b"
    # and escapes that the raw-text idiom could never handle
    m2 = lx.search(r"'([^']+)'", "PATTERN = 'a''b'")
    assert m2.group(1) == "a''b"


def test_sub_replaces_structural_only():
    s = "SELECT * FROM fz WHERE tag = 'fz'"
    out = lx.sub(r"\bfz\b", "__view", s)
    assert out == "SELECT * FROM __view WHERE tag = 'fz'"


def test_sub_with_callable_gets_wrapped_match():
    s = "t VERSION AS OF 7"
    out = lx.sub(r"\bt\s+VERSION\s+AS\s+OF\s+(\d+)",
                 lambda m: f"snap_{m.group(1)}", s)
    assert out == "snap_7"


# ------------------------------------------------------------ comments
def test_line_comment_lexes_and_masks_to_spaces():
    s = "UPDATE t -- set the, (tag)\nSET tag = 'x'"
    toks = lx.lex(s)
    cm = [t for t in toks if t.kind == lx.COMMENT]
    assert len(cm) == 1 and cm[0].text.startswith("--")
    p = lx.mask(s)
    assert len(p) == len(s)
    assert "set the" not in p and "," not in p and "(" not in p
    assert lx.match(r"UPDATE\s+t\s+SET\s+tag", p) is not None


def test_bracketed_comment_nests_like_spark():
    s = "SELECT /* outer /* inner */ still */ 1"
    toks = lx.lex(s)
    cm = [t for t in toks if t.kind == lx.COMMENT]
    assert len(cm) == 1
    assert cm[0].text == "/* outer /* inner */ still */"
    assert lx.match(r"SELECT\s+1\s*$", lx.mask(s))


def test_comment_markers_inside_literals_are_content():
    s = "SELECT '-- not a comment /* either */' AS v"
    assert not [t for t in lx.lex(s) if t.kind == lx.COMMENT]
    m = lx.search(r"'([^']+)'", s)
    assert m.group(1) == "-- not a comment /* either */"


def test_strip_statement_comments_and_semicolons():
    assert lx.strip_statement(
        "-- audit\n  DROP TABLE t ; -- bye\n") == "DROP TABLE t"
    assert lx.strip_statement("/*a*/ SELECT 1;;; /*b*/") == "SELECT 1"
    assert lx.strip_statement("SELECT ';'") == "SELECT ';'"
    assert lx.strip_statement("SELECT 1 -- trailing") == "SELECT 1"


def test_words_skip_comments_and_literals():
    s = "/*lead*/ CREATE /*mid*/ TABLE t AS SELECT 'DROP' AS x"
    w = [t.text for t in lx.words(s)]
    assert w[:3] == ["CREATE", "TABLE", "t"]
    assert "DROP" not in w


# -------------------------------------------------- structure helpers
def test_scan_parens_nested_and_literal_safe():
    s = "(f(g(')'), 'x,(')) tail"
    assert s[:lx.scan_parens(s, 0)] == "(f(g(')'), 'x,('))"
    with pytest.raises(ValueError):
        lx.scan_parens("(open 'x'", 0)


def test_split_top_shapes():
    assert lx.split_top("a, f(b,c), 'x,y', d") == [
        "a", " f(b,c)", " 'x,y'", " d"]
    assert lx.split_top("a,") == ["a"]
    assert lx.split_top("") == []
    assert lx.split_top(",") == [""]


@settings(max_examples=200, deadline=None)
@given(s=_SOUP)
def test_split_top_reassembles_verbatim(s):
    parts = lx.split_top(s)
    assert ",".join(parts) == s or (s.endswith(",")
                                    and ",".join(parts) + "," == s)


def test_split_keyword_top_depth_and_literals():
    s = ("MATCHED THEN UPDATE SET a = 'WHEN x' "
         "WHEN NOT MATCHED AND (b = 1 OR c IN ('WHEN')) THEN DELETE")
    idx = lx.split_keyword_top(s, "WHEN")
    assert len(idx) == 1
    assert s[idx[0]:idx[0] + 4] == "WHEN"
    # depth-1 WHEN is structure-protected too
    assert lx.split_keyword_top("f(WHEN) WHEN", "WHEN") == [8]
