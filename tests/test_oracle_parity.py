"""Property-based parity between the Python tokenize/fold primitives
and the live DuckDB expressions the oracles are written in. Every
SQL-checked text operator routes through these two helpers, so a
divergence here is a latent hash-mismatch on adversarial input; fuzz
them directly against DuckDB instead of waiting for testdata to grow a
tricky string. No Ray needed."""

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from analiticcl_ray.pipelines.text import fold_text, oracle_tokens

# mixed alphabet: ASCII letters/digits/punct, every ASCII whitespace,
# Unicode whitespace lookalikes (NBSP, U+2028, NEL), case-mapping edge
# cases (İ ı ß ẞ Σ ς dotted/dotless), combining marks, CJK, emoji
_ALPHABET = st.sampled_from(
    list("abcXYZ019 .,-_!\t\n\r\x0b\x0c")
    + ["\xa0", " ", "\x85", "İ", "ı", "ß", "ẞ", "Σ", "ς", "σ",
       "é", "́", "Å", "中", "文", "🎉"]
)
_TEXT = st.text(alphabet=_ALPHABET, max_size=40)

_CON = duckdb.connect()


def _sql_one(expr: str, x: str):
    return _CON.execute(f"SELECT {expr}", [x]).fetchone()[0]


@settings(max_examples=120, deadline=None, derandomize=True)
@given(_TEXT)
def test_fold_text_parity_fuzz(x):
    got = fold_text(pd.Series([x], dtype=object)).iloc[0]
    want = _sql_one(
        "trim(regexp_replace(lower(?), '[^a-z0-9]+', ' ', 'g'))", x
    )
    assert got == want, repr(x)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(_TEXT)
def test_oracle_tokens_parity_fuzz(x):
    toks = oracle_tokens(pd.Series([x], dtype=object)).iloc[0]
    want = _CON.execute(
        "SELECT CASE WHEN trim($1) = '' THEN [] "
        "ELSE regexp_split_to_array(trim($1), '\\s+') END",
        [x],
    ).fetchone()[0]
    assert list(toks) == list(want), repr(x)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(_TEXT)
def test_ascii_ws_tokens_parity_fuzz(x):
    from analiticcl_ray.pipelines.text import ascii_ws_tokens

    got = list(ascii_ws_tokens(pd.Series([x], dtype=object)).iloc[0])
    want = _CON.execute(
        "SELECT CASE WHEN trim($1, ' \t\n\r' || chr(11) || chr(12)) = '' "
        "THEN [] ELSE regexp_split_to_array("
        "trim($1, ' \t\n\r' || chr(11) || chr(12)), '[ \t\n\r\f\v]+') END",
        [x],
    ).fetchone()[0]
    assert got == list(want), repr(x)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(_TEXT)
def test_bpe_pretoken_parity_fuzz(x):
    import re

    from analiticcl_ray.pipelines.text import BPE_PRETOKEN_RE

    got = re.findall(BPE_PRETOKEN_RE, x)
    want = _CON.execute(
        "SELECT regexp_extract_all($1, "
        "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f\\v]')",
        [x],
    ).fetchone()[0]
    assert got == list(want), repr(x)
