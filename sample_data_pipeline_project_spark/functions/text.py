"""Text column expressions — B4 text-analysis primitives.

Tokenization, stopword scoring, n-gram shingling, and portable hashing,
all as JVM-side expressions (split/filter/transform higher-order
functions). Hashing uses md5 hex strings rather than murmur ints so the
DuckDB oracle computes byte-identical values (Spark's `hash()` and
DuckDB's `hash()` are different algorithms; md5 is md5 everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword sets for the n-gram/stopword lang-id
# heuristic. Ordered dict: ties broken by this order (deterministic).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "en", "est", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "不"),
}


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def _in_list_pred(items: tuple[str, ...]) -> str:
    quoted = ", ".join(f"'{w}'" for w in items)
    return f"t -> t IN ({quoted})"


def stopword_count(tokens_col: str, lang: str = "en") -> Column:
    """Count of tokens that are stopwords of `lang` (JVM-side filter)."""
    pred = _in_list_pred(LANG_STOPWORDS[lang])
    return F.expr(f"size(filter({tokens_col}, {pred}))")


def word_ngrams(tokens_col: str, n: int) -> Column:
    """Word n-gram shingles: transform over a 1..len-n+1 index range, joining
    n consecutive tokens with a space. Docs shorter than `n` tokens yield an
    EMPTY array — guarded explicitly because Spark's `sequence(1, 0)` is a
    DESCENDING sequence [1, 0], not empty, and index 0 crashes `slice`."""
    return F.expr(
        f"if(size({tokens_col}) >= {n}, "
        f"transform(sequence(1, size({tokens_col}) - {n - 1}), "
        f"i -> array_join(slice({tokens_col}, i, {n}), ' ')), "
        f"cast(array() as array<string>))"
    )


def word_bigrams(tokens_col: str) -> Column:
    """Ordered word bigrams (duplicates kept) as array<struct<w1,w2>>:
    zip of the two length-(len-1) slices. Safe on 0/1-token docs — both
    slices are empty via the greatest(len-1, 0) length, unlike the
    index-range form, where Spark's DESCENDING `sequence(1, 0)` = [1, 0]
    drives `t[i]` out of bounds (a hard error under ANSI mode, the
    engine default)."""
    n1 = f"greatest(size({tokens_col}) - 1, 0)"
    return F.expr(
        f"zip_with(slice({tokens_col}, 1, {n1}), "
        f"slice({tokens_col}, 2, {n1}), "
        f"(x, y) -> struct(x AS w1, y AS w2))"
    )


def md5_fingerprint(text: str | Column) -> Column:
    """Portable document fingerprint: md5 of normalized text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.trim(c)))


def md5_prefix_uint32_sql(expr: str) -> str:
    """Portable SQL fragment: the first 8 hex chars of md5(`expr`) as a
    0..2^32-1 integer, written with only substr/instr/multiply — the same
    string evaluates identically in Spark SQL and DuckDB (the technique
    of `simhash_bit_sql`, widened to a full word). Uniform over inputs,
    so `u32 < p * 2^32` is deterministic p-probability sampling."""
    h = f"md5({expr})"
    terms = [
        f"(instr('0123456789abcdef', substr({h}, {k}, 1)) - 1)"
        f" * CAST({16 ** (8 - k)} AS BIGINT)"
        for k in range(1, 9)
    ]
    return "(" + " + ".join(terms) + ")"
