"""Text-analysis expression builders (LLM-data-pipeline extensions).

Everything here is a JVM-side expression (built-ins / higher-order
functions) — no Python UDFs — so whole-stage codegen applies and the same
computation is expressible in the DuckDB oracle dialect. Builders come in
pairs: a Spark-SQL string (for F.expr / spark.sql) and an `o_`-prefixed
DuckDB twin, so drift between engine and oracle is visible side-by-side.

Cross-engine deterministic hashing: md5 hex prefix as BIGINT —
  Spark  conv(substring(md5(s),1,N),16,10)::long
  DuckDB ('0x'||substr(md5(s),1,N))::BIGINT
(N=7 → 28 bits: small enough that minhash's (a*h+b) mod p stays far from
int64 overflow with 31-bit multipliers.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: English function words for the language-ID / quality heuristics.
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "are")


# -- normalize / tokenize ----------------------------------------------------

def s_normalize(expr: str) -> str:
    """Spark SQL: lower → strip non-[a-z0-9 space] → collapse ws → trim."""
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}), '[^a-z0-9 ]', ''), ' +', ' '))"
    )


def o_normalize(expr: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
    )


def s_tokens(expr: str) -> str:
    return f"split({s_normalize(expr)}, ' ')"


def o_tokens(expr: str) -> str:
    return f"string_split({o_normalize(expr)}, ' ')"


def normalize_text(col: Column | str) -> Column:
    name = col if isinstance(col, str) else None
    if name is None:
        raise TypeError("pass a column name")
    return F.expr(s_normalize(name))


# -- shingles ----------------------------------------------------------------

def s_shingles(expr: str, k: int) -> str:
    """Spark SQL: array of k-word shingles (slice is 1-based)."""
    t = s_tokens(expr)
    return (
        f"transform(sequence(1, greatest(size({t}) - {k - 1}, 1)),"
        f" i -> array_join(slice({t}, i, {k}), ' '))"
    )


def o_shingles(expr: str, k: int) -> str:
    """DuckDB: list of k-word shingles (list slice is 1-based inclusive)."""
    t = o_tokens(expr)
    return (
        f"[array_to_string(({t})[i:i+{k - 1}], ' ')"
        f" for i in range(1, greatest(len({t}) - {k - 1}, 1) + 1)]"
    )


# -- hashing -----------------------------------------------------------------

def s_md5_long(expr: str, hex_digits: int = 7) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, {hex_digits}), 16, 10) AS BIGINT)"


def o_md5_long(expr: str, hex_digits: int = 7) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {hex_digits})) AS BIGINT)"


def s_md5_long_at(expr: str, start: int, hex_digits: int) -> str:
    """Like :func:`s_md5_long` but from a 1-based offset into the md5 hex
    — independent hash words from one digest (e.g. 64-bit SimHash uses
    chars 1-8 and 9-16 as two 32-bit words)."""
    return f"CAST(conv(substring(md5({expr}), {start}, {hex_digits}), 16, 10) AS BIGINT)"


def o_md5_long_at(expr: str, start: int, hex_digits: int) -> str:
    return f"CAST(('0x' || substr(md5({expr}), {start}, {hex_digits})) AS BIGINT)"


# -- heuristics --------------------------------------------------------------

def _words_list() -> str:
    return ",".join(f"'{w}'" for w in EN_STOPWORDS)


def s_stopword_count(expr: str) -> str:
    return f"size(filter({s_tokens(expr)}, w -> w IN ({_words_list()})))"


def o_stopword_count(expr: str) -> str:
    return f"len(list_filter({o_tokens(expr)}, w -> w IN ({_words_list()})))"
