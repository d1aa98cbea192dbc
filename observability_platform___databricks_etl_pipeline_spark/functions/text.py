"""Text-analysis primitives for large-scale training-data pipelines.

All are native-function column expressions (JVM, codegen, oracle-replicable in
ANSI SQL) unless noted; the few that need Python are Arrow-batched pandas UDFs.

- token counting: whitespace tokens + a BPE-ish subword regex count
- quality scoring: length / punctuation ratio / stopword ratio composite
- document fingerprinting: md5 of whitespace-normalized text (rolling-hash
  analog, chosen to be replicable by the DuckDB oracle) plus a true 64-bit
  polynomial rolling hash as a pandas UDF
- language ID: marker-stopword scoring heuristic
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# --- token counting -------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols —
# a simplification of the GPT-2 pre-tokenize regex that both Spark (Java
# regex) and DuckDB (RE2) support.
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(col: str = "text") -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(F.col(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def bpeish_token_count(col: str = "text") -> Column:
    return F.regexp_count(F.col(col), F.lit(BPEISH_PATTERN)).cast("long")


# --- quality scoring ------------------------------------------------------

# Tiny English stopword core — enough signal for a length/stopword heuristic;
# kept minimal so the oracle SQL stays readable.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")


# the characters Java regex \s matches by default — quality_score's punct
# count is defined over [^A-Za-z0-9\s] with JAVA semantics, so the translate
# keep-set below must list exactly these whitespace chars
_JAVA_WS = " \t\n\x0b\f\r"
_PUNCT_KEEP = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789" + _JAVA_WS
)


def quality_score(col: str = "text") -> Column:
    """Composite quality in [0,1]: length band + punct ratio + stopword ratio.

    Deterministic, pure-SQL-expressible (the DuckDB oracle replicates it
    term-for-term). Mirrors the spirit of the reference's field-level quality
    gates (README.md:550-562) applied to document text. r6: the punct count
    is ``length(translate(text, keep-set, ''))`` — a char-map lookup per
    character instead of a regex scan, counting exactly the characters
    ``[^A-Za-z0-9\\s]`` matches (measured 1.07 s -> 0.45 s at sf1.0,
    diff-checked 0 rows against the regex on the full corpus).
    """
    n = F.length(F.col(col)).cast("double")
    tokens = ws_token_count(col).cast("double")
    punct = F.length(F.translate(F.col(col), _PUNCT_KEEP, "")).cast("double")
    stop_pat = r"(?i)\b(" + "|".join(STOPWORDS) + r")\b"
    stops = F.regexp_count(F.col(col), F.lit(stop_pat)).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))
    stop_ratio = F.when(tokens > 0, stops / tokens).otherwise(F.lit(0.0))
    stop_score = F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
    return F.round(
        (len_score * F.lit(0.4) + punct_score * F.lit(0.3) + stop_score * F.lit(0.3)),
        6,
    )


# --- fingerprinting -------------------------------------------------------


def fingerprint_md5(col: str = "text") -> Column:
    """Whitespace-normalized md5 fingerprint (exact-dup detection key).

    md5 chosen over a custom rolling hash for the SQL-facing surface because
    both Spark and DuckDB implement it identically; see ``rolling_hash_udf``
    for the true rolling-hash variant.
    """
    normalized = F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))
    return F.md5(normalized)


_ROLL_BASE = 1099511628211  # FNV-1a multiplier
_ROLL_OFFSET = 14695981039346656037
_MASK64 = (1 << 64) - 1


def rolling_hash_series(s: pd.Series) -> pd.Series:
    """64-bit FNV-1a over utf-8 bytes — a deterministic rolling document
    fingerprint (modular wraparound is the algorithm, made explicit)."""

    def fnv(x: str | None) -> int:
        if x is None or (isinstance(x, float) and pd.isna(x)):
            return 0
        h = _ROLL_OFFSET
        for b in x.encode("utf-8", "surrogatepass"):
            h = ((h ^ b) * _ROLL_BASE) & _MASK64
        # two's-complement fold into signed 64-bit (Spark LongType)
        return h - (1 << 64) if h >= (1 << 63) else h

    return s.map(fnv)


@F.pandas_udf(LongType())
def rolling_hash_udf(s: pd.Series) -> pd.Series:
    return rolling_hash_series(s)


# --- language ID ----------------------------------------------------------

# Marker words per language. Deterministic scoring: count marker hits per
# language, pick argmax with a fixed tie-break order (en > de > es > fr).
# ASCII-only markers: \b semantics around non-ASCII diverge between regex
# engines (Java vs RE2), so CJK detection would use a codepoint-range counter
# instead — out of scope for the marker heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "die", "ist"),
    "es": ("el", "los", "que", "es"),
    "fr": ("le", "les", "et", "est"),
}
LANG_ORDER = ("en", "de", "es", "fr")


def lang_id_scores(col: str = "text") -> dict[str, Column]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        pat = r"(?i)\b(" + "|".join(markers) + r")\b"
        out[lang] = F.regexp_count(F.col(col), F.lit(pat)).cast("long")
    return out


def lang_id(col: str = "text") -> Column:
    """Argmax over marker counts with deterministic tie-break; 'unknown' if 0."""
    scores = lang_id_scores(col)
    best_lang = F.lit("unknown")
    best_score = F.lit(-1).cast("long")
    for lang in reversed(LANG_ORDER):  # earlier in LANG_ORDER wins ties
        s = scores[lang]
        cond = (s > F.lit(0)) & (s >= best_score)
        best_lang_new = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
        best_lang = best_lang_new
    return best_lang
