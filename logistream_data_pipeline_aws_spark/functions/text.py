"""Text-analysis column helpers for large-scale training-data pipelines.

All pure Catalyst expressions (split / transform / filter / aggregate /
md5 / conv) — no Python UDFs, so they run JVM-side inside whole-stage
codegen and scale linearly with partitions.  Cross-engine determinism
(DuckDB oracle) is part of the design: token hashing goes through md5 hex
prefixes (identical in any engine) rather than murmur3.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword sets for the language-ID heuristic.
# Deliberately tiny + hard-coded: the point is the *operator shape*
# (token-set membership scoring at scale), not lexicographic coverage.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "una"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "pour", "que", "dans"],
}

# A BPE-ish pre-tokenization pattern: letter runs, digit runs, single
# punctuation marks (identical regex semantics in Spark/Java and DuckDB/RE2
# for this class-only pattern).
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization: ``split(trim(x), '\\s+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    # NULL-gated: F.size returns -1 (not NULL) for NULL input under Spark's
    # default legacy.sizeOfNull, while DuckDB's len(NULL) is NULL — the gate
    # keeps the oracle contract for NULL text.
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), F.size(tokens(c))).cast("long")


def regex_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(), F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))
    ).cast("long")


def word_shingles(tok: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined) from a token array.

    Shorter-than-k docs yield an empty set.
    """
    joined = F.transform(
        F.sequence(F.lit(0), F.size(tok) - k),
        lambda i: F.array_join(F.slice(tok, i + 1, k), " "),
    )
    return F.when(F.size(tok) >= k, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def token_hash28(tok: Column) -> Column:
    """Deterministic 28-bit token hash: first 7 hex chars of md5.

    Engine-portable (md5 is md5 everywhere); 28 bits keeps downstream
    bit arithmetic inside a signed 64-bit lane with room to spare.
    """
    return F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("long")


def stopword_hits(tok: Column, lang: str) -> Column:
    """How many tokens (with repeats) are stopwords of ``lang``.

    NULL-gated like ``token_count``: NULL token array -> NULL, matching
    DuckDB ``len``-of-NULL semantics rather than legacy ``size``'s -1.
    """
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.when(
        tok.isNotNull(),
        F.size(F.filter(tok, lambda t: F.array_contains(sw, F.lower(t)))),
    ).cast("long")


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lower, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint = md5 of the normalized text."""
    return F.md5(normalized_text(col))


def char_gram_hashes(col: Column | str, k: int = 8) -> Column:
    """Rolling k-char-gram hashes over the normalized text: position i ->
    28-bit md5-prefix hash of chars [i, i+k).  Empty array below k chars
    (a bare ``sequence(1, n-k+1)`` would silently DESCEND for n < k).

    Materialize this as a real output column before windowing over it —
    interpreted higher-order expressions get no common-subexpression
    elimination, so referencing the gram array from inside another
    lambda would re-hash the whole document per window position.
    """
    s = normalized_text(col)
    n = F.length(s)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: token_hash28(s.substr(i, F.lit(k))),
    )
    return F.when(n >= k, grams).otherwise(F.array().cast("array<bigint>"))


def winnow_minima(hashes: Column, w: int = 4) -> Column:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS
    fingerprinting scheme): the distinct minima of every w-length window
    over the rolling gram hashes.  Any shared substring of length
    >= k + w - 1 between two documents is guaranteed to share at least
    one fingerprint — the local-similarity complement to global
    minhash/simhash signatures.  ``hashes`` must be a materialized
    column (see ``char_gram_hashes``); the windows then slice the
    per-row array in O(n·w).
    """
    mins = F.transform(
        F.sequence(F.lit(1), F.size(hashes) - F.lit(w - 1)),
        lambda j: F.array_min(F.slice(hashes, j, w)),
    )
    return F.when(F.size(hashes) >= w, F.array_distinct(mins)).otherwise(
        F.array().cast("array<bigint>")
    )


def quality_score_pandas(text_col: Column | str) -> Column:
    """Vectorized scalar ``@pandas_udf`` form of ``quality_score`` —
    kept as the reference implementation of the 'Python when you must'
    path (Arrow batches, ~10-100x over row-at-a-time UDFs) and pinned
    equal to the pure-expression version by test.  Production code should
    prefer ``quality_score``: it stays in whole-stage codegen."""
    from pyspark.sql.functions import pandas_udf

    en = set(STOPWORDS["en"])

    @pandas_udf("double")
    def score(texts: pd.Series) -> pd.Series:
        def one(t: str | None) -> float | None:
            if t is None:
                return None  # parity with the expression form: NULL in, NULL out
            toks = (t or "").strip().split()
            n = len(toks) if toks else 1  # split('') -> [''] parity
            if (t or "").strip() == "":
                toks, n = [""], 1
            len_score = min(n / 64.0, 1.0)
            alpha = sum(1 for x in toks if x.isalpha() and x.isascii())
            alpha_ratio = alpha / n if n > 0 else 0.0
            sw = sum(1 for x in toks if x.lower() in en)
            sw_score = min(sw / 4.0, 1.0)
            raw = len_score * (0.5 + 0.3 * alpha_ratio + 0.2 * sw_score)
            # HALF_UP to match Spark's F.round (Python round() is half-even)
            import math

            return math.floor(raw * 1e6 + 0.5) / 1e6

        return texts.map(one)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return score(c)


def quality_score(text_col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length saturation x alpha
    ratio x (mild) stopword presence.  Pure per-row arithmetic."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    tok = tokens(c)
    n_tok = F.size(tok).cast("double")
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    alpha = F.size(F.filter(tok, lambda t: t.rlike("^[A-Za-z]+$"))).cast("double")
    alpha_ratio = F.when(n_tok > 0, alpha / n_tok).otherwise(F.lit(0.0))
    sw = stopword_hits(tok, "en").cast("double")
    sw_score = F.least(sw / F.lit(4.0), F.lit(1.0))
    score = F.round(
        len_score * (F.lit(0.5) + F.lit(0.3) * alpha_ratio + F.lit(0.2) * sw_score), 6
    )
    # least()/greatest() IGNORE null operands, so a NULL text would leak
    # through as a constant 0.7 — gate explicitly: NULL in, NULL out
    return F.when(c.isNotNull(), score)
