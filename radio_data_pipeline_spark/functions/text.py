"""Text-analysis column functions for training-data pipelines:
language ID, quality scoring, token counting, fingerprinting.

Everything here is a pure JVM-side column expression (regex built-ins)
— no Python UDFs in the hot path, so a 100 TB documents table streams
through whole-stage codegen. Patterns are kept inside the common
subset of Java regex and RE2 so the DuckDB oracles can mirror them
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z0-9]+"
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols —
# the GPT-2-style split minus unicode categories (kept RE2-compatible).
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
PUNCT_RE = "[.,;:!?'\"()\\[\\]{}-]"

# Top English function words; hits per 100 words drive the language
# heuristic. \\b word boundaries work identically in Java regex / RE2.
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "that")


def word_tokens(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(WORD_RE), 0)


# The corpus-wide whitespace tokenizer (lower, trim, NULL -> '' so a
# NULL document tokenizes to [''], matching DuckDB's
# string_split_regex on the same normalization). The SQL fragment is
# the oracle-side mirror; keep the two in lockstep.
WHITESPACE_WORDS_SQL = ("string_split_regex(lower(trim(coalesce(text, "
                        "''))), '\\s+')")


def whitespace_words(text: Column) -> Column:
    return F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+")


def word_count(text: Column) -> Column:
    return F.size(word_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0))


def stopword_hits(text: Column) -> Column:
    """Count of stopword occurrences (word-boundary matches on the
    lowercased text)."""
    lower = F.lower(text)
    total = F.lit(0)
    for w in STOPWORDS:
        total = total + F.regexp_count(lower, F.lit(f"\\b{w}\\b"))
    return total


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: penalize very short docs, extreme
    punctuation density, and stopword-free (non-prose) text. The exact
    weights are arbitrary but deterministic and mirrored in SQL."""
    n_words = word_count(text).cast("double")
    n_punct = punct_count(text).cast("double")
    n_stop = stopword_hits(text).cast("double")
    len_term = F.least(n_words / 100.0, F.lit(1.0))
    punct_term = 1.0 - F.least(n_punct / F.greatest(n_words, F.lit(1.0)),
                               F.lit(1.0))
    stop_term = F.least(10.0 * n_stop / F.greatest(n_words, F.lit(1.0)),
                        F.lit(1.0))
    return 0.4 * len_term + 0.3 * punct_term + 0.3 * stop_term


def language_id(text: Column, threshold: float = 2.0) -> Column:
    """n-gram/function-word language heuristic: >= threshold stopword
    hits per 100 words -> 'en', else 'unknown'. (A real system chains
    per-language stopword tables; the plumbing is identical.)"""
    per100 = (stopword_hits(text).cast("double") * 100.0
              / F.greatest(word_count(text), F.lit(1)).cast("double"))
    return F.when(per100 >= threshold, F.lit("en")).otherwise(F.lit("unknown"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lowercased text — the exact-dedup key. (The reference has no text
    surface; this generalizes its save-stage content addressing.)"""
    normalized = F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")
    return F.md5(normalized)
