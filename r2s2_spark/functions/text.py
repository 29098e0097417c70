"""Text-analysis expressions for large-scale training-data pipelines.

All pure Catalyst (JVM-side, whole-stage codegen) — no Python. Each
function returns a Column usable over the ``documents`` table
(doc_id, text, lang, source, n_chars). Portable-SQL twins of these
expressions back the DuckDB oracles in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny high-frequency English stopword list for the language-ID heuristic
EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "for", "on", "with"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def normalized(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase + collapsed whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (md5 of the normalized text —
    portable across engines, unlike xxhash64)."""
    return F.md5(normalized(text))


def punct_ratio(text: Column) -> Column:
    no_punct = F.regexp_replace(text, r"[^\w\s]", "")
    return F.round(
        (F.length(text) - F.length(no_punct)) / F.greatest(F.length(text), F.lit(1)), 4
    )


def avg_word_len(text: Column) -> Column:
    t = tokens(text)
    total = F.aggregate(
        t, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x).cast("bigint")
    )
    return F.round(total / F.greatest(F.size(t), F.lit(1)), 4)


def stopword_ratio(text: Column) -> Column:
    t = tokens(normalized(text))
    hits = F.size(F.filter(t, lambda x: x.isin(*EN_STOPWORDS)))
    return F.round(hits / F.greatest(F.size(t), F.lit(1)), 4)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: long enough, not too punctuated,
    plausible word lengths. Deterministic and SQL-portable."""
    len_ok = F.least(F.length(text) / F.lit(200.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    wl = avg_word_len(text)
    wl_ok = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_ok + punct_ok + wl_ok) / 3, 4)


def clean_text(text: Column) -> Column:
    """Training-data hygiene: redact email addresses and URLs (the two
    highest-volume PII/noise classes), collapse the leftover whitespace.
    Pure Catalyst regexps with RE2-compatible syntax so the DuckDB oracle
    is the same three replacements."""
    c = F.regexp_replace(text, r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>")
    c = F.regexp_replace(c, r"https?://[^\s]+", "<URL>")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def split_assignment(id_col: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    """Deterministic train/val/test assignment from a content-independent
    id hash: md5(id) mod 100 buckets (portable to any engine — the same
    arithmetic runs in the DuckDB oracle). Stable across runs, retries and
    engines; never random()."""
    bucket = (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % 100
    )
    return (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )


def lang_id(text: Column) -> Column:
    """Stopword-ratio language ID: 'en' when common-English tokens exceed
    5% of tokens, else 'other'. (An n-gram model would be a lookup-table
    broadcast join; the heuristic keeps the oracle SQL-expressible.)"""
    return F.when(stopword_ratio(text) > 0.05, F.lit("en")).otherwise(F.lit("other"))
