"""Text-analysis columns (brief requirement: language-ID, quality scoring,
token counting, document fingerprinting). All pure Column expressions —
whole-stage-codegen'd, and each reproducible in ANSI SQL for the oracle.

Reference analogs: token estimate `embedding_service.py:96-97` (F3),
content validation `embedding_service.py:82-107` (P6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tokenize import tokens_expr

# tiny pinned stopword sets for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "you", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
}


def stopword_count_expr(tokens: Column, words: list[str]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda x: F.array_contains(wl, x)))


def lang_scores(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_guess, score) — argmax stopword hits, ties broken by
    ascending language code, zero hits → 'und'."""
    toks = tokens_expr(content_col)
    scores = F.array(
        *[
            F.struct(
                (-stopword_count_expr(toks, ws)).alias("neg"), F.lit(lang).alias("lang")
            )
            for lang, ws in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_min(scores)  # min(neg) = max score; tie → min lang code
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und")).alias("lang_guess"),
        (-best["neg"]).cast("int").alias("score"),
    )


def quality_features(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: lengths, punctuation ratio, stopword ratio,
    mean token length — the reference's validation heuristics (P6) made
    columnar, rounded to 6 for oracle parity."""
    c = F.col(content_col)
    toks = tokens_expr(content_col)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    alnum = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9_ ]", ""))
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    sw = stopword_count_expr(toks, STOPWORDS["en"])
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round((n_chars - alnum) / n_chars, 6).alias("punct_ratio"),
        F.round(sw / n_tokens, 6).alias("stopword_ratio"),
        F.round(tok_chars / n_tokens, 6).alias("mean_token_len"),
        F.round(n_chars / F.lit(4.0), 6).alias("token_estimate"),  # F3
    )


def fingerprint(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp) — md5 of whitespace-normalized lowercase content; the
    cheap document fingerprint for shard-level dedup manifests."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(content_col)), "\\s+", " "))
    return df.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fp"))
