"""Text-analysis operators for the documents table.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
codegen'd) — no Python UDFs. Designed for a 100 TB documents corpus:
every op is a per-row projection (no shuffle), so it scales linearly and
pipelines with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = (
    "the", "a", "an", "of", "to", "in", "and", "is", "it", "for", "on", "with",
)

# BPE-ish tokenization: words, numbers, or single non-space symbols — a
# deterministic stand-in for a real subword tokenizer.
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text (empty string → empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(text_col)))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens") -> DataFrame:
    """Regex token count approximating subword tokenizers (words+digits+symbols)."""
    # idx=0 → whole match (the pattern has no capture group)
    return df.withColumn(
        out, F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
    )


def quality_features(
    df: DataFrame, text_col: str = "text", stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals per document.

    Heuristics follow the C4/Gopher-style published filters: documents with
    extreme length, high punctuation density, or near-zero stopword ratio
    are low-quality candidates.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    sw_array = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw_array, F.lower(t))))
    n_chars = F.length(F.col(text_col))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\[-`{-~]", ""))
    return (
        df.withColumn("n_chars_computed", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_token_len",
            F.round(
                F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(F.lit(0.0)), 6
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)), 6
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0)), 6
            ),
        )
    )


# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic (real systems use fastText/CLD3 — the *plumbing* is what
# matters here: pure-column scoring, no shuffle, argmax via map_filter).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "est", "les"),
}


def lang_id_heuristic(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hits.

    Ties resolve to the lexicographically first language (deterministic).
    """
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    scores = [
        F.struct(
            (-F.size(F.filter(toks, lambda t: t.isin(*markers)))).alias("neg_hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(_LANG_MARKERS.items())
    ]
    # ascending sort on (-hits, lang): highest hit count first, ties going
    # to the lexicographically first language
    best = F.sort_array(F.array(*scores))[0]
    return df.withColumn(
        out, F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("unknown"))
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 of casefolded,
    whitespace-normalized text. Identical across engines (md5 is md5)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(normalized))
