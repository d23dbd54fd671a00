"""Text-analysis operators for training-data pipelines (pure Catalyst).

Language-ID (stopword n-gram heuristic), quality scoring, token counting,
and rolling-hash document fingerprinting — all built-in ``pyspark.sql.
functions`` expressions (JVM-side, whole-stage codegen); no Python in the
row path.  Designed for the ``documents`` table shape
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from functools import reduce

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword profiles for the heuristic language-ID.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "de", "por"],
}
# BPE-ish word-piece pattern: letter runs, digit runs, or single symbols
TOKEN_PIECE_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RX = r"[.,;:!?\"'()\[\]{}]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (matches ``string_split(text, ' ')`` for
    single-space text; oracle-compatible)."""
    return F.split(F.trim(col), r"\s+")


def token_count_ws(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)) \
            .otherwise(F.size(tokens(col)))


def token_count_bpe(col: Column) -> Column:
    """Word-piece count via regexp: a cheap BPE-proxy token budget."""
    return F.coalesce(F.regexp_count(col, F.lit(TOKEN_PIECE_RX)), F.lit(0))


def stopword_hits(col: Column, stopwords: list[str]) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*stopwords)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals in one projection.

    The whitespace token array is staged as its own projection so the
    three consumers (token count, average-length divisor, stopword
    filter) share ONE ``split(trim(text))`` evaluation instead of
    re-tokenizing per expression (same sharing pattern as
    ``lang_scores``; the multiply-referenced alias blocks
    CollapseProject from inlining it back)."""
    c = F.col(text_col)
    if "__toks" in df.columns:
        raise ValueError("quality_features: '__toks' is reserved")
    staged = df.withColumn("__toks", tokens(c))
    t = F.col("__toks")
    n_tok = F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(t))
    return staged.withColumns({
        "n_chars_calc": F.length(c),
        "n_tokens": n_tok,
        "n_pieces": token_count_bpe(c),
        "avg_token_len": (F.length(F.regexp_replace(c, r"\s+", ""))
                          / F.greatest(n_tok, F.lit(1))).cast("double"),
        "punct_ratio": (F.coalesce(F.regexp_count(c, F.lit(PUNCT_RX)), F.lit(0))
                        / F.greatest(F.length(c), F.lit(1))).cast("double"),
        "digit_ratio": (F.coalesce(F.regexp_count(c, F.lit(r"[0-9]")), F.lit(0))
                        / F.greatest(F.length(c), F.lit(1))).cast("double"),
        "stop_hits": F.size(F.filter(
            t, lambda tok: tok.isin(*LANG_PROFILES["en"]))),
    }).drop("__toks")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score: favors mid-length documents with a
    healthy stopword ratio and low symbol/digit noise."""
    feats = quality_features(df, text_col)
    n_tok = F.greatest(F.col("n_tokens"), F.lit(1))
    stop_ratio = F.col("stop_hits") / n_tok
    length_term = F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0))
    stop_term = F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    noise_term = F.lit(1.0) - F.least(
        (F.col("punct_ratio") + F.col("digit_ratio")) * F.lit(4.0), F.lit(1.0))
    return feats.withColumn(
        "quality_score",
        ((length_term + stop_term + noise_term) / F.lit(3.0)).cast("double"))


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap score per language + CJK character heuristic.

    The token array is projected ONCE and the per-language filters read
    that column: inlining ``stopword_hits(text)`` per language would
    re-evaluate ``split(trim(text))`` once per profile (Catalyst's
    CollapseProject declines to merge the staging projection because the
    alias is referenced five times, which is exactly the sharing we
    want).  Same counts per language, one tokenization instead of five.
    """
    c = F.col(text_col)
    if "__toks" in df.columns:
        raise ValueError("lang_scores: '__toks' is reserved")
    staged = df.withColumn("__toks", tokens(c))
    t = F.col("__toks")
    out = staged
    for lang, words in LANG_PROFILES.items():
        out = out.withColumn(
            f"hits_{lang}",
            F.size(F.filter(t, lambda tok: tok.isin(*words))))
    cjk = F.coalesce(F.regexp_count(c, F.lit(r"[一-鿿]")), F.lit(0))
    return out.withColumn("hits_zh", cjk).drop("__toks")


def lang_id(df: DataFrame, text_col: str = "text",
            out_col: str = "pred_lang") -> DataFrame:
    """argmax over language scores (ties → first in profile order)."""
    scored = lang_scores(df, text_col)
    langs = list(LANG_PROFILES) + ["zh"]
    best = reduce(
        lambda acc, lang: F.when(F.col(f"hits_{lang}") > acc["score"],
                                 F.struct(F.col(f"hits_{lang}").alias("score"),
                                          F.lit(lang).alias("lang"))).otherwise(acc),
        langs[1:],
        F.struct(F.col(f"hits_{langs[0]}").alias("score"),
                 F.lit(langs[0]).alias("lang")))
    return scored.withColumn(out_col, best["lang"])


def fingerprint_exact(col: Column) -> Column:
    """Normalized exact-content fingerprint (casefold + whitespace collapse)."""
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def shingles_expr(text_col: str, k: int = 5) -> Column:
    """Character k-gram shingles as a SQL expression (dynamic substring
    positions need expr-level lambdas).  The column name is backquoted so
    spaced/dotted/hyphenated names parse instead of injecting into the
    expression (same pattern as sessions.epoch_micros)."""
    q = text_col.replace("`", "``")
    return F.expr(
        f"transform(sequence(1, greatest(length(`{q}`) - {k - 1}, 1)),"
        f" i -> substring(`{q}`, i, {k}))")


def rolling_fingerprint(text_col: str, k: int = 8) -> Column:
    """Winnowing-style fingerprint: min hash over all k-char windows —
    stable under content rotation/extension, pure Catalyst."""
    return F.array_min(F.transform(shingles_expr(text_col, k),
                                    lambda g: F.xxhash64(g)))


def document_fingerprints(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    return df.select(
        id_col,
        fingerprint_exact(F.col(text_col)).alias("fp_exact"),
        rolling_fingerprint(text_col).alias("fp_rolling"),
    )


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 100,
               lowercase: bool = True) -> DataFrame:
    """Corpus vocabulary: the k most frequent whitespace tokens.

    explode → groupBy(token) → TakeOrderedAndProject (count desc, token
    asc tiebreak — fully deterministic, exact SQL twin).  The groupBy is
    the usual two-phase partial/final aggregation, so a hot token ("the")
    costs one partial row per task, not a skewed reducer.
    """
    c = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = (df.where(F.col(text_col).isNotNull())
            .select(F.explode(tokens(c)).alias("token"))
            .where(F.length("token") > 0))
    return (toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("freq"))
            .orderBy(F.desc("freq"), F.col("token"))
            .limit(k))


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str = "text_norm", nfc: bool = True,
                   lowercase: bool = False) -> DataFrame:
    """Canonical text cleanup: strip C0/DEL control characters, collapse
    runs of ASCII whitespace to one space, trim, optionally Unicode-NFC
    normalize and lowercase.

    The control/whitespace/trim/lower steps are pure Catalyst (explicit
    ASCII classes — Java, RE2, and Python regex dialects disagree on what
    ``\\s`` means, so none of them is used).  NFC has no Catalyst
    expression; it runs as an Arrow-vectorized ``pandas_udf`` over the
    already-collapsed column (no shuffle, no per-row Python API), and the
    driver oracles it against DuckDB's ``nfc_normalize``.
    """
    c = F.col(text_col)
    cleaned = F.regexp_replace(c, "[\\x00-\\x1F\\x7F]", " ")
    cleaned = F.trim(F.regexp_replace(cleaned, "[ \\t\\n\\r\\f]+", " "))
    if lowercase:
        cleaned = F.lower(cleaned)
    if not nfc:
        return df.withColumn(out_col, cleaned)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x)
                     if x is not None else None)

    return df.withColumn(out_col, _nfc(cleaned))
