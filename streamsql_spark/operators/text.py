"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (no Python UDFs): language-ID by stopword
profile, quality scoring, token counting (whitespace + BPE-ish regex),
and rolling-hash document fingerprinting (winnowing-style).  Each has a
SQL-oracle-reproducible definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_parallelism

# tiny deterministic stopword profiles; real pipelines would load
# per-language frequency tables — topology is identical
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "for", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "de": ("der", "die", "das", "und", "in", "zu", "den", "mit", "von", "ist"),
}


def lang_score_expr(text_col: str, stopwords: tuple[str, ...]) -> str:
    """Fraction of tokens that are stopwords of the profile."""
    sw = ", ".join(f"'{w}'" for w in stopwords)
    toks = f"split(lower({text_col}), ' ')"
    return (f"CAST(size(filter({toks}, t -> array_contains(array({sw}), t))) AS DOUBLE)"
            f" / greatest(size({toks}), 1)")


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pick the best-scoring profile; 'und' when nothing matches."""
    df = ensure_parallelism(df)
    scores = [(lang, lang_score_expr(text_col, sw)) for lang, sw in LANG_PROFILES.items()]
    # array_max on structs compares field-by-field → score first, lang as
    # the deterministic tiebreaker
    struct_items = ", ".join(
        f"named_struct('score', round({expr}, 6), 'lang', '{lang}')" for lang, expr in scores)
    best = f"array_max(array({struct_items}))"
    return df.withColumn("__best__", F.expr(best)) \
             .withColumn("lang_pred",
                         F.expr("CASE WHEN __best__.score > 0 THEN __best__.lang ELSE 'und' END")) \
             .withColumn("lang_score", F.col("__best__.score")) \
             .drop("__best__")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / digit / mean-word-length features
    + a composite quality score in [0,1]."""
    toks = f"split({text_col}, ' ')"
    exprs = {
        "n_chars_m": f"length({text_col})",
        "n_tokens": f"size({toks})",
        "mean_tok_len": (f"round(aggregate({toks}, 0D, (a, t) -> a + length(t))"
                         f" / greatest(size({toks}), 1), 6)"),
        "punct_ratio": (f"round(CAST(length(regexp_replace({text_col}, '[^.,;:!?]', ''))"
                        f" AS DOUBLE) / greatest(length({text_col}), 1), 6)"),
        "digit_ratio": (f"round(CAST(length(regexp_replace({text_col}, '[^0-9]', ''))"
                        f" AS DOUBLE) / greatest(length({text_col}), 1), 6)"),
        "stopword_ratio": f"round({lang_score_expr(text_col, LANG_PROFILES['en'])}, 6)",
        "uniq_token_ratio": (f"round(CAST(size(array_distinct({toks})) AS DOUBLE)"
                             f" / greatest(size({toks}), 1), 6)"),
    }
    out = df
    for name, e in exprs.items():
        out = out.withColumn(name, F.expr(e))
    # simple composite: long enough, diverse, not digit/punct heavy
    out = out.withColumn("quality_score", F.expr(
        "round(least(n_tokens / 50D, 1D) * uniq_token_ratio"
        " * (1D - least(digit_ratio * 5D, 1D)) * (1D - least(punct_ratio * 5D, 1D)), 6)"))
    return out


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword count via regex splitting.

    The regex splits on word/number/punctuation boundaries — a cheap
    stand-in for a real tokenizer with the same column shape (count per
    document), good for corpus-level token budgeting.
    """
    return (df
            .withColumn("ws_tokens", F.expr(f"size(split({text_col}, '\\\\s+'))"))
            .withColumn("subword_tokens", F.expr(
                f"size(regexp_extract_all({text_col}, "
                f"'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))"))
            .withColumn("est_bpe_tokens", F.expr(
                # ~1 token per 4 chars heuristic, ceil
                f"CAST(ceil(length({text_col}) / 4.0) AS BIGINT)")))


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 4,
                keep: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: the ``keep`` smallest k-gram hashes,
    joined to one hex string.  Robust to local edits; md5-based so any
    engine reproduces it.
    """
    df = ensure_parallelism(df)
    toks = f"split({text_col}, ' ')"
    grams = (f"transform(sequence(0, greatest(size({toks}) - {k}, 0)), "
             f"i -> array_join(slice({toks}, i + 1, {k}), ' '))")
    hashes = (f"array_sort(transform({grams}, g -> "
              f"CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)))")
    return df.withColumn("fingerprint", F.expr(
        f"array_join(transform(slice({hashes}, 1, {keep}), h -> CAST(h AS STRING)), '-')"))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  ngram_n: int = 4, min_overlap: int = 2) -> DataFrame:
    """Test-set decontamination: flag training documents sharing ≥
    ``min_overlap`` distinct word ``ngram_n``-grams with any benchmark
    document (the n-gram-overlap rule used for LLM training corpora,
    e.g. GPT-3 appendix C / PaLM-style 8-gram checks — n is a knob; the
    fixture corpus is short-sentence synthetic, so tests use smaller n).

    Plan shape for 100 TB: the benchmark side (eval sets, ~10⁴–10⁶
    n-grams) is DISTINCT-ed and **broadcast**, so the corpus-side scan
    joins map-side with no shuffle of the corpus; the only exchange is
    the per-doc overlap count groupBy, keyed by doc id (narrow, one
    row per doc).  Corpus n-grams are deduplicated per document
    JVM-side (array_distinct before explode) so a repeated phrase
    inside one doc counts once.

    Output: one row per input doc — (id, n_overlap, contaminated).
    """
    docs = ensure_parallelism(docs)
    toks = f"split({text_col}, ' ')"
    grams = (f"array_distinct(transform(sequence(0, greatest(size({toks}) - {ngram_n}, 0)), "
             f"i -> array_join(slice({toks}, i + 1, {ngram_n}), ' ')))")
    bench_grams = (benchmark
                   .select(F.explode(F.expr(grams)).alias("gram"))
                   .distinct()
                   .withColumn("__hit__", F.lit(1)))
    doc_grams = (docs
                 .select(F.col(id_col), F.explode(F.expr(grams)).alias("gram")))
    # LEFT broadcast join: every doc yields ≥1 gram (short texts produce
    # one truncated gram), so zero-overlap docs fall out of the same
    # aggregation — no separate join back to the corpus, ONE exchange
    # total (the per-doc groupBy)
    return (doc_grams
            .join(F.broadcast(bench_grams), "gram", "left")
            .groupBy(id_col)
            .agg(F.sum(F.coalesce("__hit__", F.lit(0))).cast("int")
                  .alias("n_overlap"))
            .withColumn("contaminated", F.col("n_overlap") >= min_overlap))
