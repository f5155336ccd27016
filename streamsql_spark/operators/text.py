"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (no Python UDFs): language-ID by stopword
profile, quality scoring, token counting (whitespace + BPE-ish regex),
and rolling-hash document fingerprinting (winnowing-style).  Each has a
SQL-oracle-reproducible definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def _gram_exprs(text_col: str, n: int) -> tuple[str, str]:
    """(grams, distinct) word-``n``-gram array SQL over ``text_col``.

    Built as ``n−1`` nested ``zip_with`` concats over shifted slices —
    one string concat per gram — instead of a per-gram
    ``slice``+``array_join`` lambda, which costs ~4× more in
    Catalyst's interpreted HOF evaluator.  A document shorter than
    ``n`` words yields its single truncated gram (same floor the SQL
    oracles use).
    """
    w = f"split({text_col}, ' ')"
    m = f"size({w}) - {n - 1}"
    acc = f"slice({w}, 1, {m})"
    for k in range(2, n + 1):
        acc = (f"zip_with({acc}, slice({w}, {k}, {m}), "
               f"(a, b) -> concat(a, ' ', b))")
    grams = (f"CASE WHEN size({w}) < {n} THEN array(array_join({w}, ' ')) "
             f"ELSE {acc} END")
    return grams, f"array_distinct({grams})"


def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition / quality-gate features (Rae et al. 2021
    "Scaling Language Models: ... Gopher", table A1; same family as the
    C4 heuristics) — the filters a pretraining corpus runs between raw
    crawl and tokenization.

    Word-level features (computed here; the line-level duplicates —
    ``dup_line_frac`` — are in :func:`line_repetition_features` because
    they need newline-structured text):

    - ``word_count``, ``mean_word_len``
    - ``frac_alpha_words``: fraction of words containing an alphabetic
      character (C4 keeps pages where most "words" are real words)
    - ``top_2gram_frac``: occurrences of the most frequent word 2-gram
      over all 2-grams (Gopher drops > 0.20)
    - ``dup_3gram_frac``: fraction of 3-grams that occur more than once
      (Gopher's duplicate-n-gram family, count-weighted)
    - ``gopher_pass``: the composite keep/drop gate

    Plan shape: the linear per-row stats are column expressions; the
    n-gram frequency stats EXPLODE the grams and count them with
    whole-stage-codegen hash aggregation — linear in document length,
    where a per-distinct-gram lambda scan would be quadratic on real
    (10k-word) documents.  One explicit repartition on ``id_col`` up
    front lets the gram groupBy, the per-doc rollup, AND the join back
    to the document rows all reuse that single exchange (hash(id)
    satisfies every downstream clustering requirement).
    """
    df = ensure_parallelism(df).repartition(F.col(id_col))
    # NULL text behaves as the empty document (one empty token, gate
    # false) — without the coalesce, explode of a NULL gram array would
    # emit zero rows and the join back would silently DROP the doc
    txt = f"coalesce({text_col}, '')"
    w = f"split({txt}, ' ')"
    g2, _ = _gram_exprs(txt, 2)
    g3, _ = _gram_exprs(txt, 3)
    base = (df
            .withColumn("word_count", F.expr(f"size({w})"))
            .withColumn("mean_word_len", F.expr(
                f"round(aggregate({w}, 0D, (a, t) -> a + length(t))"
                f" / greatest(size({w}), 1), 6)"))
            .withColumn("frac_alpha_words", F.expr(
                f"round(CAST(size(filter({w}, t -> t rlike '[a-zA-Z]')) AS DOUBLE)"
                f" / greatest(size({w}), 1), 6)")))
    grams = df.select(
        F.col(id_col),
        F.explode(F.expr(
            f"concat(transform({g2}, g -> named_struct('n', 2, 'g', g)), "
            f"transform({g3}, g -> named_struct('n', 3, 'g', g)))")).alias("t")
    ).select(id_col, F.col("t.n").alias("n"), F.col("t.g").alias("g"))
    counts = grams.groupBy(id_col, "n", "g").agg(F.count("*").alias("c"))
    feats = counts.groupBy(id_col).agg(
        F.expr("round(CAST(max(CASE WHEN n = 2 THEN c END) AS DOUBLE)"
               " / sum(CASE WHEN n = 2 THEN c ELSE 0 END), 6)")
         .alias("top_2gram_frac"),
        F.expr("round(1D - CAST(count(CASE WHEN n = 3 AND c = 1 THEN 1 END)"
               " AS DOUBLE) / sum(CASE WHEN n = 3 THEN c ELSE 0 END), 6)")
         .alias("dup_3gram_frac"))
    # every doc yields >= 1 gram of each n (the gram exprs floor at one
    # truncated gram), so the inner join back is total
    out = base.join(feats, id_col)
    return out.withColumn("gopher_pass", F.expr(
        "word_count >= 30 AND word_count <= 100000"
        " AND mean_word_len >= 2 AND mean_word_len <= 10"
        " AND frac_alpha_words > 0.8"
        " AND top_2gram_frac < 0.2 AND dup_3gram_frac < 0.6"))


def line_repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Line-level duplicate features over newline-structured text
    (Gopher's duplicate-line fraction / duplicate-line character
    fraction).  Separate from :func:`repetition_features` because the
    parquet fixture corpus is single-line; exercised by pytest on
    synthetic multi-line documents."""
    df = ensure_parallelism(df)
    lines = f"split({text_col}, '\\n')"
    dl = f"array_distinct({lines})"
    return (df
            .withColumn("line_count", F.expr(f"size({lines})"))
            .withColumn("dup_line_frac", F.expr(
                f"round(1D - CAST(size({dl}) AS DOUBLE)"
                f" / greatest(size({lines}), 1), 6)"))
            .withColumn("dup_line_char_frac", F.expr(
                f"round(1D - CAST(aggregate({dl}, 0, (a, l) -> a + length(l))"
                f" AS DOUBLE) / greatest(aggregate({lines}, 0, "
                f"(a, l) -> a + length(l)), 1), 6)"))
            .withColumn("bullet_line_frac", F.expr(
                f"round(CAST(size(filter({lines}, l -> "
                f"l rlike '^\\\\s*([-*•]|[0-9]+[.)])')) AS DOUBLE)"
                f" / greatest(size({lines}), 1), 6)"))
            .withColumn("ellipsis_line_frac", F.expr(
                f"round(CAST(size(filter({lines}, l -> "
                f"l rlike '(\\\\.\\\\.\\\\.|…)\\\\s*$')) AS DOUBLE)"
                f" / greatest(size({lines}), 1), 6)")))


def segment_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", seg_tokens: int = 10) -> DataFrame:
    """C4-style GLOBAL duplicate-span removal: split every document
    into fixed-token segments, keep only the globally-first occurrence
    of each distinct segment (ordered by doc id, then segment
    position — C4 removes any three-sentence span seen before,
    Raffel et al. 2020 §2.2; the unit here is a token window so the
    rule is corpus-agnostic), and reassemble each document from its
    surviving segments in order.

    Output: one row per input doc — (id, n_segs, n_kept, clean_text).
    Boilerplate repeated across documents (headers, footers,
    navigation) survives exactly once, in the earliest document.

    Plan shape: segment fan-out is a per-doc explode (no shuffle); the
    first-occurrence election is ONE window over the segment hash (the
    inherent global shuffle — dedup across documents cannot be
    narrower); reassembly is one groupBy on the doc id.  Both keys are
    high-cardinality and skew-free (hashes / doc ids) at any corpus
    size.
    """
    df = ensure_parallelism(df)
    txt = f"coalesce({text_col}, '')"
    w = f"split({txt}, ' ')"
    seg = (df
           .withColumn("__s__", F.explode(F.expr(
               f"sequence(1, greatest(size({w}), 1), {seg_tokens})")))
           .withColumn("__seg_id__",
                       ((F.col("__s__") - 1) / seg_tokens).cast("bigint"))
           .withColumn("__seg__", F.expr(
               f"array_join(slice({w}, __s__, {seg_tokens}), ' ')")))
    win = Window.partitionBy("__seg__").orderBy(id_col, "__seg_id__")
    kept = seg.withColumn(
        "__keep__", F.row_number().over(win) == 1)
    return (kept.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_segs"),
                 F.sum(F.col("__keep__").cast("int")).cast("int")
                  .alias("n_kept"),
                 F.expr(
                     "array_join(transform(array_sort(collect_list("
                     "CASE WHEN __keep__ THEN named_struct("
                     "'i', __seg_id__, 't', __seg__) END)), x -> x.t), ' ')")
                  .alias("clean_text")))


def train_quality_classifier(df: DataFrame, label_col: str,
                             text_col: str = "text",
                             max_vocab: int = 4096, epochs: int = 300,
                             lr: float = 0.5, l2: float = 1e-3,
                             max_rows: int = 200_000
                             ) -> tuple[dict[str, float], float]:
    """Train the linear bag-of-words quality classifier that
    :func:`linear_quality_score` applies — the "fit fastText on
    good-vs-bad examples" step of a CCNet-style filtering pipeline.

    Features are mean-pooled token indicators over a document-frequency-
    capped vocabulary; training is full-batch logistic regression with
    L2, run driver-side in numpy over the labeled sample (labeled
    quality sets are small by construction — the CORPUS never leaves
    the cluster; only the sample is collected).  Deterministic: zero
    init, fixed epochs, vocabulary ordered by (df desc, token).

    Returns ``(weights, bias)`` ready for
    ``linear_quality_score(corpus, weights, bias)``.
    """
    import numpy as np

    # enforce the "labeled sets are small by construction" contract
    # BEFORE collecting: a mistakenly-passed full corpus must fail
    # typed, not OOM the driver (bounded probe: limit(cap+1).count())
    probe = df.limit(max_rows + 1).count()
    if probe > max_rows:
        raise ValueError(
            f"labeled sample exceeds max_rows={max_rows}: "
            "train_quality_classifier collects the labeled set to the "
            "driver — pass a sample (df.sample/limit) or raise max_rows "
            "explicitly if the driver can hold it")
    rows = df.select(F.col(text_col), F.col(label_col).cast("double")) \
        .collect()
    if not rows:
        raise ValueError("no labeled rows to train on")
    texts = [(r[0] or "").split(" ") for r in rows]
    y = np.array([float(r[1]) for r in rows])
    dfreq: dict[str, int] = {}
    for toks in texts:
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    vocab = [t for t, _ in sorted(dfreq.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:max_vocab]]
    ix = {t: i for i, t in enumerate(vocab)}
    X = np.zeros((len(texts), len(vocab)))
    for r, toks in enumerate(texts):
        if not toks:
            continue
        for t in toks:
            j = ix.get(t)
            if j is not None:
                X[r, j] += 1.0
        X[r] /= len(toks)
    w = np.zeros(len(vocab))
    b = 0.0
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - y
        w -= lr * (X.T @ g / len(y) + l2 * w)
        b -= lr * float(g.mean())
    return ({t: round(float(w[ix[t]]), 6) for t in vocab
             if abs(w[ix[t]]) > 1e-9}, round(float(b), 6))


def ngram_lm_fit(df: DataFrame, text_col: str = "text"
                 ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit the bigram language model that :func:`perplexity_score`
    applies — the "train a LM on the clean reference corpus, keep
    low-perplexity documents" step of CCNet-style filtering (Wenzek et
    al. 2020; classically a KenLM 5-gram — a smoothed bigram keeps the
    topology identical and oracle-checkable).

    Entirely distributed AND entirely lazy: unigram and bigram counts
    are two exploded hash-aggregations over the corpus (map-side
    combine makes the shuffle carry one row per DISTINCT gram, not per
    token); the vocabulary size is a one-row DataFrame that
    :func:`perplexity_score` cross-joins as a broadcast, so fit +
    score is ONE Spark job, no driver action.

    Returns ``(unigrams(w, c1), bigrams(w1, w2, c12), vocab(vs))``.
    """
    toks = ensure_parallelism(df).select(
        F.split(F.col(text_col), " ").alias("t"))
    # NOT checkpointed (measured r13): materializing uni as a stats-less
    # LogicalRDD demotes perplexity_score's auto-mode gram joins from
    # broadcast to shuffle plans — the corpus-side bigram explode then
    # pays a shuffle write before AQE can convert back, which costs more
    # than the one vocab-sized duplicate aggregation it would save
    # (text_analysis 2.64→3.14 s with the checkpoint in place).
    # ONE corpus pass for both gram orders (r13, guide §2.4): unigrams
    # (tagged w2 = NULL — split() tokens are never NULL, so the tag is
    # unambiguous) and bigrams explode from the same array and
    # aggregate through ONE exchange keyed (w1, w2); the uni / big /
    # vocab consumers filter the SAME aggregate subtree, which
    # canonicalizes identically on every branch, so the scoring plan
    # re-reads it via ReusedExchange — one corpus scan + explode +
    # shuffle where there were two of each.
    # NB sequence(1, 0) DESCENDS in Spark — empty-array guard required
    grams = (toks.select(F.explode(F.expr(
        "concat(transform(t, w -> struct(w AS w1, CAST(NULL AS STRING) AS w2)), "
        "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), "
        "i -> struct(t[i-1] AS w1, t[i] AS w2)) "
        "ELSE array() END)")).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")))
    uni = grams.where("w2 IS NULL").select(F.col("w1").alias("w"),
                                           F.col("c").alias("c1"))
    big = grams.where("w2 IS NOT NULL").select(
        "w1", "w2", F.col("c").alias("c12"))
    vocab = uni.agg(F.count(F.lit(1)).alias("vs"))
    return uni, big, vocab


def perplexity_score(df: DataFrame, unigrams: DataFrame, bigrams: DataFrame,
                     vocab_size, add_k: float = 0.1,
                     text_col: str = "text", id_col: str = "doc_id",
                     out_col: str = "ppl",
                     broadcast_lm: bool | str = "auto") -> DataFrame:
    """Per-document bigram perplexity under an add-k smoothed LM:
    ``exp(-mean(ln((c12 + k) / (c1 + k·V))))`` over the document's
    bigrams — low = looks like the reference corpus (keep), high =
    gibberish/boilerplate (drop).  CCNet's head/middle/tail buckets are
    a quantile cut over this column.

    Execution: explode bigrams once, LEFT join the count tables (unseen
    grams coalesce to 0, the smoothing floor), one hash re-aggregation
    per document.  ``broadcast_lm`` gates the gram-table join strategy:

    - ``"auto"`` (default): no forced hint — Catalyst's cost model and
      AQE's runtime row counts pick broadcast-hash while the LM is
      model-sized and fall back to a shuffle join keyed on the gram
      when it isn't (a web-scale bigram table is 10^9+ rows; a forced
      broadcast there would OOM every executor);
    - ``True``: force the broadcast hint (pinned-plan/benchmark runs on
      known-small LMs);
    - ``False``: forbid it (regression-test the shuffle path).

    ``vocab_size`` may be an int or the one-row vocab DataFrame from
    :func:`ngram_lm_fit` (always broadcast — one row; keeps fit +
    score one fully-lazy plan).  Documents with fewer than two tokens
    get a NULL score.
    """
    if broadcast_lm not in (True, False, "auto"):
        raise ValueError("broadcast_lm must be True, False, or 'auto'")
    if isinstance(vocab_size, int):
        if vocab_size <= 0:
            raise ValueError("vocab_size must be positive")
        vocab_df = df.sparkSession.range(1).select(
            F.lit(vocab_size).alias("vs"))
    else:
        vocab_df = vocab_size.select(F.col("vs"))
    toks = f"split({text_col}, ' ')"
    pairs = df.select(
        F.col(id_col),
        F.explode(F.expr(
            f"CASE WHEN size({toks}) >= 2 THEN "
            f"transform(sequence(1, size({toks}) - 1), "
            f"i -> struct({toks}[i-1] AS w1, {toks}[i] AS w2)) "
            f"ELSE array() END")).alias("p")) \
        .select(id_col, "p.w1", "p.w2")
    hint = F.broadcast if broadcast_lm is True else (lambda d: d)
    uni_side = unigrams.select(F.col("w").alias("w1"), "c1")
    if broadcast_lm is False:
        # an explicit merge hint outranks broadcast in Catalyst's
        # strategy order, so AQE cannot re-introduce the broadcast
        bigrams = bigrams.hint("merge")
        uni_side = uni_side.hint("merge")
    joined = (pairs
              .join(hint(bigrams), ["w1", "w2"], "left")
              .join(hint(uni_side), ["w1"], "left")
              .crossJoin(F.broadcast(vocab_df))
              .withColumn("lp", F.log(
                  (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(add_k)))
                  / (F.coalesce(F.col("c1"), F.lit(0))
                     + F.lit(float(add_k)) * F.col("vs")))))
    per_doc = (joined.groupBy(id_col)
               .agg(F.round(F.exp(-F.sum("lp") / F.count(F.lit(1))), 4)
                    .alias(out_col)))
    return df.join(per_doc, id_col, "left")


# the live persisted pipeline frames (see ppl_buckets /
# register_persisted) — drained in full at the next pipeline run's
# ppl_buckets call; module-level so repeated calls in one process
# (bench reps, a service loop) never accumulate cache entries
_PPL_PERSISTED: list[DataFrame] = []


def register_persisted(df: DataFrame) -> None:
    """Register an externally ``persist``-ed frame for the NEXT pipeline
    run's drain (ppl_buckets unpersists every registered frame on
    entry).  Callers register AFTER their ppl_buckets call so the frame
    survives the current run and is reclaimed by the next one."""
    _PPL_PERSISTED.append(df)


def ppl_buckets(df: DataFrame, ppl_col: str = "ppl",
                out_col: str = "ppl_bucket",
                cuts: tuple[float, float] = (1 / 3, 2 / 3),
                exact: bool = False, accuracy: int = 10000,
                max_exact_rows: int = 2_000_000,
                probe_df: DataFrame | None = None) -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by perplexity
    percentile — head = the lowest-perplexity (most in-domain) third,
    tail = the highest.  Wenzek et al. 2020 train on head+middle and
    drop or down-weight tail.

    The two thresholds come from ONE global aggregation whose result (a
    scalar pair) is broadcast back via cross join — no collect; the
    bucket assignment is then a narrow map.  By default the thresholds
    are ``approx_percentile`` (Greenwald-Khanna sketch: mergeable
    O(accuracy) partials, so the cut job never concentrates the corpus'
    scores in one reducer — CCNet itself computes these cuts on a
    sample).  ``exact=True`` switches to exact interpolating
    percentiles for oracle-checkable runs; exact percentile is a
    holistic aggregate that buffers every score in the final task, so
    it is guarded by a bounded row probe (same contract as
    :func:`train_quality_classifier`) and refuses corpora above
    ``max_exact_rows``.  The probe counts ``probe_df`` when given — a
    frame the CALLER asserts has the same row count but a cheaper scan
    (e.g. the raw corpus before the per-doc LM scoring joins, which
    Catalyst cannot prove row-preserving) — else ``df`` itself.
    Documents with NULL perplexity (sub-2-token) land in 'tail'.

    The input frame is ``persist``ed before the cut: the threshold
    aggregate and the bucket-assignment output otherwise each recompute
    the ENTIRE upstream scoring pipeline (LM joins, feature extraction
    — the catalog's text_analysis plan ran 10 corpus scans for exactly
    this reason; guide §2.4).  persist, not localCheckpoint: it is
    lazy (no driver-side physical planning at call time — measured
    ~3 s on the deep text pipeline), keeps Catalyst statistics for any
    downstream join planning, and both consumers share one computation
    via the block store.  The PREVIOUS call's persisted frame is
    unpersisted on entry, so (a) at most one copy is ever registered
    per process and (b) a later identical pipeline can never be served
    from a stale CacheManager match — every run recomputes from its
    inputs.
    """
    while _PPL_PERSISTED:
        _PPL_PERSISTED.pop().unpersist()
    df = df.persist()
    _PPL_PERSISTED.append(df)
    if exact:
        probe = (probe_df if probe_df is not None else df) \
            .limit(max_exact_rows + 1).count()
        if probe > max_exact_rows:
            raise ValueError(
                f"corpus exceeds max_exact_rows={max_exact_rows}: exact "
                "percentile buffers every score in one task — use the "
                "default approx path (exact=False) at corpus scale, or "
                "raise max_exact_rows explicitly")
        # thresholds rounded to 6dp: interpolated percentiles differ in
        # the last ulp across engines when the cut lands on duplicated
        # values (lower+(hi-lo)*f vs lo*(1-f)+hi*f) — the rounding makes
        # the bucket boundary engine-portable
        pcts = df.agg(
            F.round(F.expr(f"percentile({ppl_col}, {cuts[0]!r})"), 6)
            .alias("__p_lo__"),
            F.round(F.expr(f"percentile({ppl_col}, {cuts[1]!r})"), 6)
            .alias("__p_hi__"))
    else:
        pcts = df.agg(
            F.round(F.expr(f"approx_percentile({ppl_col}, {cuts[0]!r}, "
                           f"{int(accuracy)})"), 6).alias("__p_lo__"),
            F.round(F.expr(f"approx_percentile({ppl_col}, {cuts[1]!r}, "
                           f"{int(accuracy)})"), 6).alias("__p_hi__"))
    return (df.crossJoin(F.broadcast(pcts))
            .withColumn(out_col,
                        F.when(F.col(ppl_col).isNull(), "tail")
                        .when(F.col(ppl_col) <= F.col("__p_lo__"), "head")
                        .when(F.col(ppl_col) <= F.col("__p_hi__"), "middle")
                        .otherwise("tail"))
            .drop("__p_lo__", "__p_hi__"))


def canonicalize_url(df: DataFrame, url_col: str = "url",
                     out_col: str = "canon_url") -> DataFrame:
    """C4/CommonCrawl-style URL canonicalization for crawl dedup:
    lowercase scheme+host, drop the fragment, strip tracking query
    parameters (utm_*, fbclid, gclid, ref), drop an emptied query
    string, strip default ports and a trailing slash, and emit the
    registrable-ish ``domain`` (last two host labels — a public-suffix
    list drops in here at production).  Two URLs that differ only in
    tracking noise then hash identically, which is what makes
    URL-level dedup catch re-crawls.

    Pure Catalyst ``regexp_replace`` chain — zero shuffle, RE2-safe
    patterns (the same chain runs in the DuckDB oracle).
    """
    steps = (
        # lowercase scheme://host (leave path/query case alone)
        (r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)",
         "__LOWER__"),                      # handled specially below
        (r"#.*$", ""),                      # fragment
        (r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*", r"$1"),
        (r"[?&]+$", ""),                    # emptied query
        (r"&{2,}", "&"), (r"\?&", "?"),     # collapse separators
        # no lookahead (RE2 oracle parity): capture the following char
        (r"^([A-Za-z]+://[^/?#]+):(?:80|443)([/?#]|$)", r"$1$2"),
        (r"^([A-Za-z]+://[^?#]*[^?#/])/+(\?|$)", r"$1$2"),  # trailing /
    )
    df = ensure_parallelism(df)
    c = F.col(url_col)
    for pat, repl in steps:
        if repl == "__LOWER__":
            c = F.concat(F.lower(F.regexp_extract(c, pat, 1)),
                         F.regexp_replace(c, pat, ""))
        else:
            c = F.regexp_replace(c, pat, repl)
    out = df.withColumn(out_col, c)
    return out.withColumn("domain", F.regexp_extract(
        F.col(out_col), r"^[A-Za-z]+://(?:[^/?#@]*@)?([^/?#:]+)", 1)
    ).withColumn("domain", F.regexp_extract(
        F.col("domain"), r"([^.]+\.[^.]+)$", 1))


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the CANONICAL url: one hash-groupBy on the md5 of
    the canonicalized form, min-id representative — :func:`exact_dedup`
    with URL normalization as the key function.  Output matches
    exact_dedup's (digest, keep_id, n_copies) contract.
    """
    canon = canonicalize_url(df, url_col)
    return (canon
            .groupBy(F.md5(F.col("canon_url")).alias("digest"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies")))


def linear_quality_score(df: DataFrame, weights: dict[str, float],
                         bias: float = 0.0, text_col: str = "text",
                         out_col: str = "clf_score") -> DataFrame:
    """Model-based quality scoring with a linear bag-of-words
    classifier — the fastText/CCNet-style "does this look like good
    text" filter (Wenzek et al. 2020, CCNet; Joulin et al. 2016,
    fastText).  ``weights`` is the trained token→weight table (here
    supplied by the caller; training happens offline), ``bias`` the
    intercept; the score is ``sigmoid(mean(w[token]) + bias)`` over the
    document's tokens.

    Execution: the weight table becomes a Catalyst ``map`` LITERAL
    folded into the plan and looked up inside one ``aggregate`` pass
    over the token array — zero shuffle, zero Python, no join.  That
    is the right shape while the vocabulary is model-sized (fastText
    quality classifiers use hashed buckets, 10⁵–10⁶ entries — a plan
    literal or a broadcast join both work; swap to a broadcast join by
    materializing ``weights`` as a DataFrame if the literal grows past
    the plan-size comfort zone).

    Unknown tokens contribute 0 — the conventional OOV treatment.
    """
    df = ensure_parallelism(df)
    if not weights:
        raise ValueError("weights must be a non-empty token->weight map")
    # the weight table is built with the COLUMN API, never interpolated
    # into a SQL string: vocabulary tokens come from raw corpus text, so
    # quotes/backslashes ("don't", "C:\\") must be data, not syntax
    wmap = F.create_map(*[x for tok, w in sorted(weights.items())
                          for x in (F.lit(tok),
                                    F.lit(float(w)).cast("double"))])
    toks = F.split(F.col(text_col), " ")
    total = F.aggregate(
        toks, F.lit(0.0).cast("double"),
        lambda a, t: a + F.coalesce(F.element_at(wmap, t),
                                    F.lit(0.0).cast("double")))
    logit = (total / F.greatest(F.size(toks), F.lit(1))
             + F.lit(float(bias)).cast("double"))
    return df.withColumn(
        out_col, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6))


# PII patterns: RE2-compatible (no backreferences/lookaround) so the
# SAME pattern string runs in Catalyst (Java regex) and any RE2-based
# engine (DuckDB oracle, production scrubbers).  Redaction order
# matters: emails before phones (an email's digit runs must not be
# eaten by the phone pattern's separator class).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9()\-\. ]{6,}[0-9]", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str = "clean_text") -> DataFrame:
    """PII redaction for training corpora: replace emails / IPv4
    addresses / international-format phone numbers with typed
    placeholder tokens and count each per document (the audit columns
    a compliance pass reads).

    Pure Catalyst ``regexp_replace`` / ``regexp_extract_all`` — JVM
    regex, whole-stage codegen, zero shuffle.  At 100 TB this is a
    scan-rate-bound map; the pattern list is deliberately small and
    RE2-safe so a production build can push the same patterns into any
    scrubbing stage (or swap in an ML NER pass behind the same column
    contract).
    """
    df = ensure_parallelism(df)
    out = df
    clean = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        # each kind is counted on the text as redacted SO FAR (not the
        # original): the counts then agree with what the sequential
        # redaction actually replaced — an email whose host looks like
        # an IP is one email, not an email plus an IP.  Patterns go
        # through the typed API, not an F.expr SQL string — SQL literal
        # unescaping would corrupt \b / \. in the patterns.
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(clean, F.lit(pat), F.lit(0))))
        clean = F.regexp_replace(clean, pat, token)
    return out.withColumn(out_col, clean)


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  ngram_n: int = 4, min_overlap: int = 2,
                  bench_text_col: str | None = None) -> DataFrame:
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

    def gram_expr(col: str) -> str:
        # coalesce BEFORE splitting: split(NULL) propagates NULL and
        # explode would silently drop the whole document from the
        # output, breaking the "one row per input doc" contract
        toks = f"split(coalesce({col}, ''), ' ')"
        return (f"array_distinct(transform("
                f"sequence(0, greatest(size({toks}) - {ngram_n}, 0)), "
                f"i -> array_join(slice({toks}, i + 1, {ngram_n}), ' ')))")

    grams = gram_expr(text_col)
    # the benchmark side may carry its text under a different column
    # name (e.g. raw eval sets vs a cleaned corpus)
    bench_grams = (benchmark
                   .select(F.explode(
                       F.expr(gram_expr(bench_text_col or text_col)))
                       .alias("gram"))
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
