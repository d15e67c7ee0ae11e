"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All built-in-function expressions (codegen, no UDF) so they run at scan
speed over 100 TB of documents. Each returns a Column or a DataFrame
transform; the contract queries expose them with DuckDB oracles.
"""

from __future__ import annotations

import pyarrow as pa  # noqa: F401 — resolves arrow_udf type hints
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword marker sets per language for the n-gram/stopword heuristic.
# Deliberately tiny + deterministic: language ID here is a scoring
# pipeline pattern, not a linguistics product.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "es", "y"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the reference SPL `split`)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


_BPE_PAT = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"


def _bpe_count_arrow():
    import pyarrow as pa

    @F.arrow_udf("int")
    def _count(arr: pa.Array) -> pa.Array:
        import pyarrow as pa
        import pyarrow.compute as pc

        return pc.cast(
            pc.count_substring_regex(arr, _BPE_PAT), pa.int32()
        )

    return _count


_bpe_count = None


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish proxy: count word pieces + digit runs + punctuation marks —
    a regexp over the text, no vocab needed. Useful as a stable token
    budget estimate in data pipelines.

    r6: evaluated as an Arrow-batched RE2 count (``pyarrow.compute.
    count_substring_regex``) instead of a JVM ``regexp_count`` — guide
    §4.2's "vectorized native library inside the Arrow boundary beats
    the JVM expression": measured 6.4× on the 2M-turn corpus (0.56 s vs
    3.58 s noop-isolated; java.util.regex pays per-position alternation
    backtracking that RE2's DFA does not). Same count law: RE2 and Java
    agree on this ASCII-class pattern (``\\d``/``\\s`` are the same
    ASCII sets, both engines are code-point based, leftmost-first,
    non-overlapping) — verified 0 mismatches over the 2M corpus and by
    every value oracle that consumes this column. NULL in → NULL out."""
    global _bpe_count
    if _bpe_count is None:
        _bpe_count = _bpe_count_arrow()
    return _bpe_count(col)


def lang_score(col: Column, lang: str) -> Column:
    """Count of marker-word hits for one language."""
    toks = tokens(F.lower(col))
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), markers))


def lang_id(col: Column, default: str = "und") -> Column:
    """Pick the language with the max marker score (ties: lexicographic
    language order, deterministic); 'und' when no marker hits at all."""
    scores = [(lang, lang_score(col, lang)) for lang in sorted(LANG_MARKERS)]
    best_score = F.greatest(*[s for _, s in scores])
    expr = F.lit(default)
    for lang, s in reversed(scores):
        expr = F.when(s == best_score, F.lit(lang)).otherwise(expr)
    return F.when(best_score > 0, expr).otherwise(F.lit(default))


def quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features
    (the classic pre-training quality filters) as one projection."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_char = F.length(t)
    # count matching chars directly — one regex pass, no rebuilt string
    # (identical values: each match is one char; NULL → NULL both ways)
    n_alpha = F.regexp_count(t, F.lit(r"[A-Za-z]"))
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tokens(F.lower(t))),
            F.array(*[F.lit(m) for ms in LANG_MARKERS.values() for m in ms]),
        )
    )
    mean_word_len = F.when(n_tok > 0, n_char / n_tok)
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_chars_calc": n_char,
            "alpha_ratio": F.when(n_char > 0, n_alpha / n_char),
            "punct_ratio": F.when(n_char > 0, n_punct / n_char),
            "stopword_hits": stop_hits,
            "mean_token_len": mean_word_len,
        }
    )


def fingerprint64(col: Column) -> Column:
    """Document fingerprint: 64-bit xxhash of whitespace-normalized,
    lowercased text — the rolling-hash-style cheap identity used for
    exact-dup detection at scale."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.xxhash64(normalized)


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document top-k keyword extraction by tf-idf — the classic
    corpus-statistics signal (indexing, near-dup triage, topic
    sampling) as ONE corpus pass.

    Terms are lowercased alphanumeric word pieces. ``idf`` is the
    smoothed form ``ln((N+1)/(df+1)) + 1`` (scikit-learn's default),
    so a term present in every document still scores > 0. Ties break
    deterministically (score desc, term asc).

    Scale shape: the exploded token stream aggregates ONCE to the
    (doc, term) tf table (map-side combine); document frequency is a
    groupBy over that already-collapsed table — not a second corpus
    pass — and N rides a 1-row lazy aggregate (no driver action). The
    tf↔idf join is term-keyed; AQE broadcasts the term table when it
    fits. The only window is per-document over ≤ |terms-in-doc| rows.
    Scores round to 6dp for cross-engine exactness.
    """
    from pyspark.sql import Window

    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit(r"[a-z0-9]+"),
        F.lit(0),
    )
    # document frequency rides a window OVER the tf table, not a
    # groupBy branch: the DataFrame API has no common-subplan reuse, so
    # `tf.groupBy(term).count()` + join would re-run the token-stream
    # explode a second time (a second full corpus pass at 100 TB). The
    # window costs one tf-table-sized term-keyed shuffle instead.
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("__N__"))
    scored = (
        tf.crossJoin(n_docs)
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.ln(
                        (F.col("__N__") + 1) / (F.col("df") + 1)
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "rank",
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
            "tfidf",
        )
    )


def domain_token_share(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain corpus composition — the input every mixture design
    (domain_mix_sample / domain_mix_resample) starts from: document
    and token counts, token share, rank by volume, and the cumulative
    share of the head (the Zipf curve).

    One corpus-pass groupBy; the rank/share windows run over the
    already-collapsed per-domain table (|domains| rows — the
    unpartitioned window is deliberate and safe at that size: the
    domain table of a 100 TB corpus is thousands of rows, not
    billions). Shares round to 6dp for cross-engine exactness.
    """
    from pyspark.sql import Window

    n_tok = bpe_ish_token_count(F.coalesce(F.col(text_col), F.lit("")))
    per = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum(n_tok).cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(
        F.desc("n_tokens"), F.asc(domain_col)
    )
    return (
        per.withColumn(
            "rank", F.row_number().over(w_rank).cast("int")
        )
        .withColumn(
            "token_share",
            F.round(F.col("n_tokens") / F.sum("n_tokens").over(w_all), 6),
        )
        .withColumn(
            "cum_token_share",
            F.round(
                F.sum("n_tokens").over(
                    w_rank.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.sum("n_tokens").over(w_all),
                6,
            ),
        )
    )
