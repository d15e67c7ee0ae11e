"""Corpus-cleaning filters for LLM training-data pipelines.

Implements the two public heuristic families everyone uses, as pure
built-in expressions (no UDFs, fully pushdown-friendly):

* C4-style line filtering (Raffel et al. 2020, §2.2): keep a line only if
  it ends in terminal punctuation, has ≥ `min_words` words, and contains
  neither curly braces nor boilerplate markers ("javascript", "cookie
  policy", "lorem ipsum", "all rights reserved").
* Gopher-style document rules (Rae et al. 2021, table A1 subset): word
  count bounds, mean word length in [3, 10], symbol-to-word ratio caps
  (# and ellipsis), bullet/ellipsis line-ratio caps, and a minimum count
  of common English stop words.

Both emit *signals + verdict* rather than silently dropping, so the
pipeline can route rejects to a quarantine sink (the same
multicast-router shape as the log pipeline) and the thresholds stay
auditable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TERMINAL = (".", "!", "?", '"', "'")
_BOILERPLATE = ("javascript", "cookie policy", "lorem ipsum",
                "all rights reserved")
_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def c4_line_filter(
    text: Column, min_words: int = 3
) -> Column:
    """Return the text with non-qualifying lines removed (C4 §2.2)."""
    lines = F.split(text, r"\n", -1)

    def keep(line: Column) -> Column:
        t = F.trim(line)
        lower = F.lower(t)
        words = F.size(F.split(t, r"\s+", -1))
        ends_ok = F.lit(False)
        for p in _TERMINAL:
            ends_ok = ends_ok | t.endswith(p)
        boiler = F.lit(False)
        for b in _BOILERPLATE:
            boiler = boiler | lower.contains(b)
        return (
            ends_ok
            & (words >= min_words)
            & ~t.contains("{")
            & ~t.contains("}")
            & ~boiler
        )

    return F.array_join(F.filter(lines, keep), "\n")


def gopher_signals(text: Column) -> Column:
    """Struct of Gopher-rule signals over one document."""
    words = F.split(F.trim(text), r"\s+", -1)
    n_words = F.size(words)
    word_lens = F.transform(words, lambda w: F.length(w))
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(word_lens, F.lit(0), lambda a, x: a + x).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))
    n_hash = F.size(F.split(text, r"#", -1)) - 1
    n_ellipsis = F.size(F.split(text, r"\.\.\.", -1)) - 1
    lines = F.split(text, r"\n", -1)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[\-\*•]"))
    )
    ellipsis_lines = F.size(F.filter(lines, lambda l: F.trim(l).endswith("...")))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, lambda w: F.lower(w)),
            F.array(*[F.lit(s) for s in _STOPWORDS]),
        )
    )
    return F.struct(
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(
            F.when(n_words > 0, (n_hash + n_ellipsis) / n_words).otherwise(0.0), 6
        ).alias("symbol_ratio"),
        F.round(bullet_lines / n_lines, 6).alias("bullet_line_ratio"),
        F.round(ellipsis_lines / n_lines, 6).alias("ellipsis_line_ratio"),
        stop_hits.alias("stop_word_hits"),
    )


def gopher_verdict(
    sig: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_stop_words: int = 2,
) -> Column:
    return (
        sig["n_words"].between(min_words, max_words)
        & sig["mean_word_len"].between(min_mean_wl, max_mean_wl)
        & (sig["symbol_ratio"] <= max_symbol_ratio)
        & (sig["bullet_line_ratio"] <= max_bullet_ratio)
        & (sig["ellipsis_line_ratio"] <= max_ellipsis_ratio)
        & (sig["stop_word_hits"] >= min_stop_words)
    )


def quality_filter(
    df: DataFrame, text_col: str = "text", **thresholds
) -> DataFrame:
    """Attach ``gopher`` signal struct + ``keep`` verdict — route on
    ``keep`` instead of filtering so rejects stay auditable."""
    sig = gopher_signals(F.col(text_col))
    out = df.withColumn("gopher", sig)
    return out.withColumn(
        "keep", gopher_verdict(F.col("gopher"), **thresholds)
    )


def _word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams as strings; EMPTY array when the doc has < n words
    (no short-doc fallback gram — keeps parity with generate_series
    oracles)."""
    words = F.split(F.trim(text), r"\s+", -1)
    size = F.size(words)
    return F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 2,
) -> DataFrame:
    """Gopher/RefinedWeb repetition signals (Rae et al. 2021 table A1
    "repetition" family), DISTRIBUTED — explode + groupBy, never a
    per-row O(n²) loop:

    * ``dup_line_frac``       — duplicate lines / total lines
    * ``dup_line_char_frac``  — chars of repeated line occurrences
                                (beyond each line's first) / total chars
    * ``top_ngram_char_frac`` — chars covered by the most-repeated word
                                n-gram: max over grams with count ≥ 2 of
                                ``count × len(gram)``, / total chars
                                (0 when nothing repeats)

    Plan shape: two (id, token) shuffles (lines, grams) reduced to
    per-doc scalars, joined back by id — at 100 TB both aggregations are
    map-side-combinable and the join keys are the doc ids, so this
    pipelines with the rest of the corpus pass."""
    base = df.select(
        F.col(id_col).alias("__id__"),
        F.length(F.col(text_col)).alias("__nc__"),
        F.split(F.col(text_col), r"\n", -1).alias("__lines__"),
        _word_ngrams(F.col(text_col), ngram_n).alias("__grams__"),
    )
    line_stats = (
        base.select("__id__", "__nc__", F.explode("__lines__").alias("line"))
        .groupBy("__id__", F.col("__nc__"), F.col("line"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("__id__")
        .agg(
            F.sum("cnt").alias("n_lines"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum((F.col("cnt") - 1) * F.length("line")).alias("dup_chars"),
            F.first("__nc__").alias("__nc__"),
        )
        .select(
            "__id__",
            F.round(
                (F.col("n_lines") - F.col("n_distinct"))
                / F.greatest(F.col("n_lines"), F.lit(1)),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.col("dup_chars") / F.greatest(F.col("__nc__"), F.lit(1)), 6
            ).alias("dup_line_char_frac"),
        )
    )
    gram_stats = (
        base.select("__id__", "__nc__", F.explode("__grams__").alias("gram"))
        .groupBy("__id__", F.col("__nc__"), F.col("gram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("__id__")
        .agg(
            F.max(
                F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram"))
                .otherwise(F.lit(0))
            ).alias("rep_chars"),
            F.first("__nc__").alias("__nc__"),
        )
        .select(
            "__id__",
            F.round(
                F.col("rep_chars") / F.greatest(F.col("__nc__"), F.lit(1)), 6
            ).alias("top_ngram_char_frac"),
        )
    )
    return (
        df.join(line_stats, df[id_col] == line_stats["__id__"], "left")
        .drop("__id__")
        .join(gram_stats, df[id_col] == gram_stats["__id__"], "left")
        .drop("__id__")
        .fillna(
            {
                "dup_line_frac": 0.0,
                "dup_line_char_frac": 0.0,
                "top_ngram_char_frac": 0.0,
            }
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Test-set decontamination: flag training docs sharing ANY word
    n-gram with a benchmark/eval set (the standard 8-gram/13-gram overlap
    rule from GPT-3 appx C / PaLM / Llama eval hygiene).

    Plan shape: benchmark → distinct n-grams (small) → BROADCAST; docs →
    explode n-grams (narrow) → broadcast hash join → per-doc hit count →
    left join back. The 100 TB side (docs) never shuffles on grams.
    Grams join as strings here so the result is oracle-checkable; at
    scale hash them (``xxhash64``) to shrink the broadcast — identical
    semantics modulo 64-bit collisions.

    Returns docs + ``n_hits`` (distinct matched grams) + ``contaminated``.
    """
    bench_grams = (
        benchmark.select(
            F.explode(_word_ngrams(F.col(bench_text_col), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("__id__"),
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("__id__")
        .agg(F.count_distinct(F.col("gram")).alias("n_hits"))
    )
    return (
        docs.join(hits, docs[id_col] == hits["__id__"], "left")
        .drop("__id__")
        .fillna({"n_hits": 0})
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


def boilerplate_ngram_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 5,
) -> DataFrame:
    """Cross-document boilerplate score — the corpus-wide approximation
    of substring-level training-data dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): a document whose word
    ``n``-grams mostly also appear in ≥ ``min_df`` other documents is
    boilerplate/template material even when no single pair of documents
    is a near-duplicate (so MinHash misses it).

    Per document: its DISTINCT word n-grams; per n-gram: document
    frequency (each doc contributes once); per document again: the
    fraction of its n-grams whose df ≥ ``min_df``.

    Scale shape: ONE corpus pass builds the (doc, gram) table
    (map-side-combinable explode of distinct grams); the gram df rides
    a window over that table (gram-keyed shuffle — NOT a groupBy
    branch, which would re-run the explode), then one doc-keyed
    groupBy. Documents shorter than ``n`` tokens emit ``n_grams = 0``
    with a NULL fraction (kept via a left join back to the id set).
    """
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit(r"[a-z0-9]+"),
        F.lit(0),
    )
    n_tok = F.size(toks)
    grams = F.when(
        n_tok >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_tok - F.lit(n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = df.select(F.col(id_col), F.explode(grams).alias("g")).withColumn(
        "gram_df", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    per_doc = g.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_grams"),
        F.sum(
            F.when(F.col("gram_df") >= min_df, 1).otherwise(0)
        ).cast("int").alias("n_boilerplate_grams"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_boilerplate_grams"), F.lit(0)).alias(
                "n_boilerplate_grams"
            ),
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("n_boilerplate_grams") / F.col("n_grams"), 6),
            ).alias("boilerplate_frac"),
        )
    )
