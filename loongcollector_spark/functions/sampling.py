"""Deterministic sampling for training-data pipelines.

Engine-added operators (no reference analogue — LoongCollector ships
logs, it does not curate corpora): the sampling family a 100 TB
training-data pipeline needs on top of the dedup/quality ops. All three
are DETERMINISTIC functions of row content — re-running the job, adding
executors, or re-partitioning the input never changes which rows are
kept, unlike ``DataFrame.sample`` whose output depends on partition
layout. That property is what makes sampled corpora reproducible and
incrementally extendable (a new batch of documents joins the same
sample law).

Mechanism: an md5 *hex-prefix* threshold. ``md5`` agrees byte-for-byte
across engines (Spark, DuckDB, Python hashlib), and hex strings compare
lexicographically like the integers they encode, so ``substr(md5(key),
1, 8) < '40000000'`` IS "hash bucket < 0.25 of the space" — exact,
portable, and expressible in ANSI SQL for the value oracle. Resolution
is 16^-8 ≈ 2.3e-10 of the rate.

Physical shape at scale: ``hash_sample`` and ``hash_split`` are narrow
projections/filters (no shuffle, whole-stage codegen); ``stratified_
quota_sample`` is one hash-partitioned window per stratum — the same
single-Exchange shape as any per-group top-k, with the hash rank making
the "which K documents" choice deterministic rather than
partition-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # prefix width: 16^8 buckets


def _bucket_hex(key: Column, salt: str) -> Column:
    """First 8 md5 hex chars of (key || salt) — the row's sample
    coordinate in [0, 16^8), encoded as a lexicographically ordered hex
    string. ``salt`` decorrelates independent draws over the same key
    space (e.g. a 10% eval sample independent of a 50% train sample)."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(salt)).cast("binary")),
        1,
        _HEX_DIGITS,
    )


def _threshold_hex(rate: float) -> str:
    if not (0.0 <= rate <= 1.0):
        raise ValueError("rate must be in [0, 1]")
    return format(min(int(rate * 16**_HEX_DIGITS), 16**_HEX_DIGITS - 1), "08x")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its hash bucket
    falls below ``rate``. Same key → same verdict on every run, every
    cluster size, every partitioning. ``rate >= 1.0`` is exactly the
    identity (ADVICE r5: the clamped threshold 'ffffffff' silently
    dropped the ~1-in-2^32 rows whose bucket is exactly 'ffffffff')."""
    if rate >= 1.0:
        return df
    return df.where(_bucket_hex(F.col(key_col), salt) < F.lit(_threshold_hex(rate)))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the label
    whose cumulative-weight interval contains its hash bucket. Weights
    must sum to 1 (within float tolerance); label order follows dict
    insertion order, so the same dict always yields the same intervals.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1 (got {total})")
    if not weights:
        raise ValueError("at least one split required")
    bucket = _bucket_hex(F.col(key_col), salt)
    expr = None
    acc = 0.0
    labels = list(weights)
    for name in labels[:-1]:
        acc += weights[name]
        cond = bucket < F.lit(_threshold_hex(acc))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(labels[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def domain_mix_sample(
    df: DataFrame,
    rates: dict[str, float],
    domain_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic corpus-mixture reweighting: keep a row iff its hash
    bucket falls below the rate of its DOMAIN (source/lang/crawl-snapshot
    …). The standard training-data move — downsample boilerplate-heavy
    domains, keep curated ones — as a pure content-hash law: same
    (key, domain) → same verdict on every run and every cluster size,
    and two mixes over the same corpus with different salts are
    independent draws. Rates are keep-probabilities in [0, 1] (this
    subsamples; upsampling is a repeat-explode, not a filter). Domains
    absent from ``rates`` get ``default_rate``.

    Physical shape: a narrow whole-stage-codegen filter — the per-domain
    threshold is an inline literal CASE over the (small) rates dict, the
    same inline-literal-map idiom as DictMap ≤64 entries — no join, no
    shuffle, stream-compatible."""
    bucket = _bucket_hex(F.col(key_col), salt)

    def _keep(rate: float) -> Column:
        # rate >= 1.0 keeps everything (ADVICE r5: the clamped threshold
        # dropped bucket == 'ffffffff' rows)
        if rate >= 1.0:
            return F.lit(True)
        return bucket < F.lit(_threshold_hex(rate))

    keep = None
    for dom, rate in rates.items():
        cond = F.col(domain_col) == F.lit(dom)
        k = _keep(rate)
        keep = F.when(cond, k) if keep is None else keep.when(cond, k)
    default_k = _keep(default_rate)
    keep = default_k if keep is None else keep.otherwise(default_k)
    return df.where(keep)


def domain_mix_resample(
    df: DataFrame,
    rates: dict[str, float],
    domain_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 1.0,
    copy_col: str = "copy_n",
) -> DataFrame:
    """Deterministic mixture resampling with UPSAMPLING: a domain rate
    r means every row yields ``floor(r)`` copies plus one more iff its
    hash bucket < ``frac(r)`` — so r = 2.3 triples 30% of rows and
    doubles the rest (expected multiplicity exactly r), r = 0.4 is the
    :func:`domain_mix_sample` filter, r = 1 is identity. The epoch-
    mixture law training corpora actually use (quality domains repeat,
    bulk crawl thins) as a pure content-hash function: same (key,
    domain) → same copy count everywhere, no RNG state.

    Output repeats input rows with ``copy_col`` = 1..n tagging the
    copy ordinal (so downstream shuffles can decorrelate copies by
    salting on it). Shape: one generate-explode over an inline CASE —
    narrow, no shuffle; output size is sum(r_d × n_d), the caller's
    chosen blow-up."""
    for dom, rate in rates.items():
        if rate < 0:
            raise ValueError(f"rate for {dom!r} must be >= 0")
    if default_rate < 0:
        raise ValueError("default_rate must be >= 0")
    bucket = _bucket_hex(F.col(key_col), salt)

    def n_copies(rate: float) -> Column:
        base = int(rate)
        frac = rate - base
        return F.lit(base) + (bucket < F.lit(_threshold_hex(frac))).cast("int")

    expr = None
    for dom, rate in rates.items():
        cond = F.col(domain_col) == F.lit(dom)
        expr = (
            F.when(cond, n_copies(rate))
            if expr is None
            else expr.when(cond, n_copies(rate))
        )
    n = n_copies(default_rate) if expr is None else expr.otherwise(
        n_copies(default_rate)
    )
    # NB sequence(1, 0) is DESCENDING [1, 0] in Spark — zero-copy rows
    # must produce an EMPTY array (explode then drops them)
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(copies))


def stratified_quota_sample(
    df: DataFrame,
    strata_cols: list[str],
    quota: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exact per-stratum quota: the ``quota`` rows with the SMALLEST
    hash buckets in each stratum (ties broken by key). Deterministic
    top-k per group — a stratum with fewer rows than the quota keeps
    them all. One hash-partitioned window (single Exchange); at 10^12
    rows the stratum count, not the row count, bounds the driver state
    (none) and the skew story is the usual per-group top-k: a hot
    stratum is still one sort-partition, cap strata cardinality
    accordingly or pre-aggregate."""
    if quota < 1:
        raise ValueError("quota must be >= 1")
    w = Window.partitionBy(*strata_cols).orderBy(
        _bucket_hex(F.col(key_col), salt), F.col(key_col)
    )
    rn = F.row_number().over(w)
    return (
        df.withColumn("__rn__", rn)
        .where(F.col("__rn__") <= quota)
        .drop("__rn__")
    )
