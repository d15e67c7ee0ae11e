"""Linearity of the LLM-ops suite at 10x corpus + chunked-FSM ChunkRows
sweep (VERDICT r4 #6).

10x documents are built from sf0.1's 5,000 docs as 10 deterministic
replicas with a per-replica character translation: within a replica every
doc is transformed identically, so the replica's internal near-duplicate
structure (shingle Jaccard) is EXACTLY preserved, while cross-replica
shingles share (almost) nothing — candidate pairs, verified pairs, and
clusters therefore scale exactly 10x and the measurement isolates the
ENGINE's cost growth, not a change in problem shape. 10x embeddings are
10 rotations of the vector (norms and within-replica geometry preserved,
cross-replica dot products scrambled); the ANN query set stays fixed at
100 queries, so the row measures cost growth in the INDEXED corpus.

Chunked-FSM sweep: plain vs ChunkRows {64k, 256k, 1M} vs 'auto' on the
2M-row bench corpus (hot conversation = 20% of rows = 400k) and on the
20M-row corpus (hot group 4M rows — past the auto threshold).

Usage: python scripts/linearity_llmops.py [--skip-20m]
Prints one JSON object; results recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ALPHA = "etaoinsrhldcum"  # frequent letters; rotated per replica


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, reps=2):
    fn()  # warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def build_docs10(spark, docs, path):
    if not os.path.exists(path + "/_SUCCESS"):
        parts = []
        for rep in range(10):
            rot = ALPHA[rep:] + ALPHA[:rep]
            parts.append(
                docs.select(
                    (F.col("doc_id") + rep * 10_000_000).alias("doc_id"),
                    (
                        F.col("text")
                        if rep == 0
                        else F.translate(F.col("text"), ALPHA, rot)
                    ).alias("text"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(64).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def build_emb10(spark, emb, dim, path):
    if not os.path.exists(path + "/_SUCCESS"):
        parts = []
        for rep in range(10):
            e = F.col("embedding")
            rotated = (
                e
                if rep == 0
                else F.concat(
                    F.slice(e, rep * 6 + 1, dim - rep * 6), F.slice(e, 1, rep * 6)
                )
            )
            parts.append(
                emb.select(
                    (F.col("vec_id") + rep * 10_000_000).alias("vec_id"),
                    rotated.alias("embedding"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(64).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main():
    from loongcollector_spark.session import get_spark
    from loongcollector_spark.functions.dedup import (
        dedup_clusters,
        minhash_lsh_candidates,
    )
    from loongcollector_spark.functions.similarity import lsh_ann_topk
    from loongcollector_spark.operators.splits import MergeMultilineLog
    from loongcollector_spark.sources.transcripts import generate_transcripts

    skip_20m = "--skip-20m" in sys.argv
    spark = get_spark(master="local[32]")
    res: dict[str, object] = {}

    # both scales at 64 partitions: the sf parquet is one ~2 MB split,
    # which would serialize the 1x signature projection on one core and
    # overstate the 10x ratio (production inputs arrive in many splits)
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
    docs10 = build_docs10(spark, docs1, "/tmp/lc_bench/docs10x")
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(64)
    emb10 = build_emb10(spark, emb1, 64, "/tmp/lc_bench/emb10x")
    res["docs_1x"] = docs1.count()
    res["docs_10x"] = docs10.count()

    # sanity: pair volume scales ~10x (problem shape preserved)
    n_pairs_1 = minhash_lsh_candidates(docs1).count()
    n_pairs_10 = minhash_lsh_candidates(docs10).count()
    res["minhash_pairs_1x"] = n_pairs_1
    res["minhash_pairs_10x"] = n_pairs_10

    res["minhash_lsh_1x_sec"] = timed(lambda: noop(minhash_lsh_candidates(docs1)))
    res["minhash_lsh_10x_sec"] = timed(lambda: noop(minhash_lsh_candidates(docs10)))

    q = emb1.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    res["lsh_ann_1x_sec"] = timed(
        lambda: noop(lsh_ann_topk(emb1, q, dim=64, k=10, n_planes=8))
    )
    res["lsh_ann_10x_sec"] = timed(
        lambda: noop(lsh_ann_topk(emb10, q, dim=64, k=10, n_planes=8))
    )

    for tag, d in (("1x", docs1), ("10x", docs10)):
        path = f"/tmp/lc_bench/lin_pairs_{tag}"
        if not os.path.exists(path + "/_SUCCESS"):
            minhash_lsh_candidates(d).write.mode("overwrite").parquet(path)
        pairs = spark.read.parquet(path)
        res[f"clusters_{tag}_sec"] = timed(lambda p=pairs: noop(dedup_clusters(p)))

    # --- chunked FSM ChunkRows sweep -----------------------------------
    def fsm(corpus, chunk):
        return MergeMultilineLog(
            SourceKey="text", GroupKey="conv_id", OrderKey="turn_idx",
            StartPattern=r"^\{", EndPattern=r"\|", ChunkRows=chunk,
        )(corpus)

    for rows_n, reps in ((2_000_000, 2), (20_000_000, 1)):
        if rows_n == 20_000_000 and skip_20m:
            continue
        cp = f"/tmp/lc_bench/corpus_{rows_n}"
        if not os.path.exists(cp + "/_SUCCESS"):
            generate_transcripts(spark, rows_n, partitions=128).write.mode(
                "overwrite"
            ).parquet(cp)
        corpus = spark.read.parquet(cp)
        tag = f"{rows_n // 1_000_000}m"
        res[f"fsm_{tag}_plain_sec"] = timed(
            lambda: noop(fsm(corpus, None)), reps
        )
        for c in (65_536, 262_144, 1_048_576):
            res[f"fsm_{tag}_chunk{c // 1024}k_sec"] = timed(
                lambda c=c: noop(fsm(corpus, c)), reps
            )
        res[f"fsm_{tag}_auto_sec"] = timed(
            lambda: noop(fsm(corpus, "auto")), reps
        )

    print(json.dumps(res))


if __name__ == "__main__":
    main()
