"""10x scale point for the NON-graph operators (round-3 VERDICT item 5).

The 18M-edge scaling table (BENCH/BASELINE.md) covers CC/PageRank; this
script gives minhash banding, salted top-k, brute-force + IVF kNN, and
the broadcast star-schema join their own 1x → 10x datapoint. Inputs are
generated deterministically at both sizes with the SAME distributions
(word-salad docs with planted dups, 10-cluster dim-64 embeddings,
hot-key events, TPC-H-ish lineitem→orders→customer→nation chain) so the
ratio measures the PLAN's scaling, not a distribution change. Cached as
parquet under .data/.

Scale-1 sizes mirror the driver's sf0.1 tables (docs 5k, emb 2k,
lineitem 600k, events 100k); scale-10 is 10x each.

Usage: python scripts/sf1_bench.py [reps]   (default 3, median)
Prints one JSON line + markdown rows for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_connected_components_spark.session import get_spark  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".data")
VOCAB = (
    "spark line column order small sort fast value scan batch part query agg "
    "table hash the a big merge group filter stream key customer slow vector"
).split()
DIM = 64


def gen_tables(spark, scale: int) -> dict[str, str]:
    """Write (once) and return paths for docs/emb/events/star tables."""
    out = {}
    base = os.path.join(DATA, f"sf1bench_x{scale}")
    n_docs, n_emb = 5000 * scale, 2000 * scale
    n_events, n_li = 100_000 * scale, 600_000 * scale
    n_ord, n_cust = n_li // 4, n_li // 40

    def write(name, df):
        path = os.path.join(base, name)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df.write.mode("overwrite").parquet(path)
        out[name] = path

    i = F.col("id")
    # documents: 8-100 words from VOCAB keyed on a text key; every 500th
    # doc clones its predecessor (planted exact/near dups for banding)
    tk = F.when(i % 500 == 1, i - 1).otherwise(i)
    n_words = (F.xxhash64(tk, F.lit("nw")) % 93 + 100) % 93 + 8
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda k: vocab[
            ((F.xxhash64(tk, k) % len(VOCAB)) + len(VOCAB)).cast("int") % len(VOCAB)
        ],
    )
    write(
        "documents",
        spark.range(n_docs).select(
            i.alias("doc_id"), F.array_join(words, " ").alias("text")
        ),
    )
    # embeddings: 10 cluster centers + per-vector noise, dim 64
    lab = (i % 10).cast("int")
    emb = F.array(
        *[
            (
                ((F.xxhash64(lab, F.lit(d)) % 1000 + 1000) % 1000) / 500.0
                + ((F.xxhash64(i, F.lit(d)) % 200 + 200) % 200 - 100) / 500.0
            ).cast("float")
            for d in range(DIM)
        ]
    )
    write(
        "embeddings",
        spark.range(n_emb).select(i.alias("vec_id"), emb.alias("embedding"), lab.alias("label")),
    )
    # events: zipf-ish hot keys — 30% of rows land on 3 users
    hot = (F.xxhash64(i, F.lit("h")) % 10 + 10) % 10 < 3
    user = F.when(hot, (i % 3)).otherwise((F.xxhash64(i, F.lit("u")) % (n_events // 50)))
    write(
        "events",
        spark.range(n_events).select(
            i.alias("event_id"),
            user.cast("long").alias("user_id"),
            (((F.xxhash64(i, F.lit("v")) % 1000) + 1000) % 1000 / 10.0).alias("value"),
        ),
    )
    # star schema: lineitem → orders → customer → nation(25)
    write(
        "lineitem",
        spark.range(n_li).select(
            (i % n_ord).alias("l_orderkey"),
            (((F.xxhash64(i) % 90000 + 90000) % 90000 + 90000) / 100.0)
            .cast("decimal(12,2)").alias("l_extendedprice"),
            (((F.xxhash64(i, F.lit("d")) % 10 + 10) % 10) / 100.0)
            .cast("decimal(12,2)").alias("l_discount"),
        ),
    )
    write(
        "orders",
        spark.range(n_ord).select(
            i.alias("o_orderkey"), (i % n_cust).alias("o_custkey")
        ),
    )
    write(
        "customer",
        spark.range(n_cust).select(
            i.alias("c_custkey"), (i % 25).cast("int").alias("c_nationkey")
        ),
    )
    write(
        "nation",
        spark.range(25).select(
            i.cast("int").alias("n_nationkey"),
            F.concat(F.lit("NATION_"), i.cast("string")).alias("n_name"),
        ),
    )
    return out


def ops(spark, paths):
    from parallel_connected_components_spark.operators.dedup import (
        minhash_near_duplicates,
    )
    from parallel_connected_components_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivf,
    )
    from parallel_connected_components_spark.operators.skew import salted_topk_per_key

    docs = spark.read.parquet(paths["documents"])
    emb = spark.read.parquet(paths["embeddings"])
    ev = spark.read.parquet(paths["events"])
    li = spark.read.parquet(paths["lineitem"])
    o = spark.read.parquet(paths["orders"])
    c = spark.read.parquet(paths["customer"])
    n = spark.read.parquet(paths["nation"])

    def star_join():
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(22,4)"
                    )
                ).alias("revenue")
            )
            .count()
        )

    from parallel_connected_components_spark.operators.dedup import dedup_clusters

    return {
        "minhash_near_dup": lambda: minhash_near_duplicates(
            docs, num_perm=32, num_bands=8, threshold=0.5
        ).count(),
        "dup_clusters": lambda: dedup_clusters(
            spark, docs, num_perm=32, num_bands=8, threshold=0.5
        ).count(),
        "salted_topk": lambda: salted_topk_per_key(
            ev, "user_id", "value", k=3, tiebreak_col="event_id"
        ).count(),
        "knn_bruteforce": lambda: knn_bruteforce(emb, list(range(10)), k=5).count(),
        "knn_ivf": lambda: knn_ivf(emb, list(range(10)), k=5).count(),
        "star_join_revenue": star_join,
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("sf1-bench")
    spark.range(1024).mapInPandas(lambda it: iter(it), schema="id long").count()
    result = {"reps": reps, "timing": "median"}
    for scale in (1, 10):
        paths = gen_tables(spark, scale)
        for name, fn in ops(spark, paths).items():
            samples = sorted(
                (lambda: (lambda t0: (fn(), time.perf_counter() - t0)[1])(
                    time.perf_counter()
                ))()
                for _ in range(reps)
            )
            result[f"{name}_x{scale}"] = round(samples[(reps - 1) // 2], 3)
    print(json.dumps(result))
    print("\n| operator | 1x | 10x | ratio (10 = linear) |")
    print("|---|---|---|---|")
    for name in ("minhash_near_dup", "dup_clusters", "salted_topk",
                 "knn_bruteforce", "knn_ivf", "star_join_revenue"):
        a, b = result[f"{name}_x1"], result[f"{name}_x10"]
        print(f"| {name} | {a} s | {b} s | {b / max(a, 1e-9):.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
