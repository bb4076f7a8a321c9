"""A/B harness for the simhash_fingerprint perf drift (VERDICT r4 item 1).

Compares the current per-occurrence-md5 form (dedup.py:_simhash_words)
against the round-2 (doc_id, word) pre-agg form at sf0.1 and at the 30x
trend corpus size, reps=3 each, and prints a JSON verdict line the
builder records in BENCH_DETAIL.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.operators.dedup import _SPARK_TOKS, _simhash_words
from cc_mapreducer_spark.tables import load_table, spread


def _simhash_words_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-2 form: group to (doc_id, word, count) first, md5 per
    distinct word, votes weighted by count. Costs one extra Exchange of
    n_distinct(doc,word) rows; saves md5 CPU on repeated tokens."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.expr(_SPARK_TOKS)).alias("word"))
    tokcnt = toks.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    hashed = tokcnt.select("doc_id", "c", F.md5("word").alias("m")).select(
        "doc_id",
        "c",
        F.conv(F.substring("m", 1, 8), 16, 10).cast("bigint").alias("h_hi"),
        F.conv(F.substring("m", 9, 8), 16, 10).cast("bigint").alias("h_lo"),
    )
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h_{w} >> {j}) & 1 = 1"), F.col("c")).otherwise(-F.col("c"))
            ).alias(f"v_{w}{j}")
            for w in ("hi", "lo")
            for j in range(32)
        ]
    )

    def word(w: str):
        acc = None
        for j in range(32):
            term = F.when(
                F.col(f"v_{w}{j}") > 0, F.lit(1 << j).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
            acc = term if acc is None else acc + term
        return acc.alias(w)

    return votes.select("doc_id", word("hi"), word("lo"))


def render(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id", F.format_string("%08x%08x", "hi", "lo").alias("simhash")
    )


def time_once(fn, spark, d):
    t0 = time.monotonic()
    render(fn(spark, d)).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def time_interleaved(variants, spark, d, reps=5):
    """Alternate A,B,A,B,... so JVM drift (JIT warmup, heap aging, ambient
    load) hits both variants equally — a sequential block of A then a
    block of B attributes whatever the JVM was doing at the time to the
    variant, which produced two contradictory verdicts for this exact
    A/B (per-occurrence 3.7s on a 32g heap vs 16-46s on an 8g heap run
    minutes apart)."""
    out = {name: [] for name, _ in variants}
    for _ in range(reps):
        for name, fn in variants:
            out[name].append(time_once(fn, spark, d))
    return out


def main():
    # Heap must match the bench lane's 32g: 150k-doc corpora GC-thrash on
    # an 8g heap (bench.py documents near_dedup swinging 14s->85s), and a
    # thrashing run measures the collector, not the plan.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("ab_simhash")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # correctness cross-check first: both forms must agree exactly
    a = render(_simhash_words(spark, sf_dir))
    b = render(_simhash_words_preagg(spark, sf_dir))
    diff = a.join(b, "doc_id").filter(a["simhash"] != b["simhash"]).count()
    assert diff == 0, f"forms disagree on {diff} docs"

    variants = [
        ("per_occurrence", _simhash_words),
        ("preagg", _simhash_words_preagg),
    ]
    out = {}
    # warm both lineages once, then time interleaved
    for _, fn in variants:
        time_once(fn, spark, sf_dir)
    out["sf0.1"] = time_interleaved(variants, spark, sf_dir)

    # 30x trend corpus (same generator as bench.py's trend lane)
    from bench import _synth_corpus

    tmp = tempfile.mkdtemp(prefix="ab_simhash_")
    try:
        d = os.path.join(tmp, "t150k")
        os.makedirs(d, exist_ok=True)
        _synth_corpus(d, 150000, 64, seed=1030)
        for _, fn in variants:
            time_once(fn, spark, d)
        out["trend_150k"] = time_interleaved(variants, spark, d)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    summary = {
        size: {name: min(secs) for name, secs in r.items()}
        for size, r in out.items()
    }
    print(json.dumps({"raw": out, "best_of": summary}))


if __name__ == "__main__":
    main()
