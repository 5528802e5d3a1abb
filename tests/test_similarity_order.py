"""Similarity-ordered shard layout tests: exact global ranks via the
prefix-sum pattern (a permutation, deterministic, oracle-consistent
ordering) and the measured point of it all — a boilerplate-heavy
corpus compresses materially smaller when shards are
similarity-ordered instead of hash-ordered."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.layout import similarity_order

PARAS = [
    f"paragraph {i} about {'crawl frontier politeness' if i % 2 else 'image caption quality'} "
    + " ".join(f"w{i}{j}" for j in range(30))
    for i in range(12)
]


def _corpus(spark, n=240):
    rows = []
    for d in range(n):
        # template families: docs in the same family share 4/5 paragraphs
        fam = d % 8
        ps = [PARAS[(fam + k) % 12] for k in range(4)] + [PARAS[d % 12]]
        rows.append((d, " ".join(ps)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ranks_are_a_permutation_and_deterministic(spark):
    df = _corpus(spark)
    out = similarity_order(df, "text", "doc_id", rows_per_shard=50)
    got = [(r["doc_id"], r["shard"], r["pos"]) for r in out.collect()]
    ranks = sorted(s * 50 + p for _, s, p in got)
    assert ranks == list(range(240))
    again = [(r["doc_id"], r["shard"], r["pos"])
             for r in similarity_order(df, "text", "doc_id",
                                       rows_per_shard=50).collect()]
    assert sorted(got) == sorted(again)


def test_order_matches_driver_computed_keys(spark):
    import hashlib

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def keys(text, n=4):
        toks = text.lower().split()
        sh = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        return tuple(
            min(md5_60(f"{j}:{g}") for g in sh) if sh else -1
            for j in range(n)
        )

    df = _corpus(spark, 60)
    out = {r["doc_id"]: r["shard"] * 1000 + r["pos"]
           for r in similarity_order(df, "text", "doc_id").collect()}
    want = sorted(range(60), key=lambda d: (
        keys(" ".join([PARAS[(d % 8 + k) % 12] for k in range(4)]
                      + [PARAS[d % 12]])), d))
    assert [d for d, _ in sorted(out.items(), key=lambda kv: kv[1])] == want


def test_empty_text_sorts_first(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "real text with several words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["pos"] for r in
           similarity_order(df, "text", "doc_id").collect()}
    assert out[1] == 0 and out[2] == 1


def test_compression_win_measured(spark, tmp_path):
    # page-size physics: with ~8 MB of text and ~1 MB parquet pages,
    # hash order scatters a family's 10 near-copies across different
    # pages (zstd never sees the repeats together) while similarity
    # order packs each family into one page. A single-page corpus
    # shows NO win — the corpus must dwarf the page size.
    import random

    rnd = random.Random(3)
    fams = []
    for f in range(400):
        words = [f"f{f}w{rnd.randrange(10**6)}" for _ in range(240)]
        fams.append(" ".join(words))
    rows = []
    for d in range(4000):
        fam = d % 400
        rows.append((d, fams[fam] + f" unique{d} " + f"tail{d % 17}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    layout = similarity_order(df, "text", "doc_id", rows_per_shard=4000)
    sim_sorted = (
        df.join(layout, "doc_id")
        .orderBy("shard", "pos")
        .select("doc_id", "text")
        .coalesce(1)
    )
    hash_sorted = (
        df.orderBy(F.xxhash64("doc_id")).select("doc_id", "text").coalesce(1)
    )

    def written_bytes(frame, name):
        path = str(tmp_path / name)
        frame.write.mode("overwrite").option(
            "compression", "zstd"
        ).parquet(path)
        return sum(
            os.path.getsize(p) for p in glob.glob(path + "/*.parquet")
        )

    sim_b = written_bytes(sim_sorted, "sim")
    rnd_b = written_bytes(hash_sorted, "rnd")
    # template families become adjacent -> zstd window sees the shared
    # paragraphs; require a real margin, not noise
    assert sim_b < rnd_b * 0.85, (sim_b, rnd_b)


def test_bad_params(spark):
    df = _corpus(spark, 4)
    with pytest.raises(ValueError):
        similarity_order(df, "text", "doc_id", rows_per_shard=0)
