"""Token-budget sequence packing (operators/packing.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from olx_spark.operators.packing import pack_token_shards


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, n=300):
    rows = [(i, " ".join(["w"] * (1 + (i * 7) % 40))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _replay(n, budget, n_buckets, tokens):
    """Driver-side oracle: lay docs on the tape in (h % B, h, id) order."""
    order = sorted(
        range(n),
        key=lambda i: (
            _md5_60(f"pack-v1:{i}") % n_buckets,
            _md5_60(f"pack-v1:{i}"),
            i,
        ),
    )
    out, acc = {}, 0
    for i in order:
        out[i] = (tokens[i], acc, acc // budget)
        acc += tokens[i]
    return out


def test_pack_matches_driver_replay(spark):
    n, budget, n_buckets = 300, 500, 8
    df = _docs(spark, n)
    toks = {i: 1 + (i * 7) % 40 for i in range(n)}
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["shard_id"])
        for r in pack_token_shards(
            df, "doc_id", F.size(F.split("text", " ")), budget, n_buckets=n_buckets
        ).collect()
    }
    assert got == _replay(n, budget, n_buckets, toks)


def test_pack_every_doc_exactly_once_and_bounded_shards(spark):
    df = _docs(spark)
    out = pack_token_shards(df, "doc_id", F.size(F.split("text", " ")), 300)
    rows = out.collect()
    assert len(rows) == 300
    assert len({r["doc_id"] for r in rows}) == 300
    max_doc = max(r["n_tokens"] for r in rows)
    per_shard = {}
    for r in rows:
        per_shard[r["shard_id"]] = per_shard.get(r["shard_id"], 0) + r["n_tokens"]
    # boundary docs are not split, so a shard's sum is the tape span
    # between its first doc's start and the next shard's first doc's
    # start; both starts sit within max_doc of their budget boundary:
    # budget - max_doc < sum < budget + max_doc for every non-last shard
    assert all(v < 300 + max_doc for v in per_shard.values())
    last = max(per_shard)
    assert all(v > 300 - max_doc for s, v in per_shard.items() if s != last)
    # shards tile the tape contiguously: 0..last all present
    assert set(per_shard) == set(range(last + 1))


def test_pack_deterministic_across_partitioning(spark):
    df = _docs(spark, 150)
    a = sorted(
        (r["doc_id"], r["start_offset"], r["shard_id"])
        for r in pack_token_shards(df, "doc_id", F.size(F.split("text", " ")), 200).collect()
    )
    b = sorted(
        (r["doc_id"], r["start_offset"], r["shard_id"])
        for r in pack_token_shards(
            df.repartition(11), "doc_id", F.size(F.split("text", " ")), 200
        ).collect()
    )
    assert a == b


def test_pack_validation(spark):
    import pytest

    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        pack_token_shards(df, "doc_id", F.lit(1), 0)
    with pytest.raises(ValueError):
        pack_token_shards(df, "doc_id", F.lit(1), 10, n_buckets=0)
