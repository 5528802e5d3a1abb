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


# ------------------------------------------------------- AR bucket batches
from olx_spark.operators.packing import ar_bucket_batches, ar_bucket_ladder


def _imgs(spark, n=120):
    # deterministic spread of shapes incl. extreme and square aspects
    rows = [
        (f"im-{i:03d}", 24 + (i * 13) % 110, 24 + (i * 29) % 110)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "image_id string, w int, h int")


def _replay_ar(rows, ladder, batch_size, n_sub, salt="arb-v1"):
    """Driver-side oracle: exact cross-ratio argmin (tie -> smaller
    bid), (h % n_sub, h, id) order per bucket, full-batch cut."""
    asg = {}
    for image_id, w, h in rows:
        if w <= 0 or h <= 0:
            continue
        best = min(
            (max(w * bh, h * bw) / min(w * bh, h * bw), bid)
            for bid, (bw, bh) in enumerate(ladder)
        )
        asg[image_id] = best[1]
    out = {}
    for bid in set(asg.values()):
        members = sorted(
            (i for i, b in asg.items() if b == bid),
            key=lambda i: (
                _md5_60(f"{salt}:{i}") % n_sub,
                _md5_60(f"{salt}:{i}"),
                i,
            ),
        )
        cut = (len(members) // batch_size) * batch_size
        for idx, i in enumerate(members[:cut]):
            out[i] = (bid, idx, idx // batch_size, idx % batch_size)
    return out


def test_ar_ladder_budget_transpose_closed_sorted():
    import pytest

    ladder = ar_bucket_ladder(base=64, step=16, min_side=32, max_side=128)
    assert len(ladder) == len(set(ladder))
    for bw, bh in ladder:
        assert bw * bh <= 64 * 64
        assert bw % 16 == 0 and bh % 16 == 0
        assert 32 <= bw <= 128 and 32 <= bh <= 128
        assert (bh, bw) in ladder  # transpose-closed
    ratios = [bw / bh for bw, bh in ladder]
    assert ratios == sorted(ratios)
    with pytest.raises(ValueError):
        ar_bucket_ladder(step=0)
    with pytest.raises(ValueError):
        ar_bucket_ladder(min_side=256, max_side=128)


def test_ar_batches_match_driver_replay(spark):
    ladder = ar_bucket_ladder()
    rows = [(f"im-{i:03d}", 24 + (i * 13) % 110, 24 + (i * 29) % 110) for i in range(120)]
    got = {
        r["image_id"]: (r["bucket_id"], r["sample_idx"], r["batch_id"], r["slot"])
        for r in ar_bucket_batches(
            _imgs(spark), "image_id", "w", "h", batch_size=4, n_sub=4
        ).collect()
    }
    assert got == _replay_ar(rows, ladder, 4, 4)


def test_ar_batches_full_batches_only(spark):
    out = ar_bucket_batches(_imgs(spark), "image_id", "w", "h", batch_size=5).collect()
    per_batch = {}
    for r in out:
        key = (r["bucket_id"], r["batch_id"])
        per_batch.setdefault(key, []).append(r)
    for (bid, _), members in per_batch.items():
        assert len(members) == 5  # every emitted batch is exactly full
        assert sorted(m["slot"] for m in members) == list(range(5))
        assert {m["bucket_w"] for m in members} == {members[0]["bucket_w"]}
        assert {m["bucket_h"] for m in members} == {members[0]["bucket_h"]}


def test_ar_batches_drop_nonpositive_and_determinism(spark):
    rows = [("bad-0", 0, 64), ("bad-1", 64, -3)] + [
        (f"im-{i:03d}", 32 + (i * 7) % 90, 32 + (i * 11) % 90) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    a = sorted(
        (r["image_id"], r["bucket_id"], r["sample_idx"])
        for r in ar_bucket_batches(df, "image_id", "w", "h", 3).collect()
    )
    assert all(not i.startswith("bad") for i, _, _ in a)
    b = sorted(
        (r["image_id"], r["bucket_id"], r["sample_idx"])
        for r in ar_bucket_batches(df.repartition(13), "image_id", "w", "h", 3).collect()
    )
    assert a == b


def test_ar_batches_plan_two_phase_window(spark):
    # the only window must be partitioned by (bucket_id, __sub) — the
    # hot ~1:1 bucket sorts in n_sub parallel slices, never one task —
    # and the assignment is pure codegen (no Python, no join)
    out = ar_bucket_batches(_imgs(spark), "image_id", "w", "h", batch_size=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    w_specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln.lower()]
    assert w_specs and all("__sub" in ln and "bucket_id" in ln for ln in w_specs)


def test_ar_batches_validation(spark):
    import pytest

    df = _imgs(spark, 5)
    with pytest.raises(ValueError):
        ar_bucket_batches(df, "image_id", "w", "h", 0)
    with pytest.raises(ValueError):
        ar_bucket_batches(df, "image_id", "w", "h", 4, n_sub=0)
    with pytest.raises(ValueError):
        ar_bucket_batches(df, "image_id", "w", "h", 4, buckets=[])
    with pytest.raises(ValueError):
        ar_bucket_batches(df, "image_id", "w", "h", 4, buckets=[(0, 16)])
