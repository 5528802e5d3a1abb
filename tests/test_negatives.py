"""In-batch negative sampling (operators/negatives.py)."""

from __future__ import annotations

import pytest

from olx_spark.operators.negatives import in_batch_negatives


def _ids(spark, n):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_negatives_structure(spark):
    out = in_batch_negatives(_ids(spark, 200), n_batches=4, k=3).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert set(by_anchor) == set(range(200))  # every anchor present
    for a, rows in by_anchor.items():
        slots = sorted(r.slot for r in rows)
        assert slots == list(range(1, len(rows) + 1))  # dense slots
        assert len(rows) <= 3
        negs = [r.neg_id for r in rows]
        assert a not in negs  # never self
        assert len(set(negs)) == len(negs)  # no duplicate negatives
        assert len({r.batch for r in rows}) == 1  # all from own batch


def test_negatives_deterministic_and_python_replay(spark):
    import hashlib

    def md5_60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    n, nb, k = 97, 8, 2
    rows = sorted(
        map(tuple, in_batch_negatives(_ids(spark, n), n_batches=nb, k=k).collect())
    )
    again = sorted(
        map(tuple, in_batch_negatives(_ids(spark, n), n_batches=nb, k=k).collect())
    )
    assert rows == again
    # full python replay of the contract
    hs = {i: md5_60(f"negbatch-v1:{i}") for i in range(n)}
    want = []
    for b in range(nb):
        members = sorted((hs[i], i) for i in range(n) if hs[i] % nb == b)
        bn = len(members)
        for pos, (_, a) in enumerate(members):
            for slot in range(1, min(k, bn - 1) + 1):
                want.append((a, members[(pos + slot) % bn][1], slot, b))
    assert rows == sorted(want)


def test_negatives_small_batches_and_validation(spark):
    # 2 docs, 1 batch -> each anchor gets exactly the other doc once
    out = in_batch_negatives(_ids(spark, 2), n_batches=1, k=5).collect()
    assert len(out) == 2
    assert {(r.anchor_id, r.neg_id) for r in out} == {(0, 1), (1, 0)}
    # singleton corpus -> no pairs, no crash (sequence guard)
    assert in_batch_negatives(_ids(spark, 1), n_batches=1, k=3).count() == 0
    with pytest.raises(ValueError):
        in_batch_negatives(_ids(spark, 5), k=0)
    with pytest.raises(ValueError):
        in_batch_negatives(_ids(spark, 5), n_batches=0)
