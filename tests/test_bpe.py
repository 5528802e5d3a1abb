"""BPE tokenizer training/encoding vs an in-test pure-Python
Sennrich reference (independent implementation: dict-of-tuples vocab,
Counter pair stats), plus early-stop and encode-consistency pins."""

import collections
import re

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from olx_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_encode_docs,
    bpe_merges_df,
    bpe_train,
    word_vocab,
)


def _ref_vocab(texts):
    vocab = collections.Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                vocab[w] += 1
    return vocab


def _ref_apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts, n_merges, min_freq=1):
    vs = {
        tuple(list(w) + [END_OF_WORD]): c for w, c in _ref_vocab(texts).items()
    }
    merges = []
    for rank in range(1, n_merges + 1):
        pc = collections.Counter()
        for syms, c in vs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        bestc = max(pc.values())
        if bestc < min_freq:
            break
        a, b = sorted(p for p, c in pc.items() if c == bestc)[0]
        merges.append((rank, a, b, a + b, bestc))
        new = {}
        for syms, c in vs.items():
            k = tuple(_ref_apply(list(syms), a, b))
            new[k] = new.get(k, 0) + c
        vs = new
    return merges


@pytest.fixture(scope="module")
def corpus_texts():
    return [
        "the lower the tower the slower the mower",
        "low lower lowest slow slower slowest",
        "new newer newest few fewer fewest",
        "a tower of power with lower cost, lower risk",
        "widest wide wider; newest new newer",
    ] * 3  # repetition sharpens counts without changing the argmax path


@pytest.fixture(scope="module")
def corpus(spark, corpus_texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )


def test_bpe_train_matches_sennrich_reference(corpus, corpus_texts):
    got = bpe_train(corpus, "text", n_merges=15)
    assert got == _ref_train(corpus_texts, 15)
    assert len(got) == 15  # the corpus sustains 15 merges
    # rerun -> identical (pure function of the corpus)
    assert bpe_train(corpus, "text", n_merges=15) == got


def test_bpe_train_on_driver_documents(spark):
    """The q_bpe_merges configuration vs the reference, on real
    testdata — guards the oracle's corpus slice end to end."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    texts = [r["text"] for r in d.select("text").collect()]
    got = [tuple(r) for r in bpe_merges_df(d, "text", n_merges=12).collect()]
    assert got == _ref_train(texts, 12)


def test_bpe_train_early_stops(spark):
    # single-letter words: one merge ('a', '</w>') exhausts all pairs
    df = spark.createDataFrame(
        [(0, "a a a b")], "doc_id long, text string"
    )
    got = bpe_train(df, "text", n_merges=10)
    assert [(r, a, b) for r, a, b, _m, _c in got] == [
        (1, "a", END_OF_WORD),
        (2, "b", END_OF_WORD),
    ]
    # min_freq above every pair count -> zero merges
    assert bpe_train(df, "text", n_merges=10, min_freq=100) == []
    with pytest.raises(ValueError):
        bpe_train(df, "text", n_merges=0)


def test_bpe_encode_consistent_with_training(corpus, corpus_texts):
    merges = bpe_train(corpus, "text", n_merges=15)
    rows = bpe_encode(corpus, "text", merges).select("doc_id", "tokens").collect()
    ranked = [(a, b) for (_r, a, b, _m, _c) in merges]

    def ref_encode(t):
        toks = []
        for w in re.split(r"[^a-z]+", t.lower()):
            if not w:
                continue
            syms = list(w) + [END_OF_WORD]
            for a, b in ranked:
                syms = _ref_apply(syms, a, b)
            toks.extend(syms)
        return toks

    for r in rows:
        assert r["tokens"] == ref_encode(corpus_texts[r["doc_id"]])
    # lossless: stripping markers reconstructs the normalized words
    for r in rows:
        words = "".join(r["tokens"]).replace(END_OF_WORD, " ").split()
        assert words == [
            w for w in re.split(r"[^a-z]+", corpus_texts[r["doc_id"]].lower()) if w
        ]


def test_word_vocab_counts(spark):
    df = spark.createDataFrame(
        [(0, "Dog dog DOG, cat!"), (1, "cat")], "doc_id long, text string"
    )
    got = {r["word"]: r["cnt"] for r in word_vocab(df, "text").collect()}
    assert got == {"dog": 3, "cat": 2}


def test_bpe_encode_docs_matches_row_encode(spark, corpus, corpus_texts):
    """The vocab-level scale path (encode each distinct word once,
    map the corpus through a vocab join) must produce the exact same
    per-document token stream as the per-row encode — pinned via the
    md5-60 fingerprint, counts, and an empty/punct-only doc."""
    import hashlib

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    texts = corpus_texts + ["", "1234 !!"]  # zero-word docs keep fp('')
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(corpus, "text", n_merges=15)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["tokens_fp"])
        for r in bpe_encode_docs(df, "text", merges).collect()
    }
    assert set(got) == set(range(len(texts)))  # every doc kept

    row = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(df, "text", merges).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
        assert got[i] == (
            len(words),
            len(row[i]),
            md5_60(" ".join(row[i])),
        ), f"doc {i}"
    assert got[len(texts) - 1] == (0, 0, md5_60(""))


def test_bpe_train_driver_local_equals_distributed(corpus, corpus_texts):
    """Round-6 optimization pin: the default driver-local merge loop
    (vocab collected once, pure-Python loop — zero Spark jobs per
    merge) and the conf-gated distributed per-merge aggregation loop
    are value-identical, including tie-breaks and early stop."""
    local = bpe_train(corpus, "text", n_merges=15, driver_local=True)
    dist = bpe_train(corpus, "text", n_merges=15, driver_local=False)
    assert local == dist == _ref_train(corpus_texts, 15)
    # conf path: default resolves to driver-local
    spark = corpus.sparkSession
    assert (
        str(spark.conf.get("spark.olx.bpe.driver_local", "true")).lower()
        == "true"
    )
    # early-stop + min_freq parity on a degenerate corpus
    tiny = spark.createDataFrame([(0, "a a a b")], "doc_id long, text string")
    for kw in ({"min_freq": 1}, {"min_freq": 100}):
        assert bpe_train(tiny, "text", 10, **kw) == bpe_train(
            tiny, "text", 10, driver_local=False, **kw
        )
