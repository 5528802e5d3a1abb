"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — the vocabulary-construction step of a training-data
pipeline, beyond the reference's scope (the reference stores raw ad
text row-at-a-time, `DownloadAds.scala:33`; it has no tokenizer).

Shape of the computation (and why it scales):

1. **Corpus pass (the only 100-TB-sized stage)**: words -> counts.
   One map-side-combinable ``groupBy(word)`` shuffle compresses the
   corpus to its VOCABULARY — a frame of (distinct word, count) rows,
   typically 10^5..10^7 rows regardless of corpus bytes. Every
   subsequent step touches only this compressed frame; this
   corpus-to-vocab compression is exactly how production trainers
   (HF tokenizers, SentencePiece) make BPE tractable, and it is the
   part that must be distributed.
2. **Merge loop (vocab-sized)**: classic BPE — count adjacent symbol
   pairs weighted by word count, take the argmax (ties broken
   deterministically: count desc, then pair lexicographic), rewrite
   each word's symbol sequence by greedy left-to-right merging, repeat
   ``n_merges`` times. The loop is DRIVER-LOCAL by default: the
   compressed vocab is collected once (O(vocab) rows — the same
   single-node assumption every production trainer makes: HF
   tokenizers and SentencePiece both hold the word-count table in
   memory) and the merge loop runs as plain Python — zero Spark jobs
   per merge, which is the only shape that survives a real
   32-64k-merge vocabulary (one Spark job per merge is days of
   job-submit latency at that size; this was round 5's last
   100x-scale smell). Set ``spark.olx.bpe.driver_local=false`` to
   keep the vocab distributed (one small aggregation + 1-row collect
   per merge) when the vocab itself cannot fit one node; both paths
   are value-identical (pytest-pinned).

Determinism: the result is a pure function of (corpus, n_merges,
min_freq) — no hashing, no sampling — so ``q_bpe_merges`` carries a
FULL value oracle: the DuckDB twin unrolls the same merge steps as a
chained CTE with ``list_reduce`` replaying the identical greedy fold.

Pre-tokenization: lowercase alpha words (``[^a-z]+`` split). This is
deliberately the simplest public scheme — byte-level pre-tokenizers
slot in at :func:`word_vocab` without touching the merge loop — and
keeps the SQL twin exact (no unicode-indexing parity risk).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from olx_spark.session import materialize

END_OF_WORD = "</w>"


def word_vocab(df: DataFrame, text_col: Column | str) -> DataFrame:
    """(word, cnt) over lowercase alpha words — the one corpus-scale
    shuffle (map-side combined)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        df.select(F.explode(F.split(F.lower(c), "[^a-z]+")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_symbols(word: Column) -> Column:
    """Space-joined symbol string: characters + the end-of-word marker
    (symbols never contain spaces, so the join is lossless)."""
    return F.concat_ws(
        " ", F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b over a
    space-joined symbol string — a JVM-side ``aggregate`` fold (one
    pass, whole-stage codegen; the classic BPE apply step). Overlapping
    runs merge non-overlapping-left-first: 'a a a' -> 'aa a'."""
    arr = F.split(syms, " ")
    merged = F.aggregate(
        F.slice(arr, 2, F.size(arr) - 1),
        F.slice(arr, 1, 1),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.array_join(merged, " ")


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge — the Python twin of
    :func:`_apply_merge`'s JVM fold (same skip-2 scan as
    :func:`bpe_encode`'s ``enc_word``, pytest-pinned identical)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_local(
    vocab: list[tuple[list[str], int]], n_merges: int, min_freq: int
) -> list[tuple[int, str, str, str, int]]:
    """Classic single-node BPE merge loop over the collected
    (symbol-list, count) vocab. Ties break (count desc, a asc, b asc)
    — byte order == codepoint order for the ASCII symbol space, so
    this matches Spark's UTF8 binary string ordering exactly."""
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_freq:
            break
        merges.append((rank, a, b, a + b, c))
        vocab = [(_merge_word(syms, a, b), cnt) for syms, cnt in vocab]
    return merges


def bpe_train(
    df: DataFrame,
    text_col: Column | str,
    n_merges: int,
    min_freq: int = 1,
    materialize_every: int = 4,
    driver_local: bool | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(merge_rank, left_sym, right_sym, merged, pair_count), ...]``
    (rank is 1-based, in learning order). Stops early when the best
    remaining pair's count drops below ``min_freq`` or no pairs remain.

    ``driver_local`` (default from conf ``spark.olx.bpe.driver_local``,
    ``true``): collect the vocab once and run the merge loop as plain
    Python — O(vocab) memory on the driver, zero Spark jobs per merge
    (module doc). ``false`` keeps the per-merge Spark aggregation loop
    for vocabularies that cannot fit one node.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if driver_local is None:
        driver_local = (
            str(
                df.sparkSession.conf.get("spark.olx.bpe.driver_local", "true")
            ).lower()
            == "true"
        )
    if driver_local:
        rows = word_vocab(df, text_col).collect()  # ONE corpus shuffle
        local = [
            (list(r["word"]) + [END_OF_WORD], int(r["cnt"])) for r in rows
        ]
        return _train_local(local, n_merges, min_freq)
    vocab = word_vocab(df, text_col).select(
        _initial_symbols(F.col("word")).alias("s"), "cnt"
    )
    vocab = materialize(vocab)  # cut the corpus lineage before the loop
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        arr = F.split("s", " ")
        pairs = vocab.select(
            F.explode(
                F.arrays_zip(
                    F.slice(arr, 1, F.size(arr) - 1).alias("a"),
                    F.slice(arr, 2, F.size(arr) - 1).alias("b"),
                )
            ).alias("p"),
            "cnt",
        ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_freq:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((rank, a, b, a + b, c))
        vocab = vocab.select(_apply_merge(F.col("s"), a, b).alias("s"), "cnt")
        if rank % materialize_every == 0:
            vocab = materialize(vocab)
    return merges


def bpe_merges_df(
    df: DataFrame,
    text_col: Column | str,
    n_merges: int,
    min_freq: int = 1,
) -> DataFrame:
    """``bpe_train`` as a DataFrame (the ``q_bpe_merges`` surface)."""
    spark = df.sparkSession
    merges = bpe_train(df, text_col, n_merges, min_freq)
    schema = (
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count bigint"
    )
    return spark.createDataFrame(merges, schema)


def bpe_encode_docs(
    df: DataFrame,
    text_col: Column | str,
    merges: list[tuple[int, str, str, str, int]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list — the SCALE path:
    encode each DISTINCT word once (vocab-sized frame, ``n_merges``
    chained JVM ``aggregate`` folds — the same ``_apply_merge``
    expression the trainer uses, so encode == train semantics by
    construction), then map the corpus through a VOCABULARY-keyed
    shuffled join (the ``lm.py`` convention: a 100-TB vocab is
    millions of keys — never operator-forced broadcast; AQE may still
    broadcast a small one). Per document this returns
    ``(id_col, n_words, n_tokens, tokens_fp)`` where ``tokens_fp`` is
    the portable md5-60 fingerprint of the space-joined token stream
    in document word order — value-pinning the full tokenization
    without hauling token arrays through the result.

    Corpus-scale costs: the word explode + vocab join (one shuffle)
    and the per-doc reassembly groupBy (one shuffle, position-sorted
    ``collect_list`` — linear in document length). Everything else is
    vocab-sized. The per-word greedy fold is row-identical to
    :func:`bpe_encode`'s skip-2 scan (pinned by pytest): merging into
    the accumulator's last element IS the left-to-right
    non-overlapping pass, because a merged token ``a||b`` can never
    equal the left symbol ``a`` again.
    """
    from olx_spark.functions.text import md5_60

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # materialized ONCE (r6): the exploded (id, pos, word) frame feeds
    # BOTH the distinct-word vocab side and the corpus join side —
    # un-cut, the corpus tokenize explode ran twice
    words = materialize(
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.lower(c), "[^a-z]+")).alias("pos", "word"),
        )
        .filter(F.length("word") > 0)
    )
    # ONE Arrow-batched pandas pass over the vocab-sized distinct-word
    # frame: each word runs the same greedy skip-2 scan as
    # :func:`_merge_word` with all merges applied in rank order — the
    # value-identical replacement (pytest-pinned) for chaining
    # ``n_merges`` interpreted JVM ``aggregate`` folds, which cost one
    # SELECT layer + a periodic materialize barrier per 4 merges and
    # dominated this operator's wall time (guide §4.2: hand whole
    # batches to native/Python code instead of per-row JVM HOF chains)
    ranked = [(a, b) for (_r, a, b, _m, _c) in sorted(merges)]

    @pandas_udf(StringType())
    def encode_syms(batch: pd.Series) -> pd.Series:
        def enc(w: str) -> str:
            syms = list(w) + [END_OF_WORD]
            for a, b in ranked:
                syms = _merge_word(syms, a, b)
            return " ".join(syms)

        return batch.map(enc)

    enc = (
        words.select("word")
        .distinct()
        .select("word", encode_syms(F.col("word")).alias("s"))
    )
    vocab = enc.select(
        "word",
        F.col("s").alias("toks_str"),
        F.size(F.split("s", " ")).alias("n_toks"),
    )
    per_doc = (
        words.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_tokens"),
            md5_60(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "toks_str"))
                        ),
                        lambda x: x["toks_str"],
                    ),
                    " ",
                )
            ).alias("tokens_fp"),
        )
    )
    empty_fp = md5_60(F.lit(""))
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_words"), F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("tokens_fp"), empty_fp).alias("tokens_fp"),
        )
    )


def bpe_encode(
    df: DataFrame,
    text_col: Column | str,
    merges: list[tuple[int, str, str, str, int]],
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize text with a learned merge list: per word, apply merges
    greedily in rank order (the standard BPE encoder). Arrow-batched
    pandas UDF with a per-batch word cache — each DISTINCT word in a
    batch is encoded once (Zipf makes the cache hit rate high); the
    merge list ships once per executor as a closure constant."""
    ranked = [(a, b) for (_r, a, b, _m, _c) in sorted(merges)]

    @pandas_udf(ArrayType(StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        import re

        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w) + [END_OF_WORD]
            for a, b in ranked:
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[w] = syms
            return syms

        def enc(t: str) -> list[str]:
            if t is None:
                return []
            toks: list[str] = []
            for w in re.split(r"[^a-z]+", t.lower()):
                if w:
                    toks.extend(enc_word(w))
            return toks

        return texts.map(enc)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return df.withColumn(out_col, encode(c))
