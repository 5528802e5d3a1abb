"""Shannon-entropy quality signals — character- and word-level
entropy per document, the classic gibberish/boilerplate detectors
(low char entropy = repeated-character junk or binary-as-text; low
word entropy = template/boilerplate pages; both appear in the
C4/Gopher family of quality filters alongside the ratios in
``functions/text.py``). The reference engine projects text verbatim
(`Model.scala:24`), so this backs the pipeline brief.

For counts ``c_i`` over a document's symbols (n = sum c_i)::

    H = ln(n) - (sum_i c_i * ln(c_i)) / n

— algebraically ``-(sum p_i ln p_i)`` but with ONE division at the
end, so counts stay exact int64 until the final expression and the
DuckDB twin replays the identical shape. Characters are those of the
NORMALIZED text (lowercased, whitespace collapsed — the single
space is a symbol like any other; stated so consumers and the oracle
agree). Empty documents get entropy 0.0 and n = 0.

Scale design (100 TB): one corpus-scale explode per signal feeding a
map-side-combinable groupBy on ``(doc_id, symbol)`` — the per-doc
symbol tables (alphabet-bounded for chars, vocab-bounded per doc for
words) then fold to one row per doc with a second, much smaller
groupBy. Both aggregations are hash-partitioned on doc_id, so AQE
coalesces; no Python UDFs anywhere. The char explode multiplies rows
by the doc length — the honest cost of an exact per-symbol count; a
cheaper approximation (sampling a prefix) is a caller-side choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olx_spark.functions.text import norm_text


def _entropy_of(exploded: DataFrame, id_col: str, out: str) -> DataFrame:
    """(id, H, n) from an exploded (id, sym) frame."""
    counts = exploded.groupBy(id_col, "sym").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy(id_col).agg(
        (
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
            / F.sum("c")
        ).alias(out),
        F.sum("c").alias(f"n_{out}_sym"),
    )


def char_word_entropy(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc ``(id_col, char_entropy, word_entropy, n_chars_norm,
    n_words)``; entropies rounded to 6, zero for empty docs."""
    norm = norm_text(F.col(text_col))

    def arr(split_by: str) -> Column:
        return F.when(
            F.length(F.trim(F.col(text_col))) == 0,
            F.array().cast("array<string>"),
        ).otherwise(F.split(norm, split_by))

    chars = docs.select(id_col, F.explode(arr("")).alias("sym"))
    words = docs.select(id_col, F.explode(arr(" ")).alias("sym"))
    ce = _entropy_of(chars, id_col, "ch")
    we = _entropy_of(words, id_col, "wh")
    return (
        docs.select(id_col)
        .join(ce, id_col, "left")
        .join(we, id_col, "left")
        .select(
            id_col,
            F.round(F.coalesce("ch", F.lit(0.0)), 6).alias("char_entropy"),
            F.round(F.coalesce("wh", F.lit(0.0)), 6).alias("word_entropy"),
            F.coalesce("n_ch_sym", F.lit(0)).alias("n_chars_norm"),
            F.coalesce("n_wh_sym", F.lit(0)).alias("n_words"),
        )
    )
