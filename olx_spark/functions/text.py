"""Text-analysis functions for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

Everything here is a *JVM-side Column expression* built from
``pyspark.sql.functions`` — no Python UDFs — so each function (a) runs
inside whole-stage codegen at 100 TB scale and (b) has an exactly
equivalent ANSI-SQL form for the DuckDB oracle in ``__spark_entry__``.

Portable-hash convention used across the repo: the first 15 hex chars
of md5 parsed as a 60-bit integer —
Spark  ``cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)``
DuckDB ``('0x' || substr(md5(x), 1, 15))::bigint``
(verified identical; xxhash64 is Spark-only so it keys internal state,
while md5-60 keys anything an external oracle must recompute).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker words per language for the n-gram-ish heuristic language ID;
# ties broken by list order (deterministic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " los "],
    "de": [" der ", " die ", " und "],
    "fr": [" le ", " les ", " des "],
}


def md5_60(col: Column | str) -> Column:
    """Portable 60-bit hash (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def norm_text(col: Column | str) -> Column:
    """Whitespace-collapsed, trimmed, lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def doc_fingerprint(col: Column | str) -> Column:
    """Exact-dup fingerprint of normalized text (md5-60)."""
    return md5_60(norm_text(col))


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def occurrences(col: Column, needle: str) -> Column:
    """Occurrence count of a literal substring, via length arithmetic
    (portable: only length + replace)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def _padded_norm(col: Column | str) -> Column:
    return F.concat(F.lit(" "), norm_text(col), F.lit(" "))


def _marker_score(c: Column, lang: str) -> Column:
    score = F.lit(0)
    for m in LANG_MARKERS[lang]:
        score = score + occurrences(c, m)
    return score


def lang_score(col: Column | str, lang: str) -> Column:
    """Marker-hit count for one language over normalized padded text."""
    return let_(_padded_norm(col), lambda c: _marker_score(c, lang))


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of marker-hit scores, first-listed
    language wins ties, 'und' when all scores are zero.

    Double let_-bound: the padded normalized text is evaluated once
    (each marker count references it twice — length + replace — so the
    naive form ran the normalize regex ~24x per row), and the score
    vector is evaluated once (the argmax when-chain references every
    score twice more)."""

    def pick(arr: Column) -> Column:
        langs = list(LANG_MARKERS)
        best = F.array_max(arr)
        out = F.lit("und")
        # build reversed so the FIRST language in LANG_MARKERS wins ties
        for idx, lang in reversed(list(enumerate(langs))):
            s = F.element_at(arr, idx + 1)
            out = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(out)
        return out

    return let_(
        let_(
            _padded_norm(col),
            lambda c: F.array(*[_marker_score(c, lang) for lang in LANG_MARKERS]),
        ),
        pick,
    )


PUNCT_CHARS = ".,!?;:"


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.translate(c, PUNCT_CHARS, "")
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        (F.length(c) - F.length(stripped)) / F.length(c)
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: token volume, punctuation
    cleanliness, mean token length — the standard cheap pre-filters of
    a web-scale text pipeline. The token count (a trim+split per
    reference) is let_-bound — it is referenced three times."""
    c = F.col(col) if isinstance(col, str) else col

    def body(n_tok: Column) -> Column:
        avg_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
            F.length(F.trim(c)) / n_tok
        )
        return (
            F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
            + F.lit(0.3) * (F.lit(1.0) - punct_ratio(c))
            + F.lit(0.3) * F.least(F.lit(1.0), avg_len / F.lit(8.0))
        )

    return let_(token_count(c), body)


def let_(value: Column, body) -> Column:
    """Bind ``value`` once per row, then build the result expression
    from the bound variable: ``let_(v, lambda x: f(x))`` == ``f(v)``
    but evaluates ``v`` exactly once.

    Catalyst does NOT common-subexpression-eliminate a captured outer
    expression tree across the uses inside a higher-order-function
    lambda — every reference re-evaluates the whole tree, and a
    reference inside the lambda re-evaluates it PER ELEMENT (measured:
    ``dup_ngram_frac`` at sf0.1 went 33s -> sub-second with this
    binding). The trick: make the expensive tree the single element of
    an array and ``transform`` over it — lambda variables ARE
    evaluated-once bindings in Catalyst's HOF machinery."""
    return F.element_at(F.transform(F.array(value), body), 1)


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles of normalized text as array<string>; empty
    array when there are fewer than k tokens. The token array is
    let_-bound: the per-shingle lambda references it k times, which
    would otherwise re-run the normalize+split regex O(n*k) times per
    row (see :func:`let_`)."""

    def body(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(n < k, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)],
                ),
            )
        )

    return let_(F.split(norm_text(col), " "), body)


def minhash_signature(shingles: Column, n_perm: int = 16) -> Column:
    """MinHash signature as array<bigint> of length n_perm: permutation
    j = md5-60 of 'j:shingle'; empty shingle set -> nulls. The shingle
    expression is let_-bound so a caller may pass an unmaterialized
    shingle tree without it being re-evaluated n_perm times.

    NB: the per-permutation lambda must stay UNARY — a 2-arg lambda is
    interpreted by PySpark as (element, index) and the index Column
    would shadow the captured j.
    """

    def perm(j: int):
        return lambda s: F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), s)), 1, 15), 16, 10
        ).cast("bigint")

    return let_(
        shingles,
        lambda sh: F.array(
            *[F.array_min(F.transform(sh, perm(j))) for j in range(n_perm)]
        ),
    )


def token_chunks(col: Column | str, chunk_tokens: int = 20) -> Column:
    """Fixed-size token chunks of normalized text as array<string> —
    the CCNet "line" analog for corpora without natural line
    boundaries: tokens [0,ct), [ct,2ct), ...; the trailing partial
    chunk is kept; blank/empty text -> empty array. Token array
    let_-bound (referenced per chunk via slice)."""
    c = F.col(col) if isinstance(col, str) else col

    def body(toks: Column) -> Column:
        n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_tokens))).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
            ),
        )

    return F.when(
        F.length(F.trim(c)) == 0, F.array().cast("array<string>")
    ).otherwise(let_(F.split(norm_text(c), " "), body))


def simhash_wide(col: Column | str, nbits: int = 60) -> Column:
    """``nbits``-bit SimHash over whitespace tokens with the md5-60
    token hash — pure JVM Column expression, so any width up to 60 has
    an exact DuckDB twin (the token hash itself is 60-bit).

    Single pass: ONE aggregate carrying an ``nbits``-lane vote vector —
    a per-bit-aggregate formulation re-walks the token array per bit
    (nbits x the work; measured 4.7s -> sub-second at sf0.1 for 16)."""
    if not 1 <= nbits <= 60:
        raise ValueError(f"nbits must be in [1, 60], got {nbits}")
    toks = F.split(norm_text(col), " ")
    hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"),
    )
    masks = F.array(*[F.lit(1 << i).cast("bigint") for i in range(nbits)])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("bigint"), nbits),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v >= 0, m).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def simhash16(col: Column | str) -> Column:
    """16-bit SimHash (oracle-checkable width) — see simhash_wide."""
    return simhash_wide(col, 16)


def winnow_fingerprints(col: Column | str, k: int = 3, w: int = 4) -> Column:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme,
    Schleimer/Wilkerson/Aiken SIGMOD'03): hash every word k-gram
    (md5-60), slide a window of ``w`` consecutive hashes, keep each
    window's minimum. Guarantees any shared run of >= w+k-1 tokens
    between two documents shares at least one selected fingerprint,
    while storing ~2/(w+1) of the hashes. Pure JVM Column expression
    (shingles -> transform -> sequence/slice/array_min), exact DuckDB
    twin in ``oracle_sql()['q_winnow_fingerprint']``.

    Returns the selected fingerprints sorted + deduped
    (array<bigint>); empty array for docs with < k tokens. The hash
    array is let_-bound: each window's ``slice`` references it, which
    would otherwise re-hash every shingle per window — O(n^2 * md5)
    per document (see :func:`let_`)."""

    def body(hs: Column) -> Column:
        n = F.size(hs)
        empty = F.array().cast("array<bigint>")
        windows = F.transform(
            F.sequence(F.lit(1), n - w + 1),
            lambda i: F.array_min(F.slice(hs, i, w)),
        )
        return (
            F.when(n == 0, empty)
            .when(n < w, F.array(F.array_min(hs)))
            .otherwise(F.array_sort(F.array_distinct(windows)))
        )

    return let_(F.transform(word_shingles(col, k), lambda s: md5_60(s)), body)


def dup_ngram_frac(col: Column | str, k: int = 2) -> Column:
    """Gopher-style repetition signal: the fraction of word k-gram
    occurrences that are repeats of an earlier occurrence
    (``1 - distinct/total``; 0.0 for docs with < k tokens). High
    values mark boilerplate/spam documents a training-data pipeline
    filters out. Pure JVM expression — reuses :func:`word_shingles`,
    let_-bound so the shingle array is built once per row, not once
    per reference."""

    def body(sh: Column) -> Column:
        n = F.size(sh)
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct(sh)) / n.cast("double")
        )

    return let_(word_shingles(col, k), body)


def top_word_frac(col: Column | str) -> Column:
    """Fraction of the document taken by its single most frequent word
    (the other Gopher repetition axis: 'the the the ...' corpora).
    Shuffle-free: sort the token array, then a higher-order fold finds
    the longest run of equal adjacent tokens — no explode/groupBy of
    every word at 100 TB."""
    def body(toks: Column) -> Column:
        n = F.size(toks)
        acc0 = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def step(acc, w):
            run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                w.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        best = F.aggregate(toks, acc0, step, lambda acc: acc["best"])
        return F.when(n <= 0, F.lit(0.0)).otherwise(best / n.cast("double"))

    return let_(F.array_sort(F.split(norm_text(col), " ")), body)


# PII patterns shared by the scrubber and its DuckDB oracle: kept to
# the regex subset Java regex and RE2 treat identically (character
# classes, bounded repetition, \b word boundaries; no backrefs or
# lookaround). Scrub order matters: emails first (their digit runs
# must not half-match as phones), then IPv4 (dots break the phone
# charset anyway), then phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def pii_counts(col: Column | str) -> list[Column]:
    """Per-kind PII match counts (aliased ``n_email/n_ipv4/n_phone``)
    over the RAW text — counted before scrubbing, so kinds don't eat
    each other's matches."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]


def pii_scrub(col: Column | str) -> Column:
    """Redact emails / IPv4s / phone-like digit runs with typed
    placeholder tokens — the standard pre-training scrub pass. Chained
    ``regexp_replace`` (JVM, codegen); the DuckDB oracle applies the
    same patterns in the same order."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


# Gopher quality-rule battery (Rae et al. 2021, "Scaling Language
# Models" App. A): the standard pre-training corpus filter. Stopword
# list kept to words the rule needs to discriminate on — presence of
# >= 2 distinct entries is the Gopher "real prose" check.
GOPHER_STOPWORDS: list[str] = [
    "the", "a", "and", "of", "to", "that", "with", "have",
]


def gopher_rules(
    col: Column | str,
    *,
    min_words: int = 20,
    max_words: int = 100_000,
) -> list[Column]:
    """Per-document Gopher quality signals + rule flags as named
    columns: word-count bounds, mean word length in [3,10], >=80%
    words containing a letter, >=2 distinct stopwords, symbol-to-word
    ratio (#/ellipsis) <=0.1, <=90% bullet lines, <=30% ellipsis-ended
    lines, and the conjunctive ``keep`` verdict.

    All signals are JVM higher-order-function expressions over ONE
    let_-bound token array and ONE line array — no explode, no
    shuffle, whole-stage codegen; the scan's columnar batch is the
    only data movement, which is the correct 100-TB shape for a
    row-local filter (the reference has no text pipeline at all —
    this backs the engine's training-data brief).

    ``min_words`` defaults to 20 (Gopher uses 50) because the
    fixture corpus runs 15-45 words/doc; the production threshold is
    the caller's knob.
    """
    c = F.col(col) if isinstance(col, str) else col
    nrm = norm_text(c)

    def with_toks(toks: Column) -> Column:
        n = F.size(F.filter(toks, lambda t: F.length(t) > 0))
        n_d = n.cast("double")
        char_total = F.length(F.regexp_replace(nrm, " ", ""))
        mean_len = F.when(n == 0, F.lit(0.0)).otherwise(char_total / n_d)
        alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        alpha_frac = F.when(n == 0, F.lit(0.0)).otherwise(alpha / n_d)
        stop_distinct = F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            )
        )
        n_sym = (
            occurrences(nrm, "#")
            + occurrences(nrm, "...")
            + occurrences(nrm, "…")
        )
        sym_ratio = F.when(n == 0, F.lit(0.0)).otherwise(n_sym / n_d)
        return F.struct(
            n.alias("n_words"),
            mean_len.alias("mean_word_len"),
            alpha_frac.alias("alpha_frac"),
            stop_distinct.alias("stop_distinct"),
            sym_ratio.alias("symbol_ratio"),
        )

    def with_lines(lines: Column) -> Column:
        ne = F.filter(
            F.transform(lines, F.trim), lambda l: F.length(l) > 0
        )
        nl = F.size(ne)
        nl_d = nl.cast("double")
        bullet = F.size(
            F.filter(ne, lambda l: F.substring(l, 1, 1).isin("-", "*", "•"))
        )
        ellip = F.size(
            F.filter(
                ne,
                lambda l: l.endswith("...") | l.endswith("…"),
            )
        )
        return F.struct(
            F.when(nl == 0, F.lit(0.0)).otherwise(bullet / nl_d).alias(
                "bullet_frac"
            ),
            F.when(nl == 0, F.lit(0.0)).otherwise(ellip / nl_d).alias(
                "ellipsis_frac"
            ),
        )

    tok_stats = let_(F.split(nrm, " "), with_toks)
    line_stats = let_(F.split(c, "\n"), with_lines)

    def flags(t: Column, ln: Column) -> list[Column]:
        r_words = (t["n_words"] >= min_words) & (t["n_words"] <= max_words)
        r_mean = (t["mean_word_len"] >= 3.0) & (t["mean_word_len"] <= 10.0)
        r_alpha = t["alpha_frac"] >= 0.8
        r_stop = t["stop_distinct"] >= 2
        r_sym = t["symbol_ratio"] <= 0.1
        r_bullet = ln["bullet_frac"] <= 0.9
        r_ellip = ln["ellipsis_frac"] <= 0.3
        keep = (
            r_words & r_mean & r_alpha & r_stop & r_sym & r_bullet & r_ellip
        )
        return [
            t["n_words"].alias("n_words"),
            F.round(t["mean_word_len"], 6).alias("mean_word_len"),
            F.round(t["alpha_frac"], 6).alias("alpha_frac"),
            t["stop_distinct"].alias("stop_distinct"),
            F.round(t["symbol_ratio"], 6).alias("symbol_ratio"),
            F.round(ln["bullet_frac"], 6).alias("bullet_frac"),
            F.round(ln["ellipsis_frac"], 6).alias("ellipsis_frac"),
            r_words.cast("int").alias("r_words"),
            r_mean.cast("int").alias("r_mean_len"),
            r_alpha.cast("int").alias("r_alpha"),
            r_stop.cast("int").alias("r_stop"),
            r_sym.cast("int").alias("r_symbol"),
            r_bullet.cast("int").alias("r_bullet"),
            r_ellip.cast("int").alias("r_ellipsis"),
            keep.cast("int").alias("keep"),
        ]

    # bind both structs once each (let_ nests: struct-of-structs)
    both = let_(
        F.struct(tok_stats.alias("t"), line_stats.alias("ln")),
        lambda b: F.struct(*flags(b["t"], b["ln"])),
    )
    return [both.getField(f).alias(f) for f in [
        "n_words", "mean_word_len", "alpha_frac", "stop_distinct",
        "symbol_ratio", "bullet_frac", "ellipsis_frac",
        "r_words", "r_mean_len", "r_alpha", "r_stop", "r_symbol",
        "r_bullet", "r_ellipsis", "keep",
    ]]


# C4 cleaning battery (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning", §2.2) — the OTHER canonical pre-training filter
# next to gopher_rules: line-level retention rules plus document
# verdicts. Distinct from gopher_rules (doc-level signal thresholds)
# and boilerplate_lines (corpus-frequency CCNet pass): C4 is pure
# per-line rules, so it composes the same let_-bound zero-shuffle
# shape with no corpus state at all.
C4_TERMINALS = (".", "!", "?", '"')


def c4_clean(
    col: Column | str,
    *,
    min_line_words: int = 3,
    min_sentences: int = 3,
) -> list[Column]:
    """Named columns ``(n_lines, n_kept, n_sentences, has_brace,
    clean_text, keep_doc)`` implementing the public C4 rules:

    - a LINE is kept iff it ends in terminal punctuation (. ! ? "),
      has >= ``min_line_words`` words, and does not contain the word
      "javascript" (case-insensitive);
    - a DOCUMENT is dropped iff it contains "{" (code), contains
      "lorem ipsum" (boilerplate), or its kept lines carry fewer
      than ``min_sentences`` sentence terminals.

    ``clean_text`` joins the kept lines with single spaces, in
    order. One let_-bound line array; no explode, no shuffle, no
    Python — scan-local at any scale.
    """
    c = F.col(col) if isinstance(col, str) else col

    def with_lines(lines: Column) -> Column:
        ne = F.filter(F.transform(lines, F.trim), lambda l: F.length(l) > 0)
        kept = F.filter(
            ne,
            lambda l: F.substring(l, -1, 1).isin(*C4_TERMINALS)
            & (F.size(F.split(l, r"\s+")) >= min_line_words)
            & ~F.lower(l).contains("javascript"),
        )
        clean = F.array_join(kept, " ")
        n_sent = let_(
            clean,
            lambda t: sum(
                (occurrences(t, term) for term in (".", "!", "?")),
                F.lit(0),
            ),
        )
        return F.struct(
            F.size(ne).alias("n_lines"),
            F.size(kept).alias("n_kept"),
            n_sent.alias("n_sentences"),
            clean.alias("clean_text"),
        )

    st = let_(F.split(c, "\n"), with_lines)
    has_brace = c.contains("{")
    has_lorem = F.lower(c).contains("lorem ipsum")
    keep = (
        ~has_brace
        & ~has_lorem
        & (st.getField("n_sentences") >= min_sentences)
    )
    # repeated top-level references to `st` are shared by codegen
    # subexpression elimination (unlike captures inside HOF lambdas,
    # which is what let_ guards; see let_ docstring)
    return [
        st.getField("n_lines").alias("n_lines"),
        st.getField("n_kept").alias("n_kept"),
        st.getField("n_sentences").alias("n_sentences"),
        has_brace.cast("int").alias("has_brace"),
        st.getField("clean_text").alias("clean_text"),
        keep.cast("int").alias("keep_doc"),
    ]


def cdc_boundaries(
    col: Column | str,
    window: int = 8,
    mask_bits: int = 6,
    min_size: int = 16,
) -> Column:
    """Content-defined chunk boundaries of a string (the CDC family —
    Rabin/gear/FastCDC — reduced to an md5-window rolling hash both
    engines can replay): position ``t`` (1-based, ``t > window``) is a
    CANDIDATE when ``md5_60(substring(text, t-window+1, window)) %
    2^mask_bits == 0`` — a pure function of the ``window`` bytes
    ending at ``t`` — and candidates closer than ``min_size`` to the
    previously accepted cut are dropped (the standard min-size gate,
    resolved left-to-right). Returns the sorted int array of accepted
    cut positions (each cut ENDS a chunk at ``t``).

    Because the hash sees only a local window, an insertion anywhere
    perturbs at most the chunks overlapping it — every later boundary
    re-aligns — which is exactly the property the engine's fixed
    20-token ``chunk_dedup_stats`` lacks (one inserted word shifts
    every subsequent fixed chunk and kills dedup). Production CDC
    adds a max-size force cut and a gear table instead of md5; the
    md5 window keeps the operator bit-identical across Spark, numpy
    and DuckDB (full value oracle) at the same asymptotic shape: one
    pass, row-local, no shuffle, no Python.
    """
    c = F.col(col) if isinstance(col, str) else col

    def body(t: Column) -> Column:
        n = F.length(t)
        cands = F.filter(
            F.transform(
                F.sequence(F.lit(window), n),
                lambda p: F.when(
                    F.pmod(
                        md5_60(F.substring(t, p - window + 1, window)),
                        F.lit(1 << mask_bits),
                    )
                    == 0,
                    p,
                ).otherwise(F.lit(-1)),
            ),
            lambda p: p > 0,
        )
        accepted = F.aggregate(
            cands,
            F.array().cast("array<int>"),
            lambda acc, p: F.when(
                (F.size(acc) == 0) & (p >= min_size)
                | (F.size(acc) > 0) & (p - F.element_at(acc, -1) >= min_size),
                F.concat(acc, F.array(p.cast("int"))),
            ).otherwise(acc),
        )
        return F.when(n >= window, accepted).otherwise(
            F.array().cast("array<int>")
        )

    return let_(c, body)


def cdc_chunk_fps(
    col: Column | str,
    window: int = 8,
    mask_bits: int = 6,
    min_size: int = 16,
    cuts: Column | None = None,
) -> Column:
    """md5-60 fingerprints of the content-defined chunks: the text
    split at :func:`cdc_boundaries` (final partial chunk included).
    The dedup key set that survives insert/delete shifts. Pass a
    precomputed ``cuts`` column when the caller also emits the
    boundaries — the candidate scan (one md5 per byte position)
    dominates the cost and must not run twice."""
    c = F.col(col) if isinstance(col, str) else col

    def body(b: Column) -> Column:
        t = b.getField("t")
        cuts = F.concat(
            F.array(F.lit(0)),
            b.getField("cuts"),
            F.when(
                (F.size(b.getField("cuts")) == 0)
                | (F.element_at(b.getField("cuts"), -1) < F.length(t)),
                F.array(F.length(t).cast("int")),
            ).otherwise(F.array().cast("array<int>")),
        )
        idx = F.sequence(F.lit(1), F.size(cuts) - 1)
        return F.filter(
            F.transform(
                idx,
                lambda i: F.when(
                    F.element_at(cuts, i + 1) > F.element_at(cuts, i),
                    md5_60(
                        F.substring(
                            t,
                            F.element_at(cuts, i) + 1,
                            F.element_at(cuts, i + 1) - F.element_at(cuts, i),
                        )
                    ),
                ).otherwise(F.lit(None)),
            ),
            lambda fp: fp.isNotNull(),
        )

    cut_col = (
        cuts
        if cuts is not None
        else cdc_boundaries(c, window, mask_bits, min_size)
    )
    return let_(
        F.struct(c.alias("t"), cut_col.alias("cuts")),
        body,
    )


# Classic UTF-8-decoded-as-latin1/cp1252 artifacts: the lead bytes of
# accented Latin (0xC3 'Ã', 0xC2 'Â') and the cp1252 rendering of
# U+20xx punctuation ('â€œ' opening quote, 'â€"' dash, ...). Their
# presence in supposedly-clean text is the canonical mojibake tell.
MOJIBAKE_MARKERS: list[str] = ["�", "Ã", "Â", "â€"]


def mojibake_score(col: Column | str) -> list[Column]:
    """Encoding-damage signals as named columns ``(n_repl, n_double,
    mojibake_frac, is_mojibake)``: U+FFFD replacement characters
    (a decoder already gave up) and double-encoding artifact counts
    (UTF-8 bytes decoded as latin-1/cp1252 — see MOJIBAKE_MARKERS),
    the fraction of characters involved, and the flag a curation
    pipeline filters on. The downstream complement of
    ``operators/charset.py``: charset detection fixes what arrives
    MISLABELED; this catches text that was already transcoded wrongly
    UPSTREAM and can only be dropped or re-fetched. Length-arithmetic
    occurrences only — whole-stage codegen, zero shuffle."""
    c = F.col(col) if isinstance(col, str) else col

    def body(t: Column) -> Column:
        n_repl = occurrences(t, "�")
        n_double = sum(
            (occurrences(t, m) for m in MOJIBAKE_MARKERS[1:]), F.lit(0)
        )
        n = F.length(t)
        frac = F.when(n == 0, F.lit(0.0)).otherwise(
            (n_repl + n_double) / n.cast("double")
        )
        return F.struct(
            n_repl.alias("n_repl"),
            n_double.alias("n_double"),
            F.round(frac, 6).alias("mojibake_frac"),
            ((n_repl + n_double) > 0).cast("int").alias("is_mojibake"),
        )

    st = let_(c, body)
    return [
        st.getField(f).alias(f)
        for f in ("n_repl", "n_double", "mojibake_frac", "is_mojibake")
    ]
