"""AIMD adaptive crawl-delay controller — deterministic replay.

A fixed per-host crawl delay wastes budget on fast, permissive hosts
and hammers fragile ones. The standard controller is AIMD with the
roles of TCP flipped (delay is inverse rate): a throttle signal
(429/503, timeouts) MULTIPLIES the delay (fast backoff, clamped at
``hi``); a success SUBTRACTS a small step (gentle probing back
toward ``lo``). The reference crawler runs one request at a time
with a static delay (`/root/reference/src/main/scala/olx/
Olx.scala:24` — fixed politeness), so this is engine-side crawl
science, not reference parity.

Everything is INTEGER milliseconds, so the trajectory is an exact
deterministic function of the per-host outcome sequence — replayable
bit-for-bit by a recursive-CTE oracle and by any consumer that wants
to audit why a host was slowed down.

Scale shape (10^10-URL crawl): one shuffle partitions the fetch log
by host (``applyInPandas`` — the custom-stateful-operator tier; the
recurrence's clamp breaks prefix-sum linearity, so a window cumsum
cannot express it). Per-host state is a single integer scanned over
the host's own log; per-host log length is already bounded by
politeness itself, so there is no hot-key blowup. The sequential
scan per host is inherent to stateful control — the parallelism is
across hosts, which is exactly the axis that grows at web scale.
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def adaptive_crawl_delay(
    events: DataFrame,
    host_col: str = "host",
    seq_col: str = "seq",
    outcome_col: str = "outcome",
    d0: int = 1000,
    lo: int = 250,
    hi: int = 64000,
    dec: int = 100,
    mult: int = 2,
) -> DataFrame:
    """Replay the AIMD recurrence over a per-host ordered fetch log.

    ``events``: (host_col, seq_col, outcome_col) — ``seq_col`` orders
    events WITHIN a host (gaps fine, ties undefined), ``outcome_col``
    is ``'throttle'`` for a backoff signal, anything else counts as
    success. Returns one row per event::

        (host, seq, outcome, delay_before, delay_after)

    where ``delay_before`` is the delay in force when the fetch was
    issued (the first event sees ``d0``) and ``delay_after`` the
    post-update state::

        throttle: delay' = min(hi, delay * mult)
        success:  delay' = max(lo, delay - dec)
    """
    if not (lo <= d0 <= hi) or dec < 0 or mult < 1:
        raise ValueError("require lo <= d0 <= hi, dec >= 0, mult >= 1")
    schema = StructType(
        [
            StructField("host", StringType()),
            StructField("seq", LongType()),
            StructField("outcome", StringType()),
            StructField("delay_before", IntegerType()),
            StructField("delay_after", IntegerType()),
        ]
    )
    src = events.select(
        events[host_col].cast("string").alias("host"),
        events[seq_col].cast("long").alias("seq"),
        events[outcome_col].cast("string").alias("outcome"),
    )

    def per_host(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq").reset_index(drop=True)
        d = d0
        before, after = [], []
        for oc in pdf["outcome"]:
            before.append(d)
            d = min(hi, d * mult) if oc == "throttle" else max(lo, d - dec)
            after.append(d)
        pdf["delay_before"] = pd.array(before, dtype="int32")
        pdf["delay_after"] = pd.array(after, dtype="int32")
        return pdf[["host", "seq", "outcome", "delay_before", "delay_after"]]

    return src.groupBy("host").applyInPandas(per_host, schema)
