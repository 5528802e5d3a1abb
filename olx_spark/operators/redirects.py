"""Redirect-chain resolution — canonical final targets for a crawl's
HTTP 3xx / ``<link rel=canonical>`` map.

The reference follows redirects implicitly inside sttp's request layer
(one hop at a time, per fetch — ``DownloadAds.scala:25-41`` never sees
the chain); a 10^10-URL frontier must resolve the WHOLE redirect map
offline before scheduling, or it wastes fetches walking chains hop by
hop and double-counts every alias in the seen-set. This operator takes
the accumulated redirect edge list (one row per ``src -> dst``
observation) and resolves every source to its terminal URL.

Semantics:

- The map is made FUNCTIONAL first: a src observed with several
  targets (A/B-tested redirects, flapping CDNs) deterministically
  keeps the MIN dst, and self-loop observations (``src == dst``) are
  dropped — so the result is a pure function of the edge SET, not of
  partition order.
- ``final_url`` = the first node reached that is not itself a redirect
  source; ``hops`` = the EXACT chain length walked to reach it
  (doubling preserves exact hop counts — see below).
- Walks with no terminal — redirect CYCLES (A -> B -> A:
  misconfigured hosts produce these constantly) and chains that lead
  into one (rho shapes) — resolve with ``is_cycle = 1`` and
  ``final_url / hops = NULL``: there is nothing to fetch at the end,
  schedulers should quarantine these.

Scale shape: POINTER JUMPING, the same doubling trick as
:func:`olx_spark.operators.graph.connected_components` — each round
substitutes ``f := f ∘ f``, so a length-L chain resolves in O(log L)
self-joins on the (source-count-sized, 3-column) pointer table, never
L sequential joins. Each round is one shuffled self-join; per-round
state is materialized through the ``spark.olx.checkpoint.reliable``
knob. Cycle detection is the PIGEONHOLE rule, not a fixed-point test
(a cycle of non-power-of-two length never fixes under doubling): the
minimum open walk length doubles every round, so after
``ceil(log2(n_src + 1))`` rounds every still-open walk has provably
taken more steps than there are distinct sources — it revisited one,
hence ends in a cycle. ``max_iter`` only guards the degenerate case
``n_src > 2**max_iter``.
"""

from __future__ import annotations

import logging
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olx_spark.session import materialize

logger = logging.getLogger(__name__)


def resolve_redirects(
    redirects: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 40,
    reliable: bool | None = None,
) -> DataFrame:
    """Resolve every redirect source to ``(src, final_url, hops,
    is_cycle)``. See module doc for semantics; one row per distinct
    non-self-loop ``src`` in the input."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    fmap = materialize(
        redirects.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .groupBy("s")
        .agg(F.min("d").alias("d")),
        reliable=reliable,
    )
    n_src = fmap.count()
    if n_src == 0:
        return fmap.select(
            F.col("s").alias("src"),
            F.col("d").alias("final_url"),
            F.lit(None).cast("long").alias("hops"),
            F.lit(0).cast("int").alias("is_cycle"),
        )
    # after `rounds` doublings every open walk has length >= 2^rounds
    # > n_src, i.e. revisited a source -> ends in a cycle (pigeonhole)
    rounds = max(1, math.ceil(math.log2(n_src + 1)))
    if rounds > max_iter:
        raise RuntimeError(
            f"resolve_redirects: {n_src} sources need {rounds} doubling "
            f"rounds > max_iter={max_iter} — raise max_iter for maps "
            "this large"
        )
    # pointer state, one row per source: "from s, walking `hops` steps
    # stands at `cur`"; done = cur is terminal (not a redirect source).
    state = materialize(
        fmap.select(
            "s",
            F.col("d").alias("cur"),
            F.lit(1).cast("long").alias("hops"),
            F.lit(False).alias("done"),
        ),
        reliable=reliable,
    )
    for it in range(rounds):
        if state.filter(~F.col("done")).count() == 0:
            break
        # substituting the state into itself doubles every open walk
        # and keeps hop counts exact: s -hops-> cur -jhops-> nxt
        jump = state.select(
            F.col("s").alias("cur"),
            F.col("cur").alias("nxt"),
            F.col("hops").alias("jhops"),
            F.col("done").alias("jdone"),
        )
        adv = ~F.col("done") & F.col("nxt").isNotNull()
        # done eagerly when the substituted walk itself had finished
        # (jdone: nxt IS the terminal) — without this a walk landing on
        # a finished one would advance by a small jhops and break the
        # doubling bound the pigeonhole cycle rule depends on
        state = materialize(
            state.join(jump, "cur", "left").select(
                "s",
                F.when(adv, F.col("nxt")).otherwise(F.col("cur")).alias("cur"),
                F.when(adv, F.col("hops") + F.col("jhops"))
                .otherwise(F.col("hops"))
                .alias("hops"),
                # nxt NULL on an open walk: cur has no pointer row, so
                # cur is terminal -> the walk just finished
                (
                    F.col("done")
                    | F.col("nxt").isNull()
                    | (adv & F.col("jdone"))
                ).alias("done"),
            ),
            reliable=reliable,
        )
        logger.debug("resolve_redirects round %d done", it)
    open_cycles = ~F.col("done")
    return state.select(
        F.col("s").alias("src"),
        F.when(open_cycles, F.lit(None).cast("string"))
        .otherwise(F.col("cur"))
        .alias("final_url"),
        F.when(open_cycles, F.lit(None).cast("long"))
        .otherwise(F.col("hops"))
        .alias("hops"),
        open_cycles.cast("int").alias("is_cycle"),
    )
