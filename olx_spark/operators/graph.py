"""Distributed connected components — dedup-group assignment.

The missing last step of every near-duplicate pipeline: MinHash/LSH,
SimHash, phash and exact n-gram Jaccard all emit PAIRS
``(doc_a, doc_b)``, but a dedup pass needs transitive GROUPS — if
A~B and B~C then {A,B,C} is one cluster and the pipeline keeps one
representative. (The reference engine dedups only within a listing
page — `/root/reference/src/main/scala/olx/DownloadAds.scala:44`'s
per-page `distinct` — so this operator is part of the
training-data-pipeline surface, not reference parity.)

Algorithm: iterative min-label propagation with POINTER JUMPING.
Each round does

1. neighbor step — ``comp(v) := min(comp(v), min over u in N(v) of
   comp(u))`` (one shuffle join edges x labels + one groupBy), and
2. pointer-jump step — ``comp(v) := comp(comp(v))`` (labels joined
   with itself on the component id),

so labels hop along edges AND collapse along the component-pointer
chain in the same round. Plain propagation alone needs O(diameter)
rounds — a 10^6-long chain of near-dups (boilerplate page series)
would take 10^6 shuffles; with the jump step the pointer chains halve
each round, giving O(log n) convergence like the large-star/small-star
construction of Kiveris et al. (MapReduce connected components) while
staying three joins of plain DataFrame code.

Scale shape (100 TB): per round = 2 shuffle joins + 1 groupBy over
the label table (one row per node, ~tens of bytes — orders of
magnitude smaller than the corpus the pairs came from) plus one join
over the symmetrized edge table; both are hash-partitioned on the
node id, so AQE coalesces the label side as components merge.
Convergence is detected with a count of changed labels (a cheap agg
over the just-materialized round result — no extra scan). Labels are
materialized per round through :func:`olx_spark.session.materialize`,
inheriting the ``spark.olx.checkpoint.reliable`` fault-tolerance knob
(executor-resident localCheckpoint by default; reliable
``checkpoint()`` for multi-hour cluster passes — an iterative
algorithm is exactly where unbounded lineage would otherwise blow up
the plan).
"""

from __future__ import annotations

import logging
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olx_spark.session import materialize

logger = logging.getLogger(__name__)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    reliable: bool | None = None,
) -> DataFrame:
    """Assign every node its connected-component id = the MINIMUM node
    id reachable from it (deterministic labels — the natural "keep the
    first-seen document" dedup representative).

    ``nodes``: one column ``node_col`` (ids; isolated nodes become
    singleton components). ``edges``: columns ``src``/``dst`` in the
    same id domain — undirected, need not be symmetrized or deduped;
    endpoints missing from ``nodes`` still carry connectivity (a path
    through one connects its neighbors) but are not returned. Returns
    ``(node_col, component)`` — one row per input node.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    convergence — with pointer jumping that needs a component of
    > 2**max_iter nodes, so hitting it means the edge generator is
    broken (e.g. the near-dup threshold collapsed the corpus into one
    giant cluster), which should be LOUD, not silently mislabeled.
    """
    sym = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        reliable=reliable,
    )
    wanted = nodes.select(F.col(node_col).alias("id")).distinct()
    # label edge endpoints too, even if absent from `nodes` — a path
    # through an unlisted node must still connect its neighbors
    labels = materialize(
        wanted.union(sym.select(F.col("a").alias("id"))).distinct()
        .withColumn("comp", F.col("id")),
        reliable=reliable,
    )
    from pyspark.sql import Observation

    for it in range(max_iter):
        # 1. neighbor step: pull each neighbor's current label over the
        #    (symmetrized) edges, take the min with the own label; the
        #    round-start label rides along as __prev so convergence can
        #    be observed on the round's own materialize job (below)
        nbr = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id",
            F.least("comp", "nbr_comp").alias("comp"),
            F.col("comp").alias("__prev"),
        )
        # 2. pointer jump: comp := prev_comp(comp) — the jump table is
        #    the ROUND-START label table (already materialized), not
        #    the half-step result, so the half-step needs no extra
        #    checkpoint job per round (r6: one materialize per round
        #    instead of two). Still a contraction: every comp value is
        #    a node id present in `labels`, labels only decrease, and
        #    prev_comp(c) <= c, so chains keep collapsing
        #    geometrically (the jump is one half-step staler than
        #    comp(comp), costing at most an extra round or two, each
        #    round now half the barrier count). Fixpoint and the
        #    returned labels are unchanged: convergence still means
        #    "no label moved this round".
        jumped = (
            stepped.join(
                labels.select(
                    F.col("id").alias("comp"), F.col("comp").alias("comp2")
                ),
                "comp",
                "left",
            )
            .select(
                "id", F.least("comp", "comp2").alias("comp"), F.col("__prev")
            )
        )
        # convergence detection rides an OBSERVE node on the round's
        # materialize (round-6): the former new-vs-old join + count was
        # a full extra job per round; the observation is an accumulator
        # on work the materialize already does. Comps are never null,
        # so the inequality is total.
        obs = Observation()
        new_labels = materialize(
            jumped.observe(
                obs,
                F.sum(
                    (F.col("comp") != F.col("__prev")).cast("long")
                ).alias("chg"),
            ),
            reliable=reliable,
        )
        changed = int(obs.get["chg"] or 0)
        labels = new_labels.select("id", "comp")
        logger.debug("connected_components round %d: %d labels changed", it, changed)
        if changed == 0:
            return labels.join(wanted, "id").select(
                F.col("id").alias(node_col), "comp"
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "a component would need more than 2**max_iter nodes; the edge "
        "generator is almost certainly degenerate (near-dup threshold "
        "too low?)"
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 6,
    reliable: bool | None = None,
    materialize_every: int = 6,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) over a directed edge
    list: hubs point at good authorities, authorities are pointed at
    by good hubs. Returns ``(id, auth, hub)`` for every edge endpoint
    — the complement of :func:`pagerank` for crawl-frontier ranking
    (a listing/hub page deserves refetch priority because it FEEDS
    good ad/authority pages; PageRank alone under-ranks pure hubs,
    which have no in-links).

    Update per iteration (classic two-phase, authorities first,
    hubs from the NEW authorities), normalized ONCE at the end::

        auth'(v) = sum over u->v of hub(u)
        hub'(v)  = sum over v->u of auth'(u)
        ... after `iters` rounds:  auth = auth' / L1, hub = hub' / L1

    Per-step L1 normalization (Kleinberg's presentation, modulo his
    L2) divides EVERY entry by the same scalar, and each half-step is
    linear in the previous vector — so the scalars cancel through the
    recurrence and normalizing once at the end yields the identical
    real-valued result while deleting ``2*iters - 2`` global-total
    subqueries from the plan (values stay tiny: bounded by
    ``n * max_degree**iters`` in a double). L1 (not L2): same fixed
    point up to scaling, replayable in plain SQL without
    sqrt-of-sum ordering concerns — stated so the oracle and
    consumers agree. FIXED ``iters``, so the result is a
    deterministic function of the graph and the DuckDB oracle
    unrolls the same end-normalized steps. A graph whose iteration
    drives one side's total mass to zero (no edges) yields zeros,
    never a division error.

    Scale shape (100 TB): the edge table is materialized ONCE and
    reused by all ``2 * iters`` joins; per half-iteration the work is
    one score-table join keyed on ``src`` (resp. ``dst``) + one
    map-side-combined groupBy — hot hub/authority nodes are
    partial-aggregated before the shuffle. Score frames are SPARSE (a
    node with score 0 is simply absent; zeros re-attach once on
    output — see the loop comment), so no per-half-step node join
    exists at all. Frames are materialized every ``materialize_every``
    half-steps (and always at the two loop exits, where a frame gains
    a second consumer) — the same lineage-bound-vs-barrier-count trade
    as :func:`pagerank`'s ``materialize_every``, default 6 = one
    mid-loop cut for the standard 6-iteration call (measured at sf0.1:
    ~8.9s at stride 2, ~7.3s at 4, ~5.9s at 12; stride 6 keeps retry
    recompute bounded at 6 half-steps for ~1s over the floor); in
    between, a half-step's single consumer is the next half-step, so
    laziness never double-executes a join.
    The two final L1 totals are 1-row aggregates over materialized
    frames riding explicit broadcast cross joins (no driver collect).
    At billions of nodes the cluster-grade upgrade is the same as
    :func:`pagerank`'s ``edge_layout="bucketed"`` but with TWO
    bucketed copies (by src and by dst) since HITS alternates join
    keys; the ``reliable`` knob hardens the materialize against
    executor loss.
    """
    # ONE materialized pass over the raw edge expression; nodes and
    # every half-step join read the cut, not the upstream subtree
    e_m = materialize(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
        reliable=reliable,
    )
    nodes = materialize(
        e_m.select(F.col("src").alias("id"))
        .union(e_m.select(F.col("dst").alias("id")))
        .distinct(),
        reliable=reliable,
    )

    # SPARSE score frames (round-6 optimization): a node absent from a
    # score frame has score exactly 0.0 and contributes nothing to the
    # next half-step's sum (adding 0.0 to a nonnegative IEEE sum is an
    # identity), so the per-half-step ``nodes LEFT JOIN raw`` that
    # re-attached explicit zeros was pure overhead — 12 extra joins
    # (and their broadcast/stage barriers) per call. The inner joins
    # below are lossless after the first half-step by construction:
    # every join key the sum needs is an edge endpoint that the
    # previous half-step's groupBy necessarily emitted. Zeros are
    # re-attached ONCE on output; values are bit-identical.
    def half_step(scores: DataFrame, score_col: str, join_key: str,
                  group_key: str, out_col: str) -> DataFrame:
        return (
            e_m.join(scores.withColumnRenamed("id", join_key), join_key)
            .groupBy(F.col(group_key).alias("id"))
            .agg(F.sum(score_col).alias(out_col))
        )

    if iters == 0:  # all-ones vectors, normalized — no half-steps
        n_tot = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
        return nodes.crossJoin(F.broadcast(n_tot)).select(
            "id",
            F.when(F.col("n") > 0, F.lit(1.0) / F.col("n"))
            .otherwise(F.lit(0.0)).alias("auth"),
            F.when(F.col("n") > 0, F.lit(1.0) / F.col("n"))
            .otherwise(F.lit(0.0)).alias("hub"),
        )

    # first half-step: every hub score is the constant 1.0, so the
    # join degenerates to sum(lit(1.0)) per dst — same doubles
    from pyspark.sql import Observation

    auth = e_m.groupBy(F.col("dst").alias("id")).agg(
        F.sum(F.lit(1.0)).alias("auth")
    )
    hub = None
    stride = max(1, materialize_every)
    # the two L1 totals ride the FINAL auth/hub materialize jobs as
    # observe accumulators (r6): the former 1-row agg subqueries (and
    # their broadcast cross joins) are two whole extra plan stages per
    # call — the observed sum is the same F.sum over the same
    # materialized frame
    ta_obs = Observation()
    th_obs = Observation()
    for i in range(iters):
        if i > 0:
            auth = half_step(hub, "hub", "src", "dst", "auth")
        # the final auth feeds BOTH the last hub half-step and the
        # output join — always cut it so that subtree runs once
        if i == iters - 1:
            auth = materialize(
                auth.observe(
                    ta_obs, F.coalesce(F.sum("auth"), F.lit(0.0)).alias("ta")
                ),
                reliable=reliable,
            )
        elif (2 * i + 1) % stride == 0:
            auth = materialize(auth, reliable=reliable)
        hub = half_step(auth, "auth", "dst", "src", "hub")
        if i == iters - 1:
            hub = materialize(
                hub.observe(
                    th_obs, F.coalesce(F.sum("hub"), F.lit(0.0)).alias("th")
                ),
                reliable=reliable,
            )
        elif (2 * i + 2) % stride == 0:
            hub = materialize(hub, reliable=reliable)
    ta = float(ta_obs.get["ta"] or 0.0)
    th = float(th_obs.get["th"] or 0.0)
    a_col = (
        (F.coalesce("auth", F.lit(0.0)) / F.lit(ta)) if ta > 0 else F.lit(0.0)
    )
    h_col = (
        (F.coalesce("hub", F.lit(0.0)) / F.lit(th)) if th > 0 else F.lit(0.0)
    )
    return (
        nodes.join(auth, "id", "left")
        .join(hub, "id", "left")
        .select("id", a_col.alias("auth"), h_col.alias("hub"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 6,
    reliable: bool | None = None,
    edge_layout: str = "auto",
    materialize_every: int = 3,
    seeds: DataFrame | None = None,
    seed_col: str = "id",
) -> DataFrame:
    """Fixed-iteration power-iteration PageRank over a directed edge
    list (node set = all edge endpoints). Returns ``(id, rank)``.

    This is the classic crawl-priority / entity-importance score
    (PageRank-guided frontier ordering is the standard alternative to
    the reference's FIFO order). FIXED ``iters`` — not
    convergence-detected — so the result is a deterministic function
    of the graph and therefore exactly reproducible by an engine
    unrolling the same ``iters`` (the DuckDB oracle): both sides
    compute r_{k+1}(v) = (1-d)/N + d * sum over in-edges of
    r_k(u)/outdeg(u). Dangling-node mass is NOT redistributed (the
    simple variant; total mass < 1 in graphs with sinks) — stated so
    the oracle and any consumer agree.

    Scale shape (100 TB): the out-degree is folded into the edge
    table ONCE before the loop (rank/deg math unchanged — deg rides
    along, identical FP results). How the edge table is laid out for
    the loop follows ``edge_layout``:

    - ``"inline"`` — materialize ``(src, dst, deg)`` once
      (localCheckpoint/checkpoint). Materialized frames carry row/size
      stats, so while the rank table fits
      ``spark.sql.autoBroadcastJoinThreshold`` every iteration's
      edges-x-ranks join is a BroadcastHashJoin: the edge table is
      NEVER exchanged and ranks never shuffle either. The right shape
      while ranks broadcast.
    - ``"bucketed"`` — write the edge frame ONCE as a parquet table
      bucketed + sorted by ``src`` (pre-repartitioned on the bucket
      key so each bucket is a single file and the scan exposes the
      hash partitioning AND the sort order). Every iteration's
      SortMergeJoin then reads the edge side exchange-free and
      sort-free; only the 1-row-per-node rank table shuffles (the
      Pregel edge-partition-resident layout; a plain localCheckpoint
      cannot express this — checkpointed frames surface
      ``UnknownPartitioning``). The right shape once ranks outgrow
      the broadcast threshold: billions of nodes at 10^10-URL scale.
      On a real cluster the table goes to the warehouse/object store;
      here it lands in a temp dir and is dropped after the loop.
    - ``"auto"`` (default) — pick by measuring: bucketed iff the rank
      table's estimated broadcast size (node_count x 32 B) exceeds
      the session's broadcast threshold.

    Per iteration in both layouts the only unavoidable Exchange is
    the map-side-combined groupBy on ``dst`` (hot in-degree nodes are
    partial-aggregated map-side) — the loop carries the SPARSE
    ``in_sum`` frame and evaluates ``rank_k(src) = tele(src) + d *
    coalesce(in_sum_k(src), 0)`` INLINE in the edge join (the
    teleport term is per-node constant and rides the edge table, so
    no per-iteration node-attach join exists; zeros re-attach once on
    output — same expressions, same doubles, bit-identical results).
    ``in_sum`` is materialized every ``materialize_every`` iterations
    (and always after the last) via
    :func:`olx_spark.session.materialize` (the
    ``spark.olx.checkpoint.reliable`` knob) — the cut both truncates
    lineage (a task retry recomputes at most that many iterations)
    and keeps the per-iteration barrier count down (measured at
    sf0.1: stride 3 is ~10% under stride 2; stride 6 buys ~10% more
    at double the retry recompute — 3 is the default trade).

    ``seeds`` switches on PERSONALIZED PageRank — TrustRank
    (Gyongyi, Garcia-Molina, Pedersen, VLDB 2004), the web-spam
    demotion primitive: the teleport mass lands uniformly on the
    trusted seed set instead of all nodes (``t(v) = 1/|S|`` for
    seeds, else 0; ``r_0 = t``), so rank can only flow out of the
    trusted neighborhood along real links and spam farms far from
    any seed starve. Same loop, same layouts — the seed flag is
    folded into the edge table once (per-src constant) and the node
    frame for the final output; non-seed expression paths are
    untouched. Seeds absent from the graph are ignored; an empty
    effective seed set raises.
    """
    # ONE materialized edge pass: (src, dst, deg) is cut in a single
    # job — the two references to the raw edge expression inside it
    # (the join probe side and the out-degree aggregate) share their
    # exchange via ReuseExchange, so the upstream (often
    # distinct-heavy) subtree executes once — and nodes then derive
    # from the cut (deg projected away) instead of a second
    # full-edge-table checkpoint
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    e_all = e.join(outdeg, "src")
    seed_ids = None
    if seeds is not None:
        seed_ids = seeds.select(
            F.col(seed_col).alias("id")
        ).distinct().withColumn("__seed", F.lit(1))
        # fold the (per-src constant) seed flag into the edge table
        # BEFORE the cut, so the loop's edge scans carry it for free
        e_all = e_all.join(
            F.broadcast(
                seed_ids.select(
                    F.col("id").alias("src"),
                    F.col("__seed").alias("__src_seed"),
                )
            ),
            "src",
            "left",
        )
    e_all = materialize(e_all, reliable=reliable)
    # n rides the nodes materialize as an observe accumulator (r6) —
    # the former separate nodes.count() job is gone
    from pyspark.sql import Observation

    n_obs = Observation()
    nodes = materialize(
        e_all.select(F.col("src").alias("id"))
        .union(e_all.select(F.col("dst").alias("id")))
        .distinct()
        .observe(n_obs, F.count(F.lit(1)).alias("n")),
        reliable=reliable,
    )
    n = int(n_obs.get["n"] or 0)
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if edge_layout == "auto":
        bcast_bytes = int(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        )
        edge_layout = "bucketed" if n * 32 > bcast_bytes > 0 else "inline"
        logger.info("pagerank: auto edge_layout -> %s (n=%d)", edge_layout, n)

    # EDGE-RESIDENT TELEPORT (round-6 optimization): the per-iteration
    # ``base JOIN in_sum`` that re-attached the teleport term to every
    # node before the next edge join was one extra join + broadcast
    # barrier per iteration. Since rank_k(v) = tele(v) + d*in_sum_k(v)
    # and tele(v) is a per-node constant, the NEXT iteration's edge
    # join can evaluate rank_k(src) inline from edge-resident columns
    # (the seed flag — per-src constant — rides the edge table; the
    # unseeded teleport is a literal). The loop then carries only the
    # sparse ``in_sum`` frame: a node absent from it has in_sum = 0
    # and rank = tele, exactly what the inline coalesce charges.
    # Same expressions, same doubles, same addends — bit-identical
    # results; one join + one groupBy per iteration instead of two
    # joins + one groupBy (and iteration 1 is groupBy-only: rank_0 is
    # a pure function of the edge-resident columns).
    if seeds is None:
        base = nodes
        tele_col = F.lit((1.0 - damping) / n)
        rank0_src = F.lit(1.0 / n)
        tele_src = F.lit((1.0 - damping) / n)
    else:
        # n_seeds rides the base materialize the same way (r6)
        s_obs = Observation()
        base = materialize(
            nodes.join(F.broadcast(seed_ids), "id", "left").observe(
                s_obs,
                F.sum(
                    (F.col("__seed") == 1).cast("long")
                ).alias("ns"),
            ),
            reliable=reliable,
        )
        n_seeds = int(s_obs.get["ns"] or 0)
        if n_seeds == 0:
            raise ValueError(
                "trustrank: no seed appears in the edge set"
            )
        tele_col = F.when(
            F.col("__seed") == 1, F.lit((1.0 - damping) / n_seeds)
        ).otherwise(F.lit(0.0))
        rank0_src = F.when(
            F.col("__src_seed") == 1, F.lit(1.0 / n_seeds)
        ).otherwise(F.lit(0.0))
        tele_src = F.when(
            F.col("__src_seed") == 1, F.lit((1.0 - damping) / n_seeds)
        ).otherwise(F.lit(0.0))

    tbl = tbl_path = None
    if edge_layout == "bucketed":
        tbl = f"olx_pr_edges_{uuid.uuid4().hex[:12]}"
        tbl_path = tempfile.mkdtemp(prefix="olx_pr_edges_")
        (
            e_all.repartition(n_part, "src")
            .write.bucketBy(n_part, "src")
            .sortBy("src")
            .option("path", tbl_path)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        e_deg = spark.table(tbl)
    else:
        # e_all is already cut above; the seeded path's lazy broadcast
        # seed-flag join on top of it needs no second checkpoint
        e_deg = e_all
    stride = max(1, materialize_every)
    try:
        if iters == 0:  # rank_0: the initial vector, no power steps
            r0 = (
                F.lit(1.0 / n)
                if seeds is None
                else F.when(F.col("__seed") == 1, F.lit(1.0 / n_seeds))
                .otherwise(F.lit(0.0))
            )
            return base.select("id", r0.alias("rank"))
        # iteration 1: rank_0(src) is edge-resident — groupBy only
        in_sum = e_deg.groupBy(F.col("dst").alias("id")).agg(
            F.sum(rank0_src / F.col("deg")).alias("in_sum")
        )
        if 1 % stride == 0 or iters == 1:
            in_sum = materialize(in_sum, reliable=reliable)
        for i in range(1, iters):
            prev = in_sum.select(
                F.col("id").alias("src"), F.col("in_sum").alias("__in")
            )
            rank_src = tele_src + F.lit(damping) * F.coalesce(
                F.col("__in"), F.lit(0.0)
            )
            in_sum = (
                e_deg.join(prev, "src", "left")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(rank_src / F.col("deg")).alias("in_sum"))
            )
            if (i + 1) % stride == 0 or i == iters - 1:
                in_sum = materialize(in_sum, reliable=reliable)
        ranks = base.join(in_sum, "id", "left").select(
            "id",
            (
                tele_col
                + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
            ).alias("rank"),
        )
    finally:
        if tbl is not None:
            # the final-iteration materialize() makes `in_sum` (and so
            # the returned frame, a join of two materialized frames)
            # independent of the bucketed table, so dropping is safe
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(tbl_path, ignore_errors=True)
    return ranks


def seed_distance(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "id",
    max_hops: int = 6,
    reliable: bool | None = None,
) -> DataFrame:
    """Breadth-first seed distance over a directed link graph — the
    crawl-depth map. ``dist(v)`` = length of the shortest directed
    path from any seed to ``v``, capped at ``max_hops`` (nodes deeper
    than the cap are absent — exactly a crawler's depth-limit
    semantics; the reference's unfold is depth-limited the same way
    by its page cap, ``Olx.scala:21-24``).

    Returns ``(id, dist)`` — one row per reachable node, including
    the seeds at dist 0. Deterministic: BFS layer order is
    data-independent (each node's dist is the ROUND it was first
    reached, and rounds are global barriers).

    Scale shape (10^10-edge web graph): per hop = ONE shuffle join of
    the current frontier (small: one BFS layer) against the edge
    table hash-partitioned on ``src``, plus an anti-join against the
    visited set — the same pending-minus-seen shape as the crawl
    engine's round derivation (`plans/scaled.py`), and the same
    partitioning, so a bucketed edge layout makes the hop join
    co-located. Only each hop's LAYER is materialized (lineage cut;
    ``spark.olx.checkpoint.reliable`` knob applies) — the visited set
    stays a lazy union of the already-materialized layers, so the
    anti-join scans the same one-row-per-node total without paying an
    O(reached) re-checkpoint of the whole set every hop (the union is
    at most ``max_hops`` frames deep, each with lineage depth one).
    Early exit when a layer drains: a bounded-diameter graph costs
    diameter hops, not ``max_hops``.
    """
    from functools import reduce

    # materialized ONCE: every hop joins the same edge table — un-cut,
    # the upstream projection + distinct would re-execute per hop
    e = materialize(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct(),
        reliable=reliable,
    )
    frontier = materialize(
        seeds.select(F.col(seed_col).alias("id")).distinct()
        .withColumn("dist", F.lit(0)),
        reliable=reliable,
    )
    from pyspark.sql import Observation

    layers = [frontier]
    visited_ids = frontier.select("id")
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.select(F.col("id").alias("src")), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited_ids, "id", "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        # the drained-layer check rides the hop's materialize as an
        # observe accumulator (r6) — the former limit(1).count() was
        # one extra job per hop
        obs = Observation()
        frontier = materialize(
            nxt.observe(obs, F.count(F.lit(1)).alias("n")),
            reliable=reliable,
        )
        if int(obs.get["n"] or 0) == 0:
            break
        layers.append(frontier)
        visited_ids = visited_ids.union(frontier.select("id"))
    return reduce(lambda a, b: a.union(b), layers)


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    reliable: bool | None = None,
) -> DataFrame:
    """Synchronous label propagation (Raghavan, Albert, Kumara 2007)
    community detection: every node starts as its own label; each
    round, a node adopts the most frequent label among its in-
    neighbors' PREVIOUS-round labels (ties -> smallest label;
    isolated nodes keep their label). Returns ``(id, label)`` after
    ``iters`` rounds.

    Deterministic by construction — synchronous updates plus a total
    tie order — unlike the asynchronous/random-order LPA variants, so
    the result is a pure function of the graph and carries a full
    value oracle (the async variants trade that for fewer label
    oscillations; at fixed small ``iters`` the sync form is the one
    an engine can replay and test). Complements
    :func:`connected_components` (structure only) with density-based
    communities.

    Scale shape: each round is one co-partitioned edges-to-labels
    join plus one map-side-combinable ``(node, label)`` count, and
    the argmax is a windowless min-of-struct ``(-count, label)`` —
    no row_number window funneling hot nodes through one task.
    Labels are materialized per round (lineage reset;
    ``reliable`` -> fault-tolerant checkpoint). Pass ``edges``
    pre-symmetrized for undirected semantics.
    """
    if iters < 0:
        raise ValueError("iters >= 0 required")
    # materialized ONCE: the edge table is re-joined every round (and
    # feeds the node derivation) — un-cut, the upstream edge subtree
    # (often a distinct-heavy union) would re-execute iters + 1 times
    e = materialize(
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")),
        reliable=reliable,
    )
    nodes = (
        e.select(F.col("__s").alias("id"))
        .union(e.select(F.col("__d").alias("id")))
        .distinct()
    )
    labels = materialize(
        nodes.select("id", F.col("id").alias("label")), reliable=reliable
    )
    for _ in range(iters):
        msgs = e.join(
            labels.select(F.col("id").alias("__s"), "label"), "__s"
        ).select(F.col("__d").alias("id"), "label", F.lit(1).alias("w"))
        # OWN-LABEL SENTINEL (r6): the former per-round
        # ``labels LEFT JOIN best`` that re-attached the kept label to
        # nodes with no in-neighbors is replaced by unioning each
        # node's own label at weight 0 into the count stream. A real
        # neighbor count c >= 1 gives struct key -c <= -1 < 0, so it
        # always beats the sentinel; a node with no messages keeps its
        # own label via the sentinel — exactly the old
        # ``coalesce(new_label, label)``. One hash repartition on
        # ``id`` up front lets BOTH groupBys below reuse the same
        # exchange (HashPartitioning(id) satisfies clustering on
        # (id,label) — guide §2.4): one shuffle per round instead of
        # two plus a join.
        cand = msgs.unionByName(
            labels.select("id", "label", F.lit(0).alias("w"))
        ).repartition("id")
        counts = cand.groupBy("id", "label").agg(F.sum("w").alias("c"))
        labels = materialize(
            counts.groupBy("id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"), F.col("label").alias("l")
                    )
                ).alias("b")
            )
            .select("id", F.col("b.l").alias("label")),
            reliable=reliable,
        )
    return labels
