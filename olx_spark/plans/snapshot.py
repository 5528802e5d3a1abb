"""Snapshot-versioned table store — Iceberg semantics over plain Parquet.

The sandbox's PySpark 4.1.2 ships no Iceberg runtime jar (SURVEY.md §7
risk d), so this implements the same *semantics* with the same layout
philosophy: every crawl round commits a snapshot listing exactly the
data files (per-round Parquet delta directories) that belong to each
table, and the commit is a single atomic ``os.replace`` of the JSON
manifest — readers either see the previous snapshot or the new one,
never a partial round. A killed run resumes from the last committed
manifest exactly (north_rule "resumable from checkpoint").

On a real cluster this class is swapped for Iceberg
``writeTo(...).append()`` + snapshot IDs; the engine only uses the four
methods below, so the swap is local to this file.

Layout::

    root/
      manifest.json                  <- atomic pointer (os.replace)
      r00000/results/*.parquet       <- per-round delta dirs
      r00000/fetch_log/*.parquet
      r00001/...

Manifest::

    {"rounds": [0, 1, ...],          committed rounds, in order
     "tables": {"results": ["r00000/results", ...], ...},
     "state": {...driver state at last commit...}}
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _delta_rows(path: str) -> int:
    """Total rows in a just-written parquet dir, from the file footers
    (driver-side metadata only — no Spark job, no data read). Walks
    nested ``__b=K`` bucket subdirs (bucketed deltas)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith("part-") and f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


class StaleStateError(RuntimeError):
    """A concurrent writer advanced the store since this writer read
    its state: the attempted commit was built from a stale snapshot of
    ``state`` and must not be published (last-writer-wins would clobber
    the other writer's bookkeeping). Re-read and rebuild to retry."""


class SnapshotStore:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"rounds": [], "tables": {}, "state": {}, "buckets": {}}
        with open(self._manifest_path) as f:
            m = json.load(f)
        m.setdefault("buckets", {})
        return m

    @contextlib.contextmanager
    def _commit_lock(self, timeout_s: float = 600.0):
        """Serialize manifest read-modify-write across writers sharing
        one filesystem (a concurrent stream + batch engine): kernel
        ``flock`` on a persistent lock file. flock is released
        automatically when the holding process dies (north rule: a
        KILLED run never wedges resume), needs no staleness heuristic
        — an mtime-based steal would break a legitimately long commit
        that holds the lock across multi-minute Spark writes — and the
        file is never unlinked, so there is no unlink/create race
        between waiters. Local-filesystem semantics (this sandbox); on
        a real cluster this whole class is swapped for the catalog's
        optimistic-commit CAS (Iceberg snapshot swap)."""
        import fcntl

        lock = os.path.join(self.root, ".commit.lock")
        fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        deadline = time.monotonic() + timeout_s
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except BlockingIOError:
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"snapshot commit lock {lock} held past "
                            f"{timeout_s}s by a live writer"
                        )
                    time.sleep(0.05)
            yield
        finally:
            os.close(fd)  # releases the flock; file stays

    # ---------------------------------------------------- bucketed layout
    def set_bucket_spec(self, name: str, col: str, n: int) -> dict:
        """Register a physical bucket layout for ``name``: every future
        delta (and compaction) of the table is written pre-partitioned
        into ``__b=pmod(col, n)`` subdirs — the SURVEY §1.4 layout
        promise, and the local-parquet stand-in for Iceberg
        ``bucket(n, col)`` partition transforms. Consumers that read
        the buckets co-located (:meth:`bucket_files` +
        ``operators.dedup.colocated_pending``) get the
        storage-partitioned-join shape: per-round probe/anti-join with
        ZERO data shuffle.

        The spec is persisted in the manifest immediately (under the
        commit lock) so concurrent writers (frontier stream + batch
        engine) bucket identically. Like Bloom geometry, a COMMITTED
        spec always wins over the requested one — a resumed run with a
        changed n must not mix layouts; the effective spec is
        returned. Legacy (pre-spec) deltas stay readable: a table with
        any un-bucketed delta simply falls back to the shuffle path
        until compaction rewrites it bucketed."""
        with self._commit_lock():
            manifest = self.read_manifest()
            spec = manifest["buckets"].get(name)
            if spec is not None:
                return spec
            spec = {"col": col, "n": int(n)}
            manifest["buckets"][name] = spec
            tmp = self._manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            os.replace(tmp, self._manifest_path)
            return spec

    @staticmethod
    def _write_delta(df: DataFrame, path: str, spec: dict | None) -> None:
        """One table delta write. With a bucket spec the rows are
        repartitioned on the bucket id (one shuffle of the O(round)
        delta — the classic bucketing trade: pay once at write, read
        co-located every round after) and land in ``__b=K`` subdirs,
        exactly one file per bucket."""
        if spec is None:
            df.write.mode("overwrite").parquet(path)
            return
        from pyspark.sql import functions as F

        n = int(spec["n"])
        b = F.pmod(F.col(spec["col"]).cast("long"), F.lit(n)).cast("int")
        (
            df.withColumn("__b", b)
            .repartition(n, F.col("__b"))
            .write.mode("overwrite")
            .partitionBy("__b")
            .parquet(path)
        )

    def bucket_spec(self, name: str) -> dict | None:
        return self.read_manifest()["buckets"].get(name)

    def bucket_files(self, name: str) -> tuple[int, dict[int, list[str]]] | None:
        """Per-bucket data-file lists for a FULLY bucketed table:
        ``(n, {bucket: [abs paths...]})``, or None when the table has
        no spec, no data, or any legacy un-bucketed delta (mixed
        layouts cannot be read co-located; compaction heals them).
        Driver-side directory metadata only — no data read."""
        manifest = self.read_manifest()
        spec = manifest["buckets"].get(name)
        rels = manifest["tables"].get(name, [])
        if spec is None or not rels:
            return None
        n = int(spec["n"])
        out: dict[int, list[str]] = {}
        for rel in rels:
            d = os.path.join(self.root, rel)
            try:
                entries = [
                    e
                    for e in os.listdir(d)
                    if e.startswith("__b=")
                    or not e.startswith(("_", "."))
                ]
            except OSError:
                return None
            if not entries:
                continue  # zero-row delta dir: trivially compatible
            if not all(e.startswith("__b=") for e in entries):
                return None  # legacy/plain delta in the mix
            for e in entries:
                b = int(e.split("=", 1)[1])
                if b >= n:
                    return None  # written under a different geometry
                sub = os.path.join(d, e)
                out.setdefault(b, []).extend(
                    os.path.join(sub, f)
                    for f in sorted(os.listdir(sub))
                    if f.endswith(".parquet")
                )
        return n, out

    def _check_cas(self, manifest: dict, round_no: int) -> None:
        if round_no in manifest["rounds"]:
            raise ValueError(f"round {round_no} already committed")
        expected = manifest["state"].get("next_round")
        if expected is not None and round_no != expected:
            raise StaleStateError(
                f"commit of round {round_no} planned from a stale read: "
                f"the store's committed next_round is {expected} "
                "(a concurrent writer advanced the store) — re-read "
                "state and rebuild the round"
            )

    def commit_round(
        self,
        round_no: int,
        tables: dict[str, DataFrame | None],
        state: dict,
        replace: set[str] | None = None,
        finalize_state=None,
        on_written=None,
        parallel_after: str | None = None,
    ) -> None:
        """Write each table's round delta, then atomically publish the
        manifest. Uncommitted delta dirs from a crashed run are
        invisible (not in the manifest) and get cleaned lazily.

        Tables named in ``replace`` REPLACE the table's full content
        instead of appending a delta (Iceberg overwrite analog): used
        for small merged-state tables like Bloom ``seen_shards`` where
        the round's write already folds in all prior state, so readers
        should see exactly one directory. Old dirs become unreferenced
        (vacuum cleans them; in-flight readers stay consistent).

        Lock scope: the (multi-minute at scale) Spark data writes land
        in a writer-unique ``.stage-*`` dir OUTSIDE the commit lock;
        the lock is held only for the read-CAS-publish of the manifest
        plus a cheap directory rename — a concurrent stream/engine
        writer is never blocked behind another writer's data I/O. A
        cheap CAS pre-check before the writes fails a provably-stale
        writer before it pays them; the authoritative check is repeated
        under the lock. A losing or failing writer removes its own
        staging dir; dirs orphaned by a hard kill are reclaimed by
        :meth:`vacuum`.

        A table whose staged delta holds ZERO rows is not registered
        (same semantics as passing ``None``) — detected from the
        parquet footers' row counts, a driver-side metadata read that
        costs microseconds per file. This lets callers pass every table
        unconditionally (no pre-count Spark job to decide what to
        write) and have empty rounds self-prune instead of accreting
        empty delta dirs in the manifest.

        ``finalize_state`` (optional, no-arg callable returning a dict)
        runs AFTER the data writes and is merged over ``state`` — the
        hook for deriving driver-side bookkeeping from metrics observed
        during the writes instead of paying a separate Spark job.

        ``on_written`` (optional, called with the table name) fires
        right after each table's data write returns (before zero-row
        pruning) — the hook callers use to note that a plan's observe
        metrics are now guaranteed to have fired, so a later
        ``Observation.get`` can never hang (VERDICT r4 #4: the
        fallback used to race a 120 s timeout thread).

        ``parallel_after`` (optional, a table name): tables up to and
        including it are written strictly in dict order; the REMAINING
        tables' plans are still RESOLVED sequentially in dict order
        (each callable sees every earlier write's observed metrics —
        the documented contract), but their data writes run
        CONCURRENTLY in driver threads. Spark schedules concurrent
        jobs fine (separate action threads); the writes land in
        disjoint staging subdirs, and the manifest registration below
        replays dict order, so the committed layout is byte-identical
        to the sequential path. Use when the later tables are
        mutually independent (the crawl's parsed/frontier/seen_shards
        after ``seen``): per-round wall time drops by the overlap of
        their job tails — serial fixed cost the SHORT high-core legs
        of a scaling pair otherwise pay in full (BENCH.md round 5:
        the 2v8 standard-leg ceiling).

        A table VALUE may itself be a no-arg callable: it is resolved
        at its position in the (ordered) write loop, so a later table
        can consult metrics observed while an earlier one was written
        — e.g. the engine writes ``seen`` first and then skips the
        ``parsed``/``frontier`` plans entirely on rounds the observed
        counts prove empty, instead of paying an empty UDF pipeline's
        task scheduling per table.

        Concurrency: the round number is a compare-and-swap against the
        committed ``state.next_round`` — a writer that planned its
        round from a stale manifest read gets ``StaleStateError`` (or
        ``ValueError`` if the exact round was taken) instead of
        silently clobbering the other writer. The published ``state``
        is MERGED over the freshly-read manifest state, so keys a
        writer does not own (e.g. the stream's ``stream_batches`` vs
        the engine's ``seeds``) survive interleaved commits. On a real
        cluster this maps to the catalog's optimistic snapshot-swap CAS
        (Iceberg).

        Every table — including Bloom ``seen_shards`` — is a
        distributed Spark write; no driver-side state round-trips
        through here.
        """
        replace = replace or set()
        # fail a stale writer cheaply, before the data writes
        pre = self.read_manifest()
        self._check_cas(pre, round_no)
        specs = pre["buckets"]
        stage = os.path.join(
            self.root, f".stage-{round_no:05d}-{uuid.uuid4().hex[:8]}"
        )
        os.makedirs(stage, exist_ok=True)
        try:
            staged: list[str] = []  # dict-ordered names with a staged dir

            def _write_one(name: str, df: DataFrame) -> None:
                path = os.path.join(stage, name)
                self._write_delta(df, path, specs.get(name))
                if on_written is not None:
                    on_written(name)

            names = list(tables)
            cut = (
                names.index(parallel_after) + 1
                if parallel_after in names
                else len(names)
            )
            for name in names[:cut]:  # the sequential prefix
                df = tables[name]
                if callable(df):
                    df = df()
                if df is None:
                    continue
                _write_one(name, df)
                staged.append(name)
            # resolve the remaining plans sequentially (each sees the
            # earlier writes' metrics), then run their writes overlapped
            pending_writes = []
            for name in names[cut:]:
                df = tables[name]
                if callable(df):
                    df = df()
                if df is None:
                    continue
                pending_writes.append((name, df))
            if len(pending_writes) <= 1:
                for name, df in pending_writes:
                    _write_one(name, df)
                    staged.append(name)
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(len(pending_writes)) as pool:
                    futs = [
                        (name, pool.submit(_write_one, name, df))
                        for name, df in pending_writes
                    ]
                    for name, fut in futs:
                        fut.result()  # re-raises the first write failure
                        staged.append(name)
            written = []
            for name in staged:  # zero-row prune, dict order preserved
                path = os.path.join(stage, name)
                if _delta_rows(path) > 0:
                    written.append(name)
                else:  # zero-row delta: same semantics as passing None
                    shutil.rmtree(path)
            if finalize_state is not None:
                state = {**state, **finalize_state()}
            with self._commit_lock():
                manifest = self.read_manifest()
                self._check_cas(manifest, round_no)
                rdir = os.path.join(self.root, f"r{round_no:05d}")
                if os.path.exists(rdir):  # leftovers from a crashed attempt
                    shutil.rmtree(rdir)
                os.rename(stage, rdir)
                for name in written:
                    rel = f"r{round_no:05d}/{name}"
                    if name in replace:
                        manifest["tables"][name] = [rel]
                        # replace folds all prior history into this
                        # round's entry: snapshots below it are expired
                        # for time-travel reads
                        manifest.setdefault("horizon", {})[name] = round_no
                    else:
                        manifest["tables"].setdefault(name, []).append(rel)
                manifest["rounds"].append(round_no)
                manifest["state"] = {**manifest["state"], **state}
                tmp = self._manifest_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(manifest, f, indent=1)
                os.replace(tmp, self._manifest_path)  # the atomic commit point
        except BaseException:
            shutil.rmtree(stage, ignore_errors=True)
            raise

    @staticmethod
    def _rel_round(rel: str) -> int | None:
        """Round number of a ``rNNNNN/table`` delta entry; None for a
        ``compact-*`` (folded-history) entry."""
        head = rel.split("/", 1)[0]
        if head.startswith("r") and head[1:].isdigit():
            return int(head[1:])
        return None

    def read_table(
        self,
        name: str,
        as_of_round: int | None = None,
        since_round: int | None = None,
    ) -> DataFrame | None:
        """Union of committed round deltas for ``name``.
        ``recursiveFileLookup`` reads the data files under bucketed
        (``__b=K`` subdir) and plain deltas alike with NO partition
        inference — the bucket id is physical layout, not table
        schema, and every data column lives in the files themselves.
        (Co-located consumers use :meth:`bucket_files` instead.)

        Time-travel / incremental reads (Iceberg snapshot-as-of and
        incremental-scan analogs): ``as_of_round=N`` returns the table
        as committed through round N; ``since_round=M`` returns only
        rows committed AFTER round M (the changes-since feed an
        incremental consumer tails); both together give the half-open
        window (M, N]. History folded by :meth:`compact_table` or a
        ``replace`` commit is EXPIRED below the table's horizon round
        (Iceberg expire-snapshots): asking for it raises ValueError
        rather than silently returning partial state. On replace-mode
        tables each committed entry is a full snapshot, so a window
        read returns the snapshots committed in the window, not row
        increments.
        """
        manifest = self.read_manifest()
        rels = manifest["tables"].get(name, [])
        horizon = manifest.get("horizon", {}).get(name, -1)
        if as_of_round is not None and as_of_round < horizon:
            raise ValueError(
                f"history expired: table {name!r} is folded through round "
                f"{horizon} (compaction/replace); as_of_round={as_of_round} "
                "predates it"
            )
        if since_round is not None and since_round < horizon:
            raise ValueError(
                f"history expired: table {name!r} is folded through round "
                f"{horizon}; rows up to since_round={since_round} cannot be "
                "excluded from the folded generation"
            )
        lo = -1 if since_round is None else since_round
        hi = as_of_round  # None = unbounded
        if hi is not None and hi < lo:
            raise ValueError(f"empty window: since_round={lo} > as_of_round={hi}")
        picked = []
        for rel in rels:
            r = self._rel_round(rel)
            if r is None:
                # folded generation: rows from rounds <= horizon. The
                # guards above ensure lo <= horizon <= hi here when a
                # window was given; a since_round >= horizon excludes it.
                if since_round is None:
                    picked.append(rel)
            elif r > lo and (hi is None or r <= hi):
                picked.append(rel)
        paths = [os.path.join(self.root, rel) for rel in picked]
        if not paths:
            return None
        return self.spark.read.option("recursiveFileLookup", "true").parquet(*paths)

    def compact_table(self, name: str, df_transform=None) -> None:
        """Merge all committed deltas of ``name`` into one directory and
        atomically repoint the manifest (Iceberg rewrite-data-files
        analog). Bounds per-round read fan-in: without compaction a
        round-R scan opens R delta dirs. ``df_transform`` can dedup
        while compacting (e.g. distinct on url_fp for ``seen``).

        Like :meth:`commit_round`, the (large) merged write happens
        OUTSIDE the commit lock; under the lock the manifest is
        re-read and the repoint happens only if the table's delta list
        is unchanged since the read — a concurrent writer having
        appended in the meantime makes this compaction stale, so it is
        skipped (its output removed) and the next compaction interval
        picks up the new deltas. Optimistic rewrite, Iceberg-style."""
        manifest = self.read_manifest()
        paths = manifest["tables"].get(name, [])
        if len(paths) <= 1:
            return
        # read via read_table (drops the physical __b column; handles
        # mixed legacy layouts) so a compaction also MIGRATES a table
        # onto its registered bucket layout
        df = self.read_table(name)
        if df_transform is not None:
            df = df_transform(df)
        gen = sum(1 for p in paths if "compact" in p)
        out_rel = f"compact-{name}-{len(manifest['rounds']):05d}-{gen}-{uuid.uuid4().hex[:8]}"
        # the (multi-minute at scale) merged write is staged under a
        # .stage-* name so a concurrent vacuum gives it the same mtime
        # grace as commit staging — written directly into the live
        # compact-* namespace, two vacuum passes spanning the write
        # could two-phase-delete the in-flight output while the
        # unchanged-paths check still let the repoint land on a deleted
        # dir (ADVICE r4). The rename to compact-* happens under the
        # commit lock, immediately before the repoint.
        stage = os.path.join(self.root, f".stage-{out_rel}")
        out = os.path.join(self.root, out_rel)
        try:
            self._write_delta(df, stage, manifest["buckets"].get(name))
            # a compaction that drains the table to ZERO rows (e.g. a
            # finished crawl's frontier after the seen subtraction) must
            # prune it from the manifest, not publish an empty dir — a
            # bucketed empty write leaves no data files, so a later scan
            # of the dir could not even infer a schema
            empty = _delta_rows(stage) == 0
            with self._commit_lock():
                manifest = self.read_manifest()
                if manifest["tables"].get(name, []) != paths:
                    # a concurrent commit changed the table under us:
                    # this merge no longer covers it — drop and retry
                    # at the next compaction point
                    shutil.rmtree(stage, ignore_errors=True)
                    return
                if empty:
                    shutil.rmtree(stage, ignore_errors=True)
                    manifest["tables"][name] = []
                else:
                    os.rename(stage, out)
                    manifest["tables"][name] = [out_rel]
                # either way the pre-compaction history is folded:
                # time-travel below the newest round folded for THIS
                # table expires (Iceberg expire-snapshots semantics).
                # as-of reads at rounds where the table had no delta
                # stay answerable.
                folded = [self._rel_round(rel) for rel in paths]
                prev = manifest.get("horizon", {}).get(name, -1)
                new_horizon = max(
                    [r for r in folded if r is not None] + [prev], default=prev
                )
                if new_horizon >= 0:
                    manifest.setdefault("horizon", {})[name] = new_horizon
                tmp = self._manifest_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(manifest, f, indent=1)
                os.replace(tmp, self._manifest_path)
        except BaseException:
            shutil.rmtree(stage, ignore_errors=True)
            raise
        # old delta dirs are now unreferenced; leave them for vacuum()
        # (readers that already opened them stay consistent)

    def vacuum(self, stage_grace_s: float = 3600.0) -> None:
        """Reclaim unreferenced delta dirs (post-compaction cleanup) at
        TABLE-SUBDIR granularity: a replace-committed table (Bloom
        ``seen_shards`` writes a full merged copy every round) leaves
        its stale copies inside round dirs whose OTHER tables are still
        live — reclaiming only whole round dirs would let disk grow
        O(rounds x state size).

        Reclaim units:
        - ``r*/table`` subdirs unreferenced by the manifest;
        - whole ``compact-*`` dirs that are no longer the table's live
          pointer — their children are parquet PART FILES, not table
          subdirs, so the unit is the dir itself (a superseded
          generation previously survived vacuum forever and disk grew
          O(compactions x table size));
        - empty round dirs whose every table subdir was reclaimed;
        - orphaned ``.stage-*`` dirs from hard-killed writers, but only
          once untouched for ``stage_grace_s`` (a LIVE writer stages
          its round outside the commit lock, so recency — not the
          manifest — is the only signal it is still in flight).

        TWO-PHASE with a grace generation (Iceberg expire-snapshots
        retention analog): a call DELETES only paths that were already
        unreferenced at the PREVIOUS vacuum call (recorded in
        ``.vacuum_pending``) and records the currently-unreferenced set
        for the next call. A concurrent reader whose lazy plan still
        points at just-superseded dirs therefore gets a full
        compaction interval of grace before deletion. Runs under the
        commit lock so it can never race a manifest publish."""
        pending_path = os.path.join(self.root, ".vacuum_pending")
        with self._commit_lock():
            manifest = self.read_manifest()
            live = {rel for rels in manifest["tables"].values() for rel in rels}
            try:
                with open(pending_path) as f:
                    deletable = set(json.load(f))
            except (OSError, ValueError):
                deletable = set()
            unreferenced: set[str] = set()

            def reap(rel: str, full: str) -> None:
                if rel in deletable:
                    shutil.rmtree(full, ignore_errors=True)
                else:
                    unreferenced.add(rel)

            now = time.time()
            for entry in os.listdir(self.root):
                full = os.path.join(self.root, entry)
                if not os.path.isdir(full):
                    continue
                if entry.startswith(".stage-"):
                    # the mtime scan races a concurrent commit_round's
                    # out-of-lock zero-row rmtree of a staged subdir: a
                    # vanished entry means the stage is being actively
                    # written — treat it as recently touched, never
                    # abort the vacuum (ADVICE r4)
                    try:
                        mtimes = [os.path.getmtime(full)] + [
                            os.path.getmtime(os.path.join(full, s))
                            for s in os.listdir(full)
                        ]
                    except OSError:
                        continue
                    if now - max(mtimes) >= stage_grace_s:
                        reap(entry, full)
                    continue
                if not (entry.startswith("compact-") or entry[0] == "r"):
                    continue
                if entry in live:  # compact-* dirs are referenced whole
                    continue
                dir_subs = [
                    s for s in os.listdir(full)
                    if os.path.isdir(os.path.join(full, s))
                ]
                live_subs = [s for s in dir_subs if f"{entry}/{s}" in live]
                if not live_subs and (entry.startswith("compact-") or not dir_subs):
                    # whole-entry unit: superseded compact generation,
                    # or a round dir with no table subdirs left
                    reap(entry, full)
                    continue
                for sub in dir_subs:
                    rel = f"{entry}/{sub}"
                    if rel not in live:
                        reap(rel, os.path.join(full, sub))
                if not live_subs and not os.listdir(full):
                    shutil.rmtree(full, ignore_errors=True)
            tmp = pending_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(sorted(unreferenced), f)
            os.replace(tmp, pending_path)

    def last_state(self) -> dict:
        return self.read_manifest()["state"]

    def committed_rounds(self) -> list[int]:
        return self.read_manifest()["rounds"]
