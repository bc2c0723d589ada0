"""Checkpointed, resumable partitioned table writer ("lakehouse-lite").

The north rule requires per-partition checkpointed/resumable outputs with
lineage.  On a real cluster this is an Iceberg table written with
``df.writeTo(tbl).overwritePartitions()`` — the commit log below is exactly
the piece Iceberg's snapshot metadata provides.  This sandbox has no Iceberg
runtime jar (no network), so the same semantics are built from primitives
that ship with Spark:

* data: one parquet file per url-hash bucket, ``bucket-<b>.parquet``, flat
  under the table root (the ``bucket`` column is stored IN the file).  The
  pipeline's ``repartition_by_bucket`` places bucket b in task-partition b
  exactly, so the plain parquet writer emits exactly one part file per
  bucket — which the driver then moves to its final name with an atomic
  ``os.replace``.  Re-processing a bucket is an **idempotent file
  replacement**, never a duplicate append.
* commit log: one JSON marker per completed bucket under ``_progress/``,
  written by the driver only *after* the wave's files are in place.  A
  marker is the unit of resume: buckets with markers are skipped on
  restart, buckets without are recomputed (their partial output, if any,
  is overwritten).

Why not ``partitionBy("bucket")`` + dynamic partition overwrite: that path
stages every file and serially re-links one directory per bucket in the
driver's commit — measurably slower than the task write itself at high
core counts, and none of it buys anything when partition == bucket == one
file by construction.

Swap-in for Iceberg: replace ``_write_wave`` with
``df.writeTo(table).overwritePartitions()`` and ``completed_buckets`` with a
scan of the table's snapshot summary; the pipeline code does not change.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROGRESS_DIR = "_progress"

_PART_RE = re.compile(r"^part-(\d+)-.*\.parquet$")


class CheckpointedWriter:
    def __init__(self, base_path: str, n_buckets: int, bucket_col: str = "bucket"):
        self.base_path = base_path
        self.n_buckets = n_buckets
        self.bucket_col = bucket_col
        self._progress_path = os.path.join(base_path, PROGRESS_DIR)
        os.makedirs(self._progress_path, exist_ok=True)
        # Resuming with a different bucketing would silently mix two
        # partitionings in one table — refuse instead.
        meta_path = os.path.join(self._progress_path, "_meta.json")
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path))
            if meta["n_buckets"] != n_buckets or meta["bucket_col"] != bucket_col:
                raise ValueError(
                    f"checkpoint at {base_path} was written with "
                    f"{meta['n_buckets']} buckets on '{meta['bucket_col']}', "
                    f"got {n_buckets} on '{bucket_col}' — use a fresh path "
                    f"or matching config"
                )
        else:
            with open(meta_path, "w") as f:
                json.dump({"n_buckets": n_buckets, "bucket_col": bucket_col}, f)

    # ---- commit log -------------------------------------------------
    def completed_buckets(self) -> set[int]:
        out = set()
        for name in os.listdir(self._progress_path):
            if name.startswith("bucket-") and name.endswith(".json"):
                out.add(int(name[len("bucket-") : -len(".json")]))
        return out

    def pending_buckets(self) -> list[int]:
        done = self.completed_buckets()
        return [b for b in range(self.n_buckets) if b not in done]

    def _commit(self, bucket: int, lineage: dict) -> None:
        marker = os.path.join(self._progress_path, f"bucket-{bucket}.json")
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(lineage, f)
        os.replace(tmp, marker)  # atomic on POSIX

    # ---- write ------------------------------------------------------
    def _bucket_file(self, bucket: int) -> str:
        return os.path.join(self.base_path, f"bucket-{bucket:05d}.parquet")

    def _file_bucket(self, path: str) -> int | None:
        """Bucket id of a staged part file from its parquet footer
        statistics (driver-side metadata read, no data scan).  None for an
        empty file; raises if the file mixes buckets — the one-bucket-per-
        file invariant is what makes per-bucket overwrite idempotent."""
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
        if meta.num_rows == 0:
            return None
        col_idx = meta.schema.names.index(self.bucket_col)
        lo = hi = None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(col_idx).statistics
            if st is None or not st.has_min_max:
                raise RuntimeError(f"no bucket statistics in {path}")
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo != hi:
            raise RuntimeError(
                f"staged file {path} spans buckets {lo}..{hi} — input is not "
                f"one-bucket-per-partition (use repartition_by_bucket with "
                f"n_buckets={self.n_buckets})"
            )
        return int(lo)

    def _write_wave(self, wave_df: DataFrame, wave: list[int]) -> None:
        """One Spark action: plain parquet write to a staging dir (the
        upstream repartition_by_bucket makes every task's output a single
        bucket), then atomic per-file renames into place.  Bucket identity
        comes from each file's footer stats, not its task index — robust to
        AQE renumbering partitions on filtered resume waves.  A crash
        between renames re-runs the wave; os.replace is idempotent."""
        staging = os.path.join(self.base_path, f"_staging-{os.getpid()}-{wave[0]}")
        wave_df.write.mode("overwrite").parquet(staging)
        wave_set = set(wave)
        try:
            for name in os.listdir(staging):
                if not _PART_RE.match(name):
                    continue
                src = os.path.join(staging, name)
                bucket = self._file_bucket(src)
                if bucket is None:
                    continue  # empty placeholder file
                if bucket not in wave_set:
                    raise RuntimeError(
                        f"staged file {name} holds bucket {bucket}, outside "
                        f"the wave {sorted(wave_set)} — wave filter broke"
                    )
                os.replace(src, self._bucket_file(bucket))
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def write_resumable(
        self,
        df: DataFrame,
        wave_size: int | None = None,
        on_wave: Callable[[list[int]], None] | None = None,
        assume_placed: bool = False,
    ) -> dict:
        """Write ``df`` (which must carry ``bucket_col``) skipping buckets
        already committed, committing markers per wave.

        ``assume_placed=True`` promises the input is already
        one-bucket-per-partition (pipeline.partitioning.repartition_by_bucket
        upstream of expensive stages); otherwise the writer adds that
        shuffle itself.

        ``wave_size`` trades checkpoint granularity against job count: one
        wave = one Spark action over ``wave_size`` buckets.  With the default
        (all pending buckets in a single action) a crash loses at most one
        wave of work; per-bucket markers still make resume exact.
        """
        pending = self.pending_buckets()
        stats: dict = {"skipped": self.n_buckets - len(pending), "written": 0}
        if not pending:
            return stats
        self._acquire_lock()
        try:
            return self._write_pending(df, pending, stats, wave_size,
                                       on_wave, assume_placed)
        finally:
            self._release_lock()

    # writer lock: two resumable runs racing on one output root would
    # interleave staged files and commit markers; the loser must fail
    # FAST with a clear message, not corrupt the table.  The lock file
    # carries (pid, heartbeat); a lock whose heartbeat is older than
    # ``stale_after`` seconds belongs to a dead run and is taken over.
    LOCK_STALE_AFTER = 3600.0

    @property
    def _lock_path(self) -> str:
        return os.path.join(self._progress_path, "_writer.lock")

    # timestamp of our own last successful lock write; 0.0 (never) makes a
    # heartbeat without a prior acquire abort, which is the right default
    _last_hb: float = 0.0

    def _try_create_lock(self) -> bool:
        payload = json.dumps({"pid": os.getpid(), "ts": time.time()})
        try:
            fd = os.open(self._lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            self._last_hb = time.time()
            return True
        except FileExistsError:
            return False

    def _read_lock(self) -> dict:
        try:
            with open(self._lock_path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError, FileNotFoundError):
            return {"pid": "?", "ts": 0}

    def _lock_is_stale(self, held: dict) -> bool:
        # pid-liveness first: a crash-killed run must be resumable
        # IMMEDIATELY, not after the heartbeat ages out (the lock file
        # is driver-local, so the pid namespace is ours); heartbeat
        # age is the fallback for a live-but-hung holder.
        holder_alive = False
        try:
            os.kill(int(held.get("pid", -1)), 0)
            holder_alive = True
        except (ProcessLookupError, ValueError, TypeError):
            holder_alive = False
        except PermissionError:  # pragma: no cover - exists, other user
            holder_alive = True
        fresh = time.time() - held.get("ts", 0) < self.LOCK_STALE_AFTER
        return not (holder_alive and fresh)

    def _acquire_lock(self, attempts: int = 3) -> None:
        guard = self._lock_path + ".takeover"
        for _ in range(attempts):
            if self._try_create_lock():
                return
            held = self._read_lock()
            if not self._lock_is_stale(held):
                raise RuntimeError(
                    f"another writer (pid {held.get('pid')}) holds the lock "
                    f"on {self.base_path} — concurrent resumable writes to "
                    "one output root would corrupt the table; wait for it "
                    f"or remove {self._lock_path} if that run is known dead"
                )
            # Stale takeover must be serialized, or two racers that both
            # read the stale lock can each unlink-then-create and one ends
            # up deleting the other's *fresh* lock (TOCTOU).  A guard file
            # (O_EXCL) makes removal + re-create a critical section: only
            # the guard holder may unlink the lock, and it re-verifies
            # staleness *inside* the section before doing so.
            try:  # a guard left by a crashed takeover ages out in 60 s.
                # Claim-by-rename, then delete: two waiters that both see
                # the stale guard cannot both remove it (the second rename
                # gets FileNotFoundError), so only one proceeds to the
                # O_EXCL create below in this round — a bare
                # check-then-remove would let both "win" the guard.
                if time.time() - os.path.getmtime(guard) > 60.0:
                    dead = f"{guard}.dead.{os.getpid()}"
                    os.rename(guard, dead)
                    os.remove(dead)
            except OSError:
                pass
            try:
                os.close(os.open(guard, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            except FileExistsError:
                time.sleep(0.05)  # another racer is mid-takeover; re-read
                continue
            try:
                if self._lock_is_stale(self._read_lock()):
                    try:
                        os.remove(self._lock_path)
                    except FileNotFoundError:
                        pass
                    if self._try_create_lock():
                        return
            finally:
                try:
                    os.remove(guard)
                except OSError:
                    pass
        raise RuntimeError(
            f"could not acquire writer lock at {self._lock_path} after "
            f"{attempts} takeover attempts (heavy lock contention)"
        )

    def _heartbeat(self) -> None:
        """Refresh the lock heartbeat (called per wave) so a healthy
        long run is never mistaken for a hung one and taken over.
        Write-to-temp + ``os.replace`` keeps the refresh atomic: a
        truncating ``open('w')`` would expose an empty/partial file to a
        concurrent ``_acquire_lock`` read, which would parse-fail to
        ts=0, judge us stale, and take over while we are alive.

        Ownership is verified first: a holder that stalled past
        LOCK_STALE_AFTER without dying may have been legitimately taken
        over — blindly replacing the new holder's lock on wake-up would
        reinstate a split-brain dual writer.  Losing the lock aborts the
        run (RuntimeError) instead.

        Two refinements close the check's own failure modes: (1) a
        TRANSIENT read failure (parse-fail sentinel pid='?') skips this
        refresh rather than aborting an hours-long healthy run — a real
        takeover writes a valid pid and is caught on the next wave; (2)
        staleness is judged from the in-memory timestamp of our own last
        successful refresh, with a safety margin, BEFORE touching the
        file: takeover is only possible once our heartbeat is stale, so
        a fresh-by-our-own-clock holder can replace without a
        read-then-replace race (no POSIX compare-and-swap exists; the
        residual window requires stalling for the rest of the horizon
        between this check and os.replace, microseconds of code)."""
        now = time.time()
        if now - self._last_hb > self.LOCK_STALE_AFTER * 0.9:
            raise RuntimeError(
                f"writer on {self.base_path} went {now - self._last_hb:.0f}s "
                "without a heartbeat — another run may have legitimately "
                "taken the lock over; aborting instead of racing it"
            )
        held = self._read_lock()
        if held.get("pid") == "?":
            return  # unreadable lock file: skip refresh, re-check next wave
        if held.get("pid") != os.getpid():
            raise RuntimeError(
                f"writer lock on {self.base_path} was taken over by pid "
                f"{held.get('pid')} (this run stalled past the "
                f"{self.LOCK_STALE_AFTER:.0f}s staleness horizon) — "
                "aborting to avoid two concurrent writers"
            )
        tmp = f"{self._lock_path}.hb.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(json.dumps({"pid": os.getpid(), "ts": time.time()}))
        os.replace(tmp, self._lock_path)
        self._last_hb = time.time()

    def _release_lock(self) -> None:
        # only delete a lock we still own — if a (mistaken or raced)
        # takeover replaced it, deleting would strip the NEW holder
        try:
            held = json.load(open(self._lock_path))
            if held.get("pid") == os.getpid():
                os.remove(self._lock_path)
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            pass

    def _write_pending(
        self,
        df: DataFrame,
        pending: list[int],
        stats: dict,
        wave_size: int | None,
        on_wave,
        assume_placed: bool,
    ) -> dict:
        if not assume_placed:
            from packs_spark.pipeline.partitioning import repartition_by_bucket

            df = repartition_by_bucket(df, self.n_buckets, self.bucket_col)
        wave_size = wave_size or len(pending)
        for i in range(0, len(pending), wave_size):
            wave = pending[i : i + wave_size]
            if len(wave) == self.n_buckets:
                # fresh run, single wave: every bucket pending — the
                # membership filter would be a per-row no-op (and a wide
                # InSet), skip it entirely
                wave_df = df
            else:
                wave_df = df.where(F.col(self.bucket_col).isin(wave))
            t0 = time.time()
            self._write_wave(wave_df, wave)
            elapsed = time.time() - t0
            for b in wave:
                self._commit(
                    b,
                    {
                        "bucket": b,
                        "committed_at_unix": time.time(),
                        "wave": wave,
                        "wave_seconds": elapsed,
                    },
                )
            stats["written"] += len(wave)
            self._heartbeat()
            if on_wave:
                on_wave(wave)
        return stats

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.base_path)
