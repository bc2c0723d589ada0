"""Writer-lock takeover under contention (io/lakehouse.py).

The round-2 review found two races: (1) `_heartbeat` used a truncating
open('w') — a concurrent reader could see an empty file, parse-fail to
ts=0 and judge the live holder stale; (2) stale takeover was
unlink-then-create with no mutual exclusion — two racers that both read
the stale lock could each unlink, and the second unlink deletes the
FIRST racer's freshly-created lock (TOCTOU), leaving both believing
they hold it.  The fix serializes takeover behind an O_EXCL guard file
with re-verification inside the critical section, and makes heartbeat
an atomic os.replace.  These tests drive the guard paths directly and
hammer the full acquire path from many processes; no Spark needed."""

import json
import multiprocessing as mp
import os
import time

import pytest

from packs_spark.io.lakehouse import CheckpointedWriter


@pytest.fixture()
def writer(tmp_path):
    return CheckpointedWriter(str(tmp_path / "tbl"), n_buckets=2)


def _stale_lock(w, pid=999_999, age=7200):
    with open(w._lock_path, "w") as f:
        json.dump({"pid": pid, "ts": time.time() - age}, f)


def test_heartbeat_is_atomic_replace(writer, tmp_path):
    writer._acquire_lock()
    try:
        ino_before = os.stat(writer._lock_path).st_ino
        writer._heartbeat()
        held = json.load(open(writer._lock_path))
        assert held["pid"] == os.getpid()
        # os.replace swaps the inode — a truncating rewrite would not
        assert os.stat(writer._lock_path).st_ino != ino_before
        # no leftover temp files
        leftovers = [
            f for f in os.listdir(os.path.dirname(writer._lock_path))
            if ".hb." in f
        ]
        assert leftovers == []
    finally:
        writer._release_lock()


def test_takeover_guard_blocks_concurrent_takeover(writer):
    """While another racer holds the takeover guard, a stale lock is NOT
    deleted; the acquirer retries and ultimately gives up with the
    contention error instead of stealing."""
    _stale_lock(writer)
    guard = writer._lock_path + ".takeover"
    os.close(os.open(guard, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
    try:
        with pytest.raises(RuntimeError, match="takeover attempts"):
            writer._acquire_lock()
        # the stale lock file was never unlinked by the blocked racer
        assert json.load(open(writer._lock_path))["pid"] == 999_999
    finally:
        os.remove(guard)


def test_stale_guard_file_ages_out(writer):
    """A guard left behind by a crashed takeover (mtime > 60 s) must not
    deadlock future takeovers."""
    _stale_lock(writer)
    guard = writer._lock_path + ".takeover"
    os.close(os.open(guard, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
    old = time.time() - 120
    os.utime(guard, (old, old))
    writer._acquire_lock()  # must NOT raise
    writer._release_lock()


def test_reverification_inside_guard_aborts_on_fresh_lock(writer, tmp_path):
    """If between reading a stale lock and entering the guard another
    racer already took over (lock now fresh + alive), the takeover must
    abort with 'another writer', not delete the new holder's lock."""
    _stale_lock(writer)

    real_read = writer._read_lock
    flipped = {"done": False}

    def flip_then_read():
        # first call: the pre-guard read sees the stale lock; before the
        # in-guard re-read, a competing racer replaces it with a fresh one
        if not flipped["done"]:
            flipped["done"] = True
            return {"pid": 999_999, "ts": 0}
        return real_read()

    writer._read_lock = flip_then_read
    with open(writer._lock_path, "w") as f:
        json.dump({"pid": os.getpid(), "ts": time.time()}, f)
    with pytest.raises(RuntimeError, match="another writer"):
        writer._acquire_lock()
    # the fresh holder's lock survived
    assert json.load(open(writer._lock_path))["pid"] == os.getpid()


def _race(path, idx, wins):
    from packs_spark.io.lakehouse import CheckpointedWriter

    w = CheckpointedWriter(path, n_buckets=2)
    try:
        w._acquire_lock(attempts=5)
        wins.append(idx)
        # hold the lock until every loser has exhausted its retries —
        # if the winner exited immediately its pid would look dead and a
        # still-racing loser would legitimately take over
        time.sleep(3)
    except RuntimeError:
        pass


def test_many_processes_exactly_one_winner(tmp_path):
    """Hammer test: N processes race a STALE lock; exactly one may win,
    and the winner's lock survives everyone else's exit."""
    path = str(tmp_path / "tbl")
    w = CheckpointedWriter(path, n_buckets=2)
    _stale_lock(w)
    ctx = mp.get_context("fork")
    with ctx.Manager() as mgr:
        wins = mgr.list()
        procs = [
            ctx.Process(target=_race, args=(path, i, wins))
            for i in range(8)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join(timeout=30)
        winners = list(wins)
    assert len(winners) == 1, winners
    held = json.load(open(w._lock_path))
    # the surviving lock belongs to the (now-exited) winner, not pid 999999
    assert held["pid"] != 999_999
