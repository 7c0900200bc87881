"""Shared filesystem-coordination helpers — the ONE implementation of the
exclusive flock idiom used by every metadata committer (the posting
catalog's manifest, the ANN indexes' meta.json), and of the staging-dir
age probe used by every stale-staging sweep. Lock files are created on
demand; on non-POSIX platforms (no fcntl) the single-writer assumption
holds."""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def flock_ctx(lock_path: str):
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    try:
        try:
            import fcntl
            fcntl.flock(fd, fcntl.LOCK_EX)
        except ImportError:
            pass
        yield
    finally:
        os.close(fd)


def staging_age(path: str, deep: bool = True) -> float:
    """Seconds since the newest mtime under `path` — the shared lease probe
    for stale-staging sweeps (ANN add.tmp-*, catalog del.tmp-* / orphan
    dirs). deep=True keys off the NEWEST mtime anywhere in the tree: a
    staging dir's top-level mtime reflects Spark's _temporary creation at
    job start, so a multi-hour in-flight write keeps refreshing its own
    lease through its task files. Returns -1.0 when the dir vanished
    concurrently (a racing writer may rmtree its own staging dir without
    the lock) — a vanished dir is simply not sweepable, never an error."""
    try:
        newest = os.path.getmtime(path)
        if deep:
            for base, _dirs, files in os.walk(path):
                for fn in files:
                    try:
                        newest = max(newest,
                                     os.path.getmtime(os.path.join(base, fn)))
                    except OSError:
                        pass
        return time.time() - newest
    except OSError:
        return -1.0
