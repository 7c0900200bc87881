"""Shared file-locking helper — the ONE implementation of the exclusive
flock idiom used by every metadata committer (the posting catalog's
manifest, the ANN indexes' meta.json). Lock files are created on demand;
on non-POSIX platforms (no fcntl) the single-writer assumption holds."""

from __future__ import annotations

import contextlib
import os


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
