"""Run-scoped scratch space with automatic cleanup.

Streaming checkpoints and sink round-trips need writable scratch paths.
Earlier revisions minted a fresh ``mkdtemp`` per call and never deleted
it, so ``.scratch/`` accreted one checkpoint dir per streaming query run
(~hundreds across a test+bench cycle). Now every path lives under ONE
per-process run root that is removed at interpreter exit, and stale
roots from crashed runs are pruned on first use — the entry count in
``.scratch`` stays bounded no matter how many queries a session runs.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

#: Repo-local scratch parent (gitignored).
SCRATCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")

#: Stale run roots older than this are pruned (covers crashed runs whose
#: atexit hook never fired). Long enough that a concurrent live run is
#: never touched.
_STALE_AFTER_SEC = 24 * 3600

_run_root: str | None = None


def _prune_stale() -> None:
    try:
        for entry in os.listdir(SCRATCH_ROOT):
            path = os.path.join(SCRATCH_ROOT, entry)
            try:
                if time.time() - os.path.getmtime(path) > _STALE_AFTER_SEC:
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                continue
    except OSError:
        pass


def run_scratch_dir(prefix: str = "scratch_") -> str:
    """A fresh directory under this process's run root.

    The run root (and everything inside it) is deleted at interpreter
    exit; callers never clean up individually.
    """
    global _run_root
    if _run_root is None:
        os.makedirs(SCRATCH_ROOT, exist_ok=True)
        _prune_stale()
        _run_root = tempfile.mkdtemp(prefix="run_", dir=SCRATCH_ROOT)
        atexit.register(shutil.rmtree, _run_root, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_run_root)
