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
#: atexit hook never fired). A LIVE run is protected independently of
#: age by its PID marker — age alone never justifies deletion.
_STALE_AFTER_SEC = 24 * 3600

_run_root: str | None = None


def _owner_alive(path: str) -> bool:
    """True if the run root's owning process still exists (PID marker)."""
    try:
        with open(os.path.join(path, "PID")) as fh:
            pid = int(fh.read().strip())
    except (OSError, ValueError):
        return False  # no/garbled marker: pre-marker layout or mid-create crash
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by another user
    except OSError:
        return True  # unknown — err on the side of not deleting


def _prune_stale() -> None:
    try:
        for entry in os.listdir(SCRATCH_ROOT):
            path = os.path.join(SCRATCH_ROOT, entry)
            try:
                stale = time.time() - os.path.getmtime(path) > _STALE_AFTER_SEC
                if stale and not _owner_alive(path):
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                continue
    except OSError:
        pass


def run_scratch_dir(prefix: str = "scratch_") -> str:
    """A fresh directory under this process's run root.

    The run root (and everything inside it) is deleted at interpreter
    exit; callers never clean up individually. The root carries a PID
    marker and is re-touched on every call, so a long-lived process
    (>24 h between queries) can't have its active checkpoint dirs
    pruned out from under it by a newly started process.
    """
    global _run_root
    if _run_root is None:
        os.makedirs(SCRATCH_ROOT, exist_ok=True)
        _prune_stale()
        _run_root = tempfile.mkdtemp(prefix="run_", dir=SCRATCH_ROOT)
        with open(os.path.join(_run_root, "PID"), "w") as fh:
            fh.write(str(os.getpid()))
        atexit.register(shutil.rmtree, _run_root, ignore_errors=True)
    else:
        try:
            os.utime(_run_root)
        except OSError:
            pass
    return tempfile.mkdtemp(prefix=prefix, dir=_run_root)
