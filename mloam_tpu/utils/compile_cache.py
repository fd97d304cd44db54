"""Crash- and concurrency-safe persistent XLA compile cache.

jax's persistent compilation cache writes entries in place; a killed writer
or two concurrent processes sharing one cache dir can leave a truncated
entry, and jax's cache READ of a corrupt entry segfaults the process
(observed 2026-08-21 on this host). Round-4 "mitigation" was a comment
prescribing manual ``rm -rf`` — this module replaces it.

Design: each process gets a PRIVATE cache directory seeded with hardlinks
to the shared dir's entries (content-addressed files — a link is a free
copy). jax reads and writes only the private dir, so concurrent processes
never touch the same file. On clean interpreter exit, entries that did not
exist in the shared dir are published there atomically (copy to a tmp name
in the same filesystem, then ``os.rename``) — readers can never observe a
partial entry. A killed process leaves only its private dir dirty, which
the next setup() sweep garbage-collects.

Reference counterpart: none (CPU-only, no compile cache); this is
TPU-operations hygiene.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid


def setup(shared_dir: str, min_compile_secs: float = 0.5) -> str:
    """Point jax's persistent compile cache at a private, crash-safe mirror
    of ``shared_dir``. Returns the private dir path."""
    import jax

    shared_dir = os.path.abspath(shared_dir)
    os.makedirs(shared_dir, exist_ok=True)
    stale_root = os.path.join(shared_dir, ".private")
    os.makedirs(stale_root, exist_ok=True)
    _gc_stale(stale_root)
    private = os.path.join(stale_root, f"p{os.getpid()}-{uuid.uuid4().hex[:8]}")
    os.makedirs(private)
    seeded = set()
    for name in os.listdir(shared_dir):
        src = os.path.join(shared_dir, name)
        if not os.path.isfile(src):
            continue
        try:
            os.link(src, os.path.join(private, name))
            seeded.add(name)
        except OSError:
            pass  # raced with a publisher; entry will just recompile

    jax.config.update("jax_compilation_cache_dir", private)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    atexit.register(_publish, private, shared_dir, seeded)
    return private


def _publish(private: str, shared_dir: str, seeded: set) -> None:
    """Atomically publish new cache entries back to the shared dir."""
    try:
        names = os.listdir(private)
    except OSError:
        return
    for name in names:
        if name in seeded:
            continue
        src = os.path.join(private, name)
        dst = os.path.join(shared_dir, name)
        if not os.path.isfile(src) or os.path.exists(dst):
            continue
        try:
            fd, tmp = tempfile.mkstemp(dir=shared_dir, prefix=".pub-")
            os.close(fd)
            shutil.copyfile(src, tmp)
            os.rename(tmp, dst)  # atomic within one filesystem
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
    shutil.rmtree(private, ignore_errors=True)


def _gc_stale(stale_root: str) -> None:
    """Remove private dirs left by killed processes (pid no longer alive)."""
    for name in os.listdir(stale_root):
        if not name.startswith("p"):
            continue
        pid_s = name[1:].split("-", 1)[0]
        try:
            pid = int(pid_s)
        except ValueError:
            continue
        try:
            os.kill(pid, 0)
            alive = True
        except ProcessLookupError:
            alive = False
        except PermissionError:
            alive = True
        if not alive:
            shutil.rmtree(os.path.join(stale_root, name), ignore_errors=True)
