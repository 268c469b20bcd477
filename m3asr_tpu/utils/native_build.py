"""Race-safe on-demand build of the native (C++) shared libraries.

Both ctypes bindings (decode.native, io.native_io) build
native/build/*.so via `make` on first use in a fresh clone. Concurrent
first-use from several processes (pytest-xdist workers) must not run
`make` at the same time — overlapping g++ writes to the same .so
corrupt it, which made the native-decoder parity test skip silently in
round 1. An exclusive flock serializes the build; losers re-check the
artifact and skip the rebuild.
"""

from __future__ import annotations

import fcntl
import os
import subprocess


def _stale(native_dir: str, lib_path: str) -> bool:
    """True when the lib is missing or any native source (*.cpp/*.h/
    Makefile) is newer — a prebuilt .so from before a source change
    would silently lack new symbols."""
    if not os.path.exists(lib_path):
        return True
    lib_m = os.path.getmtime(lib_path)
    for root, dirs, files in os.walk(native_dir):
        dirs[:] = [d for d in dirs if d != "build"]
        for f in files:
            if f.endswith((".cpp", ".cc", ".h")) or f == "Makefile":
                if os.path.getmtime(os.path.join(root, f)) > lib_m:
                    return True
    return False


def ensure_built(native_dir: str, lib_path: str) -> None:
    """Build `native_dir` (make) unless `lib_path` exists and is newer
    than every native source. Raises RuntimeError with the captured
    make output on failure."""
    if not _stale(native_dir, lib_path):
        return
    os.makedirs(os.path.join(native_dir, "build"), exist_ok=True)
    with open(os.path.join(native_dir, "build", ".lock"), "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        if not _stale(native_dir, lib_path):
            return
        r = subprocess.run(["make", "-C", native_dir],
                           capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(
                f"make failed (rc={r.returncode}): "
                f"{(r.stderr or r.stdout).strip()[-500:]}")
        if not os.path.exists(lib_path):
            raise RuntimeError(f"make succeeded but {lib_path} missing")
