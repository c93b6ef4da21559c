"""On-demand native kernel builds (the repo's only host-side C++).

The r3 advisor flagged the old scheme (a COMMITTED .so rebuilt on an mtime
comparison, compiled -march=native): git does not preserve mtimes, so a
fresh clone on a different CPU could dlopen a foreign-ISA binary and die
with SIGILL before the pure-Python fallback could intercept. Now: nothing
prebuilt is committed; the artifact name carries a content hash of the
source + flags (rebuild keyed on content, not mtime); flags are
host-portable (-O3, no -march=native — these parsers are branchy scalar
code, measured insensitive to vector ISA)."""

from __future__ import annotations

import hashlib
import subprocess
from pathlib import Path

_FLAGS = ["-O3", "-shared", "-fPIC"]


def build_shared(src: Path, stem: str) -> Path:
    """Compile `src` to `<src dir>/<stem>-<hash>.so` if not present;
    returns the path. Raises CalledProcessError/OSError on failure (the
    callers' pure-Python fallbacks catch those)."""
    digest = hashlib.sha1(
        src.read_bytes() + " ".join(_FLAGS).encode()).hexdigest()[:16]
    out = src.parent / f"{stem}-{digest}.so"
    if not out.exists():
        tmp = out.with_suffix(".so.tmp")
        subprocess.run(["g++", *_FLAGS, "-o", str(tmp), str(src)],
                       check=True, capture_output=True)
        tmp.replace(out)
    return out
