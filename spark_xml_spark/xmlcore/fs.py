"""Filesystem seam: local paths use the stdlib fast path; any scheme'd URI
(s3://, gs://, hdfs://, ...) routes through ``pyarrow.fs`` — the same
FileSystem layer a real cluster deployment would use, with no extra
dependency. The reference gets remote filesystems for free from Hadoop
(XmlFile.scala:39-55); this module is the Python-native equivalent.

Every entry point in the engine that touches bytes goes through these
functions (``expand_paths`` / ``plan_splits`` / split scan / writer), so a
100 TB run against object storage differs from a laptop run only in the
URI. Tests exercise the remote code path by registering an in-process
filesystem under a fake scheme (``register_filesystem``).
"""

from __future__ import annotations

import glob as _glob
import os
import re
from typing import List, Optional, Tuple

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")

# test/extension hook: scheme -> (pyarrow FileSystem, path-prefix to prepend)
_REGISTERED: dict = {}


def register_filesystem(scheme: str, filesystem, prefix: str = "") -> None:
    """Route ``scheme://...`` URIs through the given pyarrow FileSystem
    (``prefix`` is prepended to the URI's path part). Used by tests to
    exercise the remote path without network access."""
    _REGISTERED[scheme] = (filesystem, prefix)


def scheme_of(path: str) -> Optional[str]:
    m = _SCHEME_RE.match(path)
    if not m:
        return None
    s = m.group(1)
    return None if s == "file" else s


def is_remote(path: str) -> bool:
    return scheme_of(path) is not None


def _resolve(path: str) -> Tuple[object, str]:
    """URI -> (pyarrow FileSystem, fs-internal path)."""
    from pyarrow import fs as pafs

    s = scheme_of(path)
    if s in _REGISTERED:
        filesystem, prefix = _REGISTERED[s]
        inner = path[len(s) + 3 :]
        return filesystem, (prefix.rstrip("/") + "/" + inner if prefix else inner)
    filesystem, inner = pafs.FileSystem.from_uri(path)
    return filesystem, inner


def strip_local_scheme(p: str) -> str:
    if p.startswith("file://"):
        return p[7:]
    if p.startswith("file:"):
        return p[5:]
    return p


def list_data_files(path: str) -> List[Tuple[str, int]]:
    """Expand one path/dir/glob to [(uri, size)] of data files (names
    starting with '_' or '.' excluded), preserving the scheme on results."""
    s = scheme_of(path)
    if s is None:
        p = strip_local_scheme(path)
        out: List[Tuple[str, int]] = []
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                fp = os.path.join(p, f)
                if os.path.isfile(fp) and not f.startswith(("_", ".")):
                    out.append((fp, os.path.getsize(fp)))
        elif os.path.isfile(p):
            out.append((p, os.path.getsize(p)))
        else:
            hits = sorted(_glob.glob(p))
            if not hits:
                raise FileNotFoundError(f"Path does not exist: {p}")
            out.extend(
                (h, os.path.getsize(h)) for h in hits if os.path.isfile(h)
            )
        return out

    from pyarrow import fs as pafs

    filesystem, inner = _resolve(path)
    info = filesystem.get_file_info(inner)
    prefix = f"{s}://"
    out = []
    if info.type == pafs.FileType.Directory:
        sel = pafs.FileSelector(inner, recursive=False)
        for fi in sorted(filesystem.get_file_info(sel), key=lambda x: x.path):
            base = fi.base_name
            if fi.type == pafs.FileType.File and not base.startswith(("_", ".")):
                out.append((prefix + fi.path, fi.size))
    elif info.type == pafs.FileType.File:
        out.append((prefix + info.path, info.size))
    else:
        raise FileNotFoundError(f"Path does not exist: {path}")
    return out


def open_input(path: str):
    """Readable binary stream for a data file (local: plain ``open``)."""
    if not is_remote(path):
        return open(strip_local_scheme(path), "rb")
    filesystem, inner = _resolve(path)
    return filesystem.open_input_stream(inner)


def open_input_at(path: str, offset: int):
    """Readable binary stream positioned at ``offset``. Remote filesystems
    serve ranged reads from a random-access file handle, so a task reading
    split [start, end) never pulls the bytes before start."""
    if not is_remote(path):
        fh = open(strip_local_scheme(path), "rb")
        if offset:
            fh.seek(offset)
        return fh
    filesystem, inner = _resolve(path)
    f = filesystem.open_input_file(inner)
    if offset:
        f.seek(offset)
    return f


def size_of(path: str) -> int:
    if not is_remote(path):
        return os.path.getsize(strip_local_scheme(path))
    filesystem, inner = _resolve(path)
    return filesystem.get_file_info(inner).size


def open_output(path: str):
    """Writable binary stream (local: plain ``open``; parents created)."""
    if not is_remote(path):
        p = strip_local_scheme(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return open(p, "wb")
    filesystem, inner = _resolve(path)
    return filesystem.open_output_stream(inner)


def makedirs(path: str) -> None:
    if not is_remote(path):
        os.makedirs(strip_local_scheme(path), exist_ok=True)
        return
    filesystem, inner = _resolve(path)
    filesystem.create_dir(inner, recursive=True)


def delete_file(path: str) -> None:
    if not is_remote(path):
        os.remove(strip_local_scheme(path))
        return
    filesystem, inner = _resolve(path)
    filesystem.delete_file(inner)


def delete_dir(path: str) -> None:
    if not is_remote(path):
        import shutil

        shutil.rmtree(strip_local_scheme(path))
        return
    filesystem, inner = _resolve(path)
    filesystem.delete_dir(inner)


def dir_exists(path: str) -> bool:
    """True when the directory exists at all (even holding only marker
    files like _SUCCESS) — the overwrite path must clear such stale dirs,
    not just ones dir_has_data() considers populated."""
    if not is_remote(path):
        return os.path.isdir(strip_local_scheme(path))
    from pyarrow import fs as pafs

    filesystem, inner = _resolve(path)
    return filesystem.get_file_info(inner).type == pafs.FileType.Directory


def dir_has_data(path: str) -> bool:
    """True when the directory exists and holds at least one data file."""
    if not is_remote(path):
        p = strip_local_scheme(path)
        return os.path.isdir(p) and any(
            not f.startswith(("_", ".")) for f in os.listdir(p)
        )
    from pyarrow import fs as pafs

    filesystem, inner = _resolve(path)
    info = filesystem.get_file_info(inner)
    if info.type != pafs.FileType.Directory:
        return False
    sel = pafs.FileSelector(inner, recursive=False)
    return any(
        fi.type == pafs.FileType.File and not fi.base_name.startswith(("_", "."))
        for fi in filesystem.get_file_info(sel)
    )
