"""Compression codec registry for the XML read/write paths.

The reference resolves any Hadoop codec by class name
(XmlOptions.scala:31 ``codec`` -> CompressionCodecs); this engine supports
the codecs the Python standard library provides:

  codec     read  write  splittable  extension
  gzip      yes   yes    no          .gz
  bzip2     yes   yes    yes (block) .bz2
  xz/lzma   yes   yes    no          .xz / .lzma
  deflate   yes   yes    no          .deflate  (zlib-wrapped, matching
                                     Hadoop DefaultCodec/DeflateCodec)
  zstd      yes*  yes*   no          .zst / .zstd  (standard zstd frames,
                                     interoperable with Hadoop
                                     ZStandardCodec)
  lz4       yes*  yes*   no          .lz4  (lz4 FRAME format; note Hadoop's
                                     Lz4Codec historically wrote its own
                                     block framing — frame-format files are
                                     what modern tools produce)

(*) zstd/lz4 engage only when the optional ``zstandard`` / ``lz4``
modules are importable; otherwise their spellings raise at option-parse
time like any unsupported codec, and their extensions are not sniffed.

Unknown codec names raise at option-parse time instead of silently
writing uncompressed output.
"""

from __future__ import annotations

import io
import zlib
from typing import Optional

try:  # optional codec backends — present on most real clusters
    import zstandard as _zstd
except ImportError:  # pragma: no cover - env-dependent
    _zstd = None
try:
    import lz4.frame as _lz4f
except ImportError:  # pragma: no cover - env-dependent
    _lz4f = None

# extension -> canonical codec name (longest-match applied by caller order)
_EXTENSIONS = {
    ".gz": "gzip",
    ".bz2": "bz2",
    ".xz": "xz",
    ".lzma": "xz",
    ".deflate": "deflate",
}
if _zstd is not None:
    _EXTENSIONS[".zst"] = "zstd"
    _EXTENSIONS[".zstd"] = "zstd"
if _lz4f is not None:
    _EXTENSIONS[".lz4"] = "lz4"

# accepted option spellings (incl. Hadoop codec class-name suffixes the
# reference's ``codec`` option takes) -> canonical name
_SPELLINGS = {
    "gzip": "gzip",
    "gz": "gzip",
    "gzipcodec": "gzip",
    "bzip2": "bz2",
    "bz2": "bz2",
    "bzip2codec": "bz2",
    "xz": "xz",
    "lzma": "xz",
    "lzmacodec": "xz",
    "xzcodec": "xz",
    "deflate": "deflate",
    "zlib": "deflate",
    "defaultcodec": "deflate",
    "deflatecodec": "deflate",
}
if _zstd is not None:
    _SPELLINGS.update({"zstd": "zstd", "zst": "zstd", "zstandard": "zstd",
                       "zstandardcodec": "zstd"})
if _lz4f is not None:
    _SPELLINGS.update({"lz4": "lz4", "lz4codec": "lz4"})

WRITE_SUFFIX = {"gzip": ".gz", "bz2": ".bz2", "xz": ".xz", "deflate": ".deflate",
                "zstd": ".zst", "lz4": ".lz4"}


def normalize(name: str) -> str:
    """Canonical codec name for an option value (case-insensitive, Hadoop
    class names accepted). Raises ValueError for unsupported codecs."""
    c = name.lower()
    if "." in c:  # fully-qualified Hadoop class name
        c = c.rsplit(".", 1)[-1]
    canon = _SPELLINGS.get(c)
    if canon is None:
        raise ValueError(
            f"Unsupported compression codec {name!r}; supported: "
            "gzip, bzip2, xz/lzma, deflate"
        )
    return canon


def compression_of(path: str) -> Optional[str]:
    """Codec implied by a file's extension, or None for plain files."""
    for ext, codec in _EXTENSIONS.items():
        if path.endswith(ext):
            return codec
    return None


class _ZlibWriteFile(io.RawIOBase):
    """Streaming zlib (RFC 1950) writer over a raw binary stream — the
    byte format Hadoop's DefaultCodec produces for ``.deflate`` files.
    close() flushes the compressed tail but leaves the raw stream open
    (GzipFile/BZ2File convention; the caller owns the raw stream)."""

    def __init__(self, raw):
        self._raw = raw
        self._c = zlib.compressobj()

    def writable(self) -> bool:
        return True

    def write(self, data) -> int:
        out = self._c.compress(bytes(data))
        if out:
            self._raw.write(out)
        return len(data)

    def close(self) -> None:
        if not self.closed:
            self._raw.write(self._c.flush())
        super().close()


class _ZlibReadFile(io.RawIOBase):
    """Streaming zlib reader (single zlib stream, Hadoop DefaultCodec)."""

    def __init__(self, raw):
        self._raw = raw
        self._d = zlib.decompressobj()
        self._buf = b""
        self._eof = False

    def readable(self) -> bool:
        return True

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            chunks = [self._buf]
            self._buf = b""
            while not self._eof:
                chunks.append(self.read(1 << 20))
            return b"".join(chunks)
        while len(self._buf) < n and not self._eof:
            raw = self._raw.read(1 << 16)
            if not raw:
                self._buf += self._d.flush()
                self._eof = True
                break
            self._buf += self._d.decompress(raw)
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)

    def close(self) -> None:
        super().close()


def wrap_read(raw, codec: str):
    """File-like decompressing reader over ``raw`` for ``codec``."""
    if codec == "gzip":
        import gzip

        return gzip.GzipFile(fileobj=raw)
    if codec == "bz2":
        import bz2

        return bz2.BZ2File(raw)
    if codec == "xz":
        import lzma

        return lzma.LZMAFile(raw)  # FORMAT_AUTO: .xz and legacy .lzma
    if codec == "deflate":
        return _ZlibReadFile(raw)
    if codec == "zstd" and _zstd is not None:
        return _zstd.ZstdDecompressor().stream_reader(raw, closefd=False)
    if codec == "lz4" and _lz4f is not None:
        return _lz4f.LZ4FrameFile(_NoCloseProxy(raw), mode="rb")
    raise ValueError(f"unknown codec: {codec}")


def wrap_write(raw, codec: str):
    """File-like compressing writer over ``raw`` for ``codec``; closing the
    wrapper flushes the codec tail but leaves ``raw`` open."""
    if codec == "gzip":
        import gzip

        return gzip.GzipFile(fileobj=raw, mode="wb")
    if codec == "bz2":
        import bz2

        return bz2.BZ2File(raw, "wb")
    if codec == "xz":
        import lzma

        return lzma.LZMAFile(raw, "wb")  # FORMAT_XZ
    if codec == "deflate":
        return _ZlibWriteFile(raw)
    if codec == "zstd" and _zstd is not None:
        return _zstd.ZstdCompressor().stream_writer(raw, closefd=False)
    if codec == "lz4" and _lz4f is not None:
        return _lz4f.LZ4FrameFile(_NoCloseProxy(raw), mode="wb")
    raise ValueError(f"unknown codec: {codec}")


class _NoCloseProxy(io.RawIOBase):
    """Pass-through that swallows close(): wrapper codecs must flush their
    tail on close but leave the raw stream open (the caller owns it —
    GzipFile/BZ2File convention, which LZ4FrameFile does not follow)."""

    def __init__(self, raw):
        self._raw = raw

    def readable(self):
        return self._raw.readable()

    def writable(self):
        return self._raw.writable()

    def read(self, n=-1):
        return self._raw.read(n)

    def readinto(self, b):
        data = self._raw.read(len(b))
        b[: len(data)] = data
        return len(data)

    def write(self, data):
        return self._raw.write(data)

    def flush(self):
        self._raw.flush()

    def close(self):  # deliberately do NOT close the raw stream
        super().close()
