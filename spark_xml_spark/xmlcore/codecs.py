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
  snappy    yes*  yes*   no          .snappy  (Hadoop BlockCompressorStream
                                     framing: BE4 raw block length, then BE4
                                     compressed chunk length + raw-snappy
                                     chunk — the format Hadoop SnappyCodec
                                     writes in data lakes)

(*) backend availability: zstd needs ``zstandard``, lz4 needs ``lz4``,
snappy needs ``pyarrow`` built with snappy (or ``python-snappy``). The
spellings and extensions are registered UNCONDITIONALLY — option
validation accepts them everywhere so driver/executor environments can't
disagree — and a missing backend raises a clear "install X" error at
read/write time.

Unknown codec names raise at option-parse time instead of silently
writing uncompressed output.
"""

from __future__ import annotations

import io
import struct
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
    ".zst": "zstd",
    ".zstd": "zstd",
    ".lz4": "lz4",
    ".snappy": "snappy",
}

# accepted option spellings (incl. Hadoop codec class-name suffixes the
# reference's ``codec`` option takes) -> canonical name. Registered
# unconditionally: the accepted-option set must not depend on which
# libraries happen to be importable in THIS process (a driver that
# validates an option an executor then can't honor is a debugging trap) —
# missing backends fail loudly at use time instead.
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
    "zstd": "zstd",
    "zst": "zstd",
    "zstandard": "zstd",
    "zstandardcodec": "zstd",
    "lz4": "lz4",
    "lz4codec": "lz4",
    "snappy": "snappy",
    "snappycodec": "snappy",
}

WRITE_SUFFIX = {"gzip": ".gz", "bz2": ".bz2", "xz": ".xz", "deflate": ".deflate",
                "zstd": ".zst", "lz4": ".lz4", "snappy": ".snappy"}


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
            "gzip, bzip2, xz/lzma, deflate, zstd, lz4, snappy"
        )
    return canon


def _require_zstd():
    if _zstd is None:
        raise ValueError(
            "codec 'zstd' requires the 'zstandard' package; install it "
            "on every driver and executor (pip install zstandard)"
        )
    return _zstd


def _require_lz4():
    if _lz4f is None:
        raise ValueError(
            "codec 'lz4' requires the 'lz4' package; install it on every "
            "driver and executor (pip install lz4)"
        )
    return _lz4f


def _snappy_backend():
    """Raw-snappy (compress, decompress) callables from python-snappy or
    pyarrow, else a clear install error. The raw format self-describes its
    uncompressed length (varint preamble), which pyarrow's API doesn't
    surface — parsed here so both backends read arbitrary Hadoop chunks."""
    try:  # pragma: no cover - env-dependent
        import snappy as _sn

        return _sn.compress, _sn.uncompress
    except ImportError:
        pass
    try:
        import pyarrow as _pa

        codec = _pa.Codec("snappy")
    except Exception as e:
        raise ValueError(
            "codec 'snappy' requires 'python-snappy' or a pyarrow build "
            "with snappy support on every driver and executor"
        ) from e

    def _uncompressed_len(chunk: bytes) -> int:
        n = shift = 0
        for i in range(min(len(chunk), 6)):
            b = chunk[i]
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7
        raise ValueError("corrupt snappy chunk: bad length preamble")

    def _decompress(chunk: bytes) -> bytes:
        return codec.decompress(
            chunk, decompressed_size=_uncompressed_len(chunk), asbytes=True
        )

    return (lambda d: codec.compress(d, asbytes=True)), _decompress


# Hadoop io.compression.codec.snappy.buffersize default
_SNAPPY_BLOCK = 256 * 1024


class _HadoopSnappyWriteFile(io.RawIOBase):
    """Hadoop BlockCompressorStream framing over raw snappy: per block of
    up to _SNAPPY_BLOCK input bytes, BE4 uncompressed length, then BE4
    compressed length + one raw-snappy chunk. close() flushes the tail but
    leaves the raw stream open (caller owns it)."""

    def __init__(self, raw):
        self._raw = raw
        self._compress, _ = _snappy_backend()
        self._buf = bytearray()

    def writable(self) -> bool:
        return True

    def write(self, data) -> int:
        self._buf += bytes(data)
        while len(self._buf) >= _SNAPPY_BLOCK:
            self._emit(bytes(self._buf[:_SNAPPY_BLOCK]))
            del self._buf[:_SNAPPY_BLOCK]
        return len(data)

    def _emit(self, block: bytes) -> None:
        comp = self._compress(block)
        self._raw.write(struct.pack(">I", len(block)))
        self._raw.write(struct.pack(">I", len(comp)))
        self._raw.write(comp)

    def close(self) -> None:
        if not self.closed and self._buf:
            self._emit(bytes(self._buf))
            self._buf.clear()
        super().close()


class _HadoopSnappyReadFile(io.RawIOBase):
    """Reader for Hadoop BlockDecompressorStream snappy framing; tolerates
    multiple compressed chunks per block (older Hadoop compressors split
    blocks larger than the native buffer)."""

    def __init__(self, raw):
        self._raw = raw
        _, self._decompress = _snappy_backend()
        self._buf = b""
        self._eof = False

    def readable(self) -> bool:
        return True

    def _read_exact(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = self._raw.read(n - len(out))
            if not chunk:
                raise ValueError("corrupt snappy stream: truncated block")
            out += chunk
        return out

    def _next_block(self) -> None:
        hdr = self._raw.read(4)
        if not hdr:
            self._eof = True
            return
        if len(hdr) < 4:
            raise ValueError("corrupt snappy stream: truncated header")
        (raw_len,) = struct.unpack(">I", hdr)
        got = 0
        parts = []
        while got < raw_len:
            (comp_len,) = struct.unpack(">I", self._read_exact(4))
            part = self._decompress(self._read_exact(comp_len))
            parts.append(part)
            got += len(part)
        if got != raw_len:
            raise ValueError("corrupt snappy stream: block length mismatch")
        self._buf += b"".join(parts)

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            while not self._eof:
                self._next_block()
            out, self._buf = self._buf, b""
            return out
        while len(self._buf) < n and not self._eof:
            self._next_block()
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)


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
    if codec == "zstd":
        return _require_zstd().ZstdDecompressor().stream_reader(
            raw, closefd=False
        )
    if codec == "lz4":
        return _require_lz4().LZ4FrameFile(_NoCloseProxy(raw), mode="rb")
    if codec == "snappy":
        return _HadoopSnappyReadFile(raw)
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
    if codec == "zstd":
        return _require_zstd().ZstdCompressor().stream_writer(
            raw, closefd=False
        )
    if codec == "lz4":
        return _require_lz4().LZ4FrameFile(_NoCloseProxy(raw), mode="wb")
    if codec == "snappy":
        return _HadoopSnappyWriteFile(raw)
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
