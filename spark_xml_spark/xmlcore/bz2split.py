"""Block-aligned bzip2 splitting: the Python counterpart of Hadoop's
SplittableCompressionCodec READ_MODE.BYBLOCK used by the reference scan
(/root/reference/src/main/scala/com/databricks/spark/xml/XmlInputFormat.scala:93-103,
exercised by XmlPartitioningSuite.scala:27-72 on fias_house.large.xml.bz2).

bzip2 streams are a 4-byte header (``BZh<level>``) followed by independent
blocks, each introduced by the 48-bit magic 0x314159265359 at an arbitrary
BIT offset. Splitting therefore needs:

1. a bit-level magic scan over the compressed bytes — done with C-speed
   ``bytes.find`` on the 4 interior bytes that are fully determined for
   each of the 8 possible bit alignments, then exact 48-bit verification;
2. re-aligned decompression from any block boundary — synthesize a fresh
   header and feed the bit-shifted remainder into an incremental
   ``bz2.BZ2Decompressor`` (per-block CRCs still verify; the stream-level
   combined CRC at the original footer cannot match a mid-stream start, so
   a trailing error after all data has been emitted is swallowed);
3. Hadoop's ownership rule lifted to blocks: a task owns the blocks whose
   magic begins inside its compressed byte range, and may keep reading
   into subsequent blocks to finish a straddling record.

Limitation (documented): multi-stream archives (pbzip2-style concatenated
streams) degrade to whole-file reads — detected by a second stream header
after the first footer.
"""

from __future__ import annotations

import bz2 as _bz2
import os

from spark_xml_spark.xmlcore import fs
from typing import Iterator, List, Optional

BLOCK_MAGIC = 0x314159265359  # "1AY&SY" (pi)
FOOTER_MAGIC = 0x177245385090  # sqrt(pi)
_MAGIC_BYTES = BLOCK_MAGIC.to_bytes(6, "big")
_CHUNK = 1 << 20


def _interior_pattern(shift: int) -> bytes:
    """For a magic starting at bit offset ``shift`` (1..7) within a 7-byte
    window, window bytes 1..5 are fully determined: they hold magic bits
    (8-shift)..(48-shift), i.e. (BLOCK_MAGIC >> shift) masked to 40 bits."""
    chunk = (BLOCK_MAGIC >> shift) & ((1 << 40) - 1)
    return chunk.to_bytes(5, "big")


def _verify_magic_at(data: bytes, byte_pos: int, shift: int) -> bool:
    """True if the 48-bit block magic starts at bit ``byte_pos*8 + shift``."""
    end = byte_pos + (7 if shift else 6)
    if byte_pos < 0 or end > len(data):
        return False
    window = int.from_bytes(data[byte_pos:end], "big")
    width = (end - byte_pos) * 8
    got = (window >> (width - 48 - shift)) & ((1 << 48) - 1)
    return got == BLOCK_MAGIC


def find_block_bits(path: str, from_byte: int, to_byte: int) -> List[int]:
    """Bit positions of block magics whose byte position lies in
    [from_byte, to_byte). Chunked scan with a 6-byte overlap."""
    out: List[int] = []
    size = fs.size_of(path)
    to_byte = min(to_byte, size)
    if from_byte >= to_byte:
        return out
    with fs.open_input_at(path, 0) as fh:
        base = max(from_byte - 1, 0)  # 1 byte back-off for shifted magics
        fh.seek(base)
        prev_tail = b""
        pos = base
        while pos < to_byte:
            chunk = fh.read(min(_CHUNK, to_byte + 8 - pos))
            if not chunk:
                break
            data = prev_tail + chunk
            data_base = pos - len(prev_tail)
            # shift 0: straight find
            i = data.find(_MAGIC_BYTES)
            while i != -1:
                bp = data_base + i
                if from_byte <= bp < to_byte:
                    out.append(bp * 8)
                i = data.find(_MAGIC_BYTES, i + 1)
            for shift in range(1, 8):
                pat = _interior_pattern(shift)
                i = data.find(pat)
                while i != -1:
                    bp = data_base + i - 1
                    if from_byte <= bp < to_byte and _verify_magic_at(data, i - 1, shift):
                        out.append(bp * 8 + shift)
                    i = data.find(pat, i + 1)
            prev_tail = data[-8:]
            pos += len(chunk)
    return sorted(set(out))


class ShiftedBz2Stream:
    """File-like ``read(n)`` over the decompressed bytes of a synthesized
    bzip2 stream: ``BZh<level>`` + the file's bits from ``bit_from`` to
    ``bit_to`` (exclusive; -1 = EOF). Per-block CRCs verify normally; an
    OSError raised after the final data (mid-stream footer mismatch) ends
    the stream silently."""

    def __init__(self, path: str, bit_from: int, bit_to: int, level: bytes):
        self._fh = fs.open_input_at(path, 0)
        self._shift = bit_from % 8
        self._end_byte = (
            -1 if bit_to < 0 else (bit_to + 7) // 8  # include partial last byte
        )
        self._fh.seek(bit_from // 8)
        self._decomp = _bz2.BZ2Decompressor()
        self._carry: Optional[int] = None  # pending previous byte for shifting
        self._header = b"BZh" + level
        self._buf = b""
        self._done = False
        self._compressed_pos = bit_from // 8

    def _next_compressed(self) -> bytes:
        if self._end_byte >= 0:
            remaining = self._end_byte - self._compressed_pos
            if remaining <= 0:
                return b""
            chunk = self._fh.read(min(_CHUNK, remaining))
        else:
            chunk = self._fh.read(_CHUNK)
        self._compressed_pos += len(chunk)
        return chunk

    def _shift_chunk(self, chunk: bytes, last: bool) -> bytes:
        """Left-align the bit stream: drop the top ``shift`` bits of the
        first byte ever seen; afterwards each output byte combines carry and
        current byte. Integer ops keep this at C speed."""
        s = self._shift
        if s == 0:
            return chunk
        data = chunk
        if self._carry is not None:
            data = bytes([self._carry]) + data
        if not data:
            return b""
        if not last:
            self._carry = data[-1]
            n = int.from_bytes(data, "big")
            width = len(data) * 8
            aligned = (n << s) & ((1 << width) - 1)
            return aligned.to_bytes(len(data), "big")[:-1]
        n = int.from_bytes(data, "big")
        width = len(data) * 8
        aligned = (n << s) & ((1 << width) - 1)
        return aligned.to_bytes(len(data), "big")

    def read(self, n: int) -> bytes:
        while len(self._buf) < n and not self._done:
            try:
                if self._header:
                    h, self._header = self._header, b""
                    self._buf += self._decomp.decompress(h)
                    continue
                chunk = self._next_compressed()
                last = not chunk
                shifted = self._shift_chunk(chunk, last)
                if shifted:
                    self._buf += self._decomp.decompress(shifted)
                # BZ2Decompressor emits at most ~32 KiB per call and keeps
                # the rest buffered (needs_input misreports this state):
                # drain with empty calls until it yields nothing.
                while True:
                    more = self._decomp.decompress(b"")
                    if not more:
                        break
                    self._buf += more
                if last:
                    self._done = True
            except (OSError, EOFError, ValueError):
                # mid-stream start: trailing combined-CRC/footer mismatch
                # after all block data was emitted
                self._done = True
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def close(self) -> None:
        try:
            self._fh.close()
        except OSError:
            pass


class OwnedThenContinuation:
    """Concatenation of the owned-block stream (A) and the continuation
    stream (B, everything after the owned range) exposing where A ended:
    the scanner's ownership test is 'record start < A's total length', and
    by construction any offset inside still-active A satisfies it."""

    def __init__(self, a: ShiftedBz2Stream, b: Optional[ShiftedBz2Stream]):
        self._a = a
        self._b = b
        self.a_len: Optional[int] = None  # set once A exhausts
        self._a_bytes = 0

    def read(self, n: int) -> bytes:
        if self.a_len is None:
            chunk = self._a.read(n)
            if chunk:
                self._a_bytes += len(chunk)
                return chunk
            self.a_len = self._a_bytes
            self._a.close()
        if self._b is None:
            return b""
        return self._b.read(n)

    def owns(self, offset: int) -> bool:
        return self.a_len is None or offset < self.a_len

    def close(self) -> None:
        self._a.close()
        if self._b is not None:
            self._b.close()


def find_footer_bit(path: str) -> int:
    """Bit position of the stream footer magic (sqrt-pi), located in the
    file tail: footer = 48-bit magic + 32-bit combined CRC + <=7 pad bits.
    Falls back to end-of-file when not found (corrupt/truncated stream)."""
    size = fs.size_of(path)
    tail_len = min(size, 32)
    with fs.open_input_at(path, 0) as fh:
        fh.seek(size - tail_len)
        tail = fh.read(tail_len)
    n = int.from_bytes(tail, "big")
    nbits = tail_len * 8
    # footer magic ends 32 + pad bits before EOF; try every tail position
    for bit in range(nbits - 48, -1, -1):
        if (n >> (nbits - 48 - bit)) & ((1 << 48) - 1) == FOOTER_MAGIC:
            return (size - tail_len) * 8 + bit
    return size * 8


def read_level(path: str) -> Optional[bytes]:
    """The compression-level digit from the stream header, or None when the
    file is not a single plain bzip2 stream."""
    with fs.open_input_at(path, 0) as fh:
        head = fh.read(4)
    if len(head) == 4 and head[:3] == b"BZh" and head[3:4].isdigit():
        return head[3:4]
    return None


def looks_multistream(path: str, probe_bytes: int = 8 << 20) -> bool:
    """Heuristic multi-stream (pbzip2-style concatenation) detector: a
    byte-aligned interior stream header 'BZh<d>' immediately followed by the
    block magic. pbzip2 emits ~900 KB streams, so probing the first few MB
    catches real producers; a file with a single giant first stream followed
    by more streams would evade this and must be read whole-file by the
    caller's choice (documented limitation)."""
    level = read_level(path)
    if level is None:
        return False
    with fs.open_input_at(path, 0) as fh:
        fh.seek(1)
        data = fh.read(probe_bytes)
    pat = b"BZh" + level + _MAGIC_BYTES
    if data.find(pat) != -1:
        return True
    # streams may use different levels
    for lv in b"123456789":
        if data.find(b"BZh" + bytes([lv]) + _MAGIC_BYTES) != -1:
            return True
    return False


def open_block_range(
    path: str, start_byte: int, end_byte: int
) -> Optional[OwnedThenContinuation]:
    """Decompressed view for the task owning compressed bytes
    [start_byte, end_byte): stream A covers blocks starting in the range,
    stream B continues into the rest of the file for straddling records.
    None when the range owns no block."""
    level = read_level(path)
    if level is None:
        return None
    size = fs.size_of(path)
    lo = max(start_byte, 4)
    owned = find_block_bits(path, max(lo - 1, 4), min(end_byte + 1, size))
    owned = [b for b in owned if lo * 8 <= b < end_byte * 8]
    if not owned:
        return None
    # first block at/after the end boundary (scan forward as far as needed)
    nxt: Optional[int] = None
    probe_from = end_byte - 1
    while probe_from < size:
        probe_to = min(probe_from + 4 * _CHUNK, size)
        later = [b for b in find_block_bits(path, probe_from, probe_to) if b >= end_byte * 8]
        if later:
            nxt = later[0]
            break
        probe_from = probe_to
    # Bound every stream at the stream footer, never past it: a decompress
    # call that emits data AND hits the (combined-CRC-mismatching) footer
    # raises and DISCARDS that call's output, silently losing the tail.
    eof_bit = find_footer_bit(path)
    a = ShiftedBz2Stream(path, owned[0], nxt if nxt is not None else eof_bit, level)
    b = ShiftedBz2Stream(path, nxt, eof_bit, level) if nxt is not None else None
    return OwnedThenContinuation(a, b)
