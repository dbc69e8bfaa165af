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
   into subsequent blocks to finish a straddling record;
4. multi-stream archives (pbzip2-style concatenated streams) split like
   single streams: interior stream footers are validated (byte-aligned
   'BZh<d>' header + block magic must follow) and chained across by
   ChainedBz2Stream, with first-block CRC holdback so false 48-bit magic
   hits retry instead of emitting garbage or silently dropping the range.

Residual exposure (shared with Hadoop's BYBLOCK scan): a false-positive
48-bit magic chosen as a task's *end* boundary truncates one straddling
block (~2^-48 per boundary-window bit).
"""

from __future__ import annotations

import bz2 as _bz2
import os

from spark_xml_spark.xmlcore import fs
from typing import Iterator, List, Optional, Tuple

BLOCK_MAGIC = 0x314159265359  # "1AY&SY" (pi)
FOOTER_MAGIC = 0x177245385090  # sqrt(pi)
_MAGIC_BYTES = BLOCK_MAGIC.to_bytes(6, "big")
_CHUNK = 1 << 20


_FOOTER_BYTES = FOOTER_MAGIC.to_bytes(6, "big")


def _interior_pattern(shift: int, magic: int = BLOCK_MAGIC) -> bytes:
    """For a magic starting at bit offset ``shift`` (1..7) within a 7-byte
    window, window bytes 1..5 are fully determined: they hold magic bits
    (8-shift)..(48-shift), i.e. (magic >> shift) masked to 40 bits."""
    chunk = (magic >> shift) & ((1 << 40) - 1)
    return chunk.to_bytes(5, "big")


def _verify_magic_at(
    data: bytes, byte_pos: int, shift: int, magic: int = BLOCK_MAGIC
) -> bool:
    """True if the 48-bit ``magic`` starts at bit ``byte_pos*8 + shift``."""
    end = byte_pos + (7 if shift else 6)
    if byte_pos < 0 or end > len(data):
        return False
    window = int.from_bytes(data[byte_pos:end], "big")
    width = (end - byte_pos) * 8
    got = (window >> (width - 48 - shift)) & ((1 << 48) - 1)
    return got == magic


def _scan_magic_bits(data: bytes, base_byte: int, magic: int) -> List[int]:
    """All bit positions (file coordinates) of ``magic`` inside ``data``
    (data[0] is file byte ``base_byte``)."""
    out: List[int] = []
    raw = magic.to_bytes(6, "big")
    i = data.find(raw)
    while i != -1:
        out.append((base_byte + i) * 8)
        i = data.find(raw, i + 1)
    for shift in range(1, 8):
        pat = _interior_pattern(shift, magic)
        i = data.find(pat)
        while i != -1:
            if _verify_magic_at(data, i - 1, shift, magic):
                out.append((base_byte + i - 1) * 8 + shift)
            i = data.find(pat, i + 1)
    return sorted(set(out))


def _validated_stream_boundary(
    path: str, footer_bit: int
) -> Tuple[str, int, bytes]:
    """Classify a footer-magic hit at ``footer_bit``:
    ('next', bit, level) — real interior footer: a byte-aligned 'BZh<d>'
                     header + block magic follows; bit = the next stream's
                     first block magic (resume point), level = that
                     stream's compression-level digit;
    ('eof', -1, b'') — the file-end footer (footer + 32-bit CRC + pad
                     reach EOF);
    ('false', -1, b'') — bits that merely look like a footer inside block
                     data.
    """
    size = fs.size_of(path)
    h = (footer_bit + 48 + 32 + 7) // 8  # past magic + combined CRC, padded
    if h >= size - 1:
        return "eof", -1, b""
    if h + 10 > size:
        return "false", -1, b""
    with fs.open_input_at(path, h) as fh:
        head = fh.read(10)
    if (
        len(head) == 10
        and head[:3] == b"BZh"
        and head[3:4].isdigit()
        and head[4:10] == _MAGIC_BYTES
    ):
        return "next", (h + 4) * 8, head[3:4]
    return "false", -1, b""


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
    ``bit_to`` (exclusive; -1 = EOF).

    Interior stream footers (multi-stream/pbzip2 archives) are detected in
    the compressed chunks BEFORE they reach the decompressor: feeding a
    footer whose combined CRC cannot match a mid-stream start would raise
    and discard that call's decompressed output. Instead the stream stops
    cleanly just before a validated footer and exposes the next stream's
    first block in ``footer_resume`` for the caller to chain. An exception
    from the decompressor therefore means a false start magic or real
    corruption and is surfaced via ``premature`` rather than swallowed."""

    # keep this many bits unfed until the final flush so the payload
    # boundary is always still in hand when the bound is reached
    _RESERVE_BITS = 16

    def __init__(self, path: str, bit_from: int, bit_to: int, level: bytes):
        self._path = path
        self._fh = fs.open_input_at(path, 0)
        self._shift = bit_from % 8
        self._bit_from = bit_from
        self._end_byte = (
            -1 if bit_to < 0 else (bit_to + 7) // 8  # include partial last byte
        )
        # exact last payload bit (exclusive); feeding stops here and a
        # synthetic next-block magic is appended so the decompressor ends
        # in a clean waiting state instead of misparsing padding
        self._payload_end = bit_to if bit_to >= 0 else -1
        self._fh.seek(bit_from // 8)
        self._decomp = _bz2.BZ2Decompressor()
        self._header = b"BZh" + level
        self._buf = b""
        self._done = False
        self._compressed_pos = bit_from // 8
        self._pending = 0  # aligned, not-yet-fed bits (big-int bit queue)
        self._pending_bits = 0
        self._fed_bits = 0  # payload bits already fed to the decompressor
        self._first_chunk = True
        self.premature = False  # decompressor error before the bound
        self.footer_resume: Optional[int] = None  # next stream's 1st block bit
        self.footer_level: bytes = b""  # that stream's level digit
        self._scan_tail = b""  # 7-byte carry for footer scanning

    def _next_compressed(self) -> bytes:
        if self._end_byte >= 0:
            remaining = self._end_byte - self._compressed_pos
            if remaining <= 0:
                return b""
            chunk = self._fh.read(min(_CHUNK, remaining))
        else:
            chunk = self._fh.read(_CHUNK)
        base = self._compressed_pos
        self._compressed_pos += len(chunk)
        if not chunk:
            return chunk
        # watch for an interior stream footer inside this chunk
        data = self._scan_tail + chunk
        data_base = base - len(self._scan_tail)
        for fb in _scan_magic_bits(data, data_base, FOOTER_MAGIC):
            if fb < self._bit_from + 48:
                continue
            if self._end_byte >= 0 and fb >= self._end_byte * 8:
                break
            kind, resume, level = _validated_stream_boundary(self._path, fb)
            if kind == "false":
                continue
            # truncate the feed to the last byte holding payload bits
            cut = (fb - 1) // 8 + 1  # file bytes to keep, exclusive
            keep = max(cut - base, 0)
            self._end_byte = cut  # no further reads past the footer
            self._payload_end = fb  # stream data ends where the footer starts
            if kind == "next":
                self.footer_resume = resume
                self.footer_level = level
            return chunk[:keep]
        self._scan_tail = data[-7:]
        return chunk

    def _enqueue(self, chunk: bytes) -> bytes:
        """Append a raw file chunk to the aligned bit queue (dropping the
        first ``shift`` bits once) and emit whole bytes from the top,
        holding back _RESERVE_BITS so the payload boundary is still in
        hand at the final flush. Big-int ops keep this at C speed."""
        nbits = len(chunk) * 8
        val = int.from_bytes(chunk, "big")
        if self._first_chunk:
            self._first_chunk = False
            s = self._shift
            if s:
                val &= (1 << (nbits - s)) - 1
                nbits -= s
        self._pending = (self._pending << nbits) | val
        self._pending_bits += nbits
        out_bits = self._pending_bits - self._RESERVE_BITS
        out_bits -= out_bits % 8
        if out_bits <= 0:
            return b""
        keep = self._pending_bits - out_bits
        out = (self._pending >> keep).to_bytes(out_bits // 8, "big")
        self._pending &= (1 << keep) - 1
        self._pending_bits = keep
        self._fed_bits += out_bits
        return out

    def _final_flush(self) -> bytes:
        """Feed the exact remaining payload bits, then a synthetic 48-bit
        next-block magic (zero-padded to a byte): the decompressor finishes
        the last whole block cleanly and is left waiting for block content
        that never arrives — no misparse of boundary padding, so any
        decompressor error is a genuine anomaly."""
        if self._payload_end >= 0:
            rem = self._payload_end - self._bit_from - self._fed_bits
            rem = max(0, min(rem, self._pending_bits))
        else:
            rem = self._pending_bits  # unbounded: feed everything we have
        tail = (self._pending >> (self._pending_bits - rem)) if rem else 0
        tail = (tail << 48) | BLOCK_MAGIC
        bits = rem + 48
        pad = (8 - bits % 8) % 8
        tail <<= pad
        self._pending = 0
        self._pending_bits = 0
        return tail.to_bytes((bits + pad) // 8, "big")

    def read(self, n: int) -> bytes:
        while len(self._buf) < n and not self._done:
            try:
                if self._header:
                    h, self._header = self._header, b""
                    self._buf += self._decomp.decompress(h)
                    continue
                chunk = self._next_compressed()
                last = not chunk
                feed = self._final_flush() if last else self._enqueue(chunk)
                # Feed in small slices: a decompress call that both emits
                # data and raises DISCARDS that call's output, so one big
                # call would lose every good block decoded before an error.
                for i in range(0, len(feed), 1 << 16):
                    self._buf += self._decomp.decompress(feed[i : i + (1 << 16)])
                    # BZ2Decompressor emits at most ~32 KiB per call and
                    # keeps the rest buffered (needs_input misreports this
                    # state): drain with empty calls until it yields nothing.
                    while True:
                        more = self._decomp.decompress(b"")
                        if not more:
                            break
                        self._buf += more
                if last:
                    self._done = True
            except (OSError, EOFError, ValueError):
                # The feed ends in a synthetic next-block magic, leaving
                # the decompressor cleanly waiting — so an error here is a
                # false start magic or genuine block corruption. Surface
                # it via ``premature``, don't swallow.
                self.premature = True
                self._done = True
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def close(self) -> None:
        try:
            self._fh.close()
        except OSError:
            pass


class ChainedBz2Stream:
    """Decompressed ``read(n)`` over a bit range of the compressed file,
    robust to the two conditions a single ShiftedBz2Stream cannot survive:

    - **interior stream footers** (multi-stream / pbzip2 archives): when a
      segment stops at a validated footer, the chain transparently resumes
      at the next stream's first block (with that stream's own level);
    - **false block magics / corrupt first blocks**: every segment's output
      is held back until its first block's CRC has provably passed (output
      exceeds the level's max block size) — a premature decompressor error
      before that discards the unverified bytes and retries from the next
      candidate block start, so a false-positive 48-bit magic costs nothing
      instead of silently emitting garbage or dropping the task's range.

    ``start_bits`` are the candidate block starts (ascending). A premature
    error *after* the first block committed is genuine data corruption and
    raises (Hadoop's splittable bzip2 behaves the same way). A clean end
    means the whole bounded range was consumed — remaining candidates were
    already decompressed in passing and are not reopened.

    ``scan_forward=True`` (continuation streams) lazily scans past the last
    candidate for more block magics when a retry runs out of candidates.
    """

    def __init__(
        self,
        path: str,
        start_bits: List[int],
        bit_to: int,
        level: bytes,
        scan_forward: bool = False,
    ):
        self._path = path
        self._cands = list(start_bits)
        self._i = 0
        self._bit_to = bit_to
        self._level = level
        self._scan_forward = scan_forward
        self._seg: Optional[ShiftedBz2Stream] = None
        self._resume: Optional[Tuple[int, bytes]] = None
        self._out = b""
        self._hold = b""
        self._committed = False
        self._finished = False
        self._seg_emitted = 0
        self._last_start = -1  # bit of the most recently opened segment

    def _hold_limit(self) -> int:
        # Commit threshold ≈ one max-size block at the FILE's declared
        # level: beyond it, at least one real block CRC must have passed.
        # (Candidate headers are synthesized as BZh9 for cross-stream level
        # safety, but a false magic's garbage huffman state errors within
        # bytes, so the smaller declared-level threshold stays sound.)
        try:
            d = int(self._level.decode())
        except (UnicodeDecodeError, ValueError):
            d = 9
        return d * 100_000 + 20_000

    def _extend_candidates(self) -> bool:
        """Scan forward for block magics past the last candidate."""
        last_bit = max(self._cands[-1] if self._cands else 0, self._last_start)
        size = fs.size_of(self._path)
        limit = size if self._bit_to < 0 else min(size, (self._bit_to + 7) // 8)
        from_byte = last_bit // 8 + 1
        while from_byte < limit:
            to_byte = min(from_byte + 4 * _CHUNK, limit)
            bits = [
                b
                for b in find_block_bits(self._path, from_byte, to_byte)
                if b > last_bit and (self._bit_to < 0 or b < self._bit_to)
            ]
            if bits:
                self._cands.extend(bits)
                return True
            from_byte = to_byte
        return False

    def _next_segment(self) -> Optional[ShiftedBz2Stream]:
        if self._resume is not None:
            bit, level = self._resume
            self._resume = None
            self._last_start = bit
            return ShiftedBz2Stream(self._path, bit, self._bit_to, level)
        if self._finished:
            return None
        while True:
            while self._i >= len(self._cands):
                if not self._scan_forward or not self._extend_candidates():
                    return None
            bit = self._cands[self._i]
            self._i += 1
            # after a footer chain, earlier candidates were already covered
            # by the resumed segment — reopening one would duplicate output
            if bit > self._last_start:
                break
        self._last_start = bit
        # candidate blocks may belong to a later stream with a DIFFERENT
        # (higher) level than the file header's: synthesize 'BZh9' — a
        # level-L block always decodes under a larger advertised block
        # size, while a too-small one fails outright
        return ShiftedBz2Stream(self._path, bit, self._bit_to, b"9")

    def _pump(self) -> bool:
        """Advance one step; False when no more output will ever come."""
        if self._seg is None:
            self._seg = self._next_segment()
            if self._seg is None:
                return False
            self._committed = False
            self._hold = b""
            self._seg_emitted = 0
        seg = self._seg
        chunk = seg.read(1 << 16)
        if chunk:
            self._seg_emitted += len(chunk)
            if self._committed:
                self._out += chunk
            else:
                self._hold += chunk
                if len(self._hold) > self._hold_limit():
                    self._committed = True
                    self._out, self._hold = self._out + self._hold, b""
            return True
        # segment exhausted
        self._seg = None
        seg.close()
        if seg.premature and not self._committed:
            self._hold = b""  # unverified bytes from a false/corrupt block
            return True  # retry next candidate
        if seg.premature:
            raise OSError(
                f"corrupt bzip2 block data in {self._path} near compressed "
                f"byte {seg._compressed_pos}"
            )
        if self._seg_emitted == 0 and seg.footer_resume is None:
            # a false start magic can also consume the bounded feed without
            # ever erroring (garbage parsed as an incomplete block): zero
            # output from a segment that claims a clean end = no real block
            # was decoded — retry the next candidate
            return True
        # clean end: flush any short-stream holdback, chain across a
        # validated interior footer, otherwise the range is done
        self._out, self._hold = self._out + self._hold, b""
        if seg.footer_resume is not None and (
            self._bit_to < 0 or seg.footer_resume < self._bit_to
        ):
            self._resume = (seg.footer_resume, seg.footer_level or self._level)
        else:
            self._finished = True
        return True

    def read(self, n: int) -> bytes:
        while len(self._out) < n:
            if not self._pump():
                break
        out, self._out = self._out[:n], self._out[n:]
        return out

    def close(self) -> None:
        if self._seg is not None:
            self._seg.close()
            self._seg = None


class OwnedThenContinuation:
    """Concatenation of the owned-block stream (A) and the continuation
    stream (B, everything after the owned range) exposing where A ended:
    the scanner's ownership test is 'record start < A's total length', and
    by construction any offset inside still-active A satisfies it."""

    def __init__(self, a: ChainedBz2Stream, b: Optional[ChainedBz2Stream]):
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
    # Bound every stream at the file-tail footer, never past it: a
    # decompress call that emits data AND hits the (combined-CRC-
    # mismatching) footer raises and DISCARDS that call's output. Interior
    # footers (multi-stream archives) are detected mid-chunk and chained
    # across by ChainedBz2Stream.
    eof_bit = find_footer_bit(path)
    a = ChainedBz2Stream(path, owned, nxt if nxt is not None else eof_bit, level)
    b = (
        ChainedBz2Stream(path, [nxt], eof_bit, level, scan_forward=True)
        if nxt is not None
        else None
    )
    return OwnedThenContinuation(a, b)
