"""Multimodal columns: image/audio/video payloads as opaque BinaryType
columns with typed metadata, plus Arrow-batched decode / feature-extract /
frame-sample plumbing.

The Spark-side design is real and tested: BinaryType payload column,
metadata struct (byte_len, magic, sha), `mapInPandas` feature extraction
with bounded Arrow batches. Image HEADER decoding (format/width/height
for PNG/GIF/JPEG) is real and pure-stdlib (``default_image_decoder``);
PIXEL decoding is the one injectable seam — the image/audio libraries are
not in this container — so swapping in a real decoder (PIL/torchaudio)
changes ONE function, not the pipeline.

Scale notes: payloads never pass through Python except inside the Arrow
batches of the explicitly-invoked extract step; metadata derivation is
JVM-side; batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
so executor memory stays flat regardless of corpus size.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Adam7 interlace passes: (x_start, y_start, x_step, y_step), from the
# PNG spec's 8x8 pattern —
#   1 6 4 6 2 6 4 6
#   7 7 7 7 7 7 7 7
#   5 6 5 6 5 6 5 6
#   7 7 7 7 7 7 7 7
#   3 6 4 6 3 6 4 6   (passes 4 and 6 start at ROW 0, not mid-grid)
#   ... rows 5-7 repeat 7 / 5 6 / 7
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

# magic prefixes -> media kind (the usual sniff table)
_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"ID3": "audio/mp3",
    b"\x00\x00\x00": "video/mp4",
}


def payload_metadata(col: Column) -> Column:
    """Typed metadata struct for a binary payload column — JVM-side only:
    (byte_len, magic_hex, sha256, kind)."""
    magic = F.hex(F.substring(col, 1, 4))
    kind = F.lit("application/octet-stream")
    for prefix, mime in _MAGIC.items():
        kind = F.when(
            magic.startswith(prefix.hex().upper()), F.lit(mime)
        ).otherwise(kind)
    return F.struct(
        F.length(col).alias("byte_len"),
        magic.alias("magic_hex"),
        F.sha2(col, 256).alias("sha256"),
        kind.alias("kind"),
    )


def add_payload_metadata(
    df: DataFrame, payload_col: str = "payload", out_col: str = "meta"
) -> DataFrame:
    return df.withColumn(out_col, payload_metadata(F.col(payload_col)))


def synthesize_payload(col: Column, kind: str = "image/png") -> Column:
    """Deterministic fake payload for tests/benchmarks: a magic prefix +
    the utf-8 bytes of a source column. Lets the whole multimodal pipeline
    run end-to-end without media files."""
    prefix = {v: k for k, v in _MAGIC.items()}.get(kind, b"")
    return F.concat(F.lit(bytearray(prefix)), F.encode(col, "utf-8"))


def default_image_decoder(payload: bytes) -> dict:
    """Pure-stdlib image HEADER decoder: real width/height/format for PNG
    (IHDR chunk), GIF (logical screen descriptor) and JPEG (SOF scan) —
    no media library needed. Pixel decoding still requires a real library
    (PIL etc.); inject it via the ``decoder``/``resizer`` seams. Raises
    NotImplementedError for formats this header parse doesn't cover, so
    the injectable-seam contract is unchanged for them."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        bit_depth, color_type = payload[24], payload[25]
        return {
            "format": "png",
            "width": w,
            "height": h,
            "bit_depth": bit_depth,
            "color_type": color_type,
        }
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": w, "height": h}
    if payload[:3] == b"\xff\xd8\xff":
        # walk JPEG segments to the first SOFn frame header
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2:i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return {"format": "jpeg", "width": w, "height": h}
            i += 2 + seg_len
        raise ValueError("corrupt JPEG: no SOF frame header found")
    raise NotImplementedError(
        "full media decoding requires an image library not present in "
        "this environment; inject impl= with a real or fake decoder"
    )


def decode_png_pixels(payload: bytes):
    """Pure-stdlib PNG PIXEL decode (zlib inflate + per-scanline
    unfilter, RFC 2083 §6): returns an (h, w, channels) numpy array —
    uint8 at depth 8, uint16 at depth 16 (filters operate on BYTES at
    either depth; samples are big-endian u16 at 16). Supports color
    types 0 (gray), 2 (RGB), 3 (palette -> expanded RGB, depth 8), 4
    (gray+alpha), 6 (RGBA), both non-interlaced and Adam7-interlaced
    (seven independently-filtered sub-images scattered back to the
    grid). All five filter types (None/Sub/Up/Average/Paeth) are
    implemented; 1/2/4-bit depths and non-PNG formats still raise —
    the injectable-seam contract shrinks to exactly what stdlib cannot
    express, instead of all pixel work."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError(
            "pixel decoding beyond PNG requires an image library not "
            "present in this environment; inject a real decoder"
        )
    pos = 8
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + clen]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("corrupt PNG: no IHDR")
    w, h = struct.unpack(">II", ihdr[:8])
    depth, color, _comp, _filt, interlace = ihdr[8:13]
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} unsupported")
    if interlace not in (0, 1):
        raise ValueError(f"corrupt PNG: interlace method {interlace}")
    try:
        nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    except KeyError:
        raise ValueError(f"corrupt PNG: color type {color}")
    if depth == 16 and color == 3:
        raise ValueError("corrupt PNG: 16-bit palette is not legal")
    raw = zlib.decompress(b"".join(idat))
    sbytes = depth // 8  # bytes per sample
    bpp = nch * sbytes  # filter distance = bytes per pixel

    def _unfilter(off, n_rows, stride):
        """Unfilter ``n_rows`` scanlines of ``stride`` bytes starting at
        raw[off]; returns ((n_rows, stride) array, new off). The
        previous-row context resets per call — exactly PNG's rule for
        each Adam7 pass (every pass filters as an independent image)."""
        if len(raw) - off < n_rows * (stride + 1):
            raise ValueError("corrupt PNG: truncated pixel data")
        rows = np.empty((n_rows, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(n_rows):
            ft = raw[off]
            off += 1
            cur = np.frombuffer(raw, dtype=np.uint8, count=stride,
                                offset=off).copy()
            off += stride
            if ft == 0:
                pass
            elif ft == 2:  # Up: vectorized (uint8 addition wraps)
                cur += prev
            elif ft == 1:  # Sub: sequential in x (left recurrence)
                for x in range(bpp, stride):
                    cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
            elif ft == 3:  # Average
                for x in range(stride):
                    left = int(cur[x - bpp]) if x >= bpp else 0
                    cur[x] = (
                        int(cur[x]) + (left + int(prev[x])) // 2
                    ) & 0xFF
            elif ft == 4:  # Paeth
                for x in range(stride):
                    a = int(cur[x - bpp]) if x >= bpp else 0
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                    cur[x] = (int(cur[x]) + pred) & 0xFF
            else:
                raise ValueError(f"corrupt PNG: filter type {ft}")
            rows[y] = cur
            prev = cur
        return rows, off

    def _samples(rows, n_rows, n_cols):
        """Filtered BYTE rows -> (n_rows, n_cols, nch) sample array:
        identity at depth 8; big-endian u16 view at depth 16 (filters
        operate on bytes regardless of depth, per the spec)."""
        if sbytes == 1:
            return rows.reshape(n_rows, n_cols, nch)
        u16 = rows.reshape(n_rows, -1).view(">u2").astype(np.uint16)
        return u16.reshape(n_rows, n_cols, nch)

    if interlace:  # Adam7: seven independently-filtered sub-images
        out = np.empty((h, w, nch), dtype=np.uint16 if sbytes == 2
                       else np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            rows, off = _unfilter(off, hp, wp * bpp)
            out[y0::dy, x0::dx] = _samples(rows, hp, wp)
        px = out
    else:
        rows, _ = _unfilter(0, h, w * bpp)
        px = _samples(rows, h, w)
    if color == 3:
        if plte is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        px = pal[px[:, :, 0]]
    return px


def encode_png(pixels, filters=(0,)) -> bytes:
    """Pure-stdlib PNG encoder (fixture/write seam): (h, w) or
    (h, w, channels) uint8 array -> PNG bytes, bit depth 8, color type
    from channel count (1 gray / 2 gray+alpha / 3 RGB / 4 RGBA).
    ``filters`` cycles per scanline through PNG filter types 0-4, so a
    fixture built with (0, 1, 2, 3, 4) exercises EVERY unfilter branch
    of :func:`decode_png_pixels`."""
    import struct
    import zlib

    import numpy as np

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    stride = w * nch
    bpp = nch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = px[y].reshape(-1)
        ft = filters[y % len(filters)]
        raw.append(ft)
        if ft == 0:
            raw.extend(line.tobytes())
        elif ft == 1:
            enc = line.copy()
            enc[bpp:] = (line[bpp:].astype(np.int16)
                         - line[:-bpp].astype(np.int16)) & 0xFF
            raw.extend(enc.astype(np.uint8).tobytes())
        elif ft == 2:
            raw.extend(((line.astype(np.int16) - prev.astype(np.int16))
                        & 0xFF).astype(np.uint8).tobytes())
        elif ft == 3:
            enc = bytearray(stride)
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                enc[x] = (int(line[x]) - (left + int(prev[x])) // 2) & 0xFF
            raw.extend(enc)
        elif ft == 4:
            enc = bytearray(stride)
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[x] = (int(line[x]) - pred) & 0xFF
            raw.extend(enc)
        else:
            raise ValueError(f"filter type {ft}")
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_gif_pixels(payload: bytes):
    """Pure-stdlib GIF PIXEL decode (variable-width LSB-first LZW per
    GIF89a appendix F): returns the FIRST image frame as an (h, w, 3)
    uint8 RGB array via its (local else global) color table, honoring
    the interlace flag. Extensions are skipped; animation frames beyond
    the first are out of scope (stats sample frame 1)."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError(
            "pixel decoding beyond PNG/GIF requires an image library not "
            "present in this environment; inject a real decoder"
        )
    pos = 6
    _sw, _sh = struct.unpack("<HH", payload[pos:pos + 4])
    packed = payload[pos + 4]
    pos += 7  # LSD
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload[pos:pos + 3 * n], dtype=np.uint8
        ).reshape(-1, 3)
        pos += 3 * n

    def _skip_subblocks(p):
        while True:
            ln = payload[p]
            p += 1
            if ln == 0:
                return p
            p += ln

    while pos < len(payload):
        intro = payload[pos]
        if intro == 0x21:  # extension: label + sub-blocks
            pos = _skip_subblocks(pos + 2)
            continue
        if intro == 0x3B:  # trailer before any image
            raise ValueError("corrupt GIF: no image data")
        if intro != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{intro:02x}")
        break
    _l, _t, w, h = struct.unpack("<HHHH", payload[pos + 1:pos + 9])
    ipacked = payload[pos + 9]
    pos += 10
    pal = gct
    if ipacked & 0x80:  # local color table
        n = 2 << (ipacked & 0x07)
        pal = np.frombuffer(
            payload[pos:pos + 3 * n], dtype=np.uint8
        ).reshape(-1, 3)
        pos += 3 * n
    if pal is None:
        raise ValueError("corrupt GIF: no color table")
    interlaced = bool(ipacked & 0x40)
    mcs = payload[pos]
    pos += 1
    data = bytearray()
    while True:
        ln = payload[pos]
        pos += 1
        if ln == 0:
            break
        data += payload[pos:pos + ln]
        pos += ln

    # ---- LZW decode: LSB-first variable-width codes -------------------
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    table: list = [bytes((i,)) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev = None
    acc = 0
    nbits = 0
    bytepos = 0
    while True:
        while nbits < width:
            if bytepos >= len(data):
                raise ValueError("corrupt GIF: LZW stream truncated")
            acc |= data[bytepos] << nbits
            nbits += 8
            bytepos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = table[: clear + 2]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # deferred-clear streams stop adding
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF: LZW code out of range")
        out += entry
        if len(out) >= w * h:
            break  # first frame complete: a crafted stream with tiny
            # declared dims must not expand quadratically past the cap
        prev = entry
        # width grows once the NEXT code to assign needs one more bit
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < w * h:
        raise ValueError("corrupt GIF: pixel data short")
    idx = np.frombuffer(bytes(out[: w * h]), dtype=np.uint8)
    rows = idx.reshape(h, w)
    if interlaced:
        de = np.empty_like(rows)
        src = 0
        for first, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            for y in range(first, h, step):
                de[y] = rows[src]
                src += 1
        rows = de
    return pal[rows]  # (h, w, 3)


def encode_gif(indices, palette) -> bytes:
    """Pure-stdlib GIF89a encoder (fixture/write seam): (h, w) uint8
    palette-index array + (n, 3) palette -> single-frame GIF with a real
    variable-width LZW stream (dictionary growth and width bumps
    exercised; tiny fixtures never reach the 12-bit cap)."""
    import struct

    import numpy as np

    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = 1
    while (1 << n) < len(pal) or n < 2:
        n += 1
    table_n = 1 << n
    mcs = max(n, 2)
    clear = 1 << mcs
    end = clear + 1

    codes: list = [clear]
    dict_: dict = {bytes((i,)): i for i in range(clear)}
    next_code = clear + 2
    cur = b""
    for b in idx.reshape(-1).tobytes():
        nxt = cur + bytes((b,))
        if nxt in dict_:
            cur = nxt
            continue
        codes.append(dict_[cur])
        dict_[nxt] = next_code
        next_code += 1
        cur = bytes((b,))
        if next_code > 4095:
            # 12-bit code space exhausted: emit CLEAR immediately (no
            # deferred mode) so encoder and decoder tables stay in
            # lockstep — silently wrapping past 4095 corrupts streams
            codes.append(clear)
            dict_ = {bytes((i,)): i for i in range(clear)}
            next_code = clear + 2
    if cur:
        codes.append(dict_[cur])
    codes.append(end)

    # pack LSB-first, widening on an exact simulation of the DECODER's
    # table: it adds one entry per emitted code after the first
    # following a clear, and widens when the table reaches 2^width
    bits = bytearray()
    acc = 0
    nbits = 0
    width = mcs + 1
    table_size = clear + 2
    first_after_clear = True
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            width = mcs + 1
            table_size = clear + 2
            first_after_clear = True
        elif c == end:
            pass
        elif first_after_clear:
            first_after_clear = False
        else:
            table_size += 1
            if table_size == (1 << width) and width < 12:
                width += 1
    if nbits:
        bits.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (n - 1))  # global color table, 2^n entries
    out += b"\x00\x00"
    padded = np.zeros((table_n, 3), dtype=np.uint8)
    padded[: len(pal)] = pal
    out += padded.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(mcs)
    for i in range(0, len(bits), 255):
        block = bits[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def default_pixel_decoder(payload: bytes):
    """Magic-sniffing pixel decode: PNG and GIF are real pure-stdlib
    (decode_png_pixels / decode_gif_pixels); anything else raises
    through the injectable-seam contract."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(payload)
    raise NotImplementedError(
        "pixel decoding beyond PNG/GIF requires an image library not "
        "present in this environment; inject a real decoder"
    )


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ]
)


def image_pixel_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Optional[Callable[[bytes], object]] = None,
) -> DataFrame:
    """Per-image pixel statistics over binary payloads via Arrow-batched
    ``mapInPandas``: decode (default :func:`decode_png_pixels`), emit
    integer stats (sum/min/max over all samples) — drift-free values an
    independent engine can recompute. Undecodable payloads yield NULL
    stats instead of killing the task (extract_features' error
    contract); NotImplementedError still propagates, keeping the
    injectable-seam contract loud for formats stdlib can't decode."""
    import numpy as np  # executor-side import
    import pandas as pd

    impl = decoder or default_pixel_decoder

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((did, None, None, None, None, None, None))
                    continue
                try:
                    # shape handling stays INSIDE the try: an injected
                    # decoder may return a 2-D grayscale array (PIL
                    # does) or something unshapeable — the NULL-stats
                    # contract covers decode AND normalization failures
                    px = np.asarray(impl(bytes(payload)))
                    if px.ndim == 2:
                        px = px[:, :, None]
                    h, w, nch = px.shape
                    flat = px.reshape(-1)
                    rows.append(
                        (did, w, h, nch, int(flat.sum(dtype="int64")),
                         int(flat.min()), int(flat.max()))
                    )
                except NotImplementedError:
                    raise
                except Exception:
                    rows.append((did, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels",
                         "px_sum", "px_min", "px_max"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, PIXEL_STATS_SCHEMA
    )


def default_audio_decoder(payload: bytes) -> dict:
    """Pure-stdlib audio HEADER decoder: real sample rate / channels / bit
    depth / frame count / duration for RIFF/WAVE payloads via a fmt+data
    chunk walk (word-aligned chunk stepping; struct.unpack only — no audio
    library). Non-WAV payloads raise NotImplementedError: the same
    injectable-seam contract as default_image_decoder (swap in torchaudio/
    soundfile outside this container)."""
    import struct

    if (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        pos = 12
        fmt = None
        data_size = None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            (csize,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            body = payload[pos + 8:pos + 8 + csize]
            if cid == b"fmt " and len(body) >= 16:
                audio_fmt, ch, rate, _br, _ba, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                fmt = (audio_fmt, ch, rate, bits)
            elif cid == b"data":
                data_size = csize
            pos += 8 + csize + (csize & 1)  # RIFF chunks are word-aligned
        if fmt is None:
            raise ValueError("corrupt WAV: no fmt chunk")
        audio_fmt, ch, rate, bits = fmt
        out = {
            "format": "wav",
            "codec": int(audio_fmt),
            "channels": int(ch),
            "sample_rate": int(rate),
            "bits_per_sample": int(bits),
        }
        if data_size is not None and ch and bits and rate:
            frames = data_size // max(ch * (bits // 8), 1)
            out["n_frames"] = int(frames)
            out["duration_s"] = frames / rate
        return out
    raise NotImplementedError(
        "audio decoding beyond WAV headers requires an audio library not "
        "present in this environment; inject a real decoder"
    )


def decode_wav_samples(payload: bytes):
    """Pure-stdlib WAV SAMPLE decode: returns (samples, sample_rate)
    with ``samples`` an (n_frames, channels) numpy array — int16/int32
    for PCM 16/32, uint8 for PCM 8, float32 for IEEE-float (fmt 3).
    Walks the RIFF chunks like :func:`default_audio_decoder` (word-
    aligned stepping); compressed codecs (ADPCM, MP3-in-WAV) and
    non-WAV payloads raise through the injectable-seam contract."""
    import struct

    import numpy as np

    if not (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        raise NotImplementedError(
            "sample decoding beyond PCM/float WAV requires an audio "
            "library not present in this environment; inject a real "
            "decoder"
        )
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (csize,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    audio_fmt, ch, rate, _br, _ba, bits = fmt
    if ch == 0:
        raise ValueError("corrupt WAV: zero channels")
    if audio_fmt == 1 and bits == 16:
        dt = np.dtype("<i2")
    elif audio_fmt == 1 and bits == 32:
        dt = np.dtype("<i4")
    elif audio_fmt == 1 and bits == 8:
        dt = np.dtype("u1")
    elif audio_fmt == 3 and bits == 32:
        dt = np.dtype("<f4")
    else:
        raise NotImplementedError(
            f"WAV codec {audio_fmt}/{bits}-bit needs a real audio "
            "library; inject a decoder"
        )
    n = len(data) // (dt.itemsize * ch)
    samples = np.frombuffer(
        data, dtype=dt, count=n * ch
    ).reshape(n, ch)
    return samples, int(rate)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("s_sum", T.LongType()),
        T.StructField("s_min", T.LongType()),
        T.StructField("s_max", T.LongType()),
    ]
)


def audio_sample_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Optional[Callable[[bytes], object]] = None,
) -> DataFrame:
    """Per-clip sample statistics over binary WAV payloads via
    Arrow-batched ``mapInPandas`` (image_pixel_stats' audio sibling):
    integer sum/min/max over every sample of every channel — values an
    independent engine recomputes exactly. Float-WAV sums are truncated
    toward zero to keep the output integral; undecodable payloads NULL
    out, NotImplementedError propagates (seam contract)."""
    import pandas as pd  # executor-side import

    impl = decoder or decode_wav_samples

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((did, None, None, None, None, None, None))
                    continue
                try:
                    samples, rate = impl(bytes(payload))
                    n, ch = samples.shape
                    flat = samples.reshape(-1)
                    rows.append(
                        (did, rate, ch, n, int(flat.sum(dtype="int64")),
                         int(flat.min()), int(flat.max()))
                    )
                except NotImplementedError:
                    raise
                except Exception:
                    rows.append((did, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "channels", "n_frames",
                         "s_sum", "s_min", "s_max"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, AUDIO_STATS_SCHEMA
    )


def encode_wav(samples, sample_rate: int) -> bytes:
    """Pure-stdlib PCM-16 WAV encoder (fixture/write seam):
    (n_frames, channels) int16 array -> canonical RIFF/WAVE bytes."""
    import struct

    import numpy as np

    s = np.ascontiguousarray(samples, dtype="<i2")
    n, ch = s.shape
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def default_video_decoder(payload: bytes) -> dict:
    """Pure-stdlib video HEADER decoder: ISO BMFF (MP4/MOV) box walk —
    major brand from ftyp, timescale/duration from moov/mvhd (v0 and v1
    layouts). struct.unpack only; non-BMFF payloads raise
    NotImplementedError (the injectable-seam contract of the image/audio
    decoders — swap in pyav/ffprobe outside this container)."""
    import struct

    def boxes(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos:pos + 4])
            btype = buf[pos + 4:pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    return
                (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
                hdr = 16
            elif size == 0:  # box extends to end
                size = end - pos
            if size < hdr or pos + size > end:
                return
            yield btype, pos + hdr, pos + size
            pos += size

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise NotImplementedError(
            "video decoding beyond ISO-BMFF (MP4/MOV) headers requires a "
            "video library not present in this environment; inject a real "
            "decoder"
        )
    out = {"format": "mp4", "brand": payload[8:12].decode("ascii", "replace")}
    for btype, body_s, body_e in boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ctype, c_s, c_e in boxes(payload, body_s, body_e):
            if ctype != b"mvhd" or c_e - c_s < 4:
                continue
            version = payload[c_s]
            if version == 1 and c_e - c_s >= 28:
                timescale, duration = struct.unpack(
                    ">IQ", payload[c_s + 20:c_s + 32]
                )
            elif c_e - c_s >= 20:
                timescale, duration = struct.unpack(
                    ">II", payload[c_s + 12:c_s + 20]
                )
            else:
                continue
            out["timescale"] = int(timescale)
            if timescale:
                out["duration_s"] = duration / timescale
            return out
    return out  # valid BMFF without moov (e.g. fragmented init segment)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 8,
    decoder: Optional[Callable[[bytes], object]] = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``: the canonical shape for CPU-heavy per-item media work
    (decode, resize, embed). With no real decoder available the default
    "feature" is a deterministic byte-histogram projection — the plumbing
    (schema, batching, partition preservation) is what's real here.

    ``decoder`` is invoked per payload when provided; its failure marks the
    row's feature null rather than killing the task.
    """
    import numpy as np  # executor-side import
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats = []
            for payload in pdf[payload_col]:
                if payload is None:
                    feats.append(None)
                    continue
                if decoder is not None:
                    try:
                        decoder(bytes(payload))
                    except NotImplementedError:
                        raise
                    except Exception:
                        feats.append(None)
                        continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = float(hist.sum()) or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": pdf[payload_col].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURE_SCHEMA)


def png_nearest_resize(payload: bytes, w: int, h: int) -> bytes:
    """REAL image resize for PNG/GIF payloads, pure stdlib end-to-end:
    decode pixels (:func:`default_pixel_decoder`), nearest-neighbour
    resample to (h, w) with numpy index maps, re-encode as PNG (GIF
    inputs come back as PNG — the palette does not survive resampling).
    Plug this into :func:`resize_images` as ``resizer=`` for decoded-
    pixel semantics instead of the byte-level stand-in; 16-bit inputs
    are narrowed to 8 bits (high byte) for the depth-8 encoder."""
    import numpy as np

    if w < 1 or h < 1:
        raise ValueError(f"target dimensions must be >= 1, got {w}x{h}")
    px = default_pixel_decoder(payload)
    if px.dtype != np.uint8:
        px = (px >> 8).astype(np.uint8)
    sh, sw = px.shape[:2]
    ys = (np.arange(h) * sh) // h
    xs = (np.arange(w) * sw) // w
    return encode_png(px[ys][:, xs])


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    resizer: Optional[Callable[[bytes, int, int], bytes]] = None,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads via ``mapInPandas``
    (the brief's decode -> resize -> re-encode step). ``resizer(payload,
    w, h) -> bytes`` is the injectable seam for a real implementation
    (PIL: decode, ``Image.resize((w, h))``, re-encode); the default is a
    DETERMINISTIC byte-level stand-in — magic prefix preserved, body
    stride-resampled to exactly w*h bytes — so the pipeline (schema,
    batching, output sizing) runs and is testable without media libs.
    A failing resizer nulls the row's payload instead of killing the task
    (extract_features' error contract)."""
    import numpy as np  # executor-side import
    import pandas as pd

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        prefix_len = 4 if payload[:4] in _MAGIC else next(
            (len(p) for p in _MAGIC if payload.startswith(p)), 0
        )
        prefix, body = payload[:prefix_len], payload[prefix_len:]
        target = w * h
        if not body:
            return prefix + b"\x00" * target
        arr = np.frombuffer(body, dtype=np.uint8)
        idx = (np.arange(target) * len(arr)) // target
        return prefix + arr[idx].tobytes()

    impl = resizer or _fake_resize

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for payload in pdf[payload_col]:
                if payload is None:
                    out.append(None)
                    continue
                try:
                    out.append(impl(bytes(payload), width, height))
                except NotImplementedError:
                    raise
                except Exception:
                    out.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
    frame_bytes: int = 16,
) -> DataFrame:
    """Frame sampling plumbing: slice a (video) payload into fixed-stride
    chunks as an array<binary> column — JVM-side substring arithmetic; a
    real codec would replace the slicing, not the shape. One output row per
    payload with the sampled 'frames'."""
    n_frames = F.greatest(
        (F.length(payload_col) / every_n_bytes).cast("int"), F.lit(1)
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substring(
            F.col(payload_col), (i * every_n_bytes + 1).cast("int"), frame_bytes
        ),
    )
    return df.select(
        F.col(id_col), frames.alias("frames"), n_frames.alias("n_frames")
    )
