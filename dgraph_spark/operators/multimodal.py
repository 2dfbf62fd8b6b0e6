"""Multimodal columns: images/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels are REAL pure-numpy decoders: netpbm P5/P6,
uncompressed BMP, PCM16 WAV, PNG (all filter types, palette, 16-bit,
Adam7), baseline JPEG (jpegcodec.py: Huffman + IDCT + chroma
upsampling + restart markers), GIF (LZW + interlace), TIFF (strips,
PackBits, both byte orders), and native FLAC (flaccodec.py) — the
formats a real crawl actually contains. Codecs beyond that scope
(progressive JPEG, TIFF-LZW, H.264, MP3) raise NotImplementedError
with the detected magic unless pillow is installed (_pil_decode
lights up), and a production deployment plugs PIL/libvips/pyav into
the same (media_id, media) -> features contract.

At 100 TB the binary column dominates I/O; the operators below only
touch (media_id, media) so parquet column pruning keeps unrelated scans
cheap, and mapInPandas streams Arrow batches without materializing a
partition in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dgraph_spark.operators.dedup import compute_spread

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("media", BinaryType()),       # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("meta", StringType()),        # JSON metadata
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


# ------------------------------------------------------------ image decoders
def decode_ppm(data: bytes) -> np.ndarray:
    """netpbm binary decode (P6 -> HxWx3 uint8, P5 -> HxW uint8).
    Whitespace/comment-tolerant header parse, then one zero-copy
    numpy frombuffer over the raster."""
    if data[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = fields[0], fields[1], fields[2]
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if data[:2] == b"P6" else 1
    n = width * height * channels
    raster = np.frombuffer(data, dtype=np.uint8, count=n, offset=i)
    if channels == 3:
        return raster.reshape(height, width, 3)
    return raster.reshape(height, width)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 24/32-bit BMP decode -> HxWx3 uint8 (RGB).
    Handles the bottom-up row order and 4-byte row padding."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = int.from_bytes(data[10:14], "little")
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP compression={compression} bpp={bpp} not supported")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * height, offset=pixel_off
    ).reshape(height, stride)
    px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """PCM16 WAV decode -> (sample_rate, channels, samples int16 array).
    Walks RIFF chunks; only format tag 1 (PCM), 16-bit."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i = 12
    rate = channels = None
    samples = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            bits = int.from_bytes(body[14:16], "little")
            if tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format tag={tag} bits={bits} not supported")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, channels, samples


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering (PNG spec §4.5.4) over one image or
    Adam7 sub-image: ``raw`` is h rows of (filter byte + stride bytes).
    None/Up are vectorized, Sub is a per-byte-lane cumsum (mod 256
    distributes over the addition chain), Average/Paeth are per-pixel
    by definition (each output feeds the next input). Returns (h,
    stride) int64 in [0, 255]."""
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    recon = np.zeros((h, stride), dtype=np.int64)
    zero = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        prior = recon[y - 1] if y else zero
        if f == 0:
            cur = line
        elif f == 1:   # Sub: cumsum per byte lane
            cur = (np.cumsum(line.reshape(stride // bpp, bpp), axis=0)
                   .reshape(stride))
        elif f == 2:   # Up
            cur = line + prior
        elif f in (3, 4):  # Average / Paeth: sequential along x
            cur = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0        # left
                b = prior[x]                               # up
                if f == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prior[x - bpp] if x >= bpp else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) \
                        else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f}")
        recon[y] = cur & 0xFF
    return recon


def decode_png(data: bytes) -> np.ndarray:
    """Pure-stdlib baseline PNG decoder: chunk walk with CRC checks,
    one zlib inflate, per-scanline unfilter (PNG spec §4.5.4 / RFC
    2083). Supports bit depths 8 and 16 (16-bit keeps the high byte —
    the features downstream are 8-bit statistics), color types 0
    (gray), 2 (RGB), 3 (palette, 8-bit indices via PLTE lookup),
    4 (gray+alpha), 6 (RGBA), and Adam7 interlacing (7 sequential
    sub-images, each filtered independently); sub-byte depths are loud
    rejections (plug PIL for those). Filtering is undone by
    _png_unfilter. Returns HxW (gray) or HxWxC uint8."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i = 8
    idat = bytearray()
    w = h = depth = ct = interlace = None
    plte = None
    while i + 12 <= len(data):
        ln = int.from_bytes(data[i:i + 4], "big")
        typ = data[i + 4:i + 8]
        body = data[i + 8:i + 8 + ln]
        crc = int.from_bytes(data[i + 8 + ln:i + 12 + ln], "big")
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ct, interlace = body[8], body[9], body[12]
        elif typ == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        i += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ct)
    if channels is None:
        raise NotImplementedError(f"PNG color type {ct} — plug PIL")
    if ct == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if depth not in (8, 16) or (depth == 16 and ct == 3):
        raise NotImplementedError(
            f"PNG bit depth {depth} (ct {ct}) — only 8/16-bit "
            "non-palette supported in-container")
    if w * h > (1 << 28) or w == 0 or h == 0:
        raise ValueError(
            f"PNG dimensions {w}x{h} out of sane range "
            "(corrupt header or decompression bomb)")
    sb = depth // 8                    # bytes per sample
    bpp = channels * sb                # filters act on BYTES (§4.5.4)
    # inflate capped by the declared raster size (+ per-pass filter
    # bytes; Adam7 has <= h+7 extra rows) so a zlib bomb can't exceed
    # what the dimensions justify
    cap = w * h * bpp + 2 * (h + 8)
    raw = zlib.decompressobj().decompress(bytes(idat), cap + 1)
    if len(raw) > cap:
        raise ValueError("PNG inflated data exceeds declared dimensions")
    if not interlace:
        stride = w * channels * sb
        if len(raw) != h * (1 + stride):
            raise ValueError(
                f"PNG data length {len(raw)} != {h}x(1+{stride})")
        recon = _png_unfilter(raw, h, stride, bpp)
        samples = recon.reshape(h, w, channels, sb)
    elif interlace == 1:               # Adam7: 7 sub-images, sequential
        samples = np.zeros((h, w, channels, sb), dtype=np.int64)
        off = 0
        for x0, dx, y0, dy in ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8),
                               (2, 4, 0, 4), (0, 2, 2, 4), (1, 2, 0, 2),
                               (0, 1, 1, 2)):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * channels * sb
            sub = raw[off:off + ph * (1 + stride)]
            off += ph * (1 + stride)
            if len(sub) != ph * (1 + stride):
                raise ValueError("PNG interlaced data truncated")
            recon = _png_unfilter(sub, ph, stride, bpp)
            samples[y0::dy, x0::dx] = recon.reshape(ph, pw, channels, sb)
        if off != len(raw):
            raise ValueError("PNG interlaced data length mismatch")
    else:
        raise NotImplementedError(f"PNG interlace method {interlace}")
    # 16-bit big-endian samples: keep the high byte (features are
    # 8-bit statistics); for 8-bit the byte axis has length 1
    img = samples[..., 0].astype(np.uint8)
    if ct == 3:  # palette indices -> RGB lookup
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx]
    return img[:, :, 0] if channels == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0 scanlines, one IDAT) for fixture
    and media-table synthesis; output round-trips through decode_png
    and any spec-conforming decoder."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w, channels = img.shape[0], img.shape[1], 1
        flat = img.reshape(h, w)
    else:
        h, w, channels = img.shape
        flat = img.reshape(h, w * channels)
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (len(body).to_bytes(4, "big") + typ + body
                + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes((8, ct, 0, 0, 0)))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def _packbits(data: bytes, expected: int) -> bytes:
    """Apple PackBits decompression (TIFF spec §9): n in [0,127] →
    copy n+1 literal bytes; n in [-127,-1] → repeat next byte 1-n
    times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i:i + 1] * (257 - n)
            i += 1
    if len(out) < expected:
        raise ValueError("PackBits stream truncated")
    return bytes(out[:expected])


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF decoder (spec 6.0): both byte orders, first IFD,
    8-bit chunky gray (photometric 0/1, white-is-zero inverted) or
    RGB(A), strip layout, compression none (1) or PackBits (32773).
    LZW/JPEG-in-TIFF, tiles, and planar layout raise loudly."""
    if data[:4] == b"II*\x00":
        bo = "little"
    elif data[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload")

    def u(b: bytes) -> int:
        return int.from_bytes(b, bo)

    _TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    ifd = u(data[4:8])
    n = u(data[ifd:ifd + 2])
    tags: dict[int, list[int]] = {}
    for k in range(n):
        e = ifd + 2 + 12 * k
        tag = u(data[e:e + 2])
        typ = u(data[e + 2:e + 4])
        cnt = u(data[e + 4:e + 8])
        size = _TYPE_SIZE.get(typ, 1)
        total = size * cnt
        off = e + 8 if total <= 4 else u(data[e + 8:e + 12])
        # a corrupt count can claim 4G values — bound by the file
        if total > 4 and off + total > len(data):
            raise ValueError(
                f"TIFF tag {tag} value array overruns the file "
                f"({cnt} x {size} bytes at {off})")
        vals = [u(data[off + j * size:off + (j + 1) * size])
                for j in range(cnt if typ != 5 else 0)]
        tags[tag] = vals
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}")
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    rps = tags.get(278, [h])[0] or h
    planar = tags.get(284, [1])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} — plug PIL")
    if planar != 1:
        raise NotImplementedError("TIFF planar layout — plug PIL")
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (LZW/JPEG/deflate) — plug PIL")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photo} — plug PIL")
    raster = bytearray()
    rows_left = h
    for off, cnt in zip(offsets, counts):
        rows = min(rps, rows_left)
        rows_left -= rows
        strip = data[off:off + cnt]
        if comp == 32773:
            strip = _packbits(strip, rows * w * spp)
        raster += strip[:rows * w * spp]
    if len(raster) != h * w * spp:
        raise ValueError("TIFF strip data does not cover the raster")
    img = np.frombuffer(bytes(raster), np.uint8).reshape(h, w, spp)
    if photo == 0:                    # white-is-zero: invert
        img = 255 - img
    if spp == 1:
        return img[:, :, 0]
    return img[:, :, :3] if spp >= 3 else img[:, :, 0]


def encode_tiff(img: np.ndarray, packbits: bool = False) -> bytes:
    """Minimal little-endian TIFF encoder (one strip, chunky, 8-bit
    gray or RGB; optional PackBits) for fixtures and media tables."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    raw = img.tobytes()
    if packbits:
        out = bytearray()
        i = 0
        while i < len(raw):          # naive: runs of equal bytes, else literals
            j = i
            while j + 1 < len(raw) and raw[j + 1] == raw[i] and j - i < 127:
                j += 1
            if j > i:
                out += bytes([257 - (j - i + 1), raw[i]])
                i = j + 1
            else:
                k = i
                while (k + 1 < len(raw) and k - i < 127
                       and not (k + 2 < len(raw)
                                and raw[k + 1] == raw[k + 2] == raw[k])):
                    k += 1
                out += bytes([k - i]) + raw[i:k + 1]
                i = k + 1
        raw = bytes(out)
    strip_off = 8
    ifd_off = strip_off + len(raw)
    if ifd_off % 2:
        raw += b"\x00"
        ifd_off += 1
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
        (259, 3, 1, 32773 if packbits else 1),
        (262, 3, 1, 1 if spp == 1 else 2),
        (273, 4, 1, strip_off), (277, 3, 1, spp), (278, 3, 1, h),
        (279, 4, 1, len(raw)),
    ]
    if spp == 3:                      # BitsPerSample needs 3 SHORTs
        bps_off = ifd_off + 2 + 12 * len(entries) + 4
        entries[2] = (258, 3, 3, bps_off)
    ifd = len(entries).to_bytes(2, "little")
    for tag, typ, cnt, val in entries:
        ifd += (tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
                + cnt.to_bytes(4, "little") + val.to_bytes(4, "little"))
    ifd += (0).to_bytes(4, "little")  # no next IFD
    extra = (8).to_bytes(2, "little") * 3 if spp == 3 else b""
    return (b"II*\x00" + ifd_off.to_bytes(4, "little") + raw + ifd + extra)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a decoder (first frame): logical screen descriptor,
    global/local color tables, LZW decompression (GIF spec appendix F:
    variable-width codes LSB-first, clear/EOI codes), interlace
    de-scrambling. Returns HxWx3 uint8 RGB of the first image block;
    transparency collapses onto the palette color (features here are
    RGB statistics, not compositing)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, i).reshape(-1, 3)
        i += n * 3
    while i < len(data):
        b = data[i]
        if b == 0x21:                 # extension: label + sub-blocks
            i += 2
            while data[i]:
                i += 1 + data[i]
            i += 1
        elif b == 0x3B:               # trailer
            break
        elif b == 0x2C:               # image descriptor
            w = int.from_bytes(data[i + 5:i + 7], "little")
            h = int.from_bytes(data[i + 7:i + 9], "little")
            if w * h > (1 << 28) or w == 0 or h == 0:
                raise ValueError(
                    f"GIF dimensions {w}x{h} out of sane range "
                    "(corrupt header or decompression bomb)")
            iflags = data[i + 9]
            i += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data, np.uint8, n * 3, i).reshape(-1, 3)
                i += n * 3
            if ct is None:
                raise ValueError("GIF image without a color table")
            min_code = data[i]
            i += 1
            lzw = bytearray()
            while data[i]:
                lzw += data[i + 1:i + 1 + data[i]]
                i += 1 + data[i]
            i += 1
            idx = _lzw_decode(bytes(lzw), min_code, w * h)
            if iflags & 0x40:         # interlaced: 4-pass row order
                rows = np.asarray(idx, dtype=np.int64).reshape(h, w)
                order = np.concatenate([np.arange(0, h, 8),
                                        np.arange(4, h, 8),
                                        np.arange(2, h, 4),
                                        np.arange(1, h, 2)])
                out = np.empty_like(rows)
                out[order] = rows
                rows = out
            else:
                rows = np.asarray(idx, dtype=np.int64).reshape(h, w)
            if int(rows.max(initial=0)) >= len(ct):
                raise ValueError("GIF color index out of range")
            del sw, sh
            return ct[rows]
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X} at {i}")
    raise ValueError("GIF contains no image block")


def _lzw_decode(data: bytes, min_code: int, expected: int) -> list[int]:
    """GIF-variant LZW: codes are LSB-first across bytes; the table
    holds 2^min_code roots + CLEAR + EOI and grows to 12-bit codes."""
    clear = 1 << min_code
    eoi = clear + 1
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return eoi                # truncated stream: stop
        byte, bit = divmod(bitpos, 8)
        v = int.from_bytes(data[byte:byte + 3], "little") >> bit
        bitpos += width
        return v & ((1 << width) - 1)

    out: list[int] = []
    table: list[list[int]] = []
    width = min_code + 1
    prev: list[int] | None = None
    while len(out) < expected:
        code = read_code(width)
        if code == clear:
            table = [[k] for k in range(clear)] + [[], []]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW stream starts with invalid code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + [entry[0]])
        elif code == len(table):
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out.extend(entry)
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out[:expected]


def encode_gif(img: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal GIF89a encoder for fixtures: img is HxW palette
    indices, palette is Nx3 uint8 (N padded to a power of two). Emits
    valid LZW in pass-through mode (each pixel as its own root code
    with a CLEAR before the table would overflow) — decoders, including
    decode_gif, handle this standard degenerate stream."""
    h, w = img.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) & 7), 0, 0])
    out += pal.tobytes()
    out += b"\x2C" + b"\x00" * 4 + w.to_bytes(2, "little") \
        + h.to_bytes(2, "little") + b"\x00"
    min_code = max(2, bits)
    clear = 1 << min_code
    eoi = clear + 1
    # pack LSB-first while SIMULATING the decoder's table growth (no
    # entry is added for the first data code after a CLEAR; one entry
    # per data code after that; width grows at table_len == 2^width)
    acc = 0
    nbits = 0
    buf = bytearray()

    def emit(c: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    table_len = clear + 2
    fresh = True
    emit(clear, width)
    for px in img.reshape(-1):
        emit(int(px), width)
        if fresh:
            fresh = False
        else:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
        if table_len >= 4094:         # re-CLEAR before the 12-bit cap
            emit(clear, width)
            width = min_code + 1
            table_len = clear + 2
            fresh = True
    emit(eoi, width)
    if nbits:
        buf.append(acc & 0xFF)
    out += bytes([min_code])
    for j in range(0, len(buf), 255):
        blk = buf[j:j + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3B"
    return bytes(out)


_MAGICS = {
    b"\xff\xd8\xff": "jpeg", b"GIF8": "gif",
    b"RIFF": "riff", b"\x00\x00\x00": "mp4?",
}


def _pil_decode(data: bytes):
    """Optional compressed-codec path: when pillow is importable,
    decode JPEG/GIF/anything PIL knows into the same ndarray contract;
    otherwise None (caller raises the loud in-container rejection).
    This sandbox ships no pillow (verified round 10), so the pure-numpy
    decoders above remain the tested path; a production image crawl
    installs pillow and this branch lights up with no code change."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    img = Image.open(io.BytesIO(data))
    if img.mode not in ("L", "LA", "RGB", "RGBA"):
        img = img.convert("RGB")
    return np.asarray(img)


def _well_typed(decoder, data: bytes, kind: str):
    """Run a decoder with the error contract a 100 TB crawl needs:
    corrupt bytes surface as ValueError (truncated streams otherwise
    leak IndexError from slicing, zlib.error from inflate, etc. —
    exception types the skip/raise policy below must classify)."""
    import zlib

    try:
        return decoder(data)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, OverflowError, zlib.error,
            MemoryError) as e:
        raise ValueError(
            f"corrupt {kind} payload: {type(e).__name__}: {e}") from e


def _decode_image_bytes(data: bytes):
    """Dispatch on magic bytes to a real decoder; returns
    (width, height, mean_r, mean_g, mean_b, 16-bin luma histogram).
    Raises ValueError for corrupt payloads, NotImplementedError for
    recognized-but-unsupported codecs."""
    if not data:
        raise ValueError("empty media payload")
    if data[:2] in (b"P6", b"P5"):
        img = _well_typed(decode_ppm, data, "netpbm")
    elif data[:2] == b"BM":
        img = _well_typed(decode_bmp, data, "bmp")
    elif data[:8] == _PNG_SIG:
        img = _well_typed(decode_png, data, "png")
    elif data[:3] == b"\xff\xd8\xff":
        from dgraph_spark.operators.jpegcodec import decode_jpeg
        img = _well_typed(decode_jpeg, data, "jpeg")
    elif data[:4] == b"GIF8":
        img = _well_typed(decode_gif, data, "gif")
    elif data[:4] in (b"II*\x00", b"MM\x00*"):
        img = _well_typed(decode_tiff, data, "tiff")
    else:
        img = _pil_decode(data)
        if img is None:
            kind = next((k for m, k in _MAGICS.items()
                         if data.startswith(m)), "unknown")
            raise NotImplementedError(
                f"no in-container decoder for {kind!r} payloads — "
                "install pillow (enables the _pil_decode branch) or "
                "plug libvips into _decode_image_bytes")
    if img.ndim == 2:  # grayscale: replicate into channels
        img = np.stack([img] * 3, axis=-1)
    elif img.shape[-1] == 2:  # gray+alpha: replicate luma, drop alpha
        img = np.stack([img[..., 0]] * 3, axis=-1)
    elif img.shape[-1] == 4:  # RGBA: drop alpha
        img = img[..., :3]
    h, w = img.shape[0], img.shape[1]
    means = img.reshape(-1, 3).mean(axis=0)
    luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).astype(np.uint8)
    hist = np.bincount(luma.reshape(-1) >> 4, minlength=16).astype(np.float64)
    hist /= hist.sum() or 1.0
    return (w, h, float(means[0]), float(means[1]), float(means[2]),
            [float(x) for x in hist])


def extract_image_features(media: DataFrame, batch_hint: int = 0,
                           on_error: str = "raise") -> DataFrame:
    """media(media_id, media, ...) -> (media_id, width, height, mean_r/g/b,
    feature). mapInPandas streams Arrow record batches; each batch decodes
    independently (CPU-bound — at scale, repartition so one task's batches
    fit executor memory alongside the decode workspace).

    on_error: 'raise' (default — correctness/oracle mode: any bad blob
    fails the job) or 'skip' (crawl mode: corrupt/unsupported payloads
    are dropped; a 100 TB crawl ALWAYS contains some, and one bad file
    must not kill a 10k-task job — count skips by anti-joining the
    output against the input)."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', "
                         f"got {on_error!r}")
    cols = media.select("media_id", "media")
    if batch_hint:
        cols = cols.repartition(batch_hint)
    else:
        # decode is CPU-bound Python; a one-file media table otherwise
        # decodes on a single task (round 10; no-op at crawl scale)
        cols = compute_spread(cols)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "mean_r": [],
                   "mean_g": [], "mean_b": [], "feature": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                try:
                    w, h, mr, mg, mb, feat = _decode_image_bytes(bytes(blob))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(mr)
                out["mean_g"].append(mg)
                out["mean_b"].append(mb)
                out["feature"].append(feat)
            if out["media_id"]:   # empty frame breaks Arrow list cols
                yield pd.DataFrame(out)

    return cols.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Chunk sampling over the binary column: one sample per
    ``every_n_bytes`` window of the payload (for real video containers,
    pyav/ffmpeg keyframe extraction plugs into the same
    (media_id, frame_no, frame) contract)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                data = bytes(blob)
                for i in range(0, max(len(data), 1), every_n_bytes):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i // every_n_bytes)
                    out["frame"].append(data[i : i + every_n_bytes])
            yield pd.DataFrame(out)

    return compute_spread(media.select("media_id", "media")).mapInPandas(
        sample, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
    ]
)


def _decode_audio_bytes(data: bytes):
    """Dispatch on magic bytes: RIFF/WAVE -> decode_wav, native FLAC ->
    flaccodec.decode_flac (lossless, so the same closed-form oracle
    holds for either container of the same samples). Same error
    contract as _decode_image_bytes."""
    if data[:4] == b"RIFF":
        return _well_typed(decode_wav, data, "wav")
    if data[:4] == b"fLaC":
        from dgraph_spark.operators.flaccodec import decode_flac
        return _well_typed(decode_flac, data, "flac")
    raise NotImplementedError(
        "no in-container audio decoder for this payload — WAV and "
        "native FLAC are supported; plug soundfile/libsndfile for "
        "MP3/Ogg/AAC")


def extract_audio_features(media: DataFrame,
                           on_error: str = "raise") -> DataFrame:
    """media(media_id, media) of PCM16 WAV or native FLAC payloads ->
    (media_id, sample_rate, channels, n_samples, rms). on_error as in
    extract_image_features ('raise' | 'skip')."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', "
                         f"got {on_error!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "channels": [],
                   "n_samples": [], "rms": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                try:
                    rate, ch, samples = _decode_audio_bytes(bytes(blob))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["n_samples"].append(len(samples))
                out["rms"].append(
                    float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                    if len(samples) else 0.0)
            if out["media_id"]:
                yield pd.DataFrame(out)

    return compute_spread(media.select("media_id", "media")).mapInPandas(
        decode, AUDIO_FEATURES_SCHEMA)


VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_tracks", LongType()),
    ]
)


def parse_mp4_meta(data: bytes) -> tuple[float, int, int, int]:
    """ISO-BMFF (MP4/MOV) metadata walk: box tree -> (duration seconds
    from mvhd, width/height from the first video tkhd, track count).
    Handles 32-bit and 64-bit box sizes and mvhd/tkhd versions 0/1.
    Codec payloads are NOT decoded (H.264 stays opaque — frame-level
    work plugs pyav into sample_frames); this parses the container the
    way a 100 TB crawl needs for routing/filtering."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")

    def walk(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(data[i:i + 4], "big")
            typ = data[i + 4:i + 8]
            body = i + 8
            if size == 1:             # 64-bit largesize
                size = int.from_bytes(data[i + 8:i + 16], "big")
                body = i + 16
            elif size == 0:           # to end of enclosing box
                size = hi - i
            if size < 8 or i + size > hi:
                raise ValueError(f"mp4 box {typ!r} overruns its parent")
            yield typ, body, i + size
            i += size

    duration = 0.0
    width = height = 0
    n_tracks = 0
    for typ, b, e in walk(0, len(data)):
        if typ != b"moov":
            continue
        for t2, b2, e2 in walk(b, e):
            if t2 == b"mvhd":
                ver = data[b2]
                if ver == 1:
                    scale = int.from_bytes(data[b2 + 20:b2 + 24], "big")
                    dur = int.from_bytes(data[b2 + 24:b2 + 32], "big")
                else:
                    scale = int.from_bytes(data[b2 + 12:b2 + 16], "big")
                    dur = int.from_bytes(data[b2 + 16:b2 + 20], "big")
                duration = dur / scale if scale else 0.0
            elif t2 == b"trak":
                n_tracks += 1
                for t3, b3, e3 in walk(b2, e2):
                    if t3 == b"tkhd" and not width:
                        # width/height: last 8 bytes, 16.16 fixed point
                        w = int.from_bytes(data[e3 - 8:e3 - 4], "big")
                        h = int.from_bytes(data[e3 - 4:e3], "big")
                        width, height = w >> 16, h >> 16
    return duration, width, height, n_tracks


def extract_video_metadata(media: DataFrame) -> DataFrame:
    """media(media_id, media) of MP4/MOV payloads ->
    (media_id, duration_s, width, height, n_tracks)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "duration_s": [], "width": [],
                   "height": [], "n_tracks": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                dur, w, h, nt = parse_mp4_meta(bytes(blob))
                out["media_id"].append(mid)
                out["duration_s"].append(dur)
                out["width"].append(w)
                out["height"].append(h)
                out["n_tracks"].append(nt)
            yield pd.DataFrame(out)

    return compute_spread(media.select("media_id", "media")).mapInPandas(
        parse, VIDEO_META_SCHEMA)


def _mp4_box(typ: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + typ + body


def build_mp4(duration_s: float, width: int, height: int,
              timescale: int = 1000, n_tracks: int = 1) -> bytes:
    """Minimal valid ISO-BMFF fixture: ftyp + moov(mvhd + trak(tkhd)
    per track) + an empty mdat. Spec-shaped enough that any container
    parser recovers the same metadata."""
    dur = int(round(duration_s * timescale))
    mvhd = (b"\x00" + b"\x00" * 3 + b"\x00" * 8
            + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big")
            + b"\x00" * 80)
    traks = b""
    for k in range(n_tracks):
        tkhd = (b"\x00" + b"\x00" * 3 + b"\x00" * 8
                + (k + 1).to_bytes(4, "big") + b"\x00" * 4
                + dur.to_bytes(4, "big") + b"\x00" * 52
                + (width << 16).to_bytes(4, "big")
                + (height << 16).to_bytes(4, "big"))
        traks += _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd))
    return (_mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
            + _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + traks)
            + _mp4_box(b"mdat", b""))


def video_table_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL (container-valid) MP4 per document: duration
    (n_chars % 600) / 10.0 seconds at timescale 1000, dimensions
    keyed to the id (width 16*(id%90+1), height 16*(id%50+1)), one
    track — all closed-form for the SQL twin."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "media": [], "mime": [],
                   "meta": []}
            for did, nch in zip(pdf[id_col], pdf["n_chars"]):
                d = int(did)
                out["media_id"].append(d)
                out["kind"].append("video")
                out["media"].append(build_mp4(
                    (int(nch) % 600) / 10.0,
                    16 * (d % 90 + 1), 16 * (d % 50 + 1)))
                out["mime"].append("video/mp4")
                out["meta"].append('{"synthetic": true}')
            yield pd.DataFrame(out)

    return compute_spread(
        docs.select(F.col(id_col), F.col("n_chars"))).mapInPandas(
        build, MEDIA_SCHEMA)


def media_table_from_docs(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL P6 PPM image per document: width 32, height
    (n_chars % 97) + 1, solid color (id%256, 7id%256, 13id%256). The
    decoder must parse the header and de-interleave RGB correctly to
    recover those channel means — giving the oracle a closed-form SQL
    twin over real decoded pixels."""
    W = 32

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "media": [], "mime": [],
                   "meta": []}
            for did, nch in zip(pdf[id_col], pdf["n_chars"]):
                h = int(nch) % 97 + 1
                rgb = bytes((int(did) % 256, int(did) * 7 % 256,
                             int(did) * 13 % 256))
                payload = (f"P6\n{W} {h}\n255\n".encode()
                           + rgb * (W * h))
                out["media_id"].append(int(did))
                out["kind"].append("image")
                out["media"].append(payload)
                out["mime"].append("image/x-portable-pixmap")
                out["meta"].append('{"synthetic": true}')
            yield pd.DataFrame(out)

    src = compute_spread(docs.select(F.col(id_col), F.col("n_chars")))
    return src.mapInPandas(build, MEDIA_SCHEMA)


def png_table_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL (zlib-compressed, CRC'd) PNG per document with
    the same closed-form pixel statistics as media_table_from_docs's
    PPMs: width 32, height (n_chars % 97) + 1, solid color
    (id%256, 7id%256, 13id%256). decode_png must walk the chunks,
    inflate, and unfilter to recover the channel means — the SQL twin
    is shared with the PPM entry."""
    W = 32

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "media": [], "mime": [],
                   "meta": []}
            for did, nch in zip(pdf[id_col], pdf["n_chars"]):
                h = int(nch) % 97 + 1
                rgb = (int(did) % 256, int(did) * 7 % 256,
                       int(did) * 13 % 256)
                img = np.tile(np.array(rgb, dtype=np.uint8), (h, W, 1))
                out["media_id"].append(int(did))
                out["kind"].append("image")
                out["media"].append(encode_png(img))
                out["mime"].append("image/png")
                out["meta"].append('{"synthetic": true}')
            yield pd.DataFrame(out)

    return compute_spread(
        docs.select(F.col(id_col), F.col("n_chars"))).mapInPandas(
        build, MEDIA_SCHEMA)


def tiff_table_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL PackBits-compressed TIFF per document with the
    same closed-form pixel statistics as the PPM/PNG tables: width 32,
    height (n_chars % 97) + 1, solid color (id%256, 7id%256, 13id%256).
    decode_tiff must walk the IFD, decompress the strip, and
    de-interleave to recover the channel means — the SQL twin is shared
    with the PPM entry."""
    W = 32

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "media": [], "mime": [],
                   "meta": []}
            for did, nch in zip(pdf[id_col], pdf["n_chars"]):
                h = int(nch) % 97 + 1
                rgb = (int(did) % 256, int(did) * 7 % 256,
                       int(did) * 13 % 256)
                img = np.tile(np.array(rgb, dtype=np.uint8), (h, W, 1))
                out["media_id"].append(int(did))
                out["kind"].append("image")
                out["media"].append(encode_tiff(img, packbits=True))
                out["mime"].append("image/tiff")
                out["meta"].append('{"synthetic": true}')
            yield pd.DataFrame(out)

    return compute_spread(
        docs.select(F.col(id_col), F.col("n_chars"))).mapInPandas(
        build, MEDIA_SCHEMA)


def gif_table_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL GIF89a per document: width 32, height
    (n_chars % 97) + 1, a two-color checkerboard of palette entries
    c1 = (id%256, 7id%256, 13id%256) and c2 = (3id%256, 5id%256,
    11id%256). decode_gif must LZW-decompress and palette-look-up to
    recover the channel means; width 32 is even, so every row is half
    c1 / half c2 and the means are (c1+c2)/2 exactly — closed-form for
    the SQL twin."""
    W = 32

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "media": [], "mime": [],
                   "meta": []}
            for did, nch in zip(pdf[id_col], pdf["n_chars"]):
                h = int(nch) % 97 + 1
                d = int(did)
                pal = np.array(
                    [[d % 256, d * 7 % 256, d * 13 % 256],
                     [d * 3 % 256, d * 5 % 256, d * 11 % 256]],
                    dtype=np.uint8)
                yy, xx = np.mgrid[0:h, 0:W]
                idx = ((yy + xx) % 2).astype(np.uint8)
                out["media_id"].append(d)
                out["kind"].append("image")
                out["media"].append(encode_gif(idx, pal))
                out["mime"].append("image/gif")
                out["meta"].append('{"synthetic": true}')
            yield pd.DataFrame(out)

    return compute_spread(
        docs.select(F.col(id_col), F.col("n_chars"))).mapInPandas(
        build, MEDIA_SCHEMA)


def flac_table_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL native-FLAC stream per document with the SAME
    sample content as audio_table_from_docs's WAVs (8 kHz mono square
    wave, amplitude doc_id % 1000, (n_chars % 50 + 1) * 16 samples).
    FLAC is lossless, so decode_flac recovers the samples bit-exactly
    and the entry shares the WAV oracle's closed-form RMS twin — the
    decoder walks STREAMINFO, frame headers (CRC-8), FIXED-prediction
    subframes, rice residuals, and the frame CRC-16 to get there."""
    from dgraph_spark.operators.flaccodec import encode_flac

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "media": [], "mime": [],
                   "meta": []}
            for did, nch in zip(pdf[id_col], pdf["n_chars"]):
                n = (int(nch) % 50 + 1) * 16
                amp = int(did) % 1000
                samples = np.empty(n, dtype=np.int64)
                samples[0::2] = amp
                samples[1::2] = -amp
                out["media_id"].append(int(did))
                out["kind"].append("audio")
                out["media"].append(encode_flac(samples, 8000, 1))
                out["mime"].append("audio/flac")
                out["meta"].append('{"synthetic": true}')
            yield pd.DataFrame(out)

    return compute_spread(
        docs.select(F.col(id_col), F.col("n_chars"))).mapInPandas(
        build, MEDIA_SCHEMA)


def jpeg_table_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL baseline JPEG per document: grayscale solid
    value doc_id % 256, width 32, height (n_chars % 97) + 1, Huffman
    entropy coding with the exact-roundtrip quant table (jpegcodec
    QTABLE_EXACT: a flat block's only nonzero DCT coefficient is
    DC = 8*(v-128), which the DC quant step of 8 divides exactly), so
    decode_jpeg recovers the value bit-exactly and the channel means
    have a closed-form SQL twin: mean_r = mean_g = mean_b = id % 256."""
    from dgraph_spark.operators.jpegcodec import encode_jpeg_gray

    W = 32

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "media": [], "mime": [],
                   "meta": []}
            for did, nch in zip(pdf[id_col], pdf["n_chars"]):
                h = int(nch) % 97 + 1
                img = np.full((h, W), int(did) % 256, dtype=np.uint8)
                out["media_id"].append(int(did))
                out["kind"].append("image")
                out["media"].append(encode_jpeg_gray(img))
                out["mime"].append("image/jpeg")
                out["meta"].append('{"synthetic": true}')
            yield pd.DataFrame(out)

    return compute_spread(
        docs.select(F.col(id_col), F.col("n_chars"))).mapInPandas(
        build, MEDIA_SCHEMA)


def audio_table_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL PCM16 WAV per document: 8 kHz mono square wave
    of amplitude doc_id % 1000 with (n_chars % 50 + 1) * 16 samples —
    the decoder must walk the RIFF chunks and parse the sample array to
    recover rate/count/RMS, all of which have closed-form SQL twins."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "media": [], "mime": [],
                   "meta": []}
            for did, nch in zip(pdf[id_col], pdf["n_chars"]):
                n = (int(nch) % 50 + 1) * 16
                amp = int(did) % 1000
                samples = np.empty(n, dtype="<i2")
                samples[0::2] = amp
                samples[1::2] = -amp
                fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
                       + (8000).to_bytes(4, "little")
                       + (16000).to_bytes(4, "little")
                       + (2).to_bytes(2, "little")
                       + (16).to_bytes(2, "little"))
                data = samples.tobytes()
                payload = (b"RIFF" + (36 + len(data)).to_bytes(4, "little")
                           + b"WAVE" + b"fmt " + (16).to_bytes(4, "little")
                           + fmt + b"data"
                           + len(data).to_bytes(4, "little") + data)
                out["media_id"].append(int(did))
                out["kind"].append("audio")
                out["media"].append(payload)
                out["mime"].append("audio/wav")
                out["meta"].append('{"synthetic": true}')
            yield pd.DataFrame(out)

    return compute_spread(
        docs.select(F.col(id_col), F.col("n_chars"))).mapInPandas(
        build, MEDIA_SCHEMA)
