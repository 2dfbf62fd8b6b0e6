"""Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) codec in pure
numpy + stdlib — the in-container "compressed codec" path for the
multimodal tier (a real 100 TB image crawl is overwhelmingly JPEG).

Decoder scope: baseline DCT (SOF0), 8-bit samples, grayscale or YCbCr
with any of the common sampling factors (4:4:4, 4:2:2, 4:4:0, 4:2:0),
restart markers (DRI/RSTn), byte stuffing, multiple DQT/DHT segments.
Progressive (SOF2), arithmetic coding, 12-bit precision and hierarchical
modes are LOUD NotImplementedError rejections — a production deployment
plugs PIL/libjpeg-turbo into multimodal._pil_decode for those, and this
decoder keeps the tested in-container path honest.

Encoder scope: fixture/media-table synthesis — grayscale or 4:4:4 /
4:2:0 YCbCr, standard Annex K Huffman tables, caller-supplied or
Annex K quantization. ``encode_jpeg_gray`` with the DC-quant-8 table
makes solid-color images round-trip EXACTLY (DC = 8*(v-128) divides by
8 with no remainder), which gives the registry entry a closed-form SQL
oracle over genuinely Huffman-coded bitstreams.

Reference parity note: dgraph stores media as opaque byte predicates
(posting/posting.go value types) and does no decoding; this module is
part of the training-data-pipeline extension surface, not §2 parity.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- constants
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 luminance quantization table (quality 50), natural order
QTABLE_K1 = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

# Exact-roundtrip table for solid-color fixtures: DC quant 8 makes the
# quantized DC of a flat block integral (DC = 8*(v-128)); AC entries are
# irrelevant for flat blocks (all-zero) but kept small for generality.
QTABLE_EXACT = np.full(64, 16, dtype=np.int64)
QTABLE_EXACT[0] = 8

# Annex K.3 standard Huffman tables: (BITS list of 16 counts, HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# Orthonormal 8x8 DCT-II basis: IDCT is B.T @ F @ B with the JPEG
# normalization folded in (C(0) = 1/sqrt(2), scale 1/2 per axis).
_N = np.arange(8)
_DCT_B = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) / 2.0
_DCT_B[0] /= np.sqrt(2.0)


def idct2(coef: np.ndarray) -> np.ndarray:
    """2-D type-III DCT of an 8x8 coefficient block (T.81 A.3.3)."""
    return _DCT_B.T @ coef @ _DCT_B


def fdct2(block: np.ndarray) -> np.ndarray:
    """2-D type-II DCT of an 8x8 sample block (T.81 A.3.3)."""
    return _DCT_B @ block @ _DCT_B.T


# ---------------------------------------------------------------- huffman
def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(code_length, code) -> value, per T.81 Annex C code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """value -> (code, length), inverse of _build_decode_table."""
    return {v: (c, ln) for (ln, c), v in
            _build_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with FF00
    byte-stuffing removal and RSTn detection (T.81 B.1.1.5/F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # pending RSTn/EOI marker code

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:          # stuffed FF
                self.pos += 2
            else:                    # a real marker terminates the segment
                self.marker = nxt
                b = 0                # pad with zero bits past the marker
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Consume a pending RSTn marker and resync (T.81 F.2.1.3.1)."""
        if self.marker is None:
            # the marker bytes haven't been reached yet — scan forward
            while self.data[self.pos] != 0xFF or \
                    self.data[self.pos + 1] == 0x00:
                self.pos += 1
            self.marker = self.data[self.pos + 1]
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected RSTn, found FF{self.marker:02X}")
        self.pos += 2
        self.acc = self.nbits = 0
        self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# ---------------------------------------------------------------- decoder
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> HxW (grayscale) or HxWx3 uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        m = data[i + 1]
        if m == 0xD9:                 # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2:i + 4], "big")
        body = data[i + 4:i + 2 + seg_len]
        if m == 0xDB:                 # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit quantization tables — plug PIL")
                tab = np.frombuffer(
                    body[j + 1:j + 65], dtype=np.uint8).astype(np.int64)
                dq = np.empty(64, dtype=np.int64)
                dq[ZIGZAG] = tab      # stored zigzag -> natural order
                qt[tq] = dq
                j += 65
        elif m == 0xC4:               # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1:j + 17])
                n = sum(bits)
                vals = list(body[j + 17:j + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _build_decode_table(bits, vals)
                j += 17 + n
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 (baseline / ext. sequential)
            if body[0] != 8:
                raise NotImplementedError(f"precision {body[0]} — plug PIL")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if w * h > (1 << 28) or w == 0 or h == 0:
                raise ValueError(
                    f"JPEG dimensions {w}x{h} out of sane range "
                    "(corrupt header or decompression bomb)")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], \
                    body[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{m - 0xC0} (progressive/arithmetic/hierarchical)"
                " — plug PIL into _pil_decode")
        elif m == 0xDD:               # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif m == 0xDA:               # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}
            for c in range(ns):
                sel[body[1 + 2 * c]] = (body[2 + 2 * c] >> 4,
                                        body[2 + 2 * c] & 0x0F)
            return _decode_scan(data, i + 2 + seg_len, frame, sel, qt,
                                huff_dc, huff_ac, restart_interval)
        i += 2 + seg_len
    raise ValueError("JPEG missing SOS")


def _decode_scan(data, pos, frame, sel, qt, huff_dc, huff_ac,
                 restart_interval):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]),
                               dtype=np.float64))
    rd = _BitReader(data, pos)
    pred = [0] * len(comps)
    nmcu = mcux * mcuy
    for mi in range(nmcu):
        # reaching a non-RST marker (EOI, next SOS, ...) with MCUs
        # still owed means the entropy data ended early — corrupt or
        # truncated stream (also stops header-declared phantom MCUs
        # from being "decoded" out of zero padding at O(w*h) cost)
        if rd.marker is not None and not (0xD0 <= rd.marker <= 0xD7):
            raise ValueError(
                f"JPEG entropy data ended at MCU {mi}/{nmcu} "
                "(truncated or corrupt stream)")
        if restart_interval and mi and mi % restart_interval == 0:
            rd.restart()
            pred = [0] * len(comps)
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(comps):
            td, ta = sel[c["id"]]
            dct, act = huff_dc[td], huff_ac[ta]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = rd.decode_huff(dct)
                    diff = _extend(rd.receive(t), t)
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = rd.decode_huff(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:      # ZRL
                                k += 16
                                continue
                            break            # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(rd.receive(s), s)
                        k += 1
                    coef = np.empty(64, dtype=np.int64)
                    coef[ZIGZAG] = zz        # dezigzag
                    block = idct2((coef * q).reshape(8, 8)) + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = block
    # upsample each component to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-bits padding (B.1.1.5)


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw, zz, pred, dc_tab, ac_tab):
    """Huffman-encode one zigzagged quantized block; returns new DC."""
    diff = int(zz[0]) - pred
    t = _csize(diff)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while zz[k] == 0:
            run += 1
            k += 1
        while run > 15:
            code, ln = ac_tab[0xF0]          # ZRL
            bw.write(code, ln)
            run -= 16
        v = int(zz[k])
        s = _csize(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    if last_nz < 63:
        code, ln = ac_tab[0x00]              # EOB
        bw.write(code, ln)
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes((0xFF, marker)) + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_seg(tq: int, q: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tq]) + bytes(int(x) for x in q[ZIGZAG]))


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _quantize_plane(plane: np.ndarray, q: np.ndarray) -> list[np.ndarray]:
    """Pad to 8x8 multiples (edge replication), FDCT + quantize each
    block, return zigzagged int blocks in raster order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    out = []
    qm = q.reshape(8, 8).astype(np.float64)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            coef = np.round(fdct2(blk) / qm).astype(np.int64)
            out.append(coef.reshape(64)[ZIGZAG])  # natural -> zigzag
    return out


def encode_jpeg_gray(img: np.ndarray,
                     qtable: np.ndarray = QTABLE_EXACT) -> bytes:
    """Grayscale baseline JPEG. With QTABLE_EXACT (DC quant 8), a
    solid-value image decodes back to exactly that value: a flat block's
    DCT is DC-only with DC = 8*(v-128), divisible by 8."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, qtable)
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big")
                + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dc_tab = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_tab = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    pred = 0
    for zz in _quantize_plane(img, qtable):
        pred = _encode_block(bw, zz, pred, dc_tab, ac_tab)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color(img: np.ndarray, subsample: str = "444",
                      luma_q: np.ndarray = QTABLE_K1,
                      chroma_q: np.ndarray = QTABLE_K1,
                      restart_interval: int = 0) -> bytes:
    """YCbCr baseline JPEG, 4:4:4 or 4:2:0, Annex K Huffman tables,
    optional restart markers — enough surface to exercise every decoder
    path (interleaved MCUs, chroma upsampling, DRI/RSTn) in round-trip
    tests without an external library."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample == "444":
        hs = vs = 1
    elif subsample == "420":
        hs = vs = 2
    else:
        raise ValueError(f"unsupported subsampling {subsample!r}")

    def box_down(p, fy, fx):
        if fy == fx == 1:
            return p
        ph, pw = -(-p.shape[0] // fy) * fy, -(-p.shape[1] // fx) * fx
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))

    planes = [np.clip(y, 0, 255), np.clip(box_down(cb, vs, hs), 0, 255),
              np.clip(box_down(cr, vs, hs), 0, 255)]

    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, luma_q) + _dqt_seg(1, chroma_q)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + \
        bytes([3, 1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _dht_seg(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += _dht_seg(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    enc_dc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    samp = [(hs, vs), (1, 1), (1, 1)]
    qsel = [luma_q, chroma_q, chroma_q]
    mcux = -(-w // (8 * hs))
    mcuy = -(-h // (8 * vs))
    # per-component zigzagged blocks indexed [comp][block_row][block_col]
    blocks = []
    for ci, p in enumerate(planes):
        ph = mcuy * 8 * samp[ci][1]
        pw = mcux * 8 * samp[ci][0]
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        bl = _quantize_plane(p, qsel[ci])
        blocks.append((bl, pw // 8))
    bw = _BitWriter()
    pred = [0, 0, 0]
    rst = 0
    for mi in range(mcux * mcuy):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()
            out += bw.out
            out += bytes((0xFF, 0xD0 + (rst & 7)))
            rst += 1
            bw = _BitWriter()
            pred = [0, 0, 0]
        my, mx = divmod(mi, mcux)
        for ci in range(3):
            bl, bcols = blocks[ci]
            ch, cv = samp[ci]
            for by in range(cv):
                for bx in range(ch):
                    idx = (my * cv + by) * bcols + (mx * ch + bx)
                    pred[ci] = _encode_block(
                        bw, bl[idx], pred[ci],
                        enc_dc[min(ci, 1)], enc_ac[min(ci, 1)])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
