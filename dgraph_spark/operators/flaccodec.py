"""FLAC codec (RFC 9639) in pure numpy + stdlib — the lossless-audio
leg of the in-container compressed-codec surface (a real audio crawl is
FLAC/MP3; FLAC is losslessly decodable with no external library, so the
decode -> features contract stays bit-exact and SQL-oracle-able).

Decoder scope: native FLAC streams, 8/12/16/20/24/32-bit samples, all
subframe types (CONSTANT / VERBATIM / FIXED order 0-4 / LPC), rice and
rice2 residual coding with escape partitions, wasted bits, all four
channel assignments (independent / left-side / right-side / mid-side),
fixed and variable blocking, CRC-8 header and CRC-16 frame checks.
Ogg-encapsulated FLAC raises NotImplementedError (plug soundfile).

Encoder scope: fixture synthesis — mono/stereo 16-bit with FIXED
order-2 prediction + rice residuals (lossless, so round-trip is exact
by construction and the audio-features oracle stays closed-form).

Reference parity note: dgraph stores media as opaque byte predicates
and does no decoding; this module belongs to the training-data-pipeline
extension surface, like jpegcodec.py.
"""

from __future__ import annotations

import numpy as np

_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 (RFC 9639 §9.1.1)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 (RFC 9639 §9.2)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_coded_number(bits: _Bits) -> int:
    """UTF-8-style coded frame/sample number (RFC 9639 §9.1.5)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (bits.read(8) & 0x3F)
    return v


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = bits.read(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    k = 0
    for p in range(nparts):
        count = (blocksize >> part_order) - (order if p == 0 else 0)
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for _ in range(count):
                out[k] = bits.read_signed(raw) if raw else 0
                k += 1
        else:
            for _ in range(count):
                q = bits.unary()
                x = (q << param) | (bits.read(param) if param else 0)
                out[k] = (x >> 1) ^ -(x & 1)   # zigzag -> signed
                k += 1
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _predict(warmup: np.ndarray, residual: np.ndarray,
             coefs: list[int], shift: int) -> np.ndarray:
    order = len(coefs)
    if order == 0:
        return residual.copy()
    n = order + len(residual)
    out = np.empty(n, dtype=np.int64)
    out[:order] = warmup
    c = np.array(coefs, dtype=np.int64)
    for i in range(order, n):
        pred = int(np.dot(c, out[i - order:i][::-1]))
        out[i] = residual[i - order] + (pred >> shift)
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if t == 0:                       # CONSTANT
        out = np.full(blocksize, bits.read_signed(eff), dtype=np.int64)
    elif t == 1:                     # VERBATIM
        out = np.fromiter((bits.read_signed(eff) for _ in range(blocksize)),
                          dtype=np.int64, count=blocksize)
    elif 8 <= t <= 12:               # FIXED order 0-4
        order = t - 8
        warm = np.fromiter((bits.read_signed(eff) for _ in range(order)),
                           dtype=np.int64, count=order)
        res = _decode_residual(bits, blocksize, order)
        out = _predict(warm, res, _FIXED_COEFS[order], 0)
    elif t >= 32:                    # LPC
        order = (t & 0x1F) + 1
        warm = np.fromiter((bits.read_signed(eff) for _ in range(order)),
                           dtype=np.int64, count=order)
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _decode_residual(bits, blocksize, order)
        out = _predict(warm, res, coefs, shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    return out << wasted if wasted else out


def decode_flac(data: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC stream -> (sample_rate, channels, interleaved int samples)
    — the same contract as multimodal.decode_wav."""
    if data[:4] == b"OggS":
        raise NotImplementedError(
            "Ogg-encapsulated FLAC — plug soundfile/libsndfile")
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    i = 4
    info = None
    while True:                       # metadata blocks
        hdr = data[i]
        last, btype = hdr >> 7, hdr & 0x7F
        ln = int.from_bytes(data[i + 1:i + 4], "big")
        if btype == 0:                # STREAMINFO
            b = _Bits(data, i + 4)
            b.read(16); b.read(16); b.read(24); b.read(24)
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            info = (rate, channels, bps, total)
        i += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    s_rate, s_channels, s_bps, s_total = info
    rate = s_rate
    chunks = []
    got = 0
    while i < len(data) and (s_total == 0 or got < s_total):
        frame_start = i
        bits = _Bits(data, i)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync at {i}")
        bits.read(1)                  # reserved
        bits.read(1)                  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)                  # reserved
        _read_coded_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        rate = _SAMPLE_RATES.get(sr_code, s_rate)
        bps = _SAMPLE_SIZES.get(ss_code, s_bps)
        hdr_end = bits.byte
        if _crc8(data[frame_start:hdr_end]) != bits.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            subs = [_decode_subframe(bits, blocksize, bps)
                    for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            # the SIDE channel carries one extra bit (RFC 9639 §9.2.2)
            extra = [(0, 1), (1, 0), (0, 1)][ch_code - 8]
            a = _decode_subframe(bits, blocksize, bps + extra[0])
            b = _decode_subframe(bits, blocksize, bps + extra[1])
            if ch_code == 8:          # left / side
                subs = [a, a - b]
            elif ch_code == 9:        # side / right
                subs = [a + b, b]
            else:                     # mid / side
                m = (a << 1) | (b & 1)
                subs = [(m + b) >> 1, (m - b) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        bits.align()
        if _crc16(data[frame_start:bits.byte]) != bits.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        inter = np.empty(blocksize * nch, dtype=np.int64)
        for c, s in enumerate(subs):
            inter[c::nch] = s
        chunks.append(inter)
        got += blocksize
        i = bits.byte
    samples = np.concatenate(chunks) if chunks else \
        np.array([], dtype=np.int64)
    if s_total:
        samples = samples[:s_total * s_channels]
    return s_rate or rate, s_channels, samples


# ---------------------------------------------------------------- encoder
class _BitsW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _encode_subframe_fixed2(bw: _BitsW, samples: np.ndarray,
                            bps: int) -> None:
    """FIXED order-2 subframe, single rice partition, adaptive param."""
    order = min(2, len(samples))
    bw.write(0, 1)                    # padding
    bw.write(8 + order, 6)            # FIXED order
    bw.write(0, 1)                    # no wasted bits
    s = samples.astype(np.int64)
    for w in s[:order]:
        bw.write(int(w), bps)
    if order == 2:
        res = s[2:] - 2 * s[1:-1] + s[:-2]
    elif order == 1:
        res = s[1:] - s[:-1]
    else:
        res = s[order:]
    zig = (np.abs(res) << 1) - (res < 0)
    bw.write(0, 2)                    # rice 4-bit params
    bw.write(0, 4)                    # partition order 0
    maxz = int(zig.max()) if len(zig) else 0
    param = 0
    while (maxz >> param) > 30 and param < 14:
        param += 1
    bw.write(param, 4)
    for z in zig:
        z = int(z)
        bw.write_unary(z >> param)
        if param:
            bw.write(z, param)


def encode_flac(samples: np.ndarray, sample_rate: int = 8000,
                channels: int = 1, blocksize: int = 4096) -> bytes:
    """Losslessly encode interleaved 16-bit samples as a native FLAC
    stream (FIXED order-2 + rice, independent channels, fixed blocking)."""
    samples = np.asarray(samples, dtype=np.int64)
    if channels > 1 and len(samples) % channels:
        raise ValueError("interleaved length not divisible by channels")
    nsamp = len(samples) // channels
    bps = 16
    # STREAMINFO
    si = _BitsW()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(nsamp, 36)
    out = bytearray(b"fLaC")
    body = bytes(si.out) + b"\x00" * 16          # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    frame_no = 0
    for start in range(0, max(nsamp, 1), blocksize):
        n = min(blocksize, nsamp - start)
        if n <= 0:
            break
        bw = _BitsW()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)                # reserved
        bw.write(0, 1)                # fixed blocking
        bw.write(7, 4)                # blocksize: 16-bit field follows
        bw.write(4 if sample_rate == 8000 else 0, 4)
        bw.write(channels - 1, 4)     # independent channels
        bw.write(4, 3)                # 16-bit samples
        bw.write(0, 1)                # reserved
        # coded frame number (UTF-8 style, small values fit one byte)
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        else:
            bw.write(0xC0 | (frame_no >> 6), 8)
            bw.write(0x80 | (frame_no & 0x3F), 8)
        bw.write(n - 1, 16)
        hdr = bytes(bw.out) if bw.n == 0 else None
        if hdr is None:
            raise AssertionError("frame header must be byte-aligned")
        bw.write(_crc8(hdr), 8)
        for c in range(channels):
            chan = samples[(start + np.arange(n)) * channels + c] \
                if channels > 1 else samples[start:start + n]
            _encode_subframe_fixed2(bw, chan, bps)
        bw.align()
        frame = bytes(bw.out)
        out += frame + _crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)
