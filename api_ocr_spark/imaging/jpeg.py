"""Baseline JPEG codec (grayscale, 8-bit) in pure numpy + stdlib.

The reference compresses uploads with OpenCV's JPEG encoder and a quality
ladder (/root/reference/preprocessing/compression.py:16-79). This container
has no JPEG codec, so this module implements baseline JFIF end-to-end:

  encode_gray_jpeg: level shift → 8×8 blocks → 2-D DCT-II (orthonormal
  matrix form) → quality-scaled Annex-K luminance quantization (libjpeg's
  5000/q / 200−2q convention) → zigzag → DC differential + AC run-length →
  per-image OPTIMIZED canonical Huffman tables (like `cjpeg -optimize`;
  the tables ship in the DHT segment, so no standard-table dependency) →
  entropy coding with byte stuffing → SOI/APP0/DQT/SOF0/DHT/SOS/EOI.

  decode_gray_jpeg: a real parser of the baseline grayscale subset — reads
  DQT/SOF0/DHT from the stream (any single-component baseline JPEG with
  8-bit tables, not just our own output shape), canonical-code Huffman
  decode, dequantize, inverse DCT, unpad.

Lossy by design: OCR exactness through a JPEG round trip is a measured
property (tests assert the binarized ink mask survives at quality >= 85 on
rendered pages), not a contract like the PNG path.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables

# ITU-T T.81 Annex K.1 luminance quantization table (public spec constants)
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n.reshape(-1, 1)
    c = np.sqrt(2.0 / 8.0) * np.cos(np.pi * (2 * n + 1) * k / 16.0)
    c[0] /= np.sqrt(2.0)
    return c


_DCT = _dct_matrix()


def quant_table(quality: int) -> np.ndarray:
    """libjpeg quality scaling: scale = 5000/q (q<50) else 200−2q."""
    q = int(min(max(quality, 1), 100))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (QUANT_LUMA * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


# ------------------------------------------------------- huffman building

def _optimal_lengths(freq: dict[int, int]) -> dict[int, int]:
    """Huffman code lengths, limited to 16 bits, with libjpeg's reserved
    dummy symbol (256) so no real symbol gets the all-ones code."""
    f = dict(freq)
    f[256] = 1  # dummy: absorbs the all-ones code
    # standard Huffman via repeated pairing (symbol counts here are tiny)
    nodes = [(cnt, [sym]) for sym, cnt in f.items() if cnt > 0]
    depth = {s: 0 for _, syms in nodes for s in syms}
    while len(nodes) > 1:
        nodes.sort(key=lambda n: n[0])
        (c1, s1), (c2, s2) = nodes[0], nodes[1]
        for s in s1 + s2:
            depth[s] += 1
        nodes = nodes[2:] + [(c1 + c2, s1 + s2)]
    if len(depth) == 1:  # single symbol: give it a 1-bit code
        depth = {s: 1 for s in depth}
    # length-limit to 16 (T.81 K.3 adjust procedure)
    counts = [0] * (max(depth.values()) + 1)
    for d in depth.values():
        counts[d] += 1
    i = len(counts) - 1
    while i > 16:
        while counts[i] > 0:
            j = i - 2
            while counts[j] == 0:
                j -= 1
            counts[i] -= 2
            counts[i - 1] += 1
            counts[j + 1] += 2
            counts[j] -= 1
        i -= 1
    counts = counts[:17] + [0] * (17 - len(counts[:17]))
    # drop the dummy from the LONGEST used length (it owns the all-ones code)
    for d in range(16, 0, -1):
        if counts[d] > 0:
            counts[d] -= 1
            break
    # canonical assignment: symbols ordered by (depth, symbol value)
    real = sorted((s for s in depth if s != 256), key=lambda s: (depth[s], s))
    lengths: dict[int, int] = {}
    idx = 0
    for ln in range(1, 17):
        for _ in range(counts[ln]):
            if idx < len(real):
                lengths[real[idx]] = ln
                idx += 1
    # any stragglers (possible after the adjust) get the max length
    for s in real[idx:]:
        lengths[s] = 16
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """(code, nbits) per symbol from canonical lengths (increasing length,
    then symbol order — matching how DHT consumers regenerate them)."""
    code = 0
    out: dict[int, tuple[int, int]] = {}
    last_len = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        code <<= ln - last_len
        out[sym] = (code, ln)
        code += 1
        last_len = ln
    return out


def _dht_segment(table_class: int, table_id: int, lengths: dict[int, int]) -> bytes:
    bits = [0] * 17
    for ln in lengths.values():
        bits[ln] += 1
    syms = sorted(lengths, key=lambda s: (lengths[s], s))
    payload = bytes([(table_class << 4) | table_id]) + bytes(bits[1:]) + bytes(syms)
    return b"\xff\xc4" + (len(payload) + 2).to_bytes(2, "big") + payload


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _block_symbols(zz: np.ndarray, prev_dc: int) -> tuple[list, int]:
    """[(kind, symbol, value-bits, nbits), ...] for one zigzagged block."""
    out = []
    diff = int(zz[0]) - prev_dc
    cat = _category(diff)
    out.append(("dc", cat, _extend_bits(diff, cat), cat))
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if zz[i] != 0:
            last_nz = i
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            out.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        cat = _category(v)
        out.append(("ac", (run << 4) | cat, _extend_bits(v, cat), cat))
        run = 0
    if last_nz < 63:
        out.append(("ac", 0x00, 0, 0))  # EOB
    return out, int(zz[0])


def encode_gray_jpeg(img: np.ndarray, quality: int = 75) -> bytes:
    assert img.ndim == 2 and img.dtype == np.uint8
    h, w = img.shape
    ph, pw = -h % 8, -w % 8
    x = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    hh, ww = x.shape
    blocks = x.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
    qt = quant_table(quality)
    # round-half-away (np.rint is banker's; libjpeg divides with rounding)
    qz = np.sign(coef) * np.floor(np.abs(coef) / qt + 0.5)
    qz = qz.astype(np.int64)
    zzs = qz.reshape(-1, 8, 8).reshape(-1, 64)[:, _ZZ]  # row-major blocks
    # pass 1: symbol stats
    dc_freq: dict[int, int] = {}
    ac_freq: dict[int, int] = {}
    prev = 0
    all_syms = []
    for zz in zzs:
        syms, prev = _block_symbols(zz, prev)
        all_syms.append(syms)
        for kind, sym, _v, _n in syms:
            (dc_freq if kind == "dc" else ac_freq)[sym] = (
                (dc_freq if kind == "dc" else ac_freq).get(sym, 0) + 1
            )
    dc_len = _optimal_lengths(dc_freq)
    ac_len = _optimal_lengths(ac_freq)
    dc_codes = _canonical_codes(dc_len)
    ac_codes = _canonical_codes(ac_len)
    # pass 2: entropy-coded data
    bw = _BitWriter()
    for syms in all_syms:
        for kind, sym, v, n in syms:
            code, ln = (dc_codes if kind == "dc" else ac_codes)[sym]
            bw.write(code, ln)
            if n:
                bw.write(v, n)
    bw.flush()
    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"  # APP0
    zz_qt = qt.reshape(-1)[_ZZ]
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes(int(v) for v in zz_qt)
    out += (
        b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x01" + b"\x01" + b"\x11" + b"\x00"
    )  # SOF0: 8-bit, 1 component, no subsampling, qtable 0
    out += _dht_segment(0, 0, dc_len)
    out += _dht_segment(1, 0, ac_len)
    out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00\x00\x3f\x00"  # SOS
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode

class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # de-stuff
                else:
                    b = 0  # marker hit (shouldn't happen mid-scan): pad
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _decode_table(bits: bytes, syms: bytes) -> dict[tuple[int, int], int]:
    """{(nbits, code): symbol} from a DHT payload (canonical regeneration)."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = syms[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def decode_gray_jpeg(data: bytes) -> np.ndarray:
    assert data[:2] == b"\xff\xd8", "not a JPEG (missing SOI)"
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = 0
    qt_id = 0
    while pos < len(data):
        assert data[pos] == 0xFF, "bad marker sync"
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(seg):
                tid = seg[o] & 0x0F
                assert seg[o] >> 4 == 0, "only 8-bit qtables supported"
                t = np.zeros(64, dtype=np.int64)
                t[_ZZ] = np.frombuffer(seg[o + 1 : o + 65], dtype=np.uint8)
                qtables[tid] = t.reshape(8, 8)
                o += 65
        elif marker == 0xC0:  # SOF0
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            assert seg[0] == 8 and seg[5] == 1, "baseline grayscale only"
            qt_id = seg[8]
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(seg):
                tc, tid = seg[o] >> 4, seg[o] & 0x0F
                bits = seg[o + 1 : o + 17]
                n = sum(bits)
                htables[(tc, tid)] = _decode_table(bits, seg[o + 17 : o + 17 + n])
                o += 17 + n
        elif marker == 0xDA:  # SOS → entropy data follows
            dc_tid = seg[2] >> 4
            ac_tid = seg[2] & 0x0F
            scan = data[pos + seg_len :]
            # strip trailing EOI for the bit reader
            end = scan.rfind(b"\xff\xd9")
            br = _BitReader(scan[: end if end >= 0 else len(scan)])
            qt = qtables[qt_id]
            dct = htables[(0, dc_tid)]
            act = htables[(1, ac_tid)]
            bh, bw_ = -(-h // 8), -(-w // 8)
            out = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
            prev_dc = 0
            for bi in range(bh * bw_):
                zz = np.zeros(64, dtype=np.int64)
                cat = _huff_decode(br, dct)
                if cat:
                    v = br.read(cat)
                    if v < (1 << (cat - 1)):
                        v -= (1 << cat) - 1
                else:
                    v = 0
                prev_dc += v
                zz[0] = prev_dc
                k = 1
                while k < 64:
                    sym = _huff_decode(br, act)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if size:
                        v = br.read(size)
                        if v < (1 << (size - 1)):
                            v -= (1 << size) - 1
                        zz[k] = v
                        k += 1
                    elif sym == 0xF0:
                        k += 1  # ZRL = 16 zeros: run(15) + this slot
                    else:
                        break
                blk = np.zeros(64, dtype=np.int64)
                blk[_ZZ] = zz
                coef = blk.reshape(8, 8) * qt
                pix = _DCT.T @ coef.astype(np.float64) @ _DCT
                by, bx = divmod(bi, bw_)
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
            return np.clip(np.floor(out + 128.0 + 0.5), 0, 255).astype(np.uint8)[:h, :w]
        pos += seg_len
    raise ValueError("no SOS segment found")
