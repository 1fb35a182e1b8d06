"""Optional compiled fast path for the JPEG entropy-scan inner loop.

The baseline-JPEG Huffman scan is inherently sequential per symbol; the
pure-Python loop in imaging/jpeg.py costs ~1 µs/symbol, which puts dense
(noisy/photographic) pages at 20-30 ms/image — the single largest per-image
cost in the extraction hot path once everything else is vectorized. This
module compiles a ~70-line C translation of EXACTLY that loop with the
system C compiler at first use (no packages installed; nothing outside the
temp dir touched) and exposes it via ctypes.

Fallback contract: if no compiler exists (or compilation fails for any
reason), `scan()` is None and the caller keeps the pure-Python loop — the
two paths produce IDENTICAL outputs (asserted in tests/test_imaging.py), so
this is a speed-only concern. A Spark executor without a toolchain simply
runs the Python loop.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_C_SRC = r"""
#include <stdint.h>
#include <stdlib.h>

/* Build a 16-bit prefix LUT ((len << 8) | sym per entry) from DHT data. */
static void build_lut(const uint8_t *bits, const uint8_t *syms, int32_t *lut) {
    int code = 0, k = 0, ln, i;
    for (i = 0; i < 65536; i++) lut[i] = 0;
    for (ln = 1; ln <= 16; ln++) {
        int n = bits[ln - 1];
        while (n--) {
            int start = code << (16 - ln);
            int span = 1 << (16 - ln);
            int32_t e = (ln << 8) | syms[k];
            for (i = 0; i < span; i++) lut[start + i] = e;
            code++; k++;
        }
        code <<= 1;
    }
}

/* De-stuffed entropy bytes in `data` (data_len bytes, including the >= 8
   zero pad bytes the caller appends). Writes per-block DC diffs and packed
   AC values ((bi<<17)|(k<<11)|(v+1024)); `cap` is the capacity of `packed`.
   Returns the number of packed values, or -1 on an invalid Huffman code OR
   whenever the bit cursor would read past data_len / the value count would
   exceed cap (truncated or adversarial streams) — the Python fallback
   raises IndexError at the same points; neither path reads or writes out
   of bounds. Every 4-byte word load is guarded: byte = p>>3 touches
   data[byte..byte+3], so p + 32 <= 8*data_len keeps it in-bounds (a valid
   stream never advances 32+ bits into the zero pad before finishing). */
int64_t jpeg_scan(const uint8_t *data, int64_t data_len,
                  const uint8_t *dbits, const uint8_t *dsyms,
                  const uint8_t *abits, const uint8_t *asyms,
                  int64_t nblocks, int64_t *dc_diffs, int64_t *packed,
                  int64_t cap) {
    int32_t *dlut = (int32_t *)malloc(65536 * sizeof(int32_t));
    int32_t *alut = (int32_t *)malloc(65536 * sizeof(int32_t));
    int64_t np_out = 0, bi;
    uint64_t p = 0;
    uint64_t bit_end = (uint64_t)data_len * 8;
    if (!dlut || !alut) { free(dlut); free(alut); return -2; }
    build_lut(dbits, dsyms, dlut);
    build_lut(abits, asyms, alut);
#define FAIL { free(dlut); free(alut); return -1; }
    for (bi = 0; bi < nblocks; bi++) {
        if (p + 32 > bit_end) FAIL
        uint64_t byte = p >> 3; int s = (int)(p & 7);
        uint32_t w = ((uint32_t)data[byte] << 24) | ((uint32_t)data[byte+1] << 16)
                   | ((uint32_t)data[byte+2] << 8) | data[byte+3];
        int32_t e = dlut[(uint32_t)(w << s) >> 16];
        int cat, k; int64_t base;
        if (!e) FAIL
        p += e >> 8; cat = e & 0xFF;
        dc_diffs[bi] = 0;
        if (cat) {
            if (p + 32 > bit_end) FAIL
            byte = p >> 3; s = (int)(p & 7);
            w = ((uint32_t)data[byte] << 24) | ((uint32_t)data[byte+1] << 16)
              | ((uint32_t)data[byte+2] << 8) | data[byte+3];
            int64_t v = (uint32_t)(w << s) >> (32 - cat);
            p += cat;
            if (v < ((int64_t)1 << (cat - 1))) v -= ((int64_t)1 << cat) - 1;
            dc_diffs[bi] = v;
        }
        k = 1; base = bi << 17;
        while (k < 64) {
            if (p + 32 > bit_end) FAIL
            byte = p >> 3; s = (int)(p & 7);
            w = ((uint32_t)data[byte] << 24) | ((uint32_t)data[byte+1] << 16)
              | ((uint32_t)data[byte+2] << 8) | data[byte+3];
            e = alut[(uint32_t)(w << s) >> 16];
            if (!e) FAIL
            p += e >> 8;
            {
                int sym = e & 0xFF;
                if (sym == 0x00) break;              /* EOB */
                k += sym >> 4;
                int size = sym & 0x0F;
                if (size) {
                    if (p + 32 > bit_end || np_out >= cap) FAIL
                    byte = p >> 3; s = (int)(p & 7);
                    w = ((uint32_t)data[byte] << 24) | ((uint32_t)data[byte+1] << 16)
                      | ((uint32_t)data[byte+2] << 8) | data[byte+3];
                    int64_t v = (uint32_t)(w << s) >> (32 - size);
                    p += size;
                    if (v < ((int64_t)1 << (size - 1))) v -= ((int64_t)1 << size) - 1;
                    packed[np_out++] = base | ((int64_t)k << 11) | (v + 1024);
                    k++;
                } else if (sym == 0xF0) {
                    k++;                              /* ZRL */
                } else {
                    break;
                }
            }
        }
    }
#undef FAIL
    free(dlut); free(alut);
    return np_out;
}

/* Variable-length bit packing with T.81 byte stuffing and 1s padding —
   the encoder's _BitWriter semantics. Returns bytes written. */
int64_t pack_bits(const int32_t *codes, const int32_t *lens, int64_t n,
                  uint8_t *out) {
    uint64_t acc = 0; int nbits = 0; int64_t i, m = 0;
    for (i = 0; i <= n; i++) {
        int l; uint32_t c;
        if (i < n) { l = lens[i]; c = (uint32_t)codes[i]; }
        else {                      /* pad the tail with 1s to a byte edge */
            l = (8 - (nbits & 7)) & 7;
            c = (1u << l) - 1;
            if (!l) break;
        }
        acc = (acc << l) | (c & ((l >= 32) ? 0xFFFFFFFFu : ((1u << l) - 1)));
        nbits += l;
        while (nbits >= 8) {
            uint8_t b = (uint8_t)(acc >> (nbits - 8));
            out[m++] = b;
            if (b == 0xFF) out[m++] = 0;
            nbits -= 8;
            acc &= (1u << nbits) - 1;
        }
    }
    return m;
}
"""

_scan_fn = None
_pack_fn = None
_tried = False


def _build() -> object | None:
    """Compile (once, cached by source hash in the temp dir) and load."""
    tag = hashlib.md5(_C_SRC.encode()).hexdigest()[:12]
    so_path = os.path.join(tempfile.gettempdir(), f"apiocr_jpegscan_{tag}.so")
    if not os.path.exists(so_path):
        src_path = os.path.join(tempfile.gettempdir(), f"apiocr_jpegscan_{tag}.c")
        with open(src_path, "w") as f:
            f.write(_C_SRC)
        # atomic publish: compile to a private name, rename into place (32
        # concurrent Python workers may race here; rename is atomic)
        fd, tmp_so = tempfile.mkstemp(suffix=".so", dir=tempfile.gettempdir())
        os.close(fd)
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, src_path],
            check=True, capture_output=True, timeout=60,
        )
        os.replace(tmp_so, so_path)
    lib = ctypes.CDLL(so_path)
    fn = lib.jpeg_scan
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
                   ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
                   ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                   ctypes.c_int64]
    pk = lib.pack_bits
    pk.restype = ctypes.c_int64
    pk.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                   ctypes.c_void_p]
    return fn, pk


def _ensure() -> None:
    global _scan_fn, _pack_fn, _tried
    if not _tried:
        _tried = True
        if os.environ.get("APIOCR_NO_NATIVE"):  # test hook: force fallback
            _scan_fn = _pack_fn = None
        else:
            try:
                _scan_fn, _pack_fn = _build()
            except Exception:  # noqa: BLE001 — no toolchain: Python fallback
                _scan_fn = _pack_fn = None


def scan_fn() -> object | None:
    """The compiled scan entry point, or None (→ pure-Python fallback)."""
    _ensure()
    return _scan_fn


def pack_fn() -> object | None:
    """The compiled bit-packer, or None (→ vectorized numpy fallback)."""
    _ensure()
    return _pack_fn
