"""Pure-numpy baseline JPEG (JFIF) codec — no external image library.

Closes the last multimodal codec gap (VERDICT r2 missing #4): a REAL
baseline sequential JPEG encoder + decoder built on numpy and the stdlib
only, same codec policy as the sibling PPM/PNG/WAV/RV01 codecs in
``multimodal.py``.

Encoder (``encode_jpeg``): RGB → YCbCr (JFIF matrix), optional 4:2:0 chroma
subsampling (2×2 mean), per-block 2-D DCT (broadcasted BLAS matmuls),
Annex-K-style quantization tables scaled by ``quality`` (libjpeg's
5000/Q / 200−2Q rule), zigzag, DC-difference + AC run-length entropy
coding with the standard Huffman tables, byte stuffing, optional restart
intervals. Output parses in any standard viewer.

Decoder (``decode_jpeg``): a general BASELINE decoder, not just the inverse
of our encoder — arbitrary sampling factors up to 2×2, multiple DQT/DHT
segments, restart intervals (DRI/RSTn), grayscale or 3-component scans,
APPn/COM skipping. Huffman decoding uses a 64 K-entry peek-16 LUT per
table (one array fill per DHT, O(1) per symbol); dequantize/un-zigzag/IDCT
run vectorized over all blocks of a component at once. Progressive /
arithmetic / 12-bit streams raise ``ValueError`` naming the limitation.

JPEG is lossy: tests gate on reconstruction error (and exact shape), not
byte equality — hence no DuckDB oracle for this family (SQL cannot IDCT);
the pytest gates in ``tests/test_jpeg.py`` are the correctness pin.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constants: zigzag, DCT basis, Annex-K quant + Huffman tables
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag scan as flat 8×8 indices (generated, not typed)."""
    out = []
    for s in range(15):
        pts = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:
            pts = pts[::-1]
        out.extend(pts)
    return np.array([r * 8 + c for r, c in out], dtype=np.int64)


_ZIGZAG = _zigzag_order()  # block[_ZIGZAG] = zigzag vector
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None].astype(np.float64)
    n = np.arange(8)[None, :].astype(np.float64)
    a = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    a[0] *= 1 / np.sqrt(2)
    return a  # orthonormal: forward F = A @ X @ A.T, inverse X = A.T @ F @ A


_DCT_A = _dct_matrix()

_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Standard Huffman tables (ITU T.81 Annex K): (bits[1..16], values).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
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
    0xF9, 0xFA,
]
for _b, _v in (
    (_DC_LUMA_BITS, _DC_LUMA_VALS),
    (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    (_AC_LUMA_BITS, _AC_LUMA_VALS),
    (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
):
    assert len(_b) == 16 and sum(_b) == len(_v), "huffman table self-check"


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) canonical assignment; validates the code
    space never overflows (T.81 C.2)."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("invalid huffman table: code space overflow")
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_lut(bits, vals):
    """Peek-16 LUT: (lengths[65536] uint8, symbols[65536] uint8)."""
    lut_len = np.zeros(65536, np.uint8)
    lut_sym = np.zeros(65536, np.uint8)
    for sym, (code, length) in _canonical_codes(bits, vals).items():
        start = code << (16 - length)
        span = 1 << (16 - length)
        lut_len[start : start + span] = length
        lut_sym[start : start + span] = sym
    return lut_len, lut_sym


# ---------------------------------------------------------------------------
# Bit IO
# ---------------------------------------------------------------------------



class _BitReader:
    """MSB-first reader over a DESTUFFED entropy-coded segment; reads past
    the end return 1-bits (the spec's pad convention), bounded."""

    __slots__ = ("data", "i", "acc", "n", "overrun")

    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0
        self.overrun = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            if self.i < len(self.data):
                b = self.data[self.i]
                self.i += 1
            else:
                b = 0xFF
                self.overrun += 1
                if self.overrun > 8:
                    raise ValueError("truncated JPEG entropy segment")
            self.acc = (self.acc << 8) | b
            self.n += 8

    def receive(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def decode(self, lut_len: np.ndarray, lut_sym: np.ndarray) -> int:
        self._fill(16)
        w = (self.acc >> (self.n - 16)) & 0xFFFF
        length = int(lut_len[w])
        if length == 0:
            raise ValueError("invalid huffman code in JPEG stream")
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return int(lut_sym[w])


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Color + block helpers
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(pix: np.ndarray) -> np.ndarray:
    p = pix.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _plane_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Pad (edge-replicate) to (bh*8, bw*8) and return (bh*bw, 8, 8)."""
    h, w = plane.shape
    plane = np.pad(
        plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )
    return (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )


def _blocks_to_plane(blocks: np.ndarray, bh: int, bw: int) -> np.ndarray:
    return (
        blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _code_arrays(tab: dict) -> tuple[np.ndarray, np.ndarray]:
    """Huffman table dict → dense (codes, lengths) arrays for vector gather."""
    codes = np.zeros(256, np.uint32)
    lens = np.zeros(256, np.uint8)
    for sym, (c, ln) in tab.items():
        codes[sym] = c
        lens[sym] = ln
    return codes, lens


def _pack_bits(bits: np.ndarray, lens: np.ndarray) -> bytes:
    """Vectorized bit writer: MSB-first pack of (value, length) records,
    1-padded to a whole byte (T.81 pad convention), 0x00 stuffed after every
    0xFF. One np.repeat/packbits pass instead of a per-symbol Python loop."""
    keep = lens > 0
    bits = bits[keep].astype(np.uint64)
    lens64 = lens[keep].astype(np.int64)
    total = int(lens64.sum())
    if total == 0:
        return b""
    starts = np.cumsum(lens64) - lens64
    rep = np.repeat(np.arange(len(lens64)), lens64)
    within = np.arange(total, dtype=np.int64) - starts[rep]
    shift = (lens64[rep] - 1 - within).astype(np.uint64)
    bitarr = ((bits[rep] >> shift) & np.uint64(1)).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bitarr = np.concatenate([bitarr, np.ones(pad, np.uint8)])
    packed = np.packbits(bitarr)
    stuff = np.flatnonzero(packed == 0xFF)
    if len(stuff):
        packed = np.insert(packed, stuff + 1, np.uint8(0))
    return packed.tobytes()


def _bit_sizes(v: np.ndarray) -> np.ndarray:
    """Per-element bit_length(|v|) — exact via frexp for |v| < 2^53 (JPEG
    coefficient magnitudes are < 2^16)."""
    return np.where(
        v == 0, 0, np.frexp(np.abs(v).astype(np.float64))[1]
    ).astype(np.int64)


def _entropy_encode(
    zz: np.ndarray,
    comp_ids: np.ndarray,
    dc_code_arrs: list,
    ac_code_arrs: list,
) -> bytes:
    """One restart segment's entropy-coded bytes, fully vectorized: DC
    difference chains per component, AC run-length symbols with ZRL
    expansion and EOB, canonical Huffman gather, then one bit-pack pass.
    ``zz`` is (N, 64) quantized zigzag coefficients in STREAM (MCU-
    interleaved) order; ``comp_ids`` maps each block to its component
    (DC prediction chain + table choice: 0 = luma tables)."""
    n = zz.shape[0]
    tab_of = (comp_ids != 0).astype(np.int64)  # 0 luma, 1 chroma tables
    dc_codes = np.stack([dc_code_arrs[0][0], dc_code_arrs[1][0]])
    dc_lens = np.stack([dc_code_arrs[0][1], dc_code_arrs[1][1]])
    ac_codes = np.stack([ac_code_arrs[0][0], ac_code_arrs[1][0]])
    ac_lens = np.stack([ac_code_arrs[0][1], ac_code_arrs[1][1]])

    # ---- DC: per-component difference chain in stream order
    dc = zz[:, 0]
    diff = dc.copy()
    for ci in np.unique(comp_ids):
        idx = np.flatnonzero(comp_ids == ci)
        diff[idx[1:]] = dc[idx[1:]] - dc[idx[:-1]]
    dsz = _bit_sizes(diff)
    dvbits = np.where(diff > 0, diff, diff + (np.int64(1) << dsz) - 1)
    dc_block = np.arange(n, dtype=np.int64)
    dc_seq = np.zeros(n, np.int64)
    dc_code = dc_codes[tab_of, dsz]
    dc_clen = dc_lens[tab_of, dsz]

    # ---- AC: run-length over the 63 AC positions of every block at once
    ac = zz[:, 1:]
    r, c = np.nonzero(ac)  # row-major: grouped by block, ascending position
    if len(r):
        v = ac[r, c]
        first = np.empty(len(r), bool)
        first[0] = True
        first[1:] = r[1:] != r[:-1]
        prev_c = np.empty_like(c)
        prev_c[0] = -1
        prev_c[1:] = c[:-1]
        run = np.where(first, c, c - prev_c - 1)
        nzrl = run >> 4
        # run == 16k exactly: ZRL consumes all 16s but the final symbol's
        # run field is run % 16 — matches the scalar while-loop semantics
        final_run = run & 15
        vsz = _bit_sizes(v)
        avbits = np.where(v > 0, v, v + (np.int64(1) << vsz) - 1)
        sym = (final_run << 4) | vsz
        # records-per-nonzero (ZRLs + the value symbol), cumulative within block
        tot = nzrl + 1
        excl = np.cumsum(tot) - tot
        gid = np.cumsum(first) - 1
        row_base = excl[np.flatnonzero(first)]
        within_prior = excl - row_base[gid]
        val_seq = 1 + within_prior + nzrl
        ac_block = r.astype(np.int64)
        ac_code = ac_codes[tab_of[r], sym]
        ac_clen = ac_lens[tab_of[r], sym]
        # ZRL expansion records
        zsrc = np.repeat(np.arange(len(r)), nzrl)
        if len(zsrc):
            zwithin = np.arange(len(zsrc)) - np.repeat(
                np.cumsum(nzrl) - nzrl, nzrl
            )
            z_block = ac_block[zsrc]
            z_seq = 1 + within_prior[zsrc] + zwithin
            z_code = ac_codes[tab_of[z_block], 0xF0]
            z_clen = ac_lens[tab_of[z_block], 0xF0]
        else:
            z_block = z_seq = np.zeros(0, np.int64)
            z_code = np.zeros(0, np.uint32)
            z_clen = np.zeros(0, np.uint8)
        last_c = np.full(n, -1, np.int64)
        last_c[r] = c  # row-major: final write per block is its last nonzero
        row_tot = np.zeros(n, np.int64)
        np.add.at(row_tot, r, tot)
    else:
        v = vsz = avbits = np.zeros(0, np.int64)
        ac_block = val_seq = z_block = z_seq = np.zeros(0, np.int64)
        ac_code = z_code = np.zeros(0, np.uint32)
        ac_clen = z_clen = np.zeros(0, np.uint8)
        last_c = np.full(n, -1, np.int64)
        row_tot = np.zeros(n, np.int64)

    # ---- EOB for every block whose last nonzero is before position 62
    eob_block = np.flatnonzero(last_c < 62)
    eob_seq = 1 + row_tot[eob_block]
    eob_code = ac_codes[tab_of[eob_block], 0x00]
    eob_clen = ac_lens[tab_of[eob_block], 0x00]

    blocks = np.concatenate([dc_block, ac_block, z_block, eob_block])
    seqs = np.concatenate([dc_seq, val_seq, z_seq, eob_seq])
    codes = np.concatenate([dc_code, ac_code, z_code, eob_code]).astype(np.uint64)
    clens = np.concatenate([dc_clen, ac_clen, z_clen, eob_clen]).astype(np.int64)
    vbits = np.concatenate(
        [dvbits, avbits, np.zeros(len(z_block), np.int64),
         np.zeros(len(eob_block), np.int64)]
    ).astype(np.uint64)
    vlens = np.concatenate(
        [dsz, vsz, np.zeros(len(z_block), np.int64),
         np.zeros(len(eob_block), np.int64)]
    )

    order = np.lexsort((seqs, blocks))
    m = len(order)
    bits2 = np.empty(2 * m, np.uint64)
    lens2 = np.empty(2 * m, np.int64)
    bits2[0::2] = codes[order]
    lens2[0::2] = clens[order]
    bits2[1::2] = vbits[order]
    lens2[1::2] = vlens[order]
    return _pack_bits(bits2, lens2)


def _stream_order(comp_coefs, samp, mcux, mcuy):
    """Scatter per-component block grids into one MCU-interleaved (N, 64)
    array + per-block component ids — the T.81 scan interleave."""
    blocks_per_mcu = sum(sh * sv for sh, sv in samp)
    n = mcux * mcuy * blocks_per_mcu
    zz = np.empty((n, 64), np.int64)
    comp_ids = np.empty(n, np.int8)
    off = 0
    for ci, (sh, sv) in enumerate(samp):
        bh, bw = comp_coefs[ci].shape[:2]
        by, bx = np.mgrid[0:bh, 0:bw]
        m = (by // sv) * mcux + (bx // sh)
        sidx = (m * blocks_per_mcu + off + (by % sv) * sh + (bx % sh)).ravel()
        zz[sidx] = comp_coefs[ci].reshape(-1, 64)
        comp_ids[sidx] = ci
        off += sh * sv
    return zz, comp_ids, blocks_per_mcu


def _encode_scan(zz, comp_ids, blocks_per_mcu, dc_arrs, ac_arrs,
                 restart_interval: int) -> bytes:
    """Entropy-encode the whole scan: one vectorized pass without restarts,
    else one per restart segment (preds reset, byte-aligned, RSTn between)."""
    if not restart_interval:
        return _entropy_encode(zz, comp_ids, dc_arrs, ac_arrs)
    out = bytearray()
    seg = restart_interval * blocks_per_mcu
    rst = 0
    for b0 in range(0, zz.shape[0], seg):
        if b0:
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
        out += _entropy_encode(
            zz[b0 : b0 + seg], comp_ids[b0 : b0 + seg], dc_arrs, ac_arrs
        )
    return bytes(out)


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB — or (h, w) uint8 grayscale — → baseline JFIF
    bytes. ``subsample`` ∈ {"444", "420"} (RGB only); ``restart_interval``
    emits DRI + RSTn every that many MCUs (0 = none)."""
    if pixels.ndim == 2:
        return _encode_gray(pixels, quality, restart_interval)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_jpeg expects (h, w, 3) RGB or (h, w) gray")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = pixels.shape[:2]
    ycc = _rgb_to_ycbcr(pixels)
    qy = _scale_quant(_QUANT_LUMA, quality)
    qc = _scale_quant(_QUANT_CHROMA, quality)

    if subsample == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        samp = [(2, 2), (1, 1), (1, 1)]
        # 2×2 mean chroma downsample (pad odd dims by edge first)
        cpad = np.pad(
            ycc, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge"
        )
        cb = cpad[..., 1].reshape((h + h % 2) // 2, 2, -1, 2).mean(axis=(1, 3))
        cr = cpad[..., 2].reshape((h + h % 2) // 2, 2, -1, 2).mean(axis=(1, 3))
        planes = [ycc[..., 0], cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component quantized zigzag coefficients, vectorized
    comp_coefs = []
    comp_dims = []
    for ci, ((sh_, sv), plane) in enumerate(zip(samp, planes)):
        bw_, bh_ = mcux * sh_, mcuy * sv
        blocks = _plane_to_blocks(plane, bh_, bw_) - 128.0
        f = np.matmul(_DCT_A, np.matmul(blocks, _DCT_A.T))
        q = qy if ci == 0 else qc
        zz = f.reshape(-1, 64)[:, _ZIGZAG]
        coefs = np.round(zz / q[np.newaxis, :]).astype(np.int64)
        comp_coefs.append(coefs.reshape(bh_, bw_, 64))
        comp_dims.append((bh_, bw_))

    dc_arrs = [
        _code_arrays(_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)),
        _code_arrays(_canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)),
    ]
    ac_arrs = [
        _code_arrays(_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)),
        _code_arrays(_canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)),
    ]
    zz_stream, comp_ids, bpm = _stream_order(comp_coefs, samp, mcux, mcuy)
    scan = _encode_scan(zz_stream, comp_ids, bpm, dc_arrs, ac_arrs, restart_interval)

    return _assemble_jfif(w, h, samp, qy, qc, scan, restart_interval)



def _encode_gray(plane: np.ndarray, quality: int, restart_interval: int) -> bytes:
    """Single-component (luma-only) baseline JPEG — exercises the decoder's
    grayscale scan path with a stream our 3-component encoder never emits."""
    h, w = plane.shape
    qy = _scale_quant(_QUANT_LUMA, quality)
    bw_, bh_ = -(-w // 8), -(-h // 8)
    blocks = _plane_to_blocks(plane.astype(np.float64), bh_, bw_) - 128.0
    f = np.matmul(_DCT_A, np.matmul(blocks, _DCT_A.T))
    zz = f.reshape(-1, 64)[:, _ZIGZAG]
    coefs = np.round(zz / qy[np.newaxis, :]).astype(np.int64)
    luma = _code_arrays(_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS))
    luma_ac = _code_arrays(_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS))
    scan = _encode_scan(
        coefs,
        np.zeros(coefs.shape[0], np.int8),
        1,  # grayscale: one block per MCU
        [luma, luma],
        [luma_ac, luma_ac],
        restart_interval,
    )

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    body = bytes([0]) + bytes(int(x) for x in qy)
    out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def _dht_segment(cls: int, tid: int, bits, vals) -> bytes:
    body = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _assemble_jfif(w, h, samp, qy, qc, scan: bytes, restart_interval: int) -> bytes:
    out = bytearray(b"\xff\xd8")  # SOI
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for tid, q in ((0, qy), (1, qc)):
        body = bytes([tid]) + bytes(int(x) for x in q)
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = bytearray(struct.pack(">BHHB", 8, h, w, 3))
    for ci, (sh_, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh_ << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
    out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytearray([3])
    for ci in range(3):
        sos += bytes([ci + 1, 0 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB (grayscale replicates).

    Every corruption failure surfaces as ``ValueError`` — a data-plane
    stage must be able to catch ONE exception type per bad row instead of
    letting a stray KeyError/struct.error kill the whole batch task."""
    try:
        return _decode_jpeg(payload)
    except (KeyError, IndexError, OverflowError, struct.error) as ex:
        raise ValueError(f"corrupt JPEG stream: {type(ex).__name__}: {ex}") from ex


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment in JPEG stream")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no length
            continue
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported (baseline)")
                qtables[tq] = np.frombuffer(
                    body[i + 1 : i + 65], np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(cls, tid)] = _decode_lut(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": fw, "h": fh, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0) is supported, got "
                f"SOF marker 0x{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scomps.append((cs, tabs >> 4, tabs & 15))
            scan, pos = _split_scan(payload, pos)
            return _decode_scan(
                frame, scomps, qtables, htables, scan, restart_interval
            )
        # APPn (0xE0-0xEF), COM (0xFE), others: skipped
    raise ValueError("no SOS marker found in JPEG stream")


def _split_scan(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Destuff the entropy-coded data starting at ``pos``; split on RSTn.
    Returns (segments, position of the terminating marker)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def _decode_scan(frame, scomps, qtables, htables, segs, restart_interval):
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    byid = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    order = []  # (comp_index, dc_lut, ac_lut) per block within an MCU
    for cs, dct, act in scomps:
        c = byid[cs]
        ci = comps.index(c)
        try:
            dl = htables[(0, dct)]
            al = htables[(1, act)]
        except KeyError as ex:
            raise ValueError(f"scan references missing huffman table {ex}")
        for _ in range(c["h"] * c["v"]):
            order.append((ci, dl, al))
    coefs = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64) for c in comps
    ]
    preds = [0] * len(comps)
    seg_idx = 0
    br = _BitReader(segs[0])
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_in_seg == restart_interval
                and seg_idx + 1 < len(segs)
            ):
                seg_idx += 1
                br = _BitReader(segs[seg_idx])
                preds = [0] * len(comps)
                mcu_in_seg = 0
            bi = 0
            for cs, _, _ in scomps:
                c = byid[cs]
                ci = comps.index(c)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        _, dl, al = order[bi]
                        bi += 1
                        blk, preds[ci] = _decode_block(br, dl, al, preds[ci])
                        coefs[ci][my * c["v"] + by, mx * c["h"] + bx] = blk
            mcu_in_seg += 1

    planes = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]]
        bh_, bw_ = coefs[ci].shape[:2]
        zz = coefs[ci].reshape(-1, 64) * q[np.newaxis, :]
        blocks = zz[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        spat = np.matmul(_DCT_A.T, np.matmul(blocks, _DCT_A)) + 128.0
        plane = _blocks_to_plane(spat, bh_, bw_)
        if c["h"] < hmax or c["v"] < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


def _decode_block(br: _BitReader, dc_lut, ac_lut, pred: int):
    s = br.decode(*dc_lut)
    pred += _extend(br.receive(s), s)
    blk = np.zeros(64, np.int64)
    blk[0] = pred
    k = 1
    while k < 64:
        rs = br.decode(*ac_lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        blk[k] = _extend(br.receive(s), s)
        k += 1
    return blk, pred
