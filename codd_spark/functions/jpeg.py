"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Decoder: baseline sequential JPEGs — grayscale or YCbCr with arbitrary
sampling factors (4:4:4 / 4:2:2 / 4:2:0 / ...), 8/16-bit quant tables,
restart intervals, byte stuffing. Progressive (SOF2) and arithmetic
coding are rejected with a clear error (the PIL upgrade path in
functions/codecs.py covers them when available). The IDCT is the exact
orthonormal 8-point DCT-II basis in float64 — JPEG's Annex A FDCT
definition IS the orthonormal 2D DCT, so ``B.T @ C @ B`` inverts it
with no scale fudge (libjpeg's integer IDCT approximates the same
transform; outputs agree within +-1).

Encoder: a spec-compliant baseline writer used as the test/oracle
vehicle (the multimodal generators' pattern — synthesize real bytes
whose decoded content is a closed form). Grayscale or YCbCr 4:4:4 /
4:2:0, parameterizable quantization; with the default all-ones quant
tables a FLAT image round-trips EXACTLY (solid blocks are DC-only, the
DC coefficient is integral, quantization divides by 1), which is what
makes a lossy codec closed-form oracle-checkable. Huffman tables are
generated canonically (12 DC symbols at 4 bits; 256 AC symbols split
128/128 across 8/9 bits) and emitted in DHT, so any conformant decoder
reads the output.

Everything here derives from the public T.81 spec + JFIF conventions.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_ROWS = np.array([r for r, _c in _ZZ])
_ZZ_COLS = np.array([c for _r, c in _ZZ])

_B8 = None


def _basis8() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: rows are basis vectors."""
    global _B8
    if _B8 is None:
        k = np.arange(8)
        B = np.cos(np.pi / 8 * (k[:, None] + 0.5) * k[None, :]).T
        B[0] *= 1 / np.sqrt(2)
        _B8 = B * 0.5  # sqrt(2/8)
    return _B8


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]):
    """DHT (BITS, HUFFVAL) -> {(length, code): symbol} (decode) and
    {symbol: (code, length)} (encode) — T.81 Annex C code assignment."""
    dec, enc = {}, {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            dec[(length, code)] = vals[k]
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return dec, enc


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment; un-stuffs
    0xFF00 and stops at markers (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:  # stuffed
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker reached: spec pads the tail with 1-bits
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Byte-align and consume one RSTn marker; returns its index."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] != 0xFF or d[self.pos + 1] == 0x00:
            self.pos += 1
        m = d[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RST marker, found 0xFF{m:02X}")
        self.pos += 2
        return m - 0xD0


def _decode_huff(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | br.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
        if length > 16:
            raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude to a signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 (h, w, ch) with ch in {1, 3}. Baseline
    sequential only (SOF0/SOF1); progressive and arithmetic raise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI marker)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart = 0
    i = 2
    while True:
        if data[i] != 0xFF:
            raise ValueError("marker expected in header stream")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before the
        # marker code byte
        while data[i + 1] == 0xFF:
            i += 1
        marker = data[i + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (TEM, RSTn): no length segment follows
            i += 2
            continue
        if marker == 0xD9:
            raise ValueError("EOI before SOS (no image data)")
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        seg = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                dec, _enc = _canonical_codes(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise ValueError(
                "progressive JPEG (SOF2) is not supported by the pure "
                "baseline decoder — PIL handles it when importable"
            )
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — scan follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tt >> 4, tt & 15)
            data_start = i + 2 + seglen
            return _decode_scan(
                data, data_start, frame, scan, qt, huff_dc, huff_ac, restart
            )
        i += 2 + seglen


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart):
    B = _basis8()
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    expected_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                got = br.align_to_marker()
                if got != expected_rst:
                    raise ValueError(
                        f"restart marker out of order (RST{got}, "
                        f"expected RST{expected_rst})"
                    )
                expected_rst = (expected_rst + 1) & 7
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = scan[c["id"]]
                dc_tbl, ac_tbl = huff_dc[dct], huff_ac[act]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = _decode_huff(br, dc_tbl)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_tbl)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = np.zeros((8, 8), dtype=np.float64)
                        coef[_ZZ_ROWS, _ZZ_COLS] = zz * q
                        blk = B.T @ coef @ B + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            n_mcu += 1
    # upsample each component to full resolution and crop
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        gray = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(out) == 3:
        y, cb, cr = out
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"unsupported component count {len(out)}")


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _gen_huff_spec(n_symbols: int):
    """Canonical BITS/HUFFVAL covering symbols 0..n_symbols-1. DC (12
    symbols) fits at 4 bits; AC (256) splits 128 at 8 bits + 128 at 9 —
    valid Kraft sums, and the all-ones code of each length stays
    unassigned (T.81 convention)."""
    if n_symbols <= 12:
        bits = [0] * 16
        bits[3] = n_symbols  # length 4
        return bits, list(range(n_symbols))
    bits = [0] * 16
    bits[7] = 128  # length 8
    bits[8] = n_symbols - 128  # length 9
    return bits, list(range(n_symbols))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            b = (self.acc << (8 - self.n)) & 0xFF
            b |= (1 << (8 - self.n)) - 1  # pad with 1-bits
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n = 0
            self.acc = 0


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _mag(v: int) -> tuple[int, int]:
    """(size s, s-bit magnitude code) for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def _encode_block(bw, blk, q, pred, enc_dc, enc_ac, B):
    coef = B @ (blk - 128.0) @ B.T
    zz = np.round(coef[_ZZ_ROWS, _ZZ_COLS] / q).astype(np.int64)
    diff = int(zz[0]) - pred
    s, m = _mag(diff)
    c, ln = enc_dc[s]
    bw.write(c, ln)
    if s:
        bw.write(m, s)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = enc_ac[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        s, m = _mag(v)
        c, ln = enc_ac[(run << 4) | s]
        bw.write(c, ln)
        bw.write(m, s)
        run = 0
    if last_nz < 63:
        c, ln = enc_ac[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    *,
    quant: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB -> baseline
    JPEG bytes. Default quant is ALL ONES (flat content round-trips
    exactly); pass a 64-entry zigzag-order table for lossy encoding.
    ``subsampling``: "444" or "420" (RGB only). ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    color = a.ndim == 3
    if color and a.shape[2] != 3:
        raise ValueError("encode_jpeg expects grayscale or 3-channel RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = a.shape[:2]
    q = (
        np.ones(64, dtype=np.int32)
        if quant is None
        else np.asarray(quant, dtype=np.int32).reshape(64)
    )
    B = _basis8()

    if color:
        f = a.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2]
        cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2]
        planes = [np.round(y), np.round(cb), np.round(cr)]
        if subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
    else:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # pad each plane (edge replication) to its own MCU-aligned grid,
    # downsampling chroma by box mean first when subsampled
    padded = []
    for pi, p in enumerate(planes):
        sh, sv = samp[pi]
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            ph, pw = -(-p.shape[0] // fy) * fy, -(-p.shape[1] // fx) * fx
            p2 = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
            p = p2.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
            p = np.round(p)
        th, tw = mcuy * sv * 8, mcux * sh * 8
        p = np.pad(
            p,
            ((0, th - p.shape[0]), (0, tw - p.shape[1])),
            mode="edge",
        )
        padded.append(p)

    dc_bits, dc_vals = _gen_huff_spec(12)
    ac_bits, ac_vals = _gen_huff_spec(256)
    _dec_dc, enc_dc = _canonical_codes(dc_bits, dc_vals)
    _dec_ac, enc_ac = _canonical_codes(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )  # APP0
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))  # DQT id 0
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * ncomp
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(
                            bw, blk, q, pred[ci], enc_dc, enc_ac, B
                        )
            n_mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
