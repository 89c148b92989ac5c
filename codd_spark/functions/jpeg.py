"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Decoder: baseline sequential (SOF0/1) AND progressive (SOF2) JPEGs —
grayscale or YCbCr with arbitrary sampling factors (4:4:4 / 4:2:2 /
4:2:0 / ...), 8/16-bit quant tables, restart intervals, byte stuffing;
progressive covers the full Annex G feature matrix (spectral selection,
successive approximation, DC/AC refinement scans, EOB runs — r10,
closing VERDICT r9's "real web corpora are largely progressive" gap).
Arithmetic coding and hierarchical modes are rejected with a clear
error (the PIL upgrade path in functions/codecs.py covers them when
available). The IDCT is the exact
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
    sequential (SOF0/SOF1) and progressive (SOF2 — spectral selection
    AND successive approximation, DC + AC refinement scans, EOB runs,
    restarts; T.81 Annex G, r10); arithmetic coding and hierarchical
    modes raise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI marker)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart = 0
    coefs = None  # progressive: per-component (by, bx, 64) int32 buffers
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
            if frame is not None and frame.get("progressive") and coefs:
                return _finish_progressive(frame, coefs, qt)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — scan follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            scan_comps = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tt >> 4, tt & 15)
                scan_comps.append(cid)
            data_start = i + 2 + seglen
            if not frame["progressive"]:
                return _decode_scan(
                    data, data_start, frame, scan, qt, huff_dc, huff_ac, restart
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coefs is None:
                coefs = _alloc_coef_buffers(frame)
            i = _decode_progressive_scan(
                data,
                data_start,
                frame,
                scan_comps,
                scan,
                huff_dc,
                huff_ac,
                restart,
                coefs,
                ss,
                se,
                ahal >> 4,
                ahal & 15,
            )
            continue
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
    return _planes_to_image(planes, comps, w, h, hmax, vmax)


def _planes_to_image(planes, comps, w, h, hmax, vmax) -> np.ndarray:
    """Upsample each component plane to full resolution, crop to (h, w),
    color-convert — shared by the baseline and progressive paths."""
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
# progressive decode (T.81 Annex G)
# ---------------------------------------------------------------------------

def _comp_block_dims(frame, c) -> tuple[int, int, int, int]:
    """((padded_by, padded_bx), (true_by, true_bx)) block-grid dims of a
    component: the padded grid is the interleaved-MCU layout (coef
    buffers use it); non-interleaved scans walk only the TRUE grid
    (ceil of the component's own sampled dimensions — T.81 A.2.2)."""
    hmax = max(k["h"] for k in frame["comps"])
    vmax = max(k["v"] for k in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    cw = -(-(frame["w"] * c["h"]) // hmax)  # ceil: component sample dims
    ch = -(-(frame["h"] * c["v"]) // vmax)
    true_bx = -(-cw // 8)
    true_by = -(-ch // 8)
    return mcuy * c["v"], mcux * c["h"], true_by, true_bx


def _alloc_coef_buffers(frame) -> list[np.ndarray]:
    out = []
    for c in frame["comps"]:
        pby, pbx, _tby, _tbx = _comp_block_dims(frame, c)
        out.append(np.zeros((pby, pbx, 64), dtype=np.int32))
    return out


def _next_marker_pos(data: bytes, pos: int) -> int:
    """First index at/after ``pos`` of a real marker (0xFF + non-zero,
    non-RST code) — where the header walk resumes after a scan."""
    n = len(data)
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00:  # stuffed byte
            pos += 2
        elif nxt == 0xFF:  # fill
            pos += 1
        elif 0xD0 <= nxt <= 0xD7:  # stray RST at scan tail
            pos += 2
        else:
            return pos
    raise ValueError("ran off the end of the JPEG stream inside a scan")


def _decode_progressive_scan(
    data, pos, frame, scan_comps, scan, huff_dc, huff_ac, restart,
    coefs, ss, se, ah, al,
):
    """Decode ONE progressive scan into the coefficient buffers and
    return the stream position of the next marker. Four scan kinds
    (T.81 G.2): DC first (Ss=0, Ah=0 — baseline DIFF decoding, values
    scaled by 2^Al), DC refinement (Ah>0 — one bit per block), AC first
    (band Ss..Se, EOB-run coded), AC refinement (correction bits for
    already-nonzero coefficients + newly-significant +-2^Al). DC scans
    may interleave components in MCU order; AC scans are single-
    component by construction (B.2.3)."""
    comps = frame["comps"]
    by_id = {c["id"]: k for k, c in enumerate(comps)}
    br = _BitReader(data, pos)
    ns = len(scan_comps)
    # B.2.3 progressive scan constraints: DC scans carry only the DC
    # coefficient; AC bands are single-component (a baseline-style
    # 0..63 interleaved scan inside SOF2 is malformed, not decodable)
    if ss == 0 and se != 0:
        raise ValueError(
            "invalid progressive scan: a DC scan requires Se=0 (a "
            "baseline-style full-band scan cannot appear under SOF2)"
        )
    if ss > 0 and ns != 1:
        raise ValueError(
            "invalid progressive scan: AC scans must be single-component"
        )
    if ss == 0 and ns > 1:
        # interleaved DC scan: MCU walk over the padded grid
        hmax = max(k["h"] for k in comps)
        vmax = max(k["v"] for k in comps)
        mcux = -(-frame["w"] // (8 * hmax))
        mcuy = -(-frame["h"] // (8 * vmax))
        units = []  # (comp_idx, block_y, block_x) per MCU in order
        for my in range(mcuy):
            for mx in range(mcux):
                mcu = []
                for cid in scan_comps:
                    ci = by_id[cid]
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            mcu.append((ci, my * c["v"] + by, mx * c["h"] + bx))
                units.append(mcu)
    else:
        ci = by_id[scan_comps[0]]
        c = comps[ci]
        _pby, _pbx, tby, tbx = _comp_block_dims(frame, c)
        units = [
            [(ci, by, bx)] for by in range(tby) for bx in range(tbx)
        ]

    pred = {k: 0 for k in range(len(comps))}
    eobrun = 0
    expected_rst = 0
    p1, m1 = 1 << al, -(1 << al)

    def refine_nonzero(zz, k):
        """One correction bit for an already-nonzero coefficient."""
        if br.read_bit() and not (int(zz[k]) & p1):
            zz[k] += p1 if zz[k] > 0 else m1

    for u, mcu in enumerate(units):
        if restart and u and u % restart == 0:
            got = br.align_to_marker()
            if got != expected_rst:
                raise ValueError(
                    f"restart marker out of order (RST{got}, "
                    f"expected RST{expected_rst})"
                )
            expected_rst = (expected_rst + 1) & 7
            pred = {k: 0 for k in range(len(comps))}
            eobrun = 0
        for ci, by, bx in mcu:
            zz = coefs[ci][by, bx]
            if ss == 0:  # DC scan (Se must be 0 per B.2.3)
                if ah == 0:
                    dct, _act = scan[comps[ci]["id"]]
                    s = _decode_huff(br, huff_dc[dct])
                    diff = _extend(br.read_bits(s), s) if s else 0
                    pred[ci] += diff
                    zz[0] = pred[ci] << al
                else:  # DC refinement: append bit Al
                    if br.read_bit():
                        zz[0] = int(zz[0]) | p1
                continue
            _dct, act = scan[comps[ci]["id"]]
            tbl = huff_ac[act]
            if ah == 0:  # AC first scan for this band/precision
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _decode_huff(br, tbl)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past band end")
                    zz[k] = _extend(br.read_bits(s), s) << al
                    k += 1
            else:  # AC refinement (G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _decode_huff(br, tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:  # EOBn: run of blocks
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            newval = 0  # ZRL: 16 zero-history positions
                        elif s == 1:
                            newval = p1 if br.read_bit() else m1
                        else:
                            raise ValueError(
                                "AC refinement size must be 0 or 1"
                            )
                        # advance r zero-HISTORY positions, reading one
                        # correction bit at each nonzero coefficient
                        while k <= se:
                            if int(zz[k]) != 0:
                                refine_nonzero(zz, k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if k <= se:
                            if s:  # newly significant lands here; a
                                zz[k] = newval  # ZRL leaves its 16th
                            k += 1  # zero in place — both consume k
                # inside an EOB run (including the tail of the block that
                # started it): corrections for remaining nonzero coeffs
                if eobrun:
                    while k <= se:
                        if int(zz[k]) != 0:
                            refine_nonzero(zz, k)
                        k += 1
                    eobrun -= 1
    return _next_marker_pos(data, br.pos)


def _finish_progressive(frame, coefs, qt) -> np.ndarray:
    """Dequantize + inverse DCT the accumulated coefficient buffers."""
    B = _basis8()
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        pby, pbx, _tby, _tbx = _comp_block_dims(frame, c)
        q = qt[c["tq"]]
        plane = np.empty((pby * 8, pbx * 8), dtype=np.float64)
        buf = coefs[ci]
        for by in range(pby):
            for bx in range(pbx):
                coef = np.zeros((8, 8), dtype=np.float64)
                coef[_ZZ_ROWS, _ZZ_COLS] = buf[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    B.T @ coef @ B + 128.0
                )
        planes.append(plane)
    return _planes_to_image(planes, comps, frame["w"], frame["h"], hmax, vmax)


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
    progressive: bool = False,
) -> bytes:
    """uint8 (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB -> baseline
    JPEG bytes. Default quant is ALL ONES (flat content round-trips
    exactly); pass a 64-entry zigzag-order table for lossy encoding.
    ``subsampling``: "444" or "420" (RGB only). ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs.

    ``progressive=True`` emits SOF2 with the libjpeg-shaped scan
    script — interleaved DC first scan at Al=1, DC refinement, two
    per-component spectral AC bands (1-5, 6-63) at Al=1, then one
    per-component AC refinement over 1-63 — exercising every Annex G
    coding mode (spectral selection, successive approximation, EOB
    runs, DC/AC refinement). The quantized coefficients are identical
    to the baseline path's, so progressive output decodes to exactly
    the same pixels."""
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
    out += _seg(0xC2 if progressive else 0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    if progressive:
        out += _emit_progressive_scans(
            w, h, padded, samp, q, B, enc_dc, enc_ac, restart_interval
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)
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


# ---------------------------------------------------------------------------
# progressive encode (T.81 Annex G scan emission)
# ---------------------------------------------------------------------------

def _pt(v: int, al: int) -> int:
    """AC point transform: magnitude truncation toward zero (G.1.2.1)."""
    return v >> al if v >= 0 else -((-v) >> al)


class _EobState:
    """Scan-level EOB-run accumulator; for refinement scans it also
    carries the correction bits of run-absorbed blocks, emitted right
    after the EOBn symbol (G.1.2.3)."""

    def __init__(self, bw, enc_ac):
        self.bw = bw
        self.enc_ac = enc_ac
        self.run = 0
        self.bits: list[int] = []

    def bump(self, bits=()):
        self.run += 1
        self.bits.extend(bits)
        if self.run == 0x7FFF:
            self.flush()

    def flush(self):
        if self.run == 0:
            # pending correction bits may exist without a run only at
            # internal emit points, where the caller writes them itself
            return
        nbits = self.run.bit_length() - 1
        c, ln = self.enc_ac[nbits << 4]
        self.bw.write(c, ln)
        if nbits:
            self.bw.write(self.run & ((1 << nbits) - 1), nbits)
        for b in self.bits:
            self.bw.write(b, 1)
        self.run = 0
        self.bits = []


def _emit_progressive_scans(
    w, h, padded, samp, q, B, enc_dc, enc_ac, restart_interval
) -> bytes:
    """Emit the full progressive scan sequence for the quantized
    coefficient grids: DC(Al=1) interleaved -> DC refine -> per-component
    AC bands (1-5, 6-63) at Al=1 -> per-component AC refine (1-63)."""
    ncomp = len(padded)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantize every block once (padded/interleaved grid per component)
    zzs = []
    for ci in range(ncomp):
        sh, sv = samp[ci]
        pby, pbx = mcuy * sv, mcux * sh
        g = np.empty((pby, pbx, 64), dtype=np.int64)
        for by in range(pby):
            for bx in range(pbx):
                blk = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = B @ (blk - 128.0) @ B.T
                g[by, bx] = np.round(coef[_ZZ_ROWS, _ZZ_COLS] / q)
        zzs.append(g)

    def true_dims(ci):
        sh, sv = samp[ci]
        return -(-(-(-h * sv // vmax)) // 8), -(-(-(-w * sh // hmax)) // 8)

    def sos(specs, ss, se, ah, al):
        p = bytes([len(specs)])
        for cid, tdc, tac in specs:
            p += bytes([cid, (tdc << 4) | tac])
        return _seg(0xDA, p + bytes([ss, se, (ah << 4) | al]))

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                mcu = []
                for ci in range(ncomp):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            mcu.append((ci, my * sv + by, mx * sh + bx))
                yield mcu

    out = bytearray()

    def restart_points(bw, u, before):
        """Emit RSTn before MCU u when the interval says so. ``before``
        runs FIRST — an AC scan must flush its pending EOB run into the
        bitstream before the byte-aligned marker, not after it."""
        if restart_interval and u and u % restart_interval == 0:
            before()
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (restart_points.n & 7)])
            restart_points.n += 1

    # --- scan 1: DC first, interleaved, Al=1 ---------------------------
    al = 1
    out += sos([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 0, al)
    bw = _BitWriter()
    pred = [0] * ncomp
    restart_points.n = 0

    def _reset_dc():
        nonlocal pred
        pred = [0] * ncomp

    for u, mcu in enumerate(mcu_blocks()):
        restart_points(bw, u, _reset_dc)
        for ci, by, bx in mcu:
            v = int(zzs[ci][by, bx, 0]) >> al  # arithmetic: floor
            diff = v - pred[ci]
            pred[ci] = v
            s, m = _mag(diff)
            c, ln = enc_dc[s]
            bw.write(c, ln)
            if s:
                bw.write(m, s)
    bw.flush()
    out += bw.out

    # --- scan 2: DC refinement, Ah=1 Al=0 (raw bits, no Huffman) -------
    out += sos([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0)
    bw = _BitWriter()
    restart_points.n = 0
    for u, mcu in enumerate(mcu_blocks()):
        restart_points(bw, u, lambda: None)
        for ci, by, bx in mcu:
            bw.write(int(zzs[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    out += bw.out

    # --- AC first scans: two spectral bands per component at Al=1 ------
    for ss_, se_ in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            out += sos([(ci + 1, 0, 0)], ss_, se_, 0, al)
            bw = _BitWriter()
            eob = _EobState(bw, enc_ac)
            restart_points.n = 0
            tby, tbx = true_dims(ci)
            u = 0
            for by in range(tby):
                for bx in range(tbx):
                    restart_points(bw, u, eob.flush)
                    u += 1
                    zz = zzs[ci][by, bx]
                    vals = [_pt(int(zz[k]), al) for k in range(ss_, se_ + 1)]
                    if not any(vals):
                        eob.bump()
                        continue
                    eob.flush()
                    r = 0
                    last_nz = max(i for i, v in enumerate(vals) if v)
                    for i, v in enumerate(vals[: last_nz + 1]):
                        if v == 0:
                            r += 1
                            continue
                        while r > 15:
                            c, ln = enc_ac[0xF0]
                            bw.write(c, ln)
                            r -= 16
                        s, m = _mag(v)
                        c, ln = enc_ac[(r << 4) | s]
                        bw.write(c, ln)
                        bw.write(m, s)
                        r = 0
                    if last_nz < len(vals) - 1:
                        eob.bump()
            eob.flush()
            bw.flush()
            out += bw.out

    # --- AC refinement: Ss=1 Se=63, Ah=1 Al=0 per component ------------
    for ci in range(ncomp):
        out += sos([(ci + 1, 0, 0)], 1, 63, al, 0)
        bw = _BitWriter()
        eob = _EobState(bw, enc_ac)
        restart_points.n = 0
        tby, tbx = true_dims(ci)
        u = 0
        for by in range(tby):
            for bx in range(tbx):
                restart_points(bw, u, eob.flush)
                u += 1
                zz = zzs[ci][by, bx]
                absv = [abs(int(zz[k])) for k in range(1, 64)]
                eobpos = -1  # index (in band) of last NEWLY significant
                for i, t in enumerate(absv):
                    if t == 1:
                        eobpos = i
                r = 0
                br_bits: list[int] = []
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    if t > 1:  # history coefficient: one correction bit
                        br_bits.append(t & 1)
                        continue
                    # newly significant (t == 1)
                    while r > 15 and i <= eobpos:
                        eob.flush()
                        c, ln = enc_ac[0xF0]
                        bw.write(c, ln)
                        r -= 16
                        for b in br_bits:
                            bw.write(b, 1)
                        br_bits = []
                    eob.flush()
                    c, ln = enc_ac[(r << 4) | 1]
                    bw.write(c, ln)
                    bw.write(0 if int(zz[i + 1]) < 0 else 1, 1)
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    eob.bump(br_bits)
        eob.flush()
        bw.flush()
        out += bw.out
    return bytes(out)
