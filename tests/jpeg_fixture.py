"""Minimal baseline-JPEG ENCODER — test fixture only.

Produces spec-conformant sequential-DCT JPEGs (SOI/DQT/SOF0/DHT/SOS/
EOI) so the pure-numpy decoder in piglet_spark.datapipe.multimodal can
be round-trip-tested without PIL/cv2 in the container. Supports
grayscale, 4:4:4 and 4:2:0 color, and restart intervals. Huffman
tables are per-image canonical tables with all codes at length 8
(valid: each image uses far fewer than 255 distinct symbols).
"""

from __future__ import annotations

import struct

import numpy as np

from piglet_spark.datapipe.multimodal import _ZIGZAG, _idct_matrix

_M = _idct_matrix()  # forward DCT: F = M @ (f - 128) @ M.T

# standard luminance/chrominance tables (Annex K) scaled down 4x for
# decent round-trip fidelity, floor 1
_STD_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
_STD_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])
_QL = np.maximum(_STD_LUMA // 4, 1)   # raster order
_QC = np.maximum(_STD_CHROMA // 4, 1)


def _size_cat(v: int) -> int:
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.put(1, 1)  # pad with 1s (spec F.1.2.3)


def _encode_value(v: int) -> tuple[int, int]:
    """(size category, raw bits) for a DC diff / AC coefficient."""
    s = _size_cat(v)
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _block_symbols(zz: np.ndarray, pred: int):
    """(dc_symbol, dc_bits), [(ac_symbol, ac_bits), ...], new pred."""
    diff = int(zz[0]) - pred
    dsym, dbits = _encode_value(diff)
    dc = (dsym, dbits)
    acs = []
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, 64):
        if k > last_nz:
            acs.append((0x00, (0, 0)))  # EOB
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        s, bits = _encode_value(v)
        acs.append(((run << 4) | s, (s, bits)))
        run = 0
    return dc, acs, int(zz[0])


def _canonical_table(symbols: set[int]):
    """All-length-8 canonical Huffman table: (counts16, ordered syms,
    {sym: (code, len)})."""
    ordered = sorted(symbols)
    assert len(ordered) <= 255
    counts = [0] * 16
    counts[7] = len(ordered)
    codes = {s: (i, 8) for i, s in enumerate(ordered)}
    return counts, ordered, codes


def _blocks_of(plane: np.ndarray):
    """Pad to 8-multiples (edge-replicate) and yield quantized-ready
    8x8 spatial blocks in raster block order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane.astype(np.float64), ((0, ph - h), (0, pw - w)),
                    mode="edge")
    for by in range(ph // 8):
        for bx in range(pw // 8):
            yield padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coeff = _M @ (block - 128.0) @ _M.T
    zz = np.round(coeff.reshape(-1)[_ZIGZAG] / q[_ZIGZAG]).astype(int)
    return zz


def encode_jpeg(px: np.ndarray, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """px: (h, w) or (h, w, 1) grayscale, or (h, w, 3) RGB uint8."""
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        qids = [0]
        samps = [(1, 1)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:  # 4:2:0 — mean-pool chroma 2x2
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def pool(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            planes = [y, pool(cb), pool(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
        qids = [0, 1, 1]
    qts = {0: _QL, 1: _QC}

    # MCU-ordered block stream per component
    max_h = max(s[0] for s in samps)
    max_v = max(s[1] for s in samps)
    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))
    comp_blocks = []
    for plane, (hs, vs), qid in zip(planes, samps, qids):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        pad = np.pad(plane, ((0, ph - plane.shape[0]),
                             (0, pw - plane.shape[1])), mode="edge")
        grid = {}
        for i, blk in enumerate(_blocks_of(pad)):
            by, bx = divmod(i, pw // 8)
            grid[(by, bx)] = _fdct_quant(blk, qts[qid])
        comp_blocks.append(grid)

    # pass 1: symbols per MCU (with restart-aware DC prediction)
    dc_syms: list[set[int]] = [set() for _ in range(2)]
    ac_syms: list[set[int]] = [set() for _ in range(2)]
    mcu_payloads = []
    preds = [0] * len(planes)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                preds = [0] * len(planes)
            items = []
            for ci, (hs, vs) in enumerate(samps):
                t = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        zz = comp_blocks[ci][(my * vs + by, mx * hs + bx)]
                        dc, acs, dcv = _block_symbols(zz, preds[ci])
                        preds[ci] = dcv
                        dc_syms[t].add(dc[0])
                        ac_syms[t].update(s for s, _ in acs)
                        items.append((t, dc, acs))
            mcu_payloads.append(items)
            mcu_n += 1

    n_t = 1 if gray else 2
    dc_tabs = [_canonical_table(dc_syms[t] or {0}) for t in range(n_t)]
    ac_tabs = [_canonical_table(ac_syms[t] or {0}) for t in range(n_t)]

    # pass 2: bitstream
    bw = _BitWriter()
    scan = bytearray()
    rst = 0
    for i, items in enumerate(mcu_payloads):
        if restart_interval and i and i % restart_interval == 0:
            bw.flush()
            scan += bw.out
            scan += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
        for t, (dsym, dbits), acs in items:
            code, ln = dc_tabs[t][2][dsym]
            bw.put(code, ln)
            if dsym:  # dbits raw bits, size category == dsym
                bw.put(dbits, dsym)
            for sym, (asz, abits) in acs:
                code, ln = ac_tabs[t][2][sym]
                bw.put(code, ln)
                if asz:
                    bw.put(abits, asz)
    bw.flush()
    scan += bw.out

    # ---- assemble segments
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    for qid in sorted(set(qids)):
        seg(0xDB, bytes([qid]) + bytes(
            int(qts[qid][z]) for z in _ZIGZAG))
    ncomp = 1 if gray else 3
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samps[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qids[ci]])
    seg(0xC0, bytes(sof))
    for t in range(n_t):
        for cls, (counts, ordered, _) in ((0, dc_tabs[t]), (1, ac_tabs[t])):
            seg(0xC4, bytes([(cls << 4) | t]) + bytes(counts)
                + bytes(ordered))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))
    out.extend(scan)
    out.extend(b"\xff\xd9")
    return bytes(out)
