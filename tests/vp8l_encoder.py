"""Hand-written VP8L encoder used ONLY as a test oracle.

Written independently from the WebP Lossless Bitstream Specification
(RFC 9649) so that round-trip tests exercise the decoder against a
second implementation of the format: LSB-first bit packing, heap-built
Huffman lengths canonicalized DEFLATE-style, the 19-symbol code-length
code (emitted without RLE for simplicity), optional color cache, LZ77
run tokens, and forward transforms (subtract-green, uniform-mode
predictor, color transform, color-indexing with pixel packing, and a
two-group meta split). Only spec constants (code-length order, cache
hash multiplier, prefix-value ranges) are shared with the decoder —
no code or tables are imported from it.
"""
from __future__ import annotations

import heapq
import struct

_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14,
              15)


class BitW:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, v: int, k: int) -> None:
        for i in range(k):
            self.bits.append((v >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


def huff_lengths(freqs: dict[int, int], cap: int) -> dict[int, int]:
    """Code lengths via plain heap Huffman; asserts the depth cap (test
    alphabets are small enough that package-merge is unnecessary)."""
    items = sorted(freqs.items())
    if len(items) == 1:
        return {items[0][0]: 1}
    heap = [(f, i, [s]) for i, (s, f) in enumerate(items)]
    heapq.heapify(heap)
    depth = {s: 0 for s in freqs}
    tick = len(items)
    while len(heap) > 1:
        fa, _, sa = heapq.heappop(heap)
        fb, _, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, tick, sa + sb))
        tick += 1
    assert max(depth.values()) <= cap, "test alphabet exceeded depth cap"
    return depth


def canon_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, MSB-first code), DEFLATE canonical order."""
    out = {}
    code = 0
    prev = 0
    for l, s in sorted((l, s) for s, l in lengths.items() if l > 0):
        code <<= (l - prev)
        out[s] = (l, code)
        code += 1
        prev = l
    return out


def put_code(bw: BitW, codes: dict[int, tuple[int, int]], sym: int) -> None:
    l, c = codes[sym]
    for i in range(l - 1, -1, -1):             # MSB of the code first
        bw.put((c >> i) & 1, 1)


def write_prefix_code(bw: BitW, lengths: dict[int, int],
                      alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Emit one prefix code; returns the symbol codes for payload use."""
    used = {s: l for s, l in lengths.items() if l > 0}
    if len(used) <= 2 and all(s < 256 for s in used):
        bw.put(1, 1)                           # simple code
        syms = sorted(used)
        bw.put(len(syms) - 1, 1)
        if syms[0] > 1:
            bw.put(1, 1)                       # 8-bit first symbol
            bw.put(syms[0], 8)
        else:
            bw.put(0, 1)
            bw.put(syms[0], 1)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        bw.put(syms[1], 8)
        return {syms[0]: (1, 0), syms[1]: (1, 1)}
    bw.put(0, 1)                               # normal code
    # full code-length sequence, one code-length symbol per alphabet slot
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    clc_freq: dict[int, int] = {}
    for v in seq:
        clc_freq[v] = clc_freq.get(v, 0) + 1
    clc_lengths = huff_lengths(clc_freq, 7)
    bw.put(19 - 4, 4)                          # num_code_lengths = 19
    for s in _CLC_ORDER:
        bw.put(clc_lengths.get(s, 0), 3)
    clc_codes = canon_codes(clc_lengths)
    bw.put(0, 1)                               # no max_symbol bound
    if len(clc_codes) > 1:
        for v in seq:
            put_code(bw, clc_codes, v)
    # a code with ONE used symbol decodes as 0 bits per occurrence
    if len(used) == 1:
        return {next(iter(used)): (0, 0)}
    return canon_codes(used)


def prefix_encode(v: int) -> tuple[int, int, int]:
    """value >= 1 -> (prefix code, extra bit count, extra bits)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    n = x.bit_length() - 1
    b = 1 if x >= 3 * (1 << (n - 1)) else 0
    offset = (2 + b) << (n - 1)
    return 2 * n + b, n - 1, x - offset


def _cache_slot(pix: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * pix) & 0xFFFFFFFF) >> (32 - cache_bits)


def tokenize(argb: list[int], cache_bits: int = 0,
             lz77_runs: bool = False) -> list[tuple]:
    """('lit', pix) / ('cache', slot) / ('copy', length, distance).
    Greedy: dist-1 runs when lz77_runs, then cache hits, then literals.
    Copied pixels update the cache exactly as the decoder must."""
    cache = [None] * (1 << cache_bits) if cache_bits else None
    toks: list[tuple] = []
    i = 0
    n = len(argb)
    while i < n:
        if lz77_runs and i > 0 and argb[i] == argb[i - 1]:
            run = 0
            while i + run < n and argb[i + run] == argb[i - 1]:
                run += 1
            if run >= 3:
                toks.append(("copy", run, 1))
                if cache is not None:
                    for k in range(run):
                        cache[_cache_slot(argb[i + k], cache_bits)] = \
                            argb[i + k]
                i += run
                continue
        pix = argb[i]
        slot = _cache_slot(pix, cache_bits) if cache is not None else 0
        if cache is not None and cache[slot] == pix:
            toks.append(("cache", slot))
        else:
            toks.append(("lit", pix))
            if cache is not None:
                cache[slot] = pix
        i += 1
    return toks


def write_image_data(bw: BitW, toks_by_group: list[list[tuple]],
                     order: list[int], cache_bits: int) -> None:
    """Emit prefix-code groups + the token stream. toks_by_group holds
    each group's tokens for frequency counting; order gives the group of
    each consecutive token (flattened emission order)."""
    cache_syms = (1 << cache_bits) if cache_bits else 0
    group_codes = []
    for toks in toks_by_group:
        gfreq: dict[int, int] = {}
        rfreq: dict[int, int] = {}
        bfreq: dict[int, int] = {}
        afreq: dict[int, int] = {}
        dfreq: dict[int, int] = {}
        for t in toks:
            if t[0] == "lit":
                pix = t[1]
                gfreq[(pix >> 8) & 0xFF] = gfreq.get((pix >> 8) & 0xFF,
                                                     0) + 1
                rfreq[(pix >> 16) & 0xFF] = rfreq.get((pix >> 16) & 0xFF,
                                                      0) + 1
                bfreq[pix & 0xFF] = bfreq.get(pix & 0xFF, 0) + 1
                afreq[pix >> 24] = afreq.get(pix >> 24, 0) + 1
            elif t[0] == "cache":
                s = 256 + 24 + t[1]
                gfreq[s] = gfreq.get(s, 0) + 1
            else:
                # 'copy': plain distance (code = dist + 120);
                # 'copym': raw dist_code, for exercising the 2-D map
                lp, _, _ = prefix_encode(t[1])
                gfreq[256 + lp] = gfreq.get(256 + lp, 0) + 1
                dcode = t[2] + 120 if t[0] == "copy" else t[2]
                dp, _, _ = prefix_encode(dcode)
                dfreq[dp] = dfreq.get(dp, 0) + 1
        for f in (rfreq, bfreq, afreq):
            if not f:
                f[0] = 1                       # unused channel: 1-sym code
        if not dfreq:
            dfreq[0] = 1
        gc = write_prefix_code(bw, huff_lengths(gfreq, 15),
                               256 + 24 + cache_syms)
        rc = write_prefix_code(bw, huff_lengths(rfreq, 15), 256)
        bc = write_prefix_code(bw, huff_lengths(bfreq, 15), 256)
        ac = write_prefix_code(bw, huff_lengths(afreq, 15), 256)
        dc = write_prefix_code(bw, huff_lengths(dfreq, 15), 40)
        group_codes.append((gc, rc, bc, ac, dc))
    flat = [t for toks in toks_by_group for t in toks]
    assert len(flat) == len(order)
    # re-flatten in true emission order: order[j] names the group of the
    # j-th token; pull tokens from per-group queues
    queues = [list(reversed(toks)) for toks in toks_by_group]
    for gi in order:
        gc, rc, bc, ac, dc = group_codes[gi]
        t = queues[gi].pop()
        if t[0] == "lit":
            pix = t[1]
            put_code(bw, gc, (pix >> 8) & 0xFF)
            put_code(bw, rc, (pix >> 16) & 0xFF)
            put_code(bw, bc, pix & 0xFF)
            put_code(bw, ac, pix >> 24)
        elif t[0] == "cache":
            put_code(bw, gc, 256 + 24 + t[1])
        else:
            lp, leb, lex = prefix_encode(t[1])
            put_code(bw, gc, 256 + lp)
            bw.put(lex, leb)
            dcode = t[2] + 120 if t[0] == "copy" else t[2]
            dp, deb, dex = prefix_encode(dcode)
            put_code(bw, dc, dp)
            bw.put(dex, deb)


def write_entropy_image(bw: BitW, argb: list[int], cache_bits: int = 0,
                        lz77_runs: bool = False) -> None:
    """Sub-resolution image: cache info + ONE group + data."""
    bw.put(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.put(cache_bits, 4)
    toks = tokenize(argb, cache_bits, lz77_runs)
    write_image_data(bw, [toks], [0] * len(toks), cache_bits)


def _sub(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _cdelta(t: int, c: int) -> int:
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def encode_vp8l(argb: list[int], w: int, h: int, *, cache_bits: int = 0,
                lz77_runs: bool = False, subtract_green: bool = False,
                predictor_mode: int | None = None, pred_bits: int = 4,
                color_cte: int | None = None, palette: list[int]
                | None = None, meta_split: int | None = None) -> bytes:
    """Full RIFF/WEBP file with one VP8L chunk encoding `argb` (flat
    row-major, packed 0xAARRGGBB). Transform combinations are applied
    forward in the order the decoder will read them."""
    px = list(argb)
    bw = BitW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)                               # alpha hint
    bw.put(0, 3)                               # version
    xsize = w

    if predictor_mode is not None:
        bw.put(1, 1)
        bw.put(0, 2)
        bw.put(pred_bits - 2, 3)
        mw, mh = _sub(xsize, pred_bits), _sub(h, pred_bits)
        write_entropy_image(
            bw, [0xFF000000 | (predictor_mode << 8)] * (mw * mh))
        res = [0] * (xsize * h)
        for y in range(h):
            for x in range(xsize):
                i = y * xsize + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[i - 1]
                elif x == 0:
                    pred = px[i - xsize]
                else:
                    L, T = px[i - 1], px[i - xsize]
                    TL, TR = px[i - xsize - 1], px[i - xsize + 1]
                    pred = {0: 0xFF000000, 1: L, 2: T, 3: TR, 4: TL,
                            5: _avg(_avg(L, TR), T), 6: _avg(L, TL),
                            7: _avg(L, T), 8: _avg(TL, T),
                            9: _avg(T, TR),
                            10: _avg(_avg(L, TL), _avg(T, TR)),
                            11: _sel(L, T, TL), 12: _casf(L, T, TL),
                            13: _cash(L, T, TL)}[predictor_mode]
                res[i] = _subpix(px[i], pred)
        px = res

    if color_cte is not None:
        bw.put(1, 1)
        bw.put(1, 2)
        bw.put(pred_bits - 2, 3)
        mw, mh = _sub(xsize, pred_bits), _sub(h, pred_bits)
        write_entropy_image(bw, [0xFF000000 | color_cte] * (mw * mh))
        g2r = color_cte & 0xFF
        g2b = (color_cte >> 8) & 0xFF
        r2b = (color_cte >> 16) & 0xFF
        res = []
        for pix in px:
            g = (pix >> 8) & 0xFF
            r_final = (pix >> 16) & 0xFF
            b_final = pix & 0xFF
            r_st = (r_final - _cdelta(g2r, g)) & 0xFF
            b_st = (b_final - _cdelta(g2b, g) - _cdelta(r2b, r_final)) & 0xFF
            res.append((pix & 0xFF00FF00) | (r_st << 16) | b_st)
        px = res

    if subtract_green:
        bw.put(1, 1)
        bw.put(2, 2)
        res = []
        for pix in px:
            g = (pix >> 8) & 0xFF
            r = (((pix >> 16) & 0xFF) - g) & 0xFF
            b = ((pix & 0xFF) - g) & 0xFF
            res.append((pix & 0xFF00FF00) | (r << 16) | b)
        px = res

    if palette is not None:
        bw.put(1, 1)
        bw.put(3, 2)
        bw.put(len(palette) - 1, 8)
        deltas = [palette[0]]
        for k in range(1, len(palette)):
            deltas.append(_subpix(palette[k], palette[k - 1]))
        write_entropy_image(bw, deltas)
        lookup = {p: i for i, p in enumerate(palette)}
        idx = [lookup[p] for p in px]
        if len(palette) <= 2:
            pbits = 3
        elif len(palette) <= 4:
            pbits = 2
        elif len(palette) <= 16:
            pbits = 1
        else:
            pbits = 0
        if pbits:
            ppc = 1 << pbits
            ibits = 8 >> pbits
            packed_w = _sub(xsize, pbits)
            res = []
            for y in range(h):
                for bx in range(packed_w):
                    v = 0
                    for k in range(ppc):
                        x = bx * ppc + k
                        if x < xsize:
                            v |= idx[y * xsize + x] << (ibits * k)
                    res.append(0xFF000000 | (v << 8))
            px = res
            xsize = packed_w
        else:
            px = [0xFF000000 | (i << 8) for i in idx]

    bw.put(0, 1)                               # end of transforms

    # ---- spatially coded main image ----
    bw.put(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.put(cache_bits, 4)
    if meta_split is None:
        bw.put(0, 1)                           # no meta prefix codes
        toks = tokenize(px, cache_bits, lz77_runs)
        write_image_data(bw, [toks], [0] * len(toks), cache_bits)
    else:
        bw.put(1, 1)
        mbits = meta_split
        bw.put(mbits - 2, 3)
        mw, mh = _sub(xsize, mbits), _sub(h, mbits)
        # two groups: left tile columns -> 0, right -> 1 (index packed as
        # (red << 8) | green of the entropy-image pixel)
        meta = []
        for my in range(mh):
            for mx in range(mw):
                gi = 0 if mx < (mw + 1) // 2 else 1
                meta.append(0xFF000000 | (gi << 8))
        write_entropy_image(bw, meta)
        order = []
        for i in range(len(px)):
            x, y = i % xsize, i // xsize
            order.append(0 if (x >> mbits) < (mw + 1) // 2 else 1)
        toks = tokenize(px, cache_bits, False)  # literals/cache only: the
        assert len(toks) == len(px)             # group split is per pixel
        by_group = [[t for t, g in zip(toks, order) if g == 0],
                    [t for t, g in zip(toks, order) if g == 1]]
        write_image_data(bw, by_group, order, cache_bits)

    body = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _avg(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) >> 1) << sh
    return out


def _casf(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _sel(l: int, t: int, tl: int) -> int:
    """RFC Select: per-channel predict L+T-TL; Manhattan distance of the
    predict to L is sum |T-TL| and to T is sum |L-TL| (the L/T terms
    cancel); pick L strictly, T on ties."""
    p_l = sum(abs(((t >> s) & 0xFF) - ((tl >> s) & 0xFF))
              for s in (24, 16, 8, 0))
    p_t = sum(abs(((l >> s) & 0xFF) - ((tl >> s) & 0xFF))
              for s in (24, 16, 8, 0))
    return l if p_l < p_t else t


def _cash(l: int, t: int, tl: int) -> int:
    """RFC ClampAddSubtractHalf over Average2(L,T) and TL, with C-style
    truncation toward zero for the negative half-difference."""
    out = 0
    for s in (24, 16, 8, 0):
        a = ((((l >> s) & 0xFF) + ((t >> s) & 0xFF)) >> 1)
        d = a - ((tl >> s) & 0xFF)
        q = d // 2 if d >= 0 else -((-d) // 2)
        v = a + q
        out |= (0 if v < 0 else 255 if v > 255 else v) << s
    return out


def _subpix(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) - ((b >> sh) & 0xFF)) & 0xFF) << sh
    return out
