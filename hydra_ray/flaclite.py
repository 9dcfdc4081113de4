"""flaclite — a real FLAC-subset codec in pure numpy (no external libs).

Implements the actual FLAC bitstream (RFC 9639 framing): ``fLaC`` marker +
STREAMINFO metadata block; frames with the 14-bit sync code, 4-bit
blocksize/sample-rate codes, UTF-8-coded frame number, header CRC-8
(poly 0x07) and frame CRC-16 (poly 0x8005); subframes of type CONSTANT,
VERBATIM and FIXED (orders 0–4) with Rice-coded residuals (4-bit
parameter, any partition order, escape-to-raw supported on decode).

Subset boundaries (explicit, DLQ-routed as ``DecodeError`` — mirroring
the reference's unsupported-type rejection, `JsonConverter.java:94-97`):
mono, 16-bit only; wasted-bits are NOT decoded.  LPC subframes (orders
1-32, any precision/shift) ARE decoded — the reconstruction recursion
x[i] = ((Σ c_j·x[i−1−j]) >> shift) + r[i] is inherently sequential, so
the LPC path costs O(blocksize·order) Python per frame (~tens of ms);
the encoder emits FIXED predictors (vectorized decode) by default and
LPC only when asked (``use_lpc=True``, fixed-equivalent coefficients —
exercised by tests for real-world-stream compatibility).  Everything
inside the subset is real FLAC: the encoder picks the best fixed
predictor order and Rice parameter per frame, and encode→decode is
bit-lossless on int16 samples.

Performance notes (this is the interesting part at 100 TB):
- Rice DECODE is vectorized with a pointer-doubling orbit: unpack the
  payload's bits once, take the prefix-sum of ones ``C`` and the ones
  positions; the "index of the next code terminator" is then a pure
  gather ``f[j] = C[ones_pos[j] + k + 1]``, and the whole partition's
  terminator sequence is filled in log2(m) vectorized gathers
  (out[s:2s] = f^s[out[:s]]) — no Python loop over residuals.
- Rice ENCODE scatters all terminator/remainder bits with numpy ops
  (one pass per remainder bit position, k ≤ 14 passes).
- CRCs are 256-entry-LUT byte loops (few thousand Python steps per
  frame); frame CRC verification is optional on decode for bulk paths.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_flac", "decode_flac", "FlacError"]


class FlacError(ValueError):
    """Malformed or out-of-subset FLAC payload."""


# ---------------------------------------------------------------- CRC LUTs
def _crc_lut(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    lut = np.empty(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if (r & top) else (r << 1)
        lut[b] = r & mask
    return lut


_CRC8_LUT = _crc_lut(0x07, 8)
_CRC16_LUT = _crc_lut(0x8005, 16)


def _crc8(data: bytes | np.ndarray) -> int:
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    r = 0
    lut = _CRC8_LUT
    for b in arr:
        r = int(lut[r ^ b])
    return r


def _crc16_serial(arr: np.ndarray, r: int = 0) -> int:
    lut = _CRC16_LUT
    for b in arr:
        r = int(lut[((r >> 8) ^ b) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


_CRC16_SHIFT_BASIS: dict[int, list[int]] = {}


def _crc16_shift_basis(nbytes: int) -> list[int]:
    """Images of the 16 CRC state basis bits after ``nbytes`` zero bytes.
    The table CRC (init 0, no xor-out) is linear over GF(2), so passing
    any state through n zero bytes is the XOR of its set bits' images."""
    basis = _CRC16_SHIFT_BASIS.get(nbytes)
    if basis is None:
        z = np.zeros(nbytes, dtype=np.uint8)
        basis = [_crc16_serial(z, 1 << k) for k in range(16)]
        _CRC16_SHIFT_BASIS[nbytes] = basis
    return basis


def _crc16(data: bytes | np.ndarray) -> int:
    """CRC-16/0x8005 — lane-parallel: split the buffer into equal lanes
    CRC'd in lockstep (one numpy gather per byte POSITION, not per byte),
    then fold the lane CRCs with the linear shift-through-L-zero-bytes
    map.  This was 75 % of FLAC encode time as a per-byte Python loop."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    n = len(arr)
    if n < 512:
        return _crc16_serial(arr)
    lanes = min(64, n // 64)
    L = n // lanes
    body = arr[: lanes * L].reshape(lanes, L)
    lut = _CRC16_LUT
    r = np.zeros(lanes, dtype=np.uint32)
    for j in range(L):
        r = lut[((r >> 8) ^ body[:, j]) & 0xFF] ^ ((r << 8) & 0xFFFF)
    basis = _crc16_shift_basis(L)
    total = 0
    for i in range(lanes):
        s = 0
        t = total
        k = 0
        while t:
            if t & 1:
                s ^= basis[k]
            t >>= 1
            k += 1
        total = s ^ int(r[i])
    return _crc16_serial(arr[lanes * L:], total)


# ------------------------------------------------------------- UTF-8 number
def _utf8_encode_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index; up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC)):
        if n < (1 << (5 * nbytes + 1)):
            out = [0] * nbytes
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = lead | n
            return bytes(out)
    raise FlacError("frame number too large for UTF-8 coding")


def _utf8_decode_number(raw: memoryview, pos: int) -> tuple[int, int]:
    b0 = raw[pos]
    if b0 < 0x80:
        return b0, pos + 1
    nbytes = 0
    for i in range(7):
        if not (b0 >> (7 - i)) & 1:
            nbytes = i
            break
    if nbytes < 2 or pos + nbytes > len(raw):
        raise FlacError("bad UTF-8 coded frame number")
    n = b0 & (0x7F >> nbytes)
    for i in range(1, nbytes):
        b = raw[pos + i]
        if (b & 0xC0) != 0x80:
            raise FlacError("bad UTF-8 continuation byte")
        n = (n << 6) | (b & 0x3F)
    return n, pos + nbytes


# ------------------------------------------------------------------ encode
_BIT_W16 = (1 << np.arange(15, -1, -1, dtype=np.uint32)).astype(np.uint32)


def _samples_to_bits(x: np.ndarray) -> np.ndarray:
    """int16 samples → flat two's-complement 16-bit big-endian bit array."""
    u = x.astype(np.int64) & 0xFFFF
    return ((u[:, None] >> np.arange(15, -1, -1)) & 1).astype(np.uint8).ravel()


def _rice_encode_bits(u: np.ndarray, k: int) -> np.ndarray:
    """Zigzagged residuals → Rice(k) bit array (vectorized scatter)."""
    q = (u >> k).astype(np.int64)
    lens = q + 1 + k
    offs = np.cumsum(lens) - lens
    bits = np.zeros(int(lens.sum()), dtype=np.uint8)
    term = offs + q
    bits[term] = 1
    for b in range(k):
        bits[term + 1 + b] = ((u >> (k - 1 - b)) & 1).astype(np.uint8)
    return bits


def _best_rice_k(u: np.ndarray) -> int:
    if len(u) == 0:
        return 0
    best_k, best_bits = 0, None
    for k in range(15):
        nbits = int((u >> k).sum()) + len(u) * (k + 1)
        if best_bits is None or nbits < best_bits:
            best_k, best_bits = k, nbits
    return best_k


def encode_flac(wave: np.ndarray, sr_hz: int, blocksize: int = 4096,
                use_lpc: bool = False) -> bytes:
    """Encode float32 [-1, 1] mono audio as real FLAC (16-bit samples,
    fixed predictors, one Rice partition per subframe).  With
    ``use_lpc=True`` predictive subframes are written as LPC with the
    fixed-equivalent binomial coefficients (same residuals) — used to
    exercise the decoder's LPC path with real bitstreams."""
    # EXACTLY audio.encode_pcm16's quantization (same dtype promotion,
    # truncation toward zero), so flac and pcm16 encodings of one wave
    # decode to IDENTICAL samples
    x = np.clip(wave, -1.0, 1.0)
    x = (x * 32767.0).astype(np.int16).astype(np.int32)
    total = len(x)
    out = [b"fLaC"]
    streaminfo = struct.pack(
        ">HH", blocksize, blocksize
    ) + b"\x00" * 6 + _pack_sr_ch_bps_total(sr_hz, 1, 16, total) + b"\x00" * 16
    out.append(bytes([0x80, 0, 0, len(streaminfo)]))  # last-block, type 0
    out.append(streaminfo)

    for fidx, start in enumerate(range(0, max(total, 1), blocksize)):
        blk = x[start : start + blocksize]
        if len(blk) == 0:
            break
        out.append(_encode_frame(blk, fidx, use_lpc))
    return b"".join(out)


def _pack_sr_ch_bps_total(sr: int, ch: int, bps: int, total: int) -> bytes:
    v = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    return v.to_bytes(8, "big")


def _encode_frame(blk: np.ndarray, fidx: int, use_lpc: bool = False) -> bytes:
    bs = len(blk)
    hdr = bytearray(b"\xff\xf8")                 # sync + fixed blocking
    hdr.append((0b0111 << 4) | 0b0000)           # 16-bit blocksize; sr from SI
    hdr.append((0b0000 << 4) | (0b100 << 1))     # mono; 16-bit; reserved 0
    hdr += _utf8_encode_number(fidx)
    hdr += struct.pack(">H", bs - 1)
    hdr.append(_crc8(bytes(hdr)))

    sub_bits = _encode_subframe_bits(blk, use_lpc)
    pad = (-len(sub_bits)) % 8
    if pad:
        sub_bits = np.concatenate([sub_bits, np.zeros(pad, np.uint8)])
    body = np.packbits(sub_bits).tobytes()
    frame = bytes(hdr) + body
    return frame + struct.pack(">H", _crc16(frame))


# fixed-predictor binomial coefficients (x[i] ≈ Σ c_j·x[i-j]) per order
_FIXED_COEFS = {1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _int_to_bits(v: int, n: int) -> np.ndarray:
    """n-bit big-endian two's-complement bit array."""
    u = v & ((1 << n) - 1)
    return np.array([(u >> (n - 1 - i)) & 1 for i in range(n)], np.uint8)


def _encode_subframe_bits(blk: np.ndarray, use_lpc: bool = False) -> np.ndarray:
    bs = len(blk)
    if np.all(blk == blk[0]):
        head = np.zeros(8, np.uint8)             # 0 pad, 000000 CONSTANT, 0 wasted
        return np.concatenate([head, _samples_to_bits(blk[:1])])
    # pick the fixed order (0..4) with the cheapest Rice coding
    best = None
    for order in range(5):
        if bs <= order:
            continue
        res = np.diff(blk.astype(np.int64), n=order)
        u = (res << 1) ^ (res >> 63)             # zigzag
        k = _best_rice_k(u)
        nbits = int((u >> k).sum()) + len(u) * (k + 1) + order * 16
        if best is None or nbits < best[0]:
            best = (nbits, order, u, k)
    nbits, order, u, k = best
    if nbits >= bs * 16:                         # verbatim is cheaper
        head = np.zeros(8, np.uint8)
        head[6] = 1                              # 000001 VERBATIM
        return np.concatenate([head, _samples_to_bits(blk)])
    head = np.zeros(8, np.uint8)
    warm = _samples_to_bits(blk[:order]) if order else np.empty(0, np.uint8)
    # residual method 00 (4-bit Rice) + partition order 0000 = 6 zero bits
    meta = np.zeros(6, np.uint8)
    kbits = np.array([(k >> (3 - i)) & 1 for i in range(4)], np.uint8)
    if use_lpc and order >= 1:
        # LPC subframe with the fixed-equivalent coefficients: identical
        # residuals, but exercises the decoder's general LPC path
        type_code = 0b100000 | (order - 1)
        head[1:7] = [(type_code >> (5 - i)) & 1 for i in range(6)]
        precision = 5                            # fits every binomial coef
        coef_bits = [_int_to_bits(precision - 1, 4), _int_to_bits(0, 5)]
        coef_bits += [_int_to_bits(c, precision) for c in _FIXED_COEFS[order]]
        return np.concatenate([head, warm, *coef_bits, meta, kbits,
                               _rice_encode_bits(u, k)])
    type_code = 0b001000 | order                 # FIXED
    head[1:7] = [(type_code >> (5 - i)) & 1 for i in range(6)]
    return np.concatenate([head, warm, meta, kbits, _rice_encode_bits(u, k)])


# ------------------------------------------------------------------ decode
def _read_uint(bits: np.ndarray, pos: int, n: int) -> int:
    if n == 0:
        return 0
    w = (1 << np.arange(n - 1, -1, -1, dtype=np.uint64))
    return int(bits[pos : pos + n].astype(np.uint64) @ w)


def _read_samples16(bits: np.ndarray, pos: int, count: int) -> np.ndarray:
    seg = bits[pos : pos + 16 * count].reshape(count, 16).astype(np.uint32)
    u = seg @ _BIT_W16
    return (u.astype(np.int32) - ((u >> 15).astype(np.int32) << 16)).astype(np.int64)


def _rice_decode(bits, C, ones_pos, pos, k, m):
    """Decode ``m`` Rice(k) codes starting at bit ``pos``.

    Pointer-doubling orbit: ``f[j] = C[ones_pos[j] + k + 1]`` maps a
    terminator's index (in ``ones_pos``) to the next code's terminator
    index; the full terminator sequence fills in log2(m) gathers.
    """
    if m == 0:
        return np.empty(0, np.int64), pos
    j0 = int(C[pos])                              # first 1-bit at/after pos
    if j0 >= len(ones_pos):
        raise FlacError("rice stream truncated")
    idx = np.empty(m, dtype=np.int64)
    idx[0] = j0
    if m > 1:
        nxt = np.minimum(ones_pos + (k + 1), len(C) - 1)
        f = C[nxt]                                # next terminator index
        s = 1
        fs = f
        top = len(ones_pos) - 1
        while s < m:
            take = min(s, m - s)
            # clamp: truncated streams would otherwise gather out of
            # range; the final bounds check below rejects them
            idx[s : s + take] = fs[np.minimum(idx[:take], top)]
            s += take
            if s < m:
                fs = fs[np.minimum(fs, top)]
        if int(idx[m - 1]) >= len(ones_pos):
            raise FlacError("rice stream truncated")
    term = ones_pos[idx]
    starts = np.empty(m, dtype=np.int64)
    starts[0] = pos
    starts[1:] = term[:-1] + k + 1
    q = term - starts
    if (q < 0).any():
        raise FlacError("rice stream corrupt")
    if k:
        rem_idx = term[:, None] + 1 + np.arange(k)
        if int(rem_idx[-1, -1]) >= len(bits):
            raise FlacError("rice remainder truncated")
        w = (1 << np.arange(k - 1, -1, -1, dtype=np.uint64))
        rem = bits[rem_idx].astype(np.uint64) @ w
        u = (q.astype(np.uint64) << np.uint64(k)) | rem
    else:
        u = q.astype(np.uint64)
    u = u.astype(np.int64)
    res = (u >> 1) ^ -(u & 1)                     # un-zigzag
    return res, int(term[-1]) + 1 + k


def _restore_fixed(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    out = res
    for kk in range(order, 0, -1):
        init = np.diff(warm, n=kk - 1)[-1] if kk > 1 else warm[-1]
        out = np.cumsum(out) + init
    return np.concatenate([warm, out]) if order else out


def _restore_lpc(warm: np.ndarray, res: np.ndarray, coefs: np.ndarray,
                 shift: int) -> np.ndarray:
    """x[i] = ((Σ_j coefs[j]·x[i-1-j]) >> shift) + res[i-order].

    The recursion is inherently sequential (each sample feeds the next
    prediction), so this is a Python loop — O(blocksize·order) per
    frame.  Python ints keep the 64-bit-plus intermediate products
    exact, matching libFLAC's wide-accumulator path."""
    order = len(coefs)
    n = order + len(res)
    x = [0] * n
    x[:order] = [int(v) for v in warm]
    c = [int(v) for v in coefs]
    r = res.tolist()
    for i in range(order, n):
        acc = 0
        for j in range(order):
            acc += c[j] * x[i - 1 - j]
        x[i] = (acc >> shift) + r[i - order]
    return np.asarray(x, dtype=np.int64)


def _read_residuals(bits, C, ones_pos, bp, bs, order):
    """Read one subframe's residual section (method + partitioned Rice
    with per-partition escape-to-raw) starting at bit ``bp``.  Returns
    ``(res, bp)`` — shared by the FIXED and LPC decode paths."""
    method = _read_uint(bits, bp, 2)
    if method > 1:
        raise FlacError("reserved residual method")
    pbits = 5 if method == 1 else 4
    esc = (1 << pbits) - 1
    part_order = _read_uint(bits, bp + 2, 4)
    bp += 6
    nparts = 1 << part_order
    res_parts = []
    for p in range(nparts):
        cnt = (bs >> part_order) - (order if p == 0 else 0)
        k = _read_uint(bits, bp, pbits)
        bp += pbits
        if k == esc:                              # raw residuals
            rb = _read_uint(bits, bp, 5)
            bp += 5
            if rb:
                seg = bits[bp : bp + rb * cnt].reshape(cnt, rb)
                w = (1 << np.arange(rb - 1, -1, -1, dtype=np.uint64))
                uv = seg.astype(np.uint64) @ w
                r = uv.astype(np.int64)
                r -= (r >> (rb - 1)) << rb if rb < 64 else 0
            else:
                r = np.zeros(cnt, np.int64)
            bp += rb * cnt
        else:
            r, bp = _rice_decode(bits, C, ones_pos, bp, k, cnt)
        res_parts.append(r)
    res = np.concatenate(res_parts) if len(res_parts) > 1 else res_parts[0]
    return res, bp


def decode_flac(raw: bytes, verify_crc: bool = False) -> tuple[np.ndarray, int]:
    """Decode a flaclite-subset FLAC payload → (int16 samples, sr_hz)."""
    raw = bytes(raw)
    if raw[:4] != b"fLaC":
        raise FlacError("not a FLAC payload")
    pos, sr, bps, ch, total = 4, None, None, None, None
    while True:
        if pos + 4 > len(raw):
            raise FlacError("metadata truncated")
        last, btype = raw[pos] >> 7, raw[pos] & 0x7F
        blen = int.from_bytes(raw[pos + 1 : pos + 4], "big")
        body = raw[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if blen != 34:
                raise FlacError("bad STREAMINFO length")
            v = int.from_bytes(body[10:18], "big")
            sr = v >> 44
            ch = ((v >> 41) & 0x7) + 1
            bps = ((v >> 36) & 0x1F) + 1
            total = v & ((1 << 36) - 1)
        pos += 4 + blen
        if last:
            break
    if sr is None:
        raise FlacError("no STREAMINFO")
    if ch != 1 or bps != 16:
        raise FlacError(f"flaclite subset is mono/16-bit (got ch={ch}, bps={bps})")

    mv = memoryview(raw)
    bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))
    C = np.zeros(len(bits) + 1, dtype=np.int64)
    np.cumsum(bits, out=C[1:])                    # ones strictly before p
    ones_pos = np.flatnonzero(bits).astype(np.int64)

    chunks: list[np.ndarray] = []
    got = 0
    while pos + 5 <= len(raw) and (total == 0 or got < total):
        frame_start = pos
        if raw[pos] != 0xFF or (raw[pos + 1] & 0xFC) != 0xF8:
            raise FlacError("lost frame sync")
        bs_code = raw[pos + 2] >> 4
        sr_code = raw[pos + 2] & 0xF
        ch_code = raw[pos + 3] >> 4
        sz_code = (raw[pos + 3] >> 1) & 0x7
        if ch_code != 0:
            raise FlacError("flaclite subset is mono")
        if sz_code not in (0b100, 0b000):
            raise FlacError("flaclite subset is 16-bit")
        pos += 4
        _, pos = _utf8_decode_number(mv, pos)
        if bs_code == 0b0110:
            bs = raw[pos] + 1
            pos += 1
        elif bs_code == 0b0111:
            bs = int.from_bytes(raw[pos : pos + 2], "big") + 1
            pos += 2
        else:
            bs = _BLOCKSIZE_TABLE.get(bs_code)
            if bs is None:
                raise FlacError(f"unsupported blocksize code {bs_code}")
        if sr_code == 0b1100:
            pos += 1
        elif sr_code in (0b1101, 0b1110):
            pos += 2
        elif sr_code == 0b1111:
            raise FlacError("invalid sample-rate code")
        hdr_crc = raw[pos]
        if _crc8(raw[frame_start:pos]) != hdr_crc:
            raise FlacError("frame header CRC-8 mismatch")
        pos += 1

        bp = pos * 8                              # bit cursor at subframe
        if bits[bp] != 0:
            raise FlacError("subframe padding bit set")
        stype = _read_uint(bits, bp + 1, 6)
        wasted = int(bits[bp + 7])
        if wasted:
            raise FlacError("wasted-bits not in flaclite subset")
        bp += 8
        if stype == 0b000000:                     # CONSTANT
            val = _read_samples16(bits, bp, 1)
            chunks.append(np.full(bs, val[0], dtype=np.int64))
            bp += 16
        elif stype == 0b000001:                   # VERBATIM
            chunks.append(_read_samples16(bits, bp, bs))
            bp += 16 * bs
        elif 0b001000 <= stype <= 0b001100:       # FIXED order 0-4
            order = stype & 0x7
            warm = _read_samples16(bits, bp, order)
            bp += 16 * order
            res, bp = _read_residuals(bits, C, ones_pos, bp, bs, order)
            chunks.append(_restore_fixed(warm, res, order))
        elif stype >= 0b100000:                   # LPC order 1-32
            order = (stype & 0x1F) + 1
            warm = _read_samples16(bits, bp, order)
            bp += 16 * order
            prec_code = _read_uint(bits, bp, 4)
            if prec_code == 0b1111:
                raise FlacError("invalid LPC precision code")
            precision = prec_code + 1
            shift = _read_uint(bits, bp + 4, 5)
            shift -= (shift >> 4) << 5            # signed 5-bit
            if shift < 0:
                raise FlacError("negative LPC shift")
            bp += 9
            coefs = np.empty(order, np.int64)
            for j in range(order):
                c = _read_uint(bits, bp, precision)
                coefs[j] = c - ((c >> (precision - 1)) << precision)
                bp += precision
            res, bp = _read_residuals(bits, C, ones_pos, bp, bs, order)
            chunks.append(_restore_lpc(warm, res, coefs, shift))
        else:
            raise FlacError(f"reserved subframe type {stype:06b}")

        pos = (bp + 7) // 8                       # skip padding to byte
        if verify_crc:
            if _crc16(raw[frame_start:pos]) != int.from_bytes(
                raw[pos : pos + 2], "big"
            ):
                raise FlacError("frame CRC-16 mismatch")
        pos += 2                                  # footer CRC-16
        got += bs

    x = np.concatenate(chunks) if chunks else np.empty(0, np.int64)
    if total and len(x) > total:
        x = x[:total]
    if total and len(x) != total:
        raise FlacError(f"decoded {len(x)} samples, STREAMINFO says {total}")
    if len(x) and (x.max() > 32767 or x.min() < -32768):
        raise FlacError("decoded samples out of int16 range")
    return x.astype(np.int16), int(sr)


_BLOCKSIZE_TABLE = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
