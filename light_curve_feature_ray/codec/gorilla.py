"""Gorilla time-series compression (engine-side design; no reference
counterpart — see Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
Time Series Database", VLDB 2015, and Chimp (VLDB 2022) in PAPERS.md).

Encodes one bucket's raw (ts, value) points into a compact byte string
stored in an Arrow ``binary`` column:

- timestamps: first value as raw int64 (units decided by caller, typically
  microseconds), then delta-of-delta with the classic Gorilla control codes
  {'0': dod=0, '10': 7-bit, '110': 9-bit, '1110': 12-bit, '11110': 32-bit,
  '11111': 64-bit raw} (signed offsets, zigzag-free bias encoding).
- values: first float64 as raw 64 bits, then XOR with the previous value:
  '0' if identical; '10' + meaningful bits if the leading/trailing-zero
  window of the previous XOR still fits; '11' + 5-bit leading-zero count +
  6-bit length + bits otherwise.

The encoder is vectorized: each point maps to a (payload, bit-length) token
pair computed with numpy; tokens are materialized through a bit matrix and
``np.packbits``. The decoder walks the bitstream with a compact state loop
over ``np.unpackbits`` output (decode is off the hot path: the tier cascade
computes holistic features from in-memory raw points, and only readers /
resume paths decode).
"""

from __future__ import annotations

import numpy as np

_DOD_RANGES = (
    (7, 0b10, 2, 63),  # 7-bit payload, prefix '10'
    (9, 0b110, 3, 255),  # 9-bit payload, prefix '110'
    (12, 0b1110, 4, 2047),  # 12-bit payload, prefix '1110'
    (32, 0b11110, 5, (1 << 31) - 1),  # 32-bit payload, prefix '11110'
)


def _pack_tokens(payloads: np.ndarray, nbits: np.ndarray) -> np.ndarray:
    """Concatenate variable-length big-endian bitfields into a byte array.

    payloads: uint64 array (values < 2**nbits), nbits: int array (0..64).
    Vectorized via a (n_tokens x 64) bit matrix + mask + packbits.
    """
    n = payloads.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    max_bits = int(nbits.max())
    shifts = np.arange(max_bits - 1, -1, -1, dtype=np.uint64)
    # bit j of token i (MSB first within the token's nbits[i] window)
    mat = (payloads[:, None] >> np.minimum(shifts[None, :], 63)) & 1
    # For tokens with nbits < max_bits the leading columns must be dropped:
    # column j belongs to token i iff j >= max_bits - nbits[i]
    keep = np.arange(max_bits)[None, :] >= (max_bits - nbits[:, None])
    bits = mat[keep].astype(np.uint8)  # flattened in token order
    return np.packbits(bits)


def _bias_encode(dod: np.ndarray, bits: int) -> np.ndarray:
    """Map signed delta-of-delta into an unsigned payload of `bits` bits
    (value + 2^(bits-1), classic Gorilla bias)."""
    return (dod + (1 << (bits - 1))).astype(np.uint64)


def encode(ts: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel int64 timestamps + float64 values."""
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    values = np.ascontiguousarray(values, dtype=np.float64)
    n = ts.shape[0]
    header = np.empty(2, dtype=np.uint64)
    header[0] = np.uint64(n)
    if n == 0:
        return header[:1].byteswap().tobytes()

    tokens_payload: list[np.ndarray] = []
    tokens_bits: list[np.ndarray] = []

    def emit(payload: np.ndarray, nbits: np.ndarray):
        tokens_payload.append(payload.astype(np.uint64))
        tokens_bits.append(nbits.astype(np.int64))

    # ---- header: count, first ts, first value (raw 64-bit) ----
    emit(np.array([n], dtype=np.uint64), np.array([64]))
    emit(ts[:1].view(np.uint64), np.array([64]))
    emit(values[:1].view(np.uint64), np.array([64]))

    # ---- timestamps: delta-of-delta tokens ----
    if n > 1:
        deltas = np.diff(ts)
        dod = np.empty(n - 1, dtype=np.int64)
        dod[0] = deltas[0]  # first delta encoded as dod against implicit 0
        dod[1:] = deltas[1:] - deltas[:-1]
        t_payload = np.zeros(n - 1, dtype=np.uint64)
        t_bits = np.zeros(n - 1, dtype=np.int64)
        done = dod == 0
        t_bits[done] = 1  # single '0' bit, payload 0
        for pbits, prefix, plen, lim in _DOD_RANGES:
            sel = (~done) & (np.abs(dod) <= lim)
            if sel.any():
                t_payload[sel] = (np.uint64(prefix) << np.uint64(pbits)) | _bias_encode(
                    dod[sel], pbits
                )
                t_bits[sel] = plen + pbits
                done |= sel
        rest = ~done
        if rest.any():
            t_payload[rest] = (np.uint64(0b11111) << np.uint64(59)) | (
                dod[rest].view(np.uint64) >> np.uint64(5)
            )
            # 64-bit raw doesn't fit prefix+payload in one uint64 token;
            # split: token A = prefix(5) + top 59 bits, token B = low 5 bits
            emitted_low = dod[rest].view(np.uint64) & np.uint64(0x1F)
            t_bits[rest] = 64
            # interleave requires order preservation: build combined arrays
            # by expanding below instead
            idx = np.flatnonzero(rest)
            payload2 = np.zeros(n - 1, dtype=np.uint64)
            bits2 = np.zeros(n - 1, dtype=np.int64)
            payload2[idx] = emitted_low
            bits2[idx] = 5
            # stack (token, extra-token) pairs in point order
            t_payload = np.column_stack([t_payload, payload2]).reshape(-1)
            t_bits = np.column_stack([t_bits, bits2]).reshape(-1)
        emit(t_payload, t_bits)

    # ---- values: XOR tokens ----
    if n > 1:
        bits_v = values.view(np.uint64)
        xor = bits_v[1:] ^ bits_v[:-1]
        # leading/trailing zero counts of each xor
        lead = np.zeros(n - 1, dtype=np.int64)
        trail = np.zeros(n - 1, dtype=np.int64)
        nz = xor != 0
        if nz.any():
            x = xor[nz]
            # exact leading zeros via binary bit scan on uint64
            hb = np.zeros(x.shape[0], dtype=np.int64)
            v = x.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                m = v >= (np.uint64(1) << np.uint64(shift))
                hb[m] += shift
                v[m] >>= np.uint64(shift)
            lead[nz] = 63 - hb
            # trailing zeros
            low = (x & (~x + np.uint64(1))).astype(np.uint64)  # lowest set bit
            tb = np.zeros(x.shape[0], dtype=np.int64)
            v = low.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                m = v >= (np.uint64(1) << np.uint64(shift))
                tb[m] += shift
                v[m] >>= np.uint64(shift)
            trail[nz] = tb
        # clamp leading to 31 (5-bit field)
        lead = np.minimum(lead, 31)

        # sequential window-reuse decision is inherently serial; emulate the
        # simpler variant: always emit control '11' with explicit window for
        # non-zero xor, '0' for zero xor. This stays within the Gorilla
        # format family (it is the encoder's choice of when to reuse) and
        # keeps encode fully vectorized.
        v_payload = np.zeros(n - 1, dtype=np.uint64)
        v_bits = np.ones(n - 1, dtype=np.int64)  # '0' for identical
        if nz.any():
            mlen = 64 - lead[nz] - trail[nz]  # meaningful bits, >= 1
            meaningful = xor[nz] >> trail[nz].astype(np.uint64)
            # token: '11' + 5-bit lead + 6-bit (mlen-1) + meaningful bits
            head = (
                (np.uint64(0b11) << np.uint64(11))
                | (lead[nz].astype(np.uint64) << np.uint64(6))
                | (mlen - 1).astype(np.uint64)
            )
            total_bits = 13 + mlen
            fits = total_bits <= 64
            payload = np.zeros(nz.sum(), dtype=np.uint64)
            payload[fits] = (head[fits] << mlen[fits].astype(np.uint64)) | meaningful[
                fits
            ]
            v_payload_nz_bits = np.where(fits, total_bits, 13)
            idx = np.flatnonzero(nz)
            v_payload[idx[fits]] = payload[fits]
            v_bits[idx] = v_payload_nz_bits
            # oversized tokens (13 + mlen > 64): emit head and meaningful
            # bits as a second token
            if (~fits).any():
                v_payload[idx[~fits]] = head[~fits]
                payload2 = np.zeros(n - 1, dtype=np.uint64)
                bits2 = np.zeros(n - 1, dtype=np.int64)
                payload2[idx[~fits]] = meaningful[~fits]
                bits2[idx[~fits]] = mlen[~fits]
                v_payload = np.column_stack([v_payload, payload2]).reshape(-1)
                v_bits = np.column_stack([v_bits, bits2]).reshape(-1)
        emit(v_payload, v_bits)

    payloads = np.concatenate(tokens_payload)
    nbits = np.concatenate(tokens_bits)
    keep = nbits > 0
    return _pack_tokens(payloads[keep], nbits[keep]).tobytes()


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        b = self.bits[self.pos : self.pos + n]
        self.pos += n
        out = 0
        for bit in b:
            out = (out << 1) | int(bit)
        return out

    def read1(self) -> int:
        v = int(self.bits[self.pos])
        self.pos += 1
        return v


def decode(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode back to (int64 timestamps, float64 values)."""
    r = _BitReader(data)
    n = r.read(64)
    ts = np.empty(n, dtype=np.int64)
    values = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, values.view(np.float64)
    ts[0] = np.int64(np.uint64(r.read(64)))
    values[0] = r.read(64)
    # timestamps
    delta = 0
    for i in range(1, n):
        if r.read1() == 0:
            dod = 0
        elif r.read1() == 0:
            dod = r.read(7) - (1 << 6)
        elif r.read1() == 0:
            dod = r.read(9) - (1 << 8)
        elif r.read1() == 0:
            dod = r.read(12) - (1 << 11)
        elif r.read1() == 0:
            dod = r.read(32) - (1 << 31)
        else:
            raw = r.read(64)
            dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        delta += dod
        ts[i] = ts[i - 1] + delta
    # values
    prev = int(values[0])
    for i in range(1, n):
        if r.read1() == 0:
            values[i] = prev
            continue
        ctrl = r.read1()
        assert ctrl == 1, "encoder always emits explicit windows"
        lead = r.read(5)
        mlen = r.read(6) + 1
        meaningful = r.read(mlen)
        trail = 64 - lead - mlen
        prev = prev ^ (meaningful << trail)
        values[i] = prev
    return ts, values.view(np.float64)
