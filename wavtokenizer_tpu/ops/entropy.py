"""Arithmetic coding of token streams (LM-driven compression).

The reference carries an arithmetic coder for EnCodec-style LM compression
but it is unimportable as shipped (encoder/quantization/ac.py imports a
non-existent ``..binary`` module — SURVEY.md §2.3 "Dead/vestigial").  This
is a WORKING replacement: a classic Witten-Neal-Cleary integer arithmetic
coder over quantized CDFs, plus helpers that drive it with the streaming
token LM (models/lm.py) to turn discrete codes into a compressed bitstream
and back, losslessly.

Host-side by design: entropy coding is inherently sequential bit twiddling;
the model evaluations (the FLOPs) stay on device, one jitted LM step per
frame with carried KV state.
"""

from __future__ import annotations

import numpy as np

_PRECISION = 32
_FULL = (1 << _PRECISION) - 1
_HALF = 1 << (_PRECISION - 1)
_QUARTER = 1 << (_PRECISION - 2)
_THREE_Q = _HALF + _QUARTER


def quantize_pdf(pdf: np.ndarray, total_bits: int = 16) -> np.ndarray:
    """Probabilities -> integer cumulative frequencies (C+1,), each symbol
    guaranteed a nonzero span (decodability for any symbol)."""
    total = 1 << total_bits
    pdf = np.asarray(pdf, np.float64)
    pdf = np.maximum(pdf, 0) + 1e-12
    pdf = pdf / pdf.sum()
    freqs = np.maximum(1, np.round(pdf * (total - len(pdf))).astype(np.int64))
    # repair rounding drift off the largest bins
    drift = int(freqs.sum()) - (total - len(pdf))
    while drift != 0:
        i = int(np.argmax(freqs)) if drift > 0 else int(np.argmin(freqs))
        step = -1 if drift > 0 else 1
        freqs[i] += step
        drift += step
    freqs = freqs + 1  # the reserved +1 per symbol
    cum = np.zeros(len(pdf) + 1, np.int64)
    np.cumsum(freqs, out=cum[1:])
    assert cum[-1] == total
    return cum


class BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def write(self, bit: int):
        self._bits.append(bit)

    def bytes(self) -> bytes:
        bits = self._bits + [0] * (-len(self._bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


class BitReader:
    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0

    def read(self) -> int:
        byte_i, bit_i = divmod(self._pos, 8)
        self._pos += 1
        if byte_i >= len(self._data):
            return 0
        return (self._data[byte_i] >> (7 - bit_i)) & 1


class ArithmeticEncoder:
    def __init__(self):
        self.low = 0
        self.high = _FULL
        self.pending = 0
        self.out = BitWriter()

    def _emit(self, bit: int):
        self.out.write(bit)
        inv = 1 - bit
        for _ in range(self.pending):
            self.out.write(inv)
        self.pending = 0

    def encode(self, cum: np.ndarray, symbol: int):
        total = int(cum[-1])
        span = self.high - self.low + 1
        self.high = self.low + span * int(cum[symbol + 1]) // total - 1
        self.low = self.low + span * int(cum[symbol]) // total
        while True:
            if self.high < _HALF:
                self._emit(0)
            elif self.low >= _HALF:
                self._emit(1)
                self.low -= _HALF
                self.high -= _HALF
            elif self.low >= _QUARTER and self.high < _THREE_Q:
                self.pending += 1
                self.low -= _QUARTER
                self.high -= _QUARTER
            else:
                break
            self.low <<= 1
            self.high = (self.high << 1) | 1

    def finish(self) -> bytes:
        self.pending += 1
        self._emit(0 if self.low < _QUARTER else 1)
        return self.out.bytes()


class ArithmeticDecoder:
    def __init__(self, data: bytes):
        self.reader = BitReader(data)
        self.low = 0
        self.high = _FULL
        self.value = 0
        for _ in range(_PRECISION):
            self.value = (self.value << 1) | self.reader.read()

    def decode(self, cum: np.ndarray) -> int:
        total = int(cum[-1])
        span = self.high - self.low + 1
        scaled = ((self.value - self.low + 1) * total - 1) // span
        symbol = int(np.searchsorted(cum, scaled, side="right")) - 1
        self.high = self.low + span * int(cum[symbol + 1]) // total - 1
        self.low = self.low + span * int(cum[symbol]) // total
        while True:
            if self.high < _HALF:
                pass
            elif self.low >= _HALF:
                self.low -= _HALF
                self.high -= _HALF
                self.value -= _HALF
            elif self.low >= _QUARTER and self.high < _THREE_Q:
                self.low -= _QUARTER
                self.high -= _QUARTER
                self.value -= _QUARTER
            else:
                break
            self.low <<= 1
            self.high = (self.high << 1) | 1
            self.value = (self.value << 1) | self.reader.read()
        return symbol


# ---------------------------------------------------------------------------
# LM-driven code stream compression (working replacement for ref ac.py usage
# sketched at encoder/model.py:27-65)
# ---------------------------------------------------------------------------

def compress_codes(lm_params, lm_cfg, codes: np.ndarray,
                   total_bits: int = 16) -> bytes:
    """Losslessly compress codes (K, T) int32 with the streaming LM.

    Each frame's distribution conditions on all previous frames (input ids
    are shifted by one, 0 = start); the arithmetic coder interleaves the K
    codebooks within a frame.
    """
    import jax
    import jax.numpy as jnp

    from ..models.lm import lm_forward

    codes = np.asarray(codes)
    K, T = codes.shape
    step = jax.jit(lambda p, ids, st, off: lm_forward(p, lm_cfg, ids, st, off))

    enc = ArithmeticEncoder()
    states, offset = None, 0
    prev = np.zeros((1, K, 1), np.int32)  # start symbol (0 = missing)
    for t in range(T):
        probs, states, offset = step(lm_params, jnp.asarray(prev), states,
                                     offset)
        p_np = np.asarray(probs)[0, :, :, 0]          # (card, K)
        for k in range(K):
            cum = quantize_pdf(p_np[:, k], total_bits)
            enc.encode(cum, int(codes[k, t]))
        prev = codes[None, :, t:t + 1] + 1
    return enc.finish()


def decompress_codes(lm_params, lm_cfg, data: bytes, K: int, T: int,
                     total_bits: int = 16) -> np.ndarray:
    """Inverse of compress_codes -> (K, T) int32."""
    import jax
    import jax.numpy as jnp

    from ..models.lm import lm_forward

    step = jax.jit(lambda p, ids, st, off: lm_forward(p, lm_cfg, ids, st, off))
    dec = ArithmeticDecoder(data)
    out = np.zeros((K, T), np.int32)
    states, offset = None, 0
    prev = np.zeros((1, K, 1), np.int32)
    for t in range(T):
        probs, states, offset = step(lm_params, jnp.asarray(prev), states,
                                     offset)
        p_np = np.asarray(probs)[0, :, :, 0]
        for k in range(K):
            cum = quantize_pdf(p_np[:, k], total_bits)
            out[k, t] = dec.decode(cum)
        prev = out[None, :, t:t + 1] + 1
    return out
