"""Exact "streamable" padding semantics for 1-D convolutions.

Reimplements the padding math of the reference EnCodec conv wrappers
(ref: encoder/modules/conv.py:54-105) as pure shape-level helpers.  All
quantities here depend only on *static* shapes, so every function is safe
inside ``jax.jit`` (the padding amounts are Python ints baked into the
compiled program).

Layout note: unlike the torch reference (B, C, T), the TPU-native stack is
channel-last (B, T, C) so that the channel dimension maps onto TPU lanes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def get_extra_padding_for_conv1d(length: int, kernel_size: int, stride: int,
                                 padding_total: int = 0) -> int:
    """Extra right-padding so the last conv window is full.

    Mirrors reference encoder/modules/conv.py:54-61 exactly (pure int math
    on the static length).
    """
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def pad1d(x: jnp.ndarray, paddings: tuple[int, int], mode: str = "zero",
          value: float = 0.0) -> jnp.ndarray:
    """Pad the time axis of a (B, T, C) array.

    For ``reflect`` mode with very small inputs (T <= max_pad), torch's
    reflect pad would fail, so the reference inserts temporary zero padding
    on the right before reflecting and trims it afterwards
    (ref: encoder/modules/conv.py:79-96).  We replicate that dance.
    """
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, (padding_left, padding_right)
    length = x.shape[1]
    if mode == "reflect":
        max_pad = max(padding_left, padding_right)
        extra_pad = 0
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            x = jnp.pad(x, ((0, 0), (0, extra_pad), (0, 0)))
        padded = jnp.pad(x, ((0, 0), (padding_left, padding_right), (0, 0)),
                         mode="reflect")
        end = padded.shape[1] - extra_pad
        return padded[:, :end, :]
    elif mode in ("zero", "constant"):
        return jnp.pad(x, ((0, 0), (padding_left, padding_right), (0, 0)),
                       constant_values=value)
    else:
        return jnp.pad(x, ((0, 0), (padding_left, padding_right), (0, 0)),
                       mode=mode)


def unpad1d(x: jnp.ndarray, paddings: tuple[int, int]) -> jnp.ndarray:
    """Remove padding from the time axis of a (B, T, C) array.

    Mirrors reference encoder/modules/conv.py:99-105.
    """
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0
    assert (padding_left + padding_right) <= x.shape[1]
    end = x.shape[1] - padding_right
    return x[:, padding_left:end, :]


def sconv1d_paddings(length: int, kernel_size: int, stride: int, dilation: int,
                     causal: bool) -> tuple[int, int]:
    """(left, right) padding used by the streamable conv wrapper.

    Mirrors reference encoder/modules/conv.py:195-210: effective kernel with
    dilation, ``padding_total = k_eff - stride`` split asymmetrically
    (more on the left) for non-causal convs, all of it on the left for
    causal convs, plus the extra right padding for a full last window.
    """
    k_eff = (kernel_size - 1) * dilation + 1
    padding_total = k_eff - stride
    extra_padding = get_extra_padding_for_conv1d(length, k_eff, stride, padding_total)
    if causal:
        return padding_total, extra_padding
    padding_right = padding_total // 2
    padding_left = padding_total - padding_right
    return padding_left, padding_right + extra_padding


def sconvtr1d_unpaddings(kernel_size: int, stride: int, causal: bool,
                         trim_right_ratio: float = 1.0) -> tuple[int, int]:
    """(left, right) trim amounts after a transposed conv.

    Mirrors reference encoder/modules/conv.py:231-253.
    """
    padding_total = kernel_size - stride
    if causal:
        padding_right = math.ceil(padding_total * trim_right_ratio)
        padding_left = padding_total - padding_right
    else:
        padding_right = padding_total // 2
        padding_left = padding_total - padding_right
    return padding_left, padding_right
