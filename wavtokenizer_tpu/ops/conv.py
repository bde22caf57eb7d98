"""1-D convolution primitives in channel-last (B, T, C) layout.

These are thin, jit-friendly wrappers around ``lax.conv_general_dilated``
with the kernel layout (K, I, O) ("WIO").  XLA lowers these onto the MXU.
Weight-norm is folded into the kernels at checkpoint-load time, so at
runtime a conv is just one fused op.

Behavioral contract comes from the reference wrappers
(ref: encoder/modules/conv.py:175-253); the implementation is TPU-native.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .padding import pad1d, sconv1d_paddings, sconvtr1d_unpaddings, unpad1d

# (B, T, C) activations, (K, I, O) kernels.
DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")


def conv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
           stride: int = 1, dilation: int = 1, groups: int = 1,
           padding: tuple[int, int] = (0, 0),
           precision=None) -> jnp.ndarray:
    """Plain conv1d. x: (B, T, Cin), kernel: (K, Cin//groups, Cout)."""
    y = lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def conv_transpose1d(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray | None = None, stride: int = 1,
                     precision=None) -> jnp.ndarray:
    """Transposed conv1d with no implicit padding (out = (T-1)*stride + K).

    Implemented as an input-dilated convolution with a flipped kernel —
    the canonical XLA lowering.  x: (B, T, Cin), kernel: (K, Cin, Cout)
    (already transposed/flipped-ready: we flip here).
    """
    k = kernel.shape[0]
    y = lax.conv_general_dilated(
        x, jnp.flip(kernel, axis=0),
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=DIMENSION_NUMBERS,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def sconv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None,
            stride: int = 1, dilation: int = 1, groups: int = 1,
            causal: bool = False, pad_mode: str = "reflect",
            precision=None) -> jnp.ndarray:
    """Streamable conv: exact asymmetric/causal padding then conv.

    Mirrors reference SConv1d.forward (encoder/modules/conv.py:195-211).
    """
    kernel_size = kernel.shape[0]
    pads = sconv1d_paddings(x.shape[1], kernel_size, stride, dilation, causal)
    x = pad1d(x, pads, mode=pad_mode)
    return conv1d(x, kernel, bias, stride=stride, dilation=dilation,
                  groups=groups, precision=precision)


def sconv_transpose1d(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray | None, stride: int = 1,
                      causal: bool = False, trim_right_ratio: float = 1.0,
                      norm_fn=None, precision=None) -> jnp.ndarray:
    """Streamable transposed conv: conv then fixed-padding trim.

    Mirrors reference SConvTranspose1d.forward (encoder/modules/conv.py:231-253).
    ``norm_fn`` (e.g. time_group_norm) runs on the UNTRIMMED conv output —
    the reference norms inside NormConvTranspose1d (conv.py:151-155) and
    unpads afterwards (conv.py:249-252), so norm stats include the edges.
    """
    kernel_size = kernel.shape[0]
    y = conv_transpose1d(x, kernel, bias, stride=stride, precision=precision)
    if norm_fn is not None:
        y = norm_fn(y)
    trims = sconvtr1d_unpaddings(kernel_size, stride, causal, trim_right_ratio)
    return unpad1d(y, trims)


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
           strides: tuple[int, int] = (1, 1),
           padding: tuple[tuple[int, int], tuple[int, int]] = ((0, 0), (0, 0)),
           groups: int = 1, dilation: tuple[int, int] = (1, 1),
           precision=None) -> jnp.ndarray:
    """Plain conv2d in NHWC.  x: (B, H, W, Cin), kernel: (Kh, Kw, Cin//g, Cout).

    Used by the discriminator stacks (period-folded and spectrogram 2-D convs,
    ref: decoder/discriminators.py, decoder/discriminator_dac.py,
    encoder/msstftd.py — the latter needs time-axis `dilation`).
    """
    y = lax.conv_general_dilated(
        x, kernel,
        window_strides=strides,
        padding=list(padding),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y
