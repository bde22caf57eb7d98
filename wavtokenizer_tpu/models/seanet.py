"""SEANet encoder/decoder as spec-driven pure functions.

Behavioral contract: reference encoder/modules/seanet.py:66-238 (strided
conv stack with dilated residual blocks, 2-layer LSTM, ELU activations,
"streamable" exact padding).  The TPU-native design differs from the torch
module tree:

* channel-last (B, T, C) activations so C maps onto TPU lanes,
* params are plain pytrees (lists/dicts of arrays) produced by the
  checkpoint converter, weight-norm already folded,
* the whole stack is a single jit-able pure function.

Layer *specs* (static metadata: kinds, strides, dilations, torch key
prefixes) are built from the config once and drive both the apply function
and the checkpoint conversion.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import sconv1d, sconv_transpose1d
from ..ops.lstm import slstm


@dataclass(frozen=True)
class SEANetConfig:
    """Mirror of the reference constructor args (seanet.py:91-95,174-180)."""
    channels: int = 1
    dimension: int = 512
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: tuple = (8, 5, 4, 2)       # decoder order, encoder reverses
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    trim_right_ratio: float = 1.0
    final_activation: str | None = None
    # "weight_norm" (folded at load — a no-op at apply time), "none", or
    # "time_group_norm" (GroupNorm(1, C) after each conv, ref conv.py:45-49;
    # used by the pretrained EnCodec 48 kHz model, encoder/model.py:295).
    norm: str = "weight_norm"

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))


@dataclass(frozen=True)
class LayerSpec:
    """One entry of the (flattened) sequential model."""
    kind: str                  # conv | convtr | lstm | elu | resblock | final_act
    prefix: str = ""           # torch key prefix, e.g. "model.3"
    stride: int = 1
    dilation: int = 1
    causal: bool = False
    pad_mode: str = "reflect"
    trim_right_ratio: float = 1.0
    # resblock internals
    block_dilations: tuple = ()
    block_kernel_sizes: tuple = ()
    true_skip: bool = True
    num_lstm_layers: int = 0
    norm: str = "weight_norm"


def encoder_layer_specs(cfg: SEANetConfig) -> list[LayerSpec]:
    """Flattened layer list matching SEANetEncoder.__init__ module indices
    (ref: seanet.py:107-141) so torch keys line up as model.{i}."""
    ratios = tuple(reversed(cfg.ratios))
    specs: list[LayerSpec] = []
    i = 0

    def conv(stride=1, dilation=1):
        nonlocal i
        specs.append(LayerSpec("conv", f"model.{i}", stride=stride,
                               dilation=dilation, causal=cfg.causal,
                               pad_mode=cfg.pad_mode, norm=cfg.norm))
        i += 1

    conv()  # init conv k=kernel_size
    for ratio in ratios:
        for j in range(cfg.n_residual_layers):
            specs.append(LayerSpec(
                "resblock", f"model.{i}", causal=cfg.causal, pad_mode=cfg.pad_mode,
                block_kernel_sizes=(cfg.residual_kernel_size, 1),
                block_dilations=(cfg.dilation_base ** j, 1),
                true_skip=cfg.true_skip, norm=cfg.norm))
            i += 1
        specs.append(LayerSpec("elu"))
        i += 1
        conv(stride=ratio)
    if cfg.lstm:
        specs.append(LayerSpec("lstm", f"model.{i}", num_lstm_layers=cfg.lstm))
        i += 1
    specs.append(LayerSpec("elu"))
    i += 1
    conv()  # final conv to `dimension`
    return specs


def decoder_layer_specs(cfg: SEANetConfig) -> list[LayerSpec]:
    """Flattened layer list matching SEANetDecoder.__init__ (seanet.py:192-234)."""
    specs: list[LayerSpec] = []
    i = 0
    specs.append(LayerSpec("conv", f"model.{i}", causal=cfg.causal,
                           pad_mode=cfg.pad_mode, norm=cfg.norm))
    i += 1
    if cfg.lstm:
        specs.append(LayerSpec("lstm", f"model.{i}", num_lstm_layers=cfg.lstm))
        i += 1
    for ratio in cfg.ratios:
        specs.append(LayerSpec("elu"))
        i += 1
        specs.append(LayerSpec("convtr", f"model.{i}", stride=ratio,
                               causal=cfg.causal,
                               trim_right_ratio=cfg.trim_right_ratio,
                               norm=cfg.norm))
        i += 1
        for j in range(cfg.n_residual_layers):
            specs.append(LayerSpec(
                "resblock", f"model.{i}", causal=cfg.causal, pad_mode=cfg.pad_mode,
                block_kernel_sizes=(cfg.residual_kernel_size, 1),
                block_dilations=(cfg.dilation_base ** j, 1),
                true_skip=cfg.true_skip, norm=cfg.norm))
            i += 1
    specs.append(LayerSpec("elu"))
    i += 1
    specs.append(LayerSpec("conv", f"model.{i}", causal=cfg.causal,
                           pad_mode=cfg.pad_mode, norm=cfg.norm))
    i += 1
    if cfg.final_activation is not None:
        specs.append(LayerSpec("final_act"))
        i += 1
    return specs


def _time_group_norm(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """GroupNorm(1, C) on channel-last (B, T, C): stats over the whole (T, C)
    slab per batch element (ref conv.py:45-49; torch eps default 1e-5)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["weight"] + p["bias"]


def _post_norm(conv_p: dict, spec: LayerSpec, x: jnp.ndarray) -> jnp.ndarray:
    if spec.norm == "time_group_norm":
        return _time_group_norm(conv_p["gn"], x)
    return x


def _apply_resblock(params: dict, spec: LayerSpec, x: jnp.ndarray,
                    precision=None) -> jnp.ndarray:
    """SEANetResnetBlock: [ELU, conv(k,d), ELU, conv(1)] + shortcut
    (ref: seanet.py:21-63)."""
    h = x
    for conv_p, ks, dil in zip(params["block"], spec.block_kernel_sizes,
                               spec.block_dilations):
        h = jax.nn.elu(h)
        h = sconv1d(h, conv_p["kernel"], conv_p["bias"], stride=1, dilation=dil,
                    causal=spec.causal, pad_mode=spec.pad_mode,
                    precision=precision)
        h = _post_norm(conv_p, spec, h)
    if spec.true_skip:
        short = x
    else:
        sp = params["shortcut"]
        short = sconv1d(x, sp["kernel"], sp["bias"], stride=1, dilation=1,
                        causal=spec.causal, pad_mode=spec.pad_mode,
                        precision=precision)
        short = _post_norm(sp, spec, short)
    return short + h


def _apply_layer(p, spec: LayerSpec, x: jnp.ndarray,
                 final_activation: str | None,
                 conv_precision=None) -> jnp.ndarray:
    if spec.kind == "conv":
        x = sconv1d(x, p["kernel"], p["bias"], stride=spec.stride,
                    dilation=spec.dilation, causal=spec.causal,
                    pad_mode=spec.pad_mode, precision=conv_precision)
        return _post_norm(p, spec, x)
    if spec.kind == "convtr":
        norm_fn = ((lambda y: _time_group_norm(p["gn"], y))
                   if spec.norm == "time_group_norm" else None)
        return sconv_transpose1d(x, p["kernel"], p["bias"], stride=spec.stride,
                                 causal=spec.causal,
                                 trim_right_ratio=spec.trim_right_ratio,
                                 norm_fn=norm_fn)
    if spec.kind == "resblock":
        return _apply_resblock(p, spec, x, precision=conv_precision)
    if spec.kind == "lstm":
        # Pin the recurrent matmuls to bf16x3 (Precision.HIGH): at DEFAULT
        # the TPU LSTM diverges from CPU f32 by up to ~6e-4 relative on the
        # encoder embedding — enough to threaten the bit-exact-codes
        # invariant near codebook Voronoi boundaries.  Measured on v5e at
        # (128, 225, 512): DEFAULT 4.3 ms / HIGH 6.6 ms / HIGHEST 10.7 ms,
        # with HIGH within 8e-7 of HIGHEST (~55x tighter than DEFAULT) —
        # ~3% of headline throughput buys back the invariant's margin.
        # WT_ENCODE_LSTM_PRECISION ∈ {high, highest} for A/B.
        import os
        lp = {"high": jax.lax.Precision.HIGH,
              "highest": jax.lax.Precision.HIGHEST}[
            os.environ.get("WT_ENCODE_LSTM_PRECISION", "high")]
        return slstm(x, p["layers"], skip=True, precision=lp)
    if spec.kind == "elu":
        return jax.nn.elu(x)
    if spec.kind == "final_act":
        if final_activation == "Tanh":
            return jnp.tanh(x)
        raise NotImplementedError(final_activation)
    raise ValueError(spec.kind)


def _apply_resblock_folded(params: dict, spec: LayerSpec, xf: jnp.ndarray,
                           F: int, precision=None) -> jnp.ndarray:
    """SEANetResnetBlock on the folded layout (stride-1 convs keep F)."""
    from ..ops.fold import folded_sconv1d

    h = xf
    for conv_p, ks, dil in zip(params["block"], spec.block_kernel_sizes,
                               spec.block_dilations):
        h = jax.nn.elu(h)
        h = folded_sconv1d(h, F, F, conv_p["kernel"], conv_p["bias"],
                           stride=1, dilation=dil, causal=spec.causal,
                           pad_mode=spec.pad_mode, precision=precision)
    if spec.true_skip:
        short = xf
    else:
        sp = params["shortcut"]
        short = folded_sconv1d(xf, F, F, sp["kernel"], sp["bias"], stride=1,
                               dilation=1, causal=spec.causal,
                               pad_mode=spec.pad_mode, precision=precision)
    return short + h


def apply_seanet_folded(params: list, specs: list[LayerSpec],
                        x: jnp.ndarray, conv_precision=None) -> jnp.ndarray:
    """Encoder stack with narrow-channel layers space-to-depth folded.

    The early encoder convs (1-64 channels over 36k-72k samples) under-tile
    the TPU's 128 vector lanes and held the measured encoder at 0.18 MFU
    (VERDICT r3 weak #2).  This path runs the SAME arithmetic on a
    (B, T/F, F*C) layout with F chosen per layer so F*C ~ 128 (ops/fold.py):
    stride folds into F at downsample convs, resblocks keep their block's F,
    elementwise layers commute with the reshape, and the stack unfolds
    naturally once channels reach 128.  Value-preserving by construction —
    the bit-exact-codes invariant is gated by tests/test_fold.py and the
    golden-token checks.

    Falls back to the plain layer for shapes the fold cannot serve
    (non-divisible T, time_group_norm variants, transposed convs).

    ``conv_precision`` carries the encode-path bit-exactness pin (ADVICE r4
    medium: the fold previously dropped it, silently running DEFAULT — the
    exact bf16-multiply regression the pin exists to prevent).
    """
    from ..ops.fold import folded_sconv1d, refold, target_fold
    from ..ops.padding import sconv1d_paddings

    F = 1
    xf = x
    for p, spec in zip(params, specs):
        foldable = spec.norm in ("weight_norm", "none")
        if spec.kind == "conv" and foldable:
            kern = p["kernel"]
            k, _, Cout = kern.shape
            T = xf.shape[1] * F
            pl, pr = sconv1d_paddings(T, k, spec.stride, spec.dilation,
                                      spec.causal)
            span = (k - 1) * spec.dilation + 1
            N = (T + pl + pr - span) // spec.stride + 1
            F_out = target_fold(Cout, N)
            F_in = F_out * spec.stride
            if T % F_in == 0 and F_in > 1:
                xf = refold(xf, F, F_in)
                xf = folded_sconv1d(xf, F_in, F_out, kern, p["bias"],
                                    stride=spec.stride, dilation=spec.dilation,
                                    causal=spec.causal, pad_mode=spec.pad_mode,
                                    precision=conv_precision)
                F = F_out
                continue
        if spec.kind == "resblock" and foldable and F > 1:
            xf = _apply_resblock_folded(p, spec, xf, F,
                                        precision=conv_precision)
            continue
        if spec.kind in ("elu", "final_act"):
            xf = _apply_layer(p, spec, xf, None)
            continue
        # Fallback: unfold and run the plain layer.
        xf = refold(xf, F, 1)
        F = 1
        xf = _apply_layer(p, spec, xf, None, conv_precision=conv_precision)
    return refold(xf, F, 1)


def _pack_lanes(x: jnp.ndarray) -> tuple[jnp.ndarray, tuple]:
    """Fold time into channels so the last dim is a multiple of 128 lanes.

    TPU tiles the last dim onto 128 vector lanes: a checkpointed residual
    of shape (B, 72000, 32) is physically padded 32->128 (or, when XLA
    flips to a batch-minor layout, 40->128 — measured 3.2x) and the early
    narrow-channel encoder stash alone wastes gigabytes at the reference's
    batch 40 x 3 s.  (B, T, C) -> (B, T/k, k*C) with k = 128//C is a pure
    relayout (value-preserving reshape, ~0.3 ms/buffer at 1.2 TB/s) that
    makes the SAVED residual dense.  Returns (packed, original_shape);
    identity when C >= 128 or T has no suitable factor."""
    B, T, C = x.shape
    if C >= 128:
        return x, x.shape
    k = 128 // C
    while k > 1 and T % k:
        k //= 2
    if k <= 1:
        return x, x.shape
    return x.reshape(B, T // k, k * C), x.shape


def apply_seanet(params: list, specs: list[LayerSpec], x: jnp.ndarray,
                 final_activation: str | None = None,
                 remat: bool = False, conv_precision=None) -> jnp.ndarray:
    """Run the flattened sequential model.  x: (B, T, C).

    ``remat=True`` wraps each layer in ``jax.checkpoint`` so the backward
    pass recomputes layer activations instead of keeping them live — the
    early encoder convs at 72 000 samples dominate training-step HBM (the
    full batch-40 GAN step needs ~20 GB without remat vs a 16 GB v5e chip).

    The activation is carried BETWEEN remat layers in lane-packed form
    (``_pack_lanes``: (B, T, C) -> (B, T/k, kC) with kC = 128) and each
    checkpointed layer unpacks on entry / re-packs on exit, so every value
    that crosses a checkpoint boundary — saved residual, boundary output,
    backward cotangent — is stored dense.  Left un-packed, XLA materializes
    the narrow-channel boundary values in the producer conv's batch-minor
    layout, padding 40 -> 128 lanes (measured 3.2x: 1.10 GiB for a
    f32[40,72000,32] residual that packs to 0.34 GiB).  Elementwise layers
    (elu, tanh) commute with the reshape and run directly on the packed
    form.  Inference paths never pass remat (zero cost there)."""
    if not remat:
        for p, spec in zip(params, specs):
            x = _apply_layer(p, spec, x, final_activation, conv_precision)
        return x

    xp, shape = _pack_lanes(x)
    for p, spec in zip(params, specs):
        if spec.kind in ("conv", "convtr", "resblock", "lstm"):
            def fn(p, xq, _s=spec, _shape=shape):
                h = _apply_layer(p, _s, xq.reshape(_shape), final_activation,
                                 conv_precision)
                return _pack_lanes(h)[0]
            shape = jax.eval_shape(
                lambda p, xq, _s=spec, _shape=shape:
                    _apply_layer(p, _s, xq.reshape(_shape), final_activation,
                                 conv_precision),
                p, xp).shape
            xp = jax.checkpoint(fn)(p, xp)
        else:
            # elementwise (elu / final_act): commutes with the packing
            xp = _apply_layer(p, spec, xp, final_activation)
    return xp.reshape(shape)


def _fold_default() -> bool:
    """Inference-path default for the space-to-depth encoder fold (value-
    preserving, see apply_seanet_folded).  Env override for A/B measurement;
    resolved lazily (per trace) so tests can flip the env var.

    Default OFF: measured on v5e r4 at (B=128, 3 s) the whole-encoder fold
    is 1.7x SLOWER than XLA's own lowering (52.0 ms vs 30.6 ms per encode,
    codes still bit-identical) — the folded kernels' zero-padding FLOPs
    (1.7-2.7x per layer) cost more than the recovered lane utilization.
    See CLAUDE.md "Measured dead ends" for the per-layer numbers."""
    import os
    return os.environ.get("WT_ENCODER_FOLD", "0") == "1"


_EXACT = "exact"


def _encode_precision(conv_precision):
    """Resolve the encode-path conv precision.

    Default ("exact") pins the convs to Precision.HIGH (bf16x3): measured
    r4 on v5e, DEFAULT lowers the f32 encoder convs with bf16 multiplies —
    TPU-vs-CPU embedding divergence of ~1.3e-3 from the very first conv,
    enough to flip 23/960 small600 token ids vs the CPU/torch-parity
    golden (caught by the bench golden gate).  HIGH restores the invariant
    to the residual-noise floor: flips vs the CPU golden measured
    {small320: 0, small600: 1, music16k: 0} — IDENTICAL to full HIGHEST
    (conv+LSTM), because the last flip is a genuine Voronoi near-tie that
    no cross-backend f32 implementation can pin (different sum orders),
    while HIGH costs 52.9 ms vs HIGHEST's 64.1 ms at (B=128, 3 s)
    (DEFAULT: 30.3 ms).  Training passes None (DEFAULT) — the GAN step's
    encode feeds a loss, not the token contract, and keeping its HLO
    unchanged preserves the warm compile caches.
    WT_ENCODE_CONV_PRECISION ∈ {highest, high, default} for A/B."""
    if conv_precision is not _EXACT:
        return conv_precision
    import os
    name = os.environ.get("WT_ENCODE_CONV_PRECISION", "high")
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": None}[name]


def _plain_front(params: list, specs: list[LayerSpec],
                 a: jnp.ndarray) -> jnp.ndarray:
    """Layers 0-6 via the plain path at the Precision.HIGH pin — the edge
    oracle for the fused front kernel (ops/encoder_front.py)."""
    for p, spec in zip(params[:7], specs[:7]):
        a = _apply_layer(p, spec, a, None, jax.lax.Precision.HIGH)
    return a


def seanet_encode(params: list, cfg: SEANetConfig, audio: jnp.ndarray,
                  remat: bool = False, fold: bool | None = None,
                  conv_precision=_EXACT) -> jnp.ndarray:
    """audio: (B, T, 1) -> latent (B, T', dimension).

    ``conv_precision`` defaults to the bit-exact inference pin (see
    _encode_precision); training passes None.  ``fold`` (default env
    WT_ENCODER_FOLD, off — measured dead end) runs the narrow early layers
    space-to-depth folded; the remat (training) path keeps the lane-packed
    checkpoint layout instead.

    When the resolved precision is the HIGH pin and the geometry matches,
    the narrow front (layers 0-6) runs as one fused Pallas kernel
    (ops/encoder_front.py) with the same bf16x3 numerical contract —
    the r5 single-chip lever (VERDICT r4 next #1).
    """
    specs = encoder_layer_specs(cfg)
    conv_precision = _encode_precision(conv_precision)
    if fold is None:
        fold = _fold_default()
    if fold and not remat:
        return apply_seanet_folded(params, specs, audio,
                                   conv_precision=conv_precision)
    if not remat and conv_precision == jax.lax.Precision.HIGH:
        from ..ops.encoder_front import (encoder_front_fused,
                                         front_geometry_matches,
                                         use_encoder_front)
        if (use_encoder_front()
                and front_geometry_matches(specs, params, audio.shape[1])):
            x = encoder_front_fused(params, specs, audio,
                                    edge_fn=_plain_front)
            for p, spec in zip(params[7:], specs[7:]):
                x = _apply_layer(p, spec, x, None, conv_precision)
            return x
    return apply_seanet(params, specs, audio, remat=remat,
                        conv_precision=conv_precision)


def seanet_decode(params: list, cfg: SEANetConfig, z: jnp.ndarray,
                  remat: bool = False) -> jnp.ndarray:
    """z: (B, T', dimension) -> audio (B, T, channels)."""
    return apply_seanet(params, decoder_layer_specs(cfg), z,
                        final_activation=cfg.final_activation, remat=remat)
