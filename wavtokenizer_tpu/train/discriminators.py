"""GAN discriminators: Vocos MPD/MRD + DAC (MPD + multi-band complex MRD).

Behavioral contracts:
* MultiPeriodDiscriminator / DiscriminatorP — ref decoder/discriminators.py:9-98
* MultiResolutionDiscriminator / DiscriminatorR — ref decoder/discriminators.py:101-202
* DACDiscriminator (MPD periods 2,3,5,7,11 + complex multi-band MRD at fft
  2048/1024/512, DC-removal + 0.8 peak-norm preprocess) —
  ref decoder/discriminator_dac.py:36-237

TPU-native design: channel-last NHWC conv2d stacks; STFTs via the shared
ops.spectral framing (rectangular window, center reflect-pad, matching
torch.stft defaults used by the reference).  All convs carry weight-norm
(v, g) training parametrization (see train.wnorm).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d
from ..ops.spectral import hann_window, stft
from .wnorm import fold_tree, fold_wn

LRELU_SLOPE = 0.1


def _lrelu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def _cast_floats(tree, dtype):
    """Cast every (floating) leaf to the GAN compute dtype; None = identity.

    Mixed-precision training support: the three discriminator families are
    ~80% of the GAN step's FLOPs and none of them touch the bit-exact
    encoder/VQ invariant, so running their convs in bfloat16 doubles their
    MXU rate (f32 matmuls run at half the bf16 peak on TPU).  Master params
    stay f32 — the cast sits inside the loss, so AdamW updates and the
    weight-norm fold are full precision, and grads come back f32 through
    the transpose of the cast.  Opt-in via TrainConfig.disc_compute_dtype
    (the reference trains f32, so f32 stays the parity default)."""
    if dtype is None:
        return tree

    def _cast(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    return jax.tree.map(_cast, tree)


# --------------------------------------------------------------------------
# Param init (torch Conv2d defaults: U(+-1/sqrt(fan_in)), then weight_norm)
# --------------------------------------------------------------------------

def _conv2d_wn_init(rng, kh, kw, cin, cout):
    fan_in = cin * kh * kw
    bound = 1.0 / np.sqrt(fan_in)
    kernel = rng.uniform(-bound, bound, size=(kh, kw, cin, cout)).astype(np.float32)
    g = np.sqrt((kernel.astype(np.float64) ** 2).sum(axis=(0, 1, 2),
                                                     keepdims=True)).astype(np.float32)
    bias = rng.uniform(-bound, bound, size=(cout,)).astype(np.float32)
    return {"v": kernel, "g": g, "bias": bias}


VOCOS_MPD_PERIODS = (2, 3, 5, 7, 11)
VOCOS_MRD_RESOLUTIONS = ((1024, 256, 1024), (2048, 512, 2048), (512, 128, 512))
DAC_PERIODS = (2, 3, 5, 7, 11)
DAC_FFT_SIZES = (2048, 1024, 512)
DAC_BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


def init_discriminators(seed: int = 0, num_embeddings: int | None = 4,
                        channels_scale: float = 1.0) -> dict:
    """Init all three discriminator families (ref: experiment.py:387-389).

    ``channels_scale`` shrinks every hidden channel count (min 1) while
    keeping all families / periods / resolutions / bands structurally
    intact — the forward fns read widths from the params, so a scaled tree
    runs the same graph shape.  Structural dry runs (__graft_entry__) use
    ~1/16 so the full GAN-step compile fits the driver's budget; training
    always uses 1.0 (the reference's widths)."""
    rng = np.random.default_rng(seed)
    params = {"mpd": [], "mrd": [], "dac_mpd": [], "dac_mrd": []}

    def s(c: int) -> int:
        return max(1, int(round(c * channels_scale)))

    for _p in VOCOS_MPD_PERIODS:
        chans = [(1, s(32)), (s(32), s(128)), (s(128), s(512)),
                 (s(512), s(1024)), (s(1024), s(1024))]
        d = {"convs": [_conv2d_wn_init(rng, 5, 1, ci, co) for ci, co in chans],
             "conv_post": _conv2d_wn_init(rng, 3, 1, s(1024), 1)}
        if num_embeddings is not None:
            d["emb"] = np.zeros((num_embeddings, s(1024)), np.float32)
        params["mpd"].append(d)

    for _r in VOCOS_MRD_RESOLUTIONS:
        ch = s(64)
        specs = [(7, 5, 1, ch), (5, 3, ch, ch), (5, 3, ch, ch), (3, 3, ch, ch),
                 (3, 3, ch, ch)]
        d = {"convs": [_conv2d_wn_init(rng, kh, kw, ci, co)
                       for kh, kw, ci, co in specs],
             "conv_post": _conv2d_wn_init(rng, 3, 3, ch, 1)}
        if num_embeddings is not None:
            d["emb"] = np.zeros((num_embeddings, ch), np.float32)
        params["mrd"].append(d)

    for _p in DAC_PERIODS:
        chans = [(1, s(32)), (s(32), s(128)), (s(128), s(512)),
                 (s(512), s(1024)), (s(1024), s(1024))]
        params["dac_mpd"].append(
            {"convs": [_conv2d_wn_init(rng, 5, 1, ci, co) for ci, co in chans],
             "conv_post": _conv2d_wn_init(rng, 3, 1, s(1024), 1)})

    for _f in DAC_FFT_SIZES:
        ch = s(32)
        band_convs = []
        for _b in DAC_BANDS:
            band_convs.append([
                _conv2d_wn_init(rng, 3, 9, 2, ch),
                _conv2d_wn_init(rng, 3, 9, ch, ch),
                _conv2d_wn_init(rng, 3, 9, ch, ch),
                _conv2d_wn_init(rng, 3, 9, ch, ch),
                _conv2d_wn_init(rng, 3, 3, ch, ch),
            ])
        params["dac_mrd"].append({"bands": band_convs,
                                  "conv_post": _conv2d_wn_init(rng, 3, 3, ch, 1)})
    return params


# --------------------------------------------------------------------------
# Vocos DiscriminatorP (ref: discriminators.py:42-98)
# --------------------------------------------------------------------------

def _fold_to_period(x: jnp.ndarray, period: int, always_pad: bool) -> jnp.ndarray:
    """(B, T) -> (B, T'/p, p, 1) with reflect right-pad to a multiple of p.

    Vocos pads only when t % p != 0; DAC pads p - t%p unconditionally
    (p extra samples when already divisible) — ref discriminator_dac.py:53-56.
    """
    B, T = x.shape
    rem = T % period
    if rem != 0 or always_pad:
        n_pad = period - rem
        x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
        T = T + n_pad
    return x.reshape(B, T // period, period, 1)


def discriminator_p(params: dict, period: int, x: jnp.ndarray,
                    cond_embedding_id=None, compute_dtype=None):
    """x: (B, T) audio.  Returns (logits (B, N), fmap list)."""
    folded = _cast_floats(fold_tree(params), compute_dtype)
    h = _fold_to_period(_cast_floats(x, compute_dtype), period,
                        always_pad=False)
    fmap = []
    for i, c in enumerate(folded["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        h = conv2d(h, c["kernel"], c["bias"], strides=stride,
                   padding=((2, 2), (0, 0)))
        h = _lrelu(h)
        if i > 0:
            fmap.append(h)
    if cond_embedding_id is not None:
        emb = _cast_floats(params["emb"], compute_dtype)[cond_embedding_id]
        # f32 accumulation for the 1024-wide conditional projection
        cond = jnp.sum((emb * h).astype(jnp.float32), axis=-1, keepdims=True)
        cond = cond.astype(h.dtype)                      # (B, H, W, 1)
    else:
        cond = 0.0
    out = conv2d(h, folded["conv_post"]["kernel"], folded["conv_post"]["bias"],
                 padding=((1, 1), (0, 0)))
    fmap.append(out)
    out = out + cond
    return out.reshape(out.shape[0], -1), fmap


# --------------------------------------------------------------------------
# Vocos DiscriminatorR (ref: discriminators.py:141-202)
# --------------------------------------------------------------------------

def discriminator_r(params: dict, resolution: tuple, x: jnp.ndarray,
                    cond_embedding_id=None, compute_dtype=None):
    """x: (B, T) audio.  Rectangular-window magnitude STFT then conv2d stack.

    The STFT itself always runs f32 (FFT accuracy); only the conv stack
    downstream honors ``compute_dtype``."""
    n_fft, hop, win = resolution
    folded = _cast_floats(fold_tree(params), compute_dtype)
    ones = np.ones(win, np.float32)
    spec = stft(x, n_fft, hop, win_length=win, window=ones, center=True,
                pad_mode="reflect")                     # (B, T', F)
    mag = _cast_floats(jnp.abs(spec), compute_dtype)
    # torch layout (B, 1, F, T') -> NHWC (B, F, T', 1)
    h = jnp.swapaxes(mag, 1, 2)[..., None]
    fmap = []
    conv_cfg = [((7, 5), (2, 2), (3, 2)), ((5, 3), (2, 1), (2, 1)),
                ((5, 3), (2, 2), (2, 1)), ((3, 3), (2, 1), (1, 1)),
                ((3, 3), (2, 2), (1, 1))]
    for c, (k, s, p) in zip(folded["convs"], conv_cfg):
        h = conv2d(h, c["kernel"], c["bias"], strides=s,
                   padding=((p[0], p[0]), (p[1], p[1])))
        h = _lrelu(h)
        fmap.append(h)
    if cond_embedding_id is not None:
        emb = _cast_floats(params["emb"], compute_dtype)[cond_embedding_id]
        cond = jnp.sum((emb * h).astype(jnp.float32), axis=-1, keepdims=True)
        cond = cond.astype(h.dtype)
    else:
        cond = 0.0
    out = conv2d(h, folded["conv_post"]["kernel"], folded["conv_post"]["bias"],
                 padding=((1, 1), (1, 1)))
    fmap.append(out)
    out = out + cond
    return out.reshape(out.shape[0], -1), fmap


def multi_period_discriminator(params: list, y: jnp.ndarray, y_hat: jnp.ndarray,
                               bandwidth_id=None):
    """ref: discriminators.py:24-39.  Returns (real_scores, gen_scores,
    fmaps_real, fmaps_gen), each a list over periods."""
    rs, gs, fr, fg = [], [], [], []
    for p, period in zip(params, VOCOS_MPD_PERIODS):
        r, fmap_r = discriminator_p(p, period, y, bandwidth_id)
        g, fmap_g = discriminator_p(p, period, y_hat, bandwidth_id)
        rs.append(r); gs.append(g); fr.append(fmap_r); fg.append(fmap_g)
    return rs, gs, fr, fg


def multi_resolution_discriminator(params: list, y: jnp.ndarray,
                                   y_hat: jnp.ndarray, bandwidth_id=None):
    rs, gs, fr, fg = [], [], [], []
    for p, res in zip(params, VOCOS_MRD_RESOLUTIONS):
        r, fmap_r = discriminator_r(p, res, y, bandwidth_id)
        g, fmap_g = discriminator_r(p, res, y_hat, bandwidth_id)
        rs.append(r); gs.append(g); fr.append(fmap_r); fg.append(fmap_g)
    return rs, gs, fr, fg


# --------------------------------------------------------------------------
# DAC discriminator (ref: discriminator_dac.py)
# --------------------------------------------------------------------------

def _dac_preprocess(y: jnp.ndarray) -> jnp.ndarray:
    """DC removal + 0.8 peak normalization (ref: discriminator_dac.py:227-232)."""
    y = y - jnp.mean(y, axis=-1, keepdims=True)
    return 0.8 * y / (jnp.max(jnp.abs(y), axis=-1, keepdims=True) + 1e-9)


def _dac_mpd(params: dict, period: int, x: jnp.ndarray, compute_dtype=None):
    """x: (B, T).  fmap = every intermediate incl. conv_post output."""
    folded = _cast_floats(fold_tree(params), compute_dtype)
    h = _fold_to_period(_cast_floats(x, compute_dtype), period,
                        always_pad=True)
    fmap = []
    for i, c in enumerate(folded["convs"]):
        h = conv2d(h, c["kernel"], c["bias"], strides=(3, 1) if i < 4 else (1, 1),
                   padding=((2, 2), (0, 0)))
        h = _lrelu(h)
        fmap.append(h)
    out = conv2d(h, folded["conv_post"]["kernel"], folded["conv_post"]["bias"],
                 padding=((1, 1), (0, 0)))
    fmap.append(out)
    return fmap


_DAC_MRD_CONV_CFG = [((3, 9), (1, 1), (1, 4)), ((3, 9), (1, 2), (1, 4)),
                     ((3, 9), (1, 2), (1, 4)), ((3, 9), (1, 2), (1, 4)),
                     ((3, 3), (1, 1), (1, 1))]


def _dac_mrd_spectrogram(x: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """torch.stft defaults: hop = n_fft // 4, rectangular window, center=True
    reflect pad.  Real/imag stacked as 2 channels: (B, T', F, 2)."""
    ones = np.ones(n_fft, np.float32)
    spec = stft(x, n_fft, n_fft // 4, win_length=n_fft, window=ones,
                center=True, pad_mode="reflect")        # (B, T', F)
    return jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)


def _dac_mrd_band_slices(n_fft: int) -> list:
    n_bins = n_fft // 2 + 1
    return [(int(lo * n_bins), int(hi * n_bins)) for lo, hi in DAC_BANDS]


def _dac_mrd_band(stack_params: list, b: jnp.ndarray,
                  compute_dtype=None) -> list:
    """One band's conv stack over its spectrogram slice; returns the fmap
    list (5 activations, last = band output).  stack_params are (v,g,bias)
    weight-norm trees (folded here)."""
    folded = _cast_floats([fold_tree(c) for c in stack_params], compute_dtype)
    b = _cast_floats(b, compute_dtype)
    fmap = []
    for c, (k, s, p) in zip(folded, _DAC_MRD_CONV_CFG):
        b = conv2d(b, c["kernel"], c["bias"], strides=s,
                   padding=((p[0], p[0]), (p[1], p[1])))
        b = _lrelu(b)
        fmap.append(b)
    return fmap


def _dac_mrd_post(post_params: dict, band_outs: list,
                  compute_dtype=None) -> jnp.ndarray:
    folded = _cast_floats(fold_tree(post_params), compute_dtype)
    out = jnp.concatenate(band_outs, axis=2)  # concat along F
    return conv2d(out, folded["kernel"], folded["bias"],
                  padding=((1, 1), (1, 1)))


def _dac_mrd(params: dict, n_fft: int, x: jnp.ndarray, compute_dtype=None):
    """Complex multi-band spectrogram discriminator (ref: :110-191).

    Bands split the frequency axis; convs run (T, F) with stride-2
    downsampling on F; conv_post over the F-concatenated band outputs.
    The spectrogram itself stays f32 (FFT accuracy)."""
    h = _dac_mrd_spectrogram(x, n_fft)
    fmap = []
    outs = []
    for (lo, hi), stack in zip(_dac_mrd_band_slices(n_fft), params["bands"]):
        band_fmap = _dac_mrd_band(stack, h[:, :, lo:hi, :],
                                  compute_dtype=compute_dtype)
        fmap.extend(band_fmap)
        outs.append(band_fmap[-1])
    out = _dac_mrd_post(params["conv_post"], outs, compute_dtype=compute_dtype)
    fmap.append(out)
    return fmap


def dac_discriminator(params: dict, x: jnp.ndarray, compute_dtype=None) -> list:
    """x: (B, T).  Returns list of fmap-lists, one per sub-discriminator
    (ref: discriminator_dac.py:234-237)."""
    x = _dac_preprocess(x)
    fmaps = []
    for p, period in zip(params["dac_mpd"], DAC_PERIODS):
        fmaps.append(_dac_mpd(p, period, x, compute_dtype=compute_dtype))
    for p, n_fft in zip(params["dac_mrd"], DAC_FFT_SIZES):
        fmaps.append(_dac_mrd(p, n_fft, x, compute_dtype=compute_dtype))
    return fmaps




# --------------------------------------------------------------------------
# MS-STFT discriminator (ref: encoder/msstftd.py:28-128 — EnCodec's
# discriminator family; present in the reference tree but unused by the
# shipped WavTokenizer configs)
# --------------------------------------------------------------------------

# (n_fft, hop_length, win_length) per scale — ref msstftd.py:113-115 defaults.
MSSTFT_SCALES = ((1024, 256, 1024), (2048, 512, 2048), (512, 128, 512))
MSSTFT_DILATIONS = (1, 2, 4)
MSSTFT_FILTERS = 32


def init_msstft_discriminator(seed: int = 0, filters: int = MSSTFT_FILTERS) -> list:
    """Conv stacks for the 3 STFT scales (ref msstftd.py:66-85).

    With the default filters_scale=1 every hidden layer has `filters`
    channels; input has 2 (complex STFT real/imag as channels).  Reference
    quirk preserved: the FIRST conv of each scale is built without the norm
    kwarg (msstftd.py:69-71) so it is a plain conv, while the rest carry
    weight_norm."""
    rng = np.random.default_rng(seed)
    params = []
    for _scale in MSSTFT_SCALES:
        first = _conv2d_wn_init(rng, 3, 9, 2, filters)
        convs = [{"kernel": fold_wn(jnp.asarray(first["v"]),
                                    jnp.asarray(first["g"])),
                  "bias": first["bias"]}]
        for _d in MSSTFT_DILATIONS:
            convs.append(_conv2d_wn_init(rng, 3, 9, filters, filters))
        convs.append(_conv2d_wn_init(rng, 3, 3, filters, filters))
        params.append({"convs": convs,
                       "conv_post": _conv2d_wn_init(rng, 3, 3, filters, 1)})
    return params


def discriminator_stft(params: dict, scale: tuple, x: jnp.ndarray):
    """One DiscriminatorSTFT scale (ref msstftd.py:87-97).  x: (B, T) audio.

    Spectrogram: hann window, center=False, "window"-normalized complex STFT
    (torchaudio.transforms.Spectrogram(normalized=True, power=None) divides
    by sqrt(sum(win^2))).  Layout: torch (B, C, frames, freq) -> NHWC
    (B, frames, freq, C) with C = [real, imag].
    LeakyReLU slope is 0.2 here (msstftd.py:50), not the Vocos 0.1.
    """
    n_fft, hop, win = scale
    folded = fold_tree(params)
    w = hann_window(win)
    spec = stft(x, n_fft, hop, win_length=win, window=w, center=False)
    spec = spec * (1.0 / np.sqrt(np.sum(w.astype(np.float64) ** 2)))
    h = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)  # (B, T', F, 2)

    # (stride, time-dilation, padding) per conv; padding = get_2d_padding
    # (msstftd.py:24-25): ((k-1)*d//2 on time, (k-1)//2 on freq).
    conv_cfg = [((1, 1), 1, ((1, 1), (4, 4)))]
    conv_cfg += [((1, 2), d, ((d, d), (4, 4))) for d in MSSTFT_DILATIONS]
    conv_cfg += [((1, 1), 1, ((1, 1), (1, 1)))]

    fmap = []
    for c, (s, d, p) in zip(folded["convs"], conv_cfg):
        h = conv2d(h, c["kernel"], c["bias"], strides=s, padding=p,
                   dilation=(d, 1))
        h = jax.nn.leaky_relu(h, 0.2)
        fmap.append(h)
    out = conv2d(h, folded["conv_post"]["kernel"], folded["conv_post"]["bias"],
                 padding=((1, 1), (1, 1)))
    return out, fmap


def msstft_discriminator(params: list, x: jnp.ndarray):
    """MultiScaleSTFTDiscriminator forward (ref msstftd.py:122-128).
    Returns (logits list, fmaps list) over the 3 scales."""
    logits, fmaps = [], []
    for p, scale in zip(params, MSSTFT_SCALES):
        out, fmap = discriminator_stft(p, scale, x)
        logits.append(out)
        fmaps.append(fmap)
    return logits, fmaps
