"""Op-level parity tests against the torch reference oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

import ref_utils as R
from wavtokenizer_tpu import ops

needs_ref = pytest.mark.skipif(not R.HAVE_REFERENCE,
                               reason="torch reference not available")


@needs_ref
@pytest.mark.parametrize("k,stride,dilation,causal,length", [
    (7, 1, 1, False, 100),
    (4, 2, 1, False, 101),
    (16, 8, 1, False, 240),
    (3, 1, 4, False, 57),
    (7, 1, 1, True, 64),
    (4, 2, 1, True, 63),
    (3, 1, 2, False, 2),   # tiny input triggers the reflect-pad guard
])
def test_sconv1d_parity(k, stride, dilation, causal, length):
    import torch
    from encoder.modules.conv import SConv1d

    R.seed_all(0)
    m = SConv1d(5, 8, kernel_size=k, stride=stride, dilation=dilation,
                causal=causal, norm="weight_norm", pad_mode="reflect")
    m.eval()
    x = torch.randn(2, 5, length)
    with torch.no_grad():
        y_ref = m(x).numpy()

    from wavtokenizer_tpu.checkpoint.convert import conv1d_params
    sd = R.state_dict_numpy(m)
    p = conv1d_params(sd, "conv.conv")
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 1))
    y = ops.sconv1d(x_j, jnp.asarray(p["kernel"]), jnp.asarray(p["bias"]),
                    stride=stride, dilation=dilation, causal=causal,
                    pad_mode="reflect")
    y = np.transpose(np.asarray(y), (0, 2, 1))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=2e-5, rtol=1e-4)


@needs_ref
@pytest.mark.parametrize("k,stride,causal", [
    (16, 8, False), (4, 2, False), (10, 5, True), (8, 4, False),
])
def test_sconvtranspose1d_parity(k, stride, causal):
    import torch
    from encoder.modules.conv import SConvTranspose1d

    R.seed_all(1)
    m = SConvTranspose1d(6, 3, kernel_size=k, stride=stride, causal=causal,
                         norm="weight_norm")
    m.eval()
    x = torch.randn(2, 6, 25)
    with torch.no_grad():
        y_ref = m(x).numpy()

    from wavtokenizer_tpu.checkpoint.convert import convtr1d_params
    sd = R.state_dict_numpy(m)
    p = convtr1d_params(sd, "convtr.convtr")
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 1))
    y = ops.sconv_transpose1d(x_j, jnp.asarray(p["kernel"]), jnp.asarray(p["bias"]),
                              stride=stride, causal=causal)
    y = np.transpose(np.asarray(y), (0, 2, 1))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=2e-5, rtol=1e-4)


@needs_ref
def test_slstm_parity():
    import torch
    from encoder.modules.lstm import SLSTM

    R.seed_all(2)
    m = SLSTM(16, num_layers=2)
    m.eval()
    x = torch.randn(3, 16, 40)
    with torch.no_grad():
        y_ref = m(x).numpy()

    from wavtokenizer_tpu.checkpoint.convert import lstm_params
    sd = R.state_dict_numpy(m)
    p = lstm_params(sd, "lstm", 2)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 1))
    y = ops.slstm(x_j, [{k: jnp.asarray(v) for k, v in lp.items()}
                        for lp in p["layers"]])
    y = np.transpose(np.asarray(y), (0, 2, 1))
    np.testing.assert_allclose(y, y_ref, atol=1e-5, rtol=1e-4)


@needs_ref
@pytest.mark.parametrize("n_fft,hop,T", [(1280, 320, 20), (2400, 600, 9),
                                         (16, 4, 7)])
def test_istft_same_parity(n_fft, hop, T):
    import torch
    from decoder.spectral_ops import ISTFT

    R.seed_all(3)
    m = ISTFT(n_fft=n_fft, hop_length=hop, win_length=n_fft, padding="same")
    N = n_fft // 2 + 1
    re = torch.randn(2, N, T)
    im = torch.randn(2, N, T)
    with torch.no_grad():
        y_ref = m(torch.complex(re, im)).numpy()

    y = ops.istft_same(jnp.asarray(re.numpy().transpose(0, 2, 1)),
                       jnp.asarray(im.numpy().transpose(0, 2, 1)),
                       n_fft, hop)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4, rtol=1e-3)


@needs_ref
def test_vq_codes_bitexact():
    import torch

    cb = R.build_ref_codebook(32, 257)
    x = torch.randn(500, 32)
    with torch.no_grad():
        idx_ref = cb.quantize(x).numpy()
    idx = np.asarray(ops.nearest_codebook_indices(
        jnp.asarray(x.numpy()), jnp.asarray(cb.embed.numpy())))
    assert (idx == idx_ref).all()


@needs_ref
def test_mel_spectrogram_matches_torch_stft():
    """Our STFT framing vs torch.stft(center=True, reflect? torch default
    pad_mode='reflect' for stft? torch.stft center pads with zeros by default
    — the mel loss uses torchaudio MelSpectrogram which uses reflect).  Here
    we compare raw STFT against torch.stft with the same settings."""
    import torch

    R.seed_all(4)
    x = torch.randn(2, 3200)
    n_fft, hop = 1024, 256
    win = torch.hann_window(n_fft)
    with torch.no_grad():
        s_ref = torch.stft(x, n_fft, hop_length=hop, window=win,
                           center=True, pad_mode="reflect",
                           return_complex=True).numpy()  # (B, F, T)
    s = ops.stft(jnp.asarray(x.numpy()), n_fft, hop)  # (B, T, F)
    s = np.asarray(s).transpose(0, 2, 1)
    np.testing.assert_allclose(abs(s), abs(s_ref), atol=1e-3, rtol=1e-3)


def test_resample_properties():
    """No torchaudio oracle in image: check length contract + tone fidelity."""
    sr, new_sr = 24000, 16000
    t = np.arange(sr, dtype=np.float32) / sr
    x = np.sin(2 * np.pi * 440.0 * t)[None]
    y = np.asarray(ops.resample(jnp.asarray(x), sr, new_sr))
    assert y.shape == (1, int(np.ceil(new_sr * x.shape[1] / sr)))
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(y[0] * np.hanning(y.shape[1])))
    freq = np.fft.rfftfreq(y.shape[1], 1 / new_sr)
    assert abs(freq[spec.argmax()] - 440.0) < 2.0
    # amplitude approximately preserved
    assert abs(np.abs(y).max() - 1.0) < 0.05


def test_overlap_add_matches_naive():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(2, 9, 20)).astype(np.float32)
    hop = 5
    out = np.asarray(ops.overlap_add(jnp.asarray(frames), hop))
    ref = np.zeros((2, 8 * hop + 20), dtype=np.float32)
    for t in range(9):
        ref[:, t * hop:t * hop + 20] += frames[:, t]
    np.testing.assert_allclose(out, ref, atol=1e-6)


@needs_ref
def test_linear_overlap_add_parity():
    import torch
    from encoder.utils import _linear_overlap_add

    R.seed_all(5)
    frames_t = [torch.randn(2, 1, 100) for _ in range(4)]
    with torch.no_grad():
        y_ref = _linear_overlap_add(frames_t, stride=60).numpy()
    y = ops.linear_overlap_add([jnp.asarray(f.numpy()) for f in frames_t], 60)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5, rtol=1e-4)


def test_stft_istft_win_shorter_than_nfft_torch_parity(rng):
    """torch.stft/istft semantics for win_length < n_fft: frames are n_fft
    long with a center-padded window (framing by win_length would shift
    every frame by (n_fft-win)//2)."""
    import torch

    from wavtokenizer_tpu.ops.spectral import istft_center, istft_same, stft

    n_fft, hop, win = 512, 128, 384
    x = rng.normal(size=(2, 4096)).astype(np.float32)
    wnp = np.hanning(win + 1)[:-1].astype(np.float32)  # periodic hann
    wt = torch.hann_window(win)
    np.testing.assert_allclose(wnp, wt.numpy(), atol=1e-6)

    spec_ref = torch.stft(torch.from_numpy(x), n_fft, hop, win_length=win,
                          window=wt, center=True, pad_mode="reflect",
                          return_complex=True)
    spec = stft(jnp.asarray(x), n_fft, hop, win_length=win, window=wnp,
                center=True)
    np.testing.assert_allclose(np.asarray(spec),
                               spec_ref.transpose(1, 2).numpy(),
                               atol=1e-3, rtol=1e-4)

    y_ref = torch.istft(spec_ref, n_fft, hop, win_length=win, window=wt,
                        center=True)
    y = istft_center(jnp.real(spec), jnp.imag(spec), n_fft, hop,
                     win_length=win)
    L = min(y.shape[1], y_ref.shape[1])
    np.testing.assert_allclose(np.asarray(y)[:, :L], y_ref.numpy()[:, :L],
                               atol=1e-4, rtol=1e-4)

    # the reference's "same" ISTFT only defines win == n_fft; we refuse
    # rather than invent semantics
    try:
        istft_same(jnp.real(spec), jnp.imag(spec), n_fft, hop, win_length=win)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


@pytest.mark.parametrize("n_fft,hop", [(1280, 320), (2400, 600)])
def test_istft_radix2_matches_matmul(n_fft, hop):
    """The radix-2 decimated inverse-DFT (a measured r5 perf dead end on
    v5e, kept opt-in via WT_ISTFT_METHOD=radix2) must stay value-identical
    to the dense matmul path to f32 rounding on both shipped geometries —
    including the bins-0/N/2 imaginary parts both paths ignore."""
    from wavtokenizer_tpu.ops.spectral import _istft_impl

    rng = np.random.default_rng(5)
    Nb = n_fft // 2 + 1
    re = jnp.asarray(rng.normal(size=(2, 9, Nb)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(2, 9, Nb)).astype(np.float32))
    pad = (n_fft - hop) // 2
    a = np.asarray(_istft_impl(re, im, n_fft, hop, n_fft, pad, "matmul"))
    b = np.asarray(_istft_impl(re, im, n_fft, hop, n_fft, pad, "radix2"))
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-6)
