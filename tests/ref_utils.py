"""Utilities to run the PUBLIC torch reference (read-only at /root/reference)
as a behavioral oracle for parity tests.

The reference needs torchaudio (absent in this image) only for module-level
imports; we stub the handful of symbols it touches.  If the reference tree or
torch is unavailable, importing sets HAVE_REFERENCE = False and tests that
need the oracle skip.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"
HAVE_REFERENCE = False
_err = None


def _install_torchaudio_stub():
    import math
    import torch

    if "torchaudio" in sys.modules:
        return

    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    ta = _mod("torchaudio")
    ta.__version__ = "0.0.0-stub"
    functional = _mod("torchaudio.functional")
    functional_inner = _mod("torchaudio.functional.functional")
    transforms = _mod("torchaudio.transforms")

    def _hz_to_mel(freq, mel_scale="htk"):
        return 2595.0 * math.log10(1.0 + freq / 700.0)

    def _mel_to_hz(mels, mel_scale="htk"):
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)

    functional_inner._hz_to_mel = _hz_to_mel
    functional_inner._mel_to_hz = _mel_to_hz
    functional._hz_to_mel = _hz_to_mel
    functional._mel_to_hz = _mel_to_hz

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("torchaudio stub: not available in tests")

    class _Spectrogram(torch.nn.Module):
        """Faithful torchaudio.transforms.Spectrogram for the arg subset the
        reference uses (msstftd.py:63-65: power=None complex STFT,
        normalized=True -> divide by sqrt(sum(win^2)), center=False)."""

        def __init__(self, n_fft=400, win_length=None, hop_length=None,
                     pad=0, window_fn=torch.hann_window, power=2.0,
                     normalized=False, wkwargs=None, center=True,
                     pad_mode="reflect", onesided=True):
            super().__init__()
            self.n_fft = n_fft
            self.win_length = win_length if win_length is not None else n_fft
            self.hop_length = hop_length if hop_length is not None else self.win_length // 2
            self.pad = pad
            self.power = power
            self.normalized = normalized
            self.center = center
            self.pad_mode = pad_mode
            self.onesided = onesided
            self.register_buffer("window", window_fn(self.win_length))

        def forward(self, waveform):
            shape = waveform.size()
            waveform = waveform.reshape(-1, shape[-1])
            if self.pad > 0:
                waveform = torch.nn.functional.pad(
                    waveform, (self.pad, self.pad), "constant")
            spec = torch.stft(
                waveform, self.n_fft, self.hop_length, self.win_length,
                self.window, center=self.center,
                pad_mode=self.pad_mode or "reflect", normalized=False,
                onesided=self.onesided, return_complex=True)
            if self.normalized:
                spec = spec / self.window.pow(2.0).sum().sqrt()
            spec = spec.reshape(shape[:-1] + spec.shape[-2:])
            if self.power is None:
                return spec
            return spec.abs().pow(self.power)

    transforms.Resample = _Unavailable
    transforms.MelSpectrogram = _Unavailable
    transforms.Spectrogram = _Spectrogram

    ta.functional = functional
    ta.transforms = transforms
    functional.functional = functional_inner
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = functional
    sys.modules["torchaudio.functional.functional"] = functional_inner
    sys.modules["torchaudio.transforms"] = transforms


try:
    import os

    if os.path.isdir(REFERENCE_PATH):
        _install_torchaudio_stub()
        if REFERENCE_PATH not in sys.path:
            sys.path.insert(0, REFERENCE_PATH)
        import torch  # noqa: F401

        # modern scipy moved signal.cosine -> signal.windows.cosine; the
        # reference calls the old location (decoder/spectral_ops.py:95,150)
        import scipy.signal
        if not hasattr(scipy.signal, "cosine"):
            scipy.signal.cosine = scipy.signal.windows.cosine
        HAVE_REFERENCE = True
except Exception as e:  # pragma: no cover
    _err = e
    HAVE_REFERENCE = False


def state_dict_numpy(module) -> dict:
    """torch module -> {key: np.ndarray} state dict."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def seed_all(seed: int = 0):
    import torch
    torch.manual_seed(seed)


def build_ref_seanet(kind: str, **kwargs):
    """Construct the reference SEANetEncoder/SEANetDecoder (eval mode)."""
    from encoder.modules.seanet import SEANetDecoder, SEANetEncoder
    cls = SEANetEncoder if kind == "encoder" else SEANetDecoder
    m = cls(**kwargs)
    m.eval()
    return m


def build_ref_backbone(**kwargs):
    from decoder.models import VocosBackbone
    m = VocosBackbone(**kwargs)
    m.eval()
    return m


def build_ref_istft_head(**kwargs):
    from decoder.heads import ISTFTHead
    m = ISTFTHead(**kwargs)
    m.eval()
    return m


def build_ref_codebook(dim: int, codebook_size: int, seed: int = 0):
    """EuclideanCodebook with a random, already-'inited' embed table."""
    import torch
    from encoder.quantization.core_vq import EuclideanCodebook
    cb = EuclideanCodebook(dim=dim, codebook_size=codebook_size, kmeans_init=True)
    g = torch.Generator().manual_seed(seed)
    embed = torch.randn(codebook_size, dim, generator=g)
    cb.embed.data.copy_(embed)
    cb.embed_avg.data.copy_(embed.clone())
    cb.inited.data.copy_(torch.tensor([True]))
    cb.cluster_size.data.copy_(torch.rand(codebook_size, generator=g) * 10 + 2.5)
    cb.eval()
    return cb


def build_ref_encodec_features(init_args: dict, seed: int = 0):
    """Reference EncodecFeatures with random weights and inited codebooks."""
    import torch
    from decoder.feature_extractors import EncodecFeatures
    seed_all(seed)
    fe = EncodecFeatures(**init_args)
    g = torch.Generator().manual_seed(seed + 1)
    for layer in fe.encodec.quantizer.vq.layers:
        cb = layer._codebook
        embed = torch.randn(cb.codebook_size, cb.embed.shape[1], generator=g)
        cb.embed.data.copy_(embed)
        cb.embed_avg.data.copy_(embed.clone())
        cb.inited.data.copy_(torch.tensor([True]))
        cb.cluster_size.data.copy_(
            torch.rand(cb.codebook_size, generator=g) * 10 + 2.5)
    fe.eval()
    return fe
