"""Graph + converter parity for the native CREPE-full tracker
(metrics/crepe.py).

torchcrepe is not installed in this image, so the torch oracle replicates
torchcrepe/model.py ``Crepe("full")`` from its published architecture:
six [F.pad -> Conv2d -> relu -> BatchNorm2d(eps=1e-3) -> max_pool2d((2,1))]
layers (kernel (512,1) stride (4,1) pad (254,254) first, then (64,1)/1/
(31,32)), permute+flatten, Linear(2048, 360), sigmoid.  Its state dict uses
exactly torchcrepe's names (conv{i}/conv{i}_BN/classifier), so the test
pins BOTH the jax graph and the checkpoint converter.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from wavtokenizer_tpu.metrics.crepe import (FULL_LAYERS, PITCH_BINS,  # noqa: E402
                                            bins_to_frequency,
                                            crepe_params_from_torch,
                                            crepe_predict, crepe_salience,
                                            frame_audio, frequency_to_bins,
                                            load_crepe, viterbi_decode)


class TorchCrepeOracle(torch.nn.Module):
    """torchcrepe/model.py Crepe("full"), state-dict-compatible."""

    def __init__(self):
        super().__init__()
        in_ch = [1, 1024, 128, 128, 128, 256]
        for i, (out, k, s, _) in enumerate(FULL_LAYERS, start=1):
            setattr(self, f"conv{i}",
                    torch.nn.Conv2d(in_ch[i - 1], out, (k, 1), (s, 1)))
            setattr(self, f"conv{i}_BN",
                    torch.nn.BatchNorm2d(out, eps=1e-3, momentum=0.0))
        self.classifier = torch.nn.Linear(2048, PITCH_BINS)

    def _layer(self, x, i, padding=(0, 0, 31, 32)):
        x = torch.nn.functional.pad(x, padding)
        x = getattr(self, f"conv{i}")(x)
        x = torch.nn.functional.relu(x)
        x = getattr(self, f"conv{i}_BN")(x)
        return torch.nn.functional.max_pool2d(x, (2, 1), (2, 1))

    def forward(self, frames):
        x = frames[:, None, :, None]
        x = self._layer(x, 1, (0, 0, 254, 254))
        for i in range(2, 7):
            x = self._layer(x, i)
        x = x.permute(0, 2, 1, 3).reshape(-1, 2048)
        return torch.sigmoid(self.classifier(x))


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(42)
    m = TorchCrepeOracle().eval()
    # non-trivial running stats (fresh BN has mean 0 / var 1)
    for i in range(1, 7):
        bn = getattr(m, f"conv{i}_BN")
        bn.running_mean.data.normal_(0, 0.1)
        bn.running_var.data.uniform_(0.6, 1.4)
    params = crepe_params_from_torch(m.state_dict())
    return m, params


def test_salience_parity(oracle):
    m, params = oracle
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(4, 1024)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(frames)).numpy()
    got = np.asarray(crepe_salience(params, jnp.asarray(frames)))
    assert got.shape == (4, PITCH_BINS)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_frame_audio_matches_torch_unfold():
    """pad=False framing + per-frame normalization (torchcrepe
    core.preprocess): 1024 windows at hop 160, mean-centered, unbiased-std
    scaled."""
    rng = np.random.default_rng(1)
    audio = rng.normal(size=(4000,)).astype(np.float32)
    frames = frame_audio(audio, hop_length=160)
    t = torch.from_numpy(audio)[None]
    ref = t.unfold(1, 1024, 160).reshape(-1, 1024)
    ref = ref - ref.mean(dim=1, keepdim=True)
    ref = ref / torch.clamp(ref.std(dim=1, keepdim=True), min=1e-10)
    assert frames.shape == tuple(ref.shape)
    np.testing.assert_allclose(frames, ref.numpy(), atol=1e-6)


def test_bin_conversions():
    # torchcrepe constants: bin 0 -> 1997.38 cents -> 10*2**(c/1200) Hz
    np.testing.assert_allclose(bins_to_frequency(np.array([0])),
                               [10 * 2 ** (1997.3794084376191 / 1200)])
    # frequency_to_bins floor/ceil bracket the true value
    for f in (50.0, 123.0, 550.0):
        lo = frequency_to_bins(f)
        hi = frequency_to_bins(f, np.ceil)
        assert lo <= (1200 * np.log2(f / 10) - 1997.3794084376191) / 20 <= hi


def test_viterbi_decode_banded():
    """Viterbi picks the smooth path: with a near-tie observation the banded
    transition max(12-|i-j|,0) forbids >11-bin jumps between frames."""
    T = 20
    post = np.full((T, PITCH_BINS), 1e-6)
    post[:, 100] = 0.5
    post[10, 100] = 1e-6
    post[10, 300] = 0.9           # isolated outlier 200 bins away
    path = viterbi_decode(post / post.sum(axis=1, keepdims=True))
    assert (path == 100).all()    # outlier unreachable through the band
    # a genuinely moving pitch IS tracked
    post2 = np.full((T, PITCH_BINS), 1e-6)
    bins = 100 + 5 * np.arange(T)
    post2[np.arange(T), bins] = 1.0
    path2 = viterbi_decode(post2 / post2.sum(axis=1, keepdims=True))
    np.testing.assert_array_equal(path2, bins)


def test_crepe_predict_pipeline(oracle):
    """End-to-end predict with random weights: correct shapes, periodicity
    equals the salience at the decoded bin, pitch restricted to
    [fmin, fmax] bins."""
    _, params = oracle
    rng = np.random.default_rng(2)
    audio = (np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)
             + 0.01 * rng.normal(size=8000)).astype(np.float32)
    pitch, periodicity = crepe_predict(params, audio)
    n = 1 + (8000 - 1024) // 160
    assert pitch.shape == periodicity.shape == (n,)
    assert np.all(pitch >= bins_to_frequency(np.array([
        frequency_to_bins(50.0)]))[0] - 1e-3)
    assert np.all(pitch <= bins_to_frequency(np.array([
        frequency_to_bins(550.0, np.ceil)]))[0] + 1e-3)
    assert np.all((periodicity >= 0) & (periodicity <= 1))


def test_load_crepe_roundtrip(tmp_path, oracle):
    m, params = oracle
    torch.save(m.state_dict(), tmp_path / "crepe.pth")
    loaded = load_crepe(str(tmp_path / "crepe.pth"))
    assert loaded is not None
    np.testing.assert_allclose(loaded["classifier"]["weight"],
                               params["classifier"]["weight"])
