"""Tests for the tools_tpu utilities (filelist prep, batch lowpass)."""

import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools_tpu"))

from wavtokenizer_tpu.ops.spectral import istft_center, stft


def test_prepare_data_lists(tmp_path):
    from prepare_data_lists import generate_file_lists
    src = tmp_path / "source"; tgt = tmp_path / "target"; out = tmp_path / "out"
    src.mkdir(); tgt.mkdir()
    for i in range(3):
        (src / f"s{i}_box_LDV.wav").write_bytes(b"")
    for i in range(2):  # one clean file missing on purpose
        (tgt / f"s{i}_box_clean.wav").write_bytes(b"")
    n_src, n_pairs = generate_file_lists(str(src), str(tgt), str(out))
    assert (n_src, n_pairs) == (3, 2)
    pairs = (out / "speaker_pairs.txt").read_text().strip().splitlines()
    assert len(pairs) == 2 and all("|" in p for p in pairs)
    noisy, clean = pairs[0].split("|")
    assert noisy.endswith("s0_box_LDV.wav") and clean.endswith("s0_box_clean.wav")
    assert len((out / "source_list.txt").read_text().strip().splitlines()) == 3


def test_istft_center_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8192)).astype(np.float32))
    spec = stft(x, 2048, 512, center=True)
    y = istft_center(jnp.real(spec), jnp.imag(spec), 2048, 512)
    L = min(x.shape[1], y.shape[1])
    np.testing.assert_allclose(np.asarray(y[:, :L]), np.asarray(x[:, :L]),
                               atol=1e-4)


def test_lowpass_removes_high_frequencies():
    from lowpass import lowpass_batch
    sr = 24000
    t = np.arange(2 * sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 1000 * t) +
           0.5 * np.sin(2 * np.pi * 8000 * t)).astype(np.float32)
    out = np.asarray(lowpass_batch(jnp.asarray(sig[None]), sr, 4000.0))[0]
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freqs = np.fft.rfftfreq(len(out), 1 / sr)
    hi = spec[freqs > 5000].max()
    lo = spec[(freqs > 900) & (freqs < 1100)].max()
    assert hi < 1e-2 * lo, (hi, lo)
