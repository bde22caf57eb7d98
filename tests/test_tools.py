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


def _write_test_wavs(d, n=4, sr=24000, seconds=0.6, seed=0):
    from scipy.io import wavfile
    rng = np.random.default_rng(seed)
    os.makedirs(d, exist_ok=True)
    names = []
    for i in range(n):
        mat = "box" if i % 2 == 0 else "tile"
        t = np.arange(int(sr * seconds)) / sr
        y = 0.3 * np.sin(2 * np.pi * (200 + 100 * i) * t) + \
            0.05 * rng.normal(size=len(t))
        name = f"s{i}_{mat}_LDV.wav"
        wavfile.write(os.path.join(d, name), sr,
                      (y * 32767).astype(np.int16))
        names.append(name)
    return names


def test_analyze_features_roundtrip(tmp_path):
    """wav_re.py-equivalent: folder -> reconstructions + t-SNE artifacts."""
    from analyze_features import main, material_of
    assert material_of("s1_box_LDV.wav") == "box"
    src = str(tmp_path / "wavs"); out = str(tmp_path / "out")
    names = _write_test_wavs(src)
    rc = main(["roundtrip", "--input-dir", src, "--out-dir", out,
               "--seconds", "0.5", "--perplexity", "2"])
    assert rc == 0
    for n in names:
        assert os.path.exists(os.path.join(out, n))
    pooled = np.load(os.path.join(out, "pooled_features.npy"))
    assert pooled.shape == (len(names), 512)
    assert os.path.exists(os.path.join(out, "tsne.png"))


def test_analyze_features_compare(tmp_path):
    """add.py-equivalent: combined clean-vs-enhanced t-SNE."""
    from analyze_features import main
    from wavtokenizer_tpu.models.init import init_wavtokenizer
    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.research.adapter import init_adapter
    from wavtokenizer_tpu.train.trainer import save_checkpoint

    src = str(tmp_path / "wavs"); out = str(tmp_path / "out")
    names = _write_test_wavs(src, n=3)
    adapter_params, adapter_state = init_adapter()
    base = init_wavtokenizer(WavTokenizerSpec(), random_codebook=True)
    ck_path = str(tmp_path / "adapter_ck")
    save_checkpoint(ck_path, {"adapter": adapter_params,
                              "adapter_state": adapter_state,
                              "decoder": base["decoder"],
                              "step": np.asarray(0)})
    rc = main(["compare", "--input-dir", src, "--out-dir", out,
               "--adapter-ckpt", ck_path, "--seconds", "0.5",
               "--perplexity", "2"])
    assert rc == 0
    combined = np.load(os.path.join(out, "combined_features.npy"))
    assert combined.shape == (2 * len(names), 512)
    assert os.path.exists(os.path.join(out, "combined_tsne.png"))
