"""Native C++ data loader parity tests (vs the pure-Python pipeline).

Skipped when no C++ toolchain is available (the loader then falls back to
train/data.py at runtime anyway).
"""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from wavtokenizer_tpu import native
from wavtokenizer_tpu.train.data import read_audio, resample_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    sr = 24000
    paths = []
    for i in range(5):
        y = (rng.normal(size=sr * (2 + i % 2)) * 0.1).astype(np.float32)
        p = str(d / f"a{i}.wav")
        wavfile.write(p, sr, (y * 32767).astype(np.int16))
        paths.append(p)
    # one 44.1 kHz stereo int16 file (exercises downmix + native resample)
    y2 = (rng.normal(size=(44100, 2)) * 0.1).astype(np.float32)
    p2 = str(d / "stereo44k.wav")
    wavfile.write(p2, 44100, (y2 * 32767).astype(np.int16))
    return paths, p2


def test_native_decode_bitexact(wav_dir):
    paths, _ = wav_dir
    yn, srn = native.read_wav_mono(paths[0])
    yp, srp = read_audio(paths[0])
    assert srn == srp and yn.shape == yp.shape
    np.testing.assert_array_equal(yn, yp)


def test_native_decode_stereo_downmix(wav_dir):
    _, p2 = wav_dir
    yn, srn = native.read_wav_mono(p2)
    yp, srp = read_audio(p2)
    if yp.ndim > 1:
        yp = yp.mean(axis=-1)
    assert srn == srp == 44100
    np.testing.assert_allclose(yn, yp, atol=1e-6)


def test_native_resample_parity(rng):
    x = rng.normal(size=20000).astype(np.float32)
    a = native.resample_native(x, 44100, 24000)
    b = resample_np(x, 44100, 24000)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_loader_deterministic_across_threads(wav_dir):
    paths, p2 = wav_dir
    files = paths + [p2]
    batches = []
    for n_threads in (1, 3):
        ldr = native.NativeDataLoader(files, batch_size=2, num_samples=72000,
                                      train=True, num_threads=n_threads, seed=7)
        batches.append([ldr.next_batch() for _ in range(4)])
        assert ldr.errors == 0
        ldr.close()
    for a, b in zip(*batches):
        np.testing.assert_array_equal(a, b)


def test_loader_eval_semantics(wav_dir):
    """Eval mode: fixed -3 dB peak norm + head crop (ref: dataset.py:70,81-83)."""
    paths, _ = wav_dir
    ldr = native.NativeDataLoader(paths[:1], batch_size=1, num_samples=24000,
                                  train=False, num_threads=2)
    got = ldr.next_batch()[0]
    ldr.close()
    y, _ = read_audio(paths[0])
    exp = y / np.abs(y).max() * 10 ** (-3 / 20)
    np.testing.assert_allclose(got, exp[:24000], atol=1e-6)


def test_loader_repeat_pad(wav_dir, tmp_path):
    short = str(tmp_path / "short.wav")
    y = (np.sin(np.arange(1000) / 50.0) * 0.5).astype(np.float32)
    wavfile.write(short, 24000, (y * 32767).astype(np.int16))
    ldr = native.NativeDataLoader([short], batch_size=1, num_samples=2500,
                                  train=False, num_threads=1)
    got = ldr.next_batch()[0]
    ldr.close()
    # repeat-pad tiles the normalized signal
    np.testing.assert_allclose(got[:1000], got[1000:2000], atol=1e-7)
    np.testing.assert_allclose(got[:500], got[2000:2500], atol=1e-7)


def test_loader_bad_file_skips(tmp_path, wav_dir):
    paths, _ = wav_dir
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav file at all")
    ldr = native.NativeDataLoader([bad] + paths[:1], batch_size=2,
                                  num_samples=1000, train=False,
                                  num_threads=1, shuffle=False)
    batch = ldr.next_batch()
    # prefetching may have decoded the bad file once per buffered epoch
    assert ldr.errors >= 1
    # bad file yields silence, good file yields audio
    assert np.abs(batch).max() > 0
    ldr.close()


def test_native_loader_start_seq_resumes_stream(wav_dir):
    """start_seq fast-forwards the deterministic stream to global batch N
    without decoding: the resumed stream must equal the consumed one
    (exact mid-run resume positioning, across an epoch boundary)."""
    paths, _ = wav_dir
    kw = dict(sample_rate=24000, num_samples=24000, batch_size=2,
              train=True, num_threads=2, seed=7, drop_last=False)
    ldr = native.NativeDataLoader(paths, **kw)
    batches = [ldr.next_batch() for _ in range(6)]   # 5 files -> 3 b/epoch
    ldr.close()
    ldr2 = native.NativeDataLoader(paths, **kw, start_seq=4)
    np.testing.assert_array_equal(ldr2.next_batch(), batches[4])
    np.testing.assert_array_equal(ldr2.next_batch(), batches[5])
    ldr2.close()


def test_native_loader_tail_batch_repeat_pads(wav_dir):
    """drop_last=False: 5 files at batch 2 -> the 3rd batch holds one real
    item repeat-padded into both rows (no silent zero row — VERDICT r2
    Next #9 applied to the native path)."""
    paths, _ = wav_dir
    ldr = native.NativeDataLoader(paths, sample_rate=24000,
                                  num_samples=24000, batch_size=2,
                                  train=True, num_threads=2, seed=3,
                                  drop_last=False)
    b3 = [ldr.next_batch() for _ in range(3)][2]
    ldr.close()
    np.testing.assert_array_equal(b3[0], b3[1])
    assert np.abs(b3[0]).max() > 0
