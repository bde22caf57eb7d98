"""Space-to-depth folded convolution: value parity with the plain path.

The folded encoder (ops/fold.py + models/seanet.py::apply_seanet_folded) is
a pure relayout of the same arithmetic — the bit-exact-codes invariant
(CLAUDE.md) tolerates only fp-summation-order noise (~1e-7 absolute on the
embedding), never code flips.  These tests pin:

* fold_conv_kernel against a brute-force original conv on random shapes,
* folded_sconv1d == sconv1d across the kernel/stride/dilation grid the
  encoder uses (incl. reflect padding edges),
* full-encoder folded-vs-plain parity (tight embedding tolerance + EXACT
  code equality) for all three golden configs,
* the fallback path (non-divisible lengths) stays correct.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wavtokenizer_tpu.models.quantize import vq_infer
from wavtokenizer_tpu.models.seanet import seanet_encode
from wavtokenizer_tpu.ops.conv import sconv1d
from wavtokenizer_tpu.ops.fold import (fold_conv_kernel, folded_sconv1d,
                                       refold, target_fold)


@pytest.mark.parametrize("k,stride,dilation,F_out", [
    (7, 1, 1, 4),    # init conv
    (3, 1, 1, 4),    # resblock conv @ F=4
    (1, 1, 1, 4),    # resblock 1x1 / shortcut
    (4, 2, 2, 2),    # down1 geometry (+dilation for generality)
    (8, 4, 1, 1),    # down2: stride folded away entirely
    (10, 5, 1, 1),   # small600 down
    (16, 8, 1, 1),
])
def test_folded_sconv1d_matches_plain(k, stride, dilation, F_out):
    rng = np.random.default_rng(3)
    Cin, Cout = 4, 6
    F_in = F_out * stride
    T = 80 * F_in
    x = jnp.asarray(rng.normal(size=(2, T, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, Cin, Cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))

    ref = sconv1d(x, w, b, stride=stride, dilation=dilation)
    xf = x.reshape(2, T // F_in, F_in * Cin)
    got = folded_sconv1d(xf, F_in, F_out, w, b, stride=stride,
                         dilation=dilation)
    N = ref.shape[1]
    assert N % F_out == 0
    got_unfolded = got.reshape(2, N, Cout)
    np.testing.assert_allclose(np.asarray(got_unfolded), np.asarray(ref),
                               rtol=0, atol=2e-6)


def test_fold_kernel_brute_force():
    """W'[b, p*Cin+ci, q*Cout+co] == w[i] exactly where b*F_in+p == q*s+i*d."""
    rng = np.random.default_rng(0)
    k, Cin, Cout, F_out, s, d = 5, 3, 2, 3, 2, 2
    F_in = F_out * s
    w = jnp.asarray(rng.normal(size=(k, Cin, Cout)).astype(np.float32))
    W = np.asarray(fold_conv_kernel(w, F_in, F_out, stride=s, dilation=d))
    wn = np.asarray(w)
    dense = np.zeros_like(W)
    for q in range(F_out):
        for i in range(k):
            a = q * s + i * d
            dense[a // F_in, (a % F_in) * Cin:(a % F_in + 1) * Cin,
                  q * Cout:(q + 1) * Cout] = wn[i]
    np.testing.assert_array_equal(W, dense)
    # Everything not placed is exactly zero.
    assert np.count_nonzero(W) <= k * F_out * Cin * Cout


def test_refold_is_value_preserving():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 24, 3)).astype(np.float32))
    xf4 = refold(x.reshape(2, 24, 3), 1, 4)
    back = refold(xf4, 4, 1)
    np.testing.assert_array_equal(np.asarray(back.reshape(2, 24, 3)),
                                  np.asarray(x))


def test_target_fold():
    assert target_fold(32, 72000) == 4
    assert target_fold(64, 36000) == 2
    assert target_fold(128, 9000) == 1
    assert target_fold(512, 225) == 1
    assert target_fold(32, 7)  == 1  # nothing divides


@pytest.mark.parametrize("config", ["small320", "small600", "music16k"])
def test_encoder_folded_parity_and_codes(config):
    from wavtokenizer_tpu.utils.golden import golden_specs
    from wavtokenizer_tpu.models.init import init_wavtokenizer

    spec = golden_specs()[config]
    params = init_wavtokenizer(spec, random_codebook=True)
    rng = np.random.default_rng(0)
    T = int(spec.sample_rate * 0.6)
    audio = jnp.asarray(
        rng.normal(size=(2, T)).astype(np.float32) * 0.1)[:, :, None]

    e_plain = np.asarray(seanet_encode(params["encoder"], spec.seanet, audio,
                                       fold=False))
    e_fold = np.asarray(seanet_encode(params["encoder"], spec.seanet, audio,
                                      fold=True))
    assert e_plain.shape == e_fold.shape
    np.testing.assert_allclose(e_fold, e_plain, rtol=0, atol=1e-5)

    _, c_plain, _ = vq_infer(params["quantizer"], spec.vq, jnp.asarray(e_plain))
    _, c_fold, _ = vq_infer(params["quantizer"], spec.vq, jnp.asarray(e_fold))
    np.testing.assert_array_equal(np.asarray(c_plain), np.asarray(c_fold))


def test_encoder_fold_fallback_non_divisible():
    """A length the fold cannot serve falls back to the plain path (and
    still agrees with it)."""
    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.models.init import init_wavtokenizer

    spec = WavTokenizerSpec()
    params = init_wavtokenizer(spec, random_codebook=True)
    rng = np.random.default_rng(2)
    audio = jnp.asarray(
        rng.normal(size=(1, 24001)).astype(np.float32) * 0.1)[:, :, None]
    e_plain = np.asarray(seanet_encode(params["encoder"], spec.seanet, audio,
                                       fold=False))
    e_fold = np.asarray(seanet_encode(params["encoder"], spec.seanet, audio,
                                      fold=True))
    np.testing.assert_allclose(e_fold, e_plain, rtol=0, atol=1e-5)
