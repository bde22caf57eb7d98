import time, numpy as np, jax, jax.numpy as jnp
from wavtokenizer_tpu import WavTokenizerSpec
from wavtokenizer_tpu.models.init import init_wavtokenizer
from wavtokenizer_tpu.models.seanet import encoder_layer_specs, apply_seanet

spec = WavTokenizerSpec()
params = jax.device_put(init_wavtokenizer(spec, random_codebook=True))
enc = params["encoder"]
specs = encoder_layer_specs(spec.seanet)
B = 128
rng = np.random.default_rng(0)
audio = jax.device_put(jnp.asarray(rng.normal(size=(B, 72000, 1)).astype(np.float32) * 0.1))

def bench(fn, *args, n=20):
    f = jax.jit(lambda *a: jnp.sum(fn(*a)))
    out = f(*args); np.asarray(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n): out = f(*args)
        np.asarray(out); ts.append((time.perf_counter()-t0)/n)
    return min(ts)

prev = 0.0
for upto in [1, 2, 4, 5, 7, 8, 10, 11, 13, 14, 16]:
    fn = lambda p, a, u=upto: apply_seanet(p[:u], specs[:u], a)
    t = bench(fn, enc, audio)
    print(f"layers[:{upto:2d}] (last={specs[upto-1].kind:8s}): {t*1e3:7.2f} ms  (+{(t-prev)*1e3:6.2f})")
    prev = t
