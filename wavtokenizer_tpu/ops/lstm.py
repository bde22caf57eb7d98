"""Multi-layer LSTM as a ``lax.scan`` over time.

TPU-native replacement for the reference SLSTM (encoder/modules/lstm.py:12-39,
a 2-layer nn.LSTM with residual skip).  Design:

* The input projection ``x @ W_ih^T + b`` for the whole sequence is hoisted
  out of the recurrence as ONE big matmul per layer (maps onto the MXU),
  so the scan body only does the (H, 4H) recurrent matmul + gate math.
* Gate order matches torch (i, f, g, o) so converted checkpoints are
  drop-in.
* The scan carries (h, c) per layer; layers are unrolled in Python (static,
  always 2 for WavTokenizer configs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm_layer(x: jnp.ndarray, w_ih: jnp.ndarray, w_hh: jnp.ndarray,
               b_ih: jnp.ndarray, b_hh: jnp.ndarray,
               precision=None) -> jnp.ndarray:
    """Single unidirectional LSTM layer.

    x: (B, T, Cin); w_ih: (4H, Cin); w_hh: (4H, H); biases: (4H,).
    Returns (B, T, H).
    """
    B = x.shape[0]
    H = w_hh.shape[1]
    # Hoisted input projection: one MXU matmul for all timesteps.
    xw = jnp.einsum("btc,gc->btg", x, w_ih, precision=precision) + (b_ih + b_hh)
    xw = jnp.swapaxes(xw, 0, 1)  # (T, B, 4H) time-major for scan

    w_hh_t = w_hh.T  # (H, 4H)

    def step(carry, xt):
        h, c = carry
        z = xt + jnp.dot(h, w_hh_t, precision=precision)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, H), dtype=x.dtype)
    c0 = jnp.zeros((B, H), dtype=x.dtype)
    _, ys = jax.lax.scan(step, (h0, c0), xw)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


def slstm(x: jnp.ndarray, layers: list[dict], skip: bool = True,
          precision=None) -> jnp.ndarray:
    """Stacked LSTM with residual skip, channel-last (B, T, C).

    ``layers`` is a list of dicts with keys w_ih / w_hh / b_ih / b_hh.
    Mirrors reference SLSTM.forward (encoder/modules/lstm.py:31-39):
    y = LSTM(x); y = y + x when skip.
    """
    y = x
    for p in layers:
        y = lstm_layer(y, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"],
                       precision=precision)
    if skip:
        y = y + x
    return y
