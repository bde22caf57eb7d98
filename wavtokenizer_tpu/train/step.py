"""The two-optimizer GAN training step as a pure jit-able function.

Behavioral contract: decoder/experiment.py:86-218 + 338-462 —
AdamW x2 (disc: MPD+MRD+DAC; gen: encoder+backbone+head), cosine LR with
warmup over max_steps//2, per-batch order = disc update THEN gen update
(the generator therefore sees the freshly-updated discriminators, matching
Lightning's multi-optimizer loop), random bandwidth_id per step, VQ EMA
state advancing in BOTH forwards (the torch module updates its buffers in
the disc-phase no_grad forward too).

Faithfulness notes:
* Only {encoder, backbone, head} are optimized: the SEANet decoder and the
  VQ codebooks are buffers/no-grad params in the reference optimizer and
  receive no AdamW updates (experiment.py:92-96; torch skips grad-less
  params, so they also escape weight decay).
* Weight-normed convs train in (v, g) parametrization (train.wnorm).
* The mel coefficient (optionally cosine-decayed, experiment.py:324-335)
  is passed in as a scalar so decay happens host-side without recompiles.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models.seanet import encoder_layer_specs, seanet_encode
from ..models.vocos import istft_head, vocos_backbone
from ..models.wavtokenizer import WavTokenizerSpec
from ..models.init import init_wavtokenizer
from .discriminators import _cast_floats, init_discriminators
from .losses import (dac_disc_loss_fused, dac_gen_loss_fused, mel_loss,
                     vocos_disc_loss_fused, vocos_gen_loss_fused)
from .vq_train import vq_train_forward
from .wnorm import fold_tree, seanet_to_weight_norm


@dataclass(frozen=True)
class TrainConfig:
    """Mirror of the experiment hyperparameters (ref: experiment.py:24-42
    and configs/*.yaml model.init_args)."""
    sample_rate: int = 24000
    initial_learning_rate: float = 2e-4
    num_warmup_steps: int = 0
    mel_loss_coeff: float = 45.0
    mrd_loss_coeff: float = 1.0
    pretrain_mel_steps: int = 0
    decay_mel_coeff: bool = False
    max_steps: int = 2_000_000
    num_bandwidths: int = 4
    weight_decay: float = 0.01  # torch AdamW default
    # Rematerialize generator + discriminator blocks in the backward pass
    # (jax.checkpoint).  Costs ~1/3 extra forward FLOPs; with lane-packed
    # checkpoint boundaries (seanet.py) and per-scalar discriminator-loss
    # checkpoints (losses.py) the reference's batch 40 x 3 s step measures
    # 13.19 GiB peak on-chip (~20.6 GiB raw without remat) — the full
    # reference batch fits a 16 GB v5e; see tools_tpu/mem_probe.py.
    remat: bool = True
    # Selective remat (VERDICT r2 Next #5): skip rematerializing the
    # encoder stack — its lane-packed narrow activations are cheap to
    # store — while keeping the wide backbone + discriminator remat.
    # Spends part of the batch-40 headroom to recover forward FLOPs;
    # see CLAUDE.md "Training memory" for the measured numbers.
    remat_encoder: bool = True
    # Selective remat, discriminator side (r5 train attribution,
    # tools_tpu/train_profile.py): ~95% of the f32 step is discriminator
    # work (disc_phase 946 ms + gen-phase disc terms ~1220 ms vs 41 ms for
    # the whole mel+commit generator fwd+bwd at batch 40), and the
    # per-scalar disc remat recomputes every sub-discriminator forward in
    # BOTH backwards.  False stores the disc activations instead (the
    # generator remat is untouched) — spends HBM headroom to skip the
    # recompute.  "store_dac" was meant as a middle point (store only the
    # DAC family — the most expensive in the attribution — remat MPD/MRD)
    # but is a MEASURED DEAD END at the reference batch: mem_probe r5 shows
    # it needs 16.04 GiB at batch 40 (OOM by 296 MiB) vs 15.32 GiB for
    # storing ALL disc activations — the rematted MPD/MRD backwards
    # recompute their forwards while the stored DAC activations are still
    # live, so the mix double-buffers where store-all does not.  Kept as an
    # option for smaller batches; prefer False when HBM allows.
    # Default True = the memory-safe production graph; see CLAUDE.md
    # "Training memory" for the measured peak/speed trades.
    remat_disc: bool | str = True
    # Training-time dropout inside the backbone pos-net resblocks
    # (the reference trains with 0.1, decoder/models.py:200).
    pos_dropout: float = 0.1
    # Validation-time objective evaluators (ref: configs/*.yaml
    # model.init_args `evaluate_utmos/evaluate_pesq/evaluate_periodicty`;
    # experiment.py:227-258).  The val_loss formula keeps its shape either
    # way: a disabled or unavailable evaluator contributes score 0, so its
    # (5 - score) term stays the constant 5 exactly like the reference.
    evaluate_utmos: bool = True
    evaluate_pesq: bool = True
    evaluate_periodicity: bool = True
    # Discriminator hidden-width multiplier.  1.0 = the reference's widths
    # (always, for real training).  Structural dry runs shrink it (~1/16)
    # so the full GAN-step graph cold-compiles within the driver's budget
    # while every family/period/resolution/band stays present.
    disc_channels_scale: float = 1.0
    # Mixed-precision training: run the discriminator conv stacks (≈80% of
    # the GAN step's FLOPs) in this dtype.  f32 matmuls run at HALF the
    # bf16 MXU rate on TPU, so "bfloat16" roughly doubles the
    # discriminator throughput; master params, weight-norm folds, loss
    # reductions, optimizer updates, and the whole generator (incl. the
    # bit-exact encoder/VQ path) stay f32.  The reference trains f32
    # (Lightning default), so "float32" is the parity default.
    disc_compute_dtype: str = "float32"
    # Mixed-precision generator DECODE side: run the Vocos backbone + ISTFT
    # head compute in this dtype during training.  The encoder + VQ path is
    # NEVER cast (the bit-exact-codes invariant binds the encode path, and
    # training parity argues for f32 there too); master params, the loss
    # reductions, optimizer updates, and gradients stay f32 — the cast sits
    # inside the loss, so grads come back f32 through its transpose.
    # "float32" is the parity default (the reference trains full precision).
    gen_compute_dtype: str = "float32"


def cosine_schedule_with_warmup(base_lr: float, num_warmup_steps: int,
                                num_training_steps: int):
    """transformers.get_cosine_schedule_with_warmup (ref: experiment.py:102-107)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return base_lr * jnp.where(step < num_warmup_steps, warm, cos)
    return schedule


def make_optimizers(tcfg: TrainConfig):
    sched = cosine_schedule_with_warmup(tcfg.initial_learning_rate,
                                        tcfg.num_warmup_steps,
                                        tcfg.max_steps // 2)
    opt = partial(optax.adamw, b1=0.9, b2=0.999, eps=1e-8,
                  weight_decay=tcfg.weight_decay)
    return opt(sched), opt(sched)


def create_train_state(spec: WavTokenizerSpec, tcfg: TrainConfig,
                       seed: int = 0) -> dict:
    """Fresh training state: generator (weight-normed), discriminators,
    VQ state, optimizer states, step counter."""
    params = init_wavtokenizer(spec, seed=seed)
    enc_specs = encoder_layer_specs(spec.seanet)
    gen = {
        "encoder": seanet_to_weight_norm(params["encoder"], enc_specs),
        "backbone": params["backbone"],
        "head": params["head"],
    }
    disc = init_discriminators(seed=seed + 1,
                               num_embeddings=tcfg.num_bandwidths,
                               channels_scale=tcfg.disc_channels_scale)
    vq = params["quantizer"]
    opt_disc, opt_gen = make_optimizers(tcfg)
    state = {
        "gen": gen,
        "disc": disc,
        "vq": vq,
        "decoder": params["decoder"],   # carried, not optimized
        "opt_gen": opt_gen.init(gen),
        "opt_disc": opt_disc.init(disc),
        "step": jnp.zeros((), jnp.int32),
    }
    return jax.tree.map(jnp.asarray, state)


def generator_forward(gen: dict, vq: dict, spec: WavTokenizerSpec,
                      audio: jnp.ndarray, bandwidth_id, key, n_q: int,
                      remat: bool = False, dropout_rng=None,
                      dropout_rate: float = 0.0,
                      remat_encoder: bool | None = None,
                      compute_dtype=None):
    """Training forward: encoder -> VQ(train) -> backbone -> head
    (ref: experiment.py:114-119 via feature_extractors.py:105-119).

    ``remat`` checkpoints every encoder/backbone block so the GAN backward
    recomputes activations instead of holding them; checkpointed encoder
    activations cross block boundaries lane-packed ((B,T,C)->(B,T/k,kC),
    seanet.py) so the batch-40 x 3 s step fits a 16 GB v5e at 13.19 GiB
    peak (~20.6 GiB raw without remat — see TrainConfig and mem_probe.py).
    ``dropout_rng`` enables the reference's pos-net Dropout(0.1) during
    training (decoder/models.py:200); validation passes None."""
    enc = fold_tree(gen["encoder"])
    remat_enc = remat if remat_encoder is None else (remat and remat_encoder)
    # conv_precision=None: training encode runs DEFAULT precision — the GAN
    # step's encode feeds losses, not the token contract (the inference
    # encode path pins its convs to Precision.HIGH, with only the VQ
    # distance at HIGHEST; see seanet.py _encode_precision), and None keeps
    # the train-step HLO / warm compile caches unchanged.
    emb = seanet_encode(enc, spec.seanet, audio[:, :, None], remat=remat_enc,
                        conv_precision=None)
    quantized, codes, commit, new_vq = vq_train_forward(vq, spec.vq, emb, key,
                                                        n_q=n_q)
    # Optional mixed-precision decode side (TrainConfig.gen_compute_dtype):
    # backbone + head compute in bf16, everything upstream (encoder, VQ,
    # commit loss) and the returned waveform stay f32.
    backbone_p, head_p, q_in = gen["backbone"], gen["head"], quantized
    if compute_dtype is not None:
        backbone_p = _cast_floats(backbone_p, compute_dtype)
        head_p = _cast_floats(head_p, compute_dtype)
        q_in = quantized.astype(compute_dtype)
    h = vocos_backbone(backbone_p, spec.backbone, q_in, fused=False,
                       bandwidth_id=bandwidth_id, remat=remat,
                       dropout_rng=dropout_rng, dropout_rate=dropout_rate)
    audio_hat = istft_head(head_p, spec.head, h)
    if compute_dtype is not None:
        audio_hat = audio_hat.astype(jnp.float32)
    return audio_hat, commit, new_vq


def _disc_remat_mode(remat, remat_disc):
    """Resolve TrainConfig.remat_disc (True | False | "store_dac") against
    the global remat flag into the tri-state the fused disc losses consume:
    False = store every family, True = remat every family, "store_dac" =
    store the DAC family's activations but keep the MPD/MRD remat."""
    if not remat or remat_disc is False:
        return False
    return "store_dac" if remat_disc == "store_dac" else True


def _disc_loss_fn(disc, audio_hat, audio, bandwidth_id, mrd_coeff,
                  remat=False, compute_dtype=None):
    """ref: experiment.py:125-148.

    ``remat`` checkpoints each sub-discriminator's forward TOGETHER WITH its
    scalar loss terms (losses.*_fused) so only scalars cross checkpoint
    boundaries — the memory-correct granularity; see losses.py docstring.
    It is the _disc_remat_mode tri-state: "store_dac" remats only MPD/MRD."""
    loss_dac = dac_disc_loss_fused(disc, audio_hat, audio,
                                   remat=remat is True,
                                   compute_dtype=compute_dtype)
    loss_mp = vocos_disc_loss_fused(disc["mpd"], "mpd", audio, audio_hat,
                                    bandwidth_id, remat=bool(remat),
                                    compute_dtype=compute_dtype)
    loss_mrd = vocos_disc_loss_fused(disc["mrd"], "mrd", audio, audio_hat,
                                     bandwidth_id, remat=bool(remat),
                                     compute_dtype=compute_dtype)
    loss = loss_mp + mrd_coeff * loss_mrd + loss_dac
    return loss, {"disc_total": loss, "disc_mp": loss_mp, "disc_mrd": loss_mrd,
                  "disc_dac": loss_dac}


def _gen_loss_fn(gen, disc, vq, spec, audio, bandwidth_id, key, n_q,
                 mel_coeff, mrd_coeff, train_discriminator, remat=False,
                 dropout_rng=None, dropout_rate=0.0, remat_encoder=None,
                 compute_dtype=None, gen_compute_dtype=None,
                 remat_disc=None):
    """ref: experiment.py:151-218."""
    disc_remat = (remat if remat_disc is None
                  else _disc_remat_mode(remat, remat_disc))
    audio_hat, commit_loss, new_vq = generator_forward(
        gen, vq, spec, audio, bandwidth_id, key, n_q, remat=remat,
        dropout_rng=dropout_rng, dropout_rate=dropout_rate,
        remat_encoder=remat_encoder, compute_dtype=gen_compute_dtype)
    l_mel = mel_loss(audio_hat, audio, spec.sample_rate)
    metrics = {"mel_loss": l_mel, "commit_loss": commit_loss}
    loss = mel_coeff * l_mel + 1000.0 * commit_loss
    if train_discriminator:
        dac_g, dac_feat = dac_gen_loss_fused(disc, audio_hat, audio,
                                             remat=disc_remat is True,
                                             compute_dtype=compute_dtype)
        loss_gen_mp, loss_fm_mp = vocos_gen_loss_fused(
            disc["mpd"], "mpd", audio, audio_hat, bandwidth_id,
            remat=bool(disc_remat), compute_dtype=compute_dtype)
        loss_gen_mrd, loss_fm_mrd = vocos_gen_loss_fused(
            disc["mrd"], "mrd", audio, audio_hat, bandwidth_id,
            remat=bool(disc_remat), compute_dtype=compute_dtype)
        loss = (loss + loss_gen_mp + mrd_coeff * loss_gen_mrd + loss_fm_mp
                + mrd_coeff * loss_fm_mrd + dac_g + dac_feat)
        metrics.update({"gen_mp": loss_gen_mp, "gen_mrd": loss_gen_mrd,
                        "fm_mp": loss_fm_mp, "fm_mrd": loss_fm_mrd,
                        "dac_gen": dac_g, "dac_feat": dac_feat})
    metrics["gen_total"] = loss
    return loss, (metrics, new_vq, audio_hat)


@partial(jax.jit, static_argnames=("spec", "tcfg", "train_discriminator", "n_q",
                                   "with_grad_norm"),
         donate_argnames=("state",))
def train_step(state: dict, audio: jnp.ndarray, key, spec: WavTokenizerSpec,
               tcfg: TrainConfig, mel_coeff: float | jnp.ndarray = 45.0,
               train_discriminator: bool = True, n_q: int = 1,
               with_grad_norm: bool = False):
    """One full batch = disc update then gen update (Lightning order).

    audio: (B, T) 24 kHz crops.  Returns (new_state, metrics dict).
    """
    opt_disc_tx, opt_gen_tx = make_optimizers(tcfg)
    k_bw, k_vq1, k_vq2, k_drop1, k_drop2 = jax.random.split(key, 5)
    bandwidth_id = jax.random.randint(k_bw, (), 0, tcfg.num_bandwidths)
    disc_dtype = (None if tcfg.disc_compute_dtype == "float32"
                  else jnp.dtype(tcfg.disc_compute_dtype))
    gen_dtype = (None if tcfg.gen_compute_dtype == "float32"
                 else jnp.dtype(tcfg.gen_compute_dtype))

    metrics = {}
    disc = state["disc"]
    vq = state["vq"]

    if train_discriminator:
        # --- discriminator phase (no grads through the generator) --------
        audio_hat_d, _, vq = generator_forward(
            state["gen"], vq, spec, audio, bandwidth_id, k_vq1, n_q,
            remat=tcfg.remat,  # dense packed layer boundaries (no grads here)
            dropout_rng=k_drop1, dropout_rate=tcfg.pos_dropout,
            remat_encoder=tcfg.remat_encoder, compute_dtype=gen_dtype)
        audio_hat_d = jax.lax.stop_gradient(audio_hat_d)
        vq = jax.lax.stop_gradient(vq)

        (_, d_metrics), d_grads = jax.value_and_grad(
            _disc_loss_fn, has_aux=True)(disc, audio_hat_d, audio,
                                         bandwidth_id, tcfg.mrd_loss_coeff,
                                         _disc_remat_mode(tcfg.remat,
                                                          tcfg.remat_disc),
                                         disc_dtype)
        d_updates, new_opt_disc = opt_disc_tx.update(d_grads,
                                                     state["opt_disc"], disc)
        disc = optax.apply_updates(disc, d_updates)
        metrics.update(d_metrics)
        # Scheduling barrier: the generator-phase encoder forward has no
        # data dependency on the discriminators, so XLA's latency-hiding
        # scheduler hoists it INTO the disc backward — measured ~3.4 GiB of
        # encoder conv buffers live on top of the disc-phase recompute peak
        # at batch 40.  Making the gen-phase audio depend on the updated
        # disc serializes the phases (we're HBM-bound here, not
        # latency-bound).
        audio, disc = jax.lax.optimization_barrier((audio, disc))
    else:
        new_opt_disc = state["opt_disc"]

    # --- generator phase --------------------------------------------------
    (_, (g_metrics, new_vq, _)), g_grads = jax.value_and_grad(
        _gen_loss_fn, has_aux=True)(state["gen"], disc, vq, spec, audio,
                                    bandwidth_id, k_vq2, n_q, mel_coeff,
                                    tcfg.mrd_loss_coeff, train_discriminator,
                                    tcfg.remat, k_drop2, tcfg.pos_dropout,
                                    tcfg.remat_encoder, disc_dtype, gen_dtype,
                                    tcfg.remat_disc)
    g_updates, new_opt_gen = opt_gen_tx.update(g_grads, state["opt_gen"],
                                               state["gen"])
    gen = optax.apply_updates(state["gen"], g_updates)
    metrics.update(g_metrics)
    if with_grad_norm:
        # Global generator grad norm (GradNormCallback parity,
        # helpers.py:49-55).  Static opt-in: the extra cross-shard norm
        # reduction deadlocks XLA:CPU's in-process collectives on the
        # virtual mesh, so the multichip dryrun leaves it off; the trainer
        # enables it on logging steps.
        metrics["grad_norm"] = optax.global_norm(g_grads)

    new_state = {
        "gen": gen,
        "disc": disc,
        "vq": jax.lax.stop_gradient(new_vq),
        "decoder": state["decoder"],
        "opt_gen": new_opt_gen,
        "opt_disc": new_opt_disc,
        "step": state["step"] + 1,
    }
    return new_state, metrics


def mel_coeff_decay(tcfg: TrainConfig, step: int, num_cycles: float = 0.5) -> float:
    """Host-side mel-coefficient cosine decay (ref: experiment.py:324-335)."""
    if not tcfg.decay_mel_coeff:
        return tcfg.mel_loss_coeff
    max_steps = tcfg.max_steps // 2
    if step < tcfg.num_warmup_steps:
        return tcfg.mel_loss_coeff
    progress = float(step - tcfg.num_warmup_steps) / float(
        max(1, max_steps - tcfg.num_warmup_steps))
    return tcfg.mel_loss_coeff * max(
        0.0, 0.5 * (1.0 + math.cos(math.pi * num_cycles * 2.0 * progress)))


def state_to_inference_params(state: dict, spec: WavTokenizerSpec) -> dict:
    """Fold weight norm and assemble the inference param pytree."""
    return {
        "encoder": fold_tree(state["gen"]["encoder"]),
        "decoder": state["decoder"],
        "quantizer": state["vq"],
        "backbone": state["gen"]["backbone"],
        "head": state["gen"]["head"],
    }
