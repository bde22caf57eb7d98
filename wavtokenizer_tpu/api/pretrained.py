"""Public inference API: the ``WavTokenizer`` facade.

Preserves the reference surface users script against
(ref: decoder/pretrained.py:32-239 and README usage):

    wt = WavTokenizer.from_pretrained0802(config_path, model_path)
    features, codes = wt.encode_infer(audio, bandwidth_id=bw_id)
    audio_hat = wt.decode(features, bandwidth_id=bw_id)
    features = wt.codes_to_features(codes)

Inputs/outputs accept/return jax arrays (numpy works too).  Every entry
point is jit-compiled and cached per input shape; weight-norm is folded at
load time so inference is pure fused conv/matmul work.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.convert import (average_state_dicts,
                                  convert_wavtokenizer_state_dict,
                                  load_torch_state_dict)
from ..models import wavtokenizer as wt
from ..models.wavtokenizer import WavTokenizerSpec
from .config import spec_from_config


class WavTokenizer:
    """Inference facade around (params pytree, WavTokenizerSpec)."""

    def __init__(self, params: dict, spec: WavTokenizerSpec):
        self.params = jax.device_put(params)
        self.spec = spec
        self._jit_cache: dict = {}

    # ---------------------------------------------------------- loading

    @classmethod
    def from_pretrained0802(cls, config_path: str, model_path: str) -> "WavTokenizer":
        """Load a reference Lightning checkpoint + YAML config unchanged
        (ref: decoder/pretrained.py:95-114)."""
        spec = spec_from_config(config_path)
        sd = load_torch_state_dict(model_path)
        params = convert_wavtokenizer_state_dict(sd, spec.seanet, spec.vq.n_q,
                                                 spec.backbone)
        return cls(params, spec)

    @classmethod
    def from_state_dict(cls, state_dict: dict, spec: WavTokenizerSpec) -> "WavTokenizer":
        """Build from an in-memory torch-style state_dict ({key: ndarray})."""
        params = convert_wavtokenizer_state_dict(state_dict, spec.seanet,
                                                 spec.vq.n_q, spec.backbone)
        return cls(params, spec)

    @classmethod
    def from_train_checkpoint(cls, config_path: str, ckpt_dir: str) -> "WavTokenizer":
        """Load one of OUR orbax training checkpoints (Trainer output dirs:
        last/, wavtokenizer_checkpoint_step=...) for inference: weight norm
        folded, VQ/backbone/head assembled into the inference pytree."""
        from ..train.step import (TrainConfig, create_train_state,
                                  state_to_inference_params)
        from ..train.trainer import load_checkpoint
        spec = spec_from_config(config_path)
        template = create_train_state(spec, TrainConfig(
            num_bandwidths=len(spec.bandwidths)), seed=0)
        state = load_checkpoint(ckpt_dir, jax.device_get(template))
        return cls(state_to_inference_params(state, spec), spec)

    @classmethod
    def from_pretrained0828(cls, config_path: str, model_path: str) -> "WavTokenizer":
        """0828 variant: like 0802 but the checkpoint also carries the
        MPD/MRD discriminators (ref: decoder/pretrained_model.py:52-86);
        they are converted into ``self.discriminators`` for training use."""
        from ..checkpoint.convert import (DISCRIMINATOR_PREFIXES,
                                          INFERENCE_PREFIXES,
                                          discriminator_params)
        spec = spec_from_config(config_path)
        sd = load_torch_state_dict(
            model_path, prefixes=INFERENCE_PREFIXES + DISCRIMINATOR_PREFIXES)
        params = convert_wavtokenizer_state_dict(sd, spec.seanet, spec.vq.n_q,
                                                 spec.backbone)
        model = cls(params, spec)
        model.discriminators = discriminator_params(sd)
        return model

    @classmethod
    def from_pretrained0911(cls, config_path: str, model_folder_path: str) -> "WavTokenizer":
        """Average the 3 best checkpoints by val_loss parsed from the
        filename (ref: decoder/pretrained.py:117-156).

        Mirrors the reference's selection quirks deliberately: val_loss is
        the raw filename substring [-11:-5] STRING-sorted (so '10.234'
        sorts before '4.567'), and membership is by substring equality (a
        duplicated loss string admits >3 files) — the released checkpoints
        all have same-width sub-10 losses, where this matches numeric
        intent."""
        spec = spec_from_config(config_path)
        names = [n for n in os.listdir(model_folder_path) if n.startswith("vocos_")]
        val_loss = sorted(n[-11:-5] for n in names)[:3]
        sds = [load_torch_state_dict(os.path.join(model_folder_path, n))
               for n in names if n[-11:-5] in val_loss]
        sd = average_state_dicts(sds)
        params = convert_wavtokenizer_state_dict(sd, spec.seanet, spec.vq.n_q,
                                                 spec.backbone)
        return cls(params, spec)

    # ---------------------------------------------------------- jit plumbing

    def _jitted(self, name: str, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(partial(fn, spec=self.spec))
        return self._jit_cache[name]

    # ---------------------------------------------------------- API surface

    def encode_infer(self, audio_input, bandwidth_id=None):
        """(B, T) audio -> (features (B, D, T'), codes (1, B, T')).
        1-D input is treated as a batch of one (outputs stay batched,
        matching the reference's batched return shapes)."""
        audio = jnp.asarray(audio_input)
        if audio.ndim == 1:
            audio = audio[None]
        fn = self._jitted("encode_infer",
                          lambda params, audio, spec: wt.encode_infer(params, spec, audio))
        features, codes = fn(self.params, audio)
        return features, codes

    def encode(self, audio_input, bandwidth_id=None, n_q: int | None = None):
        """Training-style encode (ref: pretrained.py:179-182)."""
        audio = jnp.asarray(audio_input)
        if audio.ndim == 1:
            audio = audio[None]
        fn = self._jitted(f"encode_forward_{n_q}",
                          lambda params, audio, spec: wt.encode_forward(
                              params, spec, audio, n_q=n_q))
        return fn(self.params, audio)

    def decode(self, features_input, bandwidth_id):
        """(B, D, T') features -> (B, L) waveform."""
        features = jnp.asarray(features_input)
        bw = jnp.asarray(bandwidth_id).reshape(())
        fn = self._jitted("decode",
                          lambda params, features, bw, spec: wt.decode(
                              params, spec, features, bw))
        return fn(self.params, features, bw)

    def codes_to_features(self, codes):
        codes = jnp.asarray(codes)
        fn = self._jitted("codes_to_features",
                          lambda params, codes, spec: wt.codes_to_features(params, codes))
        return fn(self.params, codes)

    def __call__(self, audio_input, bandwidth_id):
        """Copy synthesis (ref: pretrained.py:159-175)."""
        audio = jnp.asarray(audio_input)
        if audio.ndim == 1:
            audio = audio[None]
        bw = jnp.asarray(bandwidth_id).reshape(())
        fn = self._jitted("forward",
                          lambda params, audio, bw, spec: wt.forward(
                              params, spec, audio, bw))
        return fn(self.params, audio, bw)

    forward = __call__


class Vocos:
    """Plain-Vocos facade (mel features -> trunk -> head): the upstream
    Vocos mode the reference carries alongside WavTokenizer
    (MelSpectrogramFeatures + VocosBackbone/VocosResNetBackbone +
    ISTFT/IMDCT heads)."""

    def __init__(self, params: dict, spec):
        self.params = jax.device_put(params)
        self.spec = spec
        self._jit_cache: dict = {}

    @classmethod
    def from_hparams(cls, config_path: str) -> "Vocos":
        """Spec-only construction (random params elsewhere); mirrors the
        upstream from_hparams config parsing."""
        import yaml

        from .config import vocos_spec_from_config_dict
        with open(config_path) as f:
            spec = vocos_spec_from_config_dict(yaml.safe_load(f))
        return cls({}, spec)

    @classmethod
    def from_pretrained(cls, config_path: str, model_path: str) -> "Vocos":
        import yaml

        from ..checkpoint.convert import (convert_vocos_state_dict,
                                          load_torch_state_dict)
        from .config import vocos_spec_from_config_dict
        with open(config_path) as f:
            spec = vocos_spec_from_config_dict(yaml.safe_load(f))
        sd = load_torch_state_dict(model_path)
        return cls(convert_vocos_state_dict(sd, spec), spec)

    @classmethod
    def from_state_dict(cls, state_dict: dict, spec) -> "Vocos":
        from ..checkpoint.convert import convert_vocos_state_dict
        return cls(convert_vocos_state_dict(state_dict, spec), spec)

    def _jitted(self, name: str, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(partial(fn, spec=self.spec))
        return self._jit_cache[name]

    def feature_extractor(self, audio_input):
        from ..models import vocos_model as vm
        audio = jnp.atleast_2d(jnp.asarray(audio_input))
        fn = self._jitted("features",
                          lambda params, audio, spec: vm.vocos_features(
                              params, spec, audio))
        return fn(self.params, audio)

    def decode(self, features_input, bandwidth_id=None):
        from ..models import vocos_model as vm
        features = jnp.asarray(features_input)
        fn = self._jitted("decode",
                          lambda params, features, spec: vm.vocos_decode(
                              params, spec, features, bandwidth_id=None))
        return fn(self.params, features)

    def __call__(self, audio_input, bandwidth_id=None):
        from ..models import vocos_model as vm
        audio = jnp.atleast_2d(jnp.asarray(audio_input))
        fn = self._jitted("forward",
                          lambda params, audio, spec: vm.vocos_forward(
                              params, spec, audio))
        return fn(self.params, audio)

    forward = __call__
