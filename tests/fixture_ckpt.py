"""Full-key-set Lightning checkpoint fixture generator (VERDICT r4 next #5).

Builds a `.ckpt` dict with the COMPLETE key population a real released
WavTokenizer Lightning checkpoint carries — the one input shape the
loaders exist for but had never seen (all prior tests constructed only
the filtered `backbone./head./feature_extractor.` subset):

* ``state_dict`` from the REAL reference modules registered under the
  exact Lightning attribute names (ref decoder/experiment.py:60-78,
  387-388): feature_extractor / backbone / head / multiperioddisc /
  multiresddisc / dac / dacdiscriminator (the DACGANLoss wrapper that
  re-registers the same DAC tensors under a second prefix — a real
  duplication the prefix filters must tolerate), plus the
  ``melspec_loss`` mel-spectrogram buffers (injected manually: the test
  torchaudio stub has no MelSpectrogram; shapes match torchaudio's
  ``spectrogram.window`` (n_fft,) and ``mel_scale.fb`` (n_fft//2+1,
  n_mels) for the reference's 1024/100 settings, decoder/loss.py:17-24).
* Lightning bookkeeping: epoch / global_step / pytorch-lightning_version
  / loops / callbacks / hparams, and BOTH AdamW ``optimizer_states``
  (disc opt over multiperioddisc+multiresddisc+dac, gen opt over
  feature_extractor+backbone+head — ref experiment.py:86-112) with a
  full per-parameter exp_avg/exp_avg_sq population and the reference
  hyperparameters, plus the two cosine ``lr_schedulers``.

Shapes are the real model's (config-driven, matching wavtokenizer.txt
for the released configs).  ``num_quantizers`` is parameterizable: 1
matches the released inference checkpoints (wavtokenizer.txt:174-181
shows a single VQ layer); 9 mimics the legacy multi-quantizer training
checkpoints the surgical-resume path (experiment.py:398-445) was written
against, whose layers > 7 must be dropped.
"""

from __future__ import annotations

import numpy as np

from ref_utils import (HAVE_REFERENCE, build_ref_backbone,
                       build_ref_encodec_features, build_ref_istft_head,
                       seed_all)


def build_full_lightning_ckpt(config_path: str, num_quantizers: int = 1,
                              seed: int = 0, global_step: int = 10000):
    """Returns the Lightning checkpoint dict (torch tensors inside)."""
    assert HAVE_REFERENCE
    import torch
    import yaml

    from decoder.discriminator_dac import DACDiscriminator
    from decoder.discriminators import (MultiPeriodDiscriminator,
                                        MultiResolutionDiscriminator)
    from decoder.loss import (DACGANLoss, DiscriminatorLoss,
                              FeatureMatchingLoss, GeneratorLoss)

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    ia = cfg["model"]["init_args"]
    fe_args = dict(ia["feature_extractor"]["init_args"])
    fe_args["num_quantizers"] = num_quantizers
    bb_args = ia["backbone"]["init_args"]
    head_args = ia["head"]["init_args"]
    n_emb = len(fe_args["bandwidths"])

    seed_all(seed)

    class _Exp(torch.nn.Module):
        """Registered children exactly as the Lightning experiment
        (ref experiment.py:60-78 + the WavTokenizer subclass's
        conditional discriminators at :387-388)."""

        def __init__(self):
            super().__init__()
            self.feature_extractor = build_ref_encodec_features(fe_args, seed)
            self.backbone = build_ref_backbone(**bb_args)
            self.head = build_ref_istft_head(**head_args)
            self.multiperioddisc = MultiPeriodDiscriminator(
                num_embeddings=n_emb)
            self.multiresddisc = MultiResolutionDiscriminator(
                num_embeddings=n_emb)
            self.dac = DACDiscriminator()
            self.dacdiscriminator = DACGANLoss(self.dac)
            self.disc_loss = DiscriminatorLoss()
            self.gen_loss = GeneratorLoss()
            self.feat_matching_loss = FeatureMatchingLoss()

    exp = _Exp()
    sd = exp.state_dict()
    # melspec_loss buffers (the image's torchaudio stub cannot build the
    # real MelSpectrogram; inject the keys a real checkpoint carries).
    sd["melspec_loss.mel_spec.spectrogram.window"] = torch.hann_window(1024)
    sd["melspec_loss.mel_spec.mel_scale.fb"] = torch.rand(513, 100)

    lr = float(ia.get("initial_learning_rate", 2e-4))

    def adamw_state(modules, lr):
        params = [p for m in modules for p in m.parameters()]
        return {
            "state": {i: {"step": torch.tensor(float(global_step)),
                          "exp_avg": torch.zeros_like(p),
                          "exp_avg_sq": torch.zeros_like(p)}
                      for i, p in enumerate(params)},
            "param_groups": [{"lr": lr, "betas": (0.8, 0.9), "eps": 1e-8,
                              "weight_decay": 0.01, "amsgrad": False,
                              "params": list(range(len(params)))}],
        }

    sched = {"_step_count": global_step + 1, "last_epoch": global_step,
             "verbose": False, "base_lrs": [lr], "_last_lr": [lr * 0.5]}
    return {
        "epoch": 3,
        "global_step": global_step,
        "pytorch-lightning_version": "1.8.6",
        "state_dict": sd,
        "optimizer_states": [
            adamw_state([exp.multiperioddisc, exp.multiresddisc, exp.dac], lr),
            adamw_state([exp.feature_extractor, exp.backbone, exp.head], lr),
        ],
        "lr_schedulers": [dict(sched), dict(sched)],
        "loops": {"fit_loop": {"state_dict": {},
                               "epoch_loop.state_dict": {},
                               "epoch_loop.batch_progress": {
                                   "total": {"ready": global_step,
                                             "completed": global_step}}}},
        "callbacks": {
            "ModelCheckpoint{'monitor': 'val_loss', 'mode': 'min',"
            " 'every_n_train_steps': 0, 'every_n_epochs': 1,"
            " 'train_time_interval': None}": {
                "monitor": "val_loss",
                "best_model_score": torch.tensor(4.5678),
                "best_model_path": "checkpoints/last.ckpt",
                "current_score": torch.tensor(4.9),
                "dirpath": "checkpoints/"},
            "LearningRateMonitor": {},
        },
        "hparams_name": "kwargs",
        "hyper_parameters": {k: v for k, v in ia.items()
                             if not isinstance(v, dict)},
    }, exp
