"""wavtokenizer_tpu — TPU-native (JAX/XLA/Pallas) rebuild of WavTokenizer.

A discrete neural audio codec: SEANet strided-conv encoder -> single-codebook
vector quantizer -> Vocos-style ConvNeXt decoder with ISTFT head, plus the
GAN training stack and research extensions of the reference
(Rita-zi/WavTokenizer), re-designed channel-last and jit-first for TPU.
"""

__version__ = "0.1.0"

from .api.pretrained import Vocos, WavTokenizer
from .api.config import (spec_from_config, spec_from_config_dict,
                         vocos_spec_from_config_dict)
from .models.wavtokenizer import WavTokenizerSpec
from .models.vocos_model import VocosSpec
from .models.seanet import SEANetConfig
from .models.quantize import VQConfig
from .models.vocos import ISTFTHeadConfig, VocosBackboneConfig
