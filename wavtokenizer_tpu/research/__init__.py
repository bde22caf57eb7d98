from .adapter import (AdapterConfig, InPathTransformerConfig, apply_adapter,
                      enhanced_forward, init_adapter, init_inpath_transformer,
                      inpath_transformer, inpath_transformer_from_torch,
                      load_byol_transformer, try_enhancement_stack)
from .losses import (voice_focused_loss, feature_loss, cosine_similarity_loss,
                     hybrid_tsne_loss)
from .byol import BYOLConfig, init_byol, byol_loss, target_update, simple_transformer
from .enhance import EnhanceConfig, PairedAudioDataset, enhance_step, make_enhance_optimizer
