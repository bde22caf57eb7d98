from .step import (TrainConfig, create_train_state, train_step,
                   state_to_inference_params, mel_coeff_decay)
from .wnorm import fold_tree
