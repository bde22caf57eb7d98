from .convert import (convert_wavtokenizer_state_dict, load_torch_state_dict,
                      average_state_dicts)
