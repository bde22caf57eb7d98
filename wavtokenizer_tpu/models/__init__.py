from . import seanet, quantize, vocos, wavtokenizer
