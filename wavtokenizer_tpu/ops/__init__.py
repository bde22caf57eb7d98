from .padding import (get_extra_padding_for_conv1d, pad1d, unpad1d,
                      sconv1d_paddings, sconvtr1d_unpaddings)
from .conv import conv1d, conv_transpose1d, sconv1d, sconv_transpose1d
from .lstm import lstm_layer, slstm
from .spectral import (hann_window, overlap_add, istft_same, stft, stft_frames,
                       mel_filterbank, mel_spectrogram, safe_log, mdct, imdct)
from .resample import resample, convert_audio, linear_overlap_add
from .vq import nearest_codebook_indices, codebook_lookup
