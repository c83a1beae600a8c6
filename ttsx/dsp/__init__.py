from ttsx.dsp.stft import (
    mel_spectrogram, stft_magnitude, mel_filterbank, hann_window, mfcc,
    frame_signal, istft)
from ttsx.dsp.features import extract_f0_energy, energy_vad
