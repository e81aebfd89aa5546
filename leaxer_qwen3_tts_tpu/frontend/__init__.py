"""Host frontend: BPE tokenizer (native C++/Python), WAV I/O, mel spectrogram."""

from .mel import log_mel, log_mel_reference_np, mel_filterbank, num_frames
from .tokenizer import Tokenizer, find_tokenizer_files
from .wav import StreamingWavWriter, read_wav, resample, write_wav

__all__ = [
    "Tokenizer",
    "find_tokenizer_files",
    "read_wav",
    "write_wav",
    "StreamingWavWriter",
    "resample",
    "log_mel",
    "log_mel_reference_np",
    "mel_filterbank",
    "num_frames",
]
