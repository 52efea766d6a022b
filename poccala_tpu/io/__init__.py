"""Host-side IO: WAV loading, corpus path lists, label files."""

from poccala_tpu.io.wav import load_wav, preprocess_signal, write_wav

__all__ = ["load_wav", "preprocess_signal", "write_wav"]
