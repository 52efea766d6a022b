"""Decoder tier: frame-synchronous Viterbi-beam token passing."""

from poccala_tpu.decoder.beam import BeamDecoder, Hypothesis

__all__ = ["BeamDecoder", "Hypothesis"]
