"""Language-model tier."""

from poccala_tpu.lm.ngram import Ngram

__all__ = ["Ngram"]
