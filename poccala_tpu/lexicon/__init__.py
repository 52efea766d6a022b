"""Lexicon tier: hanzi→pinyin G2P and the pronunciation lexicon."""

from poccala_tpu.lexicon.pinyin import PinYin
from poccala_tpu.lexicon.lexicon import PronunciationLexicon, FlatLexicon

__all__ = ["PinYin", "PronunciationLexicon", "FlatLexicon"]
