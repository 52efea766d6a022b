"""Reference-scale lexicon construction from ``Mandarin.dat``.

The reference ships a 25,569-entry hanzi→pinyin table
(``Lexicon/Mandarin.dat``, parsed by ``PinYin.__init_dict``,
``Lexicon/PinYin.py:39-56``) and intends its lexicon tree to span a real
vocabulary (``Lexicon/PronunciationLexicon.py:45-94``), but ships no
word list (its ``LexiconData/`` corpus is absent).  This module builds a
deterministic multi-thousand-word vocabulary straight from the table —
every single-hanzi word plus two-hanzi compounds over a deterministic
pairing — so decoding exercises a tree at the scale the reference
designed for (10³–10⁴ nodes), without shipping a copy of the table.
"""

from __future__ import annotations

import numpy as np

from poccala_tpu.io.corpus import UnitInventory
from poccala_tpu.lexicon.lexicon import FlatLexicon, PronunciationLexicon
from poccala_tpu.lexicon.pinyin import PinYin, load_mandarin_dat

DEFAULT_DAT = "/root/reference/Lexicon/Mandarin.dat"


def reference_words(
    dat_path: str = DEFAULT_DAT,
    n_single: int = 2500,
    n_multi: int = 1500,
    seed: int = 0,
) -> tuple[list[str], PinYin]:
    """A deterministic word list over the reference table: the first
    ``n_single`` transliterable hanzi (by codepoint order) as
    single-character words, plus ``n_multi`` two-character compounds
    from a seeded pairing.  Returns ``(words, PinYin over the table)``."""
    table = load_mandarin_dat(dat_path)
    py = PinYin(table)
    chars = [c for c in sorted(table.keys()) if py.word2pinyin(c)]
    singles = chars[:n_single]
    rng = np.random.default_rng(seed)
    pool = np.asarray(chars)
    pairs = rng.integers(0, len(pool), size=(n_multi, 2))
    multi = ["".join(pool[p] for p in pair) for pair in pairs]
    return singles + multi, py


def build_reference_lexicon(
    inventory: UnitInventory,
    dat_path: str = DEFAULT_DAT,
    n_single: int = 2500,
    n_multi: int = 1500,
    seed: int = 0,
) -> tuple[FlatLexicon, list[str], PinYin]:
    """Word list → prefix tree → :class:`FlatLexicon` against
    ``inventory`` (syllables with units outside the inventory are
    dropped by ``FlatLexicon.from_tree``)."""
    words, py = reference_words(dat_path, n_single, n_multi, seed)
    lex = PronunciationLexicon()
    lex.generate(words, py)
    flat = FlatLexicon.from_tree(lex.lexicon, inventory)
    return flat, words, py
