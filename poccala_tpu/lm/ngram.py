"""Count-based N-gram language model.

The reference *imports* ``LanguageModel.Ngram`` (``Decoder.py:17``) and
calls ``Ngram(n)``, ``.init_gram()`` and ``.ngram(word) -> {next: count}``
(``Decoder.py:201-204, 151-155``) — but the module is absent from the
repo.  This implements the missing component with the call surface the
decoder expects, plus standard scoring:

* ``train(sentences)`` — accumulate n-gram counts (with sentence
  boundary markers);
* ``ngram(context) -> dict`` — successor counts for a context (the
  decoder's word-transition candidate source);
* ``logprob(word, context)`` — interpolated (Jelinek-Mercer) backoff
  probability in log10 (the reference scores with ``math.log10``,
  ``Decoder.py:155``);
* ``save/init_gram`` — JSON persistence.
"""

from __future__ import annotations

import json
import math
import os
from collections import defaultdict

BOS = "<s>"
EOS = "</s>"


class Ngram:
    def __init__(self, n: int = 2, lambda_interp: float = 0.7):
        assert n >= 1
        self.n = n
        self.lambda_interp = lambda_interp
        # counts[k] maps "w1 w2 … wk" -> count, for k = 1..n
        self.counts: list[dict[str, int]] = [defaultdict(int) for _ in range(n)]
        self.total_unigrams = 0
        self.vocab: set[str] = set()

    # ------------------------------------------------------------------
    def train(self, sentences: list[list[str]]) -> None:
        for sent in sentences:
            tokens = [BOS] * (self.n - 1) + list(sent) + [EOS]
            for i, tok in enumerate(tokens):
                self.vocab.add(tok)
                for k in range(1, self.n + 1):
                    if i + k <= len(tokens):
                        key = " ".join(tokens[i: i + k])
                        self.counts[k - 1][key] += 1
        self.total_unigrams = sum(self.counts[0].values())

    # ------------------------------------------------------------------
    def ngram(self, context: str | list[str]) -> dict[str, int]:
        """Successor counts after ``context`` (the reference decoder's
        word-transition candidates, ``Decoder.py:151-155``)."""
        if isinstance(context, str):
            context = context.split()
        context = context[-(self.n - 1):] if self.n > 1 else []
        prefix = " ".join(context)
        k = len(context) + 1
        out: dict[str, int] = {}
        if k > self.n:
            return out
        for key, cnt in self.counts[k - 1].items():
            parts = key.rsplit(" ", 1)
            if self.n == 1 or (len(parts) == 2 and parts[0] == prefix):
                word = parts[-1]
                if word not in (BOS,):
                    out[word] = out.get(word, 0) + cnt
        return out

    def logprob(self, word: str, context: list[str] | None = None) -> float:
        """log10 P(word | context), interpolated with lower orders; add-1
        floor at the unigram level."""
        context = list(context or [])[-(self.n - 1):]
        v = max(len(self.vocab), 1)

        def order_prob(ctx: list[str]) -> float:
            if not ctx:
                c = self.counts[0].get(word, 0)
                return (c + 1.0) / (self.total_unigrams + v)
            key_den = " ".join(ctx)
            key_num = key_den + " " + word
            den = self.counts[len(ctx) - 1].get(key_den, 0)
            num = self.counts[len(ctx)].get(key_num, 0)
            if den == 0:
                return 0.0
            return num / den

        lam = self.lambda_interp
        p = order_prob([])
        for k in range(1, len(context) + 1):
            pk = order_prob(context[-k:])
            p = lam * pk + (1 - lam) * p if pk > 0 else (1 - lam) * p
        return math.log10(max(p, 1e-12))

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "n": self.n,
                    "counts": [dict(c) for c in self.counts],
                    "vocab": sorted(self.vocab),
                },
                f,
            )

    def init_gram(self, path: str) -> None:
        """Load persisted counts (the reference's ``init_gram`` call
        surface, ``Decoder.py:201-204``)."""
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        with open(path) as f:
            data = json.load(f)
        self.n = data["n"]
        self.counts = [defaultdict(int, c) for c in data["counts"]]
        self.vocab = set(data["vocab"])
        self.total_unigrams = sum(self.counts[0].values())
