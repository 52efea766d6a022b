import sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_poccala")
def log(*a): print(*a, file=sys.stderr, flush=True)
from poccala_tpu.config import Config
from poccala_tpu.decoder.device import DeviceBeamDecoder
from poccala_tpu.io.corpus import UnitInventory
from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
from poccala_tpu.lexicon.builtin_table import BUILTIN_PINYIN
from poccala_tpu.models import senone_bank as sb

cfg = Config(); cfg.model.state_num=5; cfg.model.mix_level=8; cfg.model.max_mix_level=8
inv = UnitInventory.standard("XIF_tone")
words = list(BUILTIN_PINYIN.keys())
lex = PronunciationLexicon(); lex.generate(words, PinYin())
flat = FlatLexicon.from_tree(lex.lexicon, inv)
bank = sb.create_bank(len(inv), cfg.model, cfg.frontend.feat_dim, key=jax.random.PRNGKey(1))
dec = DeviceBeamDecoder(bank, flat, candidate=8, max_tokens=64)
dec._prep_device()
log("n_nodes", dec._j_bands.shape, "child_tab", dec._j_child.shape,
    "word_tab", dec._j_word.shape, "roots", dec._j_roots.shape,
    "n_tok_states", dec.n_tok_states, "emit_top", dec.emit_top)
batch, T = 128, 320
scores = jnp.zeros((batch, T, 640), jnp.float32)
nf = jnp.full((batch,), T, jnp.int32)
run = dec._build_scan(T)
lowered = jax.jit(run).lower(scores, nf)
comp = lowered.compile()
try:
    ca = comp.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    for k in sorted(ca):
        if ca[k] > 1e8: log(f"{k}: {ca[k]:.3e}")
except Exception as e:
    log("cost_analysis failed:", e)
