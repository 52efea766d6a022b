import time, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_poccala")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
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
rng = np.random.default_rng(0)

def trial(batch, T, K, S=None):
    dec = DeviceBeamDecoder(bank, flat, candidate=8, max_tokens=K)
    dec._prep_device()
    S = dec._j_senone.max().item()+1 if S is None else S
    scores = jnp.asarray(rng.normal(size=(batch, T, 640)).astype(np.float32))
    nf = jnp.asarray(np.full((batch,), T, np.int32))
    run = dec._scan_fn(T)
    t0=time.time(); out = run(scores, nf); x=float(jnp.sum(out[0][1])); c=time.time()-t0
    t0=time.time(); out = run(scores, nf); x=float(jnp.sum(out[0][1])); e=time.time()-t0
    log(f"batch={batch} T={T} K={K}: compile+run {c:.2f}s, run {e:.3f}s ({e/T*1e3:.2f} ms/frame)")

trial(128, 320, 64)
trial(8, 320, 64)
trial(128, 80, 64)
trial(128, 320, 16)
