import time, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_poccala")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
def log(*a): print(*a, file=sys.stderr, flush=True)
from poccala_tpu.config import Config
from poccala_tpu.ops.frontend import Frontend
from poccala_tpu.decoder.device import DeviceBeamDecoder
from poccala_tpu.io.corpus import UnitInventory
from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
from poccala_tpu.lexicon.builtin_table import BUILTIN_PINYIN
from poccala_tpu.models import senone_bank as sb

cfg = Config(); cfg.model.state_num=5; cfg.model.mix_level=8; cfg.model.max_mix_level=8
fe = Frontend(cfg.frontend)
inv = UnitInventory.standard("XIF_tone")
words = list(BUILTIN_PINYIN.keys())
lex = PronunciationLexicon(); lex.generate(words, PinYin())
flat = FlatLexicon.from_tree(lex.lexicon, inv)
bank = sb.create_bank(len(inv), cfg.model, cfg.frontend.feat_dim, key=jax.random.PRNGKey(1))
dec = DeviceBeamDecoder(bank, flat, candidate=8, max_tokens=64)
dec._prep_device()
log("prepped")

rng = np.random.default_rng(0)
batch = 128
n = 4*16000
signals = jnp.asarray((rng.normal(size=(batch, n))*2000).astype(np.float32))
n_samp = jnp.asarray(np.full((batch,), n, np.int64))
feats, masks = jax.jit(jax.vmap(fe._mfcc_impl))(signals, n_samp)
feats = np.asarray(feats); n_frames = np.asarray(masks.sum(axis=1), np.int32)
t_pad = feats.shape[1]
log("T:", t_pad, "roots:", len(dec._roots), "nodes:", flat.n_nodes)

t0=time.time(); scores = dec._frame_scores_device(feats); s=float(jnp.sum(scores)); log(f"scores compile+run: {time.time()-t0:.2f}s")
t0=time.time(); scores = dec._frame_scores_device(feats); s=float(jnp.sum(scores)); log(f"scores run: {time.time()-t0:.2f}s")
run = dec._scan_fn(t_pad)
t0=time.time()
(nodes, deltas, hist, last_word), (tb_prev, tb_word) = run(scores, jnp.asarray(n_frames))
x = float(jnp.sum(deltas)); log(f"scan compile+run: {time.time()-t0:.2f}s")
t0=time.time()
(nodes, deltas, hist, last_word), (tb_prev, tb_word) = run(scores, jnp.asarray(n_frames))
x = float(jnp.sum(deltas)) + float(jnp.sum(tb_prev)); log(f"scan run: {time.time()-t0:.2f}s")
t0=time.time()
nodes=np.asarray(nodes); deltas=np.asarray(deltas); hist=np.asarray(hist); last_word=np.asarray(last_word)
tbp=np.asarray(tb_prev); tbw=np.asarray(tb_word); log(f"fetch: {time.time()-t0:.2f}s")
e = dec.emit_top
tbp = tbp.reshape(batch, t_pad*e); tbw = tbw.reshape(batch, t_pad*e)
t0=time.time()
from poccala_tpu.utils.logmath import NEG_INF
out=[]
for u in range(batch):
    exits = dec._exit_scores(deltas[u], np.clip(nodes[u],0,None))
    if u == 0: log(f"first exit_scores: {time.time()-t0:.2f}s")
    best={}
    for k in range(dec.max_tokens):
        if nodes[u,k] < 0 or exits[k] <= NEG_INF/2: continue
        for w_id in dec._word_tab[nodes[u,k]]:
            if w_id < 0: continue
            lm = float(dec._lm_tab[last_word[u,k], w_id])
            seq = dec._backtrace(tbp[u], tbw[u], hist[u,k]) + (dec._vocab[w_id],)
            sc = float(exits[k]) + lm
            if seq not in best or sc > best[seq]: best[seq]=sc
    if u == 0: log(f"first utt backtrace total: {time.time()-t0:.2f}s, hyps {len(best)}, len {len(next(iter(best))) if best else 0}")
    out.append(best)
log(f"host backtrace all: {time.time()-t0:.2f}s")
