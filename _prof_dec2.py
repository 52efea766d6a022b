import time, numpy as np, jax, jax.numpy as jnp
from poccala_tpu.config import Config
from poccala_tpu.decoder.device import DeviceBeamDecoder
from poccala_tpu.io.corpus import UnitInventory
from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
from poccala_tpu.lexicon.builtin_table import BUILTIN_PINYIN
from poccala_tpu.models import senone_bank as sb
from poccala_tpu.ops.frontend import Frontend

cfg = Config()
fe = Frontend(cfg.frontend)
rng = np.random.default_rng(0)
inv = UnitInventory.standard("XIF_tone")
words = list(BUILTIN_PINYIN.keys())
lex = PronunciationLexicon(); lex.generate(words, PinYin())
flat = FlatLexicon.from_tree(lex.lexicon, inv)
bank = sb.create_bank(len(inv), cfg.model, cfg.frontend.feat_dim, key=jax.random.PRNGKey(1))
dec = DeviceBeamDecoder(bank, flat, candidate=8, max_tokens=64)

batch, utt_seconds = 128, 4.0
rate = cfg.frontend.sample_rate
n_samples = int(utt_seconds * rate)
signals = jnp.asarray((rng.normal(size=(batch, n_samples)) * 2000).astype(np.float32))
n_samp = jnp.asarray(np.full((batch,), n_samples, np.int64))

feats, masks = jax.jit(jax.vmap(fe._mfcc_impl))(signals, n_samp)
feats = np.asarray(feats); n_frames = np.asarray(masks.sum(axis=1), np.int32)
print("feats", feats.shape, "frames", n_frames[0])

dec._prep_device()
t0=time.time(); scores = dec._frame_scores_device(feats); sync=float(scores.sum()); print(f"score compile+run {time.time()-t0:.2f}s")
t0=time.time(); scores = dec._frame_scores_device(feats); sync=float(scores.sum()); print(f"score run {time.time()-t0:.3f}s")

t_pad = feats.shape[1]
run = dec._scan_fn(t_pad)
nf = jnp.asarray(n_frames.astype(np.int32))
t0=time.time(); out = run(scores, nf); s=float(out[0][1].sum()); print(f"scan compile+run {time.time()-t0:.2f}s")
for _ in range(2):
    t0=time.time(); out = run(scores, nf); s=float(out[0][1].sum()); print(f"scan run {time.time()-t0:.3f}s")

# host fetch + backtrace portion
t0=time.time()
hyps = dec.decode_batch(feats, n_frames)
print(f"full decode_batch {time.time()-t0:.3f}s")
t0=time.time()
hyps = dec.decode_batch(feats, n_frames)
print(f"full decode_batch {time.time()-t0:.3f}s")
