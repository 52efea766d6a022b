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
lex = PronunciationLexicon(); lex.generate(list(BUILTIN_PINYIN.keys()), PinYin())
flat = FlatLexicon.from_tree(lex.lexicon, inv)
bank = sb.create_bank(len(inv), cfg.model, cfg.frontend.feat_dim, key=jax.random.PRNGKey(1))
dec = DeviceBeamDecoder(bank, flat, candidate=8, max_tokens=64)
dec._prep_device()

rate = cfg.frontend.sample_rate
utt_seconds = 4.0
n_samples = int(utt_seconds * rate)
mfcc = jax.jit(jax.vmap(fe._mfcc_impl))

for batch in (128, 512, 1024):
    signals = jnp.asarray((rng.normal(size=(batch, n_samples)) * 2000).astype(np.float32))
    n_samp = jnp.asarray(np.full((batch,), n_samples, np.int64))
    feats, masks = mfcc(signals, n_samp)
    feats = np.asarray(feats); n_frames = np.asarray(masks.sum(axis=1), np.int32)
    scores = dec._frame_scores_device(feats); _=float(scores.sum())
    t_pad = feats.shape[1]
    run = dec._scan_fn(t_pad)
    nf = jnp.asarray(n_frames.astype(np.int32))
    out = run(scores, nf); _=float(out[0][1].sum())  # compile
    t0=time.time(); out = run(scores, nf); _=float(out[0][1].sum())
    dt=time.time()-t0
    t0=time.time(); scores2 = dec._frame_scores_device(feats); _=float(scores2.sum())
    ds=time.time()-t0
    t0=time.time(); hyps = dec.decode_batch(feats, n_frames)
    dfull=time.time()-t0
    print(f"batch={batch}: scan {dt:.3f}s score {ds:.3f}s full {dfull:.3f}s "
          f"-> full tput {batch*utt_seconds/dfull:.0f} audio-s/s")
