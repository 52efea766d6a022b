"""Ablation: which ops in the device-decoder step cost the time."""
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from poccala_tpu.config import Config
from poccala_tpu.decoder.device import DeviceBeamDecoder
from poccala_tpu.io.corpus import UnitInventory
from poccala_tpu.lexicon import FlatLexicon, PinYin, PronunciationLexicon
from poccala_tpu.lexicon.builtin_table import BUILTIN_PINYIN
from poccala_tpu.models import senone_bank as sb
from poccala_tpu.utils.logmath import NEG_INF

cfg = Config()
inv = UnitInventory.standard("XIF_tone")
lex = PronunciationLexicon(); lex.generate(list(BUILTIN_PINYIN.keys()), PinYin())
flat = FlatLexicon.from_tree(lex.lexicon, inv)
bank = sb.create_bank(len(inv), cfg.model, cfg.frontend.feat_dim, key=jax.random.PRNGKey(1))
dec = DeviceBeamDecoder(bank, flat, candidate=8, max_tokens=64)
dec._prep_device()

B, T, S = 128, 319, bank.num_states
rng = np.random.default_rng(0)
scores_b = jnp.asarray(rng.normal(size=(B, T, S)).astype(np.float32))
nf = jnp.full((B,), T, jnp.int32)

bands, senone = dec._j_bands, dec._j_senone
child_tab, word_tab = dec._j_child, dec._j_word
roots, lm_tab = dec._j_roots, dec._j_lm
k_cap, n_s = dec.max_tokens, dec.n_tok_states
n_nodes = bands.shape[0]; c_max = child_tab.shape[1]
w_t = word_tab.shape[1]; r = len(dec._roots); v = lm_tab.shape[1]
w_band = bands.shape[-1]; beam = dec.beam; e_top = dec.emit_top
n_ptr = T * e_top
r_keep = int(min(r, max(dec.candidate, k_cap // 4)))
root_first_sen = jnp.clip(dec._j_senone[roots, 1], 0, None)


def make_run(do_step=True, do_emit=True, do_roots=True, do_dedup=True,
             do_topk=True):
    def step_tokens(nodes, deltas, frame_scores):
        bn = bands[jnp.clip(nodes, 0, n_nodes - 1)]
        best = jnp.full_like(deltas, NEG_INF)
        for k in range(w_band):
            cand = deltas + bn[:, :, k]
            if k:
                cand = jnp.concatenate(
                    [jnp.full((cand.shape[0], k), NEG_INF), cand[:, :-k]], axis=1)
            best = jnp.maximum(best, cand)
        sen = senone[jnp.clip(nodes, 0, n_nodes - 1)]
        log_b = jnp.where(sen >= 0, frame_scores[jnp.clip(sen, 0, None)], NEG_INF)
        log_b = log_b.at[:, 0].set(0.0)
        alive = (nodes >= 0)[:, None]
        return jnp.where(alive, jnp.maximum(best + log_b, NEG_INF), NEG_INF)

    def exit_of(nodes, deltas):
        bn = bands[jnp.clip(nodes, 0, n_nodes - 1)]
        out = jnp.full(nodes.shape, NEG_INF)
        for k in range(1, w_band):
            rr = n_s - 1 - k
            if rr < 0: continue
            out = jnp.maximum(out, deltas[:, rr] + bn[:, rr, k])
        return jnp.where(nodes >= 0, out, NEG_INF)

    def one_utt_step(carry, inp):
        nodes, deltas, hist, last_word = carry
        frame_scores, ti, active = inp
        if do_step:
            stepped = step_tokens(nodes, deltas, frame_scores)
            deltas = jnp.where(active & (nodes >= 0)[:, None], stepped, deltas)
        exits = jnp.where(active, exit_of(nodes, deltas), NEG_INF)

        if do_emit:
            wt = word_tab[jnp.clip(nodes, 0, n_nodes - 1)]
            w_ok = (wt >= 0) & (exits > NEG_INF / 2)[:, None]
            lm = lm_tab[last_word[:, None], jnp.clip(wt, 0, v - 1)]
            emit_score = jnp.where(w_ok, exits[:, None] + lm, NEG_INF)
            flat = emit_score.reshape(-1)
            e_scores, e_idx = jax.lax.top_k(flat, e_top)
            ek, ew = e_idx // w_t, e_idx % w_t
            e_valid = e_scores > NEG_INF / 2
            tb_prev_row = jnp.where(e_valid, hist[ek], -1)
            tb_word_row = jnp.where(e_valid, wt[ek, ew].astype(jnp.int32), 0)
            e_words = tb_word_row
        else:
            e_scores = jnp.full((e_top,), -1.0)
            e_valid = jnp.ones((e_top,), bool)
            tb_prev_row = jnp.full((e_top,), -1, jnp.int32)
            tb_word_row = jnp.zeros((e_top,), jnp.int32)
            e_words = tb_word_row

        ch = child_tab[jnp.clip(nodes, 0, n_nodes - 1)].reshape(-1)
        ch_ok = (ch >= 0) & jnp.repeat(exits > NEG_INF / 2, c_max)
        ch_d = jnp.full((k_cap * c_max, n_s), NEG_INF)
        ch_d = ch_d.at[:, 0].set(jnp.where(ch_ok, jnp.repeat(exits, c_max), NEG_INF))
        if do_roots:
            _, root_sel = jax.lax.top_k(frame_scores[root_first_sen], r_keep)
            restart_roots = roots[root_sel]
        else:
            restart_roots = roots[:r_keep]
        re_d = jnp.full((e_top * r_keep, n_s), NEG_INF)
        re_d = re_d.at[:, 0].set(jnp.repeat(jnp.where(e_valid, e_scores, NEG_INF), r_keep))
        re_nodes = jnp.where(jnp.repeat(e_valid, r_keep),
                             jnp.tile(restart_roots, e_top), -1).astype(jnp.int32)
        re_hist = jnp.repeat(ti * e_top + jnp.arange(e_top), r_keep)
        re_last = jnp.repeat(e_words, r_keep)

        nodes_p = jnp.concatenate([nodes, jnp.where(ch_ok, ch, -1).astype(jnp.int32), re_nodes])
        deltas_p = jnp.concatenate([deltas, ch_d, re_d])
        hist_p = jnp.concatenate([hist, jnp.repeat(hist, c_max), re_hist.astype(jnp.int32)])
        last_p = jnp.concatenate([last_word, jnp.repeat(last_word, c_max), re_last.astype(jnp.int32)])

        score_p = deltas_p.max(axis=1)
        p_tot = nodes_p.shape[0]
        if do_dedup:
            live = nodes_p >= 0
            key = (nodes_p + 1) * (n_ptr + 2) + (hist_p + 1)
            dead_base = jnp.int32((n_nodes + 2) * (n_ptr + 2))
            key = jnp.where(live, key, dead_base + jnp.arange(p_tot))
            order = jnp.lexsort((-score_p, key))
            key_s = key[order]
            score_s = score_p[order]
            is_dup = jnp.concatenate([jnp.zeros((1,), bool), key_s[1:] == key_s[:-1]])
            score_s = jnp.where(is_dup, NEG_INF, score_s)
        else:
            order = jnp.arange(p_tot)
            score_s = score_p

        if do_topk:
            top_scores, top_idx = jax.lax.top_k(score_s, k_cap)
            sel = order[top_idx]
        else:
            top_scores = score_s[:k_cap]
            sel = order[:k_cap]
        n_alive = jnp.sum(top_scores > NEG_INF / 2)
        n_keep = jnp.maximum(1, jnp.ceil(n_alive * beam).astype(jnp.int32))
        keep = (jnp.arange(k_cap) < n_keep) & (top_scores > NEG_INF / 2)

        new_nodes = jnp.where(keep, nodes_p[sel], -1).astype(jnp.int32)
        new_deltas = jnp.where(keep[:, None], deltas_p[sel], NEG_INF)
        new_hist = jnp.where(keep, hist_p[sel], -1).astype(jnp.int32)
        new_last = jnp.where(keep, last_p[sel], v).astype(jnp.int32)

        nodes = jnp.where(active, new_nodes, nodes)
        deltas = jnp.where(active, new_deltas, deltas)
        hist = jnp.where(active, new_hist, hist)
        last_word = jnp.where(active, new_last, last_word)
        tb_prev_row = jnp.where(active, tb_prev_row, -1)
        return (nodes, deltas, hist, last_word), (tb_prev_row.astype(jnp.int32), tb_word_row.astype(jnp.int32))

    def run(scores_b, n_frames_b):
        def one_utt(scores_u, n_frames_u):
            nodes0 = jnp.full((k_cap,), -1, jnp.int32)
            nodes0 = nodes0.at[:min(r, k_cap)].set(roots[:min(r, k_cap)])
            deltas0 = jnp.full((k_cap, n_s), NEG_INF)
            deltas0 = deltas0.at[:min(r, k_cap), 0].set(0.0)
            hist0 = jnp.full((k_cap,), -1, jnp.int32)
            last0 = jnp.full((k_cap,), v, jnp.int32)
            tis = jnp.arange(T, dtype=jnp.int32)
            actives = tis < n_frames_u
            return jax.lax.scan(one_utt_step, (nodes0, deltas0, hist0, last0),
                                (scores_u, tis, actives))
        return jax.vmap(one_utt)(scores_b, n_frames_b)

    return jax.jit(run)


for name, kw in [
    ("full", {}),
    ("no_emit_topk", dict(do_emit=False)),
    ("no_root_topk", dict(do_roots=False)),
    ("no_dedup_sort", dict(do_dedup=False)),
    ("no_final_topk", dict(do_topk=False)),
    ("no_step_tokens", dict(do_step=False)),
    ("bare(min)", dict(do_emit=False, do_roots=False, do_dedup=False, do_topk=False)),
]:
    f = make_run(**kw)
    out = f(scores_b, nf); _ = float(out[0][1].sum())
    t0 = time.time(); out = f(scores_b, nf); _ = float(out[0][1].sum())
    dt = time.time() - t0
    print(f"{name:16s} {dt:.3f}s  ({dt/T*1e3:.3f} ms/step)")
