"""Fully on-device beam decoder: a `lax.scan` token machine.

The third tier of the decoder stack (dict reference → vectorized host →
device): token passing over the lexicon tree runs entirely inside one
jitted scan over frames, batched over utterances with `vmap` — the
fixed-capacity-token-array + top-k design of SURVEY.md §7 hard part (g).

Per frame, per utterance:

1. all K tokens advance one banded max-plus step (per-node bands and
   senones gathered against the precomputed ``[T, S]`` score matrix);
2. exit scores flow to child nodes (``K·C`` candidates);
3. the frame's top-``E`` word emissions each re-enter the tree root
   (``E·R`` candidates) carrying their bigram LM scores (the host
   decoders expand *every* emission; E best-of-frame is the device
   approximation — E ≥ 2 keeps confusable word boundaries alive where a
   single-best emission silently prunes them);
4. candidates dedup on (node, history): sort by key with score as the
   tie-break (``lexsort``), mask segment-interior rows — O(P log P), no
   pairwise O(P²) table — then ``top_k`` with the beam fraction prunes
   back to K;
5. the frame's emissions write ``(prev_ptr, word)`` into a
   statically-indexed traceback lattice row ``[T, E]`` — pointer
   ``= t·E + e``, no dynamic allocation.

The winning hypothesis is reconstructed on the host from the fetched
traceback lattice.

Distributed decode (BASELINE config 5): ``decode_batch(..., mesh=...)``
runs the same scan under ``shard_map`` with utterances sharded over the
``data`` mesh axis and tables/bank replicated — decode is
embarrassingly parallel per utterance, so the shard program contains no
collectives at all (the reference's intended serving path,
``Decoder.py:91-167``, scaled out).
"""

from __future__ import annotations

import numpy as np

from dataclasses import dataclass, field

from poccala_tpu.decoder.beam import Hypothesis
from poccala_tpu.decoder.vector import VectorBeamDecoder
from poccala_tpu.utils.logmath import NEG_INF


@dataclass
class _StreamState:
    """Carry of an online decode session (see
    :meth:`DeviceBeamDecoder.stream_init`)."""

    batch: int
    max_frames: int
    t_offset: int = 0
    carry: tuple | None = None
    tb_prev: list = field(default_factory=list)
    tb_word: list = field(default_factory=list)


class DeviceBeamDecoder(VectorBeamDecoder):
    """Scan-based on-device decoder.  Constructor matches
    :class:`poccala_tpu.decoder.beam.BeamDecoder`; ``emit_top`` sets how
    many word emissions per frame re-enter the tree root."""

    def __init__(self, *args, emit_top: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self.emit_top = max(1, int(emit_top))

    def _prep_device(self):
        if hasattr(self, "_dev_ready"):
            return
        import jax.numpy as jnp

        self._prep_tables()
        self._j_bands = jnp.asarray(self._bands)          # [n_nodes, Ns, W]
        self._j_senone = jnp.asarray(self._senone)        # [n_nodes, Ns]
        # Expansion child table WITHOUT the root row's children: tokens
        # never sit on the root (seeding and word re-entry go straight
        # to the first-level nodes via root restarts), so padding every
        # row to the root's fan-out — the widest in any real lexicon by
        # far — would blow the per-frame candidate pool (and the dedup
        # sort) up by orders of magnitude.  Width = max over non-root
        # rows only; row 0 stays all -1 (it is only ever gathered by
        # dead tokens clipped from -1).
        ct = np.asarray(self._child_tab)
        if ct.shape[0] > 1:
            widths = (ct >= 0).sum(axis=1)
            c_exp = max(1, int(widths[1:].max(initial=0)))
            exp = np.full((ct.shape[0], c_exp), -1, np.int32)
            for i in range(1, ct.shape[0]):
                row = ct[i][ct[i] >= 0][:c_exp]
                exp[i, : len(row)] = row
        else:
            exp = np.full((1, 1), -1, np.int32)
        self._j_child = jnp.asarray(exp)                  # [n_nodes, C']
        self._j_word = jnp.asarray(self._word_tab)        # [n_nodes, Wt]
        self._j_roots = jnp.asarray(self._roots, jnp.int32)  # [R]
        self._j_lm = jnp.asarray(self._lm_tab, jnp.float32)  # [V+1, V]
        self._dev_ready = True

    # ------------------------------------------------------------------
    def decode_batch(self, feats, n_frames, return_nbest: int = 1,
                     mesh=None):
        """Decode ``[B, T, D]``; the device path returns 1-best-focused
        n-best lists per utterance.

        :param mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis
            — the scan then runs under ``shard_map`` with utterances
            sharded across devices (distributed decode).
        """
        import jax.numpy as jnp

        self._prep_device()
        feats = np.asarray(feats, np.float32)
        n_frames = np.asarray(n_frames)
        b_orig = feats.shape[0]
        if mesh is not None:
            n_data = mesh.shape["data"]
            pad = (-b_orig) % n_data
            if pad:
                feats = np.pad(feats, ((0, pad), (0, 0), (0, 0)))
                n_frames = np.pad(n_frames, (0, pad))
        b, t_pad, _ = feats.shape
        scores = self._frame_scores_device(feats)          # [B, T, S]

        if mesh is None:
            run = self._scan_fn(t_pad)
        else:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            run = self._sharded_scan_fn(t_pad, mesh)
            scores = jax.device_put(scores, NamedSharding(mesh, P("data")))
        (nodes, deltas, hist, last_word), (tb_prev, tb_word) = run(
            scores, jnp.asarray(n_frames.astype(np.int32))
        )
        nodes = np.asarray(nodes)
        deltas = np.asarray(deltas)
        hist = np.asarray(hist)
        last_word = np.asarray(last_word)
        e_top = self.emit_top
        tb_prev = np.asarray(tb_prev).reshape(b, t_pad * e_top)  # [B, T*E]
        tb_word = np.asarray(tb_word).reshape(b, t_pad * e_top)

        out: list[list[Hypothesis]] = []
        k_cap = self.max_tokens
        for u in range(b_orig):
            exits = self._exit_scores(deltas[u], np.clip(nodes[u], 0, None))
            best: dict[tuple, float] = {}
            for k in range(k_cap):
                if nodes[u, k] < 0 or exits[k] <= NEG_INF / 2:
                    continue
                for w_id in self._word_tab[nodes[u, k]]:
                    if w_id < 0:
                        continue
                    lm = float(self._lm_tab[last_word[u, k], w_id])
                    seq = self._backtrace(tb_prev[u], tb_word[u], hist[u, k])
                    seq = seq + (self._vocab[w_id],)
                    score = float(exits[k]) + lm
                    if seq not in best or score > best[seq]:
                        best[seq] = score
            hyps = [Hypothesis(score=s, words=w) for w, s in best.items()]
            hyps.sort(reverse=True)
            out.append(hyps[:return_nbest])
        return out

    def _backtrace(self, tb_prev, tb_word, ptr: int) -> tuple:
        words = []
        while ptr >= 0:
            words.append(self._vocab[tb_word[ptr]])
            ptr = tb_prev[ptr]
        return tuple(reversed(words))

    # ------------------------------------------------------------------
    # Streaming (online) decode: the reference's serving intent —
    # record → VAD → decode (Decoder.py:190-218) — as a chunk-
    # incremental API.  The scan carry (nodes, deltas, hist, last_word)
    # and the traceback lattice persist across chunks; pointers are
    # absolute frame indices, so concatenated per-chunk lattice rows
    # form the same [T_total*E] table the one-shot scan writes, and a
    # chunked decode reproduces the one-shot result exactly (pinned in
    # tests/test_streaming_decode.py).
    # ------------------------------------------------------------------

    def stream_init(self, batch: int = 1, max_frames: int = 4096):
        """Start a streaming decode session.

        :param batch: number of parallel audio streams
        :param max_frames: total-frame capacity (sizes the traceback-
            pointer key space; exceeding it raises at feed time)
        """
        self._prep_device()
        return _StreamState(batch=batch, max_frames=max_frames)

    def stream_feed(self, st, feats_chunk, n_valid=None):
        """Advance the token machine over one feature chunk.

        :param feats_chunk: ``[B, Tc, D]`` (or ``[Tc, D]`` when
            ``batch == 1``) — VAD-kept frames only, as in the
            reference's serving loop
        :param n_valid: ``[B]`` valid frame counts (default: full chunk)
        """
        import jax.numpy as jnp

        feats_chunk = np.asarray(feats_chunk, np.float32)
        if feats_chunk.ndim == 2:
            feats_chunk = feats_chunk[None]
        b, t_c, _ = feats_chunk.shape
        if b != st.batch:
            raise ValueError(f"stream batch {st.batch} != chunk batch {b}")
        if st.t_offset + t_c > st.max_frames:
            raise ValueError(
                f"stream exceeds max_frames={st.max_frames}; "
                f"restart with a larger capacity"
            )
        if n_valid is None:
            n_valid = np.full((b,), t_c, np.int32)
        scores = self._frame_scores_device(feats_chunk)      # [B, Tc, S]
        run = self._chunk_scan_fn(t_c, st.max_frames)
        if st.carry is None:
            seed = self._seed_fn(t_c, st.max_frames)
            st.carry = seed(scores)
        st.carry, (tb_prev, tb_word) = run(
            st.carry,
            scores,
            jnp.asarray(np.int32(st.t_offset)),
            jnp.asarray(n_valid.astype(np.int32)),
        )
        # [B, Tc, E] chunk lattice rows appended in frame order: row
        # index in the concatenated table == absolute ti*E + e
        st.tb_prev.append(np.asarray(tb_prev).reshape(b, -1))
        st.tb_word.append(np.asarray(tb_word).reshape(b, -1))
        st.t_offset += t_c
        return st

    def stream_result(self, st, return_nbest: int = 1):
        """Current n-best hypotheses (callable at any point; the stream
        may continue afterwards)."""
        if st.carry is None:
            return [[] for _ in range(st.batch)]
        nodes, deltas, hist, last_word = (np.asarray(a) for a in st.carry)
        tb_prev = np.concatenate(st.tb_prev, axis=1)
        tb_word = np.concatenate(st.tb_word, axis=1)
        out: list[list[Hypothesis]] = []
        for u in range(st.batch):
            exits = self._exit_scores(deltas[u], np.clip(nodes[u], 0, None))
            best: dict[tuple, float] = {}
            for k in range(self.max_tokens):
                if nodes[u, k] < 0 or exits[k] <= NEG_INF / 2:
                    continue
                for w_id in self._word_tab[nodes[u, k]]:
                    if w_id < 0:
                        continue
                    lm = float(self._lm_tab[last_word[u, k], w_id])
                    seq = self._backtrace(tb_prev[u], tb_word[u], hist[u, k])
                    seq = seq + (self._vocab[w_id],)
                    score = float(exits[k]) + lm
                    if seq not in best or score > best[seq]:
                        best[seq] = score
            hyps = [Hypothesis(score=s, words=w) for w, s in best.items()]
            hyps.sort(reverse=True)
            out.append(hyps[:return_nbest])
        return out

    def decode_stream(self, chunks, return_nbest: int = 1):
        """Convenience: decode one utterance (or batch) delivered as a
        list of feature chunks; equals the one-shot
        :meth:`decode_batch` on the concatenated features."""
        chunks = [np.asarray(c, np.float32) for c in chunks]
        if not chunks:
            return []
        b = 1 if chunks[0].ndim == 2 else chunks[0].shape[0]
        total = sum(c.shape[-2] for c in chunks)
        st = self.stream_init(batch=b, max_frames=total)
        for c in chunks:
            st = self.stream_feed(st, c)
        return self.stream_result(st, return_nbest=return_nbest)

    def _chunk_scan_fn(self, t_c: int, max_frames: int):
        import jax
        import jax.numpy as jnp

        cache = getattr(self, "_chunk_cache", None)
        if cache is None:
            cache = self._chunk_cache = {}
        key = (t_c, max_frames)
        if key in cache:
            return cache[key]
        one_utt_step, _ = self._build_step(max_frames * self.emit_top)

        def run_chunk(carry_b, scores_b, t0, n_valid_b):
            def one_utt(carry_u, scores_u, n_valid_u):
                tis = t0 + jnp.arange(t_c, dtype=jnp.int32)
                actives = jnp.arange(t_c) < n_valid_u
                return jax.lax.scan(
                    one_utt_step, carry_u, (scores_u, tis, actives)
                )

            return jax.vmap(one_utt, in_axes=(0, 0, 0))(
                carry_b, scores_b, n_valid_b
            )

        fn = jax.jit(run_chunk)
        cache[key] = fn
        return fn

    def _seed_fn(self, t_c: int, max_frames: int):
        import jax

        cache = getattr(self, "_seed_cache", None)
        if cache is None:
            cache = self._seed_cache = {}
        key = (t_c, max_frames)
        if key in cache:
            return cache[key]
        _, seed_state = self._build_step(max_frames * self.emit_top)
        seed_t = min(10, t_c)
        fn = jax.jit(jax.vmap(lambda s: seed_state(s, seed_t)))
        cache[key] = fn
        return fn

    def _frame_scores_device(self, feats):
        import jax.numpy as jnp

        from poccala_tpu.ops.pallas.gmm_score_tpu import gmm_log_scores_fast

        b, t_pad, d = feats.shape
        flat = jnp.asarray(feats).reshape(b * t_pad, d)
        s = gmm_log_scores_fast(flat, self.bank.means, self.bank.log_var,
                                self.bank.log_w, normalizer=self.normalizer,
                                score_dtype=self.score_dtype)
        return s.reshape(b, t_pad, -1)

    # ------------------------------------------------------------------
    def _scan_fn(self, t_pad: int):
        import jax

        cache = getattr(self, "_scan_cache", None)
        if cache is None:
            cache = self._scan_cache = {}
        if t_pad in cache:
            return cache[t_pad]
        fn = jax.jit(self._build_scan(t_pad))
        cache[t_pad] = fn
        return fn

    def _sharded_scan_fn(self, t_pad: int, mesh):
        """The same scan wrapped in ``shard_map`` over the ``data`` axis
        — per-utterance decode is independent, so the shard program has
        zero collectives; the lexicon/LM tables and bank are closed over
        and replicated."""
        import jax
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map as _shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map as _shard_map

        cache = getattr(self, "_sharded_cache", None)
        if cache is None:
            cache = self._sharded_cache = {}
        key = (t_pad, id(mesh))
        if key in cache:
            return cache[key]
        run = self._build_scan(t_pad)
        spec = P("data")
        mapped = _shard_map(
            run, mesh=mesh,
            in_specs=(spec, spec),
            out_specs=((spec, spec, spec, spec), (spec, spec)),
            check_vma=False,
        )
        fn = jax.jit(mapped)
        cache[key] = fn
        return fn

    def _build_step(self, n_ptr: int):
        """Build the per-frame token-machine step shared by the one-shot
        scan (:meth:`_build_scan`) and the chunk-incremental stream scan
        (:meth:`_build_chunk_scan`).  ``n_ptr`` sizes the traceback-
        pointer key space (= max total frames × E)."""
        import jax
        import jax.numpy as jnp

        bands, senone = self._j_bands, self._j_senone
        child_tab, word_tab = self._j_child, self._j_word
        roots, lm_tab = self._j_roots, self._j_lm
        k_cap = self.max_tokens
        n_s = self.n_tok_states
        n_nodes = bands.shape[0]
        c_max = child_tab.shape[1]
        w_t = word_tab.shape[1]
        r = len(self._roots)
        v = lm_tab.shape[1]
        w_band = bands.shape[-1]
        beam = self.beam
        e_top = self.emit_top
        # score-ranked root selection: with large lexicons (hundreds of
        # first-syllable nodes) only the acoustically-plausible roots are
        # seeded/restarted each frame, ranked by their first emitting
        # senone's frame score (the device analog of the reference's
        # generate_first_word candidate cut, Decoder.py:63-88)
        r_keep = int(min(r, max(self.candidate, k_cap // 4)))
        root_first_sen = jnp.clip(
            self._j_senone[roots, 1], 0, None
        )  # [R] first emitting senone of each root syllable

        def step_tokens(nodes, deltas, frame_scores):
            bn = bands[jnp.clip(nodes, 0, n_nodes - 1)]   # [K, Ns, W]
            best = jnp.full_like(deltas, NEG_INF)
            for k in range(w_band):
                cand = deltas + bn[:, :, k]
                if k:
                    cand = jnp.concatenate(
                        [jnp.full((cand.shape[0], k), NEG_INF),
                         cand[:, :-k]], axis=1,
                    )
                best = jnp.maximum(best, cand)
            sen = senone[jnp.clip(nodes, 0, n_nodes - 1)]
            log_b = jnp.where(
                sen >= 0, frame_scores[jnp.clip(sen, 0, None)], NEG_INF
            )
            log_b = log_b.at[:, 0].set(0.0)
            alive = (nodes >= 0)[:, None]
            return jnp.where(
                alive, jnp.maximum(best + log_b, NEG_INF), NEG_INF
            )

        def exit_of(nodes, deltas):
            bn = bands[jnp.clip(nodes, 0, n_nodes - 1)]
            out = jnp.full(nodes.shape, NEG_INF)
            for k in range(1, w_band):
                rr = n_s - 1 - k
                if rr < 0:
                    continue
                out = jnp.maximum(out, deltas[:, rr] + bn[:, rr, k])
            return jnp.where(nodes >= 0, out, NEG_INF)

        def one_utt_step(carry, inp):
            nodes, deltas, hist, last_word = carry
            frame_scores, ti, active = inp

            stepped = step_tokens(nodes, deltas, frame_scores)
            deltas = jnp.where(active & (nodes >= 0)[:, None], stepped, deltas)
            exits = jnp.where(active, exit_of(nodes, deltas), NEG_INF)

            # --- word emissions; top-E re-enter the tree root, each with
            # its own traceback entry (host tiers expand every emission;
            # E-best keeps confusable boundaries alive)
            wt = word_tab[jnp.clip(nodes, 0, n_nodes - 1)]   # [K, Wt]
            w_ok = (wt >= 0) & (exits > NEG_INF / 2)[:, None]
            lm = lm_tab[last_word[:, None], jnp.clip(wt, 0, v - 1)]
            emit_score = jnp.where(w_ok, exits[:, None] + lm, NEG_INF)
            flat = emit_score.reshape(-1)
            e_scores, e_idx = jax.lax.top_k(flat, e_top)     # [E]
            ek, ew = e_idx // w_t, e_idx % w_t
            e_valid = e_scores > NEG_INF / 2
            tb_prev_row = jnp.where(e_valid, hist[ek], -1)   # [E]
            tb_word_row = jnp.where(
                e_valid, wt[ek, ew].astype(jnp.int32), 0
            )                                                # [E]
            e_words = tb_word_row

            # --- candidate pool: survivors + children + E·R restarts
            ch = child_tab[jnp.clip(nodes, 0, n_nodes - 1)].reshape(-1)
            ch_ok = (ch >= 0) & jnp.repeat(exits > NEG_INF / 2, c_max)
            ch_d = jnp.full((k_cap * c_max, n_s), NEG_INF)
            ch_d = ch_d.at[:, 0].set(
                jnp.where(ch_ok, jnp.repeat(exits, c_max), NEG_INF)
            )
            # restarts: only the r_keep acoustically best roots this frame
            _, root_sel = jax.lax.top_k(frame_scores[root_first_sen], r_keep)
            restart_roots = roots[root_sel]                  # [R_keep]
            re_d = jnp.full((e_top * r_keep, n_s), NEG_INF)
            re_d = re_d.at[:, 0].set(
                jnp.repeat(jnp.where(e_valid, e_scores, NEG_INF), r_keep)
            )
            re_nodes = jnp.where(
                jnp.repeat(e_valid, r_keep),
                jnp.tile(restart_roots, e_top), -1,
            ).astype(jnp.int32)
            re_hist = jnp.repeat(ti * e_top + jnp.arange(e_top), r_keep)
            re_last = jnp.repeat(e_words, r_keep)

            nodes_p = jnp.concatenate([
                nodes,
                jnp.where(ch_ok, ch, -1).astype(jnp.int32),
                re_nodes,
            ])
            deltas_p = jnp.concatenate([deltas, ch_d, re_d])
            hist_p = jnp.concatenate([
                hist, jnp.repeat(hist, c_max), re_hist.astype(jnp.int32),
            ])
            last_p = jnp.concatenate([
                last_word, jnp.repeat(last_word, c_max),
                re_last.astype(jnp.int32),
            ])

            # --- dedup on (node, hist): sort by key (score descending as
            # the tie-break), mask any row equal to its predecessor —
            # O(P log P) sorted-segment masking, no pairwise table
            score_p = deltas_p.max(axis=1)
            p_tot = nodes_p.shape[0]
            live = nodes_p >= 0
            # int32 key space: (n_nodes + 2) * (T*E + 2) must fit in
            # 2^31 — true for any realistic lexicon/utterance (25k nodes
            # x 2k pointers ~ 5e7)
            key = (nodes_p + 1) * (n_ptr + 2) + (hist_p + 1)
            dead_base = jnp.int32((n_nodes + 2) * (n_ptr + 2))
            key = jnp.where(live, key, dead_base + jnp.arange(p_tot))
            order = jnp.lexsort((-score_p, key))
            key_s = key[order]
            score_s = score_p[order]
            is_dup = jnp.concatenate([
                jnp.zeros((1,), bool), key_s[1:] == key_s[:-1]
            ])
            score_s = jnp.where(is_dup, NEG_INF, score_s)

            # --- top-K + beam fraction
            top_scores, top_idx = jax.lax.top_k(score_s, k_cap)
            sel = order[top_idx]
            n_alive = jnp.sum(top_scores > NEG_INF / 2)
            n_keep = jnp.maximum(1, jnp.ceil(n_alive * beam).astype(jnp.int32))
            keep = (jnp.arange(k_cap) < n_keep) & (top_scores > NEG_INF / 2)

            new_nodes = jnp.where(keep, nodes_p[sel], -1).astype(jnp.int32)
            new_deltas = jnp.where(keep[:, None], deltas_p[sel], NEG_INF)
            new_hist = jnp.where(keep, hist_p[sel], -1).astype(jnp.int32)
            new_last = jnp.where(keep, last_p[sel], v).astype(jnp.int32)

            # inactive frames: carry through unchanged
            nodes = jnp.where(active, new_nodes, nodes)
            deltas = jnp.where(active, new_deltas, deltas)
            hist = jnp.where(active, new_hist, hist)
            last_word = jnp.where(active, new_last, last_word)
            tb_prev_row = jnp.where(active, tb_prev_row, -1)

            return (nodes, deltas, hist, last_word), (
                tb_prev_row.astype(jnp.int32),
                tb_word_row.astype(jnp.int32),
            )

        def seed_state(scores_u, seed_t: int):
            # initial seeding: top roots by mean first-senone score
            # over the opening frames (generate_first_word analog)
            seed_n = int(min(r, k_cap))
            root_rank = jnp.mean(
                scores_u[:seed_t][:, root_first_sen], axis=0
            )  # [R]
            _, seed_sel = jax.lax.top_k(root_rank, int(min(r, seed_n)))
            seed_roots = roots[seed_sel]
            nodes0 = jnp.full((k_cap,), -1, jnp.int32)
            nodes0 = nodes0.at[: len(seed_roots)].set(seed_roots)
            deltas0 = jnp.full((k_cap, n_s), NEG_INF)
            deltas0 = deltas0.at[: len(seed_roots), 0].set(0.0)
            hist0 = jnp.full((k_cap,), -1, jnp.int32)
            last0 = jnp.full((k_cap,), v, jnp.int32)
            return (nodes0, deltas0, hist0, last0)

        return one_utt_step, seed_state

    def _build_scan(self, t_pad: int):
        """Build the raw (unjitted) ``run(scores[B,T,S], n_frames[B])``
        scan program."""
        import jax
        import jax.numpy as jnp

        e_top = self.emit_top
        one_utt_step, seed_state = self._build_step(t_pad * e_top)

        def run(scores_b, n_frames_b):
            def one_utt(scores_u, n_frames_u):
                carry0 = seed_state(scores_u, min(10, t_pad))
                tis = jnp.arange(t_pad, dtype=jnp.int32)
                actives = tis < n_frames_u
                return jax.lax.scan(
                    one_utt_step, carry0, (scores_u, tis, actives)
                )

            return jax.vmap(one_utt)(scores_b, n_frames_b)

        return run
