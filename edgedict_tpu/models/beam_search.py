"""Transducer beam search — fixed-shape, jit-compatible, batched.

Replaces the reference's object-soup Graves beam search (models.py:121-202:
Python `Sequence` hypothesis lists, dict-keyed prefix merging, data-dependent
while loops) with a TPU-native design: a static (B, W) beam advanced by
`lax.scan` over encoder frames, with at most `max_sym_per_frame` label
expansions per frame and `lax.top_k` pruning.  All hypothesis state lives in
fixed-shape tensors (tokens, lengths, log-probs, prediction-net state), so
the whole search compiles once.

Scoring follows Graves: a hypothesis is a label PREFIX whose score is the
probability-sum over every alignment of that prefix surviving in the beam
— identical prefixes are logsumexp-merged at every pool operation
(expansion and blank/prune), BEFORE pruning, so alignment mass
accumulates instead of competing for beam slots.  Max-single-alignment
scoring (merge_prefixes=False) is catastrophically deletion-biased on
smooth-posterior models: the all-blank path concentrates its probability
in one alignment while each token-ful prefix spreads its mass over many,
so token-ful prefixes get pruned (measured on a synthetic confusable
corpus: W=4 beam 44% WER vs greedy 11%; prefix-merged beam beats greedy).
Remaining approximation vs exact Graves: bounded label expansions per
frame (max_sym_per_frame) instead of unbounded.

Optional LM shallow fusion: pass an (lm_params, LMConfig, weight) triple;
per-hypothesis LM state is threaded alongside the prediction-net state and
label expansions are rescored with `weight * log P_lm(v | prefix)`
(the reference applied its LM in the legacy beam search rescoring path).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from edgedict_tpu.models import transducer as T
from edgedict_tpu.models.lm import lm_apply, lm_zero_state
from edgedict_tpu.tokenizer import BOS

NEG = -1e30


class BeamState(NamedTuple):
    tokens: jnp.ndarray      # (B, W, U_cap) int32
    n_tok: jnp.ndarray       # (B, W) int32
    logp: jnp.ndarray        # (B, W) f32
    dec_out: jnp.ndarray     # (B, W, D)
    dec_state: tuple         # (h, c) each (L, B, W, H)
    lm_state: Optional[tuple]      # (h, c) each (L, B, W, Hlm) or None
    lm_next: Optional[jnp.ndarray]  # (B, W, V) fused next-token log-probs


def _gather_beam(state: BeamState, idx):
    """Select hypotheses: idx (B, W') indexes the W axis."""
    def g2(x):                       # (B, W, ...) → (B, W', ...)
        return jnp.take_along_axis(
            x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)

    def gstate(s):                   # (L, B, W, H)
        return jnp.take_along_axis(s, idx[None, :, :, None], axis=2)

    return BeamState(
        tokens=g2(state.tokens), n_tok=g2(state.n_tok), logp=g2(state.logp),
        dec_out=g2(state.dec_out),
        dec_state=jax.tree.map(gstate, state.dec_state),
        lm_state=(jax.tree.map(gstate, state.lm_state)
                  if state.lm_state is not None else None),
        lm_next=g2(state.lm_next) if state.lm_next is not None else None)


def _concat_beams(a: BeamState, b: BeamState):
    """Concatenate two pools along the W axis (axis 1 for (B, W, ...)
    tensors, axis 2 for (L, B, W, H) network states)."""
    c1 = lambda x, y: jnp.concatenate([x, y], axis=1)
    c2 = lambda x, y: jnp.concatenate([x, y], axis=2)
    return BeamState(
        tokens=c1(a.tokens, b.tokens), n_tok=c1(a.n_tok, b.n_tok),
        logp=c1(a.logp, b.logp), dec_out=c1(a.dec_out, b.dec_out),
        dec_state=jax.tree.map(c2, a.dec_state, b.dec_state),
        lm_state=(jax.tree.map(c2, a.lm_state, b.lm_state)
                  if a.lm_state is not None else None),
        lm_next=(c1(a.lm_next, b.lm_next)
                 if a.lm_next is not None else None))


def _merge_top_w(a: BeamState, b: BeamState, w, merge=False):
    """Top-w of the concatenated pools along the W axis.  With merge=True,
    identical prefixes in the 2w pool are probability-summed BEFORE the
    prune — merging after pruning loses alignment mass that individually
    falls below the cut but jointly belongs in the beam."""
    cat = _concat_beams(a, b)
    if merge:
        cat = merge_duplicate_prefixes(cat)
    logp, idx = jax.lax.top_k(cat.logp, w)
    out = _gather_beam(cat, idx)
    return out._replace(logp=logp)


def merge_duplicate_prefixes(beam: BeamState):
    """Graves prefix-probability merging: hypotheses with IDENTICAL label
    prefixes (reached via different alignments) are merged by summing their
    probabilities into the lowest-index copy; the duplicates drop to −inf
    (the reference's log_aplusb path, models.py:121-222, as fixed-shape
    tensor algebra)."""
    tokens, n_tok, logp = beam.tokens, beam.n_tok, beam.logp
    B, W, U = tokens.shape
    # only compare the valid prefix region
    pos = jnp.arange(U)[None, None, :]
    valid = pos < n_tok[..., None]
    tok_masked = jnp.where(valid, tokens, -1)
    same_len = n_tok[:, :, None] == n_tok[:, None, :]            # (B,W,W)
    same_tok = jnp.all(tok_masked[:, :, None, :]
                       == tok_masked[:, None, :, :], axis=-1)
    eq = same_len & same_tok
    live = logp > NEG / 2
    eq = eq & live[:, :, None] & live[:, None, :]
    # canonical representative = lowest index in each equivalence class
    i_ids = jnp.arange(W)[None, :, None]
    canon = jnp.min(jnp.where(eq, i_ids, W), axis=1)             # (B, W)
    contrib = canon[:, None, :] == jnp.arange(W)[None, :, None]  # (B,W,W)
    merged = jax.scipy.special.logsumexp(
        jnp.where(contrib, logp[:, None, :], NEG), axis=2)
    is_canon = canon == jnp.arange(W)[None, :]
    new_logp = jnp.where(is_canon & live, merged, NEG)
    return beam._replace(logp=new_logp)


def make_beam_machinery(params, cfg, batch, beam_width=8,
                        max_sym_per_frame=3, max_tokens=200, lm=None,
                        merge_prefixes=True):
    """Build (init_beam_fn, frame_step) for a (batch, beam_width) search.
    Shared by offline `beam_search_from_encoder` and the streaming beam
    decoder (which carries the BeamState across chunks)."""
    B = batch
    W = beam_width
    V = cfg.vocab_size
    blank = cfg.blank
    u_cap = max_tokens

    # init: single live hypothesis (others at -inf)
    empty = jnp.zeros((B, 0), jnp.int32)
    h_dec0, dstate0 = T.decoder_apply(params['decoder'], cfg, empty)

    def tile_w(x):                    # (B, ...) → (B, W, ...)
        return jnp.broadcast_to(x[:, None], (B, W) + x.shape[1:])

    def tile_state(s):                # (L, B, H) → (L, B, W, H)
        return jnp.broadcast_to(s[:, :, None], s.shape[:2] + (W,)
                                + s.shape[2:])

    if lm is not None:
        lm_params, lm_cfg, lm_weight = lm
        lmlp0, lmstate0 = lm_apply(lm_params, lm_cfg,
                                   jnp.full((B, 1), BOS, jnp.int32),
                                   lm_zero_state(lm_cfg, B))
        lm_state0 = jax.tree.map(tile_state, lmstate0)
        lm_next0 = tile_w(lmlp0[:, 0])          # (B, W, V)
    else:
        lm_weight = 0.0
        lm_state0 = None
        lm_next0 = None

    init = BeamState(
        tokens=jnp.zeros((B, W, u_cap), jnp.int32),
        n_tok=jnp.zeros((B, W), jnp.int32),
        logp=jnp.broadcast_to(
            jnp.where(jnp.arange(W) == 0, 0.0, NEG), (B, W)
        ).astype(jnp.float32),
        dec_out=tile_w(h_dec0[:, 0]),
        dec_state=jax.tree.map(tile_state, dstate0),
        lm_state=lm_state0, lm_next=lm_next0)

    def advance(state: BeamState, v):
        """Append token v (B, W) to every hyp and advance the networks."""
        toks = v.reshape(B * W, 1)
        dstate = jax.tree.map(
            lambda s: s.reshape(s.shape[0], B * W, s.shape[-1]),
            state.dec_state)
        d_out, dstate = T.decoder_apply(params['decoder'], cfg, toks, dstate)
        dec_out = d_out[:, 0].reshape(B, W, -1)
        dec_state = jax.tree.map(
            lambda s: s.reshape(s.shape[0], B, W, s.shape[-1]), dstate)
        tokens = jnp.where(
            jax.nn.one_hot(state.n_tok, u_cap, dtype=jnp.bool_),
            v[..., None], state.tokens)
        n_tok = jnp.minimum(state.n_tok + 1, u_cap)
        if state.lm_state is not None:
            lstate = jax.tree.map(
                lambda s: s.reshape(s.shape[0], B * W, s.shape[-1]),
                state.lm_state)
            lmlp, lstate = lm_apply(lm_params, lm_cfg, toks, lstate)
            lm_next = lmlp[:, 0].reshape(B, W, V)
            lm_state = jax.tree.map(
                lambda s: s.reshape(s.shape[0], B, W, s.shape[-1]), lstate)
        else:
            lm_next = None
            lm_state = None
        return state._replace(tokens=tokens, n_tok=n_tok, dec_out=dec_out,
                              dec_state=dec_state, lm_state=lm_state,
                              lm_next=lm_next)

    def beam_joint_logp(h_enc_t, dec_out):
        """Pointwise joint per hypothesis: (B,E) × (B,W,D) → (B,W,V)."""
        enc = jnp.broadcast_to(h_enc_t[:, None, :],
                               (B, W, h_enc_t.shape[-1]))
        logits = T.joint_apply(
            params['joint'], enc.reshape(B * W, -1),
            dec_out.reshape(B * W, -1)).reshape(B, W, V)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def frame_step(beam: BeamState, inp):
        h_enc_t, valid = inp          # (B, E), (B,)

        stay = beam._replace(logp=jnp.full((B, W), NEG))
        active = beam

        for _ in range(max_sym_per_frame):
            lp = beam_joint_logp(h_enc_t, active.dec_out)
            # blank: hypothesis consumes the frame → stay pool
            blank_cand = active._replace(
                logp=active.logp + lp[..., blank])
            stay = _merge_top_w(stay, blank_cand, W, merge=merge_prefixes)
            # labels: expand within the frame
            total = active.logp[..., None] + lp
            if active.lm_next is not None:
                total = total + lm_weight * active.lm_next
            total = total.at[..., blank].set(NEG)
            total = jnp.where((active.n_tok >= u_cap)[..., None], NEG,
                              total)
            flat_logp, flat_idx = jax.lax.top_k(
                total.reshape(B, W * V), W)
            src = flat_idx // V
            v = (flat_idx % V).astype(jnp.int32)
            active = _gather_beam(active, src)._replace(logp=flat_logp)
            active = advance(active, v)
            if merge_prefixes:
                # identical prefixes reached via different in-frame
                # emission orders: sum before the next expansion
                active = merge_duplicate_prefixes(active)

        # expansions that never emitted blank still consume the frame
        lp = beam_joint_logp(h_enc_t, active.dec_out)
        stay = _merge_top_w(
            stay, active._replace(logp=active.logp + lp[..., blank]), W,
            merge=merge_prefixes)

        # frames beyond xlen leave the beam untouched
        g1 = lambda new, old: jnp.where(
            valid.reshape((B,) + (1,) * (new.ndim - 1)), new, old)
        g2 = lambda new, old: jnp.where(
            valid.reshape((1, B) + (1,) * (new.ndim - 2)), new, old)
        new_beam = BeamState(
            tokens=g1(stay.tokens, beam.tokens),
            n_tok=g1(stay.n_tok, beam.n_tok),
            logp=g1(stay.logp, beam.logp),
            dec_out=g1(stay.dec_out, beam.dec_out),
            dec_state=jax.tree.map(g2, stay.dec_state, beam.dec_state),
            lm_state=(jax.tree.map(g2, stay.lm_state, beam.lm_state)
                      if stay.lm_state is not None else None),
            lm_next=(g1(stay.lm_next, beam.lm_next)
                     if stay.lm_next is not None else None))
        return new_beam, None

    def init_beam_fn():
        return init

    return init_beam_fn, frame_step


def best_hypothesis(final: BeamState):
    """(tokens (B, U_cap), n_tok (B,), logp (B,)) of the best beam entry."""
    B = final.logp.shape[0]
    best = jnp.argmax(final.logp, axis=1)             # (B,)
    take = lambda x: jnp.take_along_axis(
        x, best.reshape((B,) + (1,) * (x.ndim - 1)), axis=1)[:, 0]
    return take(final.tokens), take(final.n_tok), take(final.logp)


def beam_search_from_encoder(params, cfg, h_enc, xlen=None, beam_width=8,
                             max_sym_per_frame=3, max_tokens=200,
                             lm=None, merge_prefixes=True):
    """h_enc (B, T', E) → (tokens (B, U_cap), n_tok (B,), logp (B,)).

    lm: optional (lm_params, LMConfig, weight) for shallow fusion.
    merge_prefixes: Graves prefix-probability summation (the default —
    see the module docstring; False = max-single-alignment scoring, used
    by the brute-force alignment-oracle test).
    """
    B, Tn, _ = h_enc.shape
    init_fn, frame_step = make_beam_machinery(
        params, cfg, B, beam_width=beam_width,
        max_sym_per_frame=max_sym_per_frame, max_tokens=max_tokens, lm=lm,
        merge_prefixes=merge_prefixes)
    if xlen is None:
        xlen = jnp.full((B,), Tn, jnp.int32)
    valid = jnp.arange(Tn)[None, :] < xlen[:, None]   # (B, T')
    final, _ = jax.lax.scan(
        frame_step, init_fn(),
        (jnp.swapaxes(h_enc, 0, 1), jnp.swapaxes(valid, 0, 1)))
    return best_hypothesis(final)


def transducer_beam_search(params, cfg, xs, xlen, beam_width=8,
                           max_sym_per_frame=3, max_tokens=200, lm=None):
    """Features (B, T, F) → beam-search decode (the reference
    Transducer.beam_search entry, models.py:121-202)."""
    h_enc, _ = T.encoder_apply(params['encoder'], cfg, xs)
    out_len = T.scale_length(cfg, xlen, xs.shape[1], h_enc.shape[1])
    return beam_search_from_encoder(
        params, cfg, h_enc, out_len, beam_width=beam_width,
        max_sym_per_frame=max_sym_per_frame, max_tokens=max_tokens, lm=lm)
