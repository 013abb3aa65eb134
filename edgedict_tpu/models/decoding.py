"""Transducer decoding: batched frame-synchronous greedy decode.

TPU-native rebuild of the reference `Transducer.greedy_decode`
(/root/reference/rnnt/models.py:243-269): per encoder frame, joint + argmax;
rows that predicted non-blank advance the prediction network (max one
emission per frame).  The reference's Python loop with boolean-mask state
mutation becomes a `lax.scan` with `jnp.where` state gating — identical
greedy semantics, fully jittable, O(T) with static shapes.

Emitted sequences keep blanks in place (one slot per frame), exactly like the
reference; `truncate_and_strip` post-processes on the host.
"""



import jax
import jax.numpy as jnp
import numpy as np

from edgedict_tpu.models import transducer as T


def transducer_greedy_decode(params, cfg, xs, xlen):
    """Batched greedy decode.

    Args:
      params: transducer params pytree.
      cfg: TransducerConfig.
      xs: (B, T, input_size) features.
      xlen: (B,) valid feature frames.
    Returns:
      y_seq: (B, T') int32 — argmax per encoder frame (blank included).
      out_len: (B,) valid encoder frames (xlen rescaled by time reduction).
      neg_logp: (B,) negative sum of per-frame max log-probs.
    """
    h_enc, _ = T.encoder_apply(params['encoder'], cfg, xs)
    out_len = T.scale_length(cfg, xlen, xs.shape[1], h_enc.shape[1])
    y_seq, neg_logp = greedy_decode_from_encoder(params, cfg, h_enc)
    return y_seq, out_len, neg_logp


def greedy_decode_from_encoder(params, cfg, h_enc):
    """Greedy decode given encoder output (B, T', E).

    On TPU the frame loop runs as ONE Pallas kernel walking T' in
    VMEM-sized slabs (ops/decode_pallas.py — every weight the loop
    touches stays VMEM-resident); the lax.scan below is the exact-math
    fallback and oracle.

    Like the streaming frame loop (stream.py), the token loop runs at the
    wider of the encoder-output and joint dtypes: under the bf16 serving
    policy the joint/prediction net stay fp32, bf16 encoder frames are
    upcast (exact), and argmax/log-softmax see fp32 logits."""
    from edgedict_tpu.ops import decode_pallas
    h_enc = h_enc.astype(jnp.promote_types(
        h_enc.dtype, params['joint']['w_enc'].dtype))
    fused = decode_pallas.maybe_greedy_decode(params, cfg, h_enc)
    if fused is not None:
        return fused
    B = h_enc.shape[0]
    # prime the prediction net with BOS (reference rnnt/models.py:247 decodes
    # an empty token sequence, which prepends BOS)
    empty = jnp.zeros((B, 0), jnp.int32)
    h_dec0, state0 = T.decoder_apply(params['decoder'], cfg, empty)

    def step(carry, h_enc_t):
        h_dec, state = carry                       # (B, D), ((L,B,H),(L,B,H))
        logits = T.joint_apply(params['joint'], h_enc_t, h_dec)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        pred = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        prob = jnp.max(logp, axis=-1)
        h_dec_new, state_new = T.decoder_apply(
            params['decoder'], cfg, pred[:, None], state)
        adv = pred != cfg.blank                    # (B,)
        h_dec = jnp.where(adv[:, None], h_dec_new[:, 0], h_dec)
        state = jax.tree.map(
            lambda new, old: jnp.where(adv[None, :, None], new, old),
            state_new, state)
        return (h_dec, state), (pred, prob)

    _, (y_seq, probs) = jax.lax.scan(
        step, (h_dec0[:, 0], state0), jnp.swapaxes(h_enc, 0, 1))
    y_seq = jnp.swapaxes(y_seq, 0, 1)              # (B, T')
    neg_logp = -jnp.sum(jnp.swapaxes(probs, 0, 1), axis=1)
    return y_seq, neg_logp


def truncate_and_strip(y_seq, out_len, blank=0):
    """Host-side: per sample, keep frames < out_len and drop blanks.
    Returns a list of 1-D numpy arrays (token ids), matching the reference's
    y_seq_truncated contract (rnnt/models.py:265-268 + tokenizer decode)."""
    y_seq = np.asarray(y_seq)
    out_len = np.asarray(out_len)
    outs = []
    for seq, n in zip(y_seq, out_len):
        seq = seq[:int(n)]
        outs.append(seq[seq != blank])
    return outs


def ctc_greedy_decode_postprocess(y_seq, logprob, xlen, blank=0):
    """Host-side CTC collapse: dedup consecutive, drop blanks
    (reference CTCEncoder.greedy_decode, rnnt/models.py:294-310)."""
    y_seq = np.asarray(y_seq)
    logprob = np.asarray(logprob)
    xlen = np.asarray(xlen)
    seqs, neg_logp = [], []
    for seq, lp, n in zip(y_seq, logprob, xlen):
        seq, lp = seq[:int(n)], lp[:int(n)]
        unique = np.ones(len(seq), dtype=bool)
        unique[1:] = seq[1:] != seq[:-1]
        mask = unique & (seq != blank)
        seqs.append(seq[mask])
        neg_logp.append(-lp[mask].sum())
    return seqs, np.asarray(neg_logp)
