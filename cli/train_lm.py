"""RNN language-model trainer (reference cli/train_lm.py:20-109): trains an
LSTM LM on corpus transcripts, keeps the best-validation checkpoint at
logs/<name>/lm.ckpt for beam-search shallow fusion.
"""

import os

import numpy as np
from absl import app, flags

from edgedict_tpu.config import FLAGS

flags.DEFINE_integer('lm_embed_size', 256, 'LM embedding size')
flags.DEFINE_integer('lm_hidden_size', 512, 'LM hidden size')
flags.DEFINE_integer('lm_layers', 2, 'LM layers')
flags.DEFINE_integer('lm_seq_len', 64, 'LM BPTT length')
flags.DEFINE_bool('lm_tie_weights', False, 'tie embedding/output weights')


def batch_texts(texts, tokenizer, seq_len, batch_size, rng):
    """Token stream → (B, seq_len+1) training batches (next-token LM)."""
    from edgedict_tpu.tokenizer import BOS
    ids = []
    for t in texts:
        ids.extend([BOS] + tokenizer.encode(t))
    ids = np.asarray(ids, np.int32)
    n = (len(ids) - 1) // seq_len
    starts = rng.permutation(n) * seq_len
    for i in range(0, len(starts) - batch_size + 1, batch_size):
        rows = [ids[s:s + seq_len + 1] for s in starts[i:i + batch_size]]
        yield np.stack(rows)


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax
    from edgedict_tpu.checkpoint import save_checkpoint
    from edgedict_tpu.models.lm import LMConfig, lm_init, lm_loss
    from edgedict_tpu.trainer import build_datasets, build_tokenizer

    tokenizer = build_tokenizer(FLAGS)
    train_sets, eval_set = build_datasets(FLAGS, tokenizer)
    assert train_sets, 'no corpora found'
    texts = []
    for d in train_sets:
        texts.extend(d.texts())
    if getattr(tokenizer, 'tokenizer', True) is None or \
            getattr(tokenizer, 'token2id', True) is None:
        tokenizer.build(texts)

    cfg = LMConfig(vocab_size=tokenizer.vocab_size,
                   embed_size=FLAGS.lm_embed_size,
                   hidden_size=FLAGS.lm_hidden_size,
                   num_layers=FLAGS.lm_layers,
                   tie_weights=FLAGS.lm_tie_weights)
    params = lm_init(jax.random.PRNGKey(0), cfg)
    opt = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.adam(FLAGS.lr))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, ys):
        ylen = jnp.full((ys.shape[0],), ys.shape[1], jnp.int32)
        loss, grads = jax.value_and_grad(lm_loss)(params, cfg, ys, ylen)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    logdir = os.path.join(FLAGS.logdir_root, FLAGS.name)
    rng = np.random.RandomState(0)
    best = float('inf')
    it = 0
    for epoch in range(FLAGS.epochs):
        for ys in batch_texts(texts, tokenizer, FLAGS.lm_seq_len,
                              FLAGS.batch_size, rng):
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(ys))
            it += 1
            if it % FLAGS.loss_step == 0:
                ppl = float(np.exp(min(float(loss), 20.0)))
                print(f'epoch {epoch} it {it} loss {float(loss):.4f} '
                      f'ppl {ppl:.1f}')
            if it % FLAGS.save_step == 0 and float(loss) < best:
                best = float(loss)
                save_checkpoint(logdir, it, params,
                                extra={'lm_cfg': cfg.__dict__})
                import shutil
                shutil.copy(os.path.join(logdir, 'models', f'{it}.ckpt'),
                            os.path.join(logdir, 'lm.ckpt'))
    save_checkpoint(logdir, it or 1, params,
                    extra={'lm_cfg': cfg.__dict__})


if __name__ == '__main__':
    app.run(main)
