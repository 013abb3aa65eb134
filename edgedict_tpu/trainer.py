"""Training orchestration: the reference Trainer rebuilt around one sharded
jitted train step.

Reference skeleton (cli/baseline.py:35-351): build transform → tokenizer →
merged datasets → model → optimizer → plateau scheduler → [apex/
DataParallel] → infinite step loop with linear warmup, grad-accumulated
train_step, periodic eval (greedy WER), step-numbered checkpoints,
TensorBoard scalars.  Here the bracketed parallelism/precision machinery
disappears into `edgedict_tpu.parallel.make_train_step` (mesh + bf16), and
featurization runs on-device inside the train step (raw audio batches cross
the host→device boundary, not fp32 features).
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from edgedict_tpu import optim
from edgedict_tpu.checkpoint import (
    checkpoint_path, latest_step, load_checkpoint, prune_checkpoints,
    save_checkpoint, wait_for_checkpoints,
    snapshot_flags)
from edgedict_tpu.data import (
    BucketSpec, CommonVoice, DataLoader, Librispeech, MergedDataset,
    TEDLIUM, YoutubeCaption)
from edgedict_tpu.features import FeatureConfig, FeaturePipeline
from edgedict_tpu.metrics import wer as wer_fn
from edgedict_tpu.models import transducer as T
from edgedict_tpu.models.decoding import truncate_and_strip
from edgedict_tpu.parallel import (
    batch_sharding, make_eval_step, make_mesh, make_train_state,
    make_train_step, shard_batch)
from edgedict_tpu.tokenizer import CharTokenizer, HuggingFaceTokenizer


def build_tokenizer(FLAGS):
    """Tokenizer per flags; cache layout matches the reference
    (cli/baseline.py:52-56: char → logs/char cache, bpe → BPE-<size>)."""
    if FLAGS.tokenizer == 'bpe':
        return HuggingFaceTokenizer(
            cache_dir='BPE-%d' % FLAGS.bpe_size, vocab_size=FLAGS.bpe_size)
    tok = CharTokenizer(cache_dir=os.path.join(FLAGS.logdir_root, 'char'))
    try:
        tok.load()
    except FileNotFoundError:
        pass
    return tok


def build_datasets(FLAGS, tokenizer):
    """Train/eval datasets from the flag-registered corpus roots; corpora
    whose root is missing are skipped with a notice (the reference
    hard-required all eight, cli/baseline.py:59-109)."""
    kwargs = dict(audio_max_length=FLAGS.audio_max_length,
                  cache_audio=getattr(FLAGS, 'cache_audio', False))
    train = []
    for root in (FLAGS.LibriSpeech_train_500, FLAGS.LibriSpeech_train_360,
                 FLAGS.LibriSpeech_train_100):
        if os.path.isdir(root):
            train.append(Librispeech(root, tokenizer, **kwargs))
    if os.path.isdir(os.path.join(FLAGS.TEDLIUM_train, 'wav')):
        train.append(TEDLIUM(FLAGS.TEDLIUM_train, tokenizer, **kwargs))
    if os.path.isfile(os.path.join(FLAGS.CommonVoice, 'train.tsv')):
        train.append(CommonVoice(FLAGS.CommonVoice, 'train.tsv', tokenizer,
                                 **kwargs))
    for root, csv_name in ((FLAGS.YT_bloomberg2, 'bloomberg2_meta.csv'),
                           (FLAGS.YT_life, 'life_meta.csv')):
        if os.path.isfile(os.path.join(root, csv_name)):
            train.append(YoutubeCaption(root, csv_name, tokenizer, **kwargs))
    eval_ds = None
    if os.path.isdir(FLAGS.LibriSpeech_test):
        eval_ds = Librispeech(FLAGS.LibriSpeech_test, tokenizer,
                              audio_max_length=999)
    return train, eval_ds


def pick_accum_steps(batch_size, sub_batch_size, dp_local=1, pp=1):
    """Gradient-accumulation steps honoring sub_batch_size as a micro-batch
    UPPER BOUND (the reference's ragged sub-batch loop, cli/baseline.py:
    214-237, accepted non-divisors like E6D2_LARGE_Batch's 128/7; the
    static-shape scan needs equal micro-batches, so we take the largest
    divisor micro-batch ≤ sub_batch_size that splits across dp).

    With pp>1 the accumulation microbatches stream through the pipeline
    stages, so an accum count that is a multiple of pp is preferred (it
    keeps the post-pipeline joint/loss resharding over ('pp','dp')
    engaged); if no such divisor exists, fall back to the plain rule."""
    def search(extra):
        for accum in range(1, batch_size + 1):
            if batch_size % accum or not extra(accum):
                continue
            micro = batch_size // accum
            if micro <= sub_batch_size and micro % dp_local == 0:
                return accum
        return None

    if pp > 1:
        found = search(lambda a: a % pp == 0)
        if found is not None:
            return found
    found = search(lambda a: True)
    if found is not None:
        return found
    raise ValueError(
        f'no micro-batch ≤ sub_batch_size={sub_batch_size} divides '
        f'batch_size={batch_size} and the per-host dp size {dp_local}')


class _IndexBatches:
    """device_corpus-mode loader: yields {'idx': (B,) int32} batches in
    EXACTLY the order the wrapped DataLoader would have yielded host
    batches (same shuffle/pool/epoch logic), so resume replay and the
    checkpointed epoch counter behave identically."""

    def __init__(self, loader):
        self._l = loader

    def __len__(self):
        return len(self._l)

    @property
    def epoch(self):
        return self._l.epoch

    @epoch.setter
    def epoch(self, v):
        self._l.epoch = v

    def __iter__(self):
        batches = self._l._batches_indices()
        self._l.epoch += 1
        for idxs in batches:
            yield {'idx': np.asarray(idxs, np.int32)}


class Trainer:
    def __init__(self, FLAGS, train_datasets=None, eval_dataset=None,
                 mesh=None):
        self.FLAGS = FLAGS
        self.logdir = os.path.join(FLAGS.logdir_root, FLAGS.name)
        os.makedirs(self.logdir, exist_ok=True)

        self.tokenizer = build_tokenizer(FLAGS)
        if train_datasets is None:
            train_datasets, eval_dataset = build_datasets(
                FLAGS, self.tokenizer)
        self.train_dataset = MergedDataset(train_datasets)
        self.eval_dataset = eval_dataset
        if getattr(self.tokenizer, 'token2id', True) is None or \
                getattr(self.tokenizer, 'tokenizer', True) is None:
            self.tokenizer.build(self.train_dataset.texts())

        self.mesh = mesh if mesh is not None else make_mesh(
            dp=FLAGS.dp_size, tp=FLAGS.tp_size,
            pp=getattr(FLAGS, 'pp_size', 1))
        # per-host batches must split across this host's share of 'dp'
        dp_local = max(1, self.mesh.shape['dp'] // jax.process_count())
        self.accum_steps = pick_accum_steps(
            FLAGS.batch_size, FLAGS.sub_batch_size, dp_local,
            pp=self.mesh.shape.get('pp', 1))
        assert FLAGS.eval_batch_size % dp_local == 0, (
            f'eval_batch_size ({FLAGS.eval_batch_size}) must be divisible '
            f'by the per-host data-parallel size ({dp_local})')
        self.optimizer = optim.build_optimizer(
            FLAGS.optim, lr=FLAGS.lr, gradclip=FLAGS.gradclip)
        self._build_model_and_steps()

        self.sched = optim.ReduceLROnPlateau(
            base_lr=FLAGS.lr, factor=FLAGS.sched_factor,
            patience=FLAGS.sched_patience, min_lr=FLAGS.sched_min_lr) \
            if FLAGS.sched else None

        hop = FLAGS.hop_length * max(1, FLAGS.downsample)
        self.bucket = BucketSpec(
            t_multiple=FLAGS.audio_bucket_frames * hop,
            u_multiple=FLAGS.label_bucket,
            t_max=int(FLAGS.audio_max_length * 16000 + hop),
        )
        # torch convention: num_workers=0 = load in the main process
        # (serial decode, debuggable); absent/None = auto thread pool
        nw = getattr(FLAGS, 'num_workers', None)
        self.loader = DataLoader(
            self.train_dataset, FLAGS.batch_size, shuffle=True,
            bucket=self.bucket, drop_last=True,
            workers=None if nw is None else max(1, nw))
        self.eval_loader = DataLoader(
            self.eval_dataset, FLAGS.eval_batch_size, shuffle=False,
            bucket=self.bucket, drop_last=True,
            prefetch=0) if self.eval_dataset is not None else None

        self._device_corpus = None
        if getattr(FLAGS, 'device_corpus', False):
            self._build_device_corpus()

        self.writer = None
        if jax.process_index() == 0:     # one host owns logging artifacts
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(self.logdir)
            except Exception:
                pass
            snapshot_flags(FLAGS, self.logdir)
        self._rng = jax.random.PRNGKey(1234)
        self._skip_batches = 0
        self._best_wer = float('inf')
        # host-side mirror of state.step: reading int(self.state.step)
        # every iteration would block on the previous step's completion
        # and defeat async dispatch pipelining (≈26 ms/step bubble on a
        # tunneled link); the device value is only fetched at
        # load/save boundaries
        self._host_step = int(self.state.step)

    # ------------------------------------------------------------------
    def _build_model_and_steps(self):
        """Default: on-device log-mel featurization + Transducer.
        Overridden by RawTrainer (trainable conv FrontEnd)."""
        FLAGS = self.FLAGS
        self.feature_cfg = FeatureConfig.from_flags(FLAGS)
        self.pipeline = FeaturePipeline(self.feature_cfg)
        self.cfg = T.TransducerConfig.from_flags(
            FLAGS, vocab_size=self.tokenizer.vocab_size,
            input_size=self.feature_cfg.input_size)
        self.state = make_train_state(
            jax.random.PRNGKey(0), self.cfg, self.optimizer, self.mesh)
        if self.mesh.shape.get('pp', 1) > 1:
            from edgedict_tpu.parallel import make_train_step_pp
            # accum microbatches double as pipeline microbatches
            self.train_step = make_train_step_pp(
                self.cfg, self.optimizer, self.mesh, bf16=FLAGS.bf16,
                feature_pipeline=self.pipeline)
        else:
            self.train_step = make_train_step(
                self.cfg, self.optimizer, self.mesh, bf16=FLAGS.bf16,
                feature_pipeline=self.pipeline)
        self.eval_step = make_eval_step(
            self.cfg, self.mesh, feature_pipeline=self.pipeline)
        self.beam_eval_step = None
        if getattr(FLAGS, 'eval_beam_width', 0) > 0:
            from edgedict_tpu.parallel import make_beam_eval_step
            self.beam_eval_step = make_beam_eval_step(
                self.cfg, FLAGS.eval_beam_width, self.mesh,
                feature_pipeline=self.pipeline)
        self.last_beam_wer = None

    # ------------------------------------------------------------------
    def _build_device_corpus(self):
        """Device-resident corpus (--device_corpus): every training
        sample padded to one global (L_max, U_max) and placed in HBM
        ONCE; the step loop then ships only (accum, micro) int32 index
        arrays and a jitted gather assembles each batch ON DEVICE.  The
        TPU-native end of the data-feeding story: per-step host→device
        traffic is a few hundred bytes, so the end-to-end loop runs at
        device rate on any host (the decoded-PCM cache already removed
        decode work; this removes the audio H2D — ~29 MB/step at B=64 ×
        14 s — entirely).  Costs: audio bytes = 2·seconds·16000 of HBM
        (e.g. 0.23 GB for 512 × 14 s; LibriSpeech-100 ≈ 11.5 GB — at the
        edge of one v5e), and global padding instead of per-batch length
        bucketing, so it suits length-filtered/uniform corpora and
        epoch ≥ 1 reuse.  Single-host (the index loader replays the SAME
        shuffle order as the host-batch path, so resume determinism is
        unchanged)."""
        assert jax.process_count() == 1, \
            '--device_corpus is single-host (shard corpora over dp hosts '\
            'with the regular loader instead)'
        from jax.sharding import NamedSharding, PartitionSpec as P

        ds = self.train_dataset
        n = len(ds)
        items = None
        pool = getattr(self.loader, '_fetcher', None)
        if pool is not None:
            p, fetch = self.loader._fetcher()
            items = fetch(list(range(n)))
            if p is not None:
                p.shutdown(wait=False)
        else:
            items = [ds[i] for i in range(n)]
        l_max = self.bucket.round_t(max(len(a) for a, _ in items))
        u_max = self.bucket.round_u(max(len(t) for _, t in items))
        a_dtype = np.int16 if items[0][0].dtype == np.int16 else np.float32
        audio = np.zeros((n, l_max), a_dtype)
        alen = np.zeros((n,), np.int32)
        # PAD-fill like seq_collate (data/collate.py): loss is ylen-masked
        # either way, but the device batches must match the host loader's
        # byte-for-byte so the two paths stay interchangeable
        from edgedict_tpu.tokenizer import PAD
        ys = np.full((n, u_max), PAD, np.int32)
        ylen = np.zeros((n,), np.int32)
        for i, (a, t) in enumerate(items):
            audio[i, :len(a)] = a
            alen[i] = len(a)
            ys[i, :len(t)] = t
            ylen[i] = len(t)
        gb = audio.nbytes / 1e9
        print(f'device_corpus: {n} utts padded to L={l_max} U={u_max} '
              f'({gb:.2f} GB audio on device)')
        rep = NamedSharding(self.mesh, P())
        self._device_corpus = {
            'audio': jax.device_put(audio, rep),
            'alen': jax.device_put(alen, rep),
            'ys': jax.device_put(ys, rep),
            'ylen': jax.device_put(ylen, rep),
        }
        self._gather = jax.jit(
            lambda corpus, idx: {k: v[idx] for k, v in corpus.items()},
            out_shardings=batch_sharding(self.mesh))
        self._idx_sharding = batch_sharding(self.mesh)
        self.loader = _IndexBatches(self.loader)

    def _lr(self, step):
        lr = self.FLAGS.lr * float(optim.warmup_scale(
            step, self.FLAGS.warmup_step))
        if self.sched is not None:
            lr = max(lr * self.sched.state.scale,
                     self.FLAGS.sched_min_lr)
        return lr

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def run_step(self, batch):
        """One optimizer step on a host batch dict (audio/alen/ys/ylen),
        or — device_corpus mode — an index batch {'idx': (B,) int32}
        gathered on device."""
        if self._device_corpus is not None and 'idx' in batch:
            idx = np.asarray(batch['idx']).reshape(self.accum_steps, -1)
            sharded = self._gather(
                self._device_corpus,
                jax.device_put(idx, self._idx_sharding))
        else:
            sharded = shard_batch(self.mesh, batch, self.accum_steps)
        self.state, metrics = self.train_step(
            self.state, sharded, self._next_rng(),
            jnp.asarray(self._lr(self._host_step), jnp.float32))
        self._host_step += 1
        return metrics

    def train(self, total_steps=None, log_fn=print):
        F = self.FLAGS
        total = total_steps or F.epochs * max(len(self.loader), 1)
        step = self._host_step
        t0 = time.time()
        profile_dir = getattr(F, 'profile_dir', None)
        while step < total:
            for batch in self.loader:
                if self._skip_batches:
                    self._skip_batches -= 1     # resume: fast-forward to
                    continue                    # the checkpointed position
                # jax.profiler trace of steps 10-13 (SURVEY §5 tracing)
                if profile_dir and step == 10:
                    jax.profiler.start_trace(profile_dir)
                metrics = self.run_step(batch)
                step = self._host_step
                if profile_dir and step == 13:
                    jax.profiler.stop_trace()
                    profile_dir = None
                if step % F.loss_step == 0:
                    loss = float(metrics['loss'])
                    if self.writer:
                        self.writer.add_scalar('train_loss', loss, step)
                        self.writer.add_scalar('lr', self._lr(step), step)
                    log_fn(f'step {step}/{total} loss {loss:.4f} '
                           f'lr {self._lr(step):.2e} '
                           f'({time.time() - t0:.1f}s)')
                if step % F.save_step == 0:
                    # periodic saves: device->host fetch is synchronous,
                    # serialization + disk write happen on the writer
                    # thread so the step loop keeps the chip busy
                    self.save(background=True)
                    if getattr(F, 'keep_checkpoints', 0):
                        prune_checkpoints(self.logdir, F.keep_checkpoints)
                if step % F.eval_step == 0 and self.eval_loader:
                    val_loss, val_wer = self.evaluate()
                    if self.sched is not None:
                        self.sched.step(val_loss)
                    if self.writer:
                        self.writer.add_scalar('val_loss', val_loss, step)
                        self.writer.add_scalar('WER', val_wer, step)
                    beam = (f' beam_WER {self.last_beam_wer:.4f}'
                            if self.last_beam_wer is not None else '')
                    log_fn(f'eval @ {step}: loss {val_loss:.4f} '
                           f'WER {val_wer:.4f}{beam}')
                    if val_wer < self._best_wer:
                        # best-WER checkpoint (the lightning policy,
                        # cli/lightning.py:147-159)
                        self._best_wer = val_wer
                        path = self.save()
                        if jax.process_index() == 0:
                            import shutil
                            shutil.copy(path, os.path.join(self.logdir,
                                                           'best.ckpt'))
                if step >= total:
                    break
        self.save()
        wait_for_checkpoints()

    # ------------------------------------------------------------------
    def evaluate(self, max_batches=None):
        losses, refs, hyps, beam_hyps = [], [], [], []
        for i, batch in enumerate(self.eval_loader):
            if max_batches is not None and i >= max_batches:
                break
            from edgedict_tpu.parallel import put_sharded
            dev = {k: put_sharded(
                np.asarray(v),
                batch_sharding(self.mesh, with_accum_axis=False))
                for k, v in batch.items()}
            loss, y_seq, out_len = self.eval_step(self.state.params, dev)
            losses.append(float(loss))
            seqs = truncate_and_strip(y_seq, out_len, blank=self.cfg.blank)
            hyps.extend(self.tokenizer.decode_plus(seqs))
            refs.extend(self.tokenizer.decode_plus(
                [y[:n] for y, n in zip(np.asarray(batch['ys']),
                                       np.asarray(batch['ylen']))]))
            if self.beam_eval_step is not None:
                toks, n_tok = self.beam_eval_step(self.state.params, dev)
                beam_hyps.extend(self.tokenizer.decode_plus(
                    [t[:n] for t, n in zip(np.asarray(toks),
                                           np.asarray(n_tok))]))
        pairs = [(r, h) for r, h in zip(refs, hyps) if r.strip()]
        val_wer = wer_fn([r for r, _ in pairs], [h for _, h in pairs]) \
            if pairs else 1.0
        self.last_beam_wer = None
        if beam_hyps:
            bpairs = [(r, h) for r, h in zip(refs, beam_hyps)
                      if r.strip()]
            if bpairs:
                self.last_beam_wer = wer_fn([r for r, _ in bpairs],
                                            [h for _, h in bpairs])
                if self.writer:
                    self.writer.add_scalar('beam_WER', self.last_beam_wer,
                                           int(self.state.step))
        if self.writer and pairs:
            sample = '\n\n'.join(f'REF: {r}\nHYP: {h}'
                                 for r, h in pairs[:self.FLAGS.sample_size])
            self.writer.add_text('samples', sample, int(self.state.step))
        return float(np.mean(losses) if losses else np.nan), val_wer

    def sanity_check(self):
        """One eval batch through the eval step (reference
        cli/baseline.py:319-323)."""
        if not self.eval_loader:
            return None
        return self.evaluate(max_batches=1)

    # ------------------------------------------------------------------
    def save(self, background=False):
        step = int(self.state.step)
        if jax.process_count() > 1 and jax.process_index() != 0:
            # params are replicated — process 0 writes for everyone
            return checkpoint_path(self.logdir, step)
        return save_checkpoint(
            self.logdir, step, self.state.params, self.state.opt_state,
            self.sched.state_dict() if self.sched else None,
            extra={'rng': np.asarray(self._rng).tolist(),
                   'best_wer': self._best_wer},
            background=background)

    def load(self, step=None):
        wait_for_checkpoints()        # in-session resume sees durable files
        step = step if step is not None else latest_step(self.logdir)
        if step is None:
            raise FileNotFoundError(f'no checkpoints under {self.logdir}')
        payload = load_checkpoint(
            checkpoint_path(self.logdir, step), self.state.params,
            self.state.opt_state)
        from edgedict_tpu.parallel import param_sharding
        shardings = param_sharding(payload['model'], self.mesh)
        params = jax.tree.map(jax.device_put, payload['model'], shardings)
        opt_state = (jax.tree.map(jnp.asarray, payload['optim'])
                     if payload['optim'] is not None
                     else self.optimizer.init(params))   # model-only ckpt
        self.state = self.state._replace(
            step=jnp.asarray(payload['step'], jnp.int32), params=params,
            opt_state=opt_state)
        if self.sched is not None and payload['sched'] is not None:
            self.sched.load_state_dict(payload['sched'])
        extra = payload.get('extra') or {}
        if 'rng' in extra:
            self._rng = jnp.asarray(extra['rng'], jnp.uint32)
        if 'best_wer' in extra and extra['best_wer'] is not None:
            self._best_wer = float(extra['best_wer'])
        self._host_step = step
        # realign the data stream so a resumed run replays the SAME batch
        # sequence an uninterrupted run would have seen: restore the
        # epoch counter (per-epoch shuffle seed) and skip the batches the
        # checkpointed run already consumed within its current epoch
        n = max(len(self.loader), 1)
        self.loader.epoch = step // n
        self._skip_batches = step % n
        return step
