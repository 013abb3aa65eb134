"""Multi-host distributed training launcher (the reference cli/lightning.py
role — DDP over NCCL, cli/lightning.py:325-337 — collapsed into mesh
sharding).

On TPU pods, run the SAME command on every host:

  python -m cli.distributed --flagfile flagfiles/E6D2.txt \
      [--coordinator_address host:port --num_processes N --process_id i]

`jax.distributed.initialize` wires the hosts together (on Cloud TPU the
three flags are auto-detected from the environment); after that the
ordinary Trainer sees one global device mesh — gradient all-reduce rides
ICI within a slice and DCN across slices, inserted by XLA from the same
sharding annotations that drive single-host runs.  There is no separate
DDP code path to maintain: DataParallel vs DDP vs lightning collapses into
`edgedict_tpu.parallel.make_train_step`.

Each host's DataLoader shards the dataset by process index (the role of
lightning's DistributedSampler).
"""

from absl import app, flags

from edgedict_tpu.config import FLAGS

flags.DEFINE_string('coordinator_address', None,
                    'host:port of process 0 (auto-detected on Cloud TPU)')
flags.DEFINE_integer('num_processes', None, 'total host processes')
flags.DEFINE_integer('process_id', None, 'this host index')


class _ShardedDataset:
    """View of a dataset holding every num_shards-th sample."""

    def __init__(self, dataset, shard, num_shards):
        self.dataset = dataset
        self.idx = list(range(shard, len(dataset), num_shards))
        self.data = [dataset.data[i] for i in self.idx] \
            if hasattr(dataset, 'data') else None
        self.tokenizer = getattr(dataset, 'tokenizer', None)

    def texts(self):
        return self.dataset.texts()

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i):
        return self.dataset[self.idx[i]]


def main(argv):
    del argv
    from edgedict_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import jax
    kwargs = {}
    if FLAGS.coordinator_address:
        kwargs = dict(coordinator_address=FLAGS.coordinator_address,
                      num_processes=FLAGS.num_processes,
                      process_id=FLAGS.process_id)
    jax.distributed.initialize(**kwargs)
    print(f'process {jax.process_index()}/{jax.process_count()} — '
          f'{jax.local_device_count()} local / {jax.device_count()} '
          f'global devices')

    from edgedict_tpu.trainer import Trainer, build_datasets, \
        build_tokenizer
    tokenizer = build_tokenizer(FLAGS)
    train_sets, eval_set = build_datasets(FLAGS, tokenizer)
    train_sets = [_ShardedDataset(d, jax.process_index(),
                                  jax.process_count())
                  for d in train_sets]
    # every process must participate in the (global-mesh) eval computation;
    # each evaluates its shard of the eval set
    if eval_set is not None:
        eval_set = _ShardedDataset(eval_set, jax.process_index(),
                                   jax.process_count())
    trainer = Trainer(FLAGS, train_datasets=train_sets,
                      eval_dataset=eval_set)
    if FLAGS.mode == 'resume':
        print(f'resumed from step {trainer.load(FLAGS.resume_step)}')
    trainer.train()


if __name__ == '__main__':
    app.run(main)
