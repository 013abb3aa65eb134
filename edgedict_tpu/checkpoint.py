"""Checkpoint save/resume with the reference's on-disk contract.

Layout: logs/<name>/models/<step>.ckpt holding {model, optim, sched, step}
(reference cli/baseline.py:287-317 saved {'model','optim','sched','amp'} as
<step>.pt; amp state is obsolete under bf16).  Serialization is flax
msgpack over numpy-ified pytrees — host-portable, mesh-agnostic: on load
the caller re-places arrays onto its own mesh/shardings, which is what makes
the same checkpoint resumable on any chip topology.

Also provides the flag snapshot (logs/<name>/flagfile.txt, reference
cli/baseline.py:175) that glues hyperparameters to checkpoints for stream /
export consumers.
"""

import os
import queue
import re
import threading

import jax
import numpy as np
from flax import serialization


def _to_host(tree, copy=False):
    """Device→host snapshot.  copy=True forces a copy even for arrays
    already on the host (a background write must be isolated from the
    caller mutating its buffers afterwards; np.asarray is zero-copy for
    numpy inputs)."""
    if copy:
        return jax.tree.map(lambda x: np.array(x), tree)
    return jax.tree.map(lambda x: np.asarray(x), tree)


_TMP_SEQ = [0]


def _write_payload(payload, path):
    # unique tmp per write: a background save and a synchronous save of
    # the same step (e.g. periodic save + end-of-training save landing on
    # one step) must not race on a shared tmp name — each writes its own
    # and the atomic replace makes the last completed write win
    _TMP_SEQ[0] += 1
    tmp = f'{path}.tmp.{os.getpid()}.{threading.get_ident()}.{_TMP_SEQ[0]}'
    with open(tmp, 'wb') as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)


def save_checkpoint(logdir, step, params, opt_state=None, sched_state=None,
                    extra=None, background=False):
    """Write logs/<name>/models/<step>.ckpt.  Returns the path.

    background=True: the device→host fetch still happens synchronously
    (the values must be snapshotted before the next train step's donated
    buffers invalidate them), but msgpack serialization + the disk write
    — the slow part for a few-hundred-MB optimizer state — move to a
    single shared writer thread.  Call `wait_for_checkpoints()` before
    reading the file or exiting."""
    models_dir = os.path.join(logdir, 'models')
    os.makedirs(models_dir, exist_ok=True)
    import json as _json
    payload = {
        'step': int(step),
        'model': _to_host(params, copy=background),
        'optim': (_to_host(opt_state, copy=background)
                  if opt_state is not None else None),
        'sched': sched_state,
        # JSON-encoded so the serialized tree structure is shape-stable
        'extra': _json.dumps(extra) if extra is not None else '',
    }
    path = os.path.join(models_dir, f'{int(step)}.ckpt')
    if background:
        _writer().submit(payload, path)
    else:
        _write_payload(payload, path)
    return path


class _CheckpointWriter:
    """One daemon thread draining a queue of (payload, path) writes.
    Exceptions are re-raised on the next submit() or wait() so a failing
    disk never fails silently (SURVEY §5 failure-detection policy)."""

    def __init__(self):
        self._q = queue.Queue()
        self._error = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            payload, path = self._q.get()
            try:
                _write_payload(payload, path)
            except BaseException as e:        # noqa: BLE001
                self._error = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._error is not None:
            e, self._error = self._error, None
            raise RuntimeError('background checkpoint write failed') from e

    def submit(self, payload, path):
        self._check()
        self._q.put((payload, path))

    def wait(self):
        self._q.join()
        self._check()


_WRITER = None
_WRITER_LOCK = threading.Lock()


def _writer():
    global _WRITER
    with _WRITER_LOCK:
        if _WRITER is None:
            _WRITER = _CheckpointWriter()
        return _WRITER


def wait_for_checkpoints():
    """Block until all background checkpoint writes are durable (and
    surface any write error)."""
    if _WRITER is not None:
        _WRITER.wait()


def load_checkpoint(path, params_template, opt_state_template=None):
    """Load a checkpoint into the given pytree templates (shapes/treedef
    come from the templates; values from disk)."""
    with open(path, 'rb') as f:
        data = f.read()
    def attempt(optim_template):
        target = {
            'step': 0,
            'model': _to_host(params_template),
            'optim': optim_template,
            'sched': None,
            'extra': '',
        }
        return serialization.from_bytes(target, data)

    try:
        payload = attempt(_to_host(opt_state_template)
                          if opt_state_template is not None else None)
    except Exception:
        # checkpoint was saved without optimizer state (e.g. an imported
        # reference model) or with a different optimizer — model-only load
        payload = attempt(None)
    import json as _json
    payload['extra'] = (_json.loads(payload['extra'])
                        if payload.get('extra') else None)
    return payload


def prune_checkpoints(logdir, keep):
    """Keep only the newest `keep` step-numbered checkpoints (0/None =
    keep all, the reference behavior).  best.ckpt and flag snapshots are
    untouched.  Call AFTER wait_for_checkpoints() or from the same thread
    that issued the saves — pruning only deletes steps strictly older
    than the `keep` newest, so an in-flight background write of the
    newest step is never its own victim."""
    if not keep:
        return []
    models_dir = os.path.join(logdir, 'models')
    if not os.path.isdir(models_dir):
        return []
    steps = sorted(int(m.group(1)) for fn in os.listdir(models_dir)
                   if (m := re.fullmatch(r'(\d+)\.ckpt', fn)))
    doomed = steps[:-keep] if len(steps) > keep else []
    removed = []
    for step in doomed:
        try:
            os.remove(os.path.join(models_dir, f'{step}.ckpt'))
            removed.append(step)
        except OSError:
            pass
    return removed


def latest_step(logdir):
    """Highest checkpoint step in logs/<name>/models, or None."""
    models_dir = os.path.join(logdir, 'models')
    if not os.path.isdir(models_dir):
        return None
    steps = [int(m.group(1)) for fn in os.listdir(models_dir)
             if (m := re.fullmatch(r'(\d+)\.ckpt', fn))]
    return max(steps) if steps else None


def checkpoint_path(logdir, step):
    return os.path.join(logdir, 'models', f'{int(step)}.ckpt')


def snapshot_flags(FLAGS, logdir):
    """Write the run's exact flags to logs/<name>/flagfile.txt (reference
    cli/baseline.py:175); downstream tools consume this snapshot."""
    os.makedirs(logdir, exist_ok=True)
    path = os.path.join(logdir, 'flagfile.txt')
    FLAGS.append_flags_into_file(path)
    return path
