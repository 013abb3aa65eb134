"""Background (async) checkpoint writer."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from edgedict_tpu.checkpoint import (
    load_checkpoint, save_checkpoint, wait_for_checkpoints)


def _params():
    return {'w': jnp.arange(12.0).reshape(3, 4), 'b': jnp.ones((4,))}


def test_background_save_matches_sync(tmp_path):
    params = _params()
    p_sync = save_checkpoint(str(tmp_path / 'a'), 3, params,
                             extra={'k': 1})
    p_bg = save_checkpoint(str(tmp_path / 'b'), 3, params,
                           extra={'k': 1}, background=True)
    wait_for_checkpoints()
    assert open(p_sync, 'rb').read() == open(p_bg, 'rb').read()
    payload = load_checkpoint(p_bg, params)
    np.testing.assert_allclose(payload['model']['w'],
                               np.asarray(params['w']))
    assert payload['extra'] == {'k': 1}


def test_background_save_snapshot_isolated_from_later_mutation(tmp_path):
    """The device→host snapshot happens at submit time: mutating the
    host-side source arrays afterwards must not corrupt the write."""
    params = {'w': np.zeros((4, 4), np.float32)}
    path = save_checkpoint(str(tmp_path), 1, params, background=True)
    params['w'] += 7.0                      # simulate the next train step
    wait_for_checkpoints()
    payload = load_checkpoint(path, {'w': np.empty((4, 4), np.float32)})
    np.testing.assert_allclose(payload['model']['w'], 0.0)


def test_background_write_error_propagates(tmp_path, monkeypatch):
    import edgedict_tpu.checkpoint as C

    real = C._write_payload

    def boom(payload, path):
        if os.sep + 'x' + os.sep in path:
            raise OSError('disk on fire')
        return real(payload, path)

    monkeypatch.setattr(C, '_write_payload', boom)
    save_checkpoint(str(tmp_path / 'x'), 1, _params(), background=True)
    with pytest.raises(RuntimeError, match='background checkpoint'):
        wait_for_checkpoints()
    # the writer recovers after surfacing the error
    p = save_checkpoint(str(tmp_path / 'y'), 2, _params(),
                        background=True)
    wait_for_checkpoints()
    assert os.path.exists(p)


def test_concurrent_same_step_saves_do_not_race(tmp_path):
    """A background save and an immediate synchronous save of the SAME
    step (periodic save + end-of-training save landing on one step) must
    both succeed — each write uses a unique tmp name, so neither rename
    can steal the other's file."""
    params = _params()
    for i in range(20):
        save_checkpoint(str(tmp_path), 7, params, background=True)
        p = save_checkpoint(str(tmp_path), 7, params)
        assert os.path.exists(p)
    wait_for_checkpoints()
    payload = load_checkpoint(p, params)
    assert payload['step'] == 7


def test_prune_checkpoints_keeps_newest(tmp_path):
    from edgedict_tpu.checkpoint import latest_step, prune_checkpoints
    params = _params()
    for step in (1, 2, 3, 4, 5):
        save_checkpoint(str(tmp_path), step, params)
    open(os.path.join(str(tmp_path), 'models', 'best.ckpt'), 'wb').close()
    removed = prune_checkpoints(str(tmp_path), keep=2)
    assert removed == [1, 2, 3]
    left = sorted(os.listdir(os.path.join(str(tmp_path), 'models')))
    assert left == ['4.ckpt', '5.ckpt', 'best.ckpt']
    assert latest_step(str(tmp_path)) == 5
    assert prune_checkpoints(str(tmp_path), keep=0) == []   # 0 = keep all
