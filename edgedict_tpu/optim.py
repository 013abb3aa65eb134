"""Optimizers and LR schedules as optax transforms.

Covers the reference optimizer surface:
  * Adam / SGD (reference cli/baseline.py:141-152 via torch.optim)
  * SM3 (memory-efficient adaptive, arXiv:1901.11150), AdamW (decoupled
    weight decay), Novograd (layer-wise 2nd moment) — the from-scratch
    optimizers at reference modules/optimizer.py:4-399, rebuilt here as
    optax GradientTransformations from their published update rules
  * linear warmup (reference cli/baseline.py:182-184 scales lr by
    step/warmup_step) and ReduceLROnPlateau (torch semantics: factor decay
    after `patience` non-improving evals, min_lr floor)

Dynamic learning rate: every optimizer is built with
`optax.inject_hyperparams`, so the current lr lives in the optimizer state
(`opt_state.hyperparams['lr']`) and warmup/plateau scaling is applied inside
the jitted train step from a plain scalar — no recompilation on lr change.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# SM3
# ---------------------------------------------------------------------------

def _sm3_accumulator_shapes(shape):
    """One accumulator per tensor dimension, each keeping only that dim."""
    return [tuple(d if i == j else 1 for j, d in enumerate(shape))
            for i in range(len(shape))]


def scale_by_sm3(momentum=0.0, beta=0.0, eps=1e-30):
    """SM3-II update (arXiv:1901.11150, Alg. 2; torch port at reference
    modules/optimizer.py:4-189).  For a rank-k parameter, keeps k rank-1
    accumulators; the effective second-moment estimate is their elementwise
    min, updated to `min + g^2` (or an EMA when beta > 0)."""

    def init_fn(params):
        def make_acc(p):
            if p.ndim == 0:
                return [jnp.zeros_like(p)]
            return [jnp.zeros(s, p.dtype) for s in _sm3_accumulator_shapes(p.shape)]
        accs = jax.tree.map(make_acc, params,
                            is_leaf=lambda x: isinstance(x, jnp.ndarray))
        mom = jax.tree.map(jnp.zeros_like, params) if momentum > 0 else None
        return {'accs': accs, 'momentum': mom}

    def update_fn(updates, state, params=None):
        del params

        def one(g, accs):
            if g.ndim == 0:
                acc = accs[0]
                nu = beta * acc + (1 - beta) * g * g if beta > 0 \
                    else acc + g * g
                upd = g / (jnp.sqrt(nu) + eps)
                return upd, [nu]
            nu = accs[0]
            for a in accs[1:]:
                nu = jnp.minimum(nu, a)
            nu = jnp.broadcast_to(nu, g.shape)
            nu = beta * nu + (1 - beta) * g * g if beta > 0 else nu + g * g
            upd = g / (jnp.sqrt(nu) + eps)
            new_accs = [jnp.max(nu, axis=tuple(j for j in range(g.ndim)
                                               if j != i), keepdims=True)
                        for i in range(g.ndim)]
            return upd, new_accs

        flat_u, tree = jax.tree.flatten(updates)
        flat_a = tree.flatten_up_to(state['accs'])
        outs = [one(g, a) for g, a in zip(flat_u, flat_a)]
        new_updates = tree.unflatten([o[0] for o in outs])
        new_accs = tree.unflatten([o[1] for o in outs])

        if momentum > 0:
            new_mom = jax.tree.map(
                lambda m, u: momentum * m + (1 - momentum) * u,
                state['momentum'], new_updates)
            new_updates = new_mom
        else:
            new_mom = None
        return new_updates, {'accs': new_accs, 'momentum': new_mom}

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Novograd
# ---------------------------------------------------------------------------

def scale_by_novograd(b1=0.95, b2=0.0, eps=1e-8, weight_decay=0.0,
                      grad_averaging=False):
    """Novograd (arXiv:1905.11286; torch port at reference
    modules/optimizer.py:294-399): per-LAYER scalar second moment
    v ← b2·v + (1−b2)·‖g‖², m ← b1·m + (g/(√v+eps) + wd·p)."""

    def init_fn(params):
        m = jax.tree.map(jnp.zeros_like, params)
        v = jax.tree.map(lambda p: jnp.zeros((), jnp.float32), params)
        return {'m': m, 'v': v}

    def update_fn(updates, state, params):
        def upd(g, m, v, p):
            norm = jnp.sum(jnp.square(g.astype(jnp.float32)))
            v_new = jnp.where(v == 0, norm, b2 * v + (1 - b2) * norm)
            d = g / (jnp.sqrt(v_new) + eps)
            if weight_decay:
                d = d + weight_decay * p
            if grad_averaging:
                d = d * (1 - b1)
            m_new = b1 * m + d
            return m_new, m_new, v_new    # descent sign applied by scale(-lr)

        flat_g, tree = jax.tree.flatten(updates)
        flat_m = tree.flatten_up_to(state['m'])
        flat_v = tree.flatten_up_to(state['v'])
        flat_p = tree.flatten_up_to(params)
        outs = [upd(g, m, v, p) for g, m, v, p
                in zip(flat_g, flat_m, flat_v, flat_p)]
        new_updates = tree.unflatten([o[0] for o in outs])
        new_m = tree.unflatten([o[1] for o in outs])
        new_v = tree.unflatten([o[2] for o in outs])
        return new_updates, {'m': new_m, 'v': new_v}

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------

def build_optimizer(name, lr, gradclip=None, weight_decay=0.0,
                    momentum=0.9):
    """Construct the optimizer by flag name (reference cli/baseline.py:141-152
    + cli/lightning.py:203-222).  Returns an injected-hyperparams optimizer
    whose state exposes `.hyperparams['lr']` for schedule updates."""

    def make(lr):
        chain = []
        if gradclip is not None and gradclip > 0:
            chain.append(optax.clip_by_global_norm(gradclip))
        if name == 'adam':
            chain.append(optax.scale_by_adam())
        elif name == 'adamw':
            chain.append(optax.scale_by_adam())
            if weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay))
        elif name == 'sgd':
            if momentum:
                chain.append(optax.trace(decay=momentum))
        elif name == 'sm3':
            chain.append(scale_by_sm3(momentum=0.9))
        elif name == 'novograd':
            chain.append(scale_by_novograd(weight_decay=weight_decay))
        else:
            raise ValueError(f'unknown optimizer {name}')
        chain.append(optax.scale(-lr))
        return optax.chain(*chain)

    return optax.inject_hyperparams(make)(lr=lr)


def warmup_scale(step, warmup_step):
    """Linear warmup factor in [0, 1] (reference cli/baseline.py:182-184)."""
    if warmup_step <= 0:
        return jnp.asarray(1.0)
    return jnp.minimum(1.0, (step + 1) / warmup_step)


class PlateauState(NamedTuple):
    best: float
    bad_evals: int
    scale: float


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch ReduceLROnPlateau semantics, used
    at reference cli/baseline.py:148-152: mode='min', patience, factor,
    min_lr).  Produces a multiplicative lr scale; apply via
    `opt_state.hyperparams['lr'] = base_lr * warmup * state.scale`."""

    def __init__(self, base_lr, factor=0.5, patience=1, min_lr=1e-6):
        self.base_lr = base_lr
        self.factor = factor
        self.patience = patience
        self.min_scale = min_lr / base_lr
        self.state = PlateauState(best=float('inf'), bad_evals=0, scale=1.0)

    def step(self, metric):
        s = self.state
        if metric < s.best:
            self.state = PlateauState(best=float(metric), bad_evals=0,
                                      scale=s.scale)
        else:
            bad = s.bad_evals + 1
            if bad > self.patience:
                self.state = PlateauState(
                    best=s.best, bad_evals=0,
                    scale=max(s.scale * self.factor, self.min_scale))
            else:
                self.state = PlateauState(best=s.best, bad_evals=bad,
                                          scale=s.scale)
        return self.state.scale

    def state_dict(self):
        return self.state._asdict()

    def load_state_dict(self, d):
        self.state = PlateauState(**d)
