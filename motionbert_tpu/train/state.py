"""Train state: params + AdamW optimizer with mutable learning rate.

The reference decays the LR exponentially *per epoch* by mutating the
optimizer's param_groups (train.py:359-362: lr *= lr_decay). We mirror that
with optax.inject_hyperparams(adamw) so `state.set_lr(lr)` is a pure pytree
update — no recompilation, faithful resume semantics (the checkpoint stores
the current lr, train.py:51).

Supports multiple param groups with distinct LRs (action/mesh finetuning
uses lr_backbone vs lr_head, train_action.py:142-147) via optax.multi_transform
keyed on the top-level param collection.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


# Jitted-step memoization shared by the four trainers: rebuilding a step
# closure each call would defeat jax.jit's trace cache (one full retrace
# per epoch — minutes of dead time on the remote-compile TPU path). Keys
# must embed the model OBJECT (the strong ref keeps its id() from being
# recycled); the cache is LRU-bounded so a long-lived process that builds
# many models (e.g. a serving host reloading checkpoints) cannot grow it
# without limit.
from collections import OrderedDict

_STEP_CACHE: "OrderedDict" = OrderedDict()
_STEP_CACHE_MAX = 32  # trainers use ~3 entries/model; 32 ≈ 10 live models


class IdKey:
    """Hashable identity wrapper for unhashable key parts (e.g. SMPLModel,
    a frozen dataclass of arrays): keys on object identity while holding a
    strong ref so the id stays valid for the cache entry's lifetime."""

    __slots__ = ("obj",)

    def __init__(self, obj):
        self.obj = obj

    def __hash__(self):
        return id(self.obj)

    def __eq__(self, other):
        return isinstance(other, IdKey) and other.obj is self.obj


def memo_step(key, build):
    if key in _STEP_CACHE:
        _STEP_CACHE.move_to_end(key)
        return _STEP_CACHE[key]
    val = _STEP_CACHE[key] = build()
    while len(_STEP_CACHE) > _STEP_CACHE_MAX:
        _STEP_CACHE.popitem(last=False)
    return val


def make_adamw(lr: float, weight_decay: float) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, weight_decay=weight_decay)


def freeze_except(tx: optax.GradientTransformation, params,
                  patterns, scope: str = None) -> optax.GradientTransformation:
    """Train only params whose path contains one of `patterns`; freeze the
    rest (reference partial_train_layers, learning.py:69-77).

    scope: when given, only paths containing it are subject to freezing —
    the reference applies partial_train to the BACKBONE alone before
    wrapping it in a task model, so task heads stay trainable
    (train_action.py:95-97, train_mesh.py:236-238).
    """
    patterns = list(patterns)

    def label_fn(p):
        def leaf_label(path, _):
            key = jax.tree_util.keystr(path)
            if scope is not None and scope not in key:
                return "train"
            return "train" if any(pat in key for pat in patterns) else "freeze"

        return jax.tree_util.tree_map_with_path(leaf_label, p)

    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label_fn)


@flax.struct.dataclass
class TrainState:
    """Minimal functional train state (params, opt state, step)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    # non-param variable collections (e.g. batch_stats), may be None
    extra_vars: Any = None

    @classmethod
    def create(cls, apply_fn, params, tx, extra_vars=None):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx, apply_fn=apply_fn,
                   extra_vars=extra_vars)

    def apply_gradients(self, grads, new_extra_vars=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state,
            extra_vars=(new_extra_vars if new_extra_vars is not None
                        else self.extra_vars))

    @property
    def lr(self):
        return _find_hyperparam(self.opt_state, "learning_rate")

    def set_lr(self, lr):
        """Return a new state with the injected learning_rate replaced."""
        return self.replace(
            opt_state=_set_hyperparam(self.opt_state, "learning_rate",
                                      lambda _: lr))

    def scale_lr(self, factor):
        """Multiply every injected learning_rate by factor (per-epoch decay,
        reference train.py:359-362 decays all param groups)."""
        return self.replace(
            opt_state=_set_hyperparam(self.opt_state, "learning_rate",
                                      lambda old: old * factor))


def _find_hyperparam(opt_state, name):
    found = []

    def visit(node):
        if hasattr(node, "hyperparams") and name in node.hyperparams:
            found.append(node.hyperparams[name])

    _walk_states(opt_state, visit)
    return found[0] if found else None


def _set_hyperparam(opt_state, name, fn):
    def rewrite(node):
        if hasattr(node, "hyperparams") and name in node.hyperparams:
            hp = dict(node.hyperparams)
            hp[name] = jnp.asarray(fn(hp[name]), jnp.float32)
            return node._replace(hyperparams=hp)
        return None

    return _rewrite_states(opt_state, rewrite)


def _walk_states(node, visit):
    visit(node)
    if isinstance(node, (tuple, list)):
        for c in node:
            _walk_states(c, visit)
    elif hasattr(node, "inner_state"):
        _walk_states(node.inner_state, visit)
    elif hasattr(node, "inner_states"):
        for c in node.inner_states.values():
            _walk_states(c, visit)


def _rewrite_states(node, rewrite):
    new = rewrite(node)
    if new is not None:
        return new
    if isinstance(node, tuple) and not hasattr(node, "_fields"):
        return tuple(_rewrite_states(c, rewrite) for c in node)
    if isinstance(node, list):
        return [_rewrite_states(c, rewrite) for c in node]
    if hasattr(node, "inner_state"):
        return node._replace(inner_state=_rewrite_states(node.inner_state,
                                                         rewrite))
    if hasattr(node, "inner_states"):
        return node._replace(inner_states={
            k: _rewrite_states(v, rewrite) for k, v in node.inner_states.items()
        })
    return node
