"""Per-group Adam with explicit moment state — built (rather than optax)
so the densification controller can do the reference's optimizer-state
surgery (OmniRe basics.py:198-242 remove_from_optim/dup_in_optim; S3
gaussian_model.py:479-556) as simple masked writes on the moment pytrees.

Learning rates are a pytree of (possibly traced) scalars matching the param
pytree structure, so per-group schedules (base.py lr_scheduler_fn,
S3 gaussian_model.py:221-239 expon decay) are plain python functions of step
evaluated inside the jitted train step.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any      # pytree like params
    nu: Any      # pytree like params
    step: jax.Array


def strong_types(tree: Any) -> Any:
    """Strip weak-type flags from every array leaf. Freshly-initialized
    params (jnp.full with a python float etc.) carry weak_type=True;
    after one update they come back strong, CHANGING the jit signature —
    each training step's first few calls recompiled (~2 min each on the
    remote TPU helper) until the tree reached its type fixed point.
    Canonicalizing at state creation makes call 0 the only compile."""
    def leaf(x):
        if isinstance(x, jax.Array) and getattr(x, "weak_type", False):
            return x.astype(x.dtype)
        return x
    return jax.tree.map(leaf, tree)


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def adam_update(
    grads: Any,
    state: AdamState,
    params: Any,
    lr: Any,                    # pytree of scalars w/ same structure (or one)
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[Any, AdamState]:
    """Returns (new_params, new_state). eps default matches the references'
    Adam eps=1e-15 (base.py optimizer setup, 3DGS convention)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    if jax.tree.structure(lr) != jax.tree.structure(params):
        lr = jax.tree.map(lambda _: lr, params)

    def upd(p, m, v, l):
        return p - l * (m / c1) / (jnp.sqrt(v / c2) + eps)

    new_params = jax.tree.map(upd, params, mu, nu, lr)
    return new_params, AdamState(mu=mu, nu=nu, step=step)


def reset_moments(state: AdamState, mask: jax.Array,
                  field: str | None = None) -> AdamState:
    """Zero first/second moments at slots where mask is True — the JAX form
    of the reference's `replace_param_with_optimizer_state` reset. `mask` is
    (C,); broadcasts over trailing dims. If `field` is given, only that
    leaf of a NamedTuple params pytree is touched (the opacity-reset case,
    vanilla.py:287-299)."""
    def scrub(tree):
        def leaf(x):
            m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
            return jnp.where(m, 0.0, x)
        if field is None:
            return jax.tree.map(leaf, tree)
        return tree._replace(**{field: leaf(getattr(tree, field))})
    return AdamState(mu=scrub(state.mu), nu=scrub(state.nu), step=state.step)


def expon_lr(step: jax.Array, lr_init: float, lr_final: float,
             max_steps: int, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0) -> jax.Array:
    """3DGS-style exponential LR schedule (get_expon_lr_func — used for
    means in both references; S3 gaussian_model.py:221-239)."""
    t = jnp.clip(step.astype(jnp.float32) / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay = 1.0
    return delay * log_lerp


def cosine_warmup_lr(step: jax.Array, lr_init: float, warmup: int,
                     max_steps: int, final_mult: float = 0.1) -> jax.Array:
    """Cosine decay with linear warmup (OmniRe base.py lr_scheduler_fn)."""
    s = step.astype(jnp.float32)
    warm = lr_init * jnp.clip(s / max(warmup, 1), 0.0, 1.0)
    t = jnp.clip((s - warmup) / max(max_steps - warmup, 1), 0.0, 1.0)
    cos = lr_init * (final_mult + (1 - final_mult)
                     * 0.5 * (1 + jnp.cos(math.pi * t)))
    return jnp.where(s < warmup, warm, cos)
