"""Train state: parameter partitioning (frozen image extractor vs
trainable rest), AdamW, and optional bf16 compute policy.

Reference: train.py:64 builds AdamW(lr=1e-3, eps=cfg.eps) over
``filter(lambda p: p.requires_grad, ...)`` — the frozen Faster R-CNN
extractor (Head.py:9-11) is excluded.  Here the same split is expressed
functionally: an optax ``multi_transform`` routes extractor parameters to
``set_to_zero`` so they never move, while everything else gets AdamW.

bf16 is the TPU-native analogue of the reference's fp16 AMP
(train.py:123,156-159): parameters stay f32, compute casts to bf16; no
loss scaler is needed (bf16 has f32's exponent range).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from mvxnet_makise_tpu.config import Config


def is_frozen_path(path) -> bool:
    """True for parameters of the frozen image feature extractor."""
    return any(getattr(k, "key", None) == "extractor" for k in path)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "frozen" if is_frozen_path(p) else "train", params)

    # lr schedule: "constant" is the reference (train.py:64 — flat
    # AdamW 1e-3 for the whole run); "cosine" (warmup -> cosine decay
    # to lr/20) is a framework extension for long runs where the flat
    # rate keeps the stateless-norm features churning.
    if cfg.lr_schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=cfg.learning_rate / 25,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.lr_warmup_steps,
            decay_steps=max(cfg.lr_decay_steps, cfg.lr_warmup_steps + 1),
            end_value=cfg.learning_rate / 20)
    else:
        lr = cfg.learning_rate

    return optax.multi_transform(
        {"train": optax.adamw(lr, eps=cfg.eps),
         "frozen": optax.set_to_zero()},
        label_fn)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), apply_fn=apply_fn, tx=tx)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def per_sample_apply(apply_fn: Callable) -> Callable:
    """Wrap a batched model apply so every sample runs with batch-size-1
    semantics (vmapped, so XLA still batches the compute).

    Why this exists: the stateless norms (torch BN with affine=False,
    track_running_stats=False — reference Blocks.py:5-51, config.yml:19-20)
    compute statistics over the batch.  The reference only ever runs
    batch 1 (MVXNet.py:22-24), where that IS per-sample normalization.
    Batched training with batch-wide statistics couples samples through
    every norm layer — a semantics change that (measured, round 3)
    stalls convergence on diverse scenes.  norm_scope='sample' restores
    the reference function exactly at any batch size."""
    def wrapped(params, *inputs):
        def one(*xs):
            out = apply_fn(params, *[x[None] for x in xs])
            return jax.tree.map(lambda o: o[0], out)
        return jax.vmap(one)(*inputs)
    return wrapped


def make_apply(model, cfg) -> Callable:
    """The model's apply under cfg.norm_scope ('batch' | 'sample')."""
    if getattr(cfg, "norm_scope", "batch") == "sample":
        return per_sample_apply(model.apply)
    return model.apply


def cast_for_compute(tree, use_bf16: bool):
    """Cast float leaves to bf16 for the forward/backward pass."""
    if not use_bf16:
        return tree
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
