"""NN layer library (Flax) — the TPU-native counterpart of
/root/reference/modules/layers/Blocks.py (SURVEY.md §2 C8).

The reference's blocks are Linear/Conv -> ReLU -> BatchNorm with
``affine=False, track_running_stats=False`` (Blocks.py:10,25,36,47 +
config.yml:19-20): i.e. *stateless per-batch standardization* with no
learned parameters and no running stats, applied identically at train and
eval.  We implement exactly that as a pure function — no Flax BatchNorm,
no mutable state, nothing to carry through checkpoints.

One genuinely new requirement: the reference normalizes over its
variable-length voxel list; our voxel axis is padded to static capacity,
so statistics must be computed under the validity mask or dead slots
would pollute them.  ``masked_standardize`` handles that; dense BEV/image
maps use the plain version (the reference also includes every dense cell).

All data is channels-last (TPU-native conv layout).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def standardize(x: jnp.ndarray, eps: float = 1e-6,
                axes: Union[int, Sequence[int], None] = None) -> jnp.ndarray:
    """Zero-mean unit-variance per channel (last axis kept), no params.

    Equivalent to torch BatchNorm(affine=False, track_running_stats=False)
    in both train and eval mode.  Variance is the biased (population)
    estimate, like torch BN.
    """
    if axes is None:
        axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    return (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))


def masked_standardize(x: jnp.ndarray, mask: jnp.ndarray,
                       eps: float = 1e-6) -> jnp.ndarray:
    """Per-channel standardization where statistics only see entries with
    ``mask`` true.  x: (..., C); mask broadcastable to x's leading dims.

    Masked-out entries are normalized with the same statistics (then
    typically re-masked by the caller); they contribute nothing to them.
    """
    m = mask[..., None].astype(x.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    # reduce over all leading axes, keep channels
    axes = tuple(range(x.ndim - 1))
    mean = jnp.sum(x * m, axis=axes, keepdims=True) / denom
    var = jnp.sum(jnp.square(x - mean) * m, axis=axes, keepdims=True) / denom
    return (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))


class DenseReluNorm(nn.Module):
    """Linear -> ReLU -> (masked) standardize.

    Counterpart of the reference ``FCN`` (Blocks.py:5-18) — note the
    reference applies BN *after* ReLU; preserved here.
    """
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = nn.Dense(self.features, name="fc")(x)
        x = nn.relu(x)
        if mask is not None:
            return masked_standardize(x, mask, self.eps)
        return standardize(x, self.eps)


class DenseReluNormVirtual(nn.Module):
    """Dense -> ReLU -> standardize over real rows *plus* ``n_virtual``
    copies of a constant row.

    This powers the per-point fusion path: the reference feeds the
    768-wide fusion MLP one row per voxel *sample slot* — most of which
    are identical zero rows (empty slots, imhead/Pipe.py:53-59) — and
    its batch statistics include all of them.  Computing only over the
    ~13x smaller set of *real* points is exact as long as the statistics
    account for the constant rows analytically, and the constant row's
    own activation is tracked through every layer.  That is what this
    block does: it applies the shared Dense to ``x`` (real rows) and to
    ``z`` (the virtual row's current value), then normalizes both with
    moments computed over real + virtual populations.
    """
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 z: jnp.ndarray, n_virtual: jnp.ndarray):
        """x: (..., P, C); mask: (..., P) real-row validity (stats are
        computed over ALL leading dims jointly, like torch BN over the
        batch); z: (C,) virtual-row value; n_virtual: () count.
        Returns (x', z')."""
        d = nn.Dense(self.features, name="fc")
        h = nn.relu(d(x))
        hz = nn.relu(d(z))

        m = mask[..., None].astype(h.dtype)
        n_real = jnp.sum(m)
        n_tot = n_real + n_virtual.astype(h.dtype)
        axes = tuple(range(h.ndim - 1))
        mean = (jnp.sum(h * m, axis=axes) + n_virtual * hz) / n_tot
        sq = (jnp.sum(jnp.square(h) * m, axis=axes)
              + n_virtual * jnp.square(hz)) / n_tot
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (h - mean) * inv, (hz - mean) * inv


class DenseReluNormVirtualFull(nn.Module):
    """:class:`DenseReluNormVirtual` with full-population reductions.

    Caller invariant (exploited, not checked): every masked-out row of
    ``x`` is value-identical to the virtual row ``z`` — true for the
    image-fusion stack, where invalid gather rows and ``z`` both start
    as exact zeros and afterwards receive the same affine normalization
    of the same Dense+ReLU output.  The masked sums can then be computed
    as PLAIN reductions over all rows plus an analytic correction of
    ``n_virtual - n_masked`` copies of z's activation, removing the
    ``h*m`` / ``h^2*m`` masked temporaries (two extra full-size
    elementwise passes per layer) and letting XLA fuse bare sum
    reductions into the matmul epilogue.  Statistics accumulate in f32.
    """
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 z: jnp.ndarray, n_virtual: jnp.ndarray):
        """Same signature/semantics as DenseReluNormVirtual (under the
        caller invariant above)."""
        d = nn.Dense(self.features, name="fc")
        h = nn.relu(d(x))
        hz = nn.relu(d(z))

        f32 = jnp.float32
        n_real = jnp.sum(mask.astype(f32))
        n_rows = f32(1) * int(np.prod(mask.shape))
        corr = n_virtual.astype(f32) - (n_rows - n_real)  # +- z copies
        n_tot = n_real + n_virtual.astype(f32)
        axes = tuple(range(h.ndim - 1))
        hzf = hz.astype(f32)
        mean = (jnp.sum(h, axis=axes, dtype=f32) + corr * hzf) / n_tot
        sq = (jnp.sum(jnp.square(h), axis=axes, dtype=f32)
              + corr * jnp.square(hzf)) / n_tot
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        mean = mean.astype(h.dtype)
        inv = inv.astype(h.dtype)
        return (h - mean) * inv, (hz - mean) * inv


class DenseReluNormVirtualWeighted(nn.Module):
    """Dense -> ReLU -> standardize over real rows plus *weighted
    per-group* constant rows.

    Generalizes :class:`DenseReluNormVirtual`: instead of one global
    constant row, each group (voxel) contributes ``w_g`` copies of its
    own constant row ``z_g`` to the statistics.  This is what exact
    point-major VFE computation needs: after the first per-voxel max is
    concatenated, the empty sample slots of voxel ``g`` all hold
    ``concat(z_prev, max_g)`` — per-voxel constants with multiplicity
    ``T - count_g``.
    """
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 z: jnp.ndarray, w: jnp.ndarray, zmask: jnp.ndarray):
        """x: (..., P, C) real rows; mask: (..., P) validity;
        z: (..., V, C) per-group constant rows; w: (..., V) their
        multiplicities (float/int); zmask: (..., V) group validity.
        Stats reduce over ALL leading dims.  Returns (x', z')."""
        d = nn.Dense(self.features, name="fc")
        h = nn.relu(d(x))
        hz = nn.relu(d(z))

        m = mask[..., None].astype(h.dtype)
        wv = (w * zmask).astype(h.dtype)[..., None]
        n_tot = jnp.sum(m) + jnp.sum(wv)
        axes = tuple(range(h.ndim - 1))
        mean = (jnp.sum(h * m, axis=axes)
                + jnp.sum(hz * wv, axis=axes)) / n_tot
        sq = (jnp.sum(jnp.square(h) * m, axis=axes)
              + jnp.sum(jnp.square(hz) * wv, axis=axes)) / n_tot
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (h - mean) * inv, (hz - mean) * inv


class ConvReluNorm(nn.Module):
    """Conv(2D/3D by kernel rank) -> ReLU -> standardize.

    Counterpart of CRB2d/CRB3d (Blocks.py:20-40).  2D convolutions use
    xavier-uniform init with zero bias, matching the reference's
    backbone-wide init (MVXNet.py:8-11).
    """
    features: int
    kernel: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Union[str, Tuple[Tuple[int, int], ...]]
    eps: float = 1e-6
    xavier: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = (nn.initializers.xavier_uniform() if self.xavier
                else nn.initializers.lecun_normal())
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, kernel_init=init,
                    name="conv")(x)
        x = nn.relu(x)
        return standardize(x, self.eps)


class DeconvReluNorm(nn.Module):
    """ConvTranspose -> ReLU -> standardize (counterpart of DeCRB2d,
    Blocks.py:42-51)."""
    features: int
    kernel: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Union[str, Tuple[Tuple[int, int], ...]]
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding,
            kernel_init=nn.initializers.xavier_uniform(),
            name="deconv")(x)
        x = nn.relu(x)
        return standardize(x, self.eps)
