"""utils/relay_io packed transfers must be exact tree roundtrips."""

import numpy as np

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.utils.relay_io import (
    tree_device_get_packed,
    tree_host_template,
)


def test_packed_get_roundtrip_mixed_dtypes():
    tree = {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": {"w": jnp.ones((2, 2, 2), jnp.bfloat16) * 1.5,
              "count": jnp.asarray(7, jnp.int32)},
        "c": [jnp.linspace(0, 1, 5), jnp.asarray(2.5, jnp.float32)],
    }
    got = tree_device_get_packed(tree)
    ref = jax.device_get(tree)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert isinstance(a, np.ndarray)
        assert a.dtype == np.asarray(b).dtype
        assert a.shape == np.asarray(b).shape
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_host_template_shapes_no_values():
    tree = {"k": jnp.ones((4, 3), jnp.bfloat16),
            "s": jnp.asarray(3, jnp.int32)}
    t = tree_host_template(tree)
    assert t["k"].shape == (4, 3) and t["k"].dtype == jnp.bfloat16
    assert t["s"].shape == () and t["s"].dtype == np.int32
    assert float(t["k"].astype(np.float32).sum()) == 0.0
