"""A/B conv2 (5->3 depth, 64->64, 3^3, pad (0,1,1)) and conv3
(3->2 depth, stride-2 depth, pad (1,1,1)) formulations at flagship
shapes, batch 8 bf16."""
import time
import numpy as np
import jax
import jax.numpy as jnp

B, H, W = 8, 352, 400
C = 64
rng = np.random.default_rng(0)


def mk(shape):
    return jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.bfloat16)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    corner = leaf[(slice(0, 1),) * leaf.ndim]
    return float(jnp.sum(corner.astype(jnp.float32)))


def timeit(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return out


# ---------------- conv2: D 5 -> 3, pad_d 0 ----------------
D, DO = 5, 3
x_dm = mk((B, H, W, D, C))              # d-minor (current layout)
k = mk((3, 3, 3, C, C))                  # (kd, kh, kw, I, O)

def conv2_nhwdc(x, k):
    kk = jnp.transpose(k, (1, 2, 0, 3, 4))   # (kh,kw,kd,I,O)
    return jax.lax.conv_general_dilated(
        x, kk, (1, 1, 1), (((1, 1), (1, 1), (0, 0))),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))

def conv2_ndhwc(x, k):
    xt = jnp.transpose(x, (0, 3, 1, 2, 4))   # (B, D, H, W, C)
    y = jax.lax.conv_general_dilated(
        xt, k, (1, 1, 1), (((0, 0), (1, 1), (1, 1))),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return jnp.transpose(y, (0, 2, 3, 1, 4))

def conv2_stacked(x, k):
    # planes into batch; one conv 64 -> 192 (3 depth taps stacked on
    # output channels); shifted adds select the valid alignment
    xp = jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(B * D, H, W, C)
    k2 = jnp.concatenate([k[kd] for kd in range(3)], axis=-1)  # (3,3,C,3C)
    z = jax.lax.conv_general_dilated(
        xp, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = z.reshape(B, D, H, W, 3, C)
    y = z[:, 0:DO, :, :, 0] + z[:, 1:DO + 1, :, :, 1] + z[:, 2:DO + 2, :, :, 2]
    return jnp.transpose(y, (0, 2, 3, 1, 4))

def conv2_accum(x, k):
    # d-minor input; 3 accumulated 2D convs on depth-sliced planes
    y = None
    for kd in range(3):
        sl = x[:, :, :, kd:kd + DO]                   # (B,H,W,3,C)
        sl = jnp.transpose(sl, (0, 3, 1, 2, 4)).reshape(B * DO, H, W, C)
        part = jax.lax.conv_general_dilated(
            sl, k[kd], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = part if y is None else y + part
    return jnp.transpose(y.reshape(B, DO, H, W, C), (0, 2, 3, 1, 4))

def conv2_banded(x, k):
    # (D,C)-folded 2D conv 320 -> 192 with block-banded kernel
    xf = x.reshape(B, H, W, D * C)
    kb = np.zeros((3, 3, D * C, DO * C), np.float32)
    kb = jnp.asarray(kb, jnp.bfloat16)
    for do in range(DO):
        for kd in range(3):
            kb = kb.at[:, :, (do + kd) * C:(do + kd + 1) * C,
                       do * C:(do + 1) * C].set(
                jnp.transpose(k[kd], (0, 1, 2, 3)))
    y = jax.lax.conv_general_dilated(
        xf, kb, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(B, H, W, DO, C)

r0 = timeit("conv2 NHWDC (current)", conv2_nhwdc, x_dm, k)
r1 = timeit("conv2 NDHWC d-leading", conv2_ndhwc, x_dm, k)
r2 = timeit("conv2 stacked-192", conv2_stacked, x_dm, k)
r3 = timeit("conv2 3x accum", conv2_accum, x_dm, k)
r4 = timeit("conv2 banded 320->192", conv2_banded, x_dm, k)

for name, r in [("ndhwc", r1), ("stacked", r2), ("accum", r3),
                ("banded", r4)]:
    d = float(jnp.max(jnp.abs(r.astype(jnp.float32)
                              - r0.astype(jnp.float32))))
    print(f"  max|diff| {name}: {d:.4f}")

# ---------------- conv3: D 3 -> 2, stride 2, pad_d 1 ----------------
D3, DO3 = 3, 2
x3 = mk((B, H, W, D3, C))

def conv3_nhwdc(x, k):
    kk = jnp.transpose(k, (1, 2, 0, 3, 4))
    return jax.lax.conv_general_dilated(
        x, kk, (1, 1, 2), (((1, 1), (1, 1), (1, 1))),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))

def conv3_stacked(x, k):
    xp = jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(B * D3, H, W, C)
    k2 = jnp.concatenate([k[kd] for kd in range(3)], axis=-1)
    z = jax.lax.conv_general_dilated(
        xp, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = z.reshape(B, D3, H, W, 3, C)
    # out[d] = sum_kd K_kd * xpad[2d + kd], xpad = pad(x,1): planes -1..3
    # out[0] = K1*x[0] + K2*x[1]; out[1] = K0*x[1] + K1*x[2]
    y0 = z[:, 0, :, :, 1] + z[:, 1, :, :, 2]
    y1 = z[:, 1, :, :, 0] + z[:, 2, :, :, 1]
    y = jnp.stack([y0, y1], axis=3)
    return y

r0 = timeit("conv3 NHWDC (current)", conv3_nhwdc, x3, k)
r2 = timeit("conv3 stacked-192", conv3_stacked, x3, k)
d = float(jnp.max(jnp.abs(r2.astype(jnp.float32)
                          - r0.astype(jnp.float32))))
print(f"  max|diff| stacked: {d:.4f}")
