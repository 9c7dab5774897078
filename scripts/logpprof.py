"""Compare acoustic log-prob lookup strategies on the chip.

The decoder needs logp[b, pdf[b, e]] for E candidates per utterance per
frame.  Candidates: scalar element gather (current), bf16 one-hot matmul
(approximate), int8 one-hot matmul against 4 byte planes (exact f32
reconstruction on the MXU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/catears_jax_cache")

B = 16
E = 10240
P = 4096
REPS = 50
rng = np.random.RandomState(0)

logp = jnp.asarray(rng.randn(B, P).astype(np.float32))
pdf = jnp.asarray(rng.randint(0, P, (REPS, B, E), dtype=np.int32))


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)/REPS*1e6:9.1f} us/frame")
    return out


@jax.jit
def gather_flat(pdf):
    flat = logp.reshape(-1)
    off = (jnp.arange(B, dtype=jnp.int32) * P)[:, None]

    def step(c, i):
        return c + flat[(i + off).reshape(-1)].sum(), 0
    return jax.lax.scan(step, jnp.float32(0), pdf)[0]


@jax.jit
def onehot_bf16(pdf):
    lp = logp.astype(jnp.bfloat16)

    def step(c, i):
        oh = (i[:, :, None] == jnp.arange(P, dtype=jnp.int32)
              ).astype(jnp.bfloat16)
        v = jnp.einsum("bep,bp->be", oh, lp,
                       preferred_element_type=jnp.float32)
        return c + v.sum(), 0
    return jax.lax.scan(step, jnp.float32(0), pdf)[0]


@jax.jit
def onehot_int8(pdf):
    bytes_ = jax.lax.bitcast_convert_type(logp, jnp.int8)  # [B, P, 4]

    def step(c, i):
        oh = (i[:, :, None] == jnp.arange(P, dtype=jnp.int32)
              ).astype(jnp.int8)
        planes = jnp.einsum("bep,bpj->bej", oh, bytes_.astype(jnp.int8),
                            preferred_element_type=jnp.int32)  # [B, E, 4]
        u = planes.astype(jnp.uint32) & 0xFF
        bits = u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16) | \
            (u[..., 3] << 24)
        v = jax.lax.bitcast_convert_type(bits.astype(jnp.int32), jnp.float32)
        return c + v.sum(), 0
    return jax.lax.scan(step, jnp.float32(0), pdf)[0]


r0 = timeit("elem gather (current)", gather_flat, pdf)
r2 = timeit("int8 one-hot x byte planes (exact)", onehot_int8, pdf)
r1 = timeit("bf16 one-hot matmul (approx)", onehot_bf16, pdf)

# exactness check for the int8 path on one frame
i0 = np.asarray(pdf[0])
want = np.take_along_axis(np.asarray(logp), i0, axis=1)


@jax.jit
def one_frame_int8(i):
    bytes_ = jax.lax.bitcast_convert_type(logp, jnp.int8)
    oh = (i[:, :, None] == jnp.arange(P, dtype=jnp.int32)).astype(jnp.int8)
    planes = jnp.einsum("bep,bpj->bej", oh, bytes_.astype(jnp.int8),
                        preferred_element_type=jnp.int32)
    u = planes.astype(jnp.uint32) & 0xFF
    bits = u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16) | (u[..., 3] << 24)
    return jax.lax.bitcast_convert_type(bits.astype(jnp.int32), jnp.float32)


got = np.asarray(one_frame_int8(pdf[0]))
print("int8 path exact:", np.array_equal(got, want))


@jax.jit
def twolevel_f32(pdf):
    blocks = P // 128
    lp3 = logp.reshape(B, blocks, 128)

    def step(c, i):
        hi = i >> 7
        lo = i & 127
        oh = (hi[:, :, None] == jnp.arange(blocks, dtype=jnp.int32)
              ).astype(jnp.float32)  # [B, E, blocks]
        mid = jnp.einsum("bek,bkl->bel", oh, lp3,
                         precision=jax.lax.Precision.HIGHEST)  # [B, E, 128]
        sel = lo[:, :, None] == jnp.arange(128, dtype=jnp.int32)
        v = jnp.sum(jnp.where(sel, mid, 0.0), axis=-1)
        return c + v.sum(), 0
    return jax.lax.scan(step, jnp.float32(0), pdf)[0]


timeit("two-level one-hot f32 HIGHEST", twolevel_f32, pdf)


@jax.jit
def one_frame_twolevel(i):
    blocks = P // 128
    lp3 = logp.reshape(B, blocks, 128)
    hi = i >> 7
    lo = i & 127
    oh = (hi[:, :, None] == jnp.arange(blocks, dtype=jnp.int32)
          ).astype(jnp.float32)
    mid = jnp.einsum("bek,bkl->bel", oh, lp3,
                     precision=jax.lax.Precision.HIGHEST)
    sel = lo[:, :, None] == jnp.arange(128, dtype=jnp.int32)
    return jnp.sum(jnp.where(sel, mid, 0.0), axis=-1)


got2 = np.asarray(one_frame_twolevel(pdf[0]))
print("two-level exact:", np.array_equal(got2, want))
