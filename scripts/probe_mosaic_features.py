"""Isolate which kernel constructs Mosaic on this TPU accepts."""
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)

    S, L = 480, 640

    def try_kernel(name, kern, inputs, out_shape):
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in inputs],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*inputs)
            print(f"{name}: OK sum={float(jnp.sum(out)):.3f}", flush=True)
            return out
        except Exception as e:
            msg = " ".join(str(e).split())
            print(f"{name}: FAIL [{type(e).__name__}] {msg[:600]}",
                  flush=True)
            return None

    src = jnp.asarray(rng.rand(S, L).astype(np.float32))
    idx_r = jnp.asarray(rng.randint(0, S, (S, L)).astype(np.int32))
    idx_l = jnp.asarray(rng.randint(0, L, (S, L)).astype(np.int32))

    def k_rows(s, i, o):
        o[:] = jnp.take_along_axis(s[:], i[:], axis=0,
                                   mode="promise_in_bounds")

    def k_lanes(s, i, o):
        o[:] = jnp.take_along_axis(s[:], i[:], axis=1,
                                   mode="promise_in_bounds")

    out = try_kernel("gather rows (480,640)", k_rows, [src, idx_r], (S, L))
    if out is not None:
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx_r), 0)
        print(f"  correct={np.allclose(np.asarray(out), ref)}", flush=True)
    out = try_kernel("gather lanes (480,640)", k_lanes, [src, idx_l], (S, L))
    if out is not None:
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx_l), 1)
        print(f"  correct={np.allclose(np.asarray(out), ref)}", flush=True)

    sq = jnp.asarray(rng.rand(512, 512).astype(np.float32))
    idx_sq = jnp.asarray(rng.randint(0, 512, (512, 512)).astype(np.int32))
    out = try_kernel("gather rows (512,512)", k_rows, [sq, idx_sq],
                     (512, 512))
    if out is not None:
        ref = np.take_along_axis(np.asarray(sq), np.asarray(idx_sq), 0)
        print(f"  correct={np.allclose(np.asarray(out), ref)}", flush=True)

    def k_transpose(s, o):
        o[:] = s[:].T * 2.0

    try_kernel("transpose (512,512)", k_transpose, [sq], (512, 512))

    def k_transpose_rect(s, o):
        o[:] = s[:].T * 2.0

    try_kernel("transpose (480,640)->(640,480)", k_transpose_rect, [src],
               (L, S))

    def k_pad(s, o):
        o[:] = jnp.pad(s[:], ((0, 32), (0, 128)))

    try_kernel("pad (480,640)->(512,768)", k_pad, [src], (512, 768))

    def k_sign(s, o):
        o[:] = jnp.sign(s[:] - 0.5)

    try_kernel("sign", k_sign, [src], (S, L))

    def k_iota_cast(s, o):
        o[:] = s[:] + jax.lax.broadcasted_iota(
            jnp.int32, (S, L), 0).astype(jnp.float32)

    try_kernel("iota int->f32", k_iota_cast, [src], (S, L))

    # scalar prefetch + program_id indexing
    coefs = jnp.asarray(rng.rand(8, 16).astype(np.float32))
    big = jnp.asarray(rng.rand(8 * 64, L).astype(np.float32))

    def k_spref(c_ref, s_ref, o_ref):
        g = pl.program_id(0)
        o_ref[:] = s_ref[:] * c_ref[g, 0]

    try:
        out = pl.pallas_call(
            k_spref,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(8,),
                in_specs=[pl.BlockSpec((64, L), lambda g, c: (g, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((64, L), lambda g, c: (g, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8 * 64, L), jnp.float32),
        )(coefs, big)
        print(f"scalar prefetch: OK sum={float(jnp.sum(out)):.3f}",
              flush=True)
    except Exception as e:
        msg = " ".join(str(e).split())
        print(f"scalar prefetch: FAIL [{type(e).__name__}] {msg[:600]}",
              flush=True)

    # 3D block + where with scalar cond
    vol = jnp.asarray(rng.rand(4, 64, 128).astype(np.float32))

    def k_3d(s_ref, o_ref):
        sl = s_ref[0]
        o_ref[0] = jnp.where(sl[0, 0] > 0.5, sl * 2.0, sl.T * 3.0)

    try:
        out = pl.pallas_call(
            k_3d,
            grid=(4,),
            in_specs=[pl.BlockSpec((1, 64, 128), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 64, 128), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, 64, 128), jnp.float32),
        )(vol)
        print("3D block + where(scalar, a, a.T): OK", flush=True)
    except Exception as e:
        msg = " ".join(str(e).split())
        print(f"3D block + where: FAIL [{type(e).__name__}] {msg[:600]}",
              flush=True)


if __name__ == "__main__":
    main()
