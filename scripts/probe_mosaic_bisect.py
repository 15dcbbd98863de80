"""Bisect which Pallas/Mosaic features the axon remote compile helper
rejects (the fusion kernel 500s; the featureless bilateral kernel
compiles). Each case is a minimal kernel exercising one feature."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(64, 128).astype(np.float32))

    def run(name, fn, *args):
        try:
            out = fn(*args)
            out = out[0] if isinstance(out, tuple) else out
            v = float(jnp.asarray(out).ravel()[0])
            print(f"{name}: OK ({v:.3f})")
        except Exception as e:
            print(f"{name}: FAIL [{type(e).__name__}] {str(e)[:120]}")

    # 1. grid + blocked in/out
    def k1(i_ref, o_ref):
        o_ref[:] = i_ref[:] * 2.0

    run("grid+blocks", lambda a: pl.pallas_call(
        k1, grid=(4,),
        in_specs=[pl.BlockSpec((16, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(a), x)

    # 2. two outputs
    def k2(i_ref, o1, o2):
        o1[:] = i_ref[:] + 1.0
        o2[:] = i_ref[:] - 1.0

    run("two outputs", lambda a: pl.pallas_call(
        k2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((64, 128), jnp.float32),
                   jax.ShapeDtypeStruct((64, 128), jnp.float32)))(a), x)

    # 3. bf16 dot
    b = jnp.asarray(rng.rand(128, 128).astype(np.float32))

    def k3(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:].astype(jnp.bfloat16),
                           b_ref[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

    run("bf16 dot", lambda a, bb: pl.pallas_call(
        k3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(a, bb),
        x, b)

    # 4. SMEM table read with program_id row
    tab = jnp.asarray(rng.rand(4, 8).astype(np.float32))

    def k4(t_ref, i_ref, o_ref):
        z = pl.program_id(0)
        o_ref[:] = i_ref[:] * t_ref[z, 0] + t_ref[z, 1]

    run("smem table", lambda t, a: pl.pallas_call(
        k4, grid=(4,),
        in_specs=[pl.BlockSpec((4, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((16, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(t, a),
        tab, x)

    # 5. constant-index full VMEM operand across a grid
    def k5(c_ref, i_ref, o_ref):
        o_ref[:] = i_ref[:] + c_ref[0:16, :]

    run("const operand", lambda c, a: pl.pallas_call(
        k5, grid=(4,),
        in_specs=[pl.BlockSpec((64, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(c, a),
        x, x)

    # 6. iota-compare one-hot in bf16 + dot (the fusion kernel pattern)
    def k6(d_ref, o_ref):
        idx = jnp.floor(
            lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
                jnp.float32) * 0.7 + 3.0)
        rows = lax.broadcasted_iota(jnp.int32, (128, 128), 0
                                    ).astype(jnp.float32)
        E = (rows == idx).astype(jnp.bfloat16)
        o_ref[:] = jnp.dot(d_ref[:].astype(jnp.bfloat16), E,
                           preferred_element_type=jnp.float32)

    run("onehot dot", lambda d: pl.pallas_call(
        k6,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(d), x)

    # 7. 3-D blocks (1, Y, X)
    x3 = jnp.asarray(rng.rand(4, 64, 128).astype(np.float32))

    def k7(i_ref, o_ref):
        o_ref[0] = i_ref[0] * 2.0

    run("3d blocks", lambda a: pl.pallas_call(
        k7, grid=(4,),
        in_specs=[pl.BlockSpec((1, 64, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 64, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 64, 128), jnp.float32))(a), x3)

    # 8. transcendentals (sqrt/sign/min) on VPU
    def k8(i_ref, o_ref):
        v = i_ref[:]
        o_ref[:] = jnp.sign(v) * jnp.minimum(jnp.sqrt(jnp.abs(v)), 0.9)

    run("vpu math", lambda a: pl.pallas_call(
        k8,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(a), x)

    # 9. 2-D grid
    def k9(i_ref, o_ref):
        o_ref[:] = i_ref[:] + 1.0

    run("2d grid", lambda a: pl.pallas_call(
        k9, grid=(4, 1),
        in_specs=[pl.BlockSpec((16, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(a), x)

    # 10. cost estimate arg
    run("cost estimate", lambda a: pl.pallas_call(
        k1, grid=(4,),
        in_specs=[pl.BlockSpec((16, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=1000, bytes_accessed=65536,
                                      transcendentals=0))(a), x)


if __name__ == "__main__":
    main()
