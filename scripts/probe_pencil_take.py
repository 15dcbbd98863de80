"""Probe: can row-takes replace one or both one-hot matmuls in the
pencil per-slice gather?

Per slice the pencil needs out[y,x] = D_B[round(ib[y]), round(ja[x])].
Current: two one-hot einsums (L-then-S), ~438M MAC/slice at full grid.
Variants probed over a 512-slice scan at reference scale
(SB=608, LB=896, Y=X=512):
  A) matmul both axes (current)
  B) take(D_B_T, ja, axis=0) -> (X, SB), then one-hot (X,SB)@(SB,Y)
     [159M MAC/slice + one row-take of 512 rows x 608 f32]
  C) take + transpose + take + transpose (no MXU at all)
Numerics: identical selections (same rounding), checked once vs A.
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.RandomState(0)

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(jnp.asarray(leaf).ravel()[0])

    def timeit(fn, *args, iters=5, warmup=2):
        for _ in range(warmup):
            sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        return (time.perf_counter() - t0) / iters

    Zs, Y, X = 512, 512, 512
    SB, LB = 608, 896
    D_B = jnp.asarray(rng.rand(SB, LB).astype(np.float32))
    # per-slice fractional coords (plausible pencil geometry: affine ramps)
    ja = jnp.asarray(
        (np.linspace(0, LB - 1, X)[None, :]
         * (0.6 + 0.4 * rng.rand(Zs, 1))).astype(np.float32))   # (Z, X)
    ib = jnp.asarray(
        (np.linspace(0, SB - 1, Y)[None, :]
         * (0.6 + 0.4 * rng.rand(Zs, 1))).astype(np.float32))   # (Z, Y)

    prec = jax.lax.Precision.DEFAULT

    def nearest_matrix(n, c):
        idx = jnp.floor(c + 0.5)
        rows = jax.lax.broadcasted_iota(jnp.float32, (n, c.shape[0]), 0)
        return (rows == idx[None, :]).astype(jnp.float32)

    def variant_a(D_B, ja, ib):
        def body(c, xs):
            jaz, ibz = xs
            Ecol = nearest_matrix(LB, jaz)               # (LB, X)
            Erow = nearest_matrix(SB, ibz)               # (SB, Y)
            tmp = jnp.einsum("sl,lx->sx", D_B, Ecol,
                             preferred_element_type=jnp.float32,
                             precision=prec)
            out = jnp.einsum("sx,sy->yx", tmp, Erow,
                             preferred_element_type=jnp.float32,
                             precision=prec)
            return c + out.sum(), None
        return jax.lax.scan(body, jnp.float32(0), (ja, ib))[0]

    def variant_b(D_B, ja, ib):
        D_T = D_B.T                                       # (LB, SB) once
        def body(c, xs):
            jaz, ibz = xs
            jr = jnp.clip(jnp.floor(jaz + 0.5), 0, LB - 1).astype(jnp.int32)
            A = jnp.take(D_T, jr, axis=0)                 # (X, SB) row-take
            Erow = nearest_matrix(SB, ibz)                # (SB, Y)
            out = jnp.einsum("xs,sy->yx", A, Erow,
                             preferred_element_type=jnp.float32,
                             precision=prec)
            return c + out.sum(), None
        return jax.lax.scan(body, jnp.float32(0), (ja, ib))[0]

    def variant_c(D_B, ja, ib):
        D_T = D_B.T
        def body(c, xs):
            jaz, ibz = xs
            jr = jnp.clip(jnp.floor(jaz + 0.5), 0, LB - 1).astype(jnp.int32)
            ir = jnp.clip(jnp.floor(ibz + 0.5), 0, SB - 1).astype(jnp.int32)
            A = jnp.take(D_T, jr, axis=0)                 # (X, SB)
            B = jnp.take(A.T, ir, axis=0)                 # (Y, X)... wait
            return c + B.sum(), None
        return jax.lax.scan(body, jnp.float32(0), (ja, ib))[0]

    fa = jax.jit(variant_a)
    fb = jax.jit(variant_b)
    fc = jax.jit(variant_c)

    # numerics check on 2 slices (CPU-free: compare on device, small)
    va = sync(fa(D_B, ja[:2], ib[:2]))
    vb = sync(fb(D_B, ja[:2], ib[:2]))
    vc = sync(fc(D_B, ja[:2], ib[:2]))
    print(f"checksums: A={va:.1f} B={vb:.1f} C={vc:.1f} "
          f"(match: {abs(va-vb)<1e-2*abs(va)} {abs(va-vc)<1e-2*abs(va)})",
          flush=True)

    for name, fn in [("A matmul+matmul", fa), ("B take+matmul", fb),
                     ("C take+take", fc)]:
        dt = timeit(fn, D_B, ja, ib)
        print(f"{name}: {dt*1e3:.1f} ms ({dt*1e3/Zs*1e3:.0f} us/slice)",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
