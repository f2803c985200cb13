"""Mixed-precision dot_general on TPU: is (DEFAULT, HIGHEST) f32-exact when
the DEFAULT-side operand is 0/1, and how much faster than HIGHEST/HIGHEST?

The segsum/expand kernels contract a 0/1 one-hot (exact in one bf16 pass)
against f32 gradient columns (needs the bf16x3 split). If XLA honors
per-operand precision, 3 passes replace 6-9.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    B, C = 256, 128
    onehot_np = np.zeros((B, B), np.float32)
    onehot_np[np.arange(B), rng.integers(0, B, B)] = 1.0
    vals_np = (rng.standard_normal((B, C)) * np.exp(
        rng.uniform(-20, 20, (B, C))
    )).astype(np.float32)
    onehot = jnp.asarray(onehot_np)
    vals = jnp.asarray(vals_np)
    want = onehot_np.T @ vals_np  # f64-free: products are exact selections

    dims = (((0,), (0,)), ((), ()))
    for name, prec in [
        ("HIGHEST,HIGHEST", (lax.Precision.HIGHEST, lax.Precision.HIGHEST)),
        ("DEFAULT,HIGHEST", (lax.Precision.DEFAULT, lax.Precision.HIGHEST)),
        ("HIGHEST,DEFAULT", (lax.Precision.HIGHEST, lax.Precision.DEFAULT)),
        ("DEFAULT,DEFAULT", (lax.Precision.DEFAULT, lax.Precision.DEFAULT)),
    ]:
        out = np.asarray(
            jax.jit(
                lambda a, b: lax.dot_general(
                    a, b, dims, precision=prec,
                    preferred_element_type=jnp.float32,
                )
            )(onehot, vals)
        )
        exact = bool((out == want).all())
        maxrel = float(
            np.nanmax(np.abs(out - want) / np.maximum(np.abs(want), 1e-30))
        )
        print(json.dumps({"prec": name, "exact": exact, "maxrel": maxrel}),
              flush=True)

    # timing at segsum shape: (B,B) x (B,128) chained R times
    R = 30
    NBLK = 2048  # simulate 2048 blocks back to back

    for name, prec in [
        ("HIGHEST,HIGHEST", (lax.Precision.HIGHEST, lax.Precision.HIGHEST)),
        ("DEFAULT,HIGHEST", (lax.Precision.DEFAULT, lax.Precision.HIGHEST)),
    ]:
        @jax.jit
        def run(c0, oh, v):
            def body(_, c):
                def blk(k, acc):
                    return acc + lax.dot_general(
                        oh, v + acc[0, 0], (((0,), (0,)), ((), ())),
                        precision=prec, preferred_element_type=jnp.float32,
                    )
                return blk(0, jnp.zeros((B, C), jnp.float32))[0, 0] + c

            return lax.fori_loop(0, R, body, c0)

        # matmul-bound loop: NBLK chained matmuls
        @jax.jit
        def run2(c0, oh, v):
            def body(_, carry):
                return lax.dot_general(
                    oh, carry, (((0,), (0,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32,
                )
            out = lax.fori_loop(0, NBLK, body, v + c0)
            return out[0, 0]

        float(run2(jnp.float32(0), onehot, vals))
        t0 = time.time()
        float(run2(jnp.float32(1), onehot, vals))
        ms = (time.time() - t0) * 1e3
        print(json.dumps({"prec": name, "chained_ms": round(ms, 2),
                          "per_matmul_us": round(ms * 1e3 / NBLK, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
