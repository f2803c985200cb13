"""Is narrow-minor (N, C) vs (C, N) layout a real elementwise tax on v5e?"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
R = 10

def main():
    import jax, jax.numpy as jnp
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    N = 1_000_000
    rng = np.random.default_rng(0)
    overhead = [0.0]

    def bench(name, body, args):
        @jax.jit
        def run(c0, *a):
            return jax.lax.fori_loop(0, R, lambda _, c: body(c, *a), c0)
        float(run(jnp.int32(0), *args))
        t0 = time.time()
        float(run(jnp.int32(1), *args))
        ms = ((time.time() - t0) * 1e3 - overhead[0]) / R
        print(json.dumps({"stage": name, "ms": round(ms, 2)}), flush=True)

    x = jnp.asarray(rng.normal(size=(N, 1)).astype(np.float32))
    @jax.jit
    def noop(c0, x):
        return jax.lax.fori_loop(0, R, lambda _, c: c + x[0, 0].astype(jnp.int32) % 2, c0)
    float(noop(jnp.int32(0), x)); t0 = time.time(); float(noop(jnp.int32(1), x))
    overhead[0] = (time.time() - t0) * 1e3
    print("overhead", overhead[0], file=sys.stderr, flush=True)

    def adamish(c, p, g, m, v):
        g = g + (c % 2).astype(jnp.float32) * 1e-6
        m2 = 0.9 * m + 0.1 * g
        v2 = 0.999 * v + 0.001 * g * g
        p2 = p - 0.01 * m2 * jax.lax.rsqrt(v2 + 1e-8)
        return (p2.reshape(-1)[::8191].sum()).astype(jnp.int32) % 5 + c

    for shape, tag in (((N, 3), "Nx3"), ((3, N), "3xN"), ((N, 27), "Nx27"),
                       ((27, N), "27xN"), ((N * 3,), "flatN3")):
        arrs = [jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(4)]
        bench(f"adamish_{tag}", adamish, tuple(arrs))

if __name__ == "__main__":
    main()
