"""Worker for tests/test_multihost.py: one of 2 jax.distributed processes.

Run as: python tests/_multihost_worker.py <process_id> <coordinator_port>
Exercises parallel/multihost end-to-end on a 2-process x 2-device CPU mesh:
initialize -> global mesh -> local_batch_slice -> cross-host-identical
densify_rng (verified through a real cross-process collective) -> one
data-parallel train step over the global mesh.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
proc_id, port = int(sys.argv[1]), int(sys.argv[2])
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(proc_id)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from simplegaussiansplat_tk71_tpu.parallel import multihost  # noqa: E402


def main():
    assert multihost.maybe_initialize_distributed(), "initialize failed"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 4

    mesh = multihost.global_mesh("data")
    assert mesh.shape["data"] == 4

    # local batch slices: disjoint equal shards per host
    sl = multihost.local_batch_slice(8)
    assert sl == slice(proc_id * 4, proc_id * 4 + 4), sl

    # densify_rng must be identical across hosts: sum each host's draw
    # through a REAL cross-process collective and compare against
    # n_processes * local draw
    draw = multihost.densify_rng(step=700, seed=3).normal(size=8)
    local = np.tile(np.asarray(draw, np.float32), (2, 1))  # (local_devs, 8)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (4, 8)
    )
    total = jax.jit(
        lambda x: jnp.sum(x, axis=0),
        out_shardings=NamedSharding(mesh, P()),
    )(garr)
    np.testing.assert_allclose(
        np.asarray(total), 4.0 * draw, rtol=1e-6
    )  # would fail if any host drew a different stream

    # one REAL data-parallel train step over the global (2-host) mesh:
    # every host builds the same tiny scene; cameras shard over the 4
    # devices (2 per host), params/stats replicate, grads psum over DCN.
    from test_train import _synthetic_scene  # noqa: E402
    from simplegaussiansplat_tk71_tpu.models.gaussians import (  # noqa: E402
        init_from_points,
    )
    from simplegaussiansplat_tk71_tpu.parallel.sharding import (  # noqa: E402
        make_sharded_train_step,
    )
    from simplegaussiansplat_tk71_tpu.adaptive.densify import (  # noqa: E402
        DensifyStats,
    )
    from simplegaussiansplat_tk71_tpu.render import RenderConfig  # noqa: E402
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig  # noqa: E402
    from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer  # noqa: E402

    gt, scene, images = _synthetic_scene(n=20, n_cams=4, W=32, H=32)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
    )
    cfg = TrainConfig(tile_size=16, max_per_tile=32, tile_chunk=2)
    rcfg = RenderConfig(tile_size=16, max_per_tile=32, tile_chunk=2)
    optimizer = make_optimizer(cfg)
    step = make_sharded_train_step(mesh, cfg, rcfg, (32, 32), optimizer)

    repl = NamedSharding(mesh, P())
    put_repl = lambda t: jax.tree.map(lambda x: jax.device_put(x, repl), t)
    params = put_repl(model.trainable())
    alive = jax.device_put(model.alive, repl)
    opt_state = put_repl(optimizer.init(model.trainable()))
    stats = put_repl(DensifyStats.zeros(model.capacity))

    def shard_cams(x):  # each host feeds its local camera slice
        loc = np.asarray(x)[multihost.local_batch_slice(4)]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), loc, x.shape
        )

    Pm = shard_cams(scene.P)
    Km = shard_cams(scene.K)
    target = shard_cams(images)
    params2, opt_state, stats, metrics = step(
        params, alive, opt_state, stats, Pm, Km, target
    )
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), loss
    # params actually moved, identically on every host (replicated out-spec)
    delta = float(
        jnp.max(jnp.abs(params2["mean"] - params["mean"]))
    )
    assert delta > 0.0
    g2 = float(jnp.sum(stats.grad2d_accum))
    assert np.isfinite(g2) and g2 > 0.0
    print(f"proc {proc_id}: ok loss={loss:.5f} dmean={delta:.2e} g2={g2:.2e}")


if __name__ == "__main__":
    main()
