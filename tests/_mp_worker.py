"""Worker for the multi-process (DCN) smoke test.

Run as: python tests/_mp_worker.py <process_id> <num_processes> <port>

Each process provisions 2 virtual CPU devices, joins a gloo-backed
jax.distributed cluster (the CPU stand-in for a multi-host TPU slice's DCN),
and runs ONE data-parallel train step of the flagship trainer over the
global 2x2-device mesh: params replicated, batch assembled from
process-local shards via jax.make_array_from_process_local_data +
local_batch_slice, gradient all-reduce crossing the process boundary.

This is the multi-host analog of __graft_entry__.dryrun_multichip (which is
single-process): it validates that the same global-view jitted step runs
unchanged when the mesh spans processes, i.e. the reference's
single-process DataParallel surface (reference train.py:205) generalizes to
multi-host DP with no code changes.
"""

import os
import sys


def main() -> None:
    process_id, num_processes, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # gloo: XLA's cross-process CPU collective backend (the DCN stand-in)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from eghmd_tpu.parallel.mesh import (
        initialize_distributed, make_mesh, batch_sharding, local_batch_slice,
    )

    # must NOT touch the backend before this call (regression: a
    # jax.process_count() guard used to initialize the backend and silently
    # degrade the cluster to two 1-process runs)
    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()

    import numpy as np
    import jax.numpy as jnp

    from eghmd_tpu.config import ExperimentConfig
    from eghmd_tpu.data import SyntheticEyeDataset
    from eghmd_tpu.data.pipeline import collate
    from eghmd_tpu.models import ESFNet
    from eghmd_tpu.models.blocks import LinStack
    from eghmd_tpu.training import Trainer

    n_global = len(jax.devices())
    assert n_global == 2 * num_processes, n_global

    cfg = ExperimentConfig(setting="baseline_edge", epochs=2,
                           batchsize=n_global, mesh_shape=(n_global,),
                           image_size=(176, 192), disentangle=True)
    model = ESFNet(setting=cfg.variant)
    trainer = Trainer(cfg, model,
                      ds_head=LinStack(64, 2, num_layers=2, act=False),
                      log_fn=None)
    mesh = trainer.mesh
    sharding = batch_sharding(mesh)

    # every process loads only ITS slice of the global batch (the multi-host
    # input-pipeline contract), deterministically from the shared dataset
    ds = SyntheticEyeDataset(n_global, (176, 192), seed=0)
    start, size = local_batch_slice(n_global, mesh)
    local = collate([ds[i] for i in range(start, start + size)])
    batch = {
        k: jax.make_array_from_process_local_data(sharding, v, (n_global,) + v.shape[1:])
        for k, v in local.items()
    }

    state = trainer.init_state(batch)
    state, metrics = trainer.train_step(state, batch, 0.5)
    jax.block_until_ready(state.params)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated
    # the loss is a global (replicated) scalar: every process must read the
    # SAME value, proving the gradient all-reduce crossed the process
    # boundary rather than each process training on its local shard alone
    print(f"MPOK process={process_id} loss={loss:.6f}", flush=True)

    # --- sharded SERVING step across the same cluster (VERDICT r3 #8):
    # the serving path is the product; mirror what dryrun_multichip
    # validates single-process. Frames batch-sharded over 'data' (each
    # process feeding only ITS slice), weights replicated, one jitted
    # dual-eye step; the cross-process checksum is a GLOBAL reduction over
    # the sharded outputs, so XLA must move eye predictions over the
    # process boundary for both workers to read the same value.
    from eghmd_tpu.inference.serving import build_serving_step
    from eghmd_tpu.parallel import replicated_sharding

    step, s_vars, bdcn_vars = build_serving_step(
        dtype=jnp.float32, eye_size=(176, 192), frame_size=(176, 384))
    s_vars = jax.device_put(s_vars, replicated_sharding(mesh))
    bdcn_vars = jax.device_put(bdcn_vars, replicated_sharding(mesh))
    frames_global = np.random.RandomState(0).rand(
        n_global, 176, 384).astype(np.float32)
    frames = jax.make_array_from_process_local_data(
        sharding, frames_global[start:start + size], frames_global.shape)

    def serve_and_sum(s_vars, bdcn_vars, frames):
        seg, iris_px, pupil_px = step(s_vars, bdcn_vars, frames)
        return (jnp.sum(pupil_px[:, :2]) + jnp.sum(iris_px[:, :2]),
                jnp.sum(seg.astype(jnp.int32)))

    csum, segsum = jax.jit(serve_and_sum)(s_vars, bdcn_vars, frames)
    csum, segsum = float(csum), int(segsum)
    assert np.isfinite(csum), csum
    print(f"MPSERVE process={process_id} checksum={csum:.6f} "
          f"segsum={segsum}", flush=True)


if __name__ == "__main__":
    main()
