"""Subprocess worker for the 2-process jax.distributed test.

Run as: python tests/dist_worker.py <process_id> <num_processes> <port>

Exercises the multi-host bring-up path the reference gets from NCCL
(megapose/utils/distributed.py:37-151): explicit coordinator init, config
broadcast (replacing rank-0 file-system sync), barrier, and ONE sharded
train step over a global 2-device mesh with per-process local data
(replacing DDP's gradient all-reduce).
"""

import os
import sys

# each process contributes exactly ONE local CPU device to the global mesh
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from picopose_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=f"localhost:{port}", num_processes=n, process_id=pid
    )
    assert dist.is_initialized()
    assert jax.process_count() == n, jax.process_count()
    assert jax.process_index() == pid

    # ---- broadcast_host_data: process-0 payload must reach everyone
    from picopose_tpu.parallel.mesh import make_mesh, replicated

    mesh = make_mesh(n_data=n)
    payload = {"lr": np.float32(0.5 if pid == 0 else -1.0),
               "w": np.full(3, 7.0 if pid == 0 else -1.0, np.float32)}
    got = dist.broadcast_host_data(payload, mesh)
    assert float(got["lr"]) == 0.5, got
    assert np.all(np.asarray(got["w"]) == 7.0), got

    dist.all_hosts_barrier("after-broadcast")

    # ---- one sharded train step on the global mesh, per-process local batch
    import jax.numpy as jnp

    from picopose_tpu.models import PicoPose
    from picopose_tpu.train.step import init_state, make_optimizer, train_step

    crop, grid_img = 112, 64
    model = PicoPose(
        vit_type="dinov2_vits14", blocks_to_take=(1, 3, 5, 7),
        compute_dtype=jnp.float32,
    )
    tx = make_optimizer(max_iters=100)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch_size=1, crop=crop)
    state = jax.device_put(state, replicated(mesh))

    B = n  # global batch: one sample per process
    rng = np.random.default_rng(0)  # same seed -> same global batch everywhere
    eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    pose_r = eye4.copy(); pose_r[:, 2, 3] = 0.6
    pose_t = eye4.copy(); pose_t[:, 2, 3] = 0.5
    K = np.broadcast_to(
        np.array([[280.0, 0, 56.0], [0, 280.0, 56.0], [0, 0, 1.0]], np.float32),
        (B, 3, 3),
    ).copy()
    M = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
    batch_np = {
        "real_rgb": rng.normal(size=(B, crop, crop, 3)).astype(np.float32),
        "tem_rgb": rng.normal(size=(B, crop, crop, 3)).astype(np.float32),
        "real_mask": np.ones((B, crop, crop), np.float32),
        "tem_mask": np.ones((B, crop, crop), np.float32),
        "real_M": M, "tem_M": M.copy(),
        "real_K": K, "tem_K": K.copy(),
        "real_pose": pose_r, "tem_pose": pose_t,
        "real_full_depth": np.full((B, grid_img, grid_img), 0.6, np.float32),
        "tem_full_depth": np.full((B, grid_img, grid_img), 0.5, np.float32),
    }
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.make_array_from_process_local_data(sh, v[pid : pid + 1], v.shape)
        for k, v in batch_np.items()
    }

    with mesh:
        new_state, losses = train_step(model, tx, state, batch, jax.random.PRNGKey(1))
        loss = float(losses["loss"])
    assert np.isfinite(loss), loss
    assert int(new_state.step) == 1

    # the local replica of one parameter, to compare across processes on host
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    local = np.asarray(leaf.addressable_shards[0].data)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local)
    assert np.array_equal(gathered[0], gathered[1]), "replica divergence after step"

    dist.all_hosts_barrier("done")
    print(f"DIST_OK pid={pid} loss={loss:.4f}")


if __name__ == "__main__":
    main()
