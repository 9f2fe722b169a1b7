"""Multi-host worker: a data-parallel VAE training step across processes.

One process of an N-process (DCN-connected) training job.  Every process
runs this identical program; ``parallel.distributed`` joins the cluster,
builds a global mesh, and each process contributes its local batch shard.
The jitted step is the REAL ``train_vae.make_train_step`` — XLA inserts the
gradient all-reduce across hosts.

Used by tests/test_multihost.py (2 CPU processes × 4 virtual devices must
bit-match 1 process × 8 devices) and by ``__graft_entry__.dryrun_multichip``
(multi-process mode).

Usage (per process):
  python tools/multihost_worker.py --coordinator 127.0.0.1:PORT \
      --num-processes N --process-id I --devices-per-process 4 \
      --out /tmp/result_I.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    # device count must be set before jax initializes
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count="
                               f"{args.devices_per_process}").strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dragposer_tpu import config as cfg
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.models import vae
    from dragposer_tpu.ops.topology import Skeleton
    from dragposer_tpu.parallel import distributed as dist
    from dragposer_tpu.parallel import mesh as meshlib
    from dragposer_tpu.train import vae as train_vae

    if args.num_processes > 1:
        dist.initialize(args.coordinator, args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes
    mesh = dist.global_mesh()  # all devices on the data axis

    # deterministic model + skeleton (identical on every process); pinned to
    # THIS process's device — once the cluster is up, unpinned eager results
    # span non-addressable devices and cannot be read back
    with jax.default_device(jax.local_devices()[0]):
        bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
        _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
        skeleton = Skeleton.build(parents, offsets, bvh.names)
        param = dict(cfg.VAE_PARAM)
        key = jax.random.PRNGKey(0)
        params = vae.init_params(key, skeleton.parents, param)
        statics = vae.build_statics(skeleton.parents, param)
        optimizer = train_vae.make_optimizer(param)
        opt_state = optimizer.init(params)
    train_step = train_vae.make_train_step(
        statics, skeleton, jnp.asarray(np.asarray(offsets)), param, True,
        optimizer)

    # deterministic GLOBAL synthetic batch; each process materializes only
    # its slice and contributes it to the global sharded array
    j = skeleton.n_joints
    t = param["window_size"]
    rng = np.random.default_rng(42)
    g_dqs = rng.normal(size=(args.batch, 2, j * 8, t)).astype(np.float32)
    g_disp = rng.normal(size=(args.batch, 2, 3, t)).astype(np.float32)
    sl = dist.process_slice(args.batch)
    dqs, disp = dist.shard_host_batch((g_dqs[sl], g_disp[sl]), mesh)
    params = meshlib.replicate(params, mesh)
    opt_state = meshlib.replicate(opt_state, mesh)
    mean_dqs = meshlib.replicate(jnp.zeros(j * 8), mesh)
    std_dqs = meshlib.replicate(jnp.ones(j * 8), mesh)

    # AOT-compile BEFORE the first collective executes, then barrier: on a
    # single shared CPU core the two processes compile serially and the
    # faster one would hit gloo's 30 s rendezvous deadline mid-execution.
    compiled = train_step.lower(
        params, opt_state, jax.random.PRNGKey(100), dqs, disp,
        mean_dqs, std_dqs).compile()
    if args.num_processes > 1:
        # coordination-service barrier (pure gRPC — device collectives would
        # themselves need the rendezvous we are waiting for)
        jax._src.distributed.global_state.client.wait_at_barrier(
            "compiled", timeout_in_ms=300_000)

    def fetch_replicated(x):
        # a global (replicated) array spans non-addressable devices in a
        # multi-process run; read this process's replica shard
        import numpy as np

        return float(np.asarray(x.addressable_data(0)))

    losses = []
    for i in range(args.steps):
        params, opt_state, total, _ = compiled(
            params, opt_state, jax.random.PRNGKey(100 + i), dqs, disp,
            mean_dqs, std_dqs)
        losses.append(fetch_replicated(total))

    fingerprint = fetch_replicated(jax.jit(
        lambda p: sum(jnp.sum(x.astype(jnp.float64) ** 2)
                      for x in jax.tree.leaves(p)))(params))
    result = {"process_id": args.process_id,
              "process_count": jax.process_count(),
              "global_devices": jax.device_count(),
              "losses": losses, "param_sq_norm": fingerprint}
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
