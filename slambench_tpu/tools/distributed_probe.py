"""Live multi-process collective probe: the DCN demonstration.

The reference is strictly single-process/single-device (SURVEY.md §5.8
— no MPI/NCCL exists there); this framework's multi-host design
(parallel/distributed.py + parallel/step.py) is therefore a new
obligation, and this tool is its *executed* evidence: N OS processes —
each the analogue of one TPU host — initialize ``jax.distributed``
against a shared coordinator, form ONE global device mesh, and run

  1. a ``psum`` across every global device (the ICP normal-equations
     reduction path, parallel/step.py),
  2. a ``ppermute`` ring shift (the TSDF halo-exchange path,
     ShardedKFusion._halo_exchange),
  3. optionally (``--full-step``) a complete tiny-shape sharded
     pipeline step with every phase live — the same recipe as
     ``__graft_entry__.dryrun_multichip`` but spanning processes, so
     every cross-slab collective rides the inter-process (gRPC ≙ DCN)
     transport instead of intra-process threads.

Each process prints one JSON line; the parent (tests/test_distributed.py
or a human) asserts the collective results. Run by hand:

  for i in 0 1; do
    JAX_PLATFORM_NAME=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python -m slambench_tpu.tools.distributed_probe \
      --coordinator localhost:9731 --num-processes 2 --process-id $i &
  done; wait
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--full-step", action="store_true",
                    help="also run one complete sharded pipeline step "
                         "(tiny shapes) over the global mesh")
    args = ap.parse_args(argv)

    # CPU backend with the per-process virtual device count; must happen
    # before backend init (CLAUDE.md: JAX_PLATFORMS env is overridden by
    # the axon plugin — use the config key).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from slambench_tpu.parallel import distributed

    active = distributed.initialize(args.coordinator, args.num_processes,
                                    args.process_id)
    if not active:
        print(json.dumps({"error": "distributed init inactive"}))
        return 1

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from slambench_tpu.parallel.mesh import make_mesh

    n_local = jax.local_device_count()
    n_global = jax.device_count()
    mesh = make_mesh(n_global)
    axis = mesh.axis_names[0]

    # -- 1. psum across every global device (ICP-reduction path) ------- #
    ranks = jax.device_put(
        np.arange(n_global, dtype=np.float32),
        NamedSharding(mesh, P(axis)))

    @jax.jit
    def psum_all(v):
        return jax.shard_map(lambda x: jax.lax.psum(x, axis), mesh=mesh,
                             in_specs=P(axis), out_specs=P())(v)

    total = float(np.asarray(psum_all(ranks))[0])
    want_total = float(sum(range(n_global)))

    # -- 2. ppermute ring shift (halo-exchange path) ------------------- #
    perm = [(i, (i + 1) % n_global) for i in range(n_global)]

    @jax.jit
    def ring(v):
        return jax.shard_map(
            lambda x: jax.lax.ppermute(x, axis, perm), mesh=mesh,
            in_specs=P(axis), out_specs=P(axis))(v)

    shifted = ring(ranks)
    # Each process can only read its addressable shards; check those.
    ring_ok = True
    for s in shifted.addressable_shards:
        got = float(np.asarray(s.data)[0])
        src = (s.index[0].start - 1) % n_global
        ring_ok = ring_ok and got == float(src)

    # -- 3. optional full sharded pipeline step ------------------------ #
    step_ok = None
    if args.full_step:
        from slambench_tpu.parallel.step import ShardedKFusion

        W, H = 64, 48
        kf = ShardedKFusion(
            computation_size=(W, H),
            volume_resolution=(32, 32, 32),
            volume_dimensions=(4.8, 4.8, 4.8),
            init_pose=(0.34 * 4.8, 0.5 * 4.8, 0.24 * 4.8),
            pyramid=(3, 2, 2),
            camera=(481.2 / 10, 480.0 / 10, 32.0, 24.0),
            mu=0.1,
            mesh=mesh,
        )
        state = kf.init_state()
        u, v = np.meshgrid(np.arange(W), np.arange(H))
        depth = (1500 + 400 * np.sin(u / 9.0) * np.cos(v / 9.0)) \
            .astype(np.uint16)
        depth = jax.device_put(jnp.asarray(depth),
                               NamedSharding(mesh, P()))
        state = kf._sharded_step(
            state, depth, tracking_on=True, integrate_frame=True,
            force_integrate=True, raycast_on=True)
        jax.block_until_ready(state)
        # pose is replicated — every process sees the full value.
        step_ok = bool(np.isfinite(np.asarray(state.pose)).all())

    print(json.dumps({
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": n_local,
        "global_devices": n_global,
        "psum": total,
        "psum_want": want_total,
        "ring_ok": ring_ok,
        "full_step_pose_finite": step_ok,
    }))
    ok = total == want_total and ring_ok and step_ok in (None, True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
