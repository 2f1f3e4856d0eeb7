"""Multi-host integrated DCARL training launcher.

The reference scales learning with mpirun + MpiAdam allreduce
(common/mpi_adam.py:8-121) and env processes over pipes
(subproc_vec_env.py:10-47).  Here the whole loop is one SPMD program:
every host process joins jax.distributed, the env batch and confidence
store shard over a global host-major mesh, and the per-step collectives
(store-moment psum, gradient pmean) ride ICI.

Launch on a v5p-16 (4 hosts x 4 chips), same command on every host:

    DCARL_NUM_PROCESSES=4 DCARL_PROCESS_ID=<rank> \
    DCARL_COORDINATOR=<host0-ip>:8476 \
    python examples/train_multihost.py --steps 1000 --batch-per-device 4096

On a Cloud TPU pod runtime the env vars can be omitted
(`initialize_from_env(require=True)` auto-detects).  A 1-process smoke
run (tests/test_multihost.py runs this on CPU):

    DCARL_NUM_PROCESSES=1 python examples/train_multihost.py --smoke
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--batch-per-device", type=int, default=1024)
    p.add_argument("--store-capacity", type=int, default=1 << 15)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes for a CPU smoke run")
    args = p.parse_args()

    from dcarl_tpu.parallel.distributed import (host_device_mesh,
                                                initialize_from_env)

    n_proc = initialize_from_env()

    import jax

    from dcarl_tpu.config import DCARLConfig, DQNConfig, driving_store_config
    from dcarl_tpu.train_fast import make_trainer_fast

    if args.smoke:
        args.batch_per_device = 2
        args.store_capacity = 256
        args.steps = 8
        args.chunk = 4

    mesh = host_device_mesh("env")
    cfg = DCARLConfig(
        dqn=DQNConfig(batch_size=4 if args.smoke else 32,
                      replay_capacity=args.store_capacity),
        store=driving_store_config(),
    )
    init_fn, _, _, run_factory = make_trainer_fast(
        mesh, "env", cfg,
        batch_per_device=args.batch_per_device,
        store_capacity_per_device=args.store_capacity,
        replay_capacity_per_device=args.store_capacity,
        use_pallas=None if not args.smoke else False,
    )
    run_fn = run_factory(args.chunk)
    state = init_fn(seed=args.seed)

    key = jax.random.PRNGKey(args.seed + 1)
    for i in range(args.steps // args.chunk):
        key, sub = jax.random.split(key)
        state, metrics = run_fn(state, sub)
        if jax.process_index() == 0:
            tail = {k: float(jax.device_get(v)[-1])
                    for k, v in metrics._asdict().items()}
            print(json.dumps({
                "processes": n_proc,
                "devices": len(jax.devices()),
                "step": (i + 1) * args.chunk,
                **tail,
            }), flush=True)


if __name__ == "__main__":
    main()
