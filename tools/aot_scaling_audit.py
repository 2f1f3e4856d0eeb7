"""AOT multi-chip scaling audit — collectives from compiled HLO.

One real chip is available, so the >=85% 1->N scaling-efficiency target
cannot be measured directly.  This tool does everything short of
hardware: it AOT-compiles the flagship trainer step and the sharded
gated deployment driver for a REAL 16-chip TPU topology
(jax.experimental.topologies), parses every collective out of the
optimized HLO (op, operand bytes, replica groups, whether it sits
inside the scan body), and combines the per-step collective bytes with
the published ICI bandwidth and the measured single-chip step times
(BENCH) into a roofline prediction of scaling efficiency.

Writes SCALING_r05.json; SCALING_r05.md narrates the result.

Cost model (jax-ml.github.io/scaling-book): on an N-chip ring/torus,
  all-gather of B bytes (per-shard b = B/N): each chip receives
    (N-1)/N * B bytes            -> time = B * (N-1)/N / W_ici
  all-reduce of B bytes: 2x the all-gather's wire traffic
    (reduce-scatter + all-gather) -> time = 2 * B * (N-1)/N / W_ici
with W_ici the per-chip ICI bandwidth.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

# Published per-chip ICI bandwidth (bytes/s, bidirectional):
# TPU v5p: 4,800 Gbit/s inter-chip interconnect per chip (Google Cloud
# TPU v5p spec sheet) = 600 GB/s.
V5P_ICI_BYTES_PER_S = 600e9

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string like 'f32[1048576,20]{1,0}'
    or a tuple '(f32[8,3], f32[])'."""
    total = 0
    for m in re.finditer(r"(\w+)\[([0-9,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def per_step_collectives(hlo_text: str):
    """(per_step, per_call) collective census with computation
    attribution: HLO computations start at column 0 (instructions are
    indented), while instructions name their body computation, and
    fusions/calls form edges — every collective in a computation
    reachable from a while body executes once per scanned STEP, the
    rest once per call."""
    comps = {}   # computation -> [{op, bytes, line}]
    edges = {}   # computation -> called computations
    bodies = set()
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"^(ENTRY\s+)?%([\w.\-]+)\s*\(", line)
        if m and line.rstrip().endswith("{"):
            cur = m.group(2)
            comps.setdefault(cur, [])
            edges.setdefault(cur, set())
            continue
        if cur is None:
            continue
        for attr in ("calls", "to_apply", "body", "condition"):
            for b in re.finditer(attr + r"=%?([\w.\-]+)", line):
                edges[cur].add(b.group(1))
                if attr == "body":
                    bodies.add(b.group(1))
        for b in re.finditer(r"branch_computations=\{([^}]*)\}", line):
            for nm in re.findall(r"%?([\w.\-]+)", b.group(1)):
                edges[cur].add(nm)
        m = re.search(
            r"=\s*(.+?)\s+(all-reduce|all-gather|reduce-scatter|"
            r"collective-permute|all-to-all)\(", line)
        if m:
            comps[cur].append({"op": m.group(2),
                               "bytes": _shape_bytes(m.group(1)),
                               "line": line.strip()[:200]})
    reach = set()
    stack = list(bodies)
    while stack:
        c = stack.pop()
        if c in reach:
            continue
        reach.add(c)
        stack.extend(edges.get(c, ()))
    per_step = [c for nm in reach for c in comps.get(nm, [])]
    per_call = [c for nm in comps if nm not in reach
                for c in comps[nm]]
    return per_step, per_call


def collective_seconds(col, n_chips: int, w_ici: float) -> float:
    frac = (n_chips - 1) / n_chips
    if col["op"] == "all-reduce":
        return 2.0 * col["bytes"] * frac / w_ici
    if col["op"] in ("all-gather", "reduce-scatter"):
        return col["bytes"] * frac / w_ici
    if col["op"] == "collective-permute":
        return col["bytes"] / w_ici
    return col["bytes"] * frac / w_ici


def build_topology_mesh(n_chips: int = 16):
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh

    names = [f"v5:{spec}" for spec in ("4x2x2", "2x2x2x2")] + ["v5:4x4"]
    last = None
    for name in names:
        try:
            topo = topologies.get_topology_desc(platform="tpu",
                                                topology_name=name)
            if len(topo.devices) == n_chips:
                return Mesh(np.array(topo.devices).reshape(-1), ("env",)), \
                    name
        except Exception as e:  # keep probing
            last = e
    raise RuntimeError(f"no {n_chips}-chip topology found: {last}")


def audit_trainer(mesh, batch_per_device: int, store_per_device: int):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dcarl_tpu.config import DCARLConfig, driving_store_config
    from dcarl_tpu.train_fast import make_trainer_fast

    cfg = DCARLConfig(store=driving_store_config())
    init_fn, step_fn, _, run_factory = make_trainer_fast(
        mesh, "env", cfg,
        batch_per_device=batch_per_device,
        store_capacity_per_device=store_per_device,
        replay_capacity_per_device=store_per_device,
        backfill_budget_per_step=max(2048, batch_per_device // 4),
        use_pallas=True,  # the deployment configuration: Mosaic AOT
    )
    # abstract state: shapes from a CPU eval_shape of the pure init,
    # shardings from the trainer's own placement tree
    state_shapes = jax.eval_shape(init_fn)
    shard = NamedSharding(mesh, P("env"))
    repl = NamedSharding(mesh, P())

    def with_sharding(sds):
        # leaves whose first axis is the shard axis (size s_shards=1
        # per-device rows) — the trainer shards every stateful leaf on
        # axis 0 except the replicated learner fields
        return sds

    # the trainer's own out_shardings tree tells us exactly which
    # leaves replicate; rebuild SDS with shardings attached
    tree = state_shapes
    import dcarl_tpu.train_fast as TF

    def sds(x, s):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

    n_shards = mesh.shape["env"]
    sharded = TF.FastTrainState(
        env=jax.tree.map(lambda x: sds(x, shard), tree.env),
        obs_ori=sds(tree.obs_ori, shard),
        traj_obs=sds(tree.traj_obs, shard),
        traj_act=sds(tree.traj_act, shard),
        traj_rew=sds(tree.traj_rew, shard),
        traj_len=sds(tree.traj_len, shard),
        store_keys=sds(tree.store_keys, shard),
        store_actions=sds(tree.store_actions, shard),
        store_values=sds(tree.store_values, shard),
        store_size=sds(tree.store_size, shard),
        store_head=sds(tree.store_head, shard),
        store_total=sds(tree.store_total, shard),
        replay=jax.tree.map(lambda x: sds(x, shard), tree.replay),
        params=jax.tree.map(lambda x: sds(x, repl), tree.params),
        target_params=jax.tree.map(lambda x: sds(x, repl),
                                   tree.target_params),
        opt_state=jax.tree.map(lambda x: sds(x, repl), tree.opt_state),
        frame=sds(tree.frame, repl),
    )
    key = jax.ShapeDtypeStruct((2,), jax.numpy.uint32, sharding=repl)
    run_fn = run_factory(9)
    return run_fn.lower(sharded, key).compile().as_text(), 9


def audit_gated(mesh, n_envs_per_device: int, store_rows_per_device: int,
                steps: int):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dcarl_tpu.config import EnvConfig, driving_store_config
    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.planning.fast_rollout import make_gated_driver_sharded

    env_cfg = EnvConfig()
    scfg = driving_store_config()
    sc = t_intersection(env_cfg)
    init_s, run_s = make_gated_driver_sharded(
        sc, mesh, "env", env_cfg, store_cfg=scfg, use_pallas=True)

    n = mesh.shape["env"]
    b = n * n_envs_per_device
    rows = n * store_rows_per_device
    d = env_cfg.state_dim + 1
    shard = NamedSharding(mesh, P("env"))
    lane = NamedSharding(mesh, P(None, "env"))
    repl = NamedSharding(mesh, P())

    keys = jax.ShapeDtypeStruct((b, 2), jnp.uint32, sharding=shard)
    carry = jax.eval_shape(
        lambda k: init_s(k), jax.ShapeDtypeStruct((b, 2), jnp.uint32))

    def place(x):
        if x.ndim == 0:
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=repl)
        spec = P(*([None] * (x.ndim - 1) + ["env"]))
        return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                    sharding=NamedSharding(mesh, spec))

    carry_sds = jax.tree.map(place, carry)
    sk = jax.ShapeDtypeStruct((steps, 2), jnp.uint32, sharding=repl)
    s_keys = jax.ShapeDtypeStruct((rows, d), jnp.float32, sharding=shard)
    s_vals = jax.ShapeDtypeStruct((rows,), jnp.float32, sharding=shard)
    s_valid = jax.ShapeDtypeStruct((rows,), jnp.bool_, sharding=shard)

    sk = jax.ShapeDtypeStruct((steps, 2), jnp.uint32, sharding=repl)
    return run_s.lower(carry_sds, sk, s_keys, s_vals,
                       s_valid).compile().as_text(), steps


def summarize(name, hlo, steps_per_call, n_chips,
              step_seconds_1chip, per_chip_work_note):
    per_step, per_call = per_step_collectives(hlo)
    bytes_step = sum(c["bytes"] for c in per_step)
    t_coll = sum(collective_seconds(c, n_chips, V5P_ICI_BYTES_PER_S)
                 for c in per_step)
    # one-time (per-call) collectives amortize over the scanned steps
    t_coll += sum(collective_seconds(c, n_chips, V5P_ICI_BYTES_PER_S)
                  for c in per_call) / steps_per_call
    eff = step_seconds_1chip / (step_seconds_1chip + t_coll)
    return {
        "program": name,
        "n_chips": n_chips,
        "collectives_per_step": [
            {"op": c["op"], "bytes": c["bytes"]} for c in per_step],
        "collectives_per_call": [
            {"op": c["op"], "bytes": c["bytes"]} for c in per_call],
        "collective_bytes_per_step": bytes_step,
        "ici_bytes_per_s": V5P_ICI_BYTES_PER_S,
        "collective_seconds_per_step": t_coll,
        "measured_1chip_step_seconds": step_seconds_1chip,
        "predicted_scaling_efficiency": eff,
        "per_chip_work": per_chip_work_note,
        "hlo_lines": [c["line"] for c in per_step + per_call],
    }


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    mesh, topo_name = build_topology_mesh(16)
    n = 16

    # measured single-chip step times (BENCH r05 configs)
    bench = {}
    for f in ("BENCH_r05.json", "BENCH_r04.json"):
        p = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), f)
        if os.path.exists(p):
            with open(p) as fh:
                bench = json.load(fh).get("parsed", json.load(open(p)))
            break
    train_rate = bench.get("train_env_steps_per_s", 2.18e6)
    train_batch = bench.get("train_batch", 32768)
    gated_rate = bench.get("gated_env_steps_per_s", 5.36e6)
    gated_batch = bench.get("gated_batch", 65536)

    results = {"topology": topo_name, "n_chips": n}

    print(f"[audit] AOT-compiling trainer for {topo_name} ...",
          flush=True)
    h9, spc = audit_trainer(mesh, batch_per_device=train_batch,
                            store_per_device=1 << 16)
    results["trainer"] = summarize(
        "integrated trainer (train_fast)", h9, spc, n,
        train_batch / train_rate,
        "per-chip query work is B_global x N_rows/chips = B_local x "
        "N_rows: constant in chip count; env/planning/TD work "
        "partitions cleanly")

    print("[audit] AOT-compiling sharded gated driver ...", flush=True)
    g9, steps = audit_gated(mesh, n_envs_per_device=gated_batch,
                            store_rows_per_device=(1 << 18) // 16,
                            steps=8)
    results["gated_driver"] = summarize(
        "sharded gated deployment driver", g9, steps, n,
        gated_batch / gated_rate,
        "per-chip query work is B_global x N_rows/chips = B_local x "
        "N_rows: constant in chip count; planning/env partition "
        "cleanly")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r05.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: (v if not isinstance(v, dict) else {
        kk: vv for kk, vv in v.items() if kk != "hlo_lines"})
        for k, v in results.items()}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
