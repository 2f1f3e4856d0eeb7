"""Lane-major integrated DCARL training step — the throughput trainer.

Same system semantics as :mod:`dcarl_tpu.train` (the reference's whole
distributed loop as one SPMD program, SURVEY.md §3.3/§3.4):

  plan -> confidence query -> RLS train gate -> epsilon-greedy DQN
  proposal -> drive -> trajectory-buffer flush -> store insert ->
  prioritized TD step with pmean-ed gradients

but with the planning/env half in the lane-major (batch-last) layout of
:mod:`dcarl_tpu.planning.fast_rollout` — the env batch rides the VPU
lanes (DESIGN.md §4b), which is ~6x faster than the vmapped batch-first
path on TPU.  The learner half (Q-network, replay, TD update) stays
batch-first: those are plain matmuls where layout is already right.

The two trainers are semantically pinned to each other **when
``EnvConfig.reset_jitter = 0``**: with the same PRNG key they then
split the same RNG streams in the same order, so actions, gating draws,
store contents, and TD batches match step for step
(``tests/test_train_fast.py`` asserts the equivalence).  With nonzero
jitter (the default 0.1) the two draw env-reset randomness in different
block orders, so they are distribution-equivalent, not bit-identical —
``tests/test_train_fast.py`` also asserts the distributional agreement
of reward/store-growth statistics in that regime.

On TPU the per-candidate confidence query runs through the Pallas
sorted-band kernel (``ops/pallas_store.py``); per-shard moments still
``psum`` across the mesh so every device sees global statistics —
exactly the reference's single global R-tree (RLS.py:161-181), sharded.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dcarl_tpu.config import DCARLConfig
from dcarl_tpu.core import rls as RLS
from dcarl_tpu.core import store as ST
from dcarl_tpu.core.store import ConfidenceStore, _raw_moments, moments_to_stats
from dcarl_tpu.env import driving_env as de
from dcarl_tpu.env.scenario import Scenario, t_intersection
from dcarl_tpu.models import dqn as DQ
from dcarl_tpu.models import networks as NET
from dcarl_tpu.models import replay as RB
from dcarl_tpu.planning import fast_rollout as FR
from dcarl_tpu.train import N_METRICS, StepMetrics


class FastTrainState(NamedTuple):
    """Mirror of :class:`dcarl_tpu.train.TrainState` with the env state
    and observations lane-major ([S, ..., B_local])."""

    env: FR.FastEnvState           # [S, ..., B_local] lane-major
    obs_ori: jax.Array             # [S, 20, B_local]
    traj_obs: jax.Array            # [S, W, 20, B_local] lane-major
    traj_act: jax.Array            # [S, W, B_local]
    traj_rew: jax.Array            # [S, W, B_local]
    traj_len: jax.Array            # [S, B_local]
    store_keys: jax.Array          # [S, N_local, 21]
    store_actions: jax.Array       # [S, N_local]
    store_values: jax.Array        # [S, N_local]
    store_size: jax.Array          # [S]
    store_head: jax.Array          # [S]
    # cumulative ring slots written per shard (i32, wrapping): the
    # spool/persistence layer needs EXACT insert counts between store
    # snapshots — the head alone aliases whole-capacity wraps
    # (utils/checkpoint.StoreSpooler) — and `size` saturates.
    store_total: jax.Array         # [S]
    replay: RB.Replay              # [S, ...]
    params: dict                   # replicated
    target_params: dict            # replicated
    opt_state: optax.OptState      # replicated
    frame: jax.Array               # replicated i32


def make_trainer_fast(
    mesh: Mesh,
    axis: str = "env",
    cfg: DCARLConfig = DCARLConfig(),
    batch_per_device: int = 1024,
    store_capacity_per_device: int = 1 << 14,
    replay_capacity_per_device: int = 1 << 14,
    scenario: Optional[Scenario] = None,
    use_pallas: Optional[bool] = None,
    pallas_interpret: bool = False,
    backfill_budget_per_step: Optional[int] = None,
    dense_store_writes: bool = False,
    init_step_offset: bool = False,
    dtype=jnp.float32,
):
    """Build (init_fn, step_fn, learner) for the lane-major integrated
    loop.  Same contract as :func:`dcarl_tpu.train.make_trainer`.

    ``init_step_offset`` staggers each env's FIRST episode by a random
    initial ``step_count`` in [0, max_episode_steps): without it, a
    lockstep fleet's timeouts arrive in synchronized waves (every env
    terminates the same step), which in ``value_mode="episode"`` — one
    record per episode STEP, all emitted at the episode's end — would
    dump batch x episode-length records into a single step's insert
    budget.  The offset episodes end at an artificial (early) boundary,
    so their records carry randomly truncated returns; in episode mode
    they are masked out (the warmup filter below) and the store only
    ever sees full-episode suffix returns."""
    s_shards = mesh.shape[axis]
    if cfg.store.value_mode == "episode" \
            and cfg.store.n_step_window < cfg.env.max_episode_steps:
        raise ValueError(
            f"value_mode='episode' needs n_step_window "
            f"({cfg.store.n_step_window}) >= max_episode_steps "
            f"({cfg.env.max_episode_steps}) so every record's episode "
            "boundary is inside the window")
    sc = scenario or t_intersection(cfg.env)
    sa = de.scenario_to_device(sc, dtype)
    in_idx = de.in_state_indices(sc)
    ref_line = np.asarray(sc.ref_path, np.float64)
    tab = FR.build_ref_tables(ref_line, dtype)
    npdt = np.dtype(jnp.zeros((), dtype).dtype.name).type

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    wcfg = cfg.werling
    scfg = cfg.store
    half_widths = jnp.asarray(scfg.half_widths or ST.FIELD_HALF_WIDTHS,
                              jnp.float32)
    num_actions = wcfg.num_paths + 1
    obs_dim = cfg.env.state_dim
    n_obj = (obs_dim - 5) // 5
    n_v = len(wcfg.target_speeds)
    n_paths = wcfg.num_paths

    net = NET.AttentionQNet(num_actions=num_actions,
                            token_dim=cfg.dqn.token_dim,
                            width=cfg.dqn.attention_width,
                            hidden=cfg.dqn.hidden_dim)
    learner = DQ.DQN(net, obs_dim=obs_dim, cfg=cfg.dqn)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    # ------------------------------------------------------------------
    def _init_state(key: jax.Array) -> FastTrainState:
        """Pure (placement-free) initial state from one PRNG key."""
        k_env, k_net = jax.random.split(key)
        env_keys = jax.random.split(
            k_env, s_shards * batch_per_device
        ).reshape(s_shards, batch_per_device, 2)
        env_bf = jax.vmap(jax.vmap(
            lambda k: de.reset(sa, k, cfg.env)))(env_keys)
        env = jax.vmap(FR._state_to_lane_major)(env_bf)
        if init_step_offset:
            k_off = jax.random.fold_in(k_env, 1)
            env = env._replace(step_count=jax.random.randint(
                k_off, (s_shards, batch_per_device), 0,
                cfg.env.max_episode_steps, jnp.int32))
        obs_ori = jax.vmap(lambda st: FR._obs_ori_soa(st, in_idx))(env)

        params = net.init(k_net, jnp.zeros((1, obs_dim)))
        w = scfg.n_step_window
        return FastTrainState(
            env=env,
            obs_ori=obs_ori,
            traj_obs=jnp.zeros((s_shards, w, obs_dim, batch_per_device)),
            traj_act=jnp.zeros((s_shards, w, batch_per_device)),
            traj_rew=jnp.zeros((s_shards, w, batch_per_device)),
            traj_len=jnp.zeros((s_shards, batch_per_device), jnp.int32),
            store_keys=jnp.zeros((s_shards, store_capacity_per_device,
                                  obs_dim + 1)),
            store_actions=jnp.zeros((s_shards, store_capacity_per_device)),
            store_values=jnp.zeros((s_shards, store_capacity_per_device)),
            store_size=jnp.zeros((s_shards,), jnp.int32),
            store_head=jnp.zeros((s_shards,), jnp.int32),
            store_total=jnp.zeros((s_shards,), jnp.int32),
            replay=jax.vmap(
                lambda _: RB.replay_init(replay_capacity_per_device, obs_dim)
            )(jnp.arange(s_shards)),
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=learner.tx.init(params),
            frame=jnp.zeros((), jnp.int32),
        )

    # Placement via jit out_shardings (a pytree prefix: dict-valued
    # learner fields take one replicated sharding each) — the idiomatic
    # form on a multi-host mesh, where plain device_put cannot address
    # other hosts' devices; identical result single-host.
    out_sh = FastTrainState(
        env=jax.tree.map(lambda _: shard, FR.FastEnvState(*[0] * 11)),
        obs_ori=shard,
        traj_obs=shard, traj_act=shard, traj_rew=shard, traj_len=shard,
        store_keys=shard, store_actions=shard, store_values=shard,
        store_size=shard, store_head=shard, store_total=shard,
        replay=jax.tree.map(lambda _: shard, RB.Replay(*[0] * 8)),
        params=repl, target_params=repl, opt_state=repl, frame=repl,
    )
    _init_jit = jax.jit(_init_state, out_shardings=out_sh)

    def init_fn(seed: int = 0) -> FastTrainState:
        return _init_jit(jax.random.PRNGKey(seed))

    # ------------------------------------------------------------------
    def _shard_step(state: FastTrainState, key: jax.Array
                    ) -> Tuple[FastTrainState, StepMetrics]:
        obs = state.obs_ori[0]              # [20, B] lane-major
        b = obs.shape[1]
        local_store = ConfidenceStore(
            state.store_keys[0], state.store_actions[0],
            state.store_values[0], state.store_size[0], state.store_head[0])

        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_act, k_gate, k_env, k_train = jax.random.split(key, 4)

        ego_x, ego_y = obs[0], obs[1]
        ego_vx, ego_vy, ego_yaw = obs[2], obs[3], obs[4]

        # 1. plan all candidates per env (lane-major lattice) + the
        # rule policy's collision-checked pick (rule driver semantics)
        s0, d_signed, vd = FR._project_ego(ego_x, ego_y, ego_vx, ego_vy,
                                           tab, npdt)
        c_speed = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
        lat = FR._plan_lattice(s0, -d_signed, vd, c_speed, tab, wcfg, npdt)
        obstacles = obs[5:].reshape(n_obj, 5, -1)
        obstacles = obstacles.at[:, 4, :].set(0.0)
        free = FR._collision_free(lat, obstacles, wcfg, npdt)
        ok = lat.feasible & free
        masked_cost = jnp.where(ok, lat.cf, jnp.inf)
        best = jnp.argmin(masked_cost, axis=0).astype(jnp.int32)
        rule_index = jnp.where(jnp.any(ok, axis=0), best + 1, 0)

        # 2. confidence stats: local moments + psum over store shards.
        # TRAIN mode consumes only the RULE action's statistics
        # (should_use_rule, RLS.py:96-118 — the reference queries the
        # single rule state per tick), so only the action-0 column is
        # queried: an 11x smaller batch than deployment's all-candidate
        # fan-out (which lives in make_gated_driver_fast / act_test).
        obs_bf = obs.T                      # [B, 20]
        n_local = local_store.keys.shape[0]
        valid = (jax.lax.broadcasted_iota(jnp.int32, (n_local, 1), 0)
                 .squeeze(-1) < local_store.size)
        # Every env's gate must see the GLOBAL store (the reference's
        # single R-tree): all-gather the query batch over the mesh,
        # compute partial moments for the full global batch against the
        # LOCAL store shard, psum the per-query partials, slice the
        # local env block back out.  (A bare psum of local-batch
        # moments would mix moments of DIFFERENT envs sharing a local
        # index — chimeric statistics whenever envs differ across
        # shards.)
        obs_q = jax.lax.all_gather(obs_bf, axis, axis=0, tiled=True)
        bg = obs_q.shape[0]                 # global batch
        if use_pallas:
            from dcarl_tpu.ops.pallas_store import box_query_moments_grouped
            queries_g = jnp.concatenate(
                [obs_q[None].astype(jnp.float32),
                 jnp.zeros((1, bg, 1), jnp.float32)], axis=-1)  # [1, Bg, D]
            moments = box_query_moments_grouped(
                local_store.keys, local_store.values, valid,
                queries_g, half_widths,
                interpret=pallas_interpret)[0]          # [Bg, 3]
        else:
            flat_q = RLS.state_with_action(
                obs_q, jnp.zeros((bg,), obs_q.dtype))   # [Bg, D]
            moments = _raw_moments(local_store.keys, local_store.values,
                                   valid, flat_q, half_widths)
        # psum_scatter: each shard keeps only its local env block of
        # the global sums (XLA may still lower it as all-reduce+slice
        # at these shapes — see SCALING_r05.md — but the scatter form
        # states the minimal requirement)
        moments = jax.lax.psum_scatter(moments, axis,
                                       scatter_dimension=0, tiled=True)
        qstats = moments_to_stats(moments)
        # rule-only stats in slot 0; act_train reads only [..., 0]
        stats = RLS.ActionStats(
            count=qstats.count[:, None],
            mean=qstats.mean[:, None],
            var=qstats.var[:, None],
            sigma=qstats.sigma[:, None],
        )

        # 3-4. DQN proposes, RLS gates (deepq/dqn.py:226-236)
        dqn_state = DQ.DQNState(state.params, state.target_params,
                                state.opt_state, None, state.frame)
        rl_action = learner.act_epsilon_greedy(dqn_state, obs_bf, k_act)
        env_action = RLS.act_train(stats, rl_action, k_gate, scfg)

        # 5. gated action 0 = the RULE POLICY'S pick (RLS.act,
        # RLS.py:84-90); the rule itself brakes (index 0) only when no
        # path is collision-free.  Recorded action stays env_action.
        exec_index = jnp.where(env_action == 0, rule_index,
                               env_action).astype(jnp.int32)
        brake_path = jnp.argmin(lat.cf, axis=0).astype(jnp.int32)
        p_sel = jnp.where(exec_index == 0, brake_path, exec_index - 1)
        oh_p = FR._onehot(p_sel, n_paths).astype(npdt)
        traj_x = jnp.sum(lat.x * oh_p[:, None, :], axis=0)
        traj_y = jnp.sum(lat.y * oh_p[:, None, :], axis=0)
        oh_v = oh_p.reshape(-1, n_v, oh_p.shape[-1]).sum(axis=0)
        speed_end = jnp.sum(lat.s_d_end * oh_v, axis=0)
        speed_end = jnp.where(exec_index == 0, 0.0, speed_end)

        ego_v = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
        acc, steer = FR._control(ego_x, ego_y, ego_yaw, ego_v,
                                 traj_x, traj_y, speed_end, npdt)
        env2, reward, done = FR._step_env_soa(
            jax.tree.map(lambda x: x[0], state.env), acc, steer, k_env,
            sa, in_idx, cfg.env, npdt)
        obs2 = FR._obs_ori_soa(env2, in_idx)
        obs2_bf = obs2.T

        # 6. trajectory-buffer push -> store records (RLS.add_data) —
        # lane-major (traj_push_lane: the vmapped per-env form lowers
        # to gathers/scatters and profiled as 56% of the whole step)
        bufs, recs = RLS.traj_push_lane(
            state.traj_obs[0], state.traj_act[0], state.traj_rew[0],
            state.traj_len[0], obs, env_action, reward, done, scfg)
        if scfg.value_mode == "episode":
            # Warmup filter: an env whose buffer holds fewer entries
            # than its episode's step count started mid-episode (the
            # init_step_offset stagger) — its artificial early boundary
            # would record randomly truncated returns, so its records
            # are dropped.  For aligned envs length == step_count
            # always (both count from the episode start), so this is a
            # no-op without offsets.
            on_time = state.traj_len[0] == state.env.step_count[0]
            recs = recs._replace(valid=recs.valid & on_time[None, :])
        # Terminal backfills are valid only where an episode ended this
        # step (~B/episode_len rows of the [B, W] block); scatter/write
        # cost is proportional to rows PROCESSED, not rows valid, so a
        # budget compacts them first (one cheap nonzero + gather).
        # Env-major flattening matches the batch-first emission order.
        bk = recs.keys[1:].transpose(2, 0, 1).reshape(-1, obs_dim + 1)
        ba = recs.actions[1:].T.reshape(-1)
        bv = recs.values[1:].T.reshape(-1)
        bm = recs.valid[1:].T.reshape(-1)
        n_backfill = jnp.sum(bm.astype(jnp.int32))
        if backfill_budget_per_step is not None:
            kbud = int(backfill_budget_per_step)
            (idx,) = jnp.nonzero(bm, size=kbud, fill_value=bm.shape[0])
            bk = jnp.take(bk, idx, axis=0, mode="fill", fill_value=0.0)
            ba = jnp.take(ba, idx, mode="fill", fill_value=0.0)
            bv = jnp.take(bv, idx, mode="fill", fill_value=0.0)
            bm = jnp.arange(kbud) < jnp.minimum(n_backfill, kbud)
            dropped = jnp.maximum(n_backfill - kbud, 0).astype(jnp.int32)
        else:
            dropped = jnp.zeros((), jnp.int32)

        if dense_store_writes:
            # one contiguous [B + budget] block write per step (flushes
            # + compacted backfills), invalid rows as sentinel keys —
            # store_insert_dense_block: identical query statistics, no
            # scatter, bounded capacity waste
            assert backfill_budget_per_step is not None, \
                "dense_store_writes requires backfill_budget_per_step"
            new_store = ST.store_insert_dense_block(
                local_store,
                jnp.concatenate([recs.keys[0].T, bk]),
                jnp.concatenate([recs.actions[0], ba]),
                jnp.concatenate([recs.values[0], bv]),
                jnp.concatenate([recs.valid[0], bm]))
            # dense blocks consume a slot per row, sentinel or not
            slots_written = jnp.asarray(b + bm.shape[0], jnp.int32)
        else:
            # steady flushes (a dense [B] masked insert), then backfills
            new_store = ST.store_insert(
                local_store, recs.keys[0].T, recs.actions[0],
                recs.values[0], recs.valid[0])
            new_store = ST.store_insert(new_store, bk, ba, bv, bm)
            # keep i32 under jax_enable_x64 (sum() promotes)
            slots_written = (jnp.sum(recs.valid[0].astype(jnp.int32))
                             + jnp.sum(bm.astype(jnp.int32))
                             ).astype(jnp.int32)

        # 7. replay push + TD step with pmean-ed gradients
        replay = jax.tree.map(lambda x: x[0], state.replay)
        replay = RB.replay_push(replay, obs_bf, env_action, reward,
                                obs2_bf, done.astype(jnp.float32))
        beta = DQ.beta_by_frame(state.frame, cfg.dqn)
        batch = RB.replay_sample(replay, k_train, cfg.dqn.batch_size,
                                 alpha=cfg.dqn.priority_alpha, beta=beta)
        (loss, prios), grads = jax.value_and_grad(
            lambda p: learner.td_loss(p, state.target_params, batch,
                                      jnp.zeros((cfg.dqn.batch_size,))),
            has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = learner.tx.update(grads, state.opt_state,
                                               state.params)
        params = optax.apply_updates(state.params, updates)
        replay = RB.replay_update_priorities(replay, batch.indices, prios)

        frame = state.frame + 1
        sync = (frame % cfg.dqn.target_update_every) == 0
        target_params = jax.tree.map(
            lambda t, p: jnp.where(sync, p, t), state.target_params, params)

        metrics = StepMetrics(
            reward_mean=jax.lax.pmean(jnp.mean(reward), axis),
            done_count=jax.lax.psum(jnp.sum(done), axis),
            pass_count=jax.lax.psum(jnp.sum(env2.passed & done), axis),
            collision_count=jax.lax.psum(jnp.sum(env2.collided & done), axis),
            loss=loss,
            rule_fraction=jax.lax.pmean(jnp.mean(env_action == 0), axis),
            store_rows=jax.lax.psum(new_store.size, axis),
            dropped_records=jax.lax.psum(dropped, axis),
        )

        new_state = FastTrainState(
            env=jax.tree.map(lambda x: x[None], env2),
            obs_ori=obs2[None],
            traj_obs=bufs[0][None],
            traj_act=bufs[1][None],
            traj_rew=bufs[2][None],
            traj_len=bufs[3][None],
            store_keys=new_store.keys[None],
            store_actions=new_store.actions[None],
            store_values=new_store.values[None],
            store_size=new_store.size[None],
            store_head=new_store.head[None],
            store_total=(state.store_total[0] + slots_written)[None],
            replay=jax.tree.map(lambda x: x[None], replay),
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            frame=frame,
        )
        return new_state, metrics

    sharded_specs = FastTrainState(
        env=jax.tree.map(lambda _: P(axis), FR.FastEnvState(*[0] * 11)),
        obs_ori=P(axis),
        traj_obs=P(axis), traj_act=P(axis), traj_rew=P(axis),
        traj_len=P(axis),
        store_keys=P(axis), store_actions=P(axis), store_values=P(axis),
        store_size=P(axis), store_head=P(axis), store_total=P(axis),
        replay=jax.tree.map(lambda _: P(axis), RB.Replay(*[0] * 8)),
        params=P(), target_params=P(), opt_state=P(), frame=P(),
    )

    def _wrapped(state_tuple, key: jax.Array):
        new_state, metrics = _shard_step(FastTrainState(*state_tuple), key)
        return tuple(new_state), metrics

    step_sm = shard_map(
        _wrapped, mesh=mesh,
        in_specs=(tuple(sharded_specs), P()),
        out_specs=(tuple(sharded_specs),
                   jax.tree.map(lambda _: P(), StepMetrics(*[0] * N_METRICS))),
        check_vma=False,
    )

    @jax.jit
    def step_fn(state: FastTrainState, key: jax.Array):
        new_state, metrics = step_sm(tuple(state), key)
        return FastTrainState(*new_state), StepMetrics(*metrics)

    def run_fn_factory(n_steps: int):
        """A scanned multi-step runner: one dispatch for ``n_steps``
        training ticks (amortizes the per-executable launch floor)."""

        @jax.jit
        def run_fn(state: FastTrainState, key: jax.Array):
            keys = jax.random.split(key, n_steps)

            def body(s, k):
                s2, m = step_sm(tuple(s), k)
                return FastTrainState(*s2), m

            return jax.lax.scan(body, state, keys)

        return run_fn

    return init_fn, step_fn, learner, run_fn_factory
