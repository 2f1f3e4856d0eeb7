"""The integrated DCARL training step — one SPMD program.

This is the TPU-native form of the reference's whole distributed system
(SURVEY.md §3.3/§3.4): ROS planner process <-> TCP/msgpack <-> gym
server <-> TF DQN with RLS gating and an R-tree store become a single
jitted step over a device mesh:

  per device (shard of the env batch):
    1. plan: Werling lattice + rule pick per env          (planner node)
    2. query: confidence stats for all candidate actions  (R-tree -> store)
    3. gate: RLS train-mode rule forcing / test z-test    (RLS.act)
    4. act: epsilon-greedy DQN proposal                   (DQN.learn tick)
    5. drive: controller -> env.step (auto-reset)         (CARLA -> native)
    6. record: trajectory-buffer flush -> store insert    (add_data)
    7. learn: prioritized TD step, gradients pmean-ed     (MpiAdam -> psum)

Collectives: one psum for store moments, one pmean for gradients —
everything else is local to the shard.  The same code runs on 1 device
(mesh of 1) or a v5p pod slice.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dcarl_tpu.config import DCARLConfig
from dcarl_tpu.control.controller import get_control
from dcarl_tpu.core import rls as RLS
from dcarl_tpu.core.store import ConfidenceStore, moments_to_stats, _raw_moments
from dcarl_tpu.core import store as ST
from dcarl_tpu.env import driving_env as de
from dcarl_tpu.env.scenario import Scenario, t_intersection
from dcarl_tpu.models import dqn as DQ
from dcarl_tpu.models import networks as NET
from dcarl_tpu.models import replay as RB
from dcarl_tpu.ops import spline as spl
from dcarl_tpu.planning import werling as W


class TrainState(NamedTuple):
    """Full system state.  Leading [S] axis = device shards for env
    state, trajectory buffers, local store and local replay; learner
    params are replicated."""

    env: de.EnvState               # [S, B_local, ...]
    obs_ori: jax.Array             # [S, B_local, 20]
    traj_obs: jax.Array            # [S, B_local, W, 20]
    traj_act: jax.Array            # [S, B_local, W]
    traj_rew: jax.Array            # [S, B_local, W]
    traj_len: jax.Array            # [S, B_local]
    store_keys: jax.Array          # [S, N_local, 21]
    store_actions: jax.Array       # [S, N_local]
    store_values: jax.Array        # [S, N_local]
    store_size: jax.Array          # [S]
    store_head: jax.Array          # [S]
    replay: RB.Replay              # [S, ...] per-device replay
    params: dict                   # replicated
    target_params: dict            # replicated
    opt_state: optax.OptState      # replicated
    frame: jax.Array               # replicated i32


class StepMetrics(NamedTuple):
    reward_mean: jax.Array
    done_count: jax.Array
    pass_count: jax.Array
    collision_count: jax.Array
    loss: jax.Array
    rule_fraction: jax.Array
    store_rows: jax.Array
    # terminal-backfill records dropped by the fast trainer's fixed
    # compaction budget (0 when the budget is disabled or sufficient)
    dropped_records: jax.Array


N_METRICS = len(StepMetrics._fields)


def make_trainer(
    mesh: Mesh,
    axis: str = "env",
    cfg: DCARLConfig = DCARLConfig(),
    batch_per_device: int = 32,
    store_capacity_per_device: int = 1 << 14,
    replay_capacity_per_device: int = 1 << 14,
    scenario: Optional[Scenario] = None,
):
    """Build (init_fn, step_fn) for the integrated loop.

    init_fn(seed) -> TrainState (device-placed)
    step_fn(state, step_idx) -> (TrainState, StepMetrics)
    """
    s_shards = mesh.shape[axis]
    if cfg.store.value_mode == "episode" \
            and cfg.store.n_step_window < cfg.env.max_episode_steps:
        raise ValueError(
            f"value_mode='episode' needs n_step_window "
            f"({cfg.store.n_step_window}) >= max_episode_steps "
            f"({cfg.env.max_episode_steps})")
    sc = scenario or t_intersection(cfg.env)
    sa = de.scenario_to_device(sc)
    in_idx = de.in_state_indices(sc)
    ref_line = jnp.asarray(sc.ref_path, jnp.float32)
    rp = spl.refpath_from_xy(ref_line[:, 0], ref_line[:, 1])

    wcfg = cfg.werling
    scfg = cfg.store
    half_widths = jnp.asarray(scfg.half_widths or ST.FIELD_HALF_WIDTHS,
                              jnp.float32)
    num_actions = wcfg.num_paths + 1  # brake + lattice candidates
    obs_dim = cfg.env.state_dim

    net = NET.AttentionQNet(num_actions=num_actions,
                            token_dim=cfg.dqn.token_dim,
                            width=cfg.dqn.attention_width,
                            hidden=cfg.dqn.hidden_dim)
    learner = DQ.DQN(net, obs_dim=obs_dim, cfg=cfg.dqn)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    # ------------------------------------------------------------------
    def init_fn(seed: int = 0) -> TrainState:
        key = jax.random.PRNGKey(seed)
        k_env, k_net = jax.random.split(key)
        env_keys = jax.random.split(
            k_env, s_shards * batch_per_device
        ).reshape(s_shards, batch_per_device, 2)
        env = jax.vmap(jax.vmap(lambda k: de.reset(sa, k, cfg.env)))(env_keys)
        _, obs_ori = jax.vmap(jax.vmap(
            lambda s: de.wrap_state(s, sa, in_idx, cfg.env)))(env)

        params = net.init(k_net, jnp.zeros((1, obs_dim)))
        w = scfg.n_step_window
        state = TrainState(
            env=env,
            obs_ori=obs_ori,
            traj_obs=jnp.zeros((s_shards, batch_per_device, w, obs_dim)),
            traj_act=jnp.zeros((s_shards, batch_per_device, w)),
            traj_rew=jnp.zeros((s_shards, batch_per_device, w)),
            traj_len=jnp.zeros((s_shards, batch_per_device), jnp.int32),
            store_keys=jnp.zeros((s_shards, store_capacity_per_device,
                                  obs_dim + 1)),
            store_actions=jnp.zeros((s_shards, store_capacity_per_device)),
            store_values=jnp.zeros((s_shards, store_capacity_per_device)),
            store_size=jnp.zeros((s_shards,), jnp.int32),
            store_head=jnp.zeros((s_shards,), jnp.int32),
            replay=jax.vmap(
                lambda _: RB.replay_init(replay_capacity_per_device, obs_dim)
            )(jnp.arange(s_shards)),
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=learner.tx.init(params),
            frame=jnp.zeros((), jnp.int32),
        )
        sharded_leaves = state._replace(
            params=jax.device_put(state.params, repl),
            target_params=jax.device_put(state.target_params, repl),
            opt_state=jax.device_put(state.opt_state, repl),
            frame=jax.device_put(state.frame, repl),
        )
        place = lambda x: jax.device_put(x, shard)
        return TrainState(
            env=jax.tree.map(place, state.env),
            obs_ori=place(state.obs_ori),
            traj_obs=place(state.traj_obs),
            traj_act=place(state.traj_act),
            traj_rew=place(state.traj_rew),
            traj_len=place(state.traj_len),
            store_keys=place(state.store_keys),
            store_actions=place(state.store_actions),
            store_values=place(state.store_values),
            store_size=place(state.store_size),
            store_head=place(state.store_head),
            replay=jax.tree.map(place, state.replay),
            params=sharded_leaves.params,
            target_params=sharded_leaves.target_params,
            opt_state=sharded_leaves.opt_state,
            frame=sharded_leaves.frame,
        )

    # ------------------------------------------------------------------
    def _shard_step(state: TrainState, key: jax.Array
                    ) -> Tuple[TrainState, StepMetrics]:
        """Runs per device under shard_map: leading [1] shard axis on
        sharded leaves, replicated learner params."""
        obs_ori = state.obs_ori[0]          # [B, 20]
        b = obs_ori.shape[0]
        local_store = ConfidenceStore(
            state.store_keys[0], state.store_actions[0],
            state.store_values[0], state.store_size[0], state.store_head[0])

        # per-device RNG stream: fold in the shard index so exploration
        # draws and env noise differ across the mesh
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_act, k_gate, k_env, k_train = jax.random.split(key, 4)

        # 1. plan all candidates per env
        def plan_one(o):
            ego = o[:5]
            objs = o[5:].reshape(-1, 5).at[:, 4].set(0.0)
            return W.plan_with_rule(rp, ref_line, ego, objs,
                                    jnp.ones((objs.shape[0],), bool), wcfg)
        plans = jax.vmap(plan_one)(obs_ori)

        # 2. confidence stats: local moments + psum over the store
        #    shards (one collective).  Train mode consumes only the
        #    RULE action's statistics (should_use_rule, RLS.py:96-118),
        #    so only the action-0 keys are queried — matching the
        #    reference's single rule-state R-tree lookup per tick.
        flat_q = RLS.state_with_action(
            obs_ori, jnp.zeros((b,), obs_ori.dtype))       # [B, D]
        n_local = local_store.keys.shape[0]
        valid = (jax.lax.broadcasted_iota(jnp.int32, (n_local, 1), 0)
                 .squeeze(-1) < local_store.size)
        moments = _raw_moments(local_store.keys, local_store.values, valid,
                               flat_q, half_widths)
        moments = jax.lax.psum(moments, axis)
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
                                state.opt_state, state.replay, state.frame)
        rl_action = learner.act_epsilon_greedy(
            dqn_state._replace(replay=None), obs_ori, k_act)
        env_action = RLS.act_train(stats, rl_action, k_gate, scfg)

        # 5. selected candidate trajectory -> controller -> env tick.
        # Gated action 0 = the RULE POLICY'S pick (RLS.act semantics,
        # RLS.py:84-90 -> the planner's collision-checked choice, which
        # itself brakes only when no path is free) — the recorded
        # action stays 0 so the store's action-0 statistics measure the
        # rule policy, exactly what act_test later compares against.
        exec_index = jnp.where(env_action == 0, plans.rule_index,
                               env_action).astype(jnp.int32)

        def drive_one(plan, a_idx, o, env_state, k):
            traj = W.trajectory_by_index(plan.lattice, a_idx)
            ego = o[:5]
            ego_v = jnp.sqrt(ego[2] ** 2 + ego[3] ** 2)
            ctrl = get_control(ego[0], ego[1], ego[4], ego_v, traj.xy,
                               traj.desired_speed)
            action = jnp.stack([ctrl.acc, ctrl.steering])
            return de.step_autoreset(env_state, action, k, sa, in_idx,
                                     cfg.env)

        env_keys = jax.random.split(k_env, b)
        env2, obs, reward, done, obs_ori2 = jax.vmap(drive_one)(
            plans, exec_index,
            obs_ori, jax.tree.map(lambda x: x[0], state.env), env_keys)

        # 6. trajectory-buffer push -> store records (RLS.add_data)
        def push_one(to, ta, tr, tl, o, a, r, d):
            buf = RLS.TrajectoryBuffer(to, ta, tr, tl)
            buf2, recs = RLS.traj_buffer_push(
                buf, o, a.astype(jnp.float32), r, d, scfg)
            return buf2, recs

        bufs, recs = jax.vmap(push_one)(
            state.traj_obs[0], state.traj_act[0], state.traj_rew[0],
            state.traj_len[0], obs_ori, env_action, reward, done)
        # steady flushes first, then terminal backfills — the order the
        # fast trainer uses (its backfill path compacts; the store's
        # moment queries are order-insensitive, so only the ring slot
        # assignment needs to match for the equivalence pin)
        flush_store = ST.store_insert(
            local_store, recs.keys[:, 0], recs.actions[:, 0],
            recs.values[:, 0], recs.valid[:, 0])
        rec_keys = recs.keys[:, 1:].reshape(-1, obs_dim + 1)
        new_store = ST.store_insert(flush_store, rec_keys,
                                    recs.actions[:, 1:].reshape(-1),
                                    recs.values[:, 1:].reshape(-1),
                                    recs.valid[:, 1:].reshape(-1))

        # 7. replay push + TD step with pmean-ed gradients
        replay = jax.tree.map(lambda x: x[0], state.replay)
        replay = RB.replay_push(replay, obs_ori, env_action, reward,
                                obs_ori2, done.astype(jnp.float32))
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

        # periodic hard target sync
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
            dropped_records=jnp.zeros((), jnp.int32),
        )

        new_state = TrainState(
            env=jax.tree.map(lambda x: x[None], env2),
            obs_ori=obs_ori2[None],
            traj_obs=bufs.obs[None],
            traj_act=bufs.action[None],
            traj_rew=bufs.reward[None],
            traj_len=bufs.length[None],
            store_keys=new_store.keys[None],
            store_actions=new_store.actions[None],
            store_values=new_store.values[None],
            store_size=new_store.size[None],
            store_head=new_store.head[None],
            replay=jax.tree.map(lambda x: x[None], replay),
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            frame=frame,
        )
        return new_state, metrics

    sharded_specs = TrainState(
        env=jax.tree.map(lambda _: P(axis), de.EnvState(*[0] * 11)),
        obs_ori=P(axis),
        traj_obs=P(axis), traj_act=P(axis), traj_rew=P(axis),
        traj_len=P(axis),
        store_keys=P(axis), store_actions=P(axis), store_values=P(axis),
        store_size=P(axis), store_head=P(axis),
        replay=jax.tree.map(lambda _: P(axis), RB.Replay(*[0] * 8)),
        params=P(), target_params=P(), opt_state=P(), frame=P(),
    )

    def _wrapped(state_tuple, key: jax.Array):
        new_state, metrics = _shard_step(TrainState(*state_tuple), key)
        return tuple(new_state), metrics

    step_sm = shard_map(
        _wrapped, mesh=mesh,
        in_specs=(tuple(sharded_specs), P()),
        out_specs=(tuple(sharded_specs),
                   jax.tree.map(lambda _: P(), StepMetrics(*[0] * N_METRICS))),
        check_vma=False,
    )

    @jax.jit
    def step_fn(state: TrainState, key: jax.Array):
        new_state, metrics = step_sm(tuple(state), key)
        return TrainState(*new_state), StepMetrics(*metrics)

    return init_fn, step_fn, learner
