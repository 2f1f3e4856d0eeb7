"""TRPO — trust-region policy optimization.

TPU-native form of the fork's ``trpo_mpi/trpo_mpi.py`` (530 LoC):
surrogate gain with a KL trust region solved by conjugate gradient on
Fisher-vector products + backtracking line search, and a separate
value-function Adam.  The fork's ``allmean``/MPI reductions are
``axis_name`` pmeans; the CG loop is a ``lax.scan`` (fixed iteration
count — cg_iters=10, the reference default) and the line search a
``lax.while_loop``, so one update is one jitted program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dcarl_tpu.algos import nets
from dcarl_tpu.algos.common import EnvFns, collect_rollout, gae, maybe_pmean


class TRPOConfig(NamedTuple):
    n_steps: int = 128
    gamma: float = 0.99
    lam: float = 0.98              # trpo_mpi defaults
    max_kl: float = 0.01
    cg_iters: int = 10
    cg_damping: float = 0.1
    vf_lr: float = 1e-3
    vf_iters: int = 3
    entcoeff: float = 0.0
    backtrack_iters: int = 10
    backtrack_coeff: float = 0.8


class TRPOState(NamedTuple):
    params: dict
    vf_opt: optax.OptState
    env_state: object
    obs: jax.Array
    step: jax.Array


def _flat(tree):
    leaves = jax.tree.leaves(tree)
    return jnp.concatenate([l.reshape(-1) for l in leaves])


def _unflat(flat, tree):
    leaves, treedef = jax.tree.flatten(tree)
    out, i = [], 0
    for l in leaves:
        out.append(flat[i:i + l.size].reshape(l.shape))
        i += l.size
    return jax.tree.unflatten(treedef, out)


def make_trpo(env: EnvFns, cfg: TRPOConfig = TRPOConfig(), hidden=(64, 64),
              axis_name: Optional[str] = None):
    discrete = env.num_actions is not None
    if discrete:
        net = nets.CategoricalActorCritic(env.num_actions, hidden)
    else:
        net = nets.GaussianActorCritic(env.action_dim, hidden)
    vtx = optax.adam(cfg.vf_lr)

    def dist_and_value(params, obs):
        if discrete:
            logits, value = net.apply(params, obs)
            return (logits,), value
        mean, log_std, value = net.apply(params, obs)
        return (mean, log_std), value

    def log_prob(dist, action):
        if discrete:
            return nets.categorical_log_prob(dist[0], action)
        return nets.gaussian_log_prob(dist[0], dist[1], action)

    def entropy(dist):
        if discrete:
            return nets.categorical_entropy(dist[0])
        return nets.gaussian_entropy(dist[1])

    def kl(dist_old, dist_new):
        if discrete:
            p_old = jax.nn.log_softmax(dist_old[0])
            p_new = jax.nn.log_softmax(dist_new[0])
            return jnp.sum(jnp.exp(p_old) * (p_old - p_new), axis=-1)
        m0, ls0 = dist_old
        m1, ls1 = dist_new
        v0, v1 = jnp.exp(2 * ls0), jnp.exp(2 * ls1)
        return jnp.sum(ls1 - ls0 + (v0 + (m0 - m1) ** 2) / (2 * v1) - 0.5,
                       axis=-1)

    def sample(params, obs, key):
        dist, _ = dist_and_value(params, obs)
        if discrete:
            return jax.random.categorical(key, dist[0])
        return dist[0] + jnp.exp(dist[1]) * jax.random.normal(
            key, dist[0].shape)

    def init_fn(key, batch: int):
        k_net, k_env = jax.random.split(key)
        params = net.init(k_net, jnp.zeros((1, env.obs_dim)))
        env_state, obs = env.reset(jax.random.split(k_env, batch))
        return TRPOState(params, vtx.init(params), env_state, obs,
                         jnp.zeros((), jnp.int32))

    def update_from_traj(state: TRPOState, traj, obs, env_state):
        """One TRPO policy+value update from an already-collected
        trajectory (used directly by GAIL, gail/model.py, where the
        rewards are the adversary's, not the env's)."""
        dist_old, values = dist_and_value(state.params, traj.obs)
        dist_old = jax.tree.map(jax.lax.stop_gradient, dist_old)
        _, last_value = dist_and_value(state.params, obs)
        adv, ret = gae(traj.reward, values, traj.done.astype(jnp.float32),
                       last_value, cfg.gamma, cfg.lam)
        adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
        old_logp = log_prob(dist_old, traj.action)

        def surrogate(params):
            dist, _ = dist_and_value(params, traj.obs)
            ratio = jnp.exp(log_prob(dist, traj.action) - old_logp)
            gain = jnp.mean(ratio * adv) + cfg.entcoeff * jnp.mean(
                entropy(dist))
            return gain

        def mean_kl(params):
            dist, _ = dist_and_value(params, traj.obs)
            return jnp.mean(kl(dist_old, dist))

        g = jax.grad(surrogate)(state.params)
        g = maybe_pmean(g, axis_name)
        g_flat = _flat(g)

        def fvp(v_flat):
            v = _unflat(v_flat, state.params)
            kl_grad = jax.grad(mean_kl)
            _, hvp = jax.jvp(kl_grad, (state.params,), (v,))
            hvp = maybe_pmean(hvp, axis_name)
            return _flat(hvp) + cfg.cg_damping * v_flat

        # Conjugate gradient (trpo_mpi cg())
        def cg_body(carry, _):
            x, r, p, rdotr = carry
            Ap = fvp(p)
            alpha = rdotr / (jnp.dot(p, Ap) + 1e-10)
            x = x + alpha * p
            r = r - alpha * Ap
            new_rdotr = jnp.dot(r, r)
            p = r + (new_rdotr / (rdotr + 1e-10)) * p
            return (x, r, p, new_rdotr), None

        x0 = jnp.zeros_like(g_flat)
        (step_dir, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, g_flat, g_flat, jnp.dot(g_flat, g_flat)),
            None, length=cfg.cg_iters)

        shs = 0.5 * jnp.dot(step_dir, fvp(step_dir))
        lm = jnp.sqrt(jnp.maximum(shs / cfg.max_kl, 1e-10))
        full_step = step_dir / lm
        expected_improve = jnp.dot(g_flat, full_step)

        gain_before = surrogate(state.params)

        # Backtracking line search (trpo_mpi:298-320)
        def ls_cond(carry):
            i, _, accepted = carry
            return (i < cfg.backtrack_iters) & ~accepted

        def ls_body(carry):
            i, frac, _ = carry
            cand = _unflat(_flat(state.params) + frac * full_step,
                           state.params)
            gain = surrogate(cand)
            klval = mean_kl(cand)
            ok = (gain > gain_before) & (klval <= cfg.max_kl * 1.5)
            frac_next = jnp.where(
                ok, frac, frac * jnp.asarray(cfg.backtrack_coeff, frac.dtype))
            return (i + 1, frac_next, ok)

        _, frac, accepted = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.zeros((), jnp.int32),
                               jnp.ones((), g_flat.dtype),
                               jnp.zeros((), bool)))
        frac = jnp.where(accepted, frac, 0.0)
        params = _unflat(_flat(state.params) + frac * full_step,
                         state.params)

        # Value function regression (separate Adam, vf_iters epochs)
        def vf_loss(p):
            _, v = dist_and_value(p, traj.obs)
            return jnp.mean((v - ret) ** 2)

        def vf_step(carry, _):
            p, o = carry
            vg = maybe_pmean(jax.grad(vf_loss)(p), axis_name)
            up, o = vtx.update(vg, o, p)
            return (optax.apply_updates(p, up), o), None

        (params, vf_opt), _ = jax.lax.scan(
            vf_step, (params, state.vf_opt), None, length=cfg.vf_iters)

        metrics = {"gain": gain_before, "kl": mean_kl(params),
                   "accepted": accepted.astype(jnp.float32),
                   "reward_mean": jnp.mean(traj.reward),
                   "expected_improve": expected_improve}
        return TRPOState(params, vf_opt, env_state, obs,
                         state.step + 1), metrics

    def update_fn(state: TRPOState, key):
        env_state, obs, traj = collect_rollout(
            env, lambda o, k: sample(state.params, o, k),
            state.env_state, state.obs, key, cfg.n_steps)
        return update_from_traj(state, traj, obs, env_state)

    update_fn.from_traj = update_from_traj
    update_fn.sample = sample
    return init_fn, update_fn
