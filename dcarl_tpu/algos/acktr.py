"""ACKTR — actor-critic with Kronecker-factored trust region.

TPU-native form of the SB fork's ``acktr/acktr.py`` (415 LoC) +
``acktr/kfac.py`` (~1,000 LoC): A2C-style n-step rollouts optimized
with a K-FAC natural-gradient step.  Reference defaults mirrored from
``acktr.py:58-61`` (gamma 0.99, n_steps 20, ent_coef 0.01, vf_coef
0.25, vf_fisher_coef 1.0, learning_rate 0.25, max_grad_norm 0.5,
kfac_clip 0.001) and ``kfac.py`` (momentum 0.9, stats/param EMA decay
0.99, damping eps).

The TF K-FAC implementation registers ops on a graph and runs
asynchronous eigendecompositions; here each Dense block's Kronecker
factors are tiny (≤ 65×65) so the whole optimizer is a handful of
``jnp.linalg.solve`` calls inside the same jitted update:

* The network is an explicit list of Dense blocks (trunk + pi head +
  vf head) so per-layer input activations ``a`` and pre-activation
  Fisher gradients ``g`` are first-class values (captured with one
  ``jax.grad`` w.r.t. zero pre-activation perturbations — no TF
  variable-scope introspection).
* Fisher statistics use the reference's sampled Fisher: policy NLL at
  actions *sampled from the model* plus the Gaussian value-function
  Fisher ``0.5 vf_fisher_coef * (v - stop_grad(v)+noise)^2``
  (acktr.py setup_model: pg_fisher_loss + vf_fisher_loss).
* Factors A = E[âᵀâ] (â homogeneous: bias folded in) and
  G = E[ggᵀ] are EMA-averaged, Tikhonov-damped with the π-correction,
  inverted by solve; the preconditioned step is rescaled so that the
  Fisher-metric step length obeys ``lr² vᵀFv ≤ 2·kfac_clip``
  (kfac.py getKfacPrecondUpdates).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.algos import nets
from dcarl_tpu.algos.common import (EnvFns, collect_rollout,
                                    discounted_returns, maybe_pmean)


class ACKTRConfig(NamedTuple):
    n_steps: int = 20
    gamma: float = 0.99
    ent_coef: float = 0.01
    vf_coef: float = 0.25
    vf_fisher_coef: float = 1.0
    learning_rate: float = 0.25
    momentum: float = 0.9
    stats_decay: float = 0.99
    damping: float = 0.01
    kfac_clip: float = 0.001
    max_grad_norm: float = 0.5


# ---------------------------------------------------------------------------
# Explicit-layer actor-critic (so K-FAC sees every Dense block)


class Dense(NamedTuple):
    w: jax.Array   # [in, out]
    b: jax.Array   # [out]


def _init_dense(key, n_in, n_out, scale=None):
    scale = jnp.sqrt(2.0 / n_in) if scale is None else scale
    return Dense(scale * jax.random.normal(key, (n_in, n_out)),
                 jnp.zeros((n_out,)))


def _init_params(key, obs_dim, num_actions, hidden: Sequence[int]):
    keys = jax.random.split(key, len(hidden) + 2)
    layers, n_in = [], obs_dim
    for k, h in zip(keys[:-2], hidden):
        layers.append(_init_dense(k, n_in, h))
        n_in = h
    pi = _init_dense(keys[-2], n_in, num_actions, scale=0.01)
    vf = _init_dense(keys[-1], n_in, 1, scale=1.0)
    return layers + [pi, vf]


def _forward(params: List[Dense], obs, deltas=None):
    """Returns (logits, value, per-block input activations).  deltas,
    when given, are added to each block's pre-activation so their
    cotangents are exactly the K-FAC ``g`` statistics."""
    trunk, pi, vf = params[:-2], params[-2], params[-1]
    acts = []
    h = obs
    for i, layer in enumerate(trunk):
        acts.append(h)
        s = h @ layer.w + layer.b
        if deltas is not None:
            s = s + deltas[i]
        h = jnp.tanh(s)
    acts.append(h)  # input to pi head
    logits = h @ pi.w + pi.b
    if deltas is not None:
        logits = logits + deltas[len(trunk)]
    acts.append(h)  # input to vf head
    value = h @ vf.w + vf.b
    if deltas is not None:
        value = value + deltas[len(trunk) + 1]
    return logits, value[..., 0], acts


# ---------------------------------------------------------------------------
# K-FAC state + step


class KFACState(NamedTuple):
    factors_a: Tuple[jax.Array, ...]   # per block [in+1, in+1]
    factors_g: Tuple[jax.Array, ...]   # per block [out, out]
    velocity: List[Dense]
    t: jax.Array


def _kfac_init(params: List[Dense]):
    fa = tuple(jnp.eye(p.w.shape[0] + 1) for p in params)
    fg = tuple(jnp.eye(p.w.shape[1]) for p in params)
    vel = jax.tree.map(jnp.zeros_like, params)
    return KFACState(fa, fg, vel, jnp.zeros((), jnp.int32))


def _fisher_stats(params, obs_flat, key, cfg: ACKTRConfig):
    """Sampled-Fisher per-block (a, g) statistics.  obs_flat: [N, obs]."""
    n = obs_flat.shape[0]
    n_blocks = len(params)
    out_dims = [p.w.shape[1] for p in params]
    deltas = [jnp.zeros((n, d)) for d in out_dims]

    def fisher_loss(dl):
        logits, value, _ = _forward(params, obs_flat, dl)
        a_samp = jax.random.categorical(key, jax.lax.stop_gradient(logits))
        pg = -jnp.mean(nets.categorical_log_prob(logits, a_samp))
        noise = jax.random.normal(jax.random.fold_in(key, 1), value.shape)
        vf = cfg.vf_fisher_coef * 0.5 * jnp.mean(
            (value - jax.lax.stop_gradient(value) - noise) ** 2)
        return pg + vf

    g_list = jax.grad(fisher_loss)(deltas)
    _, _, acts = _forward(params, obs_flat)
    stats = []
    ones = jnp.ones((n, 1))
    for i in range(n_blocks):
        a_h = jnp.concatenate([acts[i], ones], -1)
        A = (a_h.T @ a_h) / n
        g = g_list[i] * n       # undo the mean: per-sample grads
        G = (g.T @ g) / n
        stats.append((A, G))
    return stats


def _kfac_step(params: List[Dense], grads: List[Dense], kf: KFACState,
               stats, cfg: ACKTRConfig):
    """Precondition grads by the Kronecker factors, rescale to the
    kfac_clip trust region, apply momentum + SGD."""
    new_fa, new_fg, nat = [], [], []
    d = cfg.stats_decay
    for (A, G), fa, fg, gr in zip(stats, kf.factors_a, kf.factors_g,
                                  grads):
        fa = d * fa + (1.0 - d) * A
        fg = d * fg + (1.0 - d) * G
        # π-corrected Tikhonov damping (Martens & Grosse eq. 15)
        tr_a = jnp.trace(fa) / fa.shape[0]
        tr_g = jnp.trace(fg) / fg.shape[0]
        pi_c = jnp.sqrt(jnp.maximum(tr_a, 1e-8)
                        / jnp.maximum(tr_g, 1e-8))
        eps = jnp.sqrt(cfg.damping)
        fa_d = fa + eps * pi_c * jnp.eye(fa.shape[0])
        fg_d = fg + eps / pi_c * jnp.eye(fg.shape[0])
        gw = jnp.concatenate([gr.w, gr.b[None, :]], 0)  # [in+1, out]
        nat_w = jnp.linalg.solve(
            fa_d, jnp.linalg.solve(fg_d, gw.T).T)
        nat.append(Dense(nat_w[:-1], nat_w[-1]))
        new_fa.append(fa)
        new_fg.append(fg)

    # Trust-region rescale: lr² vᵀFv ≤ 2 kfac_clip (getKfacPrecondUpdates)
    vFv = sum(jnp.sum(nv.w * gr.w) + jnp.sum(nv.b * gr.b)
              for nv, gr in zip(nat, grads))
    coeff = jnp.minimum(
        1.0, jnp.sqrt(2.0 * cfg.kfac_clip
                      / jnp.maximum(cfg.learning_rate ** 2 * vFv, 1e-12)))
    vel = jax.tree.map(lambda v, nv: cfg.momentum * v + coeff * nv,
                       kf.velocity, nat)
    params = jax.tree.map(lambda p, v: p - cfg.learning_rate * v,
                          params, vel)
    return params, KFACState(tuple(new_fa), tuple(new_fg), vel, kf.t + 1)


# ---------------------------------------------------------------------------


class ACKTRState(NamedTuple):
    params: List[Dense]
    kfac: KFACState
    env_state: object
    obs: jax.Array
    step: jax.Array


def make_acktr(env: EnvFns, cfg: ACKTRConfig = ACKTRConfig(),
               hidden=(64, 64), axis_name: Optional[str] = None):
    """Returns (init_fn(key, batch) -> ACKTRState,
    update_fn(state, key) -> (state, metrics)), both jittable."""
    assert env.num_actions is not None, "ACKTR here is discrete-action"
    num_actions = env.num_actions

    def init_fn(key, batch: int):
        k_net, k_env = jax.random.split(key)
        params = _init_params(k_net, env.obs_dim, num_actions, hidden)
        env_state, obs = env.reset(jax.random.split(k_env, batch))
        return ACKTRState(params, _kfac_init(params), env_state, obs,
                          jnp.zeros((), jnp.int32))

    def loss_fn(params, obs_flat, act_flat, ret_flat):
        logits, value, _ = _forward(params, obs_flat)
        logp = nets.categorical_log_prob(logits, act_flat)
        adv = ret_flat - value
        pg = -jnp.mean(logp * jax.lax.stop_gradient(adv))
        vf = jnp.mean(adv ** 2)
        ent = jnp.mean(nets.categorical_entropy(logits))
        return pg + cfg.vf_coef * vf - cfg.ent_coef * ent, (pg, vf, ent)

    def update_fn(state: ACKTRState, key):
        k_roll, k_fisher = jax.random.split(key)

        def policy(obs, k):
            logits, _, _ = _forward(state.params, obs)
            return jax.random.categorical(k, logits)

        env_state, obs, traj = collect_rollout(
            env, policy, state.env_state, state.obs, k_roll, cfg.n_steps)
        _, last_value, _ = _forward(state.params, obs)
        returns = discounted_returns(
            traj.reward, traj.done.astype(jnp.float32), last_value,
            cfg.gamma)

        n = cfg.n_steps * traj.reward.shape[1]
        obs_flat = traj.obs.reshape(n, -1)
        act_flat = traj.action.reshape(n)
        ret_flat = returns.reshape(n)

        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params, obs_flat, act_flat, ret_flat)
        grads = maybe_pmean(grads, axis_name)
        gnorm = jnp.sqrt(sum(jnp.sum(g.w ** 2) + jnp.sum(g.b ** 2)
                             for g in grads))
        scale = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-8))
        grads = jax.tree.map(lambda g: g * scale, grads)

        stats = _fisher_stats(state.params, obs_flat, k_fisher, cfg)
        stats = [(maybe_pmean(A, axis_name), maybe_pmean(G, axis_name))
                 for A, G in stats]
        params, kfac = _kfac_step(state.params, grads, state.kfac, stats,
                                  cfg)
        metrics = {"pg_loss": aux[0], "vf_loss": aux[1], "entropy": aux[2],
                   "reward_mean": jnp.mean(traj.reward)}
        return ACKTRState(params, kfac, env_state, obs,
                          state.step + 1), metrics

    return init_fn, update_fn
