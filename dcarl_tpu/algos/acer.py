"""ACER — actor-critic with experience replay.

TPU-native form of the SB fork's ``acer/acer_simple.py`` (680 LoC):
n-step on-policy segments plus a segment replay buffer, Retrace(1)
Q targets with truncated importance sampling and bias correction, and
the efficient trust-region step against a Polyak-averaged policy
network (Wang et al. 2017).  Reference defaults mirrored from
``acer_simple.py:108-133`` (gamma 0.99, n_steps 20, q_coef 0.5,
ent_coef 0.01, correction_term c=10, trust-region delta=1, avg-net
alpha=0.99, rmsprop 7e-4).

TPU-native choices vs the reference:

* The segment replay buffer (``acer/buffer.py``) becomes a
  fixed-capacity on-device ring of ``[T, B]`` segments inside the
  carried state; sampling is a ``jax.random.randint`` gather.
* The Poisson-distributed number of replay updates per on-policy
  update (``acer_simple.py learn``) becomes the fixed expectation
  ``replay_ratio`` so the program is shape-static under jit.
* The trust region is computed exactly as the reference does — in
  distribution (f) space: the policy-loss gradient w.r.t. the action
  probabilities is projected against k = -f_avg/f and pulled back
  through the network with one ``jax.vjp`` — no TF custom gradients.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dcarl_tpu.algos import nets
from dcarl_tpu.algos.common import EnvFns, collect_rollout, maybe_pmean, polyak

EPS = 1e-6


class ACERConfig(NamedTuple):
    n_steps: int = 20
    gamma: float = 0.99
    q_coef: float = 0.5
    ent_coef: float = 0.01
    learning_rate: float = 7e-4
    rprop_alpha: float = 0.99
    rprop_epsilon: float = 1e-5
    max_grad_norm: float = 10.0
    buffer_segments: int = 64      # ring capacity in segments
    replay_ratio: int = 4
    replay_start: int = 4          # segments in buffer before replay
    correction_term: float = 10.0  # c
    trust_region: bool = True
    alpha: float = 0.99            # average-net Polyak
    delta: float = 1.0             # trust-region radius


class _PolicyQNet(nets.nn.Module):
    """Shared-trunk categorical policy + per-action Q head — the
    AcerMlpPolicy surface (acer policies: pi and q over n_actions)."""

    num_actions: int
    hidden = (64, 64)

    @nets.nn.compact
    def __call__(self, obs):
        h = nets.MLP(self.hidden, activate_last=True)(obs)
        logits = nets.nn.Dense(self.num_actions)(h)
        q = nets.nn.Dense(self.num_actions)(h)
        return logits, q


class SegmentBuffer(NamedTuple):
    """Ring buffer of [T, B] rollout segments (acer/buffer.py)."""

    obs: jax.Array      # [C, T, B, obs]
    action: jax.Array   # [C, T, B]
    reward: jax.Array   # [C, T, B]
    done: jax.Array     # [C, T, B]
    mu: jax.Array       # [C, T, B, A] behaviour probabilities
    next_obs: jax.Array  # [C, B, obs]  (obs after the segment)
    size: jax.Array
    head: jax.Array


def _buffer_init(cap, t, b, obs_dim, num_actions):
    z = jnp.zeros
    return SegmentBuffer(
        z((cap, t, b, obs_dim)), z((cap, t, b), jnp.int32),
        z((cap, t, b)), z((cap, t, b)), z((cap, t, b, num_actions)),
        z((cap, b, obs_dim)),
        z((), jnp.int32), z((), jnp.int32))


def _buffer_push(buf: SegmentBuffer, seg) -> SegmentBuffer:
    obs, action, reward, done, mu, next_obs = seg
    i = buf.head
    return SegmentBuffer(
        buf.obs.at[i].set(obs),
        buf.action.at[i].set(action.astype(buf.action.dtype)),
        buf.reward.at[i].set(reward), buf.done.at[i].set(done),
        buf.mu.at[i].set(mu), buf.next_obs.at[i].set(next_obs),
        jnp.minimum(buf.size + 1, buf.obs.shape[0]),
        (buf.head + 1) % buf.obs.shape[0])


class ACERState(NamedTuple):
    params: dict
    avg_params: dict
    opt_state: optax.OptState
    buffer: SegmentBuffer
    env_state: object
    obs: jax.Array
    step: jax.Array


def make_acer(env: EnvFns, cfg: ACERConfig = ACERConfig(), batch: int = 8,
              axis_name: Optional[str] = None):
    """Returns (init_fn(key) -> ACERState, update_fn(state, key) ->
    (state, metrics)); one update = 1 on-policy + replay_ratio
    off-policy Retrace steps, one jitted program."""
    assert env.num_actions is not None, "ACER is discrete-action"
    num_actions = env.num_actions
    net = _PolicyQNet(num_actions)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.rmsprop(cfg.learning_rate, decay=cfg.rprop_alpha,
                      eps=cfg.rprop_epsilon))

    def probs_q(params, obs):
        logits, q = net.apply(params, obs)
        return jax.nn.softmax(logits), q

    def init_fn(key):
        k_net, k_env = jax.random.split(key)
        params = net.init(k_net, jnp.zeros((1, env.obs_dim)))
        env_state, obs = env.reset(jax.random.split(k_env, batch))
        buf = _buffer_init(cfg.buffer_segments, cfg.n_steps, batch,
                           env.obs_dim, num_actions)
        return ACERState(params, params, tx.init(params), buf, env_state,
                         obs, jnp.zeros((), jnp.int32))

    # -- Retrace targets + ACER loss over one [T, B] segment ---------------

    def qret_scan(reward, done, rho_bar_a, q_a, v, v_last):
        """Backward recursion (acer_simple q_retrace): qret = r + γ qret';
        after consuming step i, qret' = ρ̄ᵢ(qretᵢ − qᵢ) + vᵢ."""

        def body(qret_next, inp):
            r, d, rb, qa, vi = inp
            qret = r + cfg.gamma * qret_next * (1.0 - d)
            qret_prev = rb * (qret - qa) + vi
            return qret_prev, qret

        _, qrets = jax.lax.scan(
            body, v_last, (reward, done, rho_bar_a, q_a, v), reverse=True)
        return qrets

    def segment_loss_f(f, q, seg, avg_f):
        """Policy part of the loss as a function of the action
        probabilities f (for the f-space trust region) + auxiliary."""
        obs, action, reward, done, mu, v_last = seg
        v_last = jax.lax.stop_gradient(v_last)
        q = jax.lax.stop_gradient(q)
        f_a = jnp.take_along_axis(f, action[..., None], -1)[..., 0]
        q_a = jnp.take_along_axis(q, action[..., None], -1)[..., 0]
        v = jnp.sum(f * q, -1)
        rho = f / (mu + EPS)
        rho_a = jnp.take_along_axis(rho, action[..., None], -1)[..., 0]
        rho_bar = jnp.minimum(cfg.correction_term, rho_a)
        qret = qret_scan(reward, done, jax.lax.stop_gradient(rho_bar),
                         jax.lax.stop_gradient(q_a),
                         jax.lax.stop_gradient(v), v_last)
        adv = qret - jax.lax.stop_gradient(v)
        # truncated IS policy gradient (acer_simple loss_policy)
        gain_f = jnp.log(f_a + EPS) * jax.lax.stop_gradient(rho_bar) * adv
        # bias correction over all actions (loss_bc)
        coef = jax.nn.relu(1.0 - cfg.correction_term / (rho + EPS))
        adv_bc = q - jax.lax.stop_gradient(v)[..., None]
        gain_bc = jnp.sum(
            jnp.log(f + EPS)
            * jax.lax.stop_gradient(coef * f * adv_bc), -1)
        entropy = -jnp.sum(f * jnp.log(f + EPS), -1)
        loss_policy = -jnp.mean(gain_f + gain_bc)
        loss_ent = -cfg.ent_coef * jnp.mean(entropy)
        loss_q = cfg.q_coef * 0.5 * jnp.mean((qret - q_a) ** 2)
        return loss_policy + loss_ent, (loss_q, qret, q_a,
                                        jnp.mean(entropy))

    def segment_grads(params, avg_params, seg):
        """Full gradient: trust-region-projected policy gradient in f
        space pulled back by vjp (acer_simple trust-region block) plus
        the ordinary Q-loss gradient."""
        obs = seg[0]

        def f_of_params(p):
            f, _ = probs_q(p, obs)
            return f

        f, vjp_f = jax.vjp(f_of_params, params)
        _, q = probs_q(params, obs)
        avg_f, _ = probs_q(avg_params, obs)
        avg_f = jax.lax.stop_gradient(avg_f)

        gf, aux = jax.grad(
            lambda ff: segment_loss_f(ff, q, seg, avg_f),
            has_aux=True)(f)

        if cfg.trust_region:
            # g is the *descent* direction in f space; project so the
            # step keeps KL(avg || pi) small: k = -avg_f / f.
            k = -avg_f / (f + EPS)
            kg = jnp.sum(k * gf, -1, keepdims=True)
            k2 = jnp.sum(k * k, -1, keepdims=True)
            adj = jax.nn.relu((kg - cfg.delta) / (k2 + EPS))
            gf = gf - adj * k

        grads_pi = vjp_f(gf)[0]

        # Q-loss gradient: 0.5 q_coef (qret - q_a)^2 with qret frozen.
        _, (_, qret, _, _) = segment_loss_f(f, q, seg, avg_f)
        action = seg[1]

        def qloss_of_params(p):
            _, qq = probs_q(p, obs)
            q_a = jnp.take_along_axis(qq, action[..., None], -1)[..., 0]
            return cfg.q_coef * 0.5 * jnp.mean((qret - q_a) ** 2)

        grads_qloss = jax.grad(qloss_of_params)(params)
        grads = jax.tree.map(jnp.add, grads_pi, grads_qloss)
        return grads, aux

    def apply_segment(params, avg_params, opt_state, seg):
        grads, aux = segment_grads(params, avg_params, seg)
        grads = maybe_pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        avg_params = polyak(avg_params, params, 1.0 - cfg.alpha)
        return params, avg_params, opt_state, aux

    def update_fn(state: ACERState, key):
        k_roll, k_replay = jax.random.split(key)

        def policy(obs, k):
            f, _ = probs_q(state.params, obs)
            return jax.random.categorical(k, jnp.log(f + EPS))

        env_state, obs, traj = collect_rollout(
            env, policy, state.env_state, state.obs, k_roll, cfg.n_steps)
        mu, _ = probs_q(state.params, traj.obs)
        mu = jax.lax.stop_gradient(mu)

        def v_of(params, o):
            f, q = probs_q(params, o)
            return jnp.sum(f * q, -1)

        seg_on = (traj.obs, traj.action, traj.reward,
                  traj.done.astype(jnp.float32), mu,
                  v_of(state.params, obs))
        params, avg_params, opt_state, aux = apply_segment(
            state.params, state.avg_params, state.opt_state, seg_on)

        buf = _buffer_push(state.buffer,
                           (traj.obs, traj.action, traj.reward,
                            traj.done.astype(jnp.float32), mu, obs))

        # Off-policy replay updates (fixed replay_ratio; reference
        # draws Poisson(replay_ratio), acer_simple.learn)
        def replay_step(carry, k):
            p, ap, o = carry
            idx = jax.random.randint(k, (), 0, jnp.maximum(buf.size, 1))
            seg = (buf.obs[idx], buf.action[idx], buf.reward[idx],
                   buf.done[idx], buf.mu[idx], v_of(p, buf.next_obs[idx]))
            p2, ap2, o2, _ = apply_segment(p, ap, o, seg)
            ok = buf.size >= cfg.replay_start
            sel = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(ok, a, b), new, old)
            return (sel(p2, p), sel(ap2, ap), sel(o2, o)), None

        (params, avg_params, opt_state), _ = jax.lax.scan(
            replay_step, (params, avg_params, opt_state),
            jax.random.split(k_replay, cfg.replay_ratio))

        metrics = {"loss_q": aux[0], "entropy": aux[3],
                   "reward_mean": jnp.mean(traj.reward)}
        return ACERState(params, avg_params, opt_state, buf, env_state,
                         obs, state.step + 1), metrics

    return init_fn, update_fn
