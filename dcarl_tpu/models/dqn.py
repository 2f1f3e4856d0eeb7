"""DQN learner with trust-set punishment, UCB exploration, and RLS
gating — the learning loops of the reference, unified.

Covers three reference loops:

* the CARLA attention-DQN trainer
  (Data_From_Carla/Agent/drl_library/dqn/dqn.py:176-213 TD loss with
  ``no_data_punishment`` when the next encoded state is outside the
  trust set; :114-131 UCB exploration; :253-271 epsilon/beta
  schedules),
* the SB fork's DQN+RLS hybrid
  (software/.../stable_baselines/deepq/dqn.py:226-236: epsilon-greedy
  proposes, ``RLS.act`` filters, both replay and the RLS dataset record
  the executed action),
* double-Q target computation (SB deepq/build_graph.py capability).

All learner state is one pytree (``DQNState``), every update is a pure
jitted function, and gradients reduce with ``optax`` so the same code
runs single-chip or pmean-reduced across a mesh.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from dcarl_tpu.config import DQNConfig
from dcarl_tpu.models import replay as RB
from dcarl_tpu.models import trustset as TS


class DQNState(NamedTuple):
    params: dict
    target_params: dict
    opt_state: optax.OptState
    replay: RB.Replay
    frame: jax.Array  # i32 global frame counter


def epsilon_by_frame(frame, cfg: DQNConfig = DQNConfig()):
    """epsilon_final + (eps0 - eps_final) * exp(-frame / decay)
    (dqn.py:253-258)."""
    return cfg.epsilon_final + (cfg.epsilon_start - cfg.epsilon_final) \
        * jnp.exp(-frame.astype(jnp.float32) / cfg.epsilon_decay)


def beta_by_frame(frame, cfg: DQNConfig = DQNConfig()):
    """min(1, beta0 + frame * (1 - beta0) / beta_frames) (dqn.py:260-263)."""
    return jnp.minimum(
        1.0,
        cfg.beta_start + frame.astype(jnp.float32)
        * (1.0 - cfg.beta_start) / cfg.beta_frames)


class DQN:
    """Functional learner wrapper: holds the module + optimizer, all
    mutable state lives in DQNState."""

    def __init__(self, network: nn.Module, obs_dim: int,
                 cfg: DQNConfig = DQNConfig(), double_q: bool = False):
        self.net = network
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.double_q = double_q
        self.tx = optax.adam(cfg.lr)

    def init(self, key: jax.Array, replay_capacity: Optional[int] = None
             ) -> DQNState:
        params = self.net.init(key, jnp.zeros((1, self.obs_dim)))
        cap = replay_capacity or self.cfg.replay_capacity
        return DQNState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=self.tx.init(params),
            replay=RB.replay_init(cap, self.obs_dim),
            frame=jnp.zeros((), jnp.int32),
        )

    def q_values(self, params, obs):
        return self.net.apply(params, obs)

    # ------------------------------------------------------------------
    # Action selection
    # ------------------------------------------------------------------

    def act_epsilon_greedy(self, state: DQNState, obs, key):
        """[B] epsilon-greedy actions (Q_network.act, dqn.py:133-151)."""
        k_eps, k_act = jax.random.split(key)
        q = self.q_values(state.params, obs)
        greedy = jnp.argmax(q, axis=-1)
        rand = jax.random.randint(k_act, greedy.shape, 0, q.shape[-1])
        eps = epsilon_by_frame(state.frame, self.cfg)
        explore = jax.random.uniform(k_eps, greedy.shape) < eps
        return jnp.where(explore, rand, greedy).astype(jnp.int32)

    def act_ts(self, state: DQNState, ts: TS.TrustSet, obs, enc_obs,
               num_actions=None):
        """Trust-set-gated argmax: out-of-set actions scored -1000
        (act_ts, dqn.py:101-112)."""
        q = self.q_values(state.params, obs)
        a = num_actions or q.shape[-1]
        in_ts = TS.in_trust_set_action(ts, enc_obs, a)
        q = jnp.where(in_ts, q[..., :a], -1000.0)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)

    def act_ts_explore(self, state: DQNState, ts: TS.TrustSet, obs, enc_obs,
                       num_actions=None):
        """UCB exploration: q + c * sqrt(log sum(N) / N_a)
        (act_ts_explore, dqn.py:114-131)."""
        q = self.q_values(state.params, obs)
        a = num_actions or q.shape[-1]
        n_a = jnp.maximum(
            TS.state_action_counts(ts, enc_obs, a), 1).astype(jnp.float32)
        total = jnp.sum(n_a, axis=-1, keepdims=True)
        bonus = self.cfg.ucb_c * jnp.sqrt(jnp.log(total) / n_a)
        return jnp.argmax(q[..., :a] + bonus, axis=-1).astype(jnp.int32)

    # ------------------------------------------------------------------
    # Learning
    # ------------------------------------------------------------------

    def td_loss(self, params, target_params, batch: RB.Batch,
                punishment: jax.Array):
        """Weighted TD loss with additive trust-set punishment
        (compute_td_loss, dqn.py:176-213): target =
        r + gamma * max_a' Q_target(s', a') * (1 - done) + punishment."""
        q = self.q_values(params, batch.obs)
        q_sa = jnp.take_along_axis(q, batch.action[:, None], axis=1)[:, 0]

        if self.double_q:
            # double-Q: online net picks a', target net evaluates
            # (SB deepq/build_graph.py double_q capability)
            next_online = self.q_values(params, batch.next_obs)
            a_star = jnp.argmax(next_online, axis=-1)
            next_target = self.q_values(target_params, batch.next_obs)
            next_q = jnp.take_along_axis(
                next_target, a_star[:, None], axis=1)[:, 0]
        else:
            next_q = jnp.max(self.q_values(target_params, batch.next_obs),
                             axis=-1)

        target = batch.reward + self.cfg.gamma * next_q * (1.0 - batch.done) \
            + punishment
        target = jax.lax.stop_gradient(target)
        per_elem = (q_sa - target) ** 2 * batch.weights
        prios = per_elem + 1e-5
        return jnp.mean(per_elem), prios

    @partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: DQNState, key: jax.Array,
                   punishment_mask: Optional[jax.Array] = None
                   ) -> Tuple[DQNState, jax.Array]:
        """One prioritized-replay SGD step.  ``punishment_mask`` [B]
        marks samples whose next state is outside the trust set
        (no_data_punishment applied, dqn.py:191-196)."""
        beta = beta_by_frame(state.frame, self.cfg)
        batch = RB.replay_sample(state.replay, key, self.cfg.batch_size,
                                 alpha=self.cfg.priority_alpha, beta=beta)
        if punishment_mask is None:
            punishment = jnp.zeros((self.cfg.batch_size,))
        else:
            punishment = jnp.where(punishment_mask,
                                   self.cfg.no_data_punishment, 0.0)

        (loss, prios), grads = jax.value_and_grad(
            lambda p: self.td_loss(p, state.target_params, batch, punishment),
            has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        replay = RB.replay_update_priorities(state.replay, batch.indices,
                                             prios)
        return state._replace(params=params, opt_state=opt_state,
                              replay=replay,
                              frame=state.frame + 1), loss

    @partial(jax.jit, static_argnums=(0,))
    def train_step_with_trustset(self, state: DQNState, ts: TS.TrustSet,
                                 key: jax.Array,
                                 encode_fn_params: dict
                                 ) -> Tuple[DQNState, TS.TrustSet, jax.Array]:
        """The full reference update (compute_td_loss, dqn.py:176-213):
        sample, add the encoded batch to the trust set, punish targets
        whose next encoded state has no trust-set data, SGD."""
        beta = beta_by_frame(state.frame, self.cfg)
        k_s, k_t = jax.random.split(key)
        batch = RB.replay_sample(state.replay, k_s, self.cfg.batch_size,
                                 alpha=self.cfg.priority_alpha, beta=beta)

        enc = self.net.apply(encode_fn_params, batch.obs,
                             method="encoded_state")
        enc_next = self.net.apply(encode_fn_params, batch.next_obs,
                                  method="encoded_state")
        ts = TS.add_data(ts, enc, batch.action.astype(jnp.float32),
                         batch.reward)
        num_actions = self.q_values(state.params, batch.obs[:1]).shape[-1]
        in_ts = TS.in_trust_set(ts, enc_next, num_actions)
        punishment = jnp.where(in_ts, 0.0, self.cfg.no_data_punishment)

        (loss, prios), grads = jax.value_and_grad(
            lambda p: self.td_loss(p, state.target_params, batch, punishment),
            has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        replay = RB.replay_update_priorities(state.replay, batch.indices,
                                             prios)
        new_state = state._replace(params=params, opt_state=opt_state,
                                   replay=replay, frame=state.frame + 1)
        return new_state, ts, loss

    def update_target(self, state: DQNState) -> DQNState:
        """Hard target sync every cfg.target_update_every frames
        (update_target, dqn.py:248-249)."""
        return state._replace(
            target_params=jax.tree.map(jnp.copy, state.params))


# ---------------------------------------------------------------------------
# Parameter-space noise exploration (SB deepq/build_graph.py param_noise
# capability: perturbed-network action selection with the adaptive scale
# rule of Plappert et al., as implemented by build_act_with_param_noise)
# ---------------------------------------------------------------------------


class ParamNoiseState(NamedTuple):
    """Adaptive parameter-noise state (build_graph.py's
    param_noise_scale / param_noise_threshold variables)."""

    scale: jax.Array      # current perturbation stddev
    threshold: jax.Array  # action-distribution KL target


def param_noise_init(initial_scale: float = 0.01) -> ParamNoiseState:
    return ParamNoiseState(scale=jnp.asarray(initial_scale, jnp.float32),
                           threshold=jnp.asarray(0.0, jnp.float32))


def perturb_params(params, key: jax.Array, scale: jax.Array):
    """Gaussian perturbation of every weight leaf
    (build_graph.py perturb_vars: var + N(0, scale))."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    noisy = [l + scale * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, keys)]
    return jax.tree.unflatten(treedef, noisy)


def param_noise_threshold_from_eps(eps: jax.Array, num_actions: int):
    """build_act_with_param_noise ties the KL target to the epsilon
    schedule: -log(1 - eps + eps/|A|)."""
    return -jnp.log(1.0 - eps + eps / num_actions)


class DQNParamNoise:
    """Mixin-style helper bound to a DQN instance: perturbed action
    selection + the 1.01-factor adaptive scale update."""

    def __init__(self, dqn: DQN):
        self.dqn = dqn

    @partial(jax.jit, static_argnums=(0,))
    def act(self, state: DQNState, pn: ParamNoiseState, obs, key):
        """Greedy action under the perturbed network
        (build_act_with_param_noise: deterministic w.r.t. the sampled
        perturbation; reset_ph resamples by passing a fresh key)."""
        noisy = perturb_params(state.params, key, pn.scale)
        q = self.dqn.q_values(noisy, obs)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)

    @partial(jax.jit, static_argnums=(0,))
    def adapt(self, state: DQNState, pn: ParamNoiseState, obs,
              key: jax.Array) -> Tuple[ParamNoiseState, jax.Array]:
        """Scale adaption (build_graph.py update_scale): measure the
        mean KL between the clean and perturbed action distributions on
        a batch; grow the scale by 1.01 when KL < threshold, shrink
        otherwise.  Threshold follows the epsilon schedule."""
        q = self.dqn.q_values(state.params, obs)
        noisy = perturb_params(state.params, key, pn.scale)
        q_pert = self.dqn.q_values(noisy, obs)
        logp = jax.nn.log_softmax(q, axis=-1)
        logq = jax.nn.log_softmax(q_pert, axis=-1)
        kl = jnp.mean(jnp.sum(jnp.exp(logp) * (logp - logq), axis=-1))
        eps = epsilon_by_frame(state.frame, self.dqn.cfg)
        thresh = param_noise_threshold_from_eps(eps, q.shape[-1])
        scale = jnp.where(kl < thresh, pn.scale * 1.01, pn.scale / 1.01)
        return ParamNoiseState(scale=scale, threshold=thresh), kl
