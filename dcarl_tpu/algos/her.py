"""HER — hindsight experience replay.

TPU-native form of the fork's ``her/`` (163 LoC:
HindsightExperienceReplayWrapper with the 'future' strategy +
BitFlippingEnv test fixture, common/bit_flipping_env.py).  Episodes are
stored as fixed-length [episode, T, ...] tensors; relabeling draws a
future achieved-goal index per sampled transition inside the jitted
sampler — no Python-side episode lists.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dcarl_tpu.algos.nets import MLP


# ---------------------------------------------------------------------------
# BitFlippingEnv fixture (common/bit_flipping_env.py)


class BitFlipState(NamedTuple):
    bits: jax.Array   # [B, n] {0,1}
    goal: jax.Array   # [B, n]
    t: jax.Array      # [B]


def bit_flipping_env(n_bits: int = 6, ep_len: Optional[int] = None):
    """reset(keys[B,2]) / step(state, action[B] i32, keys) with sparse
    reward 0 on goal match else -1 (the HER paper's canonical task)."""
    T = ep_len or n_bits

    def _draw_pair(keys):
        """Per-row (bits, goal) Bernoulli draws from [B] row keys."""
        def one(k):
            k1, k2 = jax.random.split(k)
            return (jax.random.bernoulli(k1, 0.5, (n_bits,)),
                    jax.random.bernoulli(k2, 0.5, (n_bits,)))

        bits, goal = jax.vmap(one)(keys)
        return bits.astype(jnp.float32), goal.astype(jnp.float32)

    def reset(keys):
        bits, goal = _draw_pair(keys)
        st = BitFlipState(bits, goal, jnp.zeros((bits.shape[0],), jnp.int32))
        return st, jnp.concatenate([bits, goal], axis=-1)

    def step(state: BitFlipState, action, keys):
        flip = jax.nn.one_hot(action, n_bits, dtype=state.bits.dtype)
        bits = jnp.abs(state.bits - flip)
        solved = jnp.all(bits == state.goal, axis=-1)
        reward = jnp.where(solved, 0.0, -1.0)
        t = state.t + 1
        done = solved | (t >= T)

        # auto-reset
        new_bits, new_goal = _draw_pair(keys)
        d = done[:, None]
        bits_out = jnp.where(d, new_bits, bits)
        goal_out = jnp.where(d, new_goal, state.goal)
        t_out = jnp.where(done, 0, t)
        obs = jnp.concatenate([bits_out, goal_out], axis=-1)
        return BitFlipState(bits_out, goal_out, t_out), obs, reward, done

    return reset, step, T


# ---------------------------------------------------------------------------
# Episodic buffer + future-strategy relabeling


class HERBuffer(NamedTuple):
    """[E, T, ...] episode store; ``achieved`` is the achieved-goal
    trajectory used for relabeling."""

    obs: jax.Array       # [E, T, n]  (state part only)
    action: jax.Array    # [E, T] i32
    next_obs: jax.Array  # [E, T, n]
    goal: jax.Array      # [E, n]     original episode goal
    length: jax.Array    # [E] i32
    size: jax.Array
    head: jax.Array


def her_buffer_init(episodes: int, ep_len: int, n: int) -> HERBuffer:
    return HERBuffer(
        obs=jnp.zeros((episodes, ep_len, n)),
        action=jnp.zeros((episodes, ep_len), jnp.int32),
        next_obs=jnp.zeros((episodes, ep_len, n)),
        goal=jnp.zeros((episodes, n)),
        length=jnp.zeros((episodes,), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
    )


def her_buffer_push(buf: HERBuffer, obs, action, next_obs, goal, length
                    ) -> HERBuffer:
    """Append a batch of complete episodes ([B, T, ...])."""
    E = buf.obs.shape[0]
    b = obs.shape[0]
    slots = (buf.head + jnp.arange(b)) % E
    return HERBuffer(
        obs=buf.obs.at[slots].set(obs.astype(buf.obs.dtype)),
        action=buf.action.at[slots].set(action.astype(buf.action.dtype)),
        next_obs=buf.next_obs.at[slots].set(next_obs.astype(buf.next_obs.dtype)),
        goal=buf.goal.at[slots].set(goal.astype(buf.goal.dtype)),
        length=buf.length.at[slots].set(length.astype(buf.length.dtype)),
        size=jnp.minimum(buf.size + b, E),
        head=(buf.head + b) % E,
    )


class HERBatch(NamedTuple):
    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    next_obs: jax.Array
    done: jax.Array


def her_sample(buf: HERBuffer, key: jax.Array, batch_size: int,
               relabel_prob: float = 0.8) -> HERBatch:
    """'future' strategy (her/replay_buffer.py): with probability
    ``relabel_prob`` replace the goal by an achieved state from a
    uniformly-drawn future step of the same episode; reward/done are
    recomputed against the (possibly new) goal."""
    k_e, k_t, k_f, k_p = jax.random.split(key, 4)
    E = buf.obs.shape[0]
    Tmax = buf.obs.shape[1]

    ep = jax.random.randint(k_e, (batch_size,), 0, jnp.maximum(buf.size, 1))
    length = buf.length[ep]
    t = (jax.random.uniform(k_t, (batch_size,))
         * length.astype(jnp.float32)).astype(jnp.int32)
    t = jnp.clip(t, 0, Tmax - 1)

    # future index in (t, length]
    u = jax.random.uniform(k_f, (batch_size,))
    fut = t + 1 + (u * (length - t - 1).astype(jnp.float32)).astype(jnp.int32)
    fut = jnp.clip(fut, 0, Tmax - 1)

    relabel = jax.random.uniform(k_p, (batch_size,)) < relabel_prob
    achieved_future = buf.next_obs[ep, fut]
    goal = jnp.where(relabel[:, None], achieved_future, buf.goal[ep])

    s = buf.obs[ep, t]
    s2 = buf.next_obs[ep, t]
    solved = jnp.all(s2 == goal, axis=-1)
    reward = jnp.where(solved, 0.0, -1.0)
    done = solved | (t + 1 >= length)

    return HERBatch(
        obs=jnp.concatenate([s, goal], axis=-1),
        action=buf.action[ep, t],
        reward=reward,
        next_obs=jnp.concatenate([s2, goal], axis=-1),
        done=done.astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# HER + DQN learner (the fork runs HER over DQN/SAC/TD3; DQN matches
# the BitFlipping benchmark, test_her.py)


class HERDQNConfig(NamedTuple):
    gamma: float = 0.98
    lr: float = 1e-3
    batch_size: int = 128
    buffer_episodes: int = 512
    epsilon: float = 0.2
    target_period: int = 40


class HERDQNState(NamedTuple):
    params: dict
    target_params: dict
    opt_state: optax.OptState
    buffer: HERBuffer
    step: jax.Array


def make_her_dqn(n_bits: int, cfg: HERDQNConfig = HERDQNConfig(),
                 hidden=(256,), axis_name: Optional[str] = None):
    """Returns (init, collect_and_update, q_fn) for BitFlippingEnv."""
    reset_fn, step_fn, T = bit_flipping_env(n_bits)
    net = MLP((*hidden, n_bits))
    tx = optax.adam(cfg.lr)

    def init_fn(key):
        params = net.init(key, jnp.zeros((1, 2 * n_bits)))
        return HERDQNState(params, params, tx.init(params),
                           her_buffer_init(cfg.buffer_episodes, T, n_bits),
                           jnp.zeros((), jnp.int32))

    def rollout_episodes(params, key, batch: int):
        k_r, k_s = jax.random.split(key)
        st, obs = reset_fn(jax.random.split(k_r, batch))

        def body(carry, k):
            st, obs, done_seen, length = carry
            q = net.apply(params, obs)
            ke, ka, kv = jax.random.split(k, 3)
            greedy = jnp.argmax(q, axis=-1)
            rand = jax.random.randint(ka, greedy.shape, 0, n_bits)
            act = jnp.where(
                jax.random.uniform(ke, greedy.shape) < cfg.epsilon,
                rand, greedy)
            bits_before = st.bits
            st2, obs2, rew, done = step_fn(st, act,
                                           jax.random.split(kv, batch))
            # the achieved state after the flip — NOT st2.bits, which is
            # already auto-reset on terminal steps
            achieved = jnp.abs(bits_before - jax.nn.one_hot(
                act, n_bits, dtype=bits_before.dtype))
            rec = (bits_before, act, jnp.where(done_seen[:, None],
                                               bits_before, achieved))
            length = length + (~done_seen).astype(jnp.int32)
            done_seen = done_seen | done
            return (st2, obs2, done_seen, length), rec

        goal = st.goal
        init = (st, obs, jnp.zeros((batch,), bool),
                jnp.zeros((batch,), jnp.int32))
        (_, _, _, length), (bits, acts, next_bits) = jax.lax.scan(
            body, init, jax.random.split(k_s, T))
        # [T, B, ...] -> [B, T, ...]
        tr = lambda a: jnp.swapaxes(a, 0, 1)
        return tr(bits), tr(acts), tr(next_bits), goal, length

    def td_loss(params, target_params, mb: HERBatch):
        q = net.apply(params, mb.obs)
        qa = jnp.take_along_axis(q, mb.action[:, None], axis=-1)[:, 0]
        nq = jnp.max(net.apply(target_params, mb.next_obs), axis=-1)
        y = mb.reward + cfg.gamma * (1.0 - mb.done) * nq
        return jnp.mean((qa - jax.lax.stop_gradient(y)) ** 2)

    def update_fn(state: HERDQNState, key, batch: int = 16,
                  n_updates: int = 8):
        k_roll, k_train = jax.random.split(key)
        bits, acts, next_bits, goal, length = rollout_episodes(
            state.params, k_roll, batch)
        buf = her_buffer_push(state.buffer, bits, acts, next_bits, goal,
                              length)

        def train(carry, k):
            params, opt_state = carry
            mb = her_sample(buf, k, cfg.batch_size)
            g = jax.grad(td_loss)(params, state.target_params, mb)
            if axis_name is not None:
                g = jax.lax.pmean(g, axis_name)
            up, opt_state = tx.update(g, opt_state, params)
            return (optax.apply_updates(params, up), opt_state), None

        (params, opt_state), _ = jax.lax.scan(
            train, (state.params, state.opt_state),
            jax.random.split(k_train, n_updates))

        step = state.step + 1
        target = jax.tree.map(
            lambda t, p: jnp.where(step % cfg.target_period == 0, p, t),
            state.target_params, params)
        return HERDQNState(params, target, opt_state, buf, step)

    def q_fn(state: HERDQNState, obs):
        return net.apply(state.params, obs)

    return init_fn, update_fn, q_fn, (reset_fn, step_fn, T)
