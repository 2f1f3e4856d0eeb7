"""DCARL agent server — the ``DCARL_agent.py`` entry point, TPU-native.

The reference agent process (SW/tools/DCARL/DCARL_agent.py:18-43) makes
a socket-backed gym env (``zzz_lane-v0``: reward 1/step, 0 on
collision — gym_routing/envs/zzz.py:62-105), loads-or-creates a DQN,
and learns online while the on-vehicle planner connects over msgpack
TCP (port 2345) for decisions.

Here the same capability runs as ONE device-resident session: the DQN,
the replay buffer, the continuous-state confidence store and the
RLS gating all live on device, and the socket bridge
(dcarl_tpu.bridge.AgentServer) only moves 20-float states and one int
per tick.  Per tick (all under jit):

  eps-greedy DQN proposal -> RLS act_train/act_test filter ->
  reward bookkeeping (1/step, 0 on collision) -> n-step trajectory
  flush into the confidence store -> replay push -> one SGD step.

Run ``--selftest`` to exercise the full loop with an in-process
synthetic planner (no ROS needed): it drives a few hundred ticks and
prints the learning/state of the store.
"""

import argparse
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dcarl_tpu.bridge import AgentServer, PlannerClient
from dcarl_tpu.config import DQNConfig, StoreConfig
from dcarl_tpu.core import rls, store as cstore
from dcarl_tpu.models import replay as RB
from dcarl_tpu.models.dqn import DQN
from dcarl_tpu.models.networks import MLPQNet
from dcarl_tpu.utils import checkpoint as ckpt
from dcarl_tpu.utils.logging import MetricsLogger

OBS_DIM = 20
NUM_ACTIONS = 8  # 0 = rule (LaneUtility), 1 = brake, 2-7 lane/speed deltas


class AgentSession:
    """Host wrapper owning the device state; thread-safe for the
    multi-connection server (one lock, ticks are sub-millisecond)."""

    def __init__(self, seed: int = 0, is_training: bool = True,
                 ckpt_path: str | None = None):
        self.scfg = StoreConfig()
        self.dcfg = DQNConfig(batch_size=32, replay_capacity=1 << 16)
        self.dqn = DQN(MLPQNet(num_actions=NUM_ACTIONS), OBS_DIM, self.dcfg)
        self.is_training = is_training
        self.half_widths = jnp.asarray(cstore.FIELD_HALF_WIDTHS[:OBS_DIM]
                                       + (0.1,), jnp.float32)
        key = jax.random.PRNGKey(seed)
        self.state = self.dqn.init(key)
        self.store = cstore.store_init(self.scfg.capacity, OBS_DIM + 1)
        self.traj = rls.traj_buffer_init(self.scfg.n_step_window, OBS_DIM)
        self.key = key
        self.prev = None  # (obs, env_action)
        self.lock = threading.Lock()
        self.logger = MetricsLogger()
        self.ticks = 0
        self.episodes = 0
        self.ckpt_path = ckpt_path
        if ckpt_path and os.path.exists(ckpt_path):
            self.state = ckpt.load_npz(ckpt_path, self.state)
            print(f"loaded model from {ckpt_path}")

        scfg, dqn = self.scfg, self.dqn

        @jax.jit
        def tick(state, store, traj, prev_obs, prev_action, has_prev,
                 obs, collision, key):
            k_eps, k_gate, k_train = jax.random.split(key, 3)
            # reward for the PREVIOUS action (zzz.py:69-77 semantics)
            reward = jnp.where(collision > 0, 0.0, 1.0)
            done = collision > 0

            # record the executed action in both datasets (dqn.py:226-236)
            traj, recs = rls.traj_buffer_push(
                traj, prev_obs, prev_action.astype(jnp.float32),
                reward, done, scfg)
            recs = recs._replace(valid=recs.valid & has_prev)
            store = rls.insert_records(store, recs)
            replay = RB.replay_push(
                state.replay, prev_obs[None], prev_action[None],
                reward[None], obs[None], done.astype(jnp.float32)[None],
                mask=jnp.broadcast_to(has_prev, (1,)))
            state = state._replace(replay=replay)

            # decide: eps-greedy proposal filtered by confidence gating
            proposal = dqn.act_epsilon_greedy(state, obs[None], k_eps)[0]
            stats = rls.all_action_stats(store, obs[None],
                                         self.half_widths, NUM_ACTIONS)
            if is_training:
                action = rls.act_train(stats, proposal[None], k_gate,
                                       scfg)[0]
            else:
                action = rls.act_test(stats, scfg)[0]

            # learn once replay has a batch
            can_train = state.replay.size >= dqn.cfg.batch_size
            def do_train(s):
                s2, loss = dqn.train_step(s, k_train)
                return s2, loss
            state, loss = jax.lax.cond(
                can_train & is_training, do_train,
                lambda s: (s._replace(frame=s.frame + 1), jnp.float32(0.0)),
                state)
            state = jax.lax.cond(
                state.frame % dqn.cfg.target_update_every == 0,
                dqn.update_target, lambda s: s, state)
            return state, store, traj, action, reward, done, loss

        self._tick = tick

    def decide(self, msg):
        """Bridge policy callback: msg = 20-D state + [collision,
        leave_mmap]; returns the gated action."""
        obs = jnp.asarray(msg[:OBS_DIM], jnp.float32)
        collision = jnp.asarray(float(msg[OBS_DIM]), jnp.float32)
        leave = float(msg[OBS_DIM + 1]) if len(msg) > OBS_DIM + 1 else 0.0
        with self.lock:
            self.key, k = jax.random.split(self.key)
            if self.prev is None:
                prev_obs = jnp.zeros((OBS_DIM,), jnp.float32)
                prev_action = jnp.zeros((), jnp.int32)
                has_prev = jnp.asarray(False)
            else:
                prev_obs, prev_action = self.prev
                has_prev = jnp.asarray(True)
            (self.state, self.store, self.traj, action, reward, done,
             loss) = self._tick(self.state, self.store, self.traj,
                                prev_obs, prev_action, has_prev,
                                obs, collision, k)
            a = int(action)
            self.prev = None if (done or leave > 0) else (obs, jnp.asarray(
                a, jnp.int32))
            self.ticks += 1
            if done or leave > 0:
                self.episodes += 1
                if self.ckpt_path and self.episodes % 20 == 0:
                    ckpt.save_npz(self.ckpt_path, self.state)
            if self.ticks % 200 == 0:
                self.logger.logkv("ticks", self.ticks)
                self.logger.logkv("episodes", self.episodes)
                self.logger.logkv("store_rows", int(self.store.size))
                self.logger.logkv("loss", float(loss))
                self.logger.dumpkvs()
        return a


def selftest(session: AgentSession, port: int, n_ticks: int = 400):
    """Synthetic planner: random-walk multilane states, occasional
    collisions — checks the full socket + learning loop end-to-end."""
    client = PlannerClient(port=port)
    rng = np.random.default_rng(0)
    state = np.zeros(OBS_DIM)
    actions = []
    for t in range(n_ticks):
        state[1] = rng.integers(0, 2)          # ego lane
        state[2] = np.clip(state[2] + rng.normal(0, 0.5), 0, 12)  # speed
        state[4:] = rng.normal(0, 5, OBS_DIM - 4)
        collision = int(rng.random() < 0.02)
        actions.append(client.decide(state.tolist(), collision=collision))
    client.close()
    hist = np.bincount(actions, minlength=NUM_ACTIONS)
    print(f"selftest: {n_ticks} ticks, episodes={session.episodes}, "
          f"store_rows={int(session.store.size)}, action hist={hist.tolist()}")
    assert session.ticks == n_ticks
    assert int(session.store.size) > 0
    print("selftest OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=2345)
    ap.add_argument("--test", action="store_true",
                    help="test mode: z-test confidence gating, no learning")
    ap.add_argument("--ckpt", default=None, help="npz checkpoint path")
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()

    session = AgentSession(is_training=not args.test, ckpt_path=args.ckpt)
    port = 0 if args.selftest else args.port
    with AgentServer(session.decide, port=port) as srv:
        print(f"DCARL agent serving on {srv.address}")
        if args.selftest:
            selftest(session, srv.address[1])
            return
        threading.Event().wait()  # serve forever


if __name__ == "__main__":
    main()
