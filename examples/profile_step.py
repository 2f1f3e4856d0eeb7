"""Component-level timing of the rollout hot path on the current backend.

Times each stage of the rule-driver step (env physics, Werling plan,
controller) separately under jit+scan, to locate the bottleneck.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dcarl_tpu.config import EnvConfig, WerlingConfig
from dcarl_tpu.env import driving_env as de
from dcarl_tpu.env.scenario import t_intersection
from dcarl_tpu.ops import spline as spl
from dcarl_tpu.planning import werling as W
from dcarl_tpu.control.controller import get_control

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
S = int(sys.argv[2]) if len(sys.argv) > 2 else 50

sc = t_intersection()
env_cfg = EnvConfig()
wcfg = WerlingConfig()
sa = de.scenario_to_device(sc, jnp.float32)
idx = de.in_state_indices(sc)
ref_line = jnp.asarray(sc.ref_path, jnp.float32)
rp = spl.refpath_from_xy(ref_line[:, 0], ref_line[:, 1])

keys = jax.random.split(jax.random.PRNGKey(0), B)
env0 = jax.jit(jax.vmap(lambda k: de.reset(sa, k, env_cfg)))(keys)
obs_ori0 = jax.jit(jax.vmap(lambda e: de.wrap_state(e, sa, idx, env_cfg)[1]))(env0)
step_keys = jax.random.split(jax.random.PRNGKey(1), S * B).reshape(S, B, 2)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    rate = B * S / best
    print(f"{name:28s} {best*1e3:9.2f} ms  {rate/1e3:10.1f}k env-steps/s")
    return out


# 1. env physics only (random actions)
@jax.jit
def env_only(env, keyseq):
    def body(e, k):
        act = jnp.zeros((B, 2), jnp.float32)
        e, obs, r, d, oo = jax.vmap(
            lambda ee, kk: de.step_autoreset(ee, act[0], kk, sa, idx, env_cfg)
        )(e, k)
        return e, r

    return jax.lax.scan(body, env, keyseq)


# 2. planner only (fixed obs)
@jax.jit
def plan_only(obs_ori, keyseq):
    def body(c, k):
        def one(oo):
            ego = oo[:5]
            objs = oo[5:].reshape(-1, 5).at[:, 4].set(0.0)
            valid = jnp.ones((objs.shape[0],), bool)
            out = W.plan_with_rule(rp, ref_line, ego, objs, valid, wcfg)
            return out.rule_index

        r = jax.vmap(one)(c)
        c = c + jnp.float32(1e-6) * r[:, None]  # keep scan live
        return c, r

    return jax.lax.scan(body, obs_ori, keyseq)


# 3. frenet projection only
@jax.jit
def frenet_only(obs_ori, keyseq):
    def body(c, k):
        def one(oo):
            st = W.start_state_from_ego(oo[0], oo[1], oo[2], oo[3], oo[4],
                                        ref_line)
            return st.s0 + st.c_d

        r = jax.vmap(one)(c)
        return c + 1e-6 * r[:, None], r

    return jax.lax.scan(body, obs_ori, keyseq)


# 4. lattice generation only
@jax.jit
def lattice_only(obs_ori, keyseq):
    def body(c, k):
        def one(oo):
            st = W.FrenetStart(s0=oo[0] * 0.01, c_d=oo[1] * 0.001,
                               c_d_d=oo[2] * 0.01, c_d_dd=oo[3] * 0.0,
                               c_speed=oo[2] * 0.1 + 3.0)
            lat = W.plan(rp, st, wcfg)
            return lat.cf[0] + lat.x[0, 0]

        r = jax.vmap(one)(c)
        return c + 1e-6 * r[:, None], r

    return jax.lax.scan(body, obs_ori, keyseq)


# 5. controller only
traj_xy = jnp.tile(jnp.linspace(0, 50, 13)[:, None], (1, 2))
@jax.jit
def control_only(obs_ori, keyseq):
    def body(c, k):
        def one(oo):
            ctl = get_control(oo[0], oo[1], oo[4],
                              jnp.sqrt(oo[2] ** 2 + oo[3] ** 2),
                              traj_xy, jnp.full((13,), 5.0))
            return ctl.acc + ctl.steering

        r = jax.vmap(one)(c)
        return c + 1e-6 * r[:, None], r

    return jax.lax.scan(body, obs_ori, keyseq)


print(f"backend={jax.default_backend()} B={B} S={S}")
timeit("env physics only", env_only, env0, step_keys)
timeit("frenet projection only", frenet_only, obs_ori0, step_keys)
timeit("lattice only", lattice_only, obs_ori0, step_keys)
timeit("full plan (incl collision)", plan_only, obs_ori0, step_keys)
timeit("controller only", control_only, obs_ori0, step_keys)
