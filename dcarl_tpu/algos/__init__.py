"""TPU-native RL algorithm family.

The reference vendors a stable-baselines fork (TF1, ~25.9k LoC) whose
algorithms define the capability surface its DCARL agent server runs on
(software/src/tools/DCARL/stable_baselines/: A2C, ACER, ACKTR, PPO1,
PPO2, DDPG, SAC, TD3, TRPO, GAIL, HER, DQN).  Here each algorithm is a
pure-functional JAX learner:
``make_<algo>()`` returns jitted ``init / act / update`` functions over
an explicit train-state pytree, so every learner

* batches over the vectorized on-device envs (no SubprocVecEnv),
* data-parallelizes by construction — pass ``axis_name`` and gradients
  are ``pmean``-reduced over the mesh (the MpiAdam replacement,
  common/mpi_adam.py:8-121),
* checkpoints as a plain pytree (utils/checkpoint.py — the SB
  save/load contract, common/base_class.py).
"""

from dcarl_tpu.algos import common  # noqa: F401
