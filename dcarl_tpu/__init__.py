"""DCARL-TPU: a TPU-native confidence-aware reinforcement-learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of zhcao92/DCARL
("Continuous Improvement of Self-Driving Cars using Dynamic Confidence-Aware
Reinforcement Learning"): a confidence-aware policy-selection layer between a
trusted rule-based driving policy and learned candidate policies, plus the
full scaffolding around it — a vectorized driving environment, a Frenet-frame
trajectory sampler, controllers, value-learning loops, and a sharded
confidence/value store — all designed for TPU meshes from the start.

Layering (lowest first):
  ops       batched geometry / spline / polynomial / kernel primitives
  core      confidence bounds, confidence tables and stores, RLS selection
  env       vectorized lockstep driving environments (pure JAX physics)
  planning  trajectory lattices, prediction, rule policies, decision layers
  control   longitudinal PID + lateral pure-pursuit controllers
  models    flax Q-networks, replay buffers, DQN learners
  parallel  device meshes, sharded env/store, collective statistics
  data      dataset generation and bundled-dataset loading
  utils     logging, checkpointing, profiling, sanitizers
"""

__version__ = "0.1.0"

from dcarl_tpu import config as config
