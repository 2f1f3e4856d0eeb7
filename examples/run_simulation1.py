"""Simulation-1 demo: confidence-value estimation on the bundled CARLA
stream (reference: Simulation_testing/Simulation_1/test_DCARL.py).

Streams 20k {state, action, value} tuples through the scan-based
confidence table (1 state x 30 actions), prints the activation step, and
optionally plots the confidence-value curve.

Usage: python examples/run_simulation1.py [--plot]
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np

from dcarl_tpu.core import confidence as C
from dcarl_tpu.data import datasets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # float64 golden path
    jax.config.update("jax_enable_x64", True)

    ds = datasets.load_sim1()
    data = ds.data[: ds.stream_len]
    cap = C.required_capacity(data, ds.action_values.shape[0], ds.action_num)
    table, out = C.golden_run(data, ds.action_values,
                              action_num=ds.action_num, capacity=cap)
    step_values = np.asarray(out.step_value)
    for k in range(2000, ds.stream_len + 1, 2000):
        print(k, int(out.tsrl_action[k - 1]), step_values[k - 1],
              float(out.true_value[k - 1]))
    print("activation step:", int(table.activation_step[0]))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.plot(step_values, color="black")
        plt.xlim((0, ds.stream_len))
        plt.savefig("simulation1_confidence_curve.png", dpi=150)
        print("wrote simulation1_confidence_curve.png")


if __name__ == "__main__":
    main()
