"""Simulation-2 demo: 20 states x 11 actions with improvement accounting
(reference: Simulation_testing/Simulation_2/test_DCARL.py).

Reproduces the per-state confidence curves sorted by data volume and the
overall-value accumulation; optionally writes the 4x5 subplot grid.

Usage: python examples/run_simulation2.py [--plot]
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

    ds = datasets.load_sim2()
    data = ds.data[: ds.stream_len]
    state_num = ds.action_values.shape[0]
    cap = C.required_capacity(data, state_num, ds.action_num)
    table, out = C.golden_run(data, ds.action_values,
                              action_num=ds.action_num, capacity=cap)

    states = np.asarray(out.state_idx)
    values = np.asarray(out.step_value)
    activation = np.asarray(table.activation_step)
    seen = np.asarray(table.seen)

    print("per-state data volume:", seen.tolist())
    print("activation steps:", activation.tolist())
    print("final overall value:", float(out.overall_value[-1]))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        order = np.argsort(-seen)
        max_len = seen[order[0]]
        for i, sid in enumerate(order):
            if i % 5 == 0:
                plt.figure(i // 5 + 1, figsize=(6, 10))
            plt.subplot(5, 1, i % 5 + 1)
            curve = values[states == sid]
            a = activation[sid]
            if a == -1:
                plt.plot(curve, color="darkgray")
            else:
                plt.plot(curve[:a], color="darkgray")
                plt.plot(range(a, len(curve)), curve[a:], color="black")
            plt.xlim((0, max_len))
        for f in range(1, (state_num + 4) // 5 + 1):
            plt.figure(f)
            plt.savefig(f"simulation2_panel_{f}.png", dpi=150)
        print("wrote simulation2_panel_*.png")


if __name__ == "__main__":
    main()
