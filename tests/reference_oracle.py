"""Pure-numpy oracle of the reference demo semantics, used to validate
the scan-based JAX implementation.  Written from the behavioral spec in
SURVEY.md §3.1 (bucket lists, per-step np.mean/np.std recomputation,
first-max argmax) — intentionally the *naive* formulation so the
TPU-native implementation is checked against independent code.
"""

import math

import numpy as np


def oracle_run(data, true_action_values, action_num, n_thres=10, rule_act=0,
               alpha=0.05, scale=150.0):
    state_num = true_action_values.shape[0]
    buckets = [[[] for _ in range(action_num)] for _ in range(state_num)]
    tsrl = [[-50.0] * action_num for _ in range(state_num)]
    for s in range(state_num):
        tsrl[s][rule_act] = 100.0
    seen = [0] * state_num
    activation_step = [-1] * state_num
    activation_value = [-1.0] * state_num

    step_values, step_actions, step_states, overall = [], [], [], []
    log_term = math.log(1.0 / alpha)

    for row in data:
        idx, act, value = int(row[0]), int(row[2]), float(row[3])
        buckets[idx][act].append(value)
        seen[idx] += 1
        b = np.array(buckets[idx][act])
        n = len(b)
        if n > n_thres:
            margin = scale * math.sqrt(log_term / 2 / n)
            if act == rule_act:
                tsrl[idx][act] = min(100.0, np.mean(b) + margin)
            else:
                lb = np.mean(b) - margin
                dsum, sigma = np.sum(b), np.std(b)
                ci = (dsum / n / (n + 1) - 4 * sigma / (n + 1) + dsum / (n + 1)
                      - scale * math.sqrt(log_term / 2 / (n + 1)))
                tsrl[idx][act] = min(lb, ci)

        row_vals = np.array(tsrl[idx])
        step_values.append(row_vals.max())
        a = int(np.argmax(row_vals))
        step_actions.append(a)
        step_states.append(idx)
        if activation_step[idx] == -1 and a != rule_act:
            activation_step[idx] = seen[idx]

        ov = 0.0
        for s in range(state_num):
            if activation_step[s] != -1:
                ov += max(tsrl[s]) - activation_value[s] * 0.9
        overall.append(ov)

    return {
        "step_values": np.array(step_values),
        "step_actions": np.array(step_actions),
        "step_states": np.array(step_states),
        "activation_step": np.array(activation_step),
        "overall": np.array(overall),
        "tsrl": np.array(tsrl),
    }
