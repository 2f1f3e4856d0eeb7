"""Vehicle-life working-set run -> WORKINGSET_r05.json.

The reference vehicle's store grows for its whole life while serving
every decision tick (deepq/RLS.py:34-76 reload, :185-215 unbounded
append).  Round 4 measured why that can't live on-device whole (gated
fleet 522k -> 35k env-steps/s from 262k -> 4M device rows); this run
closes the loop the TPU way: a multi-million-row host history served
through an active-region device cache with asynchronous re-centering as
the fleet drifts along its route, at fleet rate, with the exactness of
the cache audited against the full history DURING the run (see
dcarl_tpu/workingset.py for the three-part contract).

  python examples/run_vehicle_life.py            # full TPU scale
  python examples/run_vehicle_life.py --smoke    # CPU-sized
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="CPU-sized run (no artifact)")
    ap.add_argument("--out", default="WORKINGSET_r05.json")
    # 450 route positions x 10k episode records each = 4.5M rows: the
    # same total evidence as 150x30k, at a per-position density that
    # matches a vehicle visiting each intersection ~10k times (serving
    # cost scales with IN-REGION match density, not history size)
    ap.add_argument("--envs", type=int, default=65536)
    ap.add_argument("--chunks", type=int, default=120)
    ap.add_argument("--local-rows", type=int, default=10000)
    ap.add_argument("--offsets", type=int, default=450)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dcarl_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from dcarl_tpu import workingset as WS

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        lk, lv = WS.collect_local_records(48, 400, seed=3)
        rep = WS.run_vehicle_life(
            n_envs=48, chunk_steps=10, n_chunks=36, n_offsets=12,
            cache_capacity=1 << 12, recenter_margin=6.0,
            checkpoints=3, checkpoint_queries=48, use_pallas=False,
            history=(lk, lv))
    else:
        rep = WS.run_vehicle_life(
            n_envs=args.envs,
            chunk_steps=50,
            n_chunks=args.chunks,
            local_rows=args.local_rows,
            n_offsets=args.offsets,
            offset_spacing=8.0,
            cache_capacity=1 << 18,
            region_radius=25.0,
            recenter_margin=10.0,
            drift_per_chunk=2.0,
            checkpoints=3,
            checkpoint_queries=256,
            collect_envs=4096,
            collect_steps=2048,
        )

    print(json.dumps({k: v for k, v in rep.items() if k != "timeline"},
                     indent=2))
    if not args.smoke:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
