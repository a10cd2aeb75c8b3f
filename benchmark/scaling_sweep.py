"""Record a mesh scaling-efficiency artifact (benchmark/results_scaling.jsonl).

VERDICT r3 item 10: run the weak-scaling harness every round so the
BASELINE.md ≥70%-efficiency north star has a tracked trend line even
before multi-chip hardware exists.

Default mode is the 8-device VIRTUAL CPU mesh (compile + execution
validation; virtual timings do not measure ICI and the rows are labeled
``backend: cpu``). With --tpu it runs whatever `jax.devices()` exposes
(single chip today → a 1-device row that still tracks per-chip rate).
"""
import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--tpu", action="store_true")
ap.add_argument("--per-device-batch", type=int, default=64)
ap.add_argument("--out", default=os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results_scaling.jsonl"))
args = ap.parse_args()

if not args.tpu:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8")

import jax

if not args.tpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/trajopt_tpu_jax_cache")

import jax.numpy as jnp

import trajopt_tpu as tt
from trajopt_tpu.parallel.scaling import scaling_sweep
from trajopt_tpu.problems import zoo as probs


def main():
    dtype = jnp.float32
    prob = probs.parallel_park(dtype=dtype)
    opts = tt.ALOptions(iterations=20,
                        opts_uncon=tt.iLQROptions(iterations=25))
    rows = scaling_sweep(prob, opts,
                         per_device_batch=args.per_device_batch,
                         x0_sigma=0.02, measure_collectives=True)
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds")
    with open(args.out, "a") as f:
        for r in rows:
            r["problem"] = "parallel_park"
            r["utc"] = stamp
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
