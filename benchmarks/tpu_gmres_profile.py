"""Device-trace profile of the bf16-panel GMRES iteration at 216^3 — where
do the 1546 us/iter go?  (true-bf16-byte model: ~900 us.)

Captures a jax.profiler trace of a 40-iteration windowed run and prints
the per-op device-time breakdown parsed from the trace protos.

Run: nohup python benchmarks/tpu_gmres_profile.py > /tmp/gprof.txt 2>&1 &
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOGDIR = "/tmp/gmres_trace"


def main():
    import jax
    import jax.numpy as jnp

    import iterativesolvers_tpu as its
    from iterativesolvers_tpu.utils.profiling import trace

    assert jax.default_backend() == "tpu", jax.devices()
    print("devices:", jax.devices(), flush=True)

    side = 216
    St = its.laplacian(side, 3, dtype=np.float32)
    n = St.n
    b = jnp.ones((n,), jnp.float32)

    def solve(mi, bb):
        return its.gmres(St, bb, restart=20, reltol=0.0, abstol=1e-30,
                         maxiter=mi, panel_dtype=jnp.bfloat16,
                         ir_stall_exit=False)

    x = solve(40, b)            # compile
    float(jnp.sum(x))
    with trace(LOGDIR):
        x = solve(40, b + jnp.float32(1e-5))
        float(jnp.sum(x))
    print("trace captured", flush=True)

    # parse the trace: xplane pb holds per-op durations
    files = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", files, flush=True)
    try:
        from tensorflow.python.profiler import profiler_client  # noqa
    except Exception:
        pass
    # lightweight: use the trace-events json if present
    tj = glob.glob(os.path.join(LOGDIR, "**", "*.trace.json.gz"),
                   recursive=True)
    print("trace.json files:", tj, flush=True)
    for f in tj:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        evs = [e for e in data.get("traceEvents", [])
               if e.get("ph") == "X" and "dur" in e]
        # device lanes only (pid names containing 'TPU')
        names = {}
        pids = {p.get("pid"): p.get("args", {}).get("name", "")
                for p in data.get("traceEvents", [])
                if p.get("ph") == "M" and p.get("name") == "process_name"}
        for e in evs:
            pname = pids.get(e.get("pid"), "")
            if "TPU" not in str(pname) and "/device" not in str(pname):
                continue
            key = e["name"].split(".")[0][:60]
            names[key] = names.get(key, 0.0) + e["dur"]
        tot = sum(names.values())
        print(json.dumps({"file": os.path.basename(f),
                          "total_us": round(tot, 1)}), flush=True)
        for k, v in sorted(names.items(), key=lambda kv: -kv[1])[:20]:
            print(f"  {v/40:10.1f} us/iter  {100*v/max(tot,1e-9):5.1f}%  {k}",
                  flush=True)


if __name__ == "__main__":
    main()
