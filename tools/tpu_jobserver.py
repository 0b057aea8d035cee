#!/usr/bin/env python
"""Persistent TPU job server: keeps one JAX process (and its warmed d2h
relay channel + compile caches) alive, executing job files dropped into a
spool directory.

On the tunneled TPU backend every fresh process pays a ~7-minute cold
device->host channel open; amortizing it across experiments requires a
single long-lived process.  Protocol: write `<name>.py` into the spool
dir; the server execs it (sharing one module-level namespace with
`jax`, `np`, and a warm channel), captures stdout/stderr + exceptions
into `<name>.out`, then renames the job to `<name>.done`.  Drop a file
named `quit` to stop the server.

Usage: python tools/tpu_jobserver.py /tmp/tpu_jobs
"""
import io
import contextlib
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    spool = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
    os.makedirs(spool, exist_ok=True)
    import numpy as np  # noqa: F401
    import jax
    import jax.numpy as jnp  # noqa: F401
    from guidemaker_tpu.util import warm_d2h_channel
    warm_d2h_channel(wait=True)
    ns = dict(np=np, jax=jax, jnp=jnp, REPO=REPO, time=time)
    with open(os.path.join(spool, "READY"), "w") as fh:
        fh.write(f"{jax.devices()[0].platform}\n")
    print("jobserver ready", flush=True)
    while True:
        jobs = sorted(f for f in os.listdir(spool) if f.endswith(".py"))
        if os.path.exists(os.path.join(spool, "quit")):
            break
        for job in jobs:
            path = os.path.join(spool, job)
            out = io.StringIO()
            t0 = time.time()
            try:
                with open(path) as fh:
                    code = fh.read()
                with contextlib.redirect_stdout(out), \
                        contextlib.redirect_stderr(out):
                    exec(compile(code, job, "exec"), ns)
                status = "ok"
            except Exception:
                out.write(traceback.format_exc())
                status = "error"
            with open(path[:-3] + ".out", "w") as fh:
                fh.write(f"# status={status} wall={time.time()-t0:.2f}s\n")
                fh.write(out.getvalue())
            os.rename(path, path[:-3] + ".done")
        time.sleep(0.5)


if __name__ == "__main__":
    main()
