"""Stepping-only ceiling of the host farm: Python threads vs native C++.

Round-4 diagnosis (docs/perf_notes_r4.md §2): the Python thread farm's
numpy preprocessing serializes on the GIL — FakeALE steps 7,252/s on one
thread but only ~3,600/s total on two.  This script measures the same
stepping-only ceiling through the native C++ farm (envfarm.cpp), where
preprocessing runs on pthreads with the GIL released.

Run: python scripts/bench_native_step.py
Writes one JSON line per row to stdout (archive into perf notes).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def bench_python_threads(n_threads: int, n_envs: int, secs: float = 3.0):
    """Python FakeALE stepped by a thread pool (the r4 architecture)."""
    import concurrent.futures as fut
    from xingtian_tpu.envs.ale import FakeALE

    envs = [FakeALE(seed=j) for j in range(n_envs)]
    for j, e in enumerate(envs):
        e.reset(j)
    pool = fut.ThreadPoolExecutor(max_workers=n_threads)
    chunk = n_envs // n_threads

    def sweep(lo):
        for e in envs[lo:lo + chunk]:
            e.step(0)
        return chunk

    t0 = time.monotonic()
    steps = 0
    while time.monotonic() - t0 < secs:
        steps += sum(pool.map(sweep, range(0, n_envs, chunk)))
    dt = time.monotonic() - t0
    pool.shutdown()
    return steps / dt


def bench_native(n_threads: int, n_envs: int, secs: float = 3.0):
    from xingtian_tpu.envs.native_farm import NativeVecHostEnv

    env = NativeVecHostEnv("AtariStub", n=n_envs, n_threads=n_threads, seed=0)
    env.reset_batch(0)
    a = np.zeros(n_envs, np.int32)
    env.step_batch(a)
    t0 = time.monotonic()
    steps = 0
    while time.monotonic() - t0 < secs:
        env.step_batch(a)
        steps += n_envs
    dt = time.monotonic() - t0
    env.close()
    return steps / dt


def main():
    n_envs = int(os.environ.get("NENVS", "512"))
    rows = []
    for threads in (1, 2):
        rows.append({"path": "python-threads", "threads": threads,
                     "steps_per_s": round(bench_python_threads(
                         threads, n_envs), 1)})
    for threads in (1, 2):
        rows.append({"path": "native-c++", "threads": threads,
                     "steps_per_s": round(bench_native(threads, n_envs), 1)})
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
