"""Probe: does heap churn degrade MAP_POPULATE / first-touch speed?

Simulates the bench process's memory lifecycle (GB-scale allocate/free
churn with mixed sizes), then times alloc_array and np.zeros+touch,
fresh vs churned.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from chalametpir_tpu.native import engine as native_eng


def time_alloc(nbytes):
    t0 = time.perf_counter()
    a = native_eng.alloc_array((nbytes,), np.uint8)
    t_alloc = time.perf_counter() - t0
    t0 = time.perf_counter()
    a[::4096] = 1  # touch (already populated; should be pure write)
    t_touch = time.perf_counter() - t0
    del a
    return t_alloc, t_touch


def time_zeros_touch(nbytes):
    t0 = time.perf_counter()
    a = np.zeros(nbytes, np.uint8)
    t_alloc = time.perf_counter() - t0
    t0 = time.perf_counter()
    a[::4096] = 1  # first-touch faults every page
    t_touch = time.perf_counter() - t0
    del a
    return t_alloc, t_touch


def churn(gb=8, rounds=40):
    rng = np.random.default_rng(0)
    keep = []
    for i in range(rounds):
        sz = int(rng.integers(1 << 20, 256 << 20))
        keep.append(np.empty(sz, np.uint8))
        keep[-1][::4096] = 1
        if len(keep) > 12:
            del keep[rng.integers(0, len(keep))]
    return keep  # hold some memory so the heap stays fragmented


N = 2 << 30  # 2 GB

print("fresh:  alloc_array %.2fs touch %.2fs" % time_alloc(N), flush=True)
print("fresh:  zeros       %.2fs touch %.2fs" % time_zeros_touch(N), flush=True)
held = churn()
print(f"churned ({sum(a.nbytes for a in held)>>30} GB held)", flush=True)
print("churn:  alloc_array %.2fs touch %.2fs" % time_alloc(N), flush=True)
print("churn:  zeros       %.2fs touch %.2fs" % time_zeros_touch(N), flush=True)
