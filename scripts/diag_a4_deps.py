"""Diagnose the arity-4 streaming-setup regression (VERDICT r4 weak #1).

Computes, for a real filter at a given size/arity, the *inherent*
work-before-chunk-k curve of the chunk-priority topological order:
entry i's `earliest` chunk is the first chunk whose completion requires
executing i (transitively). cum_work[k] = #entries with earliest <= k is
a lower bound on the steps any chunk-ordered schedule must run before
chunk k can be packed/uploaded — if cum_work[0] ~= n at arity 4, the
regression is the dependency structure itself, not the DFS.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from chalametpir_tpu.core.filter import construct_filter, hash_batch, filter_geometry
from chalametpir_tpu.models.server import _ctr_chunk_cols


def analyze(log_n: int, arity: int, chunk_rows: int | None = None):
    n = 1 << log_n
    rng = np.random.default_rng(0xA4D1A6)
    # digests don't need to be real key hashes for structure analysis
    digests = rng.integers(0, 1 << 64, size=(n, 4), dtype=np.uint64)
    t0 = time.perf_counter()
    filt, reverse_order, reverse_h, key_index = construct_filter(
        digests, arity, 10, 100, rng
    )
    t_filter = time.perf_counter() - t0
    num_fp = filt.num_fingerprints
    if chunk_rows is None:
        chunk_rows = _ctr_chunk_cols(num_fp, 2048)
    n_chunks = -(-num_fp // chunk_rows)

    hrows = np.stack(
        hash_batch(arity, reverse_order, filt.segment_length, filt.segment_count_length)
    ).astype(np.int64)  # (arity, n)
    dstrow = hrows[reverse_h.astype(np.int64), np.arange(n)]
    writer = np.full(num_fp, -1, dtype=np.int64)
    writer[dstrow] = np.arange(n)
    dest_chunk = (dstrow // chunk_rows).astype(np.int64)

    # deps of entry i = writers (if any) of the rows it reads; those
    # writers all have index > i (write-before-read in reverse order)
    earliest = dest_chunk.copy()
    t0 = time.perf_counter()
    rh = reverse_h.astype(np.int64)
    # vectorize the relax loop per "wave": earliest[w] = min over readers.
    # readers of w are j < w, so a single ascending pass is exact; do it
    # in Python but only over entries with deps.
    dep_lists = []
    for pos in range(arity):
        mask = rh != pos
        readers = np.flatnonzero(mask)
        ws = writer[hrows[pos, readers]]
        ok = ws >= 0
        dep_lists.append((readers[ok], ws[ok]))
    readers_all = np.concatenate([r for r, _ in dep_lists])
    writers_all = np.concatenate([w for _, w in dep_lists])
    order = np.argsort(readers_all, kind="stable")
    readers_all, writers_all = readers_all[order], writers_all[order]
    t_prep = time.perf_counter() - t0

    t0 = time.perf_counter()
    # ascending pass: when reader j is processed, earliest[j] is final
    ea = earliest
    for j, w in zip(readers_all.tolist(), writers_all.tolist()):
        e = ea[j]
        if e < ea[w]:
            ea[w] = e
    t_pass = time.perf_counter() - t0

    cum = np.cumsum(np.bincount(ea, minlength=n_chunks))
    # dependency depth stats: longest chain (levels)
    print(
        f"2^{log_n} a{arity}: n={n} num_fp={num_fp} chunks={n_chunks} "
        f"chunk_rows={chunk_rows} (filter {t_filter:.1f}s, prep {t_prep:.1f}s, "
        f"pass {t_pass:.1f}s)"
    )
    frac = cum / n
    show = [0, 1, 2, n_chunks // 2, n_chunks - 2, n_chunks - 1]
    show = sorted(set(max(0, min(n_chunks - 1, s)) for s in show))
    print("  cum work fraction by chunk:",
          ", ".join(f"k={k}:{frac[k]:.3f}" for k in show))
    return frac


if __name__ == "__main__":
    for log_n in (16, 18):
        for arity in (3, 4):
            analyze(log_n, arity)
