"""Host memory-bandwidth ceiling probe (context for BASELINE.md scaling).

N worker processes each stream-copy a 512 MB float64 numpy array back and
forth; reports AGGREGATE GB/s at N = 1, 2, 4, 8. On a single-socket host
all cores share the DRAM controllers, so if aggregate bandwidth barely
grows with N, any bandwidth-bound job (e.g. the grid-cluster build: hash
exchange + linear numpy passes + checkpoint write) is capped at that ratio
regardless of engine quality — whereas N->4N real executors multiply
memory controllers with machines. Run several times and keep the max per N
(this microVM's quiet windows are intermittent).
"""
import multiprocessing as mp
import time

import numpy as np


def _worker(q):
    a = np.empty(64_000_000, np.float64)  # 512 MB
    a[:] = 1.0
    b = np.empty_like(a)
    t0 = time.time()
    reps = 6
    for _ in range(reps):
        np.copyto(b, a)
        np.copyto(a, b)
    dt = time.time() - t0
    q.put(reps * 2 * a.nbytes * 2 / dt)  # rd+wr per copyto, 2 copytos/rep


def main() -> None:
    for n in (1, 2, 4, 8):
        q = mp.Queue()
        ps = [mp.Process(target=_worker, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        agg = sum(q.get() for _ in range(n)) / 1e9
        print(f"N={n}: aggregate {agg:.1f} GB/s")


if __name__ == "__main__":
    main()
