"""Machine-ceiling control for the N->4N scaling criterion (BASELINE.md).

A pure-ALU busy loop (no memory traffic, no Spark) measures what THIS
box can deliver from 8 -> 32 processes; the engine's scaling efficiency
is judged against that ceiling, re-evidenced every round.
Prints one JSON line.
"""
import json
import multiprocessing as mp
import time


def burn(n):
    x = 1.0
    for _ in range(n):
        x = x * 1.0000001 + 1e-9
    return x


def run(nproc, n=20_000_000, total_tasks=128):
    # fixed TOTAL work regardless of nproc — we measure wall-clock vs
    # parallelism, not weak scaling
    with mp.Pool(nproc) as p:
        t0 = time.time()
        p.map(burn, [n] * total_tasks)
        return time.time() - t0


if __name__ == "__main__":
    w8 = min(run(8), run(8))
    w32 = min(run(32), run(32))
    print(json.dumps({
        "alu_8_sec": round(w8, 2), "alu_32_sec": round(w32, 2),
        "alu_efficiency_8_to_32": round((w8 / w32) / 4.0, 3),
    }))
