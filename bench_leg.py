#!/usr/bin/env python
"""One scaling-bench leg, run as its own OS process so the parent can pin
it to an exact cpuset (``taskset -c 0-(N-1)``).

Why a subprocess: a local[N] session inside an unpinned 32-CPU process
still spends JVM shuffle/GC/IPC threads and Python Arrow workers on the
31 idle cores — the small leg gets disproportionate "free help", which
inflates its throughput and fabricates sub-linear N→4N efficiency. A
pinned process tree (JVM + python workers inherit the affinity mask) is
the honest sandbox proxy for an N-core cluster allocation, where every
helper thread competes for the same N cores.

Prints one line: ``LEGJSON:{...}`` (encode leg) or the hashes/sec float
(cpu-control leg).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (module-level code is env/constants only)


def main() -> None:
    mode = sys.argv[1]
    cores = int(sys.argv[2])
    if mode == "cpu":
        print("LEGJSON:" + json.dumps({"hashes_per_s": bench.cpu_control_leg(cores)}))
        return
    path = sys.argv[3]
    rows = int(sys.argv[4])
    outer_level = None if sys.argv[5] == "none" else int(sys.argv[5])
    nparts = None if sys.argv[6] == "none" else int(sys.argv[6])
    s = bench.session(cores)
    s.sparkContext.setLogLevel("ERROR")
    run = bench.encode_run(
        s, path, f"scale{cores}", rows=rows, outer_level=outer_level, nparts=nparts
    )
    s.stop()
    print("LEGJSON:" + json.dumps(run))


if __name__ == "__main__":
    main()
