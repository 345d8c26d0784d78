"""Two-parallelism scaling evidence (sandbox substitute for N vs 4N
executors, per BASELINE.md): run bench.py in fresh subprocesses at
local[8] and local[32] on the identical input, report throughput at both
and the scaling efficiency eff = (tp_32 / tp_8) / 4. Writes
BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_convs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_CONVS=str(n_convs),
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    lo, hi = 8, 32
    r_lo = run_at(lo, n_convs)
    r_hi = run_at(hi, n_convs)
    tp_lo, tp_hi = r_lo["value"], r_hi["value"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = f"""# BENCH/BASELINE — scaling evidence ({stamp})

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox protocol (BASELINE.md): identical job at two local
parallelism levels on the same input.

Flagship pipeline: as-of join (tolerance 1h) + lag/lead(1,2,-1) + LOCF +
gap-sessionize + 32-dim Arrow embedding kernel over a distributed-generated
synthetic transcript corpus ({r_lo['n_turns']:,} turns, {n_convs:,}
conversations, hot-key skew), forced through the noop sink.

| parallelism | turns/sec | flagship sec | total bench sec |
|---|---|---|---|
| local[{lo}]  | {tp_lo:,.0f} | {r_lo['queries']['flagship_synth']} | {r_lo['total_sec']} |
| local[{hi}] | {tp_hi:,.0f} | {r_hi['queries']['flagship_synth']} | {r_hi['total_sec']} |

**Scaling efficiency ({lo}->{hi} cores): {eff:.3f}** (target >= 0.8)

Per-query seconds at local[{hi}]:

```json
{json.dumps(r_hi["queries"], indent=2)}
```

Config: shuffle.partitions = max(cores, 8); AQE on (coalesce + skew-join);
Arrow batch 10k; corpus hash-partitioned by conv_id and sorted within
partitions by (ts, turn_idx) before the pipeline (towhee_spark.layout).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"tp_lo": tp_lo, "tp_hi": tp_hi, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
