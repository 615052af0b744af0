"""Pin the PALLAS_SPMM_MIN_WORK crossover (round-3 follow-up).

gate_hygiene.py round-3 run: Pallas one-hot wins at every tested point down
to E*N=524288 (both B=8 and B=64), i.e. the 1e6 threshold measured in
round 2 (at B=32, N=128, E=512, E*N=65536) is conservative. This sweeps the
gap at the original calibration batch size to find the real boundary.

Run: python benchmarks/spmm_crossover.py  (real TPU)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from gate_hygiene import spmm_ms  # noqa: E402


def main():
    out = {}
    B, F = 32, 32
    for N, E in [(128, 256), (128, 512), (128, 1024), (128, 2048),
                 (128, 4096), (256, 1024)]:
        ms_x = spmm_ms(B, N, E, F, "xla")
        ms_p = spmm_ms(B, N, E, F, "pallas")
        rec = {"xla_ms": round(ms_x, 4), "pallas_ms": round(ms_p, 4),
               "pallas_wins": ms_p < ms_x, "EN_work": N * E}
        out[f"B{B}_F{F}_N{N}_E{E}"] = rec
        print(json.dumps({f"B{B}_F{F}_N{N}_E{E}": rec}), flush=True)
    wins = [r["EN_work"] for r in out.values() if r["pallas_wins"]]
    losses = [r["EN_work"] for r in out.values() if not r["pallas_wins"]]
    bound = None
    if wins and losses and max(losses) < min(wins):
        import math
        bound = int(math.sqrt(max(losses) * min(wins)))
    print(json.dumps({"backend": jax.default_backend(),
                      "results": out,
                      "crossover_EN": bound,
                      "all_pallas": not losses}), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
