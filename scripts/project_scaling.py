"""Project multi-chip weak-scaling efficiency from measured parts.

Real multi-chip hardware is not available in this environment (one tunneled
TPU v5 lite chip), so the BASELINE.md target ">= 80% edges/s scaling
efficiency at >= 2 hosts" cannot be measured directly.  This script makes
the projection QUANTITATIVE instead of asserted, from three measured or
public inputs:

1. t_comp: the measured single-chip step time (bench.py steady state);
2. bytes/step: the per-chip wire bytes of the sharded train step, from the
   lowered-HLO ring model (scripts/measure_halo_payload.py) at the real
   mesh width — weak scaling keeps per-chip batch fixed, and the halo
   design makes per-chip collective bytes ~independent of P (fetch
   buffers SHRINK as F/P, the gradient all-reduce is constant);
3. ICI characteristics: TPU v5e public spec, 1600 Gbps (200 GB/s)
   aggregate interchip bandwidth per chip in a 2-D torus; per-collective
   launch/latency overhead swept over 1-5 us.  v5e pods scale to 256
   chips on pure ICI, so ">= 2 hosts" (8+ chips) stays on ICI, not DCN.

Efficiency model (zero compute/comm overlap — pessimistic; XLA overlaps
async collectives in practice):

    eff(P) = t_comp / (t_comp + bytes/BW + n_collectives * t_launch)

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/project_scaling.py [--step_ms 0.65] [--bw_gbs 200]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from measure_halo_payload import (collective_bytes,  # noqa: E402
                                  lower_step, _parse_computations,
                                  _op_callees, COLLECTIVES)


def executed_collective_count(hlo_text: str) -> int:
    """Number of collective ops on the executed path (cheapest cond
    branch), mirroring collective_bytes's branch choice."""
    comps, entry = _parse_computations(hlo_text)

    def is_coll(line):
        m = re.match(r"\S+ = (\(?[^)]*\)?) (\S+?)\(", line)
        if not m:
            return False
        op = m.group(2).split(".")[0]
        return (op[:-6] if op.endswith("-start") else op) in COLLECTIVES

    memo = {}

    def walk(name):
        if name in memo:
            return memo[name]
        memo[name] = 0
        n = 0
        for line in comps.get(name, ()):
            if is_coll(line):
                n += 1
            callees = [c for c in _op_callees(line) if c in comps]
            if not callees:
                continue
            subs = [walk(c) for c in callees]
            if "conditional" in line and subs:
                subs = [min(subs)]
            n += sum(subs)
        memo[name] = n
        return n

    return walk(entry)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step_ms", type=float, default=0.65,
                    help="measured single-chip step time (bench.py)")
    ap.add_argument("--bw_gbs", type=float, default=200.0,
                    help="per-chip aggregate ICI GB/s (v5e public spec)")
    ap.add_argument("--n_nodes", type=int, default=16384)
    ap.add_argument("--batch_per_chip", type=int, default=256)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    batch = args.batch_per_chip * n_dev
    txt = lower_step(args.n_nodes, batch, n_dev, shard_graph=True,
                     halo=True, fetch=True)
    per = collective_bytes(txt, n_dev)
    total_bytes = sum(per.values())
    n_coll = executed_collective_count(txt)

    print(f"mesh width measured: {n_dev} chips, batch/chip "
          f"{args.batch_per_chip}, N={args.n_nodes}")
    print(f"per-chip wire bytes/step: {total_bytes/1e6:.3f} MB "
          f"({', '.join(f'{k}={v/1e6:.2f}MB' for k, v in sorted(per.items()))})")
    print(f"collectives on executed path: {n_coll}")
    print(f"single-chip step time: {args.step_ms} ms (measured, bench.py)")
    print(f"\nweak-scaling efficiency projection (per-chip batch fixed; "
          f"halo design keeps bytes/chip ~constant in P):")
    t_comp = args.step_ms * 1e-3
    for bw in (args.bw_gbs, args.bw_gbs / 2, args.bw_gbs / 8):
        row = []
        for lat_us in (1.0, 3.0, 5.0):
            t_comm = total_bytes / (bw * 1e9) + n_coll * lat_us * 1e-6
            row.append(f"lat={lat_us:.0f}us: {t_comp/(t_comp+t_comm):6.1%}")
        print(f"  BW={bw:5.0f} GB/s   " + "   ".join(row))


if __name__ == "__main__":
    main()
