"""Adversarial connected-components probe (round-9 verdict #5).

The round-9 CC measurement (1M-doc MinHash pair set: 98k clusters,
2 rounds) contained only 2-node components, so pointer doubling was
never exercised at scale. This probe plants the shapes that break
plain min-label propagation inside a corpus-scale edge set:

- BACKGROUND: ``--pairs`` disjoint 2-node components (the measured
  real dedup shape — 500k pairs = 1M nodes by default);
- CHAIN: one path component of ``--chain``+1 nodes (diameter =
  --chain). Plain propagation needs a round PER HOP; doubling must
  finish in <= log2(diameter) + 2 rounds;
- GIANT: one component of ``--giant`` spokes on a single hub PLUS a
  ``--tail``-hop chain hanging off one spoke — mass (a 100k-member
  cluster) and depth in the same component, the worst case for both
  the per-round groupBy (one hot key) and the convergence bound.

Node id spaces are disjoint; ids are shuffled onto distinct ranges so
the min label is NOT the structural root (the hub is given the LARGEST
id in its component — min-label must flow inward from a leaf).

Asserts, then prints one JSON line:
  1. rounds <= log2(max component diameter) + 2;
  2. the giant component resolves to ONE label over all its members;
  3. the chain resolves to one label;
  4. per-round wall stays bounded (last round <= 3x first round —
     each round shuffles O(|E| + |V|) rows regardless of progress).

Usage: python tools/cc_adversarial_probe.py [--pairs 500000]
         [--chain 4096] [--giant 100000] [--tail 1024]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.session import get_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=500_000)
    ap.add_argument("--chain", type=int, default=4096)
    ap.add_argument("--giant", type=int, default=100_000)
    ap.add_argument("--tail", type=int, default=1024)
    args = ap.parse_args()

    spark = get_session("cc-adversarial-probe")
    from cloudvectordb_spark.operators.dedup import connected_components

    # background 2-node components on ids [0, 2*pairs)
    bg = spark.range(args.pairs).select(
        (F.col("id") * 2).alias("src"), (F.col("id") * 2 + 1).alias("dst")
    )
    # chain on ids [C, C + chain]: src=i, dst=i+1
    c0 = 2 * args.pairs + 1_000_000
    chain = spark.range(args.chain).select(
        (F.col("id") + c0).alias("src"), (F.col("id") + c0 + 1).alias("dst")
    )
    # giant: hub gets the LARGEST id of its component so the min label
    # (the first spoke) must propagate through the hub, not from it
    g0 = c0 + 10_000_000
    hub = g0 + args.giant + args.tail + 1
    spokes = spark.range(args.giant).select(
        (F.col("id") + g0).alias("src"), F.lit(hub).alias("dst")
    )
    t0_id = g0 + args.giant
    tail = spark.range(args.tail).select(
        (F.col("id") + t0_id).alias("src"), (F.col("id") + t0_id + 1).alias("dst")
    )
    # hang the tail off the LAST spoke so mass and depth share one
    # component (a lone chain would be just another chain)
    graft = spark.range(1).select(
        F.lit(g0 + args.giant - 1).alias("src"), F.lit(t0_id).alias("dst")
    )
    edges = (
        bg.unionByName(chain)
        .unionByName(spokes)
        .unionByName(tail)
        .unionByName(graft)
    )

    # component diameters: chain = args.chain hops; giant = deepest tail
    # node -> grafted spoke -> hub -> farthest other spoke
    diameter = max(args.chain, args.tail + 3, 1)
    bound = int(math.log2(diameter)) + 2

    stats: dict = {}
    t0 = time.perf_counter()
    # force the DISTRIBUTED propagation path: this probe exists to bound
    # the shuffle-round count, which the driver fast path never runs
    labels = connected_components(
        edges, stats=stats, driver_threshold=0
    ).persist()
    n_nodes = labels.count()
    wall = time.perf_counter() - t0

    giant_labels = (
        labels.filter(F.col("node") >= g0)
        .select("component")
        .distinct()
        .collect()
    )
    chain_labels = (
        labels.filter((F.col("node") >= c0) & (F.col("node") < g0))
        .select("component")
        .distinct()
        .collect()
    )
    n_components = labels.select("component").distinct().count()

    assert stats["rounds"] <= bound, (
        f"rounds {stats['rounds']} > log2({diameter})+2 = {bound}"
    )
    assert len(giant_labels) == 1 and giant_labels[0].component == g0
    assert len(chain_labels) == 1 and chain_labels[0].component == c0
    rs = stats["round_secs"]
    assert rs[-1] <= 3 * rs[0] + 1.0, f"per-round wall grew: {rs}"

    print(
        json.dumps(
            {
                "metric": "cc_adversarial",
                "nodes": n_nodes,
                "edges": edges.count(),
                "components": n_components,
                "planted_diameter": diameter,
                "rounds": stats["rounds"],
                "round_bound": bound,
                "round_secs": rs,
                "giant_members": args.giant + args.tail + 2,  # spokes+tail+hub+tail-end
                "wall_sec": round(wall, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
