"""Dump the TPU-optimized HLO of the whole-graph refresh program and
summarize its copy/sort ops — identifies which arrays the backend
relayouts (the xplane trace shows ~5.5 ms/refresh of 'data formatting'
copies at TG scale but not their operands).

Usage: python tools/dump_refresh_hlo.py [--num-nodes 10834] [--out FILE]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-nodes", type=int, default=10834)
    ap.add_argument("--avg-degree", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from pmgt_tpu.core.config import SamplingConfig
    from pmgt_tpu.data.synthetic import make_synthetic_dataset
    from pmgt_tpu.graph.container import PaddedGraph
    from pmgt_tpu.sampling.pairs import sample_all_contexts

    art = make_synthetic_dataset(
        num_nodes=args.num_nodes, num_users=100, feat_dims=(8, 8),
        interactions_per_user=2, avg_degree=args.avg_degree, seed=0,
    )
    graph = PaddedGraph(*(np.asarray(a) for a in art.graph))
    cfg = SamplingConfig()
    n_total = graph.nbr_ids.shape[0]
    nodes = np.arange(n_total, dtype=np.int32)

    fn = jax.jit(
        lambda g, nd, seed: sample_all_contexts(
            g, jax.random.key(seed), cfg, n_total, all_nodes=nd
        )
    )
    compiled = fn.lower(graph, nodes, np.uint32(7)).compile()
    text = compiled.as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {len(text)} chars to {args.out}")

    # Summarize copies and sorts with operand shapes.
    for line in text.splitlines():
        s = line.strip()
        if re.match(r"%?(copy|sort)[-.\w]* = ", s) or " = sort(" in s:
            print(s[:240])


if __name__ == "__main__":
    main()
