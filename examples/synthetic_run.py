"""End-to-end synthetic assembly run: generates a genome, a fragmented
Velvet-style graph with branch noise, paired reads, and runs the full
annealing pipeline.  Used as an integration/perf probe:

    python examples/synthetic_run.py [genome_kb] [n_pairs] [iterations]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    genome_kb = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    iterations = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    out_dir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/gaml_synth"
    os.makedirs(out_dir, exist_ok=True)

    from gaml_tpu.core import dna
    from gaml_tpu.core.graph import Graph
    from gaml_tpu.optimize.anneal import Optimizer
    from gaml_tpu.optimize.settings import AssemblySettings
    from gaml_tpu.scoring.calculator import ProbCalculator
    from gaml_tpu.scoring.config import PairedReadConfig
    from gaml_tpu.scoring.readset import ReadSet

    rng = np.random.default_rng(7)
    genome_len = genome_kb * 1000

    # build genome as alternating long/short segments -> linear graph chain
    gr = Graph()
    segments = []
    remaining = genome_len
    node_order = []
    while remaining > 0:
        ln = int(rng.integers(1500, 4000)) if len(segments) % 2 == 0 \
            else int(rng.integers(60, 200))
        ln = min(ln, remaining)
        seg = "".join("ACGT"[i] for i in rng.integers(0, 4, ln))
        nid = gr.add_node_pair(dna.encode_seq(seg))
        segments.append(seg)
        node_order.append(nid)
        remaining -= ln
    for a, b in zip(node_order, node_order[1:]):
        gr.add_arc(a, b)
    # branch noise: spurious short nodes off the chain
    for _ in range(len(node_order) // 3):
        src = node_order[int(rng.integers(0, len(node_order) - 1))]
        seg = "".join("ACGT"[i] for i in rng.integers(0, 4, 80))
        nid = gr.add_node_pair(dna.encode_seq(seg))
        gr.add_arc(src, nid)
    gr.calc_prob_sums()
    gr.calc_normalize_map()
    genome = "".join(segments)

    # paired reads
    L, im, istd = 100, 400, 40
    m1, m2 = [], []
    for _ in range(n_pairs):
        ins = max(2 * L, min(int(rng.normal(im, istd)), len(genome)))
        p = int(rng.integers(0, len(genome) - ins + 1))
        r1 = list(genome[p:p + L])
        r2 = list(dna.revcomp_str(genome[p + ins - L:p + ins]))
        for r in (r1, r2):
            errs = rng.random(L) < 0.005
            for i in np.nonzero(errs)[0]:
                r[i] = "ACGT"[int(rng.integers(0, 4))]
        m1.append("".join(r1))
        m2.append("".join(r2))
    for name, reads in (("m1", m1), ("m2", m2)):
        with open(f"{out_dir}/{name}.fq", "w") as f:
            for i, r in enumerate(reads):
                f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")

    rs1 = ReadSet(f"{out_dir}/rs1", f"{out_dir}/m1.fq", 0.96, 0.01)
    rs2 = ReadSet(f"{out_dir}/rs2", f"{out_dir}/m2.fq", 0.96, 0.01)
    t0 = time.time()
    for rs in (rs1, rs2):
        rs.preprocess_reads()
        rs.prepare_read_index()
    print(f"index build: {time.time() - t0:.1f}s", flush=True)

    cfg = PairedReadConfig(penalty_constant=0.00007, step=im - 50.0,
                           insert_mean=im, insert_std=istd)
    pc = ProbCalculator([], [(cfg, (rs1, rs2))], [], gr)
    settings = AssemblySettings(threshold=500, output_prefix=f"{out_dir}/out",
                                max_iterations=iterations, seed=11)
    opt = Optimizer(gr, pc, settings, longest_read=im,
                    log=lambda *a: None)
    t0 = time.time()
    opt.prepare()
    print(f"reachability: {time.time() - t0:.1f}s "
          f"(nodes={gr.num_nodes})", flush=True)

    start_paths = [[i] for i in range(0, gr.num_nodes, 2)
                   if gr.node_len(i) > 500]
    print(f"start walks: {len(start_paths)}", flush=True)
    t0 = time.time()
    best = opt.run(start_paths, write_outputs=False)
    dt = time.time() - t0
    print(f"anneal {opt.itnum} iters in {dt:.1f}s "
          f"({opt.itnum / dt:.2f} moves/s)", flush=True)
    print(f"best prob {opt.best_prob:.4f}; walks: {len(best)} "
          f"(start {len(start_paths)})", flush=True)
    print("metrics:", opt.metrics.report(), flush=True)
    longest = max(len([e for e in p if e >= 0]) for p in best)
    print(f"longest walk nodes: {longest}", flush=True)


if __name__ == "__main__":
    main()
