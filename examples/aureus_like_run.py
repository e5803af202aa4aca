"""Reference-scale end-to-end run, shaped like the reference example config
(S. aureus GAGE: ~2.8 Mb genome, a frag paired library + a long-insert
advice library, annealing from fragmented walks).

    python examples/aureus_like_run.py [genome_mb] [frag_pairs] [adv_pairs] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.8
    n_frag = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    n_adv = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 300
    out_dir = sys.argv[5] if len(sys.argv) > 5 else "/tmp/gaml_aureus"
    os.makedirs(out_dir, exist_ok=True)

    from gaml_tpu.core import dna
    from gaml_tpu.core.graph import Graph
    from gaml_tpu.optimize.anneal import Optimizer
    from gaml_tpu.optimize.settings import AssemblySettings
    from gaml_tpu.scoring.calculator import ProbCalculator
    from gaml_tpu.scoring.config import PairedReadConfig
    from gaml_tpu.scoring.readset import ReadSet

    rng = np.random.default_rng(13)
    genome_len = int(genome_mb * 1_000_000)

    t0 = time.time()
    gr = Graph()
    segments = []
    node_order = []
    remaining = genome_len
    while remaining > 0:
        ln = int(rng.integers(1200, 6000)) if len(segments) % 2 == 0 \
            else int(rng.integers(60, 300))
        ln = min(ln, remaining)
        codes = rng.integers(0, 4, ln).astype(np.uint8)
        nid = gr.add_node_pair(codes)
        segments.append(codes)
        node_order.append(nid)
        remaining -= ln
    for a, b in zip(node_order, node_order[1:]):
        gr.add_arc(a, b)
    for _ in range(len(node_order) // 4):
        src = node_order[int(rng.integers(0, len(node_order) - 1))]
        nid = gr.add_node_pair(rng.integers(0, 4, 90).astype(np.uint8))
        gr.add_arc(src, nid)
    gr.calc_prob_sums()
    gr.calc_normalize_map()
    genome = np.concatenate(segments)
    print(f"graph: {gr.num_nodes} nodes, genome {len(genome)} bp "
          f"({time.time() - t0:.0f}s)", flush=True)

    def make_pairs_fast(n, L, im, istd, err=0.005):
        ins = np.clip(rng.normal(im, istd, n).astype(int), 2 * L,
                      len(genome) - 1)
        p = rng.integers(0, len(genome) - ins)
        m1 = np.stack([genome[pp:pp + L] for pp in p])
        m2 = np.stack([dna.revcomp(genome[pp + ii - L:pp + ii])
                       for pp, ii in zip(p, ins)])
        for m in (m1, m2):
            errs = rng.random(m.shape) < err
            m[errs] = (m[errs] + rng.integers(1, 4, int(errs.sum()))) % 4
        return m1, m2

    def write_fq(path, mat, prefix):
        qual = "I" * mat.shape[1]
        with open(path, "w") as f:
            for i in range(mat.shape[0]):
                f.write(f"@{prefix}{i}\n{dna.decode_seq(mat[i])}\n+\n{qual}\n")

    t0 = time.time()
    L = 100
    f1, f2 = make_pairs_fast(n_frag, L, 180, 20)
    a1, a2 = make_pairs_fast(n_adv, L, 3700, 350)
    for name, mat in (("f1", f1), ("f2", f2), ("a1", a1), ("a2", a2)):
        write_fq(f"{out_dir}/{name}.fq", mat, name)
    print(f"reads written ({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    sets = {}
    for name in ("f1", "f2", "a1", "a2"):
        rs = ReadSet(f"{out_dir}/rs_{name}", f"{out_dir}/{name}.fq", 0.96, 0.01,
                     backend=os.environ.get("GAML_BACKEND", "bfs"))
        rs.preprocess_reads()
        rs.prepare_read_index()
        sets[name] = rs
    print(f"index build ({time.time() - t0:.0f}s)", flush=True)

    frag_cfg = PairedReadConfig(penalty_constant=0.00007, step=180 - 30,
                                insert_mean=180, insert_std=20)
    adv_cfg = PairedReadConfig(penalty_constant=0.00013, step=3700 - 3000,
                               insert_mean=3700, insert_std=350, advice=True)
    pc = ProbCalculator([], [(frag_cfg, (sets["f1"], sets["f2"])),
                             (adv_cfg, (sets["a1"], sets["a2"]))], [], gr)
    settings = AssemblySettings(threshold=500, max_iterations=iters, seed=47,
                                output_prefix=f"{out_dir}/out")
    opt = Optimizer(gr, pc, settings,
                    advice_paired=[(sets["a1"], sets["a2"])],
                    longest_read=3700, log=lambda *a: None)
    t0 = time.time()
    opt.prepare()
    print(f"reachability ({time.time() - t0:.0f}s)", flush=True)

    start_paths = [[i] for i in range(0, gr.num_nodes, 2)
                   if gr.node_len(i) > 500]
    print(f"start walks: {len(start_paths)}", flush=True)
    t0 = time.time()
    best = opt.run(start_paths, write_outputs=False)
    dt = time.time() - t0
    print(f"anneal {opt.itnum} iters in {dt:.0f}s "
          f"({opt.itnum / dt:.2f} moves/s)", flush=True)
    print(f"best prob {opt.best_prob:.4f}; walks {len(best)} "
          f"(start {len(start_paths)})", flush=True)
    print("metrics:", opt.metrics.report(), flush=True)


if __name__ == "__main__":
    main()
