"""Long-read (PacBio-class) end-to-end annealing perf probe.

    python examples/pacbio_run.py [genome_kb] [n_reads] [read_len] [iters]

World: fragmented linear graph + noisy long reads (10% error, both
strands); anneal with the PacBio scorer (anchors + chained guide bands +
banded forward DP).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    genome_kb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    read_len = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    out_dir = sys.argv[5] if len(sys.argv) > 5 else "/tmp/gaml_pb"
    os.makedirs(out_dir, exist_ok=True)

    from gaml_tpu.core import dna
    from gaml_tpu.core.graph import Graph
    from gaml_tpu.optimize.anneal import Optimizer
    from gaml_tpu.optimize.settings import AssemblySettings
    from gaml_tpu.scoring.calculator import ProbCalculator
    from gaml_tpu.scoring.config import SingleReadConfig
    from gaml_tpu.scoring.pacbio import PacbioReadSet

    rng = np.random.default_rng(5)
    genome_len = genome_kb * 1000

    gr = Graph()
    segments = []
    node_order = []
    remaining = genome_len
    while remaining > 0:
        ln = int(rng.integers(2000, 8000)) if len(segments) % 2 == 0 \
            else int(rng.integers(80, 400))
        ln = min(ln, remaining)
        codes = rng.integers(0, 4, ln).astype(np.uint8)
        nid = gr.add_node_pair(codes)
        segments.append(codes)
        node_order.append(nid)
        remaining -= ln
    for a, b in zip(node_order, node_order[1:]):
        gr.add_arc(a, b)
    gr.calc_prob_sums()
    gr.calc_normalize_map()
    genome = np.concatenate(segments)

    def noisy(read, err=0.1):
        out = []
        for c in read:
            u = rng.random()
            if u < err * 0.4:
                out.append(int(rng.integers(0, 4)))
            elif u < err * 0.7:
                out.append(int(c))
                out.append(int(rng.integers(0, 4)))
            elif u < err:
                continue
            else:
                out.append(int(c))
        return np.array(out, dtype=np.uint8)

    fq = f"{out_dir}/pb.fq"
    with open(fq, "w") as f:
        for i in range(n_reads):
            p = int(rng.integers(0, len(genome) - read_len))
            r = noisy(genome[p:p + read_len])
            if rng.random() < 0.5:
                r = dna.revcomp(r)
            s = dna.decode_seq(r)
            f.write(f"@pb{i}\n{s}\n+\n{'I' * len(s)}\n")

    t0 = time.time()
    rs = PacbioReadSet(f"{out_dir}/pbcache", fq, 0.85, 0.05)
    rs.preprocess_reads()
    rs.compute_anchors(gr, persist=False)
    print(f"anchors ({time.time() - t0:.1f}s)", flush=True)

    if os.environ.get("GAML_PB_PREWARM") == "1":
        # compile the (GAML_PB_CHUNK, rmax-class) executable ladder once,
        # off the timed anneal (one-time per process; a co-located
        # deployment amortizes it across runs).  Default: background
        # ladder overlapped with the anneal's native-served early moves;
        # GAML_PB_PREWARM_SYNC=1 blocks as in round 4.
        t0 = time.time()
        if os.environ.get("GAML_PB_PREWARM_SYNC") == "1":
            rs.prewarm_device()
            print(f"prewarm ({time.time() - t0:.1f}s)", flush=True)
        else:
            rs.prewarm_device_async()
            print(f"prewarm dispatched in background "
                  f"({time.time() - t0:.1f}s)", flush=True)

    cfg = SingleReadConfig(penalty_constant=0.0001, step=100)
    pc = ProbCalculator([], [], [(cfg, rs)], gr)
    settings = AssemblySettings(threshold=500, max_iterations=iters, seed=47,
                                output_prefix=f"{out_dir}/out")
    opt = Optimizer(gr, pc, settings, advice_pacbio=[rs],
                    longest_read=read_len, log=lambda *a: None)
    opt.prepare()
    start_paths = [[i] for i in range(0, gr.num_nodes, 2)
                   if gr.node_len(i) > 500]
    print(f"start walks: {len(start_paths)}", flush=True)
    t0 = time.time()
    best = opt.run(start_paths, write_outputs=False)
    dt = time.time() - t0
    print(f"anneal {opt.itnum} iters in {dt:.1f}s "
          f"({opt.itnum / dt:.2f} moves/s)", flush=True)
    print(f"best prob {opt.best_prob:.4f}; walks {len(best)} "
          f"(start {len(start_paths)})", flush=True)
    print("metrics:", opt.metrics.report(), flush=True)
    cells = getattr(rs, "dp_cells", {})
    total = sum(cells.values()) or 1
    onchip = cells.get("pallas", 0) + cells.get("jnp", 0) + \
        cells.get("mesh", 0)
    print(f"forward-DP cells by backend: "
          f"{ {k: int(v) for k, v in cells.items()} } "
          f"(device share {100.0 * onchip / total:.1f}%)", flush=True)

    # assembly-quality vs the truth genome (bounds what any f32
    # device-route accept flip did to the final assembly — the
    # PARITY.md divergence row's enforcement surface)
    from gaml_tpu.core.io import output_paths_to_file

    output_paths_to_file(best, gr, 47, settings.threshold,
                         f"{out_dir}/final")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from asm_quality import assembly_quality

    q = assembly_quality(dna.decode_seq(genome), f"{out_dir}/final.fasta")
    print(f"asm quality vs truth: contigs={q['n_contigs']} "
          f"N50={q['n50']} NG50={q['ng50']} "
          f"kmer_recall={q['kmer_recall']} kmer_junk={q['kmer_junk']}",
          flush=True)


if __name__ == "__main__":
    main()
