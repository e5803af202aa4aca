"""Synthetic test fixtures: random genomes, toy Velvet graphs, simulated
reads — the test strategy the reference lacks (SURVEY.md section 4)."""
from __future__ import annotations

import numpy as np

from gaml_tpu.core import dna
from gaml_tpu.core.graph import Graph


def random_seq(rng: np.random.Generator, n: int) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def make_linear_graph(rng: np.random.Generator, node_lens):
    """Graph that is a simple chain of nodes n0 -> n2 -> n4 ... with arcs."""
    gr = Graph()
    seqs = []
    for ln in node_lens:
        s = random_seq(rng, ln)
        seqs.append(s)
        gr.add_node_pair(dna.encode_seq(s))
    for i in range(len(node_lens) - 1):
        gr.add_arc(2 * i, 2 * (i + 1))
    gr.calc_prob_sums()
    gr.calc_normalize_map()
    return gr, seqs


def lastgraph_text(node_seqs, arcs):
    """Build a LastGraph file body: node_seqs are forward strings, arcs are
    (src, dst) in signed 1-based Velvet convention."""
    lines = [f"{len(node_seqs)}\t0\t0\t1"]
    for i, s in enumerate(node_seqs):
        lines.append(f"NODE\t{i + 1}")
        lines.append(s)
        lines.append(dna.revcomp_str(s))
    for a, b in arcs:
        lines.append(f"ARC\t{a}\t{b}")
    return "\n".join(lines) + "\n"


def sample_reads(rng: np.random.Generator, genome: str, n: int, read_len: int,
                 err_rate: float = 0.0, with_rc: bool = True):
    """Uniform error-injected reads from a genome string."""
    reads = []
    for _ in range(n):
        pos = int(rng.integers(0, len(genome) - read_len + 1))
        r = list(genome[pos:pos + read_len])
        for i in range(read_len):
            if rng.random() < err_rate:
                r[i] = "ACGT"[int(rng.integers(0, 4))]
        r = "".join(r)
        if with_rc and rng.random() < 0.5:
            r = dna.revcomp_str(r)
        reads.append(r)
    return reads


def write_fastq(path, reads, prefix="r"):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@{prefix}{i}\n{r}\n+\n{'I' * len(r)}\n")
