"""Build a de-Bruijn-style graph (k=101) directly from a scaffold FASTA
when no Velvet graph is given (reference GetGraphFromAssembly,
graph_from_assembly.cc:131-351).

Pipeline: scaffolds split at N-runs into contigs (IUPAC codes normalized:
R,M->A; Y,S->C; K->G; W->T; anything else dropped), k-mers registered in
rc-paired ids, unbranched interior k-mers collapsed into intervals, the
intervals renumbered into rc-paired graph nodes whose sequences are the
per-k-mer last characters, and scaffold walks emitted with gap entries
-(gap + k - 1).

Faithful quirk: the reference never populates graph *edges* on this path
(big_cons is collected but unused), so reroute moves have nothing to
sample; pass connect=True to also wire edges from the interval adjacency
(an opt-in improvement over the reference).
"""
from __future__ import annotations

from typing import Dict, List, Set, Tuple


from .core import dna
from .core.graph import Graph

K_ASSEMBLY = 101

_NORM = {"A": "A", "C": "C", "G": "G", "T": "T",
         "R": "A", "M": "A", "Y": "C", "S": "C", "K": "G", "W": "T"}


class Scaffold:
    """Reference Scaffold (graph_from_assembly.cc:15-78)."""

    def __init__(self, scf: str):
        self.sc_size = len(scf)
        assert scf[0] not in "Nn"
        self.contigs: List[str] = []
        self.gaps: List[int] = []
        gap_len = 0
        buf: List[str] = []
        for ch in scf:
            if ch in "Nn":
                if gap_len == 0:
                    assert buf
                    self.contigs.append("".join(buf))
                    buf = []
                gap_len += 1
            else:
                if gap_len > 0:
                    assert self.contigs
                    self.gaps.append(gap_len)
                    gap_len = 0
                norm = _NORM.get(ch)
                if norm is not None:
                    buf.append(norm)
        assert buf
        self.contigs.append("".join(buf))
        assert len(self.gaps) + 1 == len(self.contigs)
        self.contig_paths: List[List[int]] = [[] for _ in self.contigs]


class KmerDB:
    """Reference KmerDB (graph_from_assembly.cc:86-129): string k-mer ->
    rc-paired int ids, adjacency with dedup."""

    def __init__(self):
        self.db: Dict[str, int] = {}
        self.coords: Dict[int, Tuple[int, int, int]] = {}
        self.cons: Dict[int, List[int]] = {}
        self.big_cons: Dict[int, List[int]] = {}

    def get(self, x: str, coord=None) -> int:
        if x not in self.db:
            assert coord is not None
            new_id = len(self.db)
            self.db[x] = new_id
            self.coords[new_id] = coord
            self.db[dna.revcomp_str(x)] = new_id + 1
        return self.db[x]

    def add_con_checked(self, frm: int, to: int) -> None:
        lst = self.cons.setdefault(frm, [])
        if to not in lst:
            lst.append(to)

    def add_con(self, frm: int, to: int) -> None:
        self.add_con_checked(frm, to)
        self.add_con_checked(to ^ 1, frm ^ 1)

    def add_big_con(self, frm: int, to: int) -> None:
        self.big_cons.setdefault(frm, []).append(to)


def get_graph_from_assembly(filename: str, gr: Graph,
                            k: int = K_ASSEMBLY,
                            connect: bool = False) -> List[List[int]]:
    """Populate ``gr`` and return the scaffold walks."""
    scfs: List[str] = []
    buf: List[str] = []
    with open(filename) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if buf:
                    scfs.append("".join(buf))
                buf = []
            else:
                buf.append(line)
    if buf:
        scfs.append("".join(buf))

    scaffolds = [Scaffold(s) for s in scfs]
    kmerdb = KmerDB()
    end_markers: Set[int] = set()

    for si, sc in enumerate(scaffolds):
        for ci, c in enumerate(sc.contigs):
            prev = -1
            for i in range(len(c) - k + 1):
                kid = kmerdb.get(c[i:i + k], (si, ci, i))
                if prev != -1:
                    kmerdb.add_con(prev, kid)
                if i == 0 or i + k == len(c):
                    end_markers.add(kid)
                    end_markers.add(kid ^ 1)
                prev = kid

    ignored: Set[int] = set()
    for i in range(len(kmerdb.db)):
        cons_i = kmerdb.cons.get(i, [])
        if len(cons_i) == 1 and i not in end_markers:
            nxt = cons_i[0]
            if nxt == (i ^ 1):
                continue
            if len(kmerdb.cons.get(nxt ^ 1, [])) == 1 and nxt not in end_markers:
                ignored.add(nxt)

    intervals: Dict[int, List[int]] = {}

    def scan(c: str, record_path: List[int] = None):
        cur: List[int] = []
        for i in range(len(c) - k + 1):
            kid = kmerdb.get(c[i:i + k])
            if kid in ignored:
                if cur:
                    cur.append(kid)
            else:
                if cur:
                    if cur[0] not in intervals or len(cur) > len(intervals[cur[0]]):
                        intervals[cur[0]] = list(cur)
                    kmerdb.add_big_con(cur[0], kid)
                    if record_path is not None:
                        record_path.append(cur[0])
                cur = [kid]
        if cur:
            if cur[0] not in intervals or len(cur) > len(intervals[cur[0]]):
                intervals[cur[0]] = list(cur)

    for sc in scaffolds:
        for ci, c in enumerate(sc.contigs):
            scan(c, sc.contig_paths[ci])
            scan(dna.revcomp_str(c))

    # interval invariants (graph_from_assembly.cc:281-287)
    for first, inter in intervals.items():
        inv = [(x ^ 1) for x in reversed(inter)]
        assert inv[0] in intervals
        assert intervals[inv[0]] == inv

    renumber: Dict[int, int] = {}
    for first, inter in intervals.items():
        if inter[0] not in renumber:
            assert (inter[-1] ^ 1) not in renumber
            assert inter[0] != (inter[-1] ^ 1)
            new_id = len(renumber)
            renumber[inter[0]] = new_id
            renumber[inter[-1] ^ 1] = new_id + 1

    n_nodes = len(renumber)
    gr.seqs = [None] * n_nodes
    gr.next = [[] for _ in range(n_nodes)]
    gr.next_prob = [[] for _ in range(n_nodes)]
    gr.next_sum = [0.0] * n_nodes
    assert n_nodes == len(intervals)
    for first, inter in intervals.items():
        chars = []
        for x in inter:
            if x % 2 == 0:
                si, ci, pos = kmerdb.coords[x]
                chars.append(scaffolds[si].contigs[ci][pos + k - 1])
            else:
                si, ci, pos = kmerdb.coords[x ^ 1]
                base = scaffolds[si].contigs[ci][pos]
                chars.append({"A": "T", "C": "G", "G": "C", "T": "A"}.get(base, base))
        assert gr.seqs[renumber[inter[0]]] is None
        gr.seqs[renumber[inter[0]]] = dna.encode_seq("".join(chars))

    if connect:
        for frm, tos in kmerdb.big_cons.items():
            for to in set(tos):
                if frm in renumber and to in renumber:
                    a, b = renumber[frm], renumber[to]
                    if not gr.has_next(a, b):
                        gr.add_arc(a, b)

    gr.calc_prob_sums()
    gr.calc_normalize_map()

    paths: List[List[int]] = []
    for sc in scaffolds:
        path: List[int] = []
        for i, _c in enumerate(sc.contigs):
            for kid in sc.contig_paths[i]:
                assert kid in renumber
                path.append(renumber[kid])
            if i + 1 < len(sc.contigs):
                path.append(-(sc.gaps[i] + k - 1))
        paths.append(path)
    return paths
