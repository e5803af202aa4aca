"""Assembly-quality metrics against a known truth genome (no external
aligners): contig N50/NG50 plus canonical k-mer recall / junk fraction —
the Merqury-style completeness/correctness pair.  Because contigs are
spelled from graph nodes, junction mistakes mint k-mers absent from the
truth ("junk"), and missing genome segments drop recall; together with
N50 these capture the BASELINE.md "final contigs equivalent to reference
output" comparison without shelling out to MUMmer (the reference's own
quality check, gaml.cc:568-578, which this repo replaces by design).

K = 31 so a canonical k-mer packs into a uint64.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

K = 31
_CODE = np.full(256, 255, dtype=np.uint8)
for i, c in enumerate("ACGT"):
    _CODE[ord(c)] = i
    _CODE[ord(c.lower())] = i


def parse_fasta(path: str) -> List[str]:
    seqs: List[str] = []
    cur: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line)
    if cur:
        seqs.append("".join(cur))
    return seqs


def _kmers_codes(codes: np.ndarray) -> np.ndarray:
    """Canonical K-mers (uint64) of a code array; windows containing
    non-ACGT (code 255) are dropped."""
    n = len(codes) - K + 1
    if n <= 0:
        return np.zeros(0, np.uint64)
    c = codes.astype(np.uint64)
    fwd = np.zeros(n, np.uint64)
    rev = np.zeros(n, np.uint64)
    bad = np.zeros(n, bool)
    for j in range(K):
        w = c[j:j + n]
        fwd = (fwd << np.uint64(2)) | (w & np.uint64(3))
        # reverse complement read right-to-left: base at offset K-1-j
        wr = c[K - 1 - j:K - 1 - j + n]
        rev = (rev << np.uint64(2)) | ((wr ^ np.uint64(3)) & np.uint64(3))
        bad |= codes[j:j + n] == 255
    can = np.minimum(fwd, rev)
    return can[~bad]


def kmer_set(seqs: List[str]) -> np.ndarray:
    parts = []
    for s in seqs:
        codes = _CODE[np.frombuffer(s.encode(), dtype=np.uint8)]
        parts.append(_kmers_codes(codes))
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(parts))


def nx0(lengths: List[int], total: int, x: float = 0.5) -> int:
    """N50-style statistic: the length L such that contigs >= L cover
    x of ``total``."""
    if not lengths or total <= 0:
        return 0
    acc = 0
    for ln in sorted(lengths, reverse=True):
        acc += ln
        if acc >= x * total:
            return ln
    return min(lengths)


def assembly_quality(truth: str, fasta_path: str) -> Dict[str, float]:
    contigs = parse_fasta(fasta_path)
    lengths = [len(c) for c in contigs]
    asm_total = int(sum(lengths))
    tk = kmer_set([truth])
    ak = kmer_set(contigs)
    inter = np.intersect1d(tk, ak, assume_unique=True)
    recall = len(inter) / max(len(tk), 1)
    junk = 1.0 - len(inter) / max(len(ak), 1)
    return {
        "n_contigs": len(contigs),
        "total_len": asm_total,
        "n50": nx0(lengths, asm_total),
        "ng50": nx0(lengths, len(truth)),
        "kmer_recall": round(float(recall), 6),
        "kmer_junk": round(float(junk), 6),
    }
