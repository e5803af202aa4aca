"""The precomputed per-(read, orient) seed positions must equal the
reference's first-matching-15-mer scan for every generated candidate."""
import numpy as np

from gaml_tpu.align.aligner import _ReadCache, find_seed_in_read, gen_candidates
from gaml_tpu.core import dna
from gaml_tpu.index.maxhash import ReadIndexMaxHash, pack_kmers, pack_kmers_batch

from fixtures import random_seq, sample_reads


def test_seed_positions_match_scan():
    rng = np.random.default_rng(0)
    genome = random_seq(rng, 1500)
    reads = sample_reads(rng, genome, 120, 40, err_rate=0.02)
    codes = [dna.encode_seq(r) for r in reads]
    idx = ReadIndexMaxHash()
    for i, c in enumerate(codes):
        idx.add_read(c, i)
    read_seqs = dict(enumerate(codes))
    cache = _ReadCache(read_seqs,
                       kmer_matrix=pack_kmers_batch(np.stack(codes)),
                       matrix_rids={i: i for i in range(len(codes))})
    seq = dna.encode_seq(genome)
    cands = gen_candidates(idx, read_seqs, seq, cache)
    assert cands
    seq_kmers = pack_kmers(seq)
    for cand, read in cands:
        scanned = find_seed_in_read(read, seq, cand.genome_pos,
                                    target_kmer=seq_kmers[cand.genome_pos])
        assert scanned == cand.read_pos, (cand, scanned)
        # and the seed really is exact
        assert np.array_equal(read[cand.read_pos:cand.read_pos + 15],
                              seq[cand.genome_pos:cand.genome_pos + 15])
