import numpy as np

from gaml_tpu.core import dna
from gaml_tpu.index.maxhash import (
    HASH_XOR,
    K_INDEX_KMER,
    ReadIndexMaxHash,
    maxhash_of_read,
    pack_kmers,
    window_max_fingerprints,
)

from fixtures import random_seq


def brute_kmer(seq_codes, i, k=K_INDEX_KMER):
    v = 0
    for j in range(k):
        c = int(seq_codes[i + j])
        v = (v << 2) | (c if c < 4 else 0)
    return v


def test_pack_kmers_brute():
    rng = np.random.default_rng(0)
    s = dna.encode_seq(random_seq(rng, 60))
    packed = pack_kmers(s)
    for i in range(len(packed)):
        assert int(packed[i]) == brute_kmer(s, i)


def test_maxhash_of_read_brute():
    rng = np.random.default_rng(1)
    s = dna.encode_seq(random_seq(rng, 101))
    expect = max(brute_kmer(s, i) ^ int(HASH_XOR)
                 for i in range(len(s) - K_INDEX_KMER + 1))
    assert maxhash_of_read(s) == expect


def test_window_fingerprints_brute():
    rng = np.random.default_rng(2)
    read_len = 30
    s = dna.encode_seq(random_seq(rng, 200))
    got = window_max_fingerprints(s, read_len)
    # brute force: for each window starting at w, max hash and first argmax
    k = K_INDEX_KMER
    expect = []
    last = None
    for w in range(len(s) - read_len + 1):
        hashes = [brute_kmer(s, w + j) ^ int(HASH_XOR)
                  for j in range(read_len - k + 1)]
        mh = max(hashes)
        pos = w + hashes.index(mh) + k - 1  # kmer end position
        if last is None or mh != last:
            expect.append((mh, pos))
            last = mh
    assert got == expect


def test_index_finds_planted_read():
    rng = np.random.default_rng(3)
    genome = random_seq(rng, 500)
    read = genome[100:130]
    idx = ReadIndexMaxHash()
    idx.add_read(dna.encode_seq(read), 0)
    cands = idx.get_read_cands_with_poses(dna.encode_seq(genome))
    assert 0 in cands
    assert any(p > 0 for p in cands[0])
    # reverse-complement read is found on the negative strand
    idx2 = ReadIndexMaxHash()
    idx2.add_read(dna.encode_seq(dna.revcomp_str(read)), 7)
    cands2 = idx2.get_read_cands_with_poses(dna.encode_seq(genome))
    assert 7 in cands2
    assert any(p < 0 for p in cands2[7])


def test_index_skips_n_reads():
    idx = ReadIndexMaxHash()
    idx.add_read(dna.encode_seq("ACGTN" + "A" * 26), 0)
    assert idx.size_info()[0] == 0
