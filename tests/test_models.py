import numpy as np
import pytest

from gaml_tpu.align.aligner import gen_candidates
from gaml_tpu.core import dna
from gaml_tpu.index.maxhash import ReadIndexMaxHash
from gaml_tpu.models import PairedEndModel, SingleEndModel

from fixtures import random_seq
from test_scoring import MATCH, MISMATCH


def test_single_end_model(tmp_path):
    rng = np.random.default_rng(0)
    genome = random_seq(rng, 500)
    seq = dna.encode_seq(genome)
    reads = [genome[i * 15:i * 15 + 30] for i in range(20)]
    idx = ReadIndexMaxHash()
    codes = [dna.encode_seq(r) for r in reads]
    for i, c in enumerate(codes):
        idx.add_read(c, i)
    cands = gen_candidates(idx, dict(enumerate(codes)), seq)
    model = SingleEndModel(MATCH, MISMATCH)
    score, zeros, probs = model.score_candidates(
        seq, cands, 20, [30] * 20, 500)
    expected = float(np.log((MATCH ** 30) / (2 * 500)))
    assert zeros == 0
    assert score == pytest.approx(expected, rel=1e-5)


def test_paired_end_model():
    model = PairedEndModel(insert_mean=200, insert_std=20,
                           match_prob=MATCH, mismatch_prob=MISMATCH)
    # one read with a perfect innie pair at distance 200
    positions1 = [[(10, (0, 0))]]
    positions2 = [[(180, (0, 1))]]
    L = 30
    score, zeros, probs = model.score_positions(
        positions1, positions2, 1, [L], [L], 600)
    from gaml_tpu.core.logprob import gaussian_pdf

    p = (MATCH ** L) ** 2 * float(gaussian_pdf(180 - 10 + L, 200, 20))
    assert probs[0] == pytest.approx(p, rel=1e-5)
    assert score == pytest.approx(np.log(p / (2 * 600)), rel=1e-5)
