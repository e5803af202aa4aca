"""Postprocess mode (do_proprocess): a single FixBigReps pass with
disjoin_similar=True through the Optimizer."""
import numpy as np

from gaml_tpu.optimize.anneal import Optimizer
from gaml_tpu.optimize.settings import AssemblySettings

from test_fuzz import branchy_world


def test_postprocess_mode_runs(tmp_path):
    gr, pc, _ = branchy_world(tmp_path, seed=9, n_pairs=40)
    settings = AssemblySettings.from_config({
        "do_proprocess": "1",  # sic — reference's load-bearing typo
        "long_contig_threshold": "500",
        "output_prefix": str(tmp_path / "pp"),
    })
    assert settings.do_postprocess and settings.max_iterations == 1
    opt = Optimizer(gr, pc, settings, longest_read=300, log=lambda *a: None)
    # seed with a duplicated long node so FixBigReps has work
    start = [[0, 2, 4], [4, 6, 8], [12]]
    best = opt.run(start, write_outputs=True)
    assert (tmp_path / "pp.fasta").exists()
    # postprocess accepts its pass unconditionally (gaml.cc:286) and the
    # optimizer terminates after max_iterations=1
    assert opt.itnum >= 1
    assert best
