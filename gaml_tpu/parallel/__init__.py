from .sharded import make_mesh, sharded_single_end_score, stage_sharded
