from .ring import (make_sharded_evidence, make_sharded_cross_evidence,
                   make_sharded_grid_evidence, make_sharded_grid_knn,
                   make_sharded_knn, pad_for_mesh, sharded_auto_evidence,
                   sharded_cross_evidence, sharded_grid_auto_evidence,
                   sharded_grid_evidence_refine, sharded_knn_candidates)
