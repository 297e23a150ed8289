from .ring import (make_sharded_evidence, make_sharded_cross_evidence,
                   pad_for_mesh, sharded_auto_evidence,
                   sharded_cross_evidence)
