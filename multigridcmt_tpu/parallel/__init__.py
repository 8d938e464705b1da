from . import sharded  # noqa: F401
from .sharded import (Decomp, ShardedSolver, decomp_from_mesh,  # noqa: F401
                      make_block_mesh, make_mesh, shard_rhs, unshard)
