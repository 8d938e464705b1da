from . import sharded  # noqa: F401
from .sharded import (ShardedSolver, make_mesh, shard_rhs,  # noqa: F401
                      unshard)
