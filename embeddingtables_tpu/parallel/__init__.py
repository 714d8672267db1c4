from .mesh import default_mesh, local_mesh
from .sharded import (ShardedStackedTables, sharded_ensemble_lookup,
                      sharded_ensemble_update, sharded_lookup,
                      sharded_sgd_update, shard_table)
