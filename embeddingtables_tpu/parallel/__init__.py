from .colshard import (ColShardedStackedTables, col_sharded_lookup,
                       col_sharded_update, init_col_row_state)
from .mesh import default_mesh, local_mesh
from .planner import (PlannedTables, ShardingPlan, plan_sharding,
                      planned_apply, planned_lookup)
from .sharded import (ShardedStackedTables, sharded_ensemble_lookup,
                      sharded_ensemble_update, sharded_lookup,
                      sharded_sgd_update, shard_table)
