from emfusion_tpu.distributed.mesh import (
    make_mesh, shard_state, state_shardings,
)

__all__ = ["make_mesh", "shard_state", "state_shardings"]
