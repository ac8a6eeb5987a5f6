from .mesh import (  # noqa: F401
    batch_sharding,
    init_distributed,
    make_mesh,
    replicated,
)
