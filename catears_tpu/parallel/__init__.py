"""Scale-out: device meshes, sharded pipelines, multi-host runtime.

Lazy re-exports: importing this package must NOT touch the XLA backend,
because `parallel.distributed.initialize` (jax.distributed) has to run
before anything initializes a backend — and `parallel.mesh` pulls in
modules that create device constants at import time.
"""

import importlib
from typing import Any

_EXPORTS = {
    "ShardedPipeline": "catears_tpu.parallel.mesh",
    "make_mesh": "catears_tpu.parallel.mesh",
    "shard_am_params": "catears_tpu.parallel.mesh",
    "initialize": "catears_tpu.parallel.distributed",
    "local_batch_slice": "catears_tpu.parallel.distributed",
    "global_sum": "catears_tpu.parallel.distributed",
}

__all__ = list(_EXPORTS)


def __getattr__(name: str) -> Any:
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(name)
    return getattr(importlib.import_module(mod), name)
