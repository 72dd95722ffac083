"""Device-mesh / sharding utilities (SURVEY.md §5: the TPU-native replacement
for the reference's chunking + CUDA_VISIBLE_DEVICES process farming)."""

from iffnerf_tpu.parallel.mesh import (
    make_mesh,
    shard_rays,
    replicate,
    replicate_arrays,
    pad_to_multiple,
)
