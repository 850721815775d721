"""Data layer: host-side transforms, padded batching, datasets, loaders."""

from scream_tpu.data import preprocess, synthetic, transforms
from scream_tpu.data.batching import pad_cloud, bucket_for, collate_pairs, collate_dem
from scream_tpu.data.datasets import (
    CANONICAL_SIZES,
    SCENE_NAME_TO_IDX,
    ConcatDataset,
    OpenGFDataset,
    PairDataset,
    SyntheticPairDataset,
)
from scream_tpu.data.loader import (
    BucketedPairLoader,
    DEMLoader,
    PairLoader,
    prefetch_to_device,
    HostShardDataset,
)
from scream_tpu.data.collated import (
    CollatedPairLoader,
    build_collated_cache,
    collated_or_build,
    has_collated_cache,
)

__all__ = [
    "preprocess",
    "transforms",
    "synthetic",
    "pad_cloud",
    "bucket_for",
    "collate_pairs",
    "collate_dem",
    "CANONICAL_SIZES",
    "SCENE_NAME_TO_IDX",
    "ConcatDataset",
    "OpenGFDataset",
    "PairDataset",
    "SyntheticPairDataset",
    "BucketedPairLoader",
    "DEMLoader",
    "PairLoader",
    "prefetch_to_device",
    "HostShardDataset",
    "CollatedPairLoader",
    "build_collated_cache",
    "collated_or_build",
    "has_collated_cache",
]
