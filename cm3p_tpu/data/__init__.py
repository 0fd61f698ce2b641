from .beatmap_files_dataset import BeatmapFilesDataset, build_metadata_dataframe
from .data_utils import filter_mmrs_metadata, load_mmrs_metadata
from .loader import SampleLoader, batched_loader
from .mmrs_dataset import BeatmapDatasetIterable, DatasetConfig, MmrsDataset, batch_samples, batched

__all__ = [
    "BeatmapDatasetIterable",
    "BeatmapFilesDataset",
    "DatasetConfig",
    "MmrsDataset",
    "SampleLoader",
    "batch_samples",
    "batched",
    "batched_loader",
    "build_metadata_dataframe",
    "filter_mmrs_metadata",
    "load_mmrs_metadata",
]
